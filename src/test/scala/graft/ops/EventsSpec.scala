package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import java.time.Instant

/** Batch event-stream analytics: gap-based sessionization boundary
  * semantics (strict >, integer microseconds) and tumbling-window
  * aggregation.
  */
class EventsSpec extends SparkSpec {

  private def ts(offsetUs: Long): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z")
      .plusNanos(offsetUs * 1000L))

  test("sessionize: exact-threshold gap stays in session, strict > starts new") {
    import spark.implicits._
    val min30 = 30L * 60L * 1000000L
    val events = Seq(
      // user 1: e10 at t0; e11 same ts (tie → event_id order); e12 at
      // EXACTLY +30min (stays — strict >); e13 at +60min+1us from t0,
      // i.e. gap 30min+1us from e12 (new session)
      (10L, ts(0L), 1L),
      (11L, ts(0L), 1L),
      (12L, ts(min30), 1L),
      (13L, ts(2 * min30 + 1L), 1L),
      // user 2: single event
      (20L, ts(5L), 2L)
    ).toDF("event_id", "ts", "user_id")
    val got = Events.sessionize(events, gapMinutes = 30)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L) == ((1L, 1L, true)))
    assert(got(11L) == ((1L, 1L, false)))
    assert(got(12L) == ((1L, 1L, false)))
    assert(got(13L) == ((1L, 2L, true)))
    assert(got(20L) == ((2L, 1L, true)))
  }

  test("windowAgg: hand-computed hourly buckets per type") {
    import spark.implicits._
    val h = 3600L * 1000000L
    val events = Seq(
      (1L, ts(0L), 1L, "click", 1.5),
      (2L, ts(100L), 2L, "click", 2.25),
      (3L, ts(h + 1L), 1L, "click", 4.0),
      (4L, ts(10L), 1L, "buy", 10.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.windowAgg(events)
      .as[(String, Timestamp, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("click", ts(0L))) == ((2L, 3.75, 2L)))
    assert(got(("click", ts(h))) == ((1L, 4.0, 1L)))
    assert(got(("buy", ts(0L))) == ((1L, 10.0, 1L)))
    assert(got.size == 3)
    // the HLL scale path (sketches pre-combine map-side) agrees exactly
    // at these cardinalities
    val approx = Events.windowAgg(events, approxUsers = true)
      .as[(String, Timestamp, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(approx == got)
  }

  test("funnel: greedy prefix depth — order matters, repeats don't, silent users report 0") {
    import spark.implicits._
    val steps = Seq("a", "b", "c")
    def e(id: Long, off: Long, u: Long, ty: String) = (id, ts(off), u, ty)
    val events = Seq(
      // user 1: a, b, c in order -> 3 (with an ignored type mixed in)
      e(1, 0, 1, "a"), e(2, 10, 1, "x"), e(3, 20, 1, "b"), e(4, 30, 1, "c"),
      // user 2: c first doesn't count; a, then c again without b -> 1
      e(5, 0, 2, "c"), e(6, 10, 2, "a"), e(7, 20, 2, "c"),
      // user 3: repeated a's never advance past the missing b -> 1
      e(8, 0, 3, "a"), e(9, 10, 3, "a"), e(10, 20, 3, "a"),
      // user 4: only ignored types -> 0
      e(11, 0, 4, "x"), e(12, 10, 4, "y"),
      // user 5: b at the SAME ts as a but a larger event_id — the
      // (ts, event_id) tie-break puts a first, so both match -> 2
      e(13, 0, 5, "a"), e(14, 0, 5, "b")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.funnel(events, steps)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 2L))
    // a NULL-ts step event is dropped (unorderable — both engines filter
    // it identically); a user with ONLY null-ts events still reports 0
    val withNull = events.unionByName(Seq(
      (15L, None: Option[Timestamp], 2L, "b"),
      (16L, None: Option[Timestamp], 6L, "a")
    ).toDF("event_id", "ts", "user_id", "event_type"))
    val got2 = Events.funnel(withNull, steps).as[(Long, Long)].collect().toMap
    assert(got2 == got + (6L -> 0L))
    intercept[IllegalArgumentException] { Events.funnel(events, Seq("a", "a")) }
    intercept[IllegalArgumentException] { Events.funnel(events, Seq.empty) }
  }

  test("retention: hand-computed cohort x offset matrix, distinct within the hour") {
    import spark.implicits._
    val h = 3600L * 1000000L
    // user 1 first seen hour 0, active hours 0 and 2 (twice in hour 2 —
    // counted once); user 2 first seen hour 0, active hour 0 only;
    // user 3 first seen hour 1, active hours 1 and 2
    val events = Seq(
      (1L, ts(0), 1L), (2L, ts(2 * h), 1L), (3L, ts(2 * h + 5), 1L),
      (4L, ts(10), 2L),
      (5L, ts(h), 3L), (6L, ts(2 * h + 7), 3L)
    ).toDF("event_id", "ts", "user_id")
    val got = Events.retention(events)
      .as[(Timestamp, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      (ts(0), 0L) -> 2L,   // users 1 and 2 in the hour-0 cohort
      (ts(0), 2L) -> 1L,   // user 1 returns at offset 2
      (ts(h), 0L) -> 1L,   // user 3's own cohort hour
      (ts(h), 1L) -> 1L))  // user 3 returns one hour later
  }
}
