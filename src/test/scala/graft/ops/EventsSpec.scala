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
}
