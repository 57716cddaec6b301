package graft.ops

import graft.SparkSpec
import graft.model.Mention

class LinkingSpec extends SparkSpec {

  private def mentions = {
    import spark.implicits._
    // surface forms: "db users", "db_users", "users db" as aliases of one
    // node via extra pairs; "cache" standalone
    val rows = Seq(
      ("c1", 0, "db users"), ("c1", 1, "db_users"), ("c2", 0, "db users"),
      ("c2", 1, "users db"), ("c3", 0, "cache"))
    rows.zipWithIndex.map { case ((c, t, s), i) =>
      Mention(c, t, 0, "e_res", i * 10, i * 10 + s.length, s, 1.0,
        graft.nlp.TextOps.normKey(s))
    }.toDS()
  }

  test("nodeStatsExact matches plain groupBy despite salting") {
    import spark.implicits._
    val got = Linking.nodeStatsExact(mentions, salts = 4)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("e_res", "db users", 2L, 2L),
      ("e_res", "db_users", 1L, 1L),
      ("e_res", "users db", 1L, 1L),
      ("e_res", "cache", 1L, 1L)))
  }

  test("approximate nodeStats: exact mention sums, HLL conv counts in tolerance") {
    import spark.implicits._
    val approx = Linking.nodeStats(mentions).as[(String, String, Long, Long)]
      .collect().map(r => r._2 -> (r._3, r._4)).toMap
    assert(approx("db users")._1 == 2L) // mention counts are exact sums
    assert(math.abs(approx("db users")._2 - 2L) <= 1) // HLL rsd 0.01
    assert(approx("cache")._1 == 1L)
  }

  test("nodes with extra alias pairs collapse via connected components") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keyed = mentions.toDF()
      .select(col("class_id"), col("norm"), xxhash64(col("class_id"), col("norm")).as("kid"))
      .distinct().as[(String, String, Long)].collect()
      .map { case (_, n, k) => n -> k }.toMap
    // alias graph: "db users" ~ "db_users" ~ "users db" (transitive chain)
    val pairs = Seq(
      (keyed("db users"), keyed("db_users")),
      (keyed("db_users"), keyed("users db"))).toDF("src", "dst")
    val nodes = Linking.nodes(mentions, Some(pairs))
      .as[(Long, String, String, Long, Long)].collect()
    val byCanon = nodes.map(n => n._2 -> n._1).toMap
    // the three aliases share one node id; cache stands alone
    assert(byCanon("db users") == byCanon("db_users"))
    assert(byCanon("db_users") == byCanon("users db"))
    assert(byCanon("cache") != byCanon("db users"))
    assert(byCanon("db users") ==
      Seq(keyed("db users"), keyed("db_users"), keyed("users db")).min)
    // stats preserved per surface
    assert(nodes.find(_._2 == "db users").get._4 == 2L)
  }

  test("connectedComponents: single-task union-find path ≡ distributed label propagation") {
    import spark.implicits._
    // deterministic graph mixing the shapes the engine's callers produce:
    // long chains (kg_cc), cliques (dup clusters), stars, isolated pairs
    val rnd = new scala.util.Random(7)
    val chains = (0 until 6).flatMap { c =>
      val base = 1000L * c
      (0 until 20).map(i => (base + i, base + i + 1))
    }
    val clique = for (a <- 0 until 8; b <- (a + 1) until 8)
      yield (50000L + a, 50000L + b)
    val stars = (0 until 5).flatMap { s =>
      val hub = 90000L + s * 100
      (1 to 6).map(i => (hub, hub + i))
    }
    val noise = (0 until 60).map(_ =>
      (rnd.nextInt(200).toLong + 70000L, rnd.nextInt(200).toLong + 70000L))
    val edges = (chains ++ clique ++ stars ++ noise).toDF("src", "dst")
    // reference answer: in-test union-find over the same edge list
    val ref = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      (chains ++ clique ++ stars ++ noise).filter(e => e._1 != e._2)
        .foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
      parent.keys.map(n => n -> find(n)).toMap
    }
    def run(): Map[Long, Long] =
      Linking.connectedComponents(edges).as[(Long, Long)].collect().toMap
    val small = run() // default cap → union-find path
    spark.conf.set("graft.cc.localEdgeCap", "0")
    val dist = try run() // cap 0 → distributed label-propagation path
    finally spark.conf.unset("graft.cc.localEdgeCap")
    assert(small == ref, "union-find path diverges from reference")
    assert(dist == ref, "distributed path diverges from reference")
  }

  test("synonymPairs: y (x) abbreviation heuristic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sents = Seq(
      "the auth service (svc_auth) failed",
      "retry with Backoff2 ( b2 ) now",
      "no pattern here").toDF("sent_text")
    val pairs = Linking.synonymPairs(sents, "e_res")
    assert(pairs.count() == 2)
    // pair hashes correspond to the norm keys of the two surfaces
    val expected = Set(
      (xx("e_res", "service"), xx("e_res", "svc_auth")),
      (xx("e_res", "backoff0"), xx("e_res", "b0")))
    val got = pairs.as[(Long, Long)].collect().toSet
    assert(got == expected, got)
  }

  private def xx(parts: String*): Long = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(1).toDF("x").select(xxhash64(parts.map(lit): _*)).head().getLong(0)
  }
}
