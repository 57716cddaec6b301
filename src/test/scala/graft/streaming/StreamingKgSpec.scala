package graft.streaming

import graft.SparkSpec
import graft.model.Turn
import graft.ops.{KgPipeline, Transcripts}
import java.nio.file.Files

class StreamingKgSpec extends SparkSpec {

  private val gaz = Map(
    "svc_auth" -> "e_svc", "svc_billing" -> "e_svc", "svc_search" -> "e_svc",
    "job_etl" -> "e_svc", "agent_planner" -> "e_svc",
    "db_users" -> "e_res", "db_orders" -> "e_res", "idx_docs" -> "e_res",
    "topic_events" -> "e_res", "cache_main" -> "e_res")

  test("streaming triples == batch triples on the same input") {
    import spark.implicits._
    val in = Files.createTempDirectory("skg_in").toString
    val out = Files.createTempDirectory("skg_out").toString
    val chk = Files.createTempDirectory("skg_chk").toString
    val turns = (0 until 20).flatMap { c =>
      (0 until 5).map(t => Transcripts.syntheticTurn(c, t, 42L))
    }
    // two "arrivals" of complete conversations
    turns.filter(_.conv_id < "conv_000010").toDS()
      .coalesce(1).write.mode("append").parquet(in)
    turns.filter(_.conv_id >= "conv_000010").toDS()
      .coalesce(1).write.mode("append").parquet(in)

    val cfg = KgPipeline.Config("r_uses", "e_svc", "e_res", window = 1, tokenizer = "generic")
    val q = StreamingKg.triplesStream(spark, in, out, chk, cfg, gaz)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(out)
      .select("conv_id", "key").as[(String, String)].collect().toSet
    val batch = KgPipeline.triples(turns.toDS(), cfg, None, gaz, None)
      .select("conv_id", "key").as[(String, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)

    // restart with same checkpoint: no new batches → no duplicate output
    val q2 = StreamingKg.triplesStream(spark, in, out, chk, cfg, gaz)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(out).select("conv_id", "key").distinct().count())
  }

  test("turnRates: watermarked windowed counts per role") {
    import spark.implicits._
    val turns = (0 until 12).map { i =>
      Turn(f"c$i", 0, if (i % 2 == 0) "user" else "assistant", "x", None,
        new java.sql.Timestamp(1735689600000L + i * 10000L))
    }.toDF()
    val got = StreamingKg.turnRates(turns).collect()
    assert(got.map(_.getLong(2)).sum == 12)
    assert(got.forall(_.getLong(2) == 3)) // 2 windows × 2 roles × 3 turns
  }
}
