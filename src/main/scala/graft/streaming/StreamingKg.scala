package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.Turn
import graft.ops.{KgPipeline, RelationScoring}

/** Structured Streaming surface: incremental KG construction over a
  * growing transcripts table (the reference is batch-only; our
  * incremental story is landing-zone file streams + the same fused
  * extraction per micro-batch, checkpointed by the streaming engine).
  *
  *  - [[triplesStream]]: readStream (file source) → foreachBatch running
  *    KgPipeline on each micro-batch and appending to the triples table.
  *    Conversations are assumed batch-contained (a conversation's turns
  *    arrive together); cross-batch merge is the downstream MERGE's job.
  *  - [[turnRates]]: event-time windowed counts with a watermark — the
  *    classic late-data-tolerant throughput monitor.
  */
object StreamingKg {

  /** Incremental triple extraction with exactly-once sink semantics via
    * the streaming checkpoint + idempotent parquet append per batchId.
    */
  def triplesStream(spark: SparkSession, inputDir: String, outputDir: String,
                    checkpointDir: String, cfg: KgPipeline.Config,
                    gaz: Map[String, String],
                    scorer: Option[RelationScoring.LinearModel] = None,
                    availableNow: Boolean = true): StreamingQuery = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[Turn].schema
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val turns = batch.as[Turn]
        KgPipeline.triples(turns, cfg, None, gaz, scorer)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outputDir)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** Event-time turn-rate monitor: 1-minute windows, 2-minute watermark
    * (late turns beyond the watermark are dropped from their window).
    */
  def turnRates(turns: DataFrame): DataFrame =
    turns
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("role"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("window.start").as("window_start"), col("role"), col("n_turns"))
}
