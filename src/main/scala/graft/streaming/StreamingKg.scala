package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.model.{TripleRow, Turn}
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

  /** Per-conversation state for [[triplesStateful]]: the turns seen so
    * far (conversations are bounded — transcripts end) and the canonical
    * keys already emitted (cross-batch dedup).
    */
  final case class ConvState(turns: Seq[Turn], emittedKeys: Set[String])

  /** Stateful incremental extraction for conversations whose turns
    * arrive ACROSS micro-batches — `flatMapGroupsWithState` over
    * conv_id (the custom-state streaming op the batch-only reference has
    * no analogue for):
    *
    *  - state = accumulated turns (deduped on turn_idx, first write
    *    wins) + already-emitted triple keys,
    *  - each batch re-runs the pure per-conversation extraction over the
    *    accumulated turns and emits ONLY new keys (append-mode-safe,
    *    exactly-once per key under the streaming checkpoint),
    *  - idle conversations are evicted by processing-time timeout, so
    *    state is bounded by ACTIVE conversations × bounded turns (at
    *    scale back the state store with RocksDB).
    */
  def triplesStateful(turns: Dataset[Turn], cfg: KgPipeline.Config,
                      gaz: Map[String, String],
                      scorer: Option[RelationScoring.LinearModel] = None,
                      maxIdle: String = "30 minutes",
                      timeout: GroupStateTimeout =
                        GroupStateTimeout.ProcessingTimeTimeout()): Dataset[TripleRow] = {
    // EventTimeTimeout requires state.setTimeoutTimestamp + a watermark —
    // semantics this idle-duration API does not model. Reject it up front
    // instead of letting setTimeoutDuration throw mid-stream.
    require(timeout != GroupStateTimeout.EventTimeTimeout(),
      "triplesStateful models idle-duration eviction: use " +
        "ProcessingTimeTimeout (default) or NoTimeout; event-time timeouts " +
        "need watermark+timestamp semantics this API does not expose")
    val spark = turns.sparkSession
    import spark.implicits._
    val bcGaz = spark.sparkContext.broadcast(gaz)
    val bcLin = spark.sparkContext.broadcast(scorer)
    val useTimeout = timeout != GroupStateTimeout.NoTimeout()
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (convId: String, newTurns: Iterator[Turn], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(ConvState(Nil, Set.empty))
            val seen = prev.turns.map(_.turn_idx).toSet
            val merged = prev.turns ++
              newTurns.filterNot(t => seen(t.turn_idx)).toSeq
                .distinctBy(_.turn_idx)
            val g = bcGaz.value
            val tagger: IndexedSeq[graft.model.Tok] => Seq[(String, Int, Int)] =
              toks => toks.flatMap(t =>
                g.get(t.word.toLowerCase).map(cls => (cls, t.begin, t.end)))
            val all = KgPipeline.processConversation(convId, merged, cfg,
              tagger, bcLin.value)
            val fresh = all.filterNot(t => prev.emittedKeys(t.key))
            state.update(ConvState(merged,
              prev.emittedKeys ++ fresh.map(_.key)))
            if (useTimeout) state.setTimeoutDuration(maxIdle)
            fresh.iterator
          }
      }
  }

  /** State for [[exactDedupStream]]: the representative (first-seen
    * minimal) doc_id and its text for each content hash.
    */
  final case class DedupState(repId: Long, text: String)

  /** Streaming EXACT dedup at ingest — the incremental form of
    * `Dedup.exact` for a landing-zone document stream: documents are
    * keyed by xxhash64(text) (hash-first, same as the batch operator),
    * per-hash state holds the first-seen representative (id + text for
    * collision verification), and every arriving document is emitted
    * exactly once as (doc_id, rep_id, is_dup) — is_dup = an
    * earlier-arriving document had identical text. A 64-bit hash
    * collision with DIFFERENT text falls back to "not a duplicate":
    * never a false merge; the rare colliding text stays its own
    * representative on every occurrence (conservative direction — a
    * missed dedup, ~2⁻⁶⁴ per pair, not a lost document).
    *
    * State is bounded by distinct content hashes; at scale back the
    * state store with RocksDB and age out via the timeout parameter on
    * a wrapper — kept minimal here because dedup state, unlike
    * conversation state, is legitimately append-only.
    */
  def exactDedupStream(docs: Dataset[(Long, String)]): Dataset[(Long, Long, Boolean)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey { case (_, text) =>
      // engine-owned stable hash (graft invariant: never JVM hashCode)
      graft.nlp.Hashes.fnv1a64(text)
    }.flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: Long, rows: Iterator[(Long, String)], state: GroupState[DedupState]) =>
        val out = Vector.newBuilder[(Long, Long, Boolean)]
        var cur = state.getOption
        // deterministic within-batch order: ascending doc_id
        rows.toSeq.sortBy(_._1).foreach { case (id, text) =>
          cur match {
            case Some(s) if s.text == text =>
              out += ((id, s.repId, true))
            case Some(s) =>
              // hash collision, different text: keep as its own doc
              out += ((id, id, false))
            case None =>
              cur = Some(DedupState(id, text))
              out += ((id, id, false))
          }
        }
        cur.foreach(state.update)
        out.result().iterator
    }
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
