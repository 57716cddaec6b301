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
    *    state is bounded by ACTIVE conversations × bounded turns (back the
    *    state store with RocksDB at scale — a TESTED mode: one conf
    *    line, `spark.sql.streaming.stateStore.providerClass =
    *    ...state.RocksDBStateStoreProvider`, ships with Spark; output
    *    parity + provider-in-effect pinned in StreamingKgSpec).
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
        "ProcessingTimeTimeout (default) or NoTimeout; for watermark-based " +
        "eviction use triplesStatefulEventTime")
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
            val fresh = mergeAndExtract(convId, newTurns, state, cfg,
              bcGaz.value, bcLin.value)
            if (useTimeout) state.setTimeoutDuration(maxIdle)
            fresh
          }
      }
  }

  /** Shared per-group body of the stateful extractors: merge the arriving
    * turns into the accumulated state (first write per turn_idx wins),
    * re-run the pure per-conversation extraction, emit only
    * not-yet-emitted keys, and update the state. Timeout bookkeeping is
    * the caller's (the two timeout disciplines differ).
    */
  private def mergeAndExtract(convId: String, newTurns: Iterator[Turn],
                              state: GroupState[ConvState],
                              cfg: KgPipeline.Config,
                              gaz: Map[String, String],
                              scorer: Option[RelationScoring.LinearModel])
  : Iterator[TripleRow] = {
    val prev = state.getOption.getOrElse(ConvState(Nil, Set.empty))
    val seen = prev.turns.map(_.turn_idx).toSet
    val merged = prev.turns ++
      newTurns.filterNot(t => seen(t.turn_idx)).toSeq
        .distinctBy(_.turn_idx)
    val tagger: IndexedSeq[graft.model.Tok] => Seq[(String, Int, Int)] =
      toks => toks.flatMap(t =>
        gaz.get(t.word.toLowerCase).map(cls => (cls, t.begin, t.end)))
    val all = KgPipeline.processConversation(convId, merged, cfg,
      tagger, scorer)
    val fresh = all.filterNot(t => prev.emittedKeys(t.key))
    state.update(ConvState(merged, prev.emittedKeys ++ fresh.map(_.key)))
    fresh.iterator
  }

  /** Event-time variant of [[triplesStateful]]: conversations are evicted
    * when the WATERMARK passes their last turn's event time plus
    * `idleGap` — the late-data discipline `setTimeoutDuration` cannot
    * express (processing-time eviction races real late arrivals; an
    * event-time timeout fires only once the watermark PROVES no turn
    * older than the gap can still arrive). Requires an event-time
    * watermark on `ts`, which this operator installs itself
    * (`watermarkDelay` = how much event-time lateness the stream
    * tolerates).
    *
    * The timeout timestamp is re-armed on every batch to
    * max(last event time + idleGap, watermark + 1ms) — the +1 floor
    * keeps the call legal when a conversation's events are already far
    * behind the watermark (Spark requires a strictly-future timeout).
    */
  def triplesStatefulEventTime(turns: Dataset[Turn], cfg: KgPipeline.Config,
                               gaz: Map[String, String],
                               scorer: Option[RelationScoring.LinearModel] = None,
                               watermarkDelay: String = "10 minutes",
                               idleGapMs: Long = 30L * 60 * 1000): Dataset[TripleRow] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bcGaz = spark.sparkContext.broadcast(gaz)
    val bcLin = spark.sparkContext.broadcast(scorer)
    turns.withWatermark("ts", watermarkDelay)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (convId: String, newTurns: Iterator[Turn], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val fresh = mergeAndExtract(convId, newTurns, state, cfg,
              bcGaz.value, bcLin.value)
            val lastEventMs = state.get.turns.iterator
              .map(_.ts.getTime).foldLeft(0L)(math.max)
            state.setTimeoutTimestamp(
              math.max(lastEventMs + idleGapMs,
                state.getCurrentWatermarkMs() + 1))
            fresh
          }
      }
  }

  /** State for [[exactDedupStream]]: the representative (first-seen
    * minimal) doc_id and its text for each content hash.
    */
  final case class DedupState(repId: Long, text: String,
                              lastEventMs: Long = 0L)

  /** Streaming EXACT dedup at ingest — the incremental counterpart of
    * `Dedup.exact` for a landing-zone document stream: documents are
    * keyed by a 64-bit content hash (fnv1a64 — the engine-owned hash,
    * callable per-key in groupByKey; the batch operator uses Catalyst's
    * xxhash64 column — both are only BUCKETING, exactness comes from the
    * text comparison, so the choice is invisible in the output),
    * per-hash state holds the representative (id + text for collision
    * verification), and every arriving document is emitted exactly once
    * as (doc_id, rep_id, is_dup) — is_dup = an earlier-arriving document
    * had identical text. A 64-bit hash collision with DIFFERENT text
    * falls back to "not a duplicate": never a false merge; the rare
    * colliding text stays its own representative on every occurrence
    * (conservative direction — a missed dedup, ~2⁻⁶⁴ per pair, not a
    * lost document).
    *
    * Representative semantics differ from batch BY NECESSITY: batch
    * assigns rep = min doc_id over the whole group; a stream cannot
    * retract rows already emitted in append mode, so rep = FIRST-SEEN
    * (within one micro-batch, the minimal id — arrivals are processed in
    * ascending id order; across batches, arrival order wins). The parity
    * test feeds ascending ids, where the two coincide.
    *
    * State is bounded by distinct content hashes. `maxIdle` (r4) bounds
    * it further in TIME: a hash bucket idle longer than the duration is
    * evicted (processing-time timeout, the same discipline as
    * [[triplesStateful]]), so state tracks the RECENTLY-SEEN corpus —
    * at scale back the store with RocksDB (tested mode — see
    * [[triplesStateful]]) and set maxIdle to the dedup horizon. Eviction semantics: a text re-ingested AFTER its bucket
    * was evicted starts a fresh group (it becomes its own representative
    * again — pinned in StreamingKgSpec); None keeps the original
    * append-only NoTimeout behavior.
    */
  def exactDedupStream(docs: Dataset[(Long, String)],
                       maxIdle: Option[String] = None): Dataset[(Long, Long, Boolean)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (maxIdle.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.groupByKey { case (_, text) =>
      // engine-owned stable hash (graft invariant: never JVM hashCode)
      graft.nlp.Hashes.fnv1a64(text)
    }.flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
      (_: Long, rows: Iterator[(Long, String)], state: GroupState[DedupState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val out = exactDedupGroup(rows.toSeq, state)
          maxIdle.foreach(state.setTimeoutDuration)
          out
        }
    }
  }

  /** Shared per-group body of [[exactDedupStream]] and its event-time
    * variant — dedup semantics only; timeout bookkeeping is the caller's
    * (the two disciplines differ).
    */
  private def exactDedupGroup(rowSeq: Seq[(Long, String)],
                              state: GroupState[DedupState])
  : Iterator[(Long, Long, Boolean)] = {
    val out = Vector.newBuilder[(Long, Long, Boolean)]
    var cur = state.getOption
    // deterministic within-batch order: ascending doc_id
    rowSeq.sortBy(_._1).foreach { case (id, text) =>
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

  /** Event-time variant of [[exactDedupStream]] for REPLAYED or
    * historical corpora: the dedup horizon is measured in EVENT time —
    * a hash bucket is evicted once the WATERMARK passes its last
    * document's event time plus `idleGapMs`, i.e. only when the stream
    * PROVES no document within the horizon can still arrive. A
    * processing-time `maxIdle` would race real late arrivals on replay
    * (wall-clock idle says nothing about event-time adjacency when a
    * year of history replays in minutes) — same reasoning as
    * [[triplesStatefulEventTime]], whose timeout re-arming discipline
    * (max(last event + gap, watermark + 1 ms)) this shares. Eviction
    * semantics match the PT variant: a text re-ingested after its
    * bucket's eviction starts a fresh group (pinned in StreamingKgSpec).
    */
  def exactDedupStreamEventTime(docs: Dataset[(Long, String, java.sql.Timestamp)],
                                watermarkDelay: String = "10 minutes",
                                idleGapMs: Long = 30L * 60 * 1000)
  : Dataset[(Long, Long, Boolean)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF("doc_id", "text", "ts")
      .withWatermark("ts", watermarkDelay)
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey { case (_, text, _) => graft.nlp.Hashes.fnv1a64(text) }
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[DedupState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seq = rows.toSeq
            // horizon = max event time EVER seen by this bucket (state-
            // carried) — re-arming from the current batch alone would let
            // a late-but-valid arrival SHRINK the horizon and evict early
            val lastEventMs = math.max(
              seq.iterator.map(_._3.getTime).foldLeft(0L)(math.max),
              state.getOption.map(_.lastEventMs).getOrElse(0L))
            val out = exactDedupGroup(seq.map(r => (r._1, r._2)), state)
            state.getOption.foreach(s =>
              state.update(s.copy(lastEventMs = lastEventMs)))
            state.setTimeoutTimestamp(
              math.max(lastEventMs + idleGapMs,
                state.getCurrentWatermarkMs() + 1))
            out
          }
      }
  }

  /** State for [[simhashPairsStream]]: every (doc_id, simhash) seen so
    * far in one 16-bit block bucket.
    */
  final case class BlockState(entries: List[(Long, Long)],
                              lastEventMs: Long = 0L)

  /** Streaming NEAR-dup detection at ingest — the incremental form of
    * `Dedup.simhashPairs`: each arriving document fans out to its four
    * 16-bit SimHash blocks; per-(block-id, block-value) state keeps the
    * (doc_id, simhash) of every document seen in that bucket, and the
    * arrival emits (a, b, hamming) for each stored document within
    * `maxHamming`. The pigeonhole argument is the batch operator's: any
    * pair within hamming 3 of 64 bits shares at least one identical
    * block, so the union over the four block streams covers every
    * qualifying pair — a pair sharing MULTIPLE blocks is emitted once per
    * shared block, and all of its emissions land in the SAME micro-batch
    * (both fan-outs of a document ride with the document), so a per-batch
    * `dropDuplicates` in the sink restores set semantics (parity with
    * the batch operator is tested). Assumes unique doc_ids (the batch
    * operator's contract).
    *
    * State grows with corpus size per bucket; two r4 bounds:
    * `maxIdle` evicts buckets idle past the duration (processing-time
    * timeout — the dedup horizon at scale; re-ingested docs after
    * eviction re-emit their pairs), and `maxBucket` caps the entries a
    * hot bucket STORES: arrivals beyond the cap still compare against
    * the stored entries but are not added, so a boilerplate bucket emits
    * O(cap) pairs per arrival instead of O(bucket) — with the cap the
    * result is an explicit candidate SUBSET on hot buckets, the same
    * recall trade Dedup.ngramJaccard makes with its document-frequency
    * filter (bounded-emission behavior pinned in StreamingKgSpec). At
    * scale back the store with RocksDB (tested mode — see
    * [[triplesStateful]]).
    *
    * NOTE `maxHamming` > 3: the 4×16-bit block fanout GUARANTEES a
    * shared block only for hamming ≤ 3 (pigeonhole over 4 blocks);
    * larger values return a candidate subset, not every qualifying pair
    * — identical to the batch operator's blocking, so batch/stream
    * parity still holds at any setting.
    */
  def simhashPairsStream(docs: Dataset[(Long, String)],
                         maxHamming: Int = 3,
                         maxIdle: Option[String] = None,
                         maxBucket: Int = Int.MaxValue): Dataset[(Long, Long, Int)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (maxIdle.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.flatMap { case (id, text) =>
      val feats = text.split("\\s+").iterator.filter(_.nonEmpty)
        .map(w => (graft.nlp.Hashes.fnv1a64(w), 1))
      val h = graft.nlp.Hashes.simhash(feats)
      (0 until 4).map(b => (b.toLong << 32 | ((h >>> (b * 16)) & 0xffffL), id, h))
    }.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (_: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[BlockState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = simhashGroup(rows.toSeq.map(r => (r._2, r._3)), state,
              maxHamming, maxBucket)
            maxIdle.foreach(state.setTimeoutDuration)
            out
          }
      }
  }

  /** Shared per-group body of [[simhashPairsStream]] and its event-time
    * variant: `rowSeq` = (doc_id, simhash) arrivals for one block bucket.
    */
  private def simhashGroup(rowSeq: Seq[(Long, Long)],
                           state: GroupState[BlockState],
                           maxHamming: Int, maxBucket: Int)
  : Iterator[(Long, Long, Int)] = {
    val out = Vector.newBuilder[(Long, Long, Int)]
    var entries = state.getOption.map(_.entries).getOrElse(Nil)
    var size = entries.size // ≤ maxBucket by construction
    // deterministic within-batch order: ascending doc_id
    rowSeq.sortBy(_._1).foreach { case (id, h) =>
      entries.foreach { case (pid, ph) =>
        if (pid != id) {
          val d = graft.nlp.Hashes.hamming(ph, h)
          if (d <= maxHamming)
            out += ((math.min(pid, id), math.max(pid, id), d))
        }
      }
      if (size < maxBucket) { entries = (id, h) :: entries; size += 1 }
    }
    state.update(BlockState(entries))
    out.result().iterator
  }

  /** Event-time variant of [[simhashPairsStream]] — the dedup horizon in
    * EVENT time for replayed corpora (see [[exactDedupStreamEventTime]]
    * for the discipline rationale). Input rows carry the document's
    * event timestamp; block buckets are evicted when the watermark
    * passes their last arrival's event time plus `idleGapMs`.
    */
  def simhashPairsStreamEventTime(docs: Dataset[(Long, String, java.sql.Timestamp)],
                                  maxHamming: Int = 3,
                                  watermarkDelay: String = "10 minutes",
                                  idleGapMs: Long = 30L * 60 * 1000,
                                  maxBucket: Int = Int.MaxValue)
  : Dataset[(Long, Long, Int)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { case (id, text, ts) =>
        val feats = text.split("\\s+").iterator.filter(_.nonEmpty)
          .map(w => (graft.nlp.Hashes.fnv1a64(w), 1))
        val h = graft.nlp.Hashes.simhash(feats)
        (0 until 4).map(b =>
          (b.toLong << 32 | ((h >>> (b * 16)) & 0xffffL), id, h, ts))
      }
      // watermark AFTER the fan-out: the event-time tag must sit on an
      // attribute that reaches flatMapGroupsWithState's child (a typed
      // flatMap between them would strip it)
      .toDF("bucket", "doc_id", "simhash", "ts")
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[BlockState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seq = rows.toSeq
            // state-carried max event time — see exactDedupStreamEventTime
            val lastEventMs = math.max(
              seq.iterator.map(_._4.getTime).foldLeft(0L)(math.max),
              state.getOption.map(_.lastEventMs).getOrElse(0L))
            val out = simhashGroup(seq.map(r => (r._2, r._3)), state,
              maxHamming, maxBucket)
            state.getOption.foreach(s =>
              state.update(s.copy(lastEventMs = lastEventMs)))
            state.setTimeoutTimestamp(
              math.max(lastEventMs + idleGapMs,
                state.getCurrentWatermarkMs() + 1))
            out
          }
      }
  }

  /** State for [[minhashCandidatesStream]]: doc ids seen in one band
    * bucket — ids ONLY, the same payload-free contract as the batch
    * operator's band rows.
    */
  final case class BucketState(ids: List[Long], lastEventMs: Long = 0L)

  /** Streaming MinHash-LSH near-dup CANDIDATES at ingest — the
    * incremental form of the batch `Dedup.bandedBuckets` candidate
    * generation: each arriving document fans out to its `bands` bucket
    * keys (identical shingle/signature/bucket arithmetic to the batch
    * operator, so the candidate sets are EQUAL — tested), per-bucket
    * state keeps doc ids only, and an arrival emits (a, b) for every
    * id already in the bucket. Like the batch operator, candidates are
    * a superset of the true near-dups: exact-Jaccard verification joins
    * the id pairs back to a persisted (doc_id, shingles) table — in a
    * stream that's the downstream foreachBatch join, keeping shingle
    * payloads out of both the shuffle AND the state store. A pair
    * sharing several bands emits once per shared band, all in the batch
    * where the later doc arrives — per-batch dropDuplicates in the sink
    * restores set semantics.
    *
    * Same operational caveats as [[simhashPairsStream]]: assumes unique
    * doc_ids (a re-ingested id would re-emit its pairs in a LATER batch,
    * beyond per-batch dedup). The r4 bounds mirror simhash: `maxIdle`
    * evicts idle buckets by processing-time timeout, `maxBucket` caps
    * stored ids per bucket so a hot boilerplate bucket emits O(cap)
    * candidates per arrival instead of O(bucket) — an explicit candidate
    * subset on hot buckets; exact-Jaccard verification downstream keeps
    * precision regardless. At scale back the store with RocksDB (tested
    * mode — see [[triplesStateful]]).
    */
  def minhashCandidatesStream(docs: Dataset[(Long, String)],
                              shingleN: Int = 3, numPerm: Int = 64,
                              bands: Int = 16,
                              maxIdle: Option[String] = None,
                              maxBucket: Int = Int.MaxValue): Dataset[(Long, Long)] = {
    require(numPerm % bands == 0)
    val rows = numPerm / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (maxIdle.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // shingle/signature/bucket arithmetic = Dedup.docShingles +
    // Hashes.minhash + Dedup.bandBucket — the SAME functions the batch
    // band rows use, so candidate-set equality holds by construction
    docs.flatMap { case (id, text) =>
      val sig = graft.nlp.Hashes.minhash(
        graft.ops.Dedup.docShingles(text, shingleN), numPerm)
      (0 until bands).iterator.map(b =>
        (graft.ops.Dedup.bandBucket(sig, b, rows), id))
    }.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (_: Long, rowsIt: Iterator[(Long, Long)], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = minhashGroup(rowsIt.toSeq.map(_._2), state, maxBucket)
            maxIdle.foreach(state.setTimeoutDuration)
            out
          }
      }
  }

  /** Shared per-group body of [[minhashCandidatesStream]] and its
    * event-time variant: `idSeq` = doc ids arriving in one band bucket.
    */
  private def minhashGroup(idSeq: Seq[Long], state: GroupState[BucketState],
                           maxBucket: Int): Iterator[(Long, Long)] = {
    val out = Vector.newBuilder[(Long, Long)]
    var ids = state.getOption.map(_.ids).getOrElse(Nil)
    var size = ids.size // ≤ maxBucket by construction
    idSeq.sorted.foreach { id =>
      ids.foreach { pid =>
        if (pid != id) out += ((math.min(pid, id), math.max(pid, id)))
      }
      if (size < maxBucket) { ids = id :: ids; size += 1 }
    }
    state.update(BucketState(ids))
    out.result().iterator
  }

  /** Event-time variant of [[minhashCandidatesStream]] — the dedup
    * horizon in EVENT time for replayed corpora (see
    * [[exactDedupStreamEventTime]]): band buckets are evicted when the
    * watermark passes their last arrival's event time plus `idleGapMs`.
    */
  def minhashCandidatesStreamEventTime(docs: Dataset[(Long, String, java.sql.Timestamp)],
                                       shingleN: Int = 3, numPerm: Int = 64,
                                       bands: Int = 16,
                                       watermarkDelay: String = "10 minutes",
                                       idleGapMs: Long = 30L * 60 * 1000,
                                       maxBucket: Int = Int.MaxValue)
  : Dataset[(Long, Long)] = {
    require(numPerm % bands == 0)
    val rows = numPerm / bands
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { case (id, text, ts) =>
        val sig = graft.nlp.Hashes.minhash(
          graft.ops.Dedup.docShingles(text, shingleN), numPerm)
        (0 until bands).iterator.map(b =>
          (graft.ops.Dedup.bandBucket(sig, b, rows), id, ts))
      }
      // watermark AFTER the fan-out (see simhashPairsStreamEventTime)
      .toDF("bucket", "doc_id", "ts")
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rowsIt: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seq = rowsIt.toSeq
            // state-carried max event time — see exactDedupStreamEventTime
            val lastEventMs = math.max(
              seq.iterator.map(_._3.getTime).foldLeft(0L)(math.max),
              state.getOption.map(_.lastEventMs).getOrElse(0L))
            val out = minhashGroup(seq.map(_._2), state, maxBucket)
            state.getOption.foreach(s =>
              state.update(s.copy(lastEventMs = lastEventMs)))
            state.setTimeoutTimestamp(
              math.max(lastEventMs + idleGapMs,
                state.getCurrentWatermarkMs() + 1))
            out
          }
      }
  }

  /** END-TO-END streaming MinHash dedup — the packaged form of the
    * "exact-Jaccard verification = downstream foreachBatch join" pattern
    * the candidate operators document. Per micro-batch of documents:
    *
    *  1. the batch's hashed shingle sets and band rows are appended to
    *     parquet stores under `storeDir`, one `batch_id=<id>` directory
    *     per batch written with overwrite — a REPLAYED batch after a
    *     failure rewrites its own directory, so the stores are
    *     idempotent under the streaming checkpoint's retry semantics;
    *  2. the batch's band rows join the FULL band-row store (which now
    *     includes the batch itself) on bucket — each unordered candidate
    *     pair surfaces exactly once, in the batch where its LATER member
    *     arrives (intra-batch pairs via self-inclusion + a < b);
    *  3. candidate id-pairs join BACK to the shingle store on both sides
    *     for exact-Jaccard verification (the same candidates-then-
    *     join-back shape as batch [[graft.ops.Dedup.minhashLsh]] — band
    *     rows and candidates stay payload-free), and verified pairs land
    *     in `outputDir/batch_id=<id>` (idempotent like the stores).
    *
    * Identical shingle/signature/bucket arithmetic to the batch operator
    * (Dedup.docShingles + Hashes.minhash + Dedup.bandBucket), so the
    * accumulated output over any prefix of batches EQUALS batch
    * `minhashLsh` over the accumulated corpus (parity tested). Assumes
    * unique doc_ids across the stream (the batch operator's contract).
    * Output rows are SET-semantic: a batch replayed after later batches
    * already ran re-joins against the grown store and may duplicate
    * pairs across batch_id directories (never lose any) — read the
    * output `.distinct()`, exactly like the candidate streams' sinks.
    *
    * Scale shape (r5 — the r4 form re-read the FULL band store each
    * batch, O(accumulated corpus) IO per micro-batch): both stores are
    * PARTITIONED by a hash-derived `part` key (`part =
    * pmod(xxhash64(join key), numParts)` — bucket for bands, doc_id for
    * shingles), and each batch reads ONLY the part directories its own
    * join keys hash into ([[readStoreParts]] — deterministic path-level
    * pruning, not optimizer-dependent). A trickle batch touches a few
    * directories of a corpus-sized store; the needed-part sets are
    * collected driver-side but are ≤ numParts ints by construction.
    * Pruning evidence (files read, pruned ≡ full-scan-filtered) is
    * pinned in StreamingKgSpec.
    */
  def minhashDedupStream(spark: SparkSession, inputDir: String,
                         outputDir: String, checkpointDir: String,
                         storeDir: String,
                         shingleN: Int = 3, numPerm: Int = 64,
                         bands: Int = 16, threshold: Double = 0.5,
                         numParts: Int = 64,
                         availableNow: Boolean = true): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val writer = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val shingled = batch.select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) =>
            (id, graft.ops.Dedup.docShingles(text, shingleN))
          }.toDF("doc_id", "shingles")
          .persist()
        if (shingled.limit(1).count() > 0) {
          shingled.withColumn("part", storePart(col("doc_id"), numParts))
            .write.mode("overwrite").partitionBy("part")
            .parquet(s"$storeDir/shingles/batch_id=$batchId")
          val batchBands = graft.ops.Dedup
            .bandedBuckets(shingled, numPerm, bands)
            .persist()
          batchBands.withColumn("part", storePart(col("bucket"), numParts))
            .write.mode("overwrite").partitionBy("part")
            .parquet(s"$storeDir/bands/batch_id=$batchId")
          // the parts THIS batch's buckets hash into — ≤ numParts ints
          val bandParts = batchBands
            .select(storePart(col("bucket"), numParts).as("part"))
            .distinct().as[Long].collect().toSet
          val allBands = readStoreParts(spark, s"$storeDir/bands", bandParts)
            .select("doc_id", "bucket")
          val cand = batchBands
            .join(allBands.select(col("doc_id").as("b"), col("bucket")),
              Seq("bucket"))
            .select(least(col("doc_id"), col("b")).as("a"),
              greatest(col("doc_id"), col("b")).as("b"))
            .filter(col("a") < col("b")).distinct()
            .persist()
          // shingle parts for the candidates' two id sides only
          val candParts = cand
            .select(explode(array(col("a"), col("b"))).as("doc_id"))
            .select(storePart(col("doc_id"), numParts).as("part"))
            .distinct().as[Long].collect().toSet
          val verified =
            if (candParts.isEmpty)
              // candidate-free batch: still write the (empty) output dir
              // so replays stay idempotent, exactly like the r4 form
              Seq.empty[(Long, Long, Double)].toDF("a", "b", "jaccard")
            else {
              val allShingles =
                readStoreParts(spark, s"$storeDir/shingles", candParts)
                  .select("doc_id", "shingles")
              cand
                .join(allShingles.select(col("doc_id").as("a"),
                  col("shingles").as("sha")), Seq("a"))
                .join(allShingles.select(col("doc_id").as("b"),
                  col("shingles").as("shb")), Seq("b"))
                .select(col("a"), col("b"), col("sha"), col("shb"))
                .as[(Long, Long, Array[Long], Array[Long])]
                .map { case (x, y, sa, sb) =>
                  val inter = sa.toSet.intersect(sb.toSet).size
                  (x, y, inter.toDouble / (sa.length + sb.length - inter))
                }.toDF("a", "b", "jaccard")
                .filter(col("jaccard") >= threshold)
            }
          verified.write.mode("overwrite")
            .parquet(s"$outputDir/batch_id=$batchId")
          cand.unpersist(false)
          batchBands.unpersist(false)
        }
        shingled.unpersist(false)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** `part` assignment shared by [[minhashDedupStream]]'s store writers
    * and pruned readers — both sides MUST use the same arithmetic or
    * pruning silently loses rows.
    */
  private[streaming] def storePart(key: org.apache.spark.sql.Column,
                                   numParts: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.xxhash64(key),
      org.apache.spark.sql.functions.lit(numParts.toLong))

  /** Read ONLY the `part=<p>` directories of a batch-versioned store
    * (`root/batch_id=N/part=p`) whose part value is in `parts` —
    * deterministic path-level pruning: the file listing never touches a
    * directory outside the requested part set, so per-batch IO is
    * proportional to the batch's OWN key footprint, not the accumulated
    * store ([[minhashDedupStream]] scale shape). One listing RPC per
    * batch directory; empty selection → empty frame.
    */
  private[streaming] def readStoreParts(spark: SparkSession, root: String,
                                        parts: Set[Long]): DataFrame = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs: Seq[String] =
      if (parts.isEmpty || !fs.exists(rootPath)) Nil
      else fs.listStatus(rootPath).toSeq.filter(_.isDirectory).flatMap { b =>
        fs.listStatus(b.getPath).toSeq.map(_.getPath).filter { p =>
          val n = p.getName
          n.startsWith("part=") &&
            scala.util.Try(n.stripPrefix("part=").toLong).toOption
              .exists(parts.contains)
        }.map(_.toString)
      }
    // callers only request parts derived from keys they just wrote (or
    // that earlier batches wrote), so an empty listing means a corrupted
    // or foreign store — fail loudly rather than silently drop pairs
    if (dirs.isEmpty)
      throw new IllegalStateException(
        s"no part directories under $root for parts=$parts")
    spark.read.option("basePath", root).parquet(dirs: _*)
  }

  /** State for [[sessionizeStream]]: the user's current session (start
    * micros — the session's stable identity) and the max event time
    * ever seen (the gap horizon, state-carried so a late-but-valid
    * arrival cannot shrink it — the [[exactDedupStreamEventTime]]
    * discipline).
    */
  final case class SessState(lastUs: Long, startUs: Long)

  /** Streaming SESSIONIZATION — the incremental form of
    * [[graft.ops.Events.sessionize]]: per-user state carries the gap
    * horizon and the open session's start; each arriving event joins
    * the current session or opens a new one under the SAME strict-> gap
    * rule in integer event-time microseconds. Emits (event_id, user_id,
    * session_start_us, is_start) — the session is identified by its
    * FIRST event's micros rather than a per-user ordinal, so state
    * eviction can never renumber later sessions (an ordinal dies with
    * the state; the start-time key is stable by construction; the batch
    * operator's ordinal and this key induce the same PARTITION of
    * events into sessions, which is what the parity test compares).
    * Within a micro-batch rows are processed in (ts, event_id) order —
    * the batch window order — so in-order arrival across batches yields
    * exactly the batch partitioning; an event arriving LATE after a
    * newer event advanced the horizon may split differently than the
    * batch sort (the inherent streaming/batch divergence of any online
    * sessionizer on late data; the watermark bounds how late that can
    * be). State evicts on event time once the watermark passes last
    * event + gap — semantically free for partitioning: any later event
    * exceeds the gap and opens a new session anyway. NULL event times
    * are DROPPED at ingest: a timeless event cannot be positioned
    * against an event-time horizon (and the engine's late-data
    * predicate would pass such a row through to a task-killing NPE);
    * the batch operator instead carries null-ts rows with a null
    * is_start — the one documented batch/stream divergence, pinned in
    * StreamingKgSpec.
    */
  def sessionizeStream(events: Dataset[(Long, java.sql.Timestamp, Long)],
                       gapMinutes: Int = 30,
                       watermarkDelay: String = "10 minutes")
  : Dataset[(Long, Long, Long, Boolean)] = {
    require(gapMinutes > 0)
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    events.toDF("event_id", "ts", "user_id")
      .filter(col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toVector.sortBy(r => (us(r._2), r._1))
            var st = state.getOption.orNull
            val out = sorted.map { case (eid, t, _) =>
              val u = us(t)
              val isStart = (st eq null) || u - st.lastUs > gapUs
              st = if (isStart) SessState(u, u)
              else SessState(math.max(st.lastUs, u), st.startUs)
              (eid, userId, st.startUs, isStart)
            }
            if (st ne null) {
              state.update(st)
              // ceiling division (r6, ADVICE r5): flooring micros->millis
              // could evict up to 999µs before last_event_time + gap, so a
              // boundary event (still in-session under the strict-> rule)
              // could meet evicted state and wrongly open a new session
              state.setTimeoutTimestamp(
                math.max((st.lastUs + 999L) / 1000L + gapMinutes.toLong * 60000L,
                  state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
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
