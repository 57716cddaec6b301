package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Entity linking / canonicalization — north_rule stage 3.
  *
  * The reference normalizes mentions via external DB ids
  * (`Entity.norms`, `data.py:1853-1863`; entity2key fallback to
  * lowercased text, `relations/new/sentence.py:174-180`) and pairs
  * abbreviations with the `y (x)` heuristic
  * (`relations/new/sentence.py:194-216`). There is no transitive merge in
  * the reference; our engine makes the merge explicit and distributed:
  *
  *  1. normalized-surface keys (graft.nlp.TextOps.normKey),
  *  2. SALTED two-phase aggregation of per-key stats (hot surface forms
  *     like "the system" would otherwise put one reducer on the critical
  *     path at 10^12 turns — AQE splits skewed joins but not skewed
  *     groupBy keys, so the salt is explicit),
  *  3. candidate alias pairs (exact key + synonym heuristics),
  *  4. DataFrame connected components (neighbor-min label propagation
  *     with path-halving pointer jumps, no GraphX/RDD) → canonical
  *     node_id.
  */
object Linking {

  /** Two-phase salted aggregation: per (class_id, norm) mention counts and
    * distinct-conversation counts. Phase 1 aggregates within
    * (key, salt) buckets — bounding any single reducer's input to
    * 1/`salts` of the hottest key — phase 2 merges the per-salt partials.
    * countDistinct cannot be salted losslessly, so phase 1 keeps the
    * per-salt conv sets as approx via HLL sketch when exact=false.
    */
  def nodeStats(mentions: Dataset[Mention], salts: Int = 16): DataFrame = {
    import mentions.sparkSession.implicits._
    val salted = mentions.toDF()
      .withColumn("salt", pmod(xxhash64($"conv_id"), lit(salts)))
    val phase1 = salted
      .groupBy($"class_id", $"norm", $"salt")
      .agg(count(lit(1)).as("n_mentions_p"),
        approx_count_distinct($"conv_id", 0.01).as("n_convs_p"))
    phase1
      .groupBy($"class_id", $"norm")
      .agg(sum($"n_mentions_p").as("n_mentions"),
        sum($"n_convs_p").as("n_convs"))
  }

  /** Exact per-key stats (small-cardinality path used by the DuckDB-oracled
    * driver query): the salt still bounds phase-1 reducers; distinct convs
    * are exact because the salt IS a partition of conv space
    * (salt = hash(conv_id) % salts ⇒ each conv lands in exactly one salt
    * bucket, so per-salt distinct counts add up losslessly).
    */
  def nodeStatsExact(mentions: Dataset[Mention], salts: Int = 16): DataFrame = {
    import mentions.sparkSession.implicits._
    val salted = mentions.toDF()
      .withColumn("salt", pmod(xxhash64($"conv_id"), lit(salts)))
    salted
      .groupBy($"class_id", $"norm", $"salt")
      .agg(count(lit(1)).as("n_mentions_p"),
        countDistinct($"conv_id").as("n_convs_p"))
      .groupBy($"class_id", $"norm")
      .agg(sum($"n_mentions_p").cast("long").as("n_mentions"),
        sum($"n_convs_p").cast("long").as("n_convs"))
  }

  /** Abbreviation/synonym candidate pairs from the `y (x)` pattern —
    * `relations/new/sentence.py:194-216`: a surface form immediately
    * followed by a parenthesized alternative names the same entity.
    * Emits (src, dst) node-key hashes per class, ready for
    * [[connectedComponents]] / [[nodes]] extraPairs.
    */
  def synonymPairs(sentences: DataFrame, classId: String): DataFrame = {
    val spark = sentences.sparkSession
    import spark.implicits._
    val re = java.util.regex.Pattern.compile(
      "([\\p{L}\\p{N}_]+)\\s*\\(\\s*([\\p{L}\\p{N}_]+)\\s*\\)")
    sentences.select(col("sent_text")).as[String].flatMap { s =>
      val m = re.matcher(s)
      val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
      while (m.find()) {
        out += ((graft.nlp.TextOps.normKey(m.group(1)),
          graft.nlp.TextOps.normKey(m.group(2))))
      }
      out
    }.toDF("long_form", "short_form")
      .distinct()
      .select(
        xxhash64(lit(classId), col("long_form")).as("src"),
        xxhash64(lit(classId), col("short_form")).as("dst"))
  }

  /** Connected components over an undirected edge list (src, dst) of Long
    * node ids: iterative NEIGHBOR-MIN label propagation with DataFrame
    * joins only. Each round every node adopts the minimum component id
    * among itself and its neighbors, then a PATH-HALVING pointer jump
    * (comp ← comp-of-comp) doubles the label's hop distance, so
    * convergence is O(log(diameter)) rounds. (Same asymptotics as the
    * small-star/large-star formulation; this is the simpler two-join
    * variant.) `localCheckpoint` cuts lineage growth per round;
    * convergence is detected with a cheap Σ(comp) aggregate.
    *
    * Returns (node, component) where component = min node id reachable.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .union(edges.select(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .localCheckpoint()
    // LAZY localCheckpoint throughout the loop (r4): local checkpointing
    // is cache-based, so the Σ aggregate below materializes the cached
    // partitions AND truncates lineage in ONE job — the eager form paid
    // a separate checkpoint job before every Σ job (2 barriers/round;
    // barrier latency is this sandbox's dominant CC cost, BENCH.md
    // r3 "identical-plan rep spread").
    var comp = sym.select($"src".as("node")).distinct()
      .withColumn("comp", $"node")
      .localCheckpoint(false)
    // Σcomp decreases strictly every round until fixpoint (labels are
    // per-node monotone non-increasing) — a single cheap aggregate
    // doubles as the convergence test (no extra join). decimal(38,0):
    // node ids span the full 64-bit hash range, a long sum overflows
    // under ANSI; decimal keeps the sum exact up to ~1e19 nodes.
    // coalesce: sum over an empty/self-loop-only graph is NULL.
    def sigmaOf(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum($"comp".cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).first().getDecimal(0)
    var sigma = sigmaOf(comp)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor minimum: for each node, min comp over neighbors ∪ self
      val nbrMin = sym.join(comp, sym("dst") === comp("node"))
        .groupBy(sym("src").as("node")).agg(min($"comp").as("nbr_comp"))
      val next = comp.join(nbrMin, Seq("node"), "left")
        .select($"node",
          least($"comp", coalesce($"nbr_comp", $"comp")).as("comp"))
      // pointer-jumping: comp ← comp of comp (path halving, makes the
      // label hop two steps per round instead of one); the LAZY
      // checkpoint is materialized by the Σ aggregate right below —
      // one job per round computes the jump, caches it (lineage cut)
      // and tests convergence
      val jumped = next.as("a")
        .join(next.as("b"), col("a.comp") === col("b.node"), "left")
        .select(col("a.node").as("node"),
          least(col("a.comp"), coalesce(col("b.comp"), col("a.comp"))).as("comp"))
        .localCheckpoint(false)
      val newSigma = sigmaOf(jumped)
      comp = jumped
      converged = newSigma.compareTo(sigma) == 0
      sigma = newSigma
      iter += 1
    }
    comp
  }

  /** Full linking stage: mentions → nodes table with canonical ids.
    * Alias pairs = mentions sharing a normalized key (trivial merge) plus
    * optional extra pairs (e.g. synonym heuristics); components collapse
    * transitive alias chains. node_id is the min key-hash in the
    * component — deterministic, no driver-side sequence.
    */
  def nodes(mentions: Dataset[Mention], extraPairs: Option[DataFrame] = None): DataFrame = {
    val spark = mentions.sparkSession
    import spark.implicits._
    val keyed = mentions.toDF()
      .select($"class_id", $"norm", xxhash64($"class_id", $"norm").as("kid"))
    val stats = nodeStatsExact(mentions)
      .join(keyed.dropDuplicates("class_id", "norm"), Seq("class_id", "norm"))
    extraPairs match {
      case None =>
        stats.select($"kid".as("node_id"), $"norm".as("canonical"),
          $"class_id", $"n_mentions", $"n_convs")
      case Some(pairs) =>
        val comp = connectedComponents(pairs)
        stats.join(comp, stats("kid") === comp("node"), "left")
          .select(coalesce($"comp", $"kid").as("node_id"),
            $"norm".as("canonical"), $"class_id", $"n_mentions", $"n_convs")
    }
  }
}
