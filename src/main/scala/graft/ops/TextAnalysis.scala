package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.nlp.{Hashes, LangId}

/** Text-analysis operators for training-data curation: quality scoring,
  * language identification, token statistics, document fingerprinting.
  * All narrow (no shuffle) except the explicit aggregations.
  */
object TextAnalysis {

  /** Integer-valued quality metrics (bit-exact across engines; see
    * graft.nlp.LangId.quality). Pure column expressions — fully codegen'd
    * and DuckDB-oracle-able.
    */
  def quality(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      size(words).cast("bigint").as("n_words"),
      size(array_distinct(words)).cast("bigint").as("n_distinct"),
      aggregate(transform(words, w => length(w)), lit(0),
        (acc, x) => greatest(acc, x)).cast("bigint").as("max_word_len"),
      size(filter(words, w => w.isin("the", "a"))).cast("bigint").as("stopword_count"),
      (size(array_distinct(words)).cast("double") / size(words)).as("distinct_ratio")
    )
  }

  /** Language-ID via the deterministic stopword/script heuristic
    * (graft.nlp.LangId) — typed map, ScalaTest-covered; rows-only driver
    * check (not SQL-expressible).
    */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, LangId.detect(t)) }
      .toDF("doc_id", "lang_pred")
  }

  /** BPE-ish token statistics: alpha runs, digit runs, single
    * non-alphanumerics (regexp-based, oracle-able).
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
    docs.select(
      col("doc_id"),
      size(toks).cast("bigint").as("n_tokens"),
      size(array_distinct(toks)).cast("bigint").as("n_distinct_tokens"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1 — the
    * standard pre-training quality filters for boilerplate/loop text):
    * per document, the character MASS of the most frequent word bigram
    * (count × bigram chars / total chars) and of all duplicated
    * word `n`-grams (Σ count × gram chars / total chars, grams with
    * count ≥ 2). These are the occurrence-MASS variants: the paper's
    * character-coverage form needs per-document interval union, which is
    * neither declarative nor oracle-able — mass is deterministic, maps
    * to two groupBys, and upper-bounds coverage (a filter thresholding
    * mass is strictly more aggressive, the conservative direction for
    * dedup-style filtering). Tie-break for "the" top bigram: max
    * (count, gram) lexicographically — identical rule in the SQL oracle.
    *
    * Scale shape: two explode→groupBy aggregations keyed by
    * (doc_id, gram) with map-side partial aggregation; grams never
    * leave their doc's rows except inside those keyed shuffles.
    */
  def repetitionStats(docs: DataFrame, n: Int = 5): DataFrame = {
    val w = docs.select(col("doc_id"), split(col("text"), " ").as("ws"),
      length(col("text")).as("n_chars"))
    def grams(k: Int) = when(size(col("ws")) >= k,
      expr(s"transform(sequence(0, size(ws) - $k), i -> array_join(slice(ws, i + 1, $k), ' '))"))
      .otherwise(array().cast("array<string>"))
    val bg = w.select(col("doc_id"), col("n_chars"), explode(grams(2)).as("g"))
      .groupBy("doc_id", "n_chars", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_chars")
      .agg(max(struct(col("c"), col("g"))).as("top"))
      .select(col("doc_id"), col("top.c").as("top_c"),
        (col("top.c") * length(col("top.g"))).as("top_chars"))
    val dup = w.select(col("doc_id"), explode(grams(n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .groupBy("doc_id")
      .agg(sum(col("c") * length(col("g"))).as("dup_chars"))
    w.select(col("doc_id"), col("n_chars"))
      .join(bg, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars").cast("bigint").as("n_chars"),
        coalesce(col("top_c"), lit(0L)).cast("bigint").as("top_bigram_count"),
        when(col("n_chars") > 0, round(coalesce(col("top_chars"), lit(0L))
          .cast("double") / col("n_chars"), 6)).otherwise(lit(0.0))
          .as("top_bigram_frac"),
        when(col("n_chars") > 0, round(coalesce(col("dup_chars"), lit(0L))
          .cast("double") / col("n_chars"), 6)).otherwise(lit(0.0))
          .as(s"dup_${n}gram_frac"))
  }

  /** Composite curation filter — the C4/Gopher-style keep/drop decision
    * a pre-training pipeline actually applies, composed from the oracled
    * signals ([[quality]] + [[repetitionStats]]): every violated rule
    * contributes a reason (fixed order, comma-joined so the column is
    * engine-portable), keep = no reasons. Thresholds are per-corpus
    * knobs; rounded repetition fractions are compared so the decision is
    * bit-stable across engines.
    */
  def curationFilter(docs: DataFrame, minWords: Int = 20, maxWordLen: Int = 25,
                     minDistinctRatio: Double = 0.45,
                     maxTopBigramFrac: Double = 0.06,
                     maxDupNgramFrac: Double = 0.1): DataFrame = {
    val q = quality(docs).select(col("doc_id"), col("n_words"),
      col("max_word_len"), col("distinct_ratio"))
    val r = repetitionStats(docs).select(col("doc_id"),
      col("top_bigram_frac"), col("dup_5gram_frac"))
    q.join(r, Seq("doc_id"))
      .select(col("doc_id"), concat_ws(",",
        when(col("n_words") < minWords, lit("too_few_words")),
        when(col("max_word_len") > maxWordLen, lit("long_word")),
        when(col("distinct_ratio") < minDistinctRatio, lit("low_diversity")),
        when(col("top_bigram_frac") > maxTopBigramFrac, lit("top_bigram_repetition")),
        when(col("dup_5gram_frac") > maxDupNgramFrac, lit("dup_ngram_repetition"))
      ).as("reasons"))
      .select(col("doc_id"), (col("reasons") === "").as("keep"), col("reasons"))
  }

  /** Rolling-hash document fingerprint (base-257 poly mod 2^61-1) via
    * the native codegen expression graft.functions.TextFingerprint —
    * stays in WholeStageCodegen, no row deserialization. Bit-identical
    * to graft.nlp.Hashes.fingerprint (tested); rows-only driver check
    * plus ScalaTest goldens.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), expr("graft_fingerprint(text)").as("fingerprint"))
  }

  /** Training-sequence PACKING: assign each document (in doc_id order) a
    * sequence id so that consecutive sequences hold `budget` tokens of
    * contiguous documents — `seq_id = prefix_tokens_before div budget`,
    * the boundary-straddling "chunked" packing that concatenate-and-split
    * samplers use when assembling pre-training batches. Output:
    * (doc_id, tokens, seq_id).
    *
    * Scale shape: a running sum over a GLOBAL order must not be written
    * as one corpus-wide window — a window without PARTITION BY plans a
    * single task. This is a DISTRIBUTED PREFIX SUM, fully LAZY (one job,
    * no driver collect — an eager totals collect would be a second
    * steal-exposed barrier, the InfoGain lesson): per-chunk running sums
    * (chunk = doc_id div chunkSize, an order-preserving key) run as
    * parallel partitioned windows; the per-chunk TOTALS aggregate — one
    * row per chunk, tiny by construction (10^10 docs / 2^20-doc chunks ≈
    * 10k rows) — feeds the ONLY unpartitioned window in the plan (over
    * chunk-count rows, not corpus rows), and the exclusive offsets
    * rejoin by broadcast.
    */
  def pack(docs: DataFrame, budget: Long, chunkSize: Long = 1L << 20): DataFrame = {
    require(budget > 0 && chunkSize > 0)
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("tokens"),
      floor(col("doc_id") / chunkSize).cast("long").as("chunk"))
    val w = Window.partitionBy("chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = toks.withColumn("local_before",
      coalesce(sum("tokens").over(w), lit(0L)))
    // exclusive prefix offsets over the chunk totals — chunk-count rows
    val wOff = Window.orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = toks.groupBy("chunk").agg(sum("tokens").as("t"))
      .select(col("chunk"),
        coalesce(sum("t").over(wOff), lit(0L)).as("chunk_offset"))
    withLocal.join(broadcast(offDf), Seq("chunk"))
      .select(col("doc_id"), col("tokens"),
        expr("(chunk_offset + local_before) div " + budget).as("seq_id"))
  }

  /** PII detection + redaction — the C4-style privacy scrub every
    * published pre-training pipeline runs before release: per document,
    * counts of e-mail addresses, IPv4 addresses and phone-like digit
    * runs, plus the text with each match replaced by a typed placeholder
    * (applied email → ip → phone, so a later pattern can never match
    * inside an earlier placeholder). Output:
    * (doc_id, n_emails, n_ips, n_phones, redacted).
    *
    * The patterns are deliberately RE2-compatible (no lookaround, no
    * backreferences, ASCII classes only) so the Java-regex engine side
    * and the RE2-based DuckDB oracle produce identical match bounds —
    * and so the scan stays in linear time on adversarial inputs (a
    * backtracking-prone pattern is a CPU bomb at 100 TB).
    *
    * Scale shape: a pure narrow map — no shuffle, fully codegen'd
    * column expressions.
    */
  def piiScan(docs: DataFrame): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val phone = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
    def n(c: org.apache.spark.sql.Column, re: String) =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("bigint")
    // each count runs on the text AFTER the earlier redactions, so the
    // counts describe exactly the placeholders present in `redacted`
    // (e.g. the digits of an e-mail local part are [EMAIL] by the time
    // the phone pattern runs — they must not ALSO count as a phone);
    // NULL text scans as empty (0 counts, "" redacted) in both engines
    val t0 = coalesce(col("text"), lit(""))
    val t1 = regexp_replace(t0, email, "[EMAIL]")
    val t2 = regexp_replace(t1, ip, "[IP]")
    docs.select(col("doc_id"),
      n(t0, email).as("n_emails"),
      n(t1, ip).as("n_ips"),
      n(t2, phone).as("n_phones"),
      regexp_replace(t2, phone, "[PHONE]").as("redacted"))
  }

  /** Deterministic per-domain Bernoulli sampling — the selection half of
    * corpus MIXING: given per-domain sampling `rates` in [0, 1] (mixture
    * weights computed upstream, e.g. [[temperatureRates]] or a
    * DoReMi-style optimizer), keep each document iff its rolling
    * fingerprint falls under the domain's threshold. Output one row per
    * document: (doc_id, source, bucket, keep).
    *
    * Why hash-threshold and not `sample()`: the decision is a pure
    * function of the document text — reproducible across runs, engines
    * and partitionings, mergeable across shards (two samples of disjoint
    * shards ARE the sample of the union), and requires no count barrier
    * or RNG state. Rates are quantized to integer millionths so the
    * comparison is integer-exact cross-engine (no float-boundary flips).
    * Domains absent from `rates` default to keep (threshold 1e6).
    *
    * Scale shape: one narrow map over the corpus (the fingerprint is the
    * codegen Expression) + a broadcast join against the domain-count-
    * sized rate table. No shuffle of corpus rows at all.
    */
  def domainSample(docs: DataFrame, rates: Map[String, Double],
                   domainCol: String = "source"): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0))
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val spark = docs.sparkSession
    import spark.implicits._
    val thresholds = rates.toSeq
      .map { case (s, r) => (s, math.round(r * 1e6)) }
      .toDF(domainCol, "thr")
    docs.join(broadcast(thresholds), Seq(domainCol), "left")
      .select(col("doc_id"), col(domainCol).as("source"),
        pmod(expr("graft_fingerprint(text)"), lit(1000000L)).as("bucket"),
        coalesce(col("thr"), lit(1000000L)).as("thr"))
      .select(col("doc_id"), col("source"), col("bucket"),
        (col("bucket") < col("thr")).as("keep"))
  }

  /** Temperature-scaled domain mixture rates (the standard multilingual /
    * multi-domain rebalancing rule, e.g. mC4): sampling weight per domain
    * ∝ share^tau renormalized, converted to per-domain Bernoulli rates
    * that hit `targetFrac` of the corpus in expectation (capped at 1).
    * tau = 1 keeps natural proportions, tau = 0 equalizes domains,
    * 0 < tau < 1 upsamples the tail. Returns the model-sized
    * (source, rate) map for [[domainSample]] — domain-count rows, the
    * one legitimately driver-sized artifact in the mixing story.
    */
  def temperatureRates(docs: DataFrame, tau: Double, targetFrac: Double,
                       domainCol: String = "source"): Map[String, Double] = {
    require(targetFrac > 0.0 && targetFrac <= 1.0)
    val counts = docs.groupBy(domainCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = counts.map(_._2).sum.toDouble
    val weights = counts.map { case (s, n) => (s, n, math.pow(n / total, tau)) }
    val wSum = weights.map(_._3).sum
    weights.map { case (s, n, w) =>
      s -> math.min(1.0, targetFrac * total * (w / wSum) / n)
    }.toMap
  }

  /** Per-domain unigram KL divergence from the whole-corpus word
    * distribution — the drift diagnostic of a mixing pipeline (how far
    * each source's language deviates from the mixture that
    * [[temperatureRates]]/[[domainSample]] produce; rising KL on a
    * domain is the standard signal that its share or its content
    * changed). KL(p_s ‖ p_c) = Σ_w p_s(w)·log₂(p_s(w)/p_c(w)) is EXACT
    * with no smoothing: every word of a domain is in the corpus by
    * construction (domain ⊆ corpus), and absent words contribute 0 by
    * the p·log p convention. Output: (source, n_words, kl_bits
    * [rounded 6dp]); kl_bits ≥ 0, and ≡ 0 for a single-domain corpus.
    *
    * Scale shape: ONE corpus pass builds the (source, word) count table
    * (keyed aggregation, map-side partials), checkpointed EAGERLY
    * because its four consumers include broadcast exchanges (the
    * [[perplexityBands]] concurrency lesson); domain totals, corpus
    * word counts and the grand total all DERIVE from that table —
    * domain-count- / vocab- / 1-row-sized respectively, never a second
    * corpus scan. The per-word join is keyed on `word` with the tiny
    * domain-totals table broadcast.
    */
  def domainKl(docs: DataFrame): DataFrame = {
    val sw = docs.select(col("source"), explode(split(col("text"), " ")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("c_sw"))
      .localCheckpoint(true)
    val s = sw.groupBy("source").agg(sum("c_sw").as("n_s"))
    val cw = sw.groupBy("word").agg(sum("c_sw").as("c_cw"))
    val n = sw.agg(sum("c_sw").as("n_c"))
    val ln2 = 0.6931471805599453
    sw.join(cw, Seq("word"))
      .join(broadcast(s), Seq("source"))
      .crossJoin(broadcast(n))
      .select(col("source"), col("n_s"),
        ((col("c_sw") / col("n_s")) *
          (log((col("c_sw") / col("n_s")) / (col("c_cw") / col("n_c"))) / ln2))
          .as("term"))
      .groupBy("source", "n_s")
      .agg(round(sum("term"), 6).as("kl_bits"))
      .select(col("source"), col("n_s").cast("long").as("n_words"),
        col("kl_bits"))
  }

  /** Feature vector of one document for the trained quality classifier:
    * L1-normalized hashed unigram counts (the linear fastText shape —
    * the mean of hashed one-hot word vectors) plus bucketed structural
    * signals (log2 word-count bucket, rounded mean word length, decile
    * of the top unigram's frequency) so the model can express the
    * length/diversity/repetition rules heuristic filters hand-code.
    * Deterministic, allocation-light, shared verbatim by training and
    * scoring so the two can never featurize differently.
    */
  private[graft] def qualityFeatures(text: String): RelationScoring.Feats = {
    val ws = text.split(" ")
    val n = ws.length
    val inc = 1.0 / n
    // hashed-index accumulation with ONE reusable StringBuilder — the
    // scoring-hot-path discipline (never materialize a String per token;
    // hash-colliding features sum, exactly hashFeats' contract). h is
    // non-negative (< Dims), so Long keys sort like the Int indices.
    val m = scala.collection.mutable.LongMap.empty[Double]
    val sb = new java.lang.StringBuilder(24)
    var chars = 0
    var maxTf = 0.0
    var i = 0
    while (i < n) {
      val w = ws(i)
      chars += w.length
      sb.setLength(0); sb.append("w:").append(w)
      val k = RelationScoring.h(sb).toLong
      val v = m.getOrElse(k, 0.0) + inc
      m.update(k, v)
      if (v > maxTf) maxTf = v
      i += 1
    }
    def bump(name: String): Unit = {
      sb.setLength(0); sb.append(name)
      val k = RelationScoring.h(sb).toLong
      m.update(k, m.getOrElse(k, 0.0) + 1.0)
    }
    bump("nw:" + (63 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1))))
    bump("awl:" + math.round(chars.toDouble / math.max(n, 1)))
    bump("mtf:" + math.min((maxTf * 10).toInt, 10))
    val keys = m.keysIterator.toArray
    java.util.Arrays.sort(keys)
    val idx = new Array[Int](keys.length)
    val vals = new Array[Double](keys.length)
    var j = 0
    while (j < keys.length) { idx(j) = keys(j).toInt; vals(j) = m(keys(j)); j += 1 }
    RelationScoring.Feats(idx, vals)
  }

  /** Trained QUALITY CLASSIFIER — the learned replacement for
    * [[curationFilter]]'s hand-set thresholds (the fastText-style
    * quality model of C4/CCNet/DataComp-LM pipelines: a linear model
    * over hashed bag-of-words). Labels default to WEAK SUPERVISION by
    * the heuristic filter itself — the standard bootstrap: train on the
    * rules, generalize past them to content the rules can't see — or
    * pass a curated (doc_id, keep) table for gold labels. Training is
    * [[RelationScoring.trainDistributed]] (iterative parameter mixing:
    * per-partition Pegasos epochs, model-sized averaging; the data
    * never collects to the driver), so the returned model is the only
    * driver-sized artifact, persistable via ModelIO like the SVM/CRF.
    */
  def trainQualityClassifier(docs: DataFrame,
                             labels: DataFrame = null,
                             rounds: Int = 3,
                             epochsPerRound: Int = 3,
                             shards: Int = 0): RelationScoring.LinearModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lab = Option(labels).getOrElse(curationFilter(docs).select("doc_id", "keep"))
    val data0 = docs.select(col("doc_id"), col("text"))
      .join(lab.select(col("doc_id"), col("keep")), Seq("doc_id"))
      .select(col("text"), col("keep")).as[(String, Boolean)]
      .map { case (t, k) =>
        val f = qualityFeatures(t)
        RelationScoring.TrainRow(f.idx, f.value, if (k) 1 else -1)
      }
    // parameter mixing averages per-shard models — a shard needs enough
    // rows to learn from (sample-scale corpora at full parallelism get
    // 2-row shards and average to noise). `shards` > 0 pins the width;
    // 0 keeps the join's natural partitioning (the at-scale default,
    // where every shard is large).
    val data = if (shards > 0) data0.repartition(shards) else data0
    RelationScoring.trainDistributed(data, rounds, epochsPerRound)
  }

  /** Score documents with a trained quality model: (doc_id, q_score,
    * pred_keep) with pred_keep = q_score > 0. A broadcast narrow map —
    * the [[RelationScoring.scoreEdge]] discipline: the model rides the
    * broadcast, the corpus never shuffles.
    */
  def scoreQuality(docs: DataFrame,
                   model: RelationScoring.LinearModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, bc.value.score(qualityFeatures(t))) }
      .toDF("doc_id", "q_score")
      .withColumn("pred_keep", col("q_score") > 0.0)
  }

  /** Per-domain TF-IDF term SIGNATURES — the top-k terms that
    * characterize each source against the rest of the corpus (tf =
    * term count within the domain, idf = ln(#domains / #domains
    * containing the term), the classic formulation). The standard
    * audit companion to [[domainKl]]: KL says HOW FAR a domain's
    * language drifted from the mixture, the signature says WHICH terms
    * drive it — a drifting crawl source surfaces its new boilerplate
    * here before any downstream metric moves. Output: (source, word,
    * tf, score [rounded 6dp], rk ∈ 1..k) ranked per source by
    * (rounded score DESC, word ASC) — ranking on the ROUNDED score so
    * the order is reproducible across engines (sub-6dp ULP differences
    * in ln cannot flip it).
    *
    * Scale shape: the same ONE-corpus-pass (source, word) count table
    * as [[domainKl]], checkpointed eagerly for the same reason (its
    * consumers include a broadcast exchange — the 1-row domain-count
    * aggregate); document frequency is a vocab-sized keyed aggregate
    * joined back on `word`; the per-source top-k runs as a rank-limit
    * window, which Spark's WindowGroupLimit rewrites into map-side
    * partial top-k — each reducer receives only k candidates per
    * (partition, source), never a domain's full vocabulary.
    */
  def domainSignatures(docs: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1)
    val tf = docs.select(col("source"), explode(split(col("text"), " ")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val ns = tf.agg(countDistinct("source").cast("double").as("ns"))
    val dfT = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("word").asc)
    tf.join(dfT, Seq("word"))
      .crossJoin(broadcast(ns))
      .select(col("source"), col("word"), col("tf"),
        round(col("tf").cast("double") * log(col("ns") / col("df")), 6)
          .as("score"))
      // filter BEFORE the cast: InferWindowGroupLimit pattern-matches a
      // predicate directly on the rank attribute, and that rewrite (map-
      // side partial top-k) is the operator's scale story
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("source"), col("word"), col("tf"), col("score"),
        col("rk").cast("bigint").as("rk"))
  }

  /** Bigram language model trained on a reference corpus — the MODEL half
    * of the CCNet-style perplexity filter (Wenzek et al. 2020 filter
    * corpora by LM perplexity; the reference LM there is KenLM — here it
    * is an add-one-smoothed bigram model the engine trains itself, so the
    * whole loop is hermetic). Rows: (ctx, word, c) with ctx = previous
    * token or the sentinel `<s>` at position 0. The model is a TABLE (the
    * ModelIO stance): corpus-sized vocabularies never bottleneck on a
    * driver or a broadcast; scoring joins against it ([[perplexity]]).
    */
  def bigramLm(ref: DataFrame): DataFrame =
    docBigrams(ref).groupBy("ctx", "word").agg(count(lit(1)).as("c"))

  /** (doc_id, n, ctx, word) bigram rows of every document — shared by
    * training and scoring so the two can never tokenize differently.
    */
  private def docBigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n"),
        explode(expr(
          "transform(sequence(1, size(ws)), i -> " +
            "struct(CASE WHEN i = 1 THEN '<s>' ELSE ws[i-2] END AS ctx, ws[i-1] AS word))"))
          .as("bg"))
      .select(col("doc_id"), col("n"), col("bg.ctx"), col("bg.word"))

  /** Per-document cross-entropy under a [[bigramLm]] model table —
    * the scoring half of the perplexity filter. For every document:
    * xent_bits = −(1/n) Σᵢ log₂ p(wᵢ | ctxᵢ) with add-one smoothing
    * p(w|c) = (count(c,w) + 1) / (count(c) + V), V = model vocabulary
    * size. Unseen words/contexts degrade gracefully (counts coalesce to
    * 0). Output: (doc_id, n_tokens, xent_bits [rounded 6dp]) — threshold
    * downstream (curation pipelines keep the low-perplexity head or the
    * middle band; the cut point is a per-corpus knob, not baked in here).
    *
    * Scale shape: doc bigrams are consolidated per (doc_id, ctx, word)
    * BEFORE the model join, so the join shuffles distinct-gram rows, not
    * token rows; context totals and the vocab size derive from the model
    * table itself (one aggregation + a 1-row broadcast cross join — no
    * driver barrier, the InfoGain lesson); all aggregations are keyed
    * with map-side partials. The hot-context skew (`the`, `<s>`) is the
    * classic AQE skew-join case; at broadcastable model sizes Spark's
    * autobroadcast removes the shuffle entirely.
    *
    * The model table is PERSISTED here (it feeds three branches — the
    * gram join, the context totals and the vocab count; unpersisted,
    * Catalyst recomputes the whole training explode per branch: measured
    * 4 corpus scans instead of 2 on the self-scoring query). It is
    * model-sized, stays cached after return, and the caller owns
    * unpersist — the tagWithTable lifecycle contract.
    */
  def perplexity(docs: DataFrame, lm: DataFrame): DataFrame = {
    val lmP = lm.persist()
    val ctxTot = lmP.groupBy("ctx").agg(sum("c").as("ct"))
    val vocab = lmP.agg(countDistinct(col("word")).cast("long").as("v"))
    val grams = docBigrams(docs)
      .groupBy("doc_id", "n", "ctx", "word").agg(count(lit(1)).as("m"))
    val ln2 = 0.6931471805599453
    grams
      .join(lmP, Seq("ctx", "word"), "left")
      .join(ctxTot, Seq("ctx"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n"),
        (col("m") * (log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (coalesce(col("ct"), lit(0L)) + col("v"))) / ln2)).as("term"))
      .groupBy("doc_id", "n")
      .agg(round(-sum(col("term")) / col("n"), 6).as("xent_bits"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("xent_bits"))
  }

  /** DSIR-style importance weight per document (Xie et al. 2023 select
    * pretraining data by the likelihood ratio between a TARGET-domain
    * model and a RAW-corpus model; their features are hashed n-grams —
    * here both models are the engine's own add-one [[bigramLm]] tables,
    * so the whole loop stays hermetic). For every document:
    * llr_bits = (1/n) Σᵢ log₂ (p_target(wᵢ|ctxᵢ) / p_raw(wᵢ|ctxᵢ))
    * — the per-token log-likelihood ratio in bits, equivalently
    * xent_raw − xent_target. Positive ⇒ the doc looks more like the
    * target domain than the background corpus; resampling keeps the
    * high-llr head (the cut point / resampling temperature is a
    * downstream knob, the [[perplexity]] stance). Output:
    * (doc_id, n_tokens, llr_bits [rounded 6dp]).
    *
    * Scale shape: the two model tables merge FIRST — a full outer join
    * on (ctx, word) and one on ctx, both model-sized — so the
    * corpus-gram table pays exactly [[perplexity]]'s plan (one
    * consolidation, one (ctx, word) join, one ctx join, a 1-row
    * broadcast cross join for the two vocab sizes), NOT four chained
    * joins; grams unseen by either model coalesce to the add-one floor,
    * so disjoint reference corpora are handled, not assumed away. Both
    * models are persisted here (each feeds three branches: the merge,
    * the context totals, the vocab count); they are model-sized and the
    * caller owns unpersist — the tagWithTable lifecycle contract.
    */
  def importanceWeights(docs: DataFrame, targetLm: DataFrame,
                        rawLm: DataFrame): DataFrame = {
    val tP = targetLm.persist()
    val rP = rawLm.persist()
    val lmBoth = tP.select(col("ctx"), col("word"), col("c").as("c_t"))
      .join(rP.select(col("ctx"), col("word"), col("c").as("c_r")),
        Seq("ctx", "word"), "full")
    val ctxBoth = tP.groupBy("ctx").agg(sum("c").as("ct_t"))
      .join(rP.groupBy("ctx").agg(sum("c").as("ct_r")), Seq("ctx"), "full")
    val vocab = tP.agg(countDistinct(col("word")).cast("long").as("v_t"))
      .crossJoin(rP.agg(countDistinct(col("word")).cast("long").as("v_r")))
    val grams = docBigrams(docs)
      .groupBy("doc_id", "n", "ctx", "word").agg(count(lit(1)).as("m"))
    val ln2 = 0.6931471805599453
    val pT = (coalesce(col("c_t"), lit(0L)) + lit(1.0)) /
      (coalesce(col("ct_t"), lit(0L)) + col("v_t"))
    val pR = (coalesce(col("c_r"), lit(0L)) + lit(1.0)) /
      (coalesce(col("ct_r"), lit(0L)) + col("v_r"))
    grams
      .join(lmBoth, Seq("ctx", "word"), "left")
      .join(ctxBoth, Seq("ctx"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n"),
        (col("m") * ((log(pT) - log(pR)) / ln2)).as("term"))
      .groupBy("doc_id", "n")
      .agg(round(sum(col("term")) / col("n"), 6).as("llr_bits"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("llr_bits"))
  }

  /** CCNet head/middle/tail banding (Wenzek et al. 2020 split each
    * language's corpus into perplexity tertiles and keep the head/middle
    * bands): every (doc_id, lang, xent_bits) row gets a `band` from
    * EXACT per-language tertile cutoffs — c1 = min xent with
    * cum·3 ≥ n, c2 = min xent with cum·3 ≥ 2n over the ascending
    * per-language cumulative doc count (integer arithmetic, no
    * floating-point quantile estimate); band = head if xent ≤ c1,
    * middle if ≤ c2, else tail. Ties share a band by construction.
    *
    * Scale shape: exact per-group order statistics WITHOUT a
    * single-task-per-language sort — the per-language cumulative count
    * is the [[pack]] distributed prefix sum applied to the
    * (lang, xent) value histogram: per-(lang, chunk) partitioned
    * running sums (chunk = ⌊xent·100⌋, order-preserving), per-chunk
    * totals whose exclusive offsets come from a window over
    * chunk-count rows (never corpus rows), offsets rejoined by
    * broadcast. The histogram itself is a keyed aggregation with
    * map-side partials; the cutoff table is one row per language and
    * broadcasts back onto the corpus — the only corpus-wide operations
    * are the histogram groupBy and that broadcast join.
    *
    * `scored` feeds TWO branches (the histogram and the final band
    * join) and is typically an expensive subtree (the [[perplexity]]
    * model join), so it is lazily local-checkpointed here and
    * materialized exactly once by the EAGER histogram checkpoint below
    * (the kg_mention_eval lesson: unpersisted multi-branch inputs
    * recompute per branch, and lazily-cached inputs race when consumed
    * by concurrently-materialized branches). Per-language totals derive
    * from the histogram, never from a third corpus pass.
    */
  def perplexityBands(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sP = scored.localCheckpoint(false)
    // the histogram feeds three branches, two of them BROADCAST
    // exchanges that materialize on separate driver threads — the
    // concurrent-consumption case where a lazy checkpoint races (the
    // kg_mention_eval eager-toks lesson). Checkpoint it EAGERLY: the
    // one up-front job materializes the lazily-checkpointed sP in the
    // same pass (sequentially, no race), the histogram itself is
    // value-cardinality-sized, and every downstream branch reads cache
    val hist = sP.groupBy("lang", "xent_bits").agg(count(lit(1)).as("k"))
      .withColumn("chunk", floor(col("xent_bits") * 100).cast("long"))
      .localCheckpoint(true)
    val wLoc = Window.partitionBy("lang", "chunk").orderBy("xent_bits")
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = hist.withColumn("local_cum", sum("k").over(wLoc))
    val wOff = Window.partitionBy("lang").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist.groupBy("lang", "chunk").agg(sum("k").as("t"))
      .select(col("lang"), col("chunk"),
        coalesce(sum("t").over(wOff), lit(0L)).as("off"))
    val nTot = hist.groupBy("lang").agg(sum("k").as("n"))
    val cuts = local.join(broadcast(offs), Seq("lang", "chunk"))
      .withColumn("cum", col("off") + col("local_cum"))
      .join(broadcast(nTot), Seq("lang"))
      .groupBy("lang")
      .agg(min(when(col("cum") * 3 >= col("n"), col("xent_bits"))).as("c1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("xent_bits"))).as("c2"))
    sP.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("xent_bits"),
        when(col("xent_bits") <= col("c1"), lit("head"))
          .when(col("xent_bits") <= col("c2"), lit("middle"))
          .otherwise(lit("tail")).as("band"))
  }

}
