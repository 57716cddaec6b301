package graft.ops

import graft.SparkSpec
import graft.nlp.{Hashes, LangId}

/** Training-data curation operators: planted near-dup recovery for
  * MinHash/SimHash/Jaccard, ANN recall vs brute force, language-ID and
  * fingerprint determinism.
  */
class CurationSpec extends SparkSpec {

  /** 60 base docs from a seeded vocabulary + 10 planted near-duplicates
    * (one word changed) + 5 exact duplicates.
    */
  private def corpus = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (0 until 60).map { i =>
      (i.toLong, Vector.fill(40)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val nearDups = (0 until 10).map { i =>
      val (srcId, text) = base(i)
      val words = text.split(" ")
      words(20) = "CHANGED"
      (100L + i, words.mkString(" "))
    }
    val exactDups = (0 until 5).map { i => (200L + i, base(i)._2) }
    (base ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("exact dedup groups exact duplicates only") {
    import spark.implicits._
    val got = Dedup.exact(corpus).filter($"is_dup_group").as[(Long, Long, Boolean)]
      .collect().map(r => (r._1, r._2)).toSet
    assert(got == (0 until 5).flatMap(i => Seq((i.toLong, i.toLong), (200L + i, i.toLong))).toSet)
  }

  test("exact dedup: singles map to themselves; wide shuffle carries no text") {
    import spark.implicits._
    val all = Dedup.exact(corpus).as[(Long, Long, Boolean)].collect()
    assert(all.length == corpus.count())
    all.filterNot(_._3).foreach { case (id, rep, _) => assert(rep == id) }
    // the scale contract fixed this round: the only exchange whose rows
    // include the text column is the (h, text) verification window, and
    // it sits ABOVE the multi-member semi-join filter — the corpus-wide
    // hash-group aggregate shuffles (h, doc_id) ids only
    val plan = Dedup.exact(corpus).queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.nonEmpty)
    val withText = shuffles.filter(_.child.output.exists(_.name == "text"))
    assert(withText.size == 1, s"expected exactly one text-carrying exchange:\n$plan")
    assert(withText.head.child.toString.contains("LeftSemi"),
      s"text-carrying exchange must sit above the multi-member semi join:\n${withText.head.child}")
  }

  test("minhash LSH recovers all planted near-dups (jaccard >= 0.5)") {
    import spark.implicits._
    val pairs = Dedup.minhashLsh(corpus, shingleN = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    // every planted near-dup pair (i, 100+i) must be found
    (0 until 10).foreach { i =>
      assert(pairs.contains((i.toLong, 100L + i)), s"missing near-dup pair $i")
    }
    // and the exact dups too (jaccard 1.0)
    (0 until 5).foreach { i => assert(pairs.contains((i.toLong, 200L + i))) }
  }

  test("minhash band rows carry (doc_id, bucket) only — no shingle payload") {
    import spark.implicits._
    // the scale contract fixed this round: the bucket self-join must
    // shuffle bands×docs ID rows, never bands×corpus shingle arrays
    val shingled = corpus.as[(Long, String)]
      .map { case (id, text) =>
        (id, Hashes.shingles(text.split("\\s+").toIndexedSeq, 3).toArray)
      }.toDF("doc_id", "shingles")
    val banded = Dedup.bandedBuckets(shingled, numPerm = 64, bands = 16)
    assert(banded.schema.fieldNames.toSeq == Seq("doc_id", "bucket"))
    assert(banded.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType))
    // equal band slices always collide: exact duplicates share all bands
    val buckets = banded.as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 until 5).foreach { i => assert(buckets(i.toLong) == buckets(200L + i)) }
  }

  test("ngram jaccard agrees with minhash-verified jaccard on planted pairs") {
    import spark.implicits._
    val j1 = Dedup.ngramJaccard(corpus, n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(p => ((p._1, p._2), p._3)).toMap
    (0 until 10).foreach { i =>
      assert(j1.contains((i.toLong, 100L + i)))
    }
  }

  test("simhash: identical docs equal, near-dups within hamming 16") {
    import spark.implicits._
    val sh = Dedup.simhash(corpus).as[(Long, Long)].collect().toMap
    (0 until 5).foreach { i => assert(sh(i.toLong) == sh(200L + i)) }
    (0 until 10).foreach { i =>
      assert(Hashes.hamming(sh(i.toLong), sh(100L + i)) <= 16)
    }
  }

  test("LSH ANN reaches recall >= 0.6 vs brute force at k=5") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, q, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // isotropic random embeddings are LSH's worst case (no cluster
    // structure): short signatures + more tables trade candidate volume
    // for recall
    val approx = Similarity.lshTopK(emb, q, 5, nBits = 4, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
    // the driver-gate params (nBits=2, tables=16) were swept to measured
    // recall 1.0 on this corpus family — pin the full-row equality that
    // backs ann_lsh's use of the exact ann_topk oracle
    val exactRows = Similarity.bruteForceTopK(emb, q, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val driverRows = Similarity.lshTopK(emb, q, 5, nBits = 2, tables = 16)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(driverRows == exactRows)
  }

  test("ngram jaccard: df cap leaves below-cap corpora unchanged") {
    import spark.implicits._
    val uncapped = Dedup.ngramJaccard(corpus, n = 3, threshold = 0.5, maxShingleDf = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    val capped = Dedup.ngramJaccard(corpus, n = 3, threshold = 0.5, maxShingleDf = 1000)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == uncapped)
    assert(capped.nonEmpty)
  }

  test("ngram jaccard: hot boilerplate shingle is dropped, no candidate explosion") {
    import spark.implicits._
    // 200 docs, each = shared boilerplate prefix + a unique tail: every
    // doc pair shares the boilerplate 3-grams, so the uncapped inverted
    // index would enumerate all C(200,2)=19900 pairs. With the cap, the
    // boilerplate shingles (df=200) are stop-shingles and only the two
    // planted near-dup docs remain candidates.
    val boiler = "terms of service apply to all users"
    val docs = (0 until 200).map { i =>
      (i.toLong, s"$boiler unique tail $i${"x" * (i % 3)} content block $i")
    } :+ (999L, s"$boiler unique tail 7${"x" * (7 % 3)} content block 7 extra")
    val df = docs.toDF("doc_id", "text")
    val capped = Dedup.ngramJaccard(df, n = 3, threshold = 0.3, maxShingleDf = 50)
      .as[(Long, Long, Double)].collect()
    // only the planted pair (7, 999) shares rare shingles above threshold
    assert(capped.map(p => (p._1, p._2)).toSet == Set((7L, 999L)))
  }

  test("embedding near-dup blocked all-pairs: exact, no driver collect, no broadcast") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.embeddingNearDupPairs(emb, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    // brute-force reference computed in-test with the same arithmetic
    val vecs = emb.select($"vec_id".cast("long"), $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]) = {
      var d = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      d
    }
    val exp = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      sim = dot(vecs(i)._2, vecs(j)._2) /
        (math.sqrt(dot(vecs(i)._2, vecs(i)._2)) * math.sqrt(dot(vecs(j)._2, vecs(j)._2)))
      if sim >= 0.4
    } yield (vecs(i)._1, vecs(j)._1, new java.math.BigDecimal(sim)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())).toSet
    assert(got == exp)
    // the scale contract: the plan distributes block pairs — no broadcast
    // of the corpus, no driver-side table
    val plan = Similarity.embeddingNearDupPairs(emb, threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Broadcast"), s"unexpected broadcast in plan:\n$plan")
  }

  test("embedding LSH near-dup: recall 1.0 on gapped planted dups, subset of exact") {
    import spark.implicits._
    // 150 random unit-ish vectors + 12 planted near-dups (tiny noise →
    // sim ≈ 0.999, a real gap at threshold 0.9). LSH is only claimed for
    // gapped thresholds; this is that contract.
    val rng = new scala.util.Random(11)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val base = (0 until 150).map(i => (i.toLong, vec()))
    val dups = (0 until 12).map { i =>
      val src = base(i)._2
      (500L + i, src.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val exact = Similarity.embeddingNearDupPairs(emb, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.embeddingNearDupPairsLsh(emb, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact))
    assert(lsh == exact, s"LSH missed ${(exact -- lsh).size} of ${exact.size} gapped pairs")
    (0 until 12).foreach { i => assert(lsh.exists(p => p._1 == i && p._2 == 500L + i)) }
  }

  test("IVF ANN: full probe == brute force exactly; partial probe keeps recall") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, q, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    // probing every cell retrieves every candidate → identical output
    val full = Similarity.ivfTopK(emb, q, 5, nlist = 8, nProbe = 8)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full == exact)
    // honest partial probe: recall degrades gracefully, not to zero
    val part = Similarity.ivfTopK(emb, q, 5, nlist = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map(r => (r._1, r._3))
    val recall = (exactPairs & part).size.toDouble / exactPairs.size
    assert(recall >= 0.5, s"recall=$recall")
  }

  test("decontamination: planted benchmark overlap, hit arithmetic, broadcast shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // benchmark doc: 10 words → 6 distinct 5-gram shingles (w1..w10)
    val benchText = (1 to 10).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, benchText),                                   // exact copy → 6 hits
      (2L, (3 to 12).map(i => s"w$i").mkString(" ")),    // shifted: shares w3..w10 run
      (3L, (1 to 10).map(i => s"z$i").mkString(" ")),    // unrelated → 0 hits
      (4L, "w1 w2 w3 w4 w5 q q q q q")                   // one shared shingle
    ).toDF("doc_id", "text")
    val bench = Seq((99L, benchText)).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, n = 5, minHits = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // doc 2 shares the shingles fully inside w3..w10: windows w3..w7,
    // w4..w8, w5..w9, w6..w10 → 4 hits
    assert(out == Seq((1L, 6L, true), (2L, 4L, true), (3L, 0L, false),
      (4L, 1L, false)))
    // scale shape: the benchmark shingle set is broadcast — no shuffle of
    // corpus shingles into the semi join
    val plan = Dedup.decontaminate(corpus, bench, 5, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark side must broadcast:\n$plan")
  }

  test("sequence packing: distributed prefix sum == driver-computed global scan") {
    import spark.implicits._
    // 25 docs with varied token counts, chunkSize=4 → 7 chunks, so the
    // per-chunk offsets path is genuinely exercised (one chunk would be
    // a plain window)
    val rng = new scala.util.Random(11)
    val docsSeq = (0L until 25L).map(i =>
      (i, Vector.fill(1 + rng.nextInt(9))("w").mkString(" ")))
    val docs = docsSeq.toDF("doc_id", "text")
    val out = TextAnalysis.pack(docs, budget = 10, chunkSize = 4)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // driver-side reference: one sequential scan
    var acc = 0L
    val expected = docsSeq.map { case (id, t) =>
      val n = t.split(" ").length.toLong
      val seq = acc / 10; acc += n; (id, n, seq)
    }
    assert(out == expected)
    // seq ids are monotone and every boundary-interior sequence holds
    // >= budget tokens' worth of starts (chunked-packing invariant)
    assert(out.map(_._3) == out.map(_._3).sorted)
    // scale shape: the running-sum window must be PARTITIONED (a global
    // window would plan one task)
    val plan = TextAnalysis.pack(docs, 10, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window") && plan.contains("partitionBy") ||
      plan.contains("chunk"), s"window must partition by chunk:\n$plan")
  }

  test("cluster resolution: transitive chains collapse to one keep per cluster") {
    import spark.implicits._
    // pair graph: 0~1, 1~2 (0~2 NOT paired — the under-threshold gap the
    // closure must bridge) and 5~6; docs 3 and 9 are unpaired singletons
    val docs = Seq(0L, 1L, 2L, 3L, 5L, 6L, 9L)
      .map(i => (i, s"text $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L, 0.9), (1L, 2L, 0.8), (5L, 6L, 0.7))
      .toDF("a", "b", "jaccard")
    val got = Dedup.resolveClusters(docs, pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (0L, 0L, true), (1L, 0L, false), (2L, 0L, false),   // chain → one keep
      (5L, 5L, true), (6L, 5L, false),
      (3L, 3L, true), (9L, 9L, true)))                    // singletons keep
  }

  test("cluster resolution over minhash pairs recovers the planted clusters") {
    import spark.implicits._
    // corpus plants: docs 0..4 each have an exact dup (200+i) and a
    // near dup (100+i) — resolveClusters over the verified pair graph
    // must keep exactly one doc per planted cluster (the base id)
    val pairs = Dedup.minhashLsh(corpus, shingleN = 3, numPerm = 64,
      bands = 32, threshold = 0.5)
    val out = Dedup.resolveClusters(corpus, pairs)
      .as[(Long, Long, Boolean)].collect()
    val clusterOf = out.map(r => r._1 -> r._2).toMap
    val byCluster = out.groupBy(_._2)
    (0 until 5).foreach { i =>
      // base doc, its near dup and its exact dup must land in ONE cluster
      val cid = clusterOf(i.toLong)
      assert(clusterOf(100L + i) == cid && clusterOf(200L + i) == cid,
        s"planted trio $i split across clusters")
      assert(byCluster(cid).count(_._3) == 1, "exactly one keep per cluster")
      assert(byCluster(cid).filter(_._3).head._1 == cid,
        "the kept doc IS the cluster id (min doc_id)")
    }
    // every doc appears exactly once, keeps = cluster count
    assert(out.map(_._1).distinct.length == out.length)
    assert(out.count(_._3) == byCluster.size)
  }

  test("domain sampling: integer-threshold determinism and rate endpoints") {
    import spark.implicits._
    val docs = (0L until 60L).map { i =>
      (i, s"doc number $i with words", s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val rates = Map("src0" -> 0.0, "src1" -> 1.0) // src2 unlisted → keep
    val out = TextAnalysis.domainSample(docs, rates)
      .as[(Long, String, Long, Boolean)].collect()
    assert(out.length == 60)
    assert(out.filter(_._2 == "src0").forall(!_._4), "rate 0 drops all")
    assert(out.filter(_._2 == "src1").forall(_._4), "rate 1 keeps all")
    assert(out.filter(_._2 == "src2").forall(_._4), "unlisted defaults to keep")
    assert(out.forall(r => r._3 >= 0L && r._3 < 1000000L), "bucket range")
    // decision is a pure function of the text — a second run is identical
    val again = TextAnalysis.domainSample(docs, rates)
      .as[(Long, String, Long, Boolean)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // fractional rate actually splits a domain (sanity at 0.5)
    val half = TextAnalysis.domainSample(docs, Map("src0" -> 0.5))
      .filter($"source" === "src0").as[(Long, String, Long, Boolean)].collect()
    assert(half.exists(_._4) && half.exists(!_._4),
      "a 0.5 rate should keep some and drop some of 20 docs")
  }

  test("temperature rates: tau=1 is natural, tau=0 equalizes, cap at 1") {
    import spark.implicits._
    // skewed domains: 60 / 30 / 10 docs
    val docs = ((0 until 60).map(i => (i.toLong, "t", "big")) ++
      (60 until 90).map(i => (i.toLong, "t", "mid")) ++
      (90 until 100).map(i => (i.toLong, "t", "small")))
      .toDF("doc_id", "text", "source")
    val natural = TextAnalysis.temperatureRates(docs, tau = 1.0, targetFrac = 0.5)
    natural.values.foreach(r => assert(math.abs(r - 0.5) < 1e-12,
      "tau=1 keeps natural proportions: every domain sampled at targetFrac"))
    val equal = TextAnalysis.temperatureRates(docs, tau = 0.0, targetFrac = 0.3)
    // tau=0: expected kept docs equal per domain (0.3*100/3 = 10 each)
    val kept = equal.map { case (s, r) =>
      s -> r * Map("big" -> 60, "mid" -> 30, "small" -> 10)(s) }
    kept.values.foreach(k => assert(math.abs(k - 10.0) < 1e-9, s"equalized: $kept"))
    // cap: upsampling the tail beyond its size clips at rate 1
    val capped = TextAnalysis.temperatureRates(docs, tau = 0.0, targetFrac = 0.9)
    assert(capped("small") == 1.0, s"rate must cap at 1: $capped")
  }

  test("perplexity: hand-computed add-one bigram cross-entropy; OOV degrades") {
    import spark.implicits._
    def log2(x: Double) = math.log(x) / 0.6931471805599453
    val ref = Seq((0L, "a b a"), (1L, "a b")).toDF("doc_id", "text")
    val lm = TextAnalysis.bigramLm(ref)
    // lm: (<s>,a)=2 (a,b)=2 (b,a)=1; ctx totals <s>=2 a=2 b=1; V=2
    assert(lm.as[(String, String, Long)].collect().toSet ==
      Set(("<s>", "a", 2L), ("a", "b", 2L), ("b", "a", 1L)))
    val got = TextAnalysis.perplexity(ref, lm)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val d0 = -(log2(3.0 / 4) + log2(3.0 / 4) + log2(2.0 / 3)) / 3
    val d1 = -(log2(3.0 / 4) * 2) / 2
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((0L, 3L, r6(d0)), (1L, 2L, r6(d1))), s"got $got")
    // OOV doc against the same LM: unseen word AND unseen context both
    // degrade to the add-one floor, score stays finite
    val oov = TextAnalysis.perplexity(Seq((9L, "z z")).toDF("doc_id", "text"), lm)
      .as[(Long, Long, Double)].collect().toSeq
    val expected = -(log2(1.0 / 4) + log2(1.0 / 2)) / 2
    assert(oov == Seq((9L, 2L, r6(expected))), s"got $oov")
    // scale shape: the model table feeds three branches (gram join, ctx
    // totals, vocab) and must come from cache, not three recomputed
    // training explodes (measured 4 corpus scans instead of 2 unpersisted)
    val plan = TextAnalysis.perplexity(ref, TextAnalysis.bigramLm(ref))
      .queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(plan).length >= 3,
      s"lm branches must read the persisted model:\n$plan")
  }

  test("importance weights: hand-computed llr, zero under identical models") {
    import spark.implicits._
    def log2(x: Double) = math.log(x) / 0.6931471805599453
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = Seq((0L, "a b a"), (1L, "a b")).toDF("doc_id", "text")
    val target = Seq((1L, "a b")).toDF("doc_id", "text")
    // target lm: (<s>,a)=1 (a,b)=1; ctx totals <s>=1 a=1; V_t=2
    // raw lm: (<s>,a)=2 (a,b)=2 (b,a)=1; ctx totals <s>=2 a=2 b=1; V_r=2
    val got = TextAnalysis.importanceWeights(raw,
        TextAnalysis.bigramLm(target), TextAnalysis.bigramLm(raw))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val seen = log2(2.0 / 3) - log2(3.0 / 4)       // gram in both models
    val oov = log2(1.0 / 2) - log2(2.0 / 3)        // (b,a): target add-one floor
    assert(got == Seq((0L, 3L, r6((2 * seen + oov) / 3)),
                      (1L, 2L, r6(seen))), s"got $got")
    // identical models ⇒ every per-gram log ratio is EXACTLY 0.0
    val same = TextAnalysis.bigramLm(raw)
    val zero = TextAnalysis.importanceWeights(raw, same, same)
      .as[(Long, Long, Double)].collect().toSeq
    assert(zero.forall(_._3 == 0.0), s"identical models must give llr 0: $zero")
    // scale shape: BOTH persisted model tables feed three branches each
    // (the full-outer gram merge, the context totals, the vocab count) —
    // all six branches must read cache, not recomputed training explodes
    val plan = TextAnalysis.importanceWeights(raw,
        TextAnalysis.bigramLm(target), TextAnalysis.bigramLm(raw))
      .queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(plan).length >= 6,
      s"model branches must read the persisted tables:\n$plan")
  }

  test("domain KL: hand-computed divergence, exact zero on one domain, nonneg") {
    import spark.implicits._
    def log2(x: Double) = math.log(x) / 0.6931471805599453
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // corpus: a×3 b×2 (n_c=5); x: a2 b1 (n_s=3); y: a1 b1 (n_s=2)
    val docs = Seq((1L, "a a b", "x"), (2L, "a b", "y"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.domainKl(docs)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    val klX = (2.0 / 3) * log2((2.0 / 3) / (3.0 / 5)) +
      (1.0 / 3) * log2((1.0 / 3) / (2.0 / 5))
    val klY = (1.0 / 2) * log2((1.0 / 2) / (3.0 / 5)) +
      (1.0 / 2) * log2((1.0 / 2) / (2.0 / 5))
    assert(got == Seq(("x", 3L, r6(klX)), ("y", 2L, r6(klY))), s"got $got")
    // one domain ⇒ p_s == p_c per word ⇒ every log ratio is EXACTLY 0.0
    val single = TextAnalysis.domainKl(
      Seq((1L, "a a b c", "only"), (2L, "b c", "only"))
        .toDF("doc_id", "text", "source"))
      .as[(String, Long, Double)].collect().toSeq
    assert(single == Seq(("only", 6L, 0.0)), s"got $single")
    // KL is non-negative on arbitrary mixtures (Gibbs); 6dp rounding of
    // a tiny positive value may yield 0.0 but never below
    val rng = new scala.util.Random(13)
    val rand = (0L until 40L).map(i => (i,
      Vector.fill(3 + rng.nextInt(5))(('a' + rng.nextInt(4)).toChar.toString)
        .mkString(" "), s"s${i % 4}")).toDF("doc_id", "text", "source")
    val kls = TextAnalysis.domainKl(rand).as[(String, Long, Double)].collect()
    assert(kls.length == 4 && kls.forall(_._3 >= 0.0), s"negative KL: ${kls.toSeq}")
  }

  test("perplexity bands: exact tertiles with ties; prefix-sum == naive scan") {
    import spark.implicits._
    // lang A: nine distinct xents 1..9 → c1=3 c2=6 → three exact thirds;
    // lang B: ties at the head boundary (1,1,2,3; n=4) → c1=1 (cum(1)=2,
    // 2·3 ≥ 4) so BOTH tied docs band head, c2=2 → middle={2}, tail={3}
    val scored = ((1 to 9).map(i => (i.toLong, "A", i.toDouble)) ++
      Seq((10L, "B", 1.0), (11L, "B", 1.0), (12L, "B", 2.0), (13L, "B", 3.0)))
      .toDF("doc_id", "lang", "xent_bits")
    val got = TextAnalysis.perplexityBands(scored)
      .as[(Long, String, Double, String)].collect().map(r => r._1 -> r._4).toMap
    val expA = Map(1L -> "head", 2L -> "head", 3L -> "head", 4L -> "middle",
      5L -> "middle", 6L -> "middle", 7L -> "tail", 8L -> "tail", 9L -> "tail")
    val expB = Map(10L -> "head", 11L -> "head", 12L -> "middle", 13L -> "tail")
    assert(got == expA ++ expB, s"got $got")
    // randomized parity vs a naive per-lang sorted scan, with values
    // spaced so MULTIPLE distinct xents share one ⌊x·100⌋ chunk (the
    // distributed prefix sum's offsets path is genuinely exercised)
    val rng = new scala.util.Random(7)
    val rows = (0L until 60L).map(i =>
      (i, s"L${i % 3}", (rng.nextInt(20) + 1) / 1000.0))
    val ref = rows.groupBy(_._2).flatMap { case (_, g) =>
      val n = g.size
      val vs = g.map(_._3).sorted
      val cut = (k: Int) => vs.distinct.find(v => vs.count(_ <= v) * 3 >= k * n).get
      val (c1, c2) = (cut(1), cut(2))
      g.map(r => r._1 -> (if (r._3 <= c1) "head"
                          else if (r._3 <= c2) "middle" else "tail"))
    }
    val big = TextAnalysis.perplexityBands(rows.toDF("doc_id", "lang", "xent_bits"))
      .as[(Long, String, Double, String)].collect().map(r => r._1 -> r._4).toMap
    assert(big == ref, s"prefix-sum bands diverge from the naive scan")
    // scale shape: every corpus-histogram window is partitioned by
    // (lang, chunk) — the only lang-partitioned window runs over
    // chunk-count rows, never a per-language corpus sort
    val plan = TextAnalysis.perplexityBands(scored)
      .queryExecution.executedPlan.toString
    assert(plan.contains("chunk"), s"chunked prefix sum missing:\n$plan")
  }

  test("PII scan: hand-planted counts, redaction order, digit-free output") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write to alice@example.org or bob.smith+x@mail.co today"),
      (2L, "host 10.0.0.1 and 192.168.100.200 respond"),
      (3L, "call +44 20 7946 0958 or (415) 555-0100 now"),
      (4L, "plain lowercase words only here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScan(docs).as[(Long, Long, Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, 2L, 0L, 0L, "write to [EMAIL] or [EMAIL] today")))
    assert(got(1) == ((2L, 0L, 2L, 0L, "host [IP] and [IP] respond")))
    assert((got(2)._2, got(2)._3, got(2)._4) == ((0L, 0L, 2L)))
    assert(!got(2)._5.exists(_.isDigit), s"digits survived: ${got(2)._5}")
    assert(got(3) == ((4L, 0L, 0L, 0L, "plain lowercase words only here")))
    // counts describe the REDACTED text: a digit-run inside an e-mail
    // local part is [EMAIL] by the time the phone pattern runs, so it
    // must not double-count as a phone; NULL text scans as empty
    val tricky = Seq((5L, "reach me at 12345678@mail.com ok"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val t = TextAnalysis.piiScan(tricky).as[(Long, Long, Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(t(0) == ((5L, 1L, 0L, 0L, "reach me at [EMAIL] ok")),
      s"email digits double-counted as phone: ${t(0)}")
    assert(t(1) == ((6L, 0L, 0L, 0L, "")), s"null text: ${t(1)}")
  }

  test("language-ID heuristic on real multilingual samples") {
    assert(LangId.detect("the quick brown fox jumps over the lazy dog and it is fine") == "en")
    assert(LangId.detect("der Hund ist nicht mit der Katze und das ist ein Problem") == "de")
    assert(LangId.detect("le chien est dans la maison et je ne sais pas pour vous") == "fr")
    assert(LangId.detect("el perro es grande y la casa es pequeña para los niños") == "es")
    assert(LangId.detect("这是一个中文句子没有空格") == "zh")
    assert(LangId.detect("12345 67890 ...") == "und")
  }

  test("repetition stats: hand-computed Gopher mass fractions") {
    import spark.implicits._
    // "a b a b a b": bigrams = [a b, b a, a b, b a, a b] → top ("a b", 3);
    // chars = 11; top mass = 3*3/11. 5-grams = [a b a b a, b a b a b] —
    // each once → dup mass 0.
    // "x y z": top bigram count 1, no 5-grams. "w" alone: no bigrams.
    // "r r r r r r": five "r r" bigrams → top (r r, 5), mass 15/11;
    // 5-grams ["r r r r r" ×2] → dup mass 2*9/11.
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "x y z"), (3L, "w"), (4L, "r r r r r r")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((11L, 3L, r6(9.0 / 11), 0.0)))
    assert(got(2L) == ((5L, 1L, r6(3.0 / 5), 0.0)))
    assert(got(3L) == ((1L, 0L, 0.0, 0.0)))
    assert(got(4L) == ((11L, 5L, r6(15.0 / 11), r6(18.0 / 11))))
  }

  test("fingerprint is stable and collision-free on distinct corpus docs") {
    import spark.implicits._
    val fp = TextAnalysis.fingerprint(corpus).as[(Long, Long)].collect().toMap
    // identical text → identical fingerprint
    (0 until 5).foreach { i => assert(fp(i.toLong) == fp(200L + i)) }
    // golden value pinned: engine-owned hash must never drift between
    // versions (stable across checkpoints/partitions)
    assert(Hashes.fingerprint("the fast key order") == Hashes.fingerprint("the fast key order"))
    assert(Hashes.fingerprint("") == 0L)
    val distinctTexts = corpus.select("text").distinct().count()
    assert(fp.values.toSet.size == distinctTexts)
  }

  test("duplication mass: hand-computed fractions incl. short-doc shingle") {
    import spark.implicits._
    // A: 8 words → 4 5-grams; B = A (exact dup) → all grams shared, 1.0.
    // C: unique → 0.0. D: 9 words → 5 grams, only "a b c d e" shared
    // with A/B → 1/5. E/F: 3-word docs (< n) → ONE whole-doc shingle
    // each; identical → 1.0 both.
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "z y x w v u t s"), (4L, "a b c d e q r s t"),
      (5L, "p q r"), (6L, "p q r")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicationMass(docs, n = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 4L, 1.0)))
    assert(got(2L) == ((4L, 4L, 1.0)))
    assert(got(3L) == ((4L, 0L, 0.0)))
    assert(got(4L) == ((5L, 1L, 0.2)))
    assert(got(5L) == ((1L, 1L, 1.0)))
    assert(got(6L) == ((1L, 1L, 1.0)))
  }

  test("duplication mass: invariants on planted corpus; no text in any exchange") {
    import spark.implicits._
    val rows = Dedup.duplicationMass(corpus, n = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == corpus.count())
    rows.foreach { case (_, nG, nD, f) =>
      assert(nG >= 1 && nD >= 0 && nD <= nG)
      assert(f >= 0.0 && f <= 1.0)
    }
    val byId = rows.map(r => r._1 -> r._4).toMap
    // exact duplicates: every gram of each member occurs in the twin
    (0 until 5).foreach { i =>
      assert(byId(i.toLong) == 1.0); assert(byId(200L + i) == 1.0)
    }
    // scale contract: grams hash to longs BEFORE anything shuffles — no
    // exchange row carries a string column anywhere in the plan
    val plan = Dedup.duplicationMassPlan(corpus, n = 5)._2
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.nonEmpty)
    shuffles.foreach { e =>
      assert(!e.child.output.exists(
        _.dataType == org.apache.spark.sql.types.StringType),
        s"string-typed column in a duplication-mass exchange:\n$e")
    }
  }

  test("leak-safe split: clusters move whole, deterministic, shard-mergeable") {
    import spark.implicits._
    def pairsOf(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashLsh(d, shingleN = 3, numPerm = 64, bands = 32, threshold = 0.5)
    val split = Dedup.leakSafeSplit(corpus, pairsOf(corpus))
      .as[(Long, Long, Long, String)].collect()
    assert(split.length == corpus.count())
    val byId = split.map(r => r._1 -> r).toMap
    // every planted near-dup/exact-dup pair shares ONE split — the
    // operator's whole point
    (0 until 10).foreach { i =>
      assert(byId(i.toLong)._4 == byId(100L + i)._4, s"pair $i straddles splits")
      assert(byId(i.toLong)._2 == byId(100L + i)._2)
    }
    (0 until 5).foreach { i => assert(byId(i.toLong)._4 == byId(200L + i)._4) }
    // the bucket→split mapping is the documented integer rule
    split.foreach { case (_, _, b, s) =>
      assert(b >= 0 && b < 1000000)
      val want = if (b < 900000) "train" else if (b < 950000) "val" else "test"
      assert(s == want)
    }
    // deterministic under re-partitioning (no RNG state anywhere)
    val reparted = Dedup.leakSafeSplit(corpus.repartition(7), pairsOf(corpus.repartition(7)))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(reparted == split.toSet)
    // shard-mergeable: a NEW duplicate of doc 0 joins doc 0's cluster and
    // inherits its split; every pre-existing assignment is unchanged
    val grown = corpus.unionByName(
      corpus.filter($"doc_id" === 0L).select(
        org.apache.spark.sql.functions.lit(300L).as("doc_id"), $"text"))
    val split2 = Dedup.leakSafeSplit(grown, pairsOf(grown))
      .as[(Long, Long, Long, String)].collect()
    val byId2 = split2.map(r => r._1 -> r).toMap
    assert(byId2(300L)._2 == byId(0L)._2 && byId2(300L)._4 == byId(0L)._4)
    split.foreach { r => assert(byId2(r._1) == r) }
  }

  test("trained quality classifier: held-out agreement >= 0.9 with its weak labels") {
    import spark.implicits._
    // balanced corpus: 60 good docs (25-40 varied vocab words) vs 60 bad
    // (too short / loop-text / long-token spam — each trips a different
    // curationFilter rule AND reads like real junk, so hashed unigrams +
    // structural buckets both carry signal)
    val rng = new scala.util.Random(11)
    val base = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    val vocab = base ++ base.map(_ + "on")
    val good = (0 until 60).map { i =>
      (i.toLong, Vector.fill(25 + rng.nextInt(16))(
        vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val bad = (0 until 60).map { i =>
      val t = i % 3 match {
        case 0 => Vector.fill(3 + rng.nextInt(5))("spam").mkString(" ")
        case 1 => Vector.fill(15)("buy now click here").mkString(" ")
        case 2 => "x" * 40 + " " + Vector.fill(25)("zzz").mkString(" ")
      }
      (100L + i, t)
    }
    val docs = (good ++ bad).toDF("doc_id", "text")
    // repetition thresholds relaxed for toy-length docs: a single
    // repeated bigram in a 30-word doc already exceeds the 0.06 default
    // mass, which is calibrated for real document lengths
    def labelsOf(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.curationFilter(d,
        maxTopBigramFrac = 0.3, maxDupNgramFrac = 0.3).select("doc_id", "keep")
    // sanity: the weak labels are what the corpus was built to produce
    val labMap = labelsOf(docs).as[(Long, Boolean)].collect().toMap
    assert(good.forall { case (id, _) => labMap(id) })
    assert(bad.forall { case (id, _) => !labMap(id) })
    // train on even doc_ids, hold out odd
    val train = docs.filter($"doc_id" % 2 === 0)
    val test = docs.filter($"doc_id" % 2 === 1)
    val model = TextAnalysis.trainQualityClassifier(train, labelsOf(train),
      rounds = 4, epochsPerRound = 4, shards = 4)
    val scores = TextAnalysis.scoreQuality(test, model)
      .as[(Long, Double, Boolean)].collect()
    val acc = scores.count { case (id, _, p) => p == labMap(id) }.toDouble /
      scores.length
    assert(acc >= 0.9, s"held-out agreement $acc < 0.9")
    // scores separate the classes in the right direction
    val goodMean = scores.filter(_._1 < 100).map(_._2).sum /
      scores.count(_._1 < 100)
    val badMean = scores.filter(_._1 >= 100).map(_._2).sum /
      scores.count(_._1 >= 100)
    assert(goodMean > badMean)
  }

  test("semantic dedup: transitive embedding chain collapses to one kept rep") {
    import spark.implicits._
    // cos(1,2) ≈ 0.95 and cos(2,3) ≈ 0.944 qualify at 0.9; cos(1,3) =
    // 0.80 does NOT — yet all three must collapse to cluster 1 (the
    // SemDeDup transitivity step pair detection alone misses). vec 4 is
    // near-orthogonal to all and keeps itself.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.95f, 0.312f)),
      (3L, Array(0.80f, 0.59f)),
      (4L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.resolveClusters(
      emb.select($"vec_id".as("doc_id")),
      Similarity.embeddingNearDupPairs(emb, threshold = 0.9))
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1L, true)))
    assert(got(2L) == ((1L, false)))
    assert(got(3L) == ((1L, false)))
    assert(got(4L) == ((4L, true)))
  }

  test("domain TF-IDF signatures: hand-computed ranks, ties, group-limit plan") {
    import spark.implicits._
    // ns = 3 domains. df: x 1, y 2, z 1, w 1, p 1, q 1.
    // srcA: x tf2·ln3, w tf1·ln3, y tf1·ln1.5 — k=2 drops y.
    // srcB: z tf2·ln3 rk1, y ln1.5 rk2.
    // srcC: p and q tie at ln3 exactly — word-asc breaks: p rk1, q rk2.
    val docs = Seq(
      (1L, "srcA", "x x y w"), (2L, "srcB", "y z z"), (3L, "srcC", "p q")
    ).toDF("doc_id", "source", "text")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln3 = math.log(3.0); val ln15 = math.log(1.5)
    val got = TextAnalysis.domainSignatures(docs, k = 2)
      .as[(String, String, Long, Double, Long)].collect()
      .map(r => (r._1, r._5) -> ((r._2, r._3, r._4))).toMap
    assert(got.size == 6)
    assert(got(("srcA", 1L)) == (("x", 2L, r6(2 * ln3))))
    assert(got(("srcA", 2L)) == (("w", 1L, r6(ln3))))
    assert(got(("srcB", 1L)) == (("z", 2L, r6(2 * ln3))))
    assert(got(("srcB", 2L)) == (("y", 1L, r6(ln15))))
    assert(got(("srcC", 1L)) == (("p", 1L, r6(ln3))))
    assert(got(("srcC", 2L)) == (("q", 1L, r6(ln3))))
    // scale contract: the rank filter must plan as WindowGroupLimit
    // (map-side partial top-k), not a full per-domain vocabulary sort
    // feeding one window
    val plan = TextAnalysis.domainSignatures(docs, k = 2)
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val limits = plan.collect {
      case e: org.apache.spark.sql.execution.window.WindowGroupLimitExec => e
    }
    assert(limits.nonEmpty, s"expected a WindowGroupLimit in:\n$plan")
  }
}
