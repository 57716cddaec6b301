package graft.ops

import graft.SparkSpec
import graft.model.Turn
import java.sql.Timestamp

/** Degenerate-input contracts: the engine must not throw on empty text,
  * whitespace-only turns, sparse turn indices, unicode, or conversations
  * with no mentions.
  */
class RobustnessSpec extends SparkSpec {

  private def t(conv: String, idx: Int, text: String) =
    Turn(conv, idx, "user", text, None, new Timestamp(0L))

  test("segmentation handles empty / whitespace / unicode text") {
    import spark.implicits._
    val turns = Seq(
      t("c1", 0, ""), t("c1", 1, "   "), t("c1", 2, "\n\t"),
      t("c2", 0, "héllo wörld. 中文 here."),
      t("c3", 0, "no final punctuation")).toDS()
    val sents = Segmentation.sentences(turns).collect()
    assert(sents.forall(_.sent_text.nonEmpty))
    assert(!sents.exists(_.conv_id == "c1"))
    val toks = Segmentation.tokenized(turns).collect()
    toks.foreach { s =>
      s.tokens.foreach { tk =>
        assert(s.sent_text.substring(tk.begin - s.sent_start, tk.end - s.sent_start) == tk.word)
      }
    }
    assert(Segmentation.invariantViolations(turns).count() == 0)
  }

  test("pipeline yields no triples for mention-free conversations, no throw") {
    import spark.implicits._
    val turns = Seq(t("c1", 0, "nothing of note here."), t("c1", 5, ""),
      t("c2", 3, "merge")).toDS() // sparse turn idx; only one class present
    val out = KgPipeline.triples(turns,
      KgPipeline.Config("r", GazetteerTagger.OpClass, GazetteerTagger.ObjClass,
        window = 2, tokenizer = "tmvar"),
      None, GazetteerTagger.gazetteer, None).collect()
    assert(out.isEmpty)
  }

  test("turn window never crosses conversations and tolerates gaps") {
    import spark.implicits._
    // conv A turn 0 has op mention; conv B turn 1 has obj mention:
    // a window join keyed only on turn_idx would pair them
    val turns = Seq(t("A", 0, "merge now."), t("B", 1, "the stream."),
      t("A", 7, "a vector.")).toDS()
    val out = KgPipeline.triples(turns,
      KgPipeline.Config("r", GazetteerTagger.OpClass, GazetteerTagger.ObjClass,
        window = 1, tokenizer = "tmvar"),
      None, GazetteerTagger.gazetteer, None).collect()
    assert(out.isEmpty) // B is another conv; A's turns are 7 apart
    val out2 = KgPipeline.triples(turns,
      KgPipeline.Config("r", GazetteerTagger.OpClass, GazetteerTagger.ObjClass,
        window = 7, tokenizer = "tmvar"),
      None, GazetteerTagger.gazetteer, None).collect()
    assert(out2.length == 1 && out2.head.conv_id == "A")
  }

  test("duplicate turn_idx rows are contract violations but never double-emit") {
    // two rows with the same (conv, turn_idx): first in input order wins
    // (matching StreamingKg.ConvState first-write-wins); the candidate
    // loop must not double-iterate the turn pair
    val gaz = Map("merge" -> "op", "table" -> "obj")
    val tagger: IndexedSeq[graft.model.Tok] => Seq[(String, Int, Int)] =
      toks => toks.flatMap(tk => gaz.get(tk.word).map(c => (c, tk.begin, tk.end)))
    val cfg = KgPipeline.Config("r", "op", "obj", window = 1, tokenizer = "generic")
    val clean = Seq(t("c", 0, "merge table now."), t("c", 1, "merge again."))
    val dup = Seq(t("c", 0, "merge table now."),
      t("c", 0, "merge table now."), // exact duplicate row
      t("c", 0, "something else entirely."), // conflicting duplicate: ignored
      t("c", 1, "merge again."))
    val cleanCands = KgPipeline.candidateEdges("c", clean, cfg, tagger, withFeatures = false)
    val dupCands = KgPipeline.candidateEdges("c", dup, cfg, tagger, withFeatures = false)
    assert(dupCands == cleanCands)
    assert(cleanCands.size == 1) // merge(t0) - table(t0), exactly once
    assert(KgPipeline.processConversation("c", dup, cfg, tagger, None) ==
      KgPipeline.processConversation("c", clean, cfg, tagger, None))
  }

  test("CRF tagging of empty sentences and unknown-only words") {
    import spark.implicits._
    val turns = Seq(t("c1", 0, "zzz qqq unknownwords."), t("c2", 0, "")).toDS()
    val m = Crf.tag(Segmentation.tokenized(turns),
      Crf.dictionaryModel(GazetteerTagger.gazetteer)).collect()
    assert(m.isEmpty)
  }

  test("connected components on empty and self-loop-only graphs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Linking.connectedComponents(empty).count() == 0)
    val selfOnly = Seq((5L, 5L)).toDF("src", "dst")
    assert(Linking.connectedComponents(selfOnly).count() == 0)
    // chain + isolated island merge correctly
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val comp = Linking.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
  }

  test("mention evaluation on empty gold / pred / both sides") {
    import spark.implicits._
    val g = Seq(("d", "e_x", 0, "aaaa")).toDF("conv_id", "class_id", "begin", "text")
    val none = Seq.empty[(String, String, Int, String)]
      .toDF("conv_id", "class_id", "begin", "text")
    assert(Evaluation.mentionCounts(g, none) == Evaluation.Counts(0, 0, 1, 0, 0))
    assert(Evaluation.mentionCounts(none, g) == Evaluation.Counts(0, 1, 0, 0, 0))
    assert(Evaluation.mentionCounts(none, none) == Evaluation.Counts(0, 0, 0, 0, 0))
    // the one-row report stays well-formed (all zeros, no nulls) on
    // empty-everything input
    val r = Evaluation.mentionPrfReport(none, none).collect().head
    assert((0 until 14).forall(i => !r.isNullAt(i)))
    assert(r.getLong(0) == 0L && r.getDouble(5) == 0.0)
    assert(Evaluation.mentionCountsBySubclassByDoc(none, none).count() == 0)
  }

  test("dedup and similarity ops on singleton / empty inputs") {
    import spark.implicits._
    val one = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    assert(Dedup.exact(one).count() == 1)
    assert(Dedup.ngramJaccard(one, 3, 0.1).count() == 0)
    assert(Dedup.minhashLsh(one).count() == 0)
    assert(Dedup.simhashPairs(one).count() == 0)
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(none).count() == 0)
    assert(TextAnalysis.quality(none).count() == 0)
    // IVF on a corpus smaller than nlist: degrades to fewer cells, and
    // full-probe still equals brute force
    val tiny = Seq.tabulate(6)(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d) % 5 - 2).toFloat)))
      .toDF("vec_id", "embedding")
    val q = tiny.filter($"vec_id" < 2)
    val brute = Similarity.bruteForceTopK(tiny, q, 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val ivf = Similarity.ivfTopK(tiny, q, 3, nlist = 16, nProbe = 16)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(ivf == brute)
    // repetition mass on empty / single-word text: zero fractions, no
    // division-by-zero under ANSI mode
    val deg = Seq((1L, ""), (2L, "solo")).toDF("doc_id", "text")
    val rep = TextAnalysis.repetitionStats(deg)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(rep(1L) == ((0L, 0L, 0.0, 0.0)))
    assert(rep(2L) == ((4L, 0L, 0.0, 0.0)))
  }

  test("cluster resolution / sampling / perplexity / packing degenerate inputs") {
    import spark.implicits._
    val one = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // no pairs: every doc keeps itself; empty corpus: no rows
    val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.resolveClusters(one, noPairs)
      .as[(Long, Long, Boolean)].collect().toSeq == Seq((1L, 1L, true)))
    assert(Dedup.resolveClusters(none, noPairs).count() == 0)
    // pairs over docs absent from the corpus must not invent rows
    val ghost = Seq((7L, 8L)).toDF("a", "b")
    assert(Dedup.resolveClusters(one, ghost)
      .as[(Long, Long, Boolean)].collect().toSeq == Seq((1L, 1L, true)))
    // sampling: empty rates map -> default keep; empty corpus -> empty
    val docs1 = Seq((1L, "alpha beta", "s")).toDF("doc_id", "text", "source")
    assert(TextAnalysis.domainSample(docs1, Map.empty)
      .as[(Long, String, Long, Boolean)].collect().forall(_._4))
    assert(TextAnalysis.domainSample(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source"),
      Map("s" -> 0.5)).count() == 0)
    // perplexity: empty scoring set; a single-token doc scores on the
    // <s> bigram alone and stays finite/positive
    val lm = TextAnalysis.bigramLm(one)
    assert(TextAnalysis.perplexity(none, lm).count() == 0)
    val solo = TextAnalysis.perplexity(
      Seq((9L, "alpha")).toDF("doc_id", "text"), lm)
      .as[(Long, Long, Double)].collect()
    assert(solo.length == 1 && solo.head._2 == 1L &&
      solo.head._3 > 0.0 && !solo.head._3.isInfinite)
    // packing: empty and single-doc corpora
    assert(TextAnalysis.pack(none, 10).count() == 0)
    assert(TextAnalysis.pack(one, 10)
      .as[(Long, Long, Long)].collect().toSeq == Seq((1L, 2L, 0L)))
    // importance weights: empty scoring set -> no rows; a doc fully OOV
    // against the TARGET model degrades to the add-one floor (finite,
    // well-defined llr) instead of blowing up
    val tgtLm = TextAnalysis.bigramLm(
      Seq((2L, "gamma delta")).toDF("doc_id", "text"))
    assert(TextAnalysis.importanceWeights(none, tgtLm, lm).count() == 0)
    val w = TextAnalysis.importanceWeights(one, tgtLm, lm)
      .as[(Long, Long, Double)].collect()
    assert(w.length == 1 && !w.head._3.isInfinite && !w.head._3.isNaN,
      s"target-OOV doc must stay finite: ${w.toSeq}")
    // perplexity banding on an empty scored set -> no rows, no throw
    assert(TextAnalysis.perplexityBands(
      Seq.empty[(Long, String, Double)].toDF("doc_id", "lang", "xent_bits"))
      .count() == 0)
    // PII scan on empty / PII-free input
    assert(TextAnalysis.piiScan(none).count() == 0)
    assert(TextAnalysis.piiScan(one)
      .as[(Long, Long, Long, Long, String)].collect().toSeq ==
      Seq((1L, 0L, 0L, 0L, "alpha beta")))
  }

  test("dupmass / split / tfidf / sessions / classifier degenerate inputs") {
    import spark.implicits._
    val one = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    // duplication mass: empty corpus -> none; singleton -> its one
    // whole-doc shingle is unique; two EMPTY-text docs share the one
    // empty shingle -> dup_frac 1.0 both, no throw
    assert(Dedup.duplicationMass(none).count() == 0)
    assert(Dedup.duplicationMass(one).as[(Long, Long, Long, Double)]
      .collect().toSeq == Seq((1L, 1L, 0L, 0.0)))
    val dm = Dedup.duplicationMass(Seq((1L, ""), (2L, "")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(dm(1L) == 1.0 && dm(2L) == 1.0)
    // leak-safe split: no pairs -> every doc its own cluster; empty
    // corpus -> none; invalid thresholds fail fast (BEFORE components)
    assert(Dedup.leakSafeSplit(one, noPairs).count() == 1)
    assert(Dedup.leakSafeSplit(none, noPairs).count() == 0)
    intercept[IllegalArgumentException] {
      Dedup.leakSafeSplit(one, noPairs, trainPpm = 960000, valPpm = 950000)
    }
    // TF-IDF signatures: empty corpus -> none; a single-domain corpus
    // scores every term 0 (idf = ln 1) and ranks by word
    assert(TextAnalysis.domainSignatures(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source"))
      .count() == 0)
    val sig = TextAnalysis.domainSignatures(
      Seq((1L, "b a", "s")).toDF("doc_id", "text", "source"), k = 2)
      .as[(String, String, Long, Double, Long)].collect().sortBy(_._5)
    assert(sig.toSeq == Seq(("s", "a", 1L, 0.0, 1L), ("s", "b", 1L, 0.0, 2L)))
    // sessionize: empty -> none; a NULL event time must not throw, sorts
    // LAST (the pinned cross-engine order) and leaves real rows intact
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    assert(Events.sessionize(
      Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("event_id", "ts", "user_id"))
      .count() == 0)
    val evRows = Events.sessionize(
      Seq((1L, Some(t0), 1L), (2L, None: Option[java.sql.Timestamp], 1L))
        .toDF("event_id", "ts", "user_id")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(evRows(1L).getLong(2) == 1L && evRows(1L).getBoolean(3))
    assert(evRows(2L).isNullAt(3) && evRows(2L).getLong(2) == 1L)
    // window agg: empty -> none
    assert(Events.windowAgg(
      Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
        .toDF("event_id", "ts", "user_id", "event_type", "value")).count() == 0)
    // quality classifier: empty training data -> the zero model; scoring
    // with it is well-defined (score 0, keep false)
    val zero = TextAnalysis.trainQualityClassifier(none)
    assert(TextAnalysis.scoreQuality(one, zero)
      .as[(Long, Double, Boolean)].collect().toSeq == Seq((1L, 0.0, false)))
  }
}
