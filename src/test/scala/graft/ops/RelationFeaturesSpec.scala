package graft.ops

import graft.SparkSpec
import graft.model._

/** Golden tests for the completed §2.5 edge feature set: the doc-level
  * counts of `relations/new/sentence.py:140-171`, the sentence counts,
  * LD/PD path n-grams with edge labels/directions
  * (`new/dependency.py:163-221`, `utils/graphs.py` Path algebra), the
  * NamedEntityCount/BagOfWords generators (`relations/sentence.py:6-113`)
  * and the distributed salted-groupBy forms.
  */
class RelationFeaturesSpec extends SparkSpec {

  private val gaz = Map("merge" -> "op", "scan" -> "op",
    "table" -> "obj", "stream" -> "obj")
  private val tagger: IndexedSeq[Tok] => Seq[(String, Int, Int)] =
    toks => toks.flatMap(t => gaz.get(t.word).map(c => (c, t.begin, t.end)))
  private val cfg = KgPipeline.Config("r", "op", "obj", window = 1,
    tokenizer = "generic")

  private def turn(i: Int, text: String) =
    Turn("c0", i, "user", text, None, new java.sql.Timestamp(0L))

  /** Fixture conversation (hand-computed goldens below):
    *   turn 0: "merge table now. merge stream later."   (2 sentences)
    *   turn 1: "scan table again."
    * doc-level norm counts: merge=2 scan=1 table=2 stream=1;
    * same-sentence pair sents: (merge,table)=1 (merge,stream)=1
    * (scan,table)=1.
    */
  private val turns = Seq(
    turn(0, "merge table now. merge stream later."),
    turn(1, "scan table again."))

  private def featsOf(pred: KgPipeline.Candidate => Boolean): Map[String, Double] = {
    val cands = KgPipeline.candidateEdges("c0", turns, cfg, tagger, withFeatures = true)
    val hit = cands.filter(pred)
    assert(hit.size == 1, s"expected unique candidate, got ${hit.size}")
    hit.head.feats
  }

  test("doc-level entity counts and together-count (sentence.py:140-171 goldens)") {
    // same-sentence pair merge(t0,s0) - table(t0,s0)
    val f = featsOf(c => c.sameSentence && c.m1.text == "merge" &&
      c.m2.text == "table" && c.m1.turn_idx == 0)
    assert(f("f_entity1_count") == 2.0) // 'merge' occurs twice in the conv
    assert(f("f_entity2_count") == 2.0) // 'table' occurs twice
    assert(f("f_diff_sents_together_count") == 1.0) // co-occur in 1 sentence
    // cross-turn merge(t0) - table(t1): doc counts identical (doc-level!)
    val g = featsOf(c => !c.sameSentence && c.m1.text == "merge" &&
      c.m1.turn_idx == 0 && c.m2.text == "table" && c.m2.turn_idx == 1 &&
      c.m1.sent_idx == 0)
    assert(g("f_entity1_count") == 2.0)
    assert(g("f_entity2_count") == 2.0)
    assert(g("f_diff_sents_together_count") == 1.0)
    // pair that never co-occurs in a sentence: merge(t0,s1) x table never
    // same-sentence? (merge,stream) does: check stream's together too
    val h = featsOf(c => c.sameSentence && c.m2.text == "stream")
    assert(h("f_entity2_count") == 1.0) // 'stream' once
    assert(h("f_diff_sents_together_count") == 1.0)
  }

  test("sentence-level counts, token counts, NE counts (goldens)") {
    val f = featsOf(c => c.sameSentence && c.m1.text == "merge" &&
      c.m2.text == "table" && c.m1.turn_idx == 0)
    // sentence "merge table now." → generic tokens [merge, table, now, .]
    assert(f("f_tokens_count") == 4.0)
    assert(f("f_tokens_count_before") == 0.0) // merge is token 0
    assert(f("f_tokens_count_after") == 2.0)  // 'now', '.'
    // per-class counts minus the edge's own entity
    assert(f("f_counts_ind=op") == 0.0)
    assert(f("f_counts_ind=obj") == 0.0)
    assert(f("f_counts_total") == 0.0)
    assert(f("f_counts_bet_total") == 0.0)
    assert(f.contains("ne_count_op_1"))
    assert(f.contains("ne_count_obj_1"))
    // masked BOW over the sentence: entity tokens become their class ids
    assert(f("f_bow=op") == 1.0)
    assert(f("f_bow=obj") == 1.0)
    assert(f("f_bow=now") == 1.0)
    // order: m1 'op' > 'obj' lexicographically → no f_order flag
    assert(!f.contains("f_order"))
    assert(f.contains("order=op_obj"))
  }

  test("LD and PD path n-grams with edge labels/directions (goldens)") {
    // single sentence with a verb root: merge calls table
    val oneTurn = Seq(turn(0, "merge calls table"))
    val cands = KgPipeline.candidateEdges("c0", oneTurn, cfg, tagger, withFeatures = true)
    assert(cands.size == 1)
    val f = cands.head.feats
    // LD path = [merge .. table] (token span), middle = [calls]
    assert(f("ld_tokens_count") == 1.0)
    assert(f("ld_bow_1g=calls") == 1.0)
    assert(f("ld_pos_1g=VERB") == 1.0)
    assert(f("ld_bow_3g=[S~calls~T]") == 1.0)
    // PD path merge→calls→table (root = calls): step directions B then F,
    // labels from the rule labeler: merge = noun BEFORE its verbal head →
    // nsubj, table = noun AFTER it → dobj
    assert(f("pd_len") == 3.0)
    assert(f("pd_tok=calls") == 1.0)
    assert(f("pd_undir_2g=nsubj~dobj") == 1.0)
    assert(f("pd_dir_2g=nsubj-B~dobj-F") == 1.0)
    assert(f("pd_full_1g=[S nsubj-B") == 1.0)
    // bag of words: stopword-free sentence words
    assert(f("bow_text=merge") == 1.0)
    assert(f("ne_bow=merge") == 1.0) // entity-part token count
    assert(f("ne_bow=table") == 1.0)
    assert(!f.contains("bow_text=the"))
    // intermediate tokens between heads (fwd since h1 < h2)
    assert(f("it_fwd_bow=calls") == 1.0)
    assert(f("it_bow=calls") == 1.0)
    assert(f("it_fwd_pos=VERB") == 1.0)
  }

  test("entity-head chains emit direction-tagged LABELED visits to depth 3") {
    val oneTurn = Seq(turn(0, "merge calls table"))
    val f = KgPipeline.candidateEdges("c0", oneTurn, cfg, tagger, withFeatures = true)
      .head.feats
    // merge's head token attaches to the root 'calls' as nsubj → upward
    // chain carries the traversed edge's label (entityhead.py:264-281)
    assert(f.contains("e1_dep_dist_3_from_nsubj"))
    assert(f.contains("e1_chain_dep_dist_3_-fw_nsubj"))
    assert(f("e1_dist_3_txt=calls") == 1.0)
    // 'calls' (root) has children merge (nsubj) and table (dobj) →
    // downward chains from e2 are label-distinct
    assert(f.contains("e2_chain_dep_dist_2_-fw-rv_nsubj"))
    assert(f.contains("e2_chain_dep_dist_2_-fw-rv_dobj"))
    assert(f.contains("e2_dep_dist_3_from_dobj"))
  }

  test("rule dep labels: det/prep/neg/aux and negation via neg-dep parity") {
    import graft.model.Tok
    import graft.nlp.DepGraph
    def toks(ws: String*): IndexedSeq[Tok] = {
      var off = 0
      ws.zipWithIndex.map { case (w, i) =>
        val t = Tok(i, w, off, off + w.length); off += w.length + 1; t
      }.toIndexedSeq
    }
    // root = first VERB = 'did' (verb lexicon); 'scan'/'merge'/'table'
    // are NOUNs here
    val s = toks("the", "scan", "did", "not", "merge", "with", "table")
    val hs = DepGraph.heads(s)
    val ls = DepGraph.depLabels(s, hs)
    assert(ls(0) == "det")
    assert(ls(3) == "neg")
    assert(ls(5) == "prep")
    // aux under the root: 'did' IS the root here → labeled root
    val root = hs.indices.find(i => hs(i) == i).get
    assert(ls(root) == "root")
    // odd neg count → negated, and parity matches the token-based form
    assert(DepGraph.isNegatedLabeled(ls))
    assert(DepGraph.isNegated(s))
    // double negation: two neg deps → even parity → not negated
    val pos = toks("merge", "can", "not", "never", "load", "table")
    val hs2 = DepGraph.heads(pos)
    val ls2 = DepGraph.depLabels(pos, hs2)
    assert(!DepGraph.isNegatedLabeled(ls2))
    val root2 = hs2.indices.find(i => hs2(i) == i).get
    assert(ls2(root2) == "root") // root = first VERB = 'can'
    assert(ls2.count(_ == "neg") == 2)
  }

  test("distributed salted doc counts == fused group-local counts") {
    import spark.implicits._
    // mentions as the fused pipeline would tag them
    val mentions = turns.flatMap { t =>
      graft.nlp.TextOps.segment(t.text, "generic").flatMap { case (si, _, _, toks) =>
        tagger(toks).map { case (cls, b, e) =>
          Mention("c0", t.turn_idx, si, cls, b, e,
            t.text.substring(b, e), 1.0, graft.nlp.TextOps.normKey(t.text.substring(b, e)))
        }
      }
    }.toDS()
    val doc = RelationScoring.docEntityCounts(mentions)
      .as[(String, String, String, Long)].collect()
      .map(r => ((r._2, r._3), r._4)).toMap
    assert(doc == Map(("op", "merge") -> 2L, ("op", "scan") -> 1L,
      ("obj", "table") -> 2L, ("obj", "stream") -> 1L))
    val pairs = RelationScoring.pairSentenceCounts(mentions, "op", "obj")
      .as[(String, String, Long)].collect()
      .map(r => (r._2, r._3)).toMap
    assert(pairs == Map("table|merge" -> 1L, "stream|merge" -> 1L,
      "table|scan" -> 1L))
  }
}
