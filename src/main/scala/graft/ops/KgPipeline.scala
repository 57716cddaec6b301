package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.model._
import graft.nlp.{DepGraph, TextOps}

/** The fused end-to-end KG extraction pipeline — the engine's headline
  * operator and the unit the BASELINE throughput metric (turns/sec) is
  * measured on.
  *
  * Physical shape (designed for 10^12 turns / 1000 executors):
  *
  *   scan transcripts (partition-pruned, columns {conv_id,turn_idx,text})
  *     → groupByKey(conv_id)                  ← the ONE shuffle
  *     → flatMapGroups: per conversation, turns sorted by turn_idx:
  *         segment → tag (broadcast CRF/gazetteer) → turn-window edge gen
  *         → edge features (sentence-local dep graphs, combined-sentence
  *           synthetic links for cross-sentence/turn pairs,
  *           `data.py:1540-1666`) → broadcast linear scoring
  *         → canonical triple keys, per-conversation dedup (in-group,
  *           conversations are bounded)
  *
  * Everything after the shuffle is map-local; the reference runs the same
  * logical stages eagerly over a mutable in-memory tree
  * (`relation_pipelines.py:69-89`).
  */
object KgPipeline {

  final case class Config(
      relType: String,
      class1: String,
      class2: String,
      window: Int = 0,
      tokenizer: String = "generic")

  /** One candidate relation edge within a conversation. `feats` is empty
    * unless features were requested.
    */
  final case class Candidate(
      m1: Mention, m2: Mention, turn1: Int, sameSentence: Boolean,
      sentDist: Int, key: String, feats: Map[String, Double],
      score: Double = 1.0)

  def tripleKey(relType: String, m1: Mention, m2: Mention): String = {
    val e1 = s"${m1.class_id}|${m1.text.toLowerCase}"
    val e2 = s"${m2.class_id}|${m2.text.toLowerCase}"
    if (m2.class_id <= m1.class_id) s"$relType|$e2|$e1"
    else s"$relType|$e1|$e2"
  }

  /** Candidate edges of one conversation: segment → tag → turn-window
    * pair generation (+ optional edge features over the combined
    * dependency context). Pure; no Spark.
    */
  def candidateEdges(
      convId: String,
      turns: Seq[Turn],
      cfg: Config,
      tagger: IndexedSeq[Tok] => Seq[(String, Int, Int)],
      withFeatures: Boolean,
      scorer: Option[RelationScoring.LinearModel] = None): Vector[Candidate] = {

    val sorted = turns.sortBy(_.turn_idx)
    // per-sentence dependency parse memoized across all edges touching
    // the sentence (the reference memoizes its per-sentence graphs the
    // same way, utils/graph.py:29-46)
    final case class SentCtx(turnIdx: Int, sentIdx: Int, toks: IndexedSeq[Tok],
        mentions: Seq[Mention]) {
      lazy val prep: RelationScoring.SentencePrep = {
        val hs = DepGraph.heads(toks)
        val adj = DepGraph.adjacency(toks.length, hs)
        val root = hs.indices.find(i => hs(i) == i).getOrElse(0)
        new RelationScoring.SentencePrep(toks, adj, DepGraph.depths(adj, root))
      }
    }
    val ctxs: Vector[SentCtx] = sorted.iterator.flatMap { t =>
      TextOps.segment(t.text, cfg.tokenizer).map { case (si, _, _, toks) =>
        val ms = tagger(toks).map { case (cls, b, e) =>
          Mention(convId, t.turn_idx, si, cls, b, e,
            t.text.substring(b, e), 1.0, TextOps.normKey(t.text.substring(b, e)))
        }
        SentCtx(t.turn_idx, si, toks, ms)
      }
    }.toVector

    val byTurn = ctxs.groupBy(_.turnIdx)
    val out = Vector.newBuilder[Candidate]

    for (t1 <- sorted.map(_.turn_idx); dt <- 0 to cfg.window) {
      val t2 = t1 + dt
      if (byTurn.contains(t1) && byTurn.contains(t2)) {
        for {
          c1 <- byTurn(t1)
          m1 <- c1.mentions if m1.class_id == cfg.class1
          c2 <- byTurn(t2)
          m2 <- c2.mentions if m2.class_id == cfg.class2
          // never pair a mention with itself (only possible when the two
          // entity classes coincide)
          if !(cfg.class1 == cfg.class2 && c1.sentIdx == c2.sentIdx &&
            c1.turnIdx == c2.turnIdx && m1.begin == m2.begin && m1.end == m2.end)
        } {
          val sameSent = c1.turnIdx == c2.turnIdx && c1.sentIdx == c2.sentIdx
          val sentDist =
            if (c1.turnIdx == c2.turnIdx) math.abs(c2.sentIdx - c1.sentIdx)
            else cfg.window + math.abs(c2.turnIdx - c1.turnIdx)
          // same-sentence pairs share the memoized per-sentence prep
          // (POS/mask/stem/head/path caches amortize over the k² pairs);
          // cross-context pairs build a combined prep per pair
          def combinedCtx: (RelationScoring.SentencePrep, Mention, Mention) = {
            val (toks, mm1, mm2, adj, depth) = combined(c1.toks, c2.toks, sameSent, m1, m2)
            (new RelationScoring.SentencePrep(toks, adj, depth), mm1, mm2)
          }
          val feats =
            if (!withFeatures) Map.empty[String, Double]
            else if (sameSent)
              RelationScoring.features(c1.toks, c1.prep.adj, c1.prep.depth,
                m1, m2, sameSent, sentDist)
            else {
              val (p, mm1, mm2) = combinedCtx
              RelationScoring.features(p.toks, p.adj, p.depth, mm1, mm2, sameSent, sentDist)
            }
          val score = scorer match {
            case None => 1.0
            case Some(lm) =>
              if (sameSent)
                RelationScoring.scoreEdge(lm, c1.prep, m1, m2, sameSent, sentDist)
              else {
                val (p, mm1, mm2) = combinedCtx
                RelationScoring.scoreEdge(lm, p, mm1, mm2, sameSent, sentDist)
              }
          }
          out += Candidate(m1, m2, t1, sameSent, sentDist,
            tripleKey(cfg.relType, m1, m2), feats, score)
        }
      }
    }
    out.result()
  }

  /** Per-conversation pure function: turns (any order) → deduped scored
    * triples (scorer None = stub extractor: every candidate is a
    * relation, `taggers.py:126-185`). Exposed for unit tests; `triples`
    * wires it distributed.
    */
  def processConversation(
      convId: String,
      turns: Seq[Turn],
      cfg: Config,
      tagger: IndexedSeq[Tok] => Seq[(String, Int, Int)],
      scorer: Option[RelationScoring.LinearModel]): Vector[TripleRow] = {

    val out = scala.collection.mutable.HashMap.empty[String, TripleRow]
    candidateEdges(convId, turns, cfg, tagger, withFeatures = false, scorer)
      .foreach { c =>
        val score = c.score
        if (score > 0) {
          val row = TripleRow(convId, c.turn1, cfg.relType,
            s"${c.m1.class_id}|${c.m1.text.toLowerCase}",
            s"${c.m2.class_id}|${c.m2.text.toLowerCase}", c.key, score)
          out.get(c.key) match {
            case Some(prev) if prev.turn_idx < row.turn_idx => // keep first turn
            case Some(prev) if prev.turn_idx == row.turn_idx && prev.score >= score =>
            case _ => out.update(c.key, row)
          }
        }
      }
    out.values.toVector.sortBy(r => (r.turn_idx, r.key))
  }

  /** Combined-token context for a candidate pair: same sentence → that
    * sentence; otherwise the two sentences concatenated with re-based
    * offsets, a synthetic root↔root dependency (rootDepForward/Backward,
    * `data.py:1617-1646`) and same-word noun links (`data.py:1649-1666`).
    */
  def combined(toks1: IndexedSeq[Tok], toks2: IndexedSeq[Tok], sameCtx: Boolean,
               m1: Mention, m2: Mention)
    : (IndexedSeq[Tok], Mention, Mention, Array[List[Int]], Array[Int]) = {
    if (sameCtx) {
      val hs = DepGraph.heads(toks1)
      val adj = DepGraph.adjacency(toks1.length, hs)
      val root = hs.indices.find(i => hs(i) == i).getOrElse(0)
      (toks1, m1, m2, adj, DepGraph.depths(adj, root))
    } else {
      val delta = (if (toks1.nonEmpty) toks1.last.end + 1 else 0) -
        (if (toks2.nonEmpty) toks2.head.begin else 0)
      val shifted = toks2.zipWithIndex.map { case (t, i) =>
        Tok(toks1.length + i, t.word, t.begin + delta, t.end + delta)
      }
      val all = toks1 ++ shifted
      val hs1 = DepGraph.heads(toks1)
      val hs2 = DepGraph.heads(toks2)
      val heads = Array.tabulate(all.length) { i =>
        if (i < toks1.length) hs1(i) else hs2(i - toks1.length) + toks1.length
      }
      val root1 = hs1.indices.find(i => hs1(i) == i).getOrElse(0)
      val root2 = hs2.indices.find(i => hs2(i) == i).getOrElse(0) + toks1.length
      // same-word noun links across the two sides (`data.py:1649-1666`)
      val nouns1 = toks1.indices.filter(i => DepGraph.coarsePos(toks1(i).word) == "NOUN")
      val nouns2 = shifted.indices.map(_ + toks1.length)
        .filter(i => DepGraph.coarsePos(all(i).word) == "NOUN")
      val lemmaLinks = for {
        a <- nouns1; b <- nouns2
        if all(a).word.equalsIgnoreCase(all(b).word)
      } yield (a, b)
      val adj = DepGraph.adjacency(all.length, heads, (root1, root2) +: lemmaLinks)
      val m2s = m2.copy(begin = m2.begin + delta, end = m2.end + delta)
      (all, m1, m2s, adj, DepGraph.depths(adj, root1))
    }
  }

  /** Distributed form: one shuffle on conv_id, then flatMapGroups. */
  def triples(turns: Dataset[Turn], cfg: Config,
              crfModel: Option[Crf.Model],
              gaz: Map[String, String],
              scorer: Option[RelationScoring.LinearModel]): Dataset[TripleRow] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bcCrf = spark.sparkContext.broadcast(crfModel)
    val bcGaz = spark.sparkContext.broadcast(gaz)
    val bcLin = spark.sparkContext.broadcast(scorer)
    turns.groupByKey(_.conv_id).flatMapGroups { (convId, it) =>
      val tagger: IndexedSeq[Tok] => Seq[(String, Int, Int)] = bcCrf.value match {
        case Some(m) => toks => {
          if (toks.isEmpty) Nil
          else {
            val feats = Crf.tokenFeatures(toks).map(fs => "__bias__" :: fs)
            val pred = Crf.viterbi(m, feats)
            graft.nlp.Labeling.decode(toks, pred, Seq.fill(toks.length)(1.0)).map { d =>
              val firstLabel = pred(toks.indexWhere(_.begin == d.begin))
              val cls = if (firstLabel.length > 2) firstLabel.substring(2) else firstLabel
              (cls, d.begin, d.end)
            }
          }
        }
        case None => toks => {
          val g = bcGaz.value
          toks.flatMap(t => g.get(t.word.toLowerCase).map(cls => (cls, t.begin, t.end)))
        }
      }
      processConversation(convId, it.toSeq, cfg, tagger, bcLin.value).iterator
    }
  }
}
