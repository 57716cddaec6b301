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
  *     → repartition(N, conv_id) + sortWithinPartitions   ← the ONE shuffle
  *     → mapPartitions, streaming one conversation at a time:
  *         segment → tag (broadcast CRF/gazetteer) → doc-level counts
  *         (conversation == document, so `sentence.py:140-171`'s
  *         per-document aggregations are group-LOCAL — zero extra
  *         shuffle; the declarative route uses the salted distributed
  *         forms RelationScoring.docEntityCounts/pairSentenceCounts)
  *         → turn-window edge gen → edge features (sentence-local dep
  *         graphs, combined-sentence synthetic links for cross-sentence/
  *         turn pairs, `data.py:1540-1666`) → broadcast linear scoring
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

  /** Candidate edges of one conversation (materialized form — training
    * and tests; inference streams through [[foreachCandidate]] with the
    * positive-key short-circuit instead).
    */
  def candidateEdges(
      convId: String,
      turns: Seq[Turn],
      cfg: Config,
      tagger: IndexedSeq[Tok] => Seq[(String, Int, Int)],
      withFeatures: Boolean,
      scorer: Option[RelationScoring.LinearModel] = None): Vector[Candidate] = {
    val out = Vector.newBuilder[Candidate]
    foreachCandidate(convId, turns, cfg, tagger, withFeatures, scorer,
      skipKey = _ => false)(out += _)
    out.result()
  }

  /** Streaming candidate generation: segment → tag → doc-level counts →
    * turn-window pair generation (+ optional edge features over the
    * combined dependency context). Pure; no Spark.
    *
    * `skipKey` is consulted BEFORE features/score are computed for a
    * pair: the inference path passes the already-positive-key check —
    * once any occurrence pair of a canonical key scores positive, the
    * relation is predicted (`form_predicted_relations`,
    * `data.py:276-294`) and further occurrence pairs cannot change the
    * outcome, so their (expensive) feature enumeration is skipped.
    * Iteration is turn-ascending, so the first positive also carries the
    * minimal turn_idx the dedup keeps.
    */
  def foreachCandidate(
      convId: String,
      turns: Seq[Turn],
      cfg: Config,
      tagger: IndexedSeq[Tok] => Seq[(String, Int, Int)],
      withFeatures: Boolean,
      scorer: Option[RelationScoring.LinearModel],
      skipKey: String => Boolean)(emit: Candidate => Unit): Unit = {

    // Data contract: turn_idx is unique per conversation. Harden against
    // violations anyway (duplicate turn rows would double-iterate the
    // pair loop below AND duplicate sentence contexts): keep the FIRST
    // row per turn_idx in input order (sortBy is stable), matching the
    // first-write-wins rule of StreamingKg.ConvState.
    val sorted = turns.sortBy(_.turn_idx).distinctBy(_.turn_idx)
    // per-sentence dependency parse memoized across all edges touching
    // the sentence (the reference memoizes its per-sentence graphs the
    // same way, utils/graph.py:29-46)
    final case class SentCtx(turnIdx: Int, sentIdx: Int, toks: IndexedSeq[Tok],
        mentions: Seq[Mention]) {
      lazy val prep: RelationScoring.SentencePrep = {
        // one sentencePos pass shared by heads AND depLabels (hot loop)
        val sp = DepGraph.sentencePos(toks)
        val hs = DepGraph.heads(toks, sp)
        val adj = DepGraph.adjacency(toks.length, hs)
        val root = hs.indices.find(i => hs(i) == i).getOrElse(0)
        new RelationScoring.SentencePrep(toks, hs, adj,
          DepGraph.depths(adj, root), sentPos = sp)
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

    // ---- document-level counts (`relations/new/sentence.py:140-171`) --
    // conversation == document: group-local, no shuffle. entity2key is
    // the mention's norm key (first norm id else lowercased text,
    // `sentence.py:174-180`).
    val needCtx = withFeatures || scorer.isDefined
    val docCounts: collection.Map[(String, String), Int] =
      if (!needCtx) Map.empty
      else {
        val m = scala.collection.mutable.HashMap.empty[(String, String), Int]
        ctxs.foreach(_.mentions.foreach { mm =>
          val k = (mm.class_id, mm.norm)
          m.update(k, m.getOrElse(k, 0) + 1)
        })
        m
      }
    // distinct sentences where a (class1-norm, class2-norm) pair
    // co-occurs, keyed by class-ordered norm pair (`edge2key`,
    // `sentence.py:183-191`)
    val together: collection.Map[String, Int] =
      if (!needCtx) Map.empty
      else {
        val sents = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.Set[(Int, Int)]]
        ctxs.foreach { c =>
          val n1 = c.mentions.iterator.filter(_.class_id == cfg.class1)
            .map(_.norm).toSeq.distinct
          val n2 = c.mentions.iterator.filter(_.class_id == cfg.class2)
            .map(_.norm).toSeq.distinct
          for (a <- n1; b <- n2) {
            val key = if (cfg.class1 < cfg.class2) s"$a|$b" else s"$b|$a"
            sents.getOrElseUpdate(key, scala.collection.mutable.Set.empty) +=
              ((c.turnIdx, c.sentIdx))
          }
        }
        sents.map { case (k, v) => (k, v.size) }
      }
    def edgeCtxOf(m1: Mention, m2: Mention, sentMentions: Seq[Mention])
      : RelationScoring.EdgeCtx = {
      val pairKey =
        if (cfg.class1 < cfg.class2) s"${m1.norm}|${m2.norm}"
        else s"${m2.norm}|${m1.norm}"
      RelationScoring.EdgeCtx(
        sentMentions = sentMentions,
        e1DocCount = docCounts.getOrElse((m1.class_id, m1.norm), 0),
        e2DocCount = docCounts.getOrElse((m2.class_id, m2.norm), 0),
        togetherCount = together.getOrElse(pairKey, 0))
    }

    val byTurn = ctxs.groupBy(_.turnIdx)

    for (t1 <- sorted.map(_.turn_idx); dt <- 0 to cfg.window) {
      val t2 = t1 + dt
      if (byTurn.contains(t1) && byTurn.contains(t2)) {
        for (c1 <- byTurn(t1); c2 <- byTurn(t2)) {
          val sameSent = c1.turnIdx == c2.turnIdx && c1.sentIdx == c2.sentIdx
          val sentDist =
            if (c1.turnIdx == c2.turnIdx) math.abs(c2.sentIdx - c1.sentIdx)
            else cfg.window + math.abs(c2.turnIdx - c1.turnIdx)
          // combined context hoisted per sentence PAIR: token/dep work is
          // mention-independent, only the m2-side offsets shift per pair
          lazy val cross = combined(c1.toks, c2.toks, c1.prep.heads, c2.prep.heads)
          lazy val crossPrep = new RelationScoring.SentencePrep(
            cross.toks, cross.heads, cross.adj, cross.depth, cross.extraLabels)
          lazy val crossMentions: Seq[Mention] =
            c1.mentions ++ c2.mentions.map(m =>
              m.copy(begin = m.begin + cross.delta, end = m.end + cross.delta))
          for {
            m1 <- c1.mentions if m1.class_id == cfg.class1
            m2 <- c2.mentions if m2.class_id == cfg.class2
            // never pair a mention with itself (only possible when the two
            // entity classes coincide)
            if !(cfg.class1 == cfg.class2 && sameSent &&
              m1.begin == m2.begin && m1.end == m2.end)
          } {
            val key = tripleKey(cfg.relType, m1, m2)
            if (!skipKey(key)) {
              // same-sentence pairs share the memoized per-sentence prep
              // (POS/mask/stem/head/path caches amortize over the k²
              // pairs); cross-context pairs share the hoisted pair prep
              val (prep, mm1, mm2, sentMs) =
                if (sameSent) (c1.prep, m1, m2, c1.mentions)
                else (crossPrep, m1,
                  m2.copy(begin = m2.begin + cross.delta, end = m2.end + cross.delta),
                  crossMentions)
              lazy val ctx = edgeCtxOf(m1, m2, sentMs)
              val feats =
                if (!withFeatures) Map.empty[String, Double]
                else RelationScoring.features(prep, mm1, mm2, sameSent, sentDist, ctx)
              val score = scorer match {
                case None => 1.0
                case Some(lm) =>
                  RelationScoring.scoreEdge(lm, prep, mm1, mm2, sameSent, sentDist, ctx)
              }
              emit(Candidate(m1, m2, t1, sameSent, sentDist, key, feats, score))
            }
          }
        }
      }
    }
  }

  /** Per-conversation pure function: turns (any order) → deduped scored
    * triples (scorer None = stub extractor: every candidate is a
    * relation, `taggers.py:126-185`). Exposed for unit tests; `triples`
    * wires it distributed.
    *
    * Scoring short-circuit: once a canonical key has a positive
    * occurrence, remaining occurrence pairs of that key are skipped
    * before feature enumeration — with dense repeated mentions this
    * collapses O(k²) scored pairs per conversation to O(distinct keys)
    * once the positives are found. Predicted-set semantics are unchanged
    * (predicted = "any occurrence positive", `data.py:276-294` is binary;
    * turn kept = first = minimal), but the recorded TripleRow.score is
    * the FIRST positive occurrence's score, not the max among same-turn
    * positives — the reference's pred_target is binary, so either choice
    * is a valid confidence surrogate; downstream consumers should treat
    * score as "a positive margin", not "the best margin".
    */
  def processConversation(
      convId: String,
      turns: Seq[Turn],
      cfg: Config,
      tagger: IndexedSeq[Tok] => Seq[(String, Int, Int)],
      scorer: Option[RelationScoring.LinearModel]): Vector[TripleRow] = {

    val out = scala.collection.mutable.HashMap.empty[String, TripleRow]
    foreachCandidate(convId, turns, cfg, tagger, withFeatures = false, scorer,
      skipKey = out.contains) { c =>
      if (c.score > 0) {
        out.update(c.key, TripleRow(convId, c.turn1, cfg.relType,
          s"${c.m1.class_id}|${c.m1.text.toLowerCase}",
          s"${c.m2.class_id}|${c.m2.text.toLowerCase}", c.key, c.score))
      }
    }
    out.values.toVector.sortBy(r => (r.turn_idx, r.key))
  }

  /** Combined-token context for a cross-sentence/turn candidate pair:
    * the two sentences concatenated with re-based offsets, a synthetic
    * root↔root dependency (rootDepForward/Backward, `data.py:1617-1646`)
    * and same-word noun links (`data.py:1649-1666`). `delta` is the
    * offset shift applied to the second sentence's char coordinates.
    */
  final case class CombinedCtx(toks: IndexedSeq[Tok], heads: Array[Int],
      adj: Array[List[Int]], depth: Array[Int],
      extraLabels: Map[Long, String], delta: Int)

  def combined(toks1: IndexedSeq[Tok], toks2: IndexedSeq[Tok]): CombinedCtx =
    combined(toks1, toks2, DepGraph.heads(toks1), DepGraph.heads(toks2))

  /** Heads-reusing form: the pipeline passes each sentence's memoized
    * head assignment so per-sentence parsing never repeats per sentence
    * PAIR.
    */
  def combined(toks1: IndexedSeq[Tok], toks2: IndexedSeq[Tok],
               hs1: Array[Int], hs2: Array[Int]): CombinedCtx = {
    val delta = (if (toks1.nonEmpty) toks1.last.end + 1 else 0) -
      (if (toks2.nonEmpty) toks2.head.begin else 0)
    val shifted = toks2.zipWithIndex.map { case (t, i) =>
      Tok(toks1.length + i, t.word, t.begin + delta, t.end + delta)
    }
    val all = toks1 ++ shifted
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
    def pack(u: Int, v: Int): Long =
      (math.min(u, v).toLong << 32) | math.max(u, v).toLong
    val extraLabels: Map[Long, String] =
      (lemmaLinks.map(l => pack(l._1, l._2) -> "sameLemma") :+
        (pack(root1, root2) -> "rootDep")).toMap
    val adj = DepGraph.adjacency(all.length, heads, (root1, root2) +: lemmaLinks)
    CombinedCtx(all, heads, adj, DepGraph.depths(adj, root1), extraLabels, delta)
  }

  /** Backwards-compatible form returning the shifted m2 along with the
    * combined structures (used by tests asserting the re-basing).
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
      val c = combined(toks1, toks2)
      (c.toks, m1, m2.copy(begin = m2.begin + c.delta, end = m2.end + c.delta),
        c.adj, c.depth)
    }
  }

  /** Distributed form: ONE shuffle on conv_id, then per-conversation
    * map-local processing.
    *
    * The shuffle is an EXPLICIT `repartition(n, conv_id)` +
    * `sortWithinPartitions(conv_id, turn_idx)` + streaming group iterator
    * rather than `groupByKey.flatMapGroups`, for a reason that matters at
    * every scale: this stage is CPU-heavy and byte-light (a conversation
    * of transcript text costs ~1ms of feature/scoring CPU but only ~KBs
    * of shuffle), and AQE's size-based partition coalescing would fold a
    * few-MB shuffle into 1-2 tasks, serializing tens of seconds of CPU
    * (measured: 13s single-task vs <2s at 32; at 100 TB the same
    * mis-sizing shows up as thousand-core clusters idling on a handful of
    * straggler tasks). A user-specified repartition count is exempt from
    * AQE coalescing, and the within-partition sort gives O(conversation)
    * streaming memory exactly like flatMapGroups' internal sort-based
    * grouping.
    */
  def triples(turns: Dataset[Turn], cfg: Config,
              crfModel: Option[Crf.Model],
              gaz: Map[String, String],
              scorer: Option[RelationScoring.LinearModel]): Dataset[TripleRow] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val bcCrf = spark.sparkContext.broadcast(crfModel)
    val bcGaz = spark.sparkContext.broadcast(gaz)
    val bcLin = spark.sparkContext.broadcast(scorer)
    val nParts = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    turns
      .repartition(nParts, org.apache.spark.sql.functions.col("conv_id"))
      .sortWithinPartitions(
        org.apache.spark.sql.functions.col("conv_id"),
        org.apache.spark.sql.functions.col("turn_idx"))
      .mapPartitions { (it: Iterator[Turn]) =>
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
        // stream maximal runs of one conv_id (partition sorted by conv_id)
        val rows = it.buffered
        val groups = new Iterator[Seq[Turn]] {
          def hasNext: Boolean = rows.hasNext
          def next(): Seq[Turn] = {
            val cid = rows.head.conv_id
            val buf = Vector.newBuilder[Turn]
            while (rows.hasNext && rows.head.conv_id == cid)
              buf += rows.next()
            buf.result()
          }
        }
        groups.flatMap { ts =>
          processConversation(ts.head.conv_id, ts, cfg, tagger, bcLin.value).iterator
        }
      }
  }
}
