package graft.ops

import graft.model._
import graft.nlp.{DepGraph, Porter, TextOps}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Edge feature vectors + SVM-style linear relation scoring — nalaf's
  * relation-extraction stage (nalaf/features/relations package,
  * `learning/lib/sklsvm.py`) re-expressed for distributed scoring.
  *
  * Feature indexing uses the hashing trick (fixed 2^18 dims) instead of
  * the reference's shared mutable name→index dictionary
  * (`features/relations/__init__.py:24-64`): at 10^12 turns a grow-only
  * interning dict is a driver bottleneck and a broadcast-consistency
  * hazard; hashing gives identical train/predict indices with zero
  * coordination, the standard trade (rare collisions) at this scale.
  *
  * The *feature definitions* mirror the reference's generators:
  *  - SentenceFeatureGenerator, complete incl. the DOCUMENT-level
  *    `f_entity{1,2}_count` / `f_diff_sents_together_count`
  *    (`relations/new/sentence.py:12-216`; doc-level 140-171). In the
  *    fused pipeline the document == the conversation, so the doc-level
  *    counts are computed group-locally (no extra shuffle); the
  *    declarative route uses the salted two-phase [[docEntityCounts]] /
  *    [[pairSentenceCounts]] aggregations (north_rule shape).
  *  - DependencyFeatureGenerator LD + PD paths with bow/POS n-grams
  *    1..4, token counts ±punct, path negation, and the PD-only
  *    undirected/directed/full edge n-grams (`new/dependency.py:20-221`,
  *    path algebra `utils/graphs.py:186-xxx` Path/PathNode). OW/IW
  *    windows are skipped exactly like the reference (commented out
  *    there, `dependency.py:129-161`).
  *  - Entity-head surface/case/digit/punct/char-2-3-grams
  *    (`relations/entityhead.py:7-229`) and dependency CHAINS to depth 3
  *    with linear-order features (`entityhead.py:230-302`). Chain and PD
  *    edge labels come from the deterministic rule labeler
  *    (DepGraph.depLabels: nsubj/dobj/det/prep/neg/aux/... by POS pair +
  *    position), the hermetic stand-in for spaCy's labeled parse — so
  *    `from_<dep>`/`-fw_<dep>` chain names, PD edge-label n-grams and
  *    `neg`-dependency negation all carry real label signal.
  *  - LinearDistance / EntityOrder (`relations/context.py:5-73`).
  *  - IntermediateTokens with fwd/bkd directional variants + the
  *    undirected set (`context.py:76-166`).
  *  - NamedEntityCount / BagOfWords / StemmedBagOfWords
  *    (`relations/sentence.py:6-113`). Deviation: the reference adds the
  *    stemmed BOW only in training mode (dead weights at predict); we
  *    enumerate identically in both paths so train/predict indices agree.
  */
object RelationScoring {

  val Dims = 1 << 18

  final case class Feats(idx: Array[Int], value: Array[Double])

  /** FNV-1a over the chars' low bytes — identical to the UTF-8-byte FNV
    * on ASCII names (all generated names are ASCII except embedded corpus
    * words, which fold consistently on both the train and predict path —
    * consistency, not a specific value, is the hashing-trick contract).
    * Char-wise avoids the String.getBytes array allocation per feature
    * name, the single largest allocation source in the scoring hot path.
    */
  private[graft] def h(s: CharSequence): Int = {
    var hh = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      hh ^= (s.charAt(i) & 0xffL)
      hh *= 0x100000001b3L
      i += 1
    }
    ((hh % Dims) + Dims).toInt % Dims
  }

  /** Per-edge context beyond the sentence: mentions of the edge's
    * sentence(s) (combined-token coordinates) and the document-level
    * counts of `relations/new/sentence.py:140-171`:
    * `e1DocCount`/`e2DocCount` = occurrences of the entity's norm key in
    * the whole conversation (per class); `togetherCount` = number of
    * DISTINCT sentences where the pair's norm keys co-occur.
    */
  final case class EdgeCtx(
      sentMentions: Seq[Mention] = Nil,
      e1DocCount: Int = 0,
      e2DocCount: Int = 0,
      togetherCount: Int = 0)
  object EdgeCtx { val empty: EdgeCtx = EdgeCtx() }

  /** Sentence-local candidate: tokens of the (possibly combined) sentence,
    * token index of each entity head, char spans of the two mentions.
    * Map form — used by TRAINING (needs materialized vectors) and tests.
    */
  def features(
      toks: IndexedSeq[Tok],
      heads: Array[Int],
      adj: Array[List[Int]],
      depth: Array[Int],
      m1: Mention, m2: Mention,
      sameSentence: Boolean, sentDist: Int,
      ctx: EdgeCtx = EdgeCtx.empty): Map[String, Double] =
    features(new SentencePrep(toks, heads, adj, depth), m1, m2,
      sameSentence, sentDist, ctx)

  /** Prep-sharing form — the pipeline passes the SAME memoized prep
    * (incl. synthetic-link labels) to both the Map and the fold path so
    * hashed indices agree by construction.
    */
  def features(prep: SentencePrep, m1: Mention, m2: Mention,
      sameSentence: Boolean, sentDist: Int,
      ctx: EdgeCtx): Map[String, Double] = {
    val out = scala.collection.mutable.HashMap.empty[String, Double]
    enumerate(prep, m1, m2, sameSentence, sentDist, ctx) { (cs, v) =>
      val f = cs.toString
      out.update(f, out.getOrElse(f, 0.0) + v)
    }
    out.toMap
  }

  /** Zero-materialization scoring: identical feature enumeration, each
    * (name, value) folded straight into w·x — no map, no vector, no
    * sort. This is the inference hot path (GC-bound at 32 threads
    * otherwise).
    */
  def scoreEdge(model: LinearModel, prep: SentencePrep,
      m1: Mention, m2: Mention,
      sameSentence: Boolean, sentDist: Int,
      ctx: EdgeCtx = EdgeCtx.empty): Double = {
    var s = model.b
    enumerate(prep, m1, m2, sameSentence, sentDist, ctx) { (f, v) =>
      s += model.w(h(f)) * v
    }
    s
  }

  /** Per-sentence memoized tables shared across all candidate pairs of
    * the sentence — the relational analogue of the reference's
    * per-sentence graph cache (`utils/graph.py:29-46`). With dense
    * mentions (k per class) a sentence yields O(k²) pairs; without this
    * cache POS/stem/mask/head work is recomputed per pair.
    *
    * `heads(i)` is token i's dependency head (root points to itself);
    * `extraLabels` carries the labels of synthetic combined-sentence
    * links ((min,max)-packed key → label, `data.py:1617-1666`).
    */
  final class SentencePrep(val toks: IndexedSeq[Tok], val heads: Array[Int],
                           val adj: Array[List[Int]], val depth: Array[Int],
                           val extraLabels: Map[Long, String] = Map.empty,
                           sentPos: IndexedSeq[String] = null) {
    // per-index caches (not eager arrays): a pair typically touches only
    // its path/between tokens, so cross-context preps stay cheap while
    // dense same-sentence preps still amortize fully
    private val posCache = new Array[String](toks.length)
    def pos(i: Int): String = {
      if (posCache(i) == null) posCache(i) = DepGraph.coarsePos(toks(i).word)
      posCache(i)
    }
    private val maskCache = new Array[String](toks.length)
    def maskedBase(i: Int): String = {
      if (maskCache(i) == null) maskCache(i) = TextOps.maskedWord(toks(i).word, None)
      maskCache(i)
    }
    private val stemCache = new Array[String](toks.length)
    def stem(i: Int): String = {
      if (stemCache(i) == null) stemCache(i) = Porter.stem(toks(i).word)
      stemCache(i)
    }
    private val lowerCache = new Array[String](toks.length)
    def lower(i: Int): String = {
      if (lowerCache(i) == null) lowerCache(i) = toks(i).word.toLowerCase
      lowerCache(i)
    }
    /** Rule-assigned dependency label of each token's edge to its head
      * (`token.features['dep']` in the reference) — shared by the PD edge
      * n-grams, the chain features and the negation test.
      */
    lazy val depLabels: Array[String] =
      if (sentPos != null) DepGraph.depLabels(toks, heads, sentPos)
      else DepGraph.depLabels(toks, heads)
    // labeled-dependency form (`data.py:1106-1118`): odd # of `neg` deps
    lazy val negated: Boolean = DepGraph.isNegatedLabeled(depLabels)
    lazy val mainVerbStems: List[String] = {
      val rootIdx = depth.indices.find(depth(_) == 0).getOrElse(0)
      DepGraph.mainVerbs(toks, adj, rootIdx)
        .map(v => Porter.stem(toks(v).word.toLowerCase)).toList
    }
    private val headCache = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    def head(begin: Int, end: Int): Int =
      headCache.getOrElseUpdate((begin, end),
        DepGraph.entityHead(toks, depth, begin, end))
    private val pathCache = scala.collection.mutable.HashMap.empty[(Int, Int), Vector[Int]]
    def path(a: Int, b: Int): Vector[Int] =
      pathCache.getOrElseUpdate((a, b), DepGraph.shortestPath(adj, a, b))

    /** children(i) = tokens whose head is i (excluding the root's
      * self-loop) — precomputed once so chain walks don't scan the heads
      * array per visit.
      */
    lazy val childrenOf: Array[Array[Int]] = {
      val counts = new Array[Int](heads.length)
      var i = 0
      while (i < heads.length) {
        if (heads(i) != i) counts(heads(i)) += 1
        i += 1
      }
      val out = Array.tabulate(heads.length)(j => new Array[Int](counts(j)))
      val fill = new Array[Int](heads.length)
      i = 0
      while (i < heads.length) {
        if (heads(i) != i) {
          val p = heads(i)
          out(p)(fill(p)) = i
          fill(p) += 1
        }
        i += 1
      }
      out
    }

    /** One step of an entity-head dependency chain walk
      * (`entityhead.py:264-281`): the visited token, remaining depth,
      * direction (true = -fw via the head, false = -rv via a child), the
      * chain string accumulated BEFORE this step, and the dependency
      * LABEL of the traversed edge (the reference's
      * `token.features['dep']` for upward steps, `dependency[1]` for
      * downward ones — both are the label of the edge's lower node).
      * Pair-independent — cached per start token and replayed per
      * candidate pair.
      */
    final case class ChainVisit(token: Int, depth: Int, fw: Boolean,
                                chain: String, label: String)
    private val chainCache = scala.collection.mutable.HashMap.empty[Int, Array[ChainVisit]]
    def chainVisitsOf(start: Int): Array[ChainVisit] =
      chainCache.getOrElseUpdate(start, {
        val out = scala.collection.mutable.ArrayBuffer.empty[ChainVisit]
        def walk(t: Int, chain: String, depthLeft: Int): Unit = {
          if (depthLeft == 0) return
          val parent = if (t < heads.length) heads(t) else t
          if (parent != t) {
            out += ChainVisit(parent, depthLeft, fw = true, chain, depLabels(t))
            walk(parent, chain + "-fw", depthLeft - 1)
          }
          val kids = if (t < childrenOf.length) childrenOf(t) else Array.emptyIntArray
          var ci = 0
          while (ci < kids.length) {
            out += ChainVisit(kids(ci), depthLeft, fw = false, chain,
              depLabels(kids(ci)))
            walk(kids(ci), chain + "-rv", depthLeft - 1)
            ci += 1
          }
        }
        walk(start, "", 3)
        out.toArray
      })

    private def pack(u: Int, v: Int): Long =
      (math.min(u, v).toLong << 32) | math.max(u, v).toLong
    /** Dependency label of the edge (u, v): the rule-assigned label of
      * the edge's LOWER node for parser edges, the synthetic link's label
      * otherwise (`PathNode.edge_type`).
      */
    def edgeLabel(u: Int, v: Int): String =
      if (v < heads.length && heads(v) == u) depLabels(v)
      else if (u < heads.length && heads(u) == v) depLabels(u)
      else extraLabels.getOrElse(pack(u, v), "user")
    /** Direction of the step u→v: "F" when u is v's head, "B" when v is
      * u's head (`PathNode.str_direction`); synthetic links read forward
      * in insertion (left-to-right) order.
      */
    def edgeDir(u: Int, v: Int): String =
      if (v < heads.length && heads(v) == u) "F"
      else if (u < heads.length && heads(u) == v) "B"
      else if (u < v) "F" else "B"
  }

  // compact English stopword list (NLTK-core subset) for the BOW
  // generators — self-contained, no external corpus
  private val stopWords: Set[String] = Set(
    "i", "me", "my", "we", "our", "you", "your", "he", "him", "his", "she",
    "her", "it", "its", "they", "them", "their", "what", "which", "who",
    "this", "that", "these", "those", "am", "is", "are", "was", "were",
    "be", "been", "being", "have", "has", "had", "do", "does", "did", "a",
    "an", "the", "and", "but", "if", "or", "because", "as", "until",
    "while", "of", "at", "by", "for", "with", "about", "against",
    "between", "into", "through", "during", "before", "after", "above",
    "below", "to", "from", "up", "down", "in", "out", "on", "off", "over",
    "under", "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "can", "will", "just", "should",
    "now")

  /** Single source of truth for the edge feature set; both the training
    * (Map) and inference (fold) paths stream through here, so hashed
    * indices agree by construction.
    */
  private def enumerate(
      prep: SentencePrep,
      m1: Mention, m2: Mention,
      sameSentence: Boolean, sentDist: Int,
      ctx: EdgeCtx)(add0: (CharSequence, Double) => Unit): Unit = {

    val toks = prep.toks
    def add(f: String, v: Double = 1.0): Unit = add0(f, v)
    // zero-materialization name assembly: the scoring path hashes the
    // CharSequence directly, so multi-part names never become Strings —
    // the single reusable builder removes the dominant allocation source
    // of the 32-thread hot path (bandwidth-stall-bound on this box)
    val nb = new java.lang.StringBuilder(96)
    def add2(a: String, b: String, v: Double = 1.0): Unit = {
      nb.setLength(0); nb.append(a).append(b); add0(nb, v)
    }
    def add3(a: String, b: String, c: String): Unit = {
      nb.setLength(0); nb.append(a).append(b).append(c); add0(nb, 1.0)
    }

    val h1 = prep.head(m1.begin, m1.end)
    val h2 = prep.head(m2.begin, m2.end)

    def inSpan(t: Tok, m: Mention): Boolean = t.begin >= m.begin && t.end <= m.end
    // per-pair caches: chains/paths/BOW revisit the same tokens many times
    val maskedCache = new Array[String](toks.length)
    def masked(i: Int): String = {
      var v = maskedCache(i)
      if (v == null) {
        val t = toks(i)
        v = if (inSpan(t, m1)) m1.class_id
        else if (inSpan(t, m2)) m2.class_id
        else prep.maskedBase(i)
        maskedCache(i) = v
      }
      v
    }
    /** ann class of token i: the edge's entities first, then any other
      * sentence mention containing it (masked_text / ann_type semantics).
      */
    val annCache = new Array[String](toks.length)
    val annNone = "\u0000none"
    def annClass(i: Int): String = {
      var v = annCache(i)
      if (v == null) {
        val t = toks(i)
        v = if (inSpan(t, m1)) m1.class_id
        else if (inSpan(t, m2)) m2.class_id
        else ctx.sentMentions.find(m => inSpan(t, m)).map(_.class_id).getOrElse(annNone)
        annCache(i) = v
      }
      if (v eq annNone) null else v
    }

    // token index bounds of each mention (first/last token within span)
    def firstTok(m: Mention): Int = toks.indexWhere(t => inSpan(t, m))
    def lastTok(m: Mention): Int = toks.lastIndexWhere(t => inSpan(t, m))
    val e1First = firstTok(m1); val e1Last = lastTok(m1)
    val e2First = firstTok(m2); val e2Last = lastTok(m2)

    // ==== SentenceFeatureGenerator (`relations/new/sentence.py`) ========
    add(s"order=${m1.class_id}_${m2.class_id}")
    if (m1.class_id < m2.class_id) add("f_order")
    add(if (sameSentence) "same_sent" else s"sent_dist=$sentDist")

    // entity counts in the edge's sentence(s) (`sentence.py:82-105`):
    // per class, individual = count - 1 (one is the edge's own entity)
    if (ctx.sentMentions.nonEmpty) {
      val byClass = ctx.sentMentions.groupBy(_.class_id)
      var total = 0
      byClass.toSeq.sortBy(_._1).foreach { case (cls, ms) =>
        val ind = math.max(0, ms.size - 1)
        total += ind
        add(s"f_counts_ind=$cls", ind.toDouble)
      }
      add("f_counts_total", total.toDouble)
      // entities strictly between the pair (char-span between the
      // earlier mention's end and the later one's begin)
      val (lo, hi) =
        if (m1.begin <= m2.begin) (m1.end, m2.begin) else (m2.end, m1.begin)
      val between = ctx.sentMentions.filter(m => m.begin >= lo && m.end <= hi)
      var btotal = 0
      between.groupBy(_.class_id).toSeq.sortBy(_._1).foreach { case (cls, ms) =>
        btotal += ms.size
        add(s"f_counts_bet=$cls", ms.size.toDouble)
      }
      add("f_counts_bet_total", btotal.toDouble)
    }

    // masked-lemma BOW + coarse POS of the whole (combined) sentence
    // (`sentence.py:111-113`)
    var ti = 0
    while (ti < toks.length) {
      add2("f_bow=", masked(ti))
      add2("f_pos=", prep.pos(ti))
      ti += 1
    }
    add("f_tokens_count", toks.length.toDouble)
    if (e1First >= 0) add("f_tokens_count_before", e1First.toDouble)
    if (e2Last >= 0) add("f_tokens_count_after", (toks.length - 1 - e2Last).toDouble)

    val between = if (h1 >= 0 && h2 >= 0) {
      val lo = math.min(h1, h2); val hi = math.max(h1, h2)
      (lo + 1 until hi)
    } else 0 until 0
    add("n_between", between.size.toDouble)
    between.foreach { i => add2("bow_bet=", masked(i)) }

    // sentence negation + main-verb lemmas (`sentence.py:127-138`)
    if (prep.negated) add("sent_negated")
    if (prep.mainVerbStems.isEmpty) add("main_verb=NO_MAIN_VERB")
    else prep.mainVerbStems.foreach { v => add2("main_verb=", v) }

    // DOCUMENT-level (`sentence.py:140-171`): per-conversation norm-key
    // frequency of each entity, distinct-sentence co-occurrence count
    add("f_entity1_count", ctx.e1DocCount.toDouble)
    add("f_entity2_count", ctx.e2DocCount.toDouble)
    if (ctx.togetherCount > 0)
      add("f_diff_sents_together_count", ctx.togetherCount.toDouble)

    // ==== LinearDistance / EntityOrder (`relations/context.py:5-73`) ====
    if (h1 >= 0 && h2 >= 0) {
      val d = math.abs(h1 - h2)
      add("tok_dist", d.toDouble)
      if (d > 5) add("tok_dist_gt5")
    }

    // ==== Entity-head surface (`relations/entityhead.py:7-229`) =========
    // stem/POS + case/digit/punct flags and char 2/3-grams
    def headSurface(prefix: String, hi: Int): Unit = if (hi >= 0) {
      val w = toks(hi).word
      add3(prefix, "_stem=", prep.stem(hi))
      add3(prefix, "_pos=", prep.pos(hi))
      if (w.nonEmpty && w.head.isUpper) add(s"${prefix}_cap")
      if (w.exists(_.isDigit)) add(s"${prefix}_digits")
      if (w.contains('-') || w.contains('/')) add(s"${prefix}_punct")
      var n = 2
      while (n <= 3) {
        var i = 0
        while (i + n <= w.length) {
          add(s"${prefix}_${n}g=${w.substring(i, i + n)}")
          i += 1
        }
        n += 1
      }
    }
    headSurface("h1", h1)
    headSurface("h2", h2)

    // per-token surface features of the entities' own tokens —
    // TokenFeatureGenerator.token_features (`relations/__init__.py:127-170`)
    // via the chain generator (`entityhead.py:252-260`): txt, pos, masked
    // text, stem of the masked text (the reference stems the mask — its
    // own TODO notes the oddity; mirrored), and annotated_types = the
    // token's entity class + entityK_class marker.
    def entityTokenFeats(prefix: String, first: Int, last: Int,
                         entMarker: String, cls: String): Unit =
      if (first >= 0) {
        var i = first
        while (i <= last) {
          add3(prefix, "_txt=", prep.lower(i))
          add3(prefix, "_pos=", prep.pos(i))
          add3(prefix, "_masked=", masked(i))
          add3(prefix, "_stem_masked=", Porter.stem(masked(i)))
          add3(prefix, "_ann=", cls)
          add3(prefix, "_ann=", entMarker)
          i += 1
        }
      }
    entityTokenFeats("e1", e1First, e1Last, "entity1_" + m1.class_id, m1.class_id)
    entityTokenFeats("e2", e2First, e2Last, "entity2_" + m2.class_id, m2.class_id)

    // ==== IntermediateTokens (`context.py:76-166`): tokens strictly
    // between the heads, directional (fwd when h1 < h2, bkd otherwise)
    // plus the undirected variants ================================
    if (h1 >= 0 && h2 >= 0) {
      val pBow = if (h1 < h2) "it_fwd_bow=" else "it_bkd_bow="
      val pMask = if (h1 < h2) "it_fwd_masked=" else "it_bkd_masked="
      val pStem = if (h1 < h2) "it_fwd_stem=" else "it_bkd_stem="
      val pPos = if (h1 < h2) "it_fwd_pos=" else "it_bkd_pos="
      between.foreach { i =>
        val w = prep.lower(i)
        add2(pBow, w)
        add2(pMask, masked(i))
        add2(pStem, prep.stem(i))
        add2(pPos, prep.pos(i))
        add2("it_bow=", w)
        add2("it_masked=", masked(i))
        add2("it_stem=", prep.stem(i))
        add2("it_pos=", prep.pos(i))
      }
    }

    // ==== NamedEntityCount (`relations/sentence.py:6-30`): count of
    // same-class entities in the edge's sentence(s), count in the name ==
    if (ctx.sentMentions.nonEmpty) {
      ctx.sentMentions.groupBy(_.class_id).toSeq.sortBy(_._1)
        .foreach { case (cls, ms) => add(s"ne_count_${cls}_${ms.size}") }
    }

    // ==== BagOfWords / StemmedBagOfWords (`relations/sentence.py:33-113`)
    // sentence BOW minus stopwords/punct; per-entity-token word counts ==
    {
      val neCounts = scala.collection.mutable.HashMap.empty[String, Int]
      var i = 0
      while (i < toks.length) {
        val w = toks(i).word
        val isPunct = prep.pos(i) == "PUNCT"
        if (!isPunct && !stopWords.contains(prep.lower(i))) {
          add2("bow_text=", w)
          if (annClass(i) != null)
            neCounts.update(w, neCounts.getOrElse(w, 0) + 1)
        }
        if (!isPunct && !stopWords.contains(prep.stem(i)))
          add2("bow_stem=", prep.stem(i))
        i += 1
      }
      neCounts.toSeq.sortBy(_._1).foreach { case (w, c) =>
        add2("ne_bow=", w, c.toDouble)
      }
    }

    // ==== DependencyFeatureGenerator LD + PD (`new/dependency.py`) ======
    // LD: linear tokens from e1's last to e2's first (sorted by offset);
    // PD: shortest dependency path between the heads. Both emit masked-
    // lemma and POS n-grams 1..4 with [SOURCE/[TARGET] sentinels, token
    // counts ±punct and path negation; PD adds undirected/directed edge
    // n-grams and full n-grams (`utils/graphs.py` Path string algebra).
    def pathFeatures(name: String, path: IndexedSeq[Int], withEdges: Boolean): Unit = {
      if (path.length < 2) return
      val last = path.length - 1
      // prerender every per-node string ONCE (the n-gram assembly below
      // touches each node up to 4× per kind on long linear paths)
      val bowR = new Array[String](path.length)
      val posR = new Array[String](path.length)
      var k = 0
      while (k <= last) {
        val i = path(k)
        bowR(k) = if (k == 0) "[S" else if (k == last) "T]" else masked(i)
        posR(k) = if (k == 0) "[S" else if (k == last) "T]" else prep.pos(i)
        k += 1
      }
      // token-only n-grams: n=1 over middle, n>1 over all nodes
      def tokenNGrams(kind: String, rendered: Array[String],
                      renderMid: Int => String): Unit = {
        val g1 = name + "_" + kind + "_1g="
        var k = 1
        while (k < last) { add2(g1, renderMid(path(k))); k += 1 }
        var n = 2
        while (n <= 4) {
          val gn = name + "_" + kind + "_" + n + "g="
          var s = 0
          while (s + n <= path.length) {
            nb.setLength(0); nb.append(gn)
            var j = 0
            while (j < n) {
              if (j > 0) nb.append('~')
              nb.append(rendered(s + j))
              j += 1
            }
            add0(nb, 1.0)
            s += 1
          }
          n += 1
        }
      }
      tokenNGrams("bow", bowR, masked)
      tokenNGrams("pos", posR, prep.pos)
      // counts + negation over the middle tokens
      val middle = (1 until last).map(path(_))
      add(name + "_tokens_count", middle.size.toDouble)
      add(name + "_tokens_count_nopunct",
        middle.count(i => prep.pos(i) != "PUNCT").toDouble)
      if (DepGraph.isNegated(middle.map(toks(_))))
        add(name + "_is_negated")
      if (withEdges) {
        // edge n-grams over source+middle steps (PathNode.edge_type)
        val undR = new Array[String](last)
        val dirR = new Array[String](last)
        k = 0
        while (k < last) {
          val lbl = prep.edgeLabel(path(k), path(k + 1))
          undR(k) = lbl
          dirR(k) = lbl + "-" + prep.edgeDir(path(k), path(k + 1))
          k += 1
        }
        var n = 1
        while (n <= 4) {
          val gu = name + "_undir_" + n + "g="
          val gd = name + "_dir_" + n + "g="
          var s = 0
          while (s + n <= last) {
            nb.setLength(0); nb.append(gu)
            var j = 0
            while (j < n) {
              if (j > 0) nb.append('~')
              nb.append(undR(s + j))
              j += 1
            }
            add0(nb, 1.0)
            nb.setLength(0); nb.append(gd)
            j = 0
            while (j < n) {
              if (j > 0) nb.append('~')
              nb.append(dirR(s + j))
              j += 1
            }
            add0(nb, 1.0)
            s += 1
          }
          n += 1
        }
        // full n-grams: token + directed edge per node (n=1 over
        // source+middle, n>1 over all nodes)
        val fullR = new Array[String](path.length)
        k = 0
        while (k <= last) {
          fullR(k) = if (k < last) bowR(k) + " " + dirR(k) else bowR(k)
          k += 1
        }
        val f1 = name + "_full_1g="
        k = 0
        while (k < last) { add2(f1, fullR(k)); k += 1 }
        n = 2
        while (n <= 4) {
          val gn = name + "_full_" + n + "g="
          var s = 0
          while (s + n <= path.length) {
            nb.setLength(0); nb.append(gn)
            var j = 0
            while (j < n) {
              if (j > 0) nb.append('~')
              nb.append(fullR(s + j))
              j += 1
            }
            add0(nb, 1.0)
            s += 1
          }
          n += 1
        }
      }
    }

    // LD path: e1-last .. e2-first in offset order (`dependency.py:163-168`)
    if (e1First >= 0 && e2First >= 0) {
      val (ldFrom, ldTo) =
        if (m1.begin <= m2.begin) (e1Last, e2First) else (e2Last, e1First)
      if (ldFrom >= 0 && ldTo > ldFrom)
        pathFeatures("ld", ldFrom to ldTo, withEdges = false)
    }

    // PD path (`dependency.py:170`): shortest path between heads
    if (h1 >= 0 && h2 >= 0) {
      val path = prep.path(h1, h2)
      if (path.nonEmpty) {
        add("pd_len", path.length.toDouble)
        val inner = path.drop(1).dropRight(1)
        inner.foreach { i =>
          add(s"pd_tok=${masked(i)}")
          add(s"pd_pos=${prep.pos(i)}")
          if (prep.pos(i) == "VERB")
            add(s"pd_verb=${Porter.stem(toks(i).word.toLowerCase)}")
        }
        pathFeatures("pd", path, withEdges = true)
      } else add("pd_unreachable")
    }

    // ==== Entity-head dependency chains, depth 3 (`entityhead.py:230-302`)
    // up = dependency_from (head), down = dependency_to (children); each
    // visited token contributes linear-order features (txt/pos/masked/
    // ann_type). Dep labels come from the deterministic rule set
    // (DepGraph.depLabels), mirroring the reference's
    // `from_<dep>` / `chain..-fw_<dep>` naming (`entityhead.py:264-281`).
    // the walk itself (pair-independent tree structure) is cached per
    // start token in SentencePrep and replayed here as a flat loop —
    // per-visit work is a handful of two-part concats (the walk revisits
    // O(fanout²) nodes on flat parses, so per-visit cost is the hot spot)
    def chainsFor(prefix: String, start: Int): Unit = {
      if (start < 0) return
      val depFrom = Array.tabulate(4)(d => prefix + "dep_dist_" + d + "_from_")
      val depTo = Array.tabulate(4)(d => prefix + "dep_dist_" + d + "_to_")
      val chainBase = Array.tabulate(4)(d => prefix + "chain_dep_dist_" + d + "_")
      val loBase = Array.tabulate(4)(d => prefix + "dist_" + d + "_")
      val visits = prep.chainVisitsOf(start)
      var vi = 0
      while (vi < visits.length) {
        val v = visits(vi)
        if (v.fw) {
          add2(depFrom(v.depth), v.label)
          nb.setLength(0)
          nb.append(chainBase(v.depth)).append(v.chain).append("-fw_").append(v.label)
          add0(nb, 1.0)
        } else {
          add2(depTo(v.depth), v.label)
          nb.setLength(0)
          nb.append(chainBase(v.depth)).append(v.chain).append("-rv_").append(v.label)
          add0(nb, 1.0)
        }
        val base = loBase(v.depth)
        val i = v.token
        add3(base, "txt=", prep.lower(i))
        add3(base, "pos=", prep.pos(i))
        add3(base, "masked=", masked(i))
        val ac = annClass(i)
        if (ac != null) {
          add2(base, "ann_entity")
          add3(base, "ann_type=", ac)
        }
        vi += 1
      }
    }
    chainsFor("e1_", h1)
    chainsFor("e2_", h2)
  }

  // ==== Distributed doc-level count aggregations (declarative route) ====

  /** Per-(conv, class, norm-key) mention counts — the distributed form of
    * the doc-level `f_entity{1,2}_count` (`sentence.py:140-154`), as the
    * SALTED two-phase groupBy + join-back the north_rule names: phase 1
    * aggregates within (key, salt) buckets so one hot surface form never
    * pins a single reducer, phase 2 merges the partials. Join the result
    * back to edges on (conv_id, class_id, norm).
    */
  def docEntityCounts(mentions: Dataset[Mention], salts: Int = 16): DataFrame = {
    import mentions.sparkSession.implicits._
    mentions.toDF()
      .withColumn("salt", pmod(xxhash64($"turn_idx", $"begin"), lit(salts)))
      .groupBy($"conv_id", $"class_id", $"norm", $"salt")
      .agg(count(lit(1)).as("n_p"))
      .groupBy($"conv_id", $"class_id", $"norm")
      .agg(sum($"n_p").cast("long").as("n_doc"))
  }

  /** Per-(conv, ordered norm-key pair) DISTINCT-sentence co-occurrence
    * counts — the distributed `f_diff_sents_together_count`
    * (`sentence.py:156-171`): same-sentence candidate pairs, deduped per
    * sentence, then counted per pair key.
    */
  def pairSentenceCounts(mentions: Dataset[Mention],
                         class1: String, class2: String): DataFrame = {
    val m = mentions.toDF()
    val a = m.filter(col("class_id") === class1)
      .select(col("conv_id"), col("turn_idx"), col("sent_idx"),
        col("norm").as("norm1"))
    val b = m.filter(col("class_id") === class2)
      .select(col("conv_id").as("conv_id2"), col("turn_idx").as("turn_idx2"),
        col("sent_idx").as("sent_idx2"), col("norm").as("norm2"))
    a.join(b, col("conv_id") === col("conv_id2") &&
        col("turn_idx") === col("turn_idx2") &&
        col("sent_idx") === col("sent_idx2"))
      .select(col("conv_id"),
        when(lit(class1) < lit(class2), concat_ws("|", col("norm1"), col("norm2")))
          .otherwise(concat_ws("|", col("norm2"), col("norm1"))).as("pair_key"),
        col("turn_idx"), col("sent_idx"))
      .distinct()
      .groupBy("conv_id", "pair_key")
      .agg(count(lit(1)).cast("long").as("n_sents_together"))
  }

  /** A hashed training example as a Dataset row (arrays encode natively). */
  final case class TrainRow(idx: Array[Int], value: Array[Double], label: Int)

  /** DISTRIBUTED training via iterative parameter mixing (McDonald,
    * Hall & Mann 2010 — public algorithm): each round broadcasts the
    * current model, every partition runs local Pegasos epochs over its
    * shard (warm-started, per-partition-seeded shuffles), and the
    * partition models are averaged into the next round's model with a
    * single typed reduce (no collect of the data; only nPartitions ×
    * |w| floats move). The driver-local [[train]] remains the default at
    * sample scale (the reference trains single-node, `sklsvm.py:44-55`);
    * this is the path when the edge set itself is cluster-sized.
    */
  def trainDistributed(data: Dataset[TrainRow], rounds: Int = 3,
                       epochsPerRound: Int = 3, lambda: Double = 1e-4,
                       seed: Long = 2727L): LinearModel = {
    val spark = data.sparkSession
    import spark.implicits._
    var model = LinearModel(new Array[Double](Dims), 0.0)
    // empty input: return the zero model instead of letting the typed
    // reduce below throw "empty collection" (mirrors Crf.trainDistributed)
    if (data.isEmpty) return model
    var r = 0
    while (r < rounds) {
      val bc = spark.sparkContext.broadcast(model)
      val round = r
      val (sumW, sumB, nParts) = data.mapPartitions { it =>
        val local = it.map(tr => (Feats(tr.idx, tr.value), tr.label)).toVector
        if (local.isEmpty) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val m = trainFrom(bc.value, local, epochsPerRound, lambda,
            seed ^ (round.toLong << 20) ^ pid.toLong)
          Iterator.single((m.w, m.b, 1))
        }
      }.reduce { (a, b) =>
        val w = new Array[Double](Dims)
        var i = 0
        while (i < Dims) { w(i) = a._1(i) + b._1(i); i += 1 }
        (w, a._2 + b._2, a._3 + b._3)
      }
      model = LinearModel(sumW.map(_ / nParts), sumB / nParts)
      bc.destroy()
      r += 1
    }
    model
  }

  def hashFeats(m: Map[String, Double]): Feats = {
    val grouped = m.toSeq.map { case (k, v) => (h(k), v) }
      .groupBy(_._1).map { case (i, vs) => (i, vs.map(_._2).sum) }
      .toArray.sortBy(_._1)
    Feats(grouped.map(_._1), grouped.map(_._2))
  }

  /** Linear model w·x + b. */
  final case class LinearModel(w: Array[Double], b: Double) {
    def score(f: Feats): Double = {
      var s = b
      var i = 0
      while (i < f.idx.length) { s += w(f.idx(i)) * f.value(i); i += 1 }
      s
    }
  }

  /** Driver-local Pegasos-style SVM training (hinge loss, L2, seeded
    * deterministic). The reference also trains single-node
    * (`sklsvm.py:44-55` on one collected scipy matrix); at scale you
    * sample-train and broadcast-score.
    */
  def train(data: Seq[(Feats, Int)], epochs: Int = 10, lambda: Double = 1e-4,
            seed: Long = 2727L): LinearModel =
    trainFrom(LinearModel(new Array[Double](Dims), 0.0), data, epochs, lambda, seed)

  /** Warm-start form — the unit of distributed parameter mixing. */
  def trainFrom(init: LinearModel, data: Seq[(Feats, Int)], epochs: Int,
                lambda: Double, seed: Long): LinearModel = {
    // w kept as scale*v so the per-step L2 shrink is O(1), updates O(nnz)
    val v = java.util.Arrays.copyOf(init.w, Dims)
    var scale = 1.0
    var b = init.b
    val rng = new scala.util.Random(seed)
    var t = 2 // start at 2 so eta*lambda < 1
    (1 to epochs).foreach { _ =>
      rng.shuffle(data.indices.toVector).foreach { di =>
        val (f, y) = data(di)
        val eta = 1.0 / (lambda * t)
        var s = b
        var i = 0
        while (i < f.idx.length) { s += scale * v(f.idx(i)) * f.value(i); i += 1 }
        scale *= (1.0 - eta * lambda)
        if (scale < 1e-9) { // renormalize to keep v in range
          i = 0
          while (i < v.length) { v(i) *= scale; i += 1 }
          scale = 1.0
        }
        if (y * s < 1.0) {
          i = 0
          while (i < f.idx.length) { v(f.idx(i)) += eta * y * f.value(i) / scale; i += 1 }
          b += eta * y * 0.01
        }
        t += 1
      }
    }
    LinearModel(v.map(_ * scale), b)
  }
}
