package graft.ops

import graft.model._
import graft.nlp.{DepGraph, Porter, TextOps}

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
  * The *feature definitions* mirror the reference's defaults:
  * SentenceFeatureGenerator counts/order (`relations/new/sentence.py`),
  * LD linear-context and PD dependency-path n-grams
  * (`relations/new/dependency.py:20-221`), entity-head surface features
  * (`relations/entityhead.py`), linear distance (`relations/context.py`).
  */
object RelationScoring {

  val Dims = 1 << 18

  final case class Feats(idx: Array[Int], value: Array[Double])

  private def h(s: String): Int = {
    val x = graft.nlp.Hashes.fnv1a64(s)
    ((x % Dims) + Dims).toInt % Dims
  }

  /** Sentence-local candidate: tokens of the (possibly combined) sentence,
    * token index of each entity head, char spans of the two mentions.
    * Map form — used by TRAINING (needs materialized vectors) and tests.
    */
  def features(
      toks: IndexedSeq[Tok],
      adj: Array[List[Int]],
      depth: Array[Int],
      m1: Mention, m2: Mention,
      sameSentence: Boolean, sentDist: Int): Map[String, Double] = {
    val out = scala.collection.mutable.HashMap.empty[String, Double]
    enumerate(new SentencePrep(toks, adj, depth), m1, m2, sameSentence, sentDist) { (f, v) =>
      out.update(f, out.getOrElse(f, 0.0) + v)
    }
    out.toMap
  }

  /** Zero-materialization scoring: identical feature enumeration, each
    * (name, value) folded straight into w·x — no map, no vector, no
    * sort. This is the inference hot path (GC-bound at 32 threads
    * otherwise).
    */
  def scoreEdge(model: LinearModel,
      toks: IndexedSeq[Tok], adj: Array[List[Int]], depth: Array[Int],
      m1: Mention, m2: Mention,
      sameSentence: Boolean, sentDist: Int): Double =
    scoreEdge(model, new SentencePrep(toks, adj, depth), m1, m2, sameSentence, sentDist)

  def scoreEdge(model: LinearModel, prep: SentencePrep,
      m1: Mention, m2: Mention,
      sameSentence: Boolean, sentDist: Int): Double = {
    var s = model.b
    enumerate(prep, m1, m2, sameSentence, sentDist) { (f, v) =>
      s += model.w(h(f)) * v
    }
    s
  }

  /** Per-sentence memoized tables shared across all candidate pairs of
    * the sentence — the relational analogue of the reference's
    * per-sentence graph cache (`utils/graph.py:29-46`). With dense
    * mentions (k per class) a sentence yields O(k²) pairs; without this
    * cache POS/stem/mask/head work is recomputed per pair.
    */
  final class SentencePrep(val toks: IndexedSeq[Tok], val adj: Array[List[Int]],
                           val depth: Array[Int]) {
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
    lazy val negated: Boolean = DepGraph.isNegated(toks)
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
  }

  /** Single source of truth for the edge feature set; both the training
    * (Map) and inference (fold) paths stream through here, so hashed
    * indices agree by construction.
    */
  private def enumerate(
      prep: SentencePrep,
      m1: Mention, m2: Mention,
      sameSentence: Boolean, sentDist: Int)(add0: (String, Double) => Unit): Unit = {

    val toks = prep.toks
    def add(f: String, v: Double = 1.0): Unit = add0(f, v)

    val h1 = prep.head(m1.begin, m1.end)
    val h2 = prep.head(m2.begin, m2.end)

    def masked(i: Int): String = {
      val t = toks(i)
      if (t.begin >= m1.begin && t.end <= m1.end) m1.class_id
      else if (t.begin >= m2.begin && t.end <= m2.end) m2.class_id
      else prep.maskedBase(i)
    }

    // --- SentenceFeatureGenerator subset (`relations/new/sentence.py`) ---
    add(s"order=${m1.class_id}_${m2.class_id}")
    add(if (sameSentence) "same_sent" else s"sent_dist=$sentDist")
    val between = if (h1 >= 0 && h2 >= 0) {
      val lo = math.min(h1, h2); val hi = math.max(h1, h2)
      (lo + 1 until hi)
    } else 0 until 0
    add("n_between", between.size.toDouble)
    between.foreach { i => add(s"bow_bet=${masked(i)}") }

    // sentence negation + main-verb lemmas (`relations/new/sentence.py`
    // counts/negation block; semantics via DepGraph.isNegated/mainVerbs)
    if (prep.negated) add("sent_negated")
    prep.mainVerbStems.foreach { v => add(s"main_verb=$v") }

    // --- LinearDistanceFeatureGenerator (`relations/context.py:5-43`) ---
    if (h1 >= 0 && h2 >= 0) {
      val d = math.abs(h1 - h2)
      add("tok_dist", d.toDouble)
      if (d > 5) add("tok_dist_gt5")
    }

    // --- Entity-head surface (`relations/entityhead.py`) ----------------
    // stem/POS + case/digit/punct flags and char 2/3-grams
    // (`entityhead.py:96-187`)
    def headSurface(prefix: String, hi: Int): Unit = if (hi >= 0) {
      val w = toks(hi).word
      add(s"${prefix}_stem=${prep.stem(hi)}")
      add(s"${prefix}_pos=${prep.pos(hi)}")
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

    // --- PD dependency-path features (`relations/new/dependency.py`) ----
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
        // path n-grams n=1..3 of masked lemmas (`dependency.py:163-221`)
        val lemmas = path.map(masked)
        (1 to 3).foreach { n =>
          lemmas.sliding(n).foreach { gram =>
            if (gram.length == n) add(s"pd_${n}gram=${gram.mkString("~")}")
          }
        }
      } else add("pd_unreachable")
    }
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
            seed: Long = 2727L): LinearModel = {
    // w kept as scale*v so the per-step L2 shrink is O(1), updates O(nnz)
    val v = new Array[Double](Dims)
    var scale = 1.0
    var b = 0.0
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
