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
  * previous token). Edges carry deterministic LABELS from [[depLabels]]
  * (POS-pair + position rules), standing in for spaCy's labeled parse in
  * chain features, PD edge n-grams and `neg`-dependency negation. All
  * path properties of the reference's test suite
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

  /** Auxiliary / modal verb forms — attach to a verbal head as "aux"
    * rather than "conj".
    */
  private val auxLexicon = Set(
    "am", "is", "are", "was", "were", "be", "been",
    "has", "have", "had", "do", "does", "did",
    "will", "would", "can", "could", "shall", "should", "may", "might",
    "must", "ought")

  /** Deterministic dependency LABEL of each token's edge to its head —
    * the hermetic stand-in for spaCy's labeled parse (nalaf reads
    * `token.features['dep']` in chain features `entityhead.py:264-281`,
    * PD edge n-grams `new/dependency.py:96-127` and neg-counting
    * `data.py:1104-1118`). Rules are POS-pair + relative-position only
    * (no external model): negation tokens are "neg" wherever they
    * attach; punctuation "punct"; determiners "det"; adpositions "prep";
    * numbers "nummod"; auxiliaries "aux" and other verbs "conj" under a
    * verbal head; a noun before its verbal head is "nsubj", after it
    * "dobj" (the subject/object heuristic of projective English order);
    * noun-under-noun "compound", noun-under-adposition "pobj"; anything
    * else "dep". The root's self-edge is labeled "root" (never emitted
    * as an edge feature). A fixed small label vocabulary keeps hashed
    * feature space stable across corpora.
    */
  def depLabels(toks: IndexedSeq[Tok], heads: Array[Int]): Array[String] = {
    val pos = toks.map(t => coarsePos(t.word))
    Array.tabulate(toks.length) { i =>
      val w = toks(i).word.toLowerCase
      if (heads(i) == i) "root"
      else if (negWords.contains(w)) "neg"
      else {
        val hp = pos(heads(i))
        pos(i) match {
          case "PUNCT" => "punct"
          case "DET" => "det"
          case "ADP" => "prep"
          case "NUM" => "nummod"
          case "VERB" => if (auxLexicon.contains(w)) "aux" else "conj"
          case "NOUN" =>
            if (hp == "VERB") { if (i < heads(i)) "nsubj" else "dobj" }
            else if (hp == "NOUN") "compound"
            else if (hp == "ADP") "pobj"
            else "dep"
          case _ => "dep"
        }
      }
    }
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

  /** Negation parity over an arbitrary token subsequence (used for path
    * middles, where no contiguous parse exists): negated iff the count of
    * negation tokens is odd. For a full parsed sentence, prefer
    * [[isNegatedLabeled]], which counts `neg`-LABELED dependencies
    * exactly like `Part.is_sentence_negated` (`data.py:1106-1118`) — the
    * two agree whenever no negation token is the sentence root, since
    * [[depLabels]] labels every non-root negation token "neg".
    */
  def isNegated(toks: IndexedSeq[Tok]): Boolean =
    toks.count(t => negWords.contains(t.word.toLowerCase)) % 2 == 1

  /** `Part.is_sentence_negated` (`data.py:1106-1118`): odd number of
    * dependencies labeled `neg`.
    */
  def isNegatedLabeled(labels: Array[String]): Boolean = {
    var n = 0
    var i = 0
    while (i < labels.length) { if (labels(i) == "neg") n += 1; i += 1 }
    n % 2 == 1
  }

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
