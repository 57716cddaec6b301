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
          // an adposition binding a directly FOLLOWING verb is the
          // infinitival/complementizer particle ("to <verb>") — aux
          case "ADP" => if (heads(i) == i + 1 && hp == "VERB") "aux" else "prep"
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

  /** head(i) for every token; root points to itself.
    *
    * Projective rule grammar over the coarse POS sequence (r4 — replaces
    * the r3 "nearest preceding verb" flat attachment, which measured
    * 21.1% head agreement on the reference's own 18 parser-test
    * sentences; see DepGraphAgreementSpec for the measured numbers):
    *
    *  - root = first non-auxiliary verb (else first verb; else the head
    *    of the first noun run — verbless titles root on their NP head);
    *  - noun runs (maximal contiguous NOUN/NUM spans) are RIGHT-headed:
    *    every non-final token attaches to the run-final token (English
    *    compound/modifier order);
    *  - a run-final noun is the object of a directly preceding
    *    adposition (pobj, determiners skipped), else an argument of the
    *    nearest preceding verb, else the subject of the next verb;
    *  - determiners attach to the following noun run's head;
    *  - adpositions bind a directly following verb ("to <verb>" — aux),
    *    else the noun phrase they follow, else the nearest preceding
    *    verb;
    *  - auxiliaries with a verb within the next two tokens attach to it
    *    (auxpass chains); other verbs to the nearest preceding verb;
    *  - hyphens bind the following token, other punctuation the root.
    */
  def heads(toks: IndexedSeq[Tok]): Array[Int] = {
    val n = toks.length
    if (n == 0) return Array.empty
    val pos = toks.map(t => coarsePos(t.word))
    val lower = toks.map(_.word.toLowerCase)
    def nominal(p: String) = p == "NOUN" || p == "NUM"
    def isAux(i: Int) = auxLexicon.contains(lower(i))
    // run-final / run-start index per nominal token
    val runEnd = Array.tabulate(n)(identity)
    var i = n - 2
    while (i >= 0) {
      if (nominal(pos(i)) && nominal(pos(i + 1))) runEnd(i) = runEnd(i + 1)
      i -= 1
    }
    val runStart = Array.tabulate(n)(identity)
    i = 1
    while (i < n) {
      if (nominal(pos(i)) && nominal(pos(i - 1))) runStart(i) = runStart(i - 1)
      i += 1
    }
    val root = pos.indices.find(j => pos(j) == "VERB" && !isAux(j))
      .orElse(pos.indices.find(j => pos(j) == "VERB"))
      .getOrElse {
        val firstNoun = pos.indexWhere(nominal)
        if (firstNoun >= 0) runEnd(firstNoun) else 0
      }
    def prevVerb(j0: Int): Int = {
      var j = j0 - 1
      while (j >= 0 && pos(j) != "VERB") j -= 1
      j
    }
    def nextVerb(j0: Int): Int = {
      var j = j0 + 1
      while (j < n && pos(j) != "VERB") j += 1
      if (j < n) j else -1
    }
    Array.tabulate(n) { k =>
      if (k == root) root
      else pos(k) match {
        case "PUNCT" =>
          if (lower(k) == "-" && k + 1 < n) k + 1 else root
        case "VERB" =>
          val nv = nextVerb(k)
          if (isAux(k) && nv >= 0 && nv - k <= 2) nv
          else {
            // nearest preceding verb that is NOT itself a forward-binding
            // auxiliary: those chain INTO this verb ("may have been
            // taken"), and attaching back to one would close a verb cycle
            // disconnected from the root (tree-ness is what the path
            // property tests pin)
            var j = k - 1
            var found = -1
            while (j >= 0 && found < 0) {
              if (pos(j) == "VERB") {
                val jn = nextVerb(j)
                if (!(isAux(j) && jn >= 0 && jn - j <= 2)) found = j
              }
              j -= 1
            }
            if (found >= 0) found else root
          }
        case "DET" =>
          if (k + 1 < n && nominal(pos(k + 1))) runEnd(k + 1)
          else { val p = prevVerb(k); if (p >= 0) p else root }
        case "ADP" =>
          if (k + 1 < n && pos(k + 1) == "VERB") k + 1
          else if (k > 0 && nominal(pos(k - 1))) k - 1
          else { val p = prevVerb(k); if (p >= 0) p else root }
        case _ => // NOUN / NUM
          if (runEnd(k) != k) runEnd(k)
          else {
            var j = runStart(k) - 1
            while (j >= 0 && pos(j) == "DET") j -= 1
            if (j >= 0 && pos(j) == "ADP") j
            else {
              val p = prevVerb(k)
              if (p >= 0) p
              else { val nv = nextVerb(k); if (nv >= 0) nv else root }
            }
          }
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
