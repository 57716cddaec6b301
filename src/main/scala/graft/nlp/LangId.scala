package graft.nlp

/** Deterministic language identification by stopword/character heuristics —
  * the "language-ID (n-gram heuristic)" operator of the training-data
  * pipeline. Entirely self-contained profiles; no external models.
  */
object LangId {

  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "with", "his", "this", "not", "are", "you"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "von", "für", "auf", "sich", "dass", "ich", "zu"),
    "fr" -> Set("le", "la", "les", "et", "est", "une", "des", "dans", "que",
      "pour", "pas", "vous", "avec", "sur", "ce", "je"),
    "es" -> Set("el", "la", "los", "las", "que", "de", "en", "un", "una",
      "es", "por", "con", "para", "no", "se", "su")
  )

  /** Returns the best language code, or "und" when nothing matches.
    * CJK detection first (script-based), then stopword voting with a
    * deterministic tie-break on language code.
    */
  def detect(text: String): String = {
    if (text.isEmpty) return "und"
    var cjk = 0
    var letters = 0
    text.foreach { c =>
      if (Character.isLetter(c)) {
        letters += 1
        val block = Character.UnicodeBlock.of(c)
        if (block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
            block == Character.UnicodeBlock.HIRAGANA ||
            block == Character.UnicodeBlock.KATAKANA ||
            block == Character.UnicodeBlock.HANGUL_SYLLABLES) cjk += 1
      }
    }
    if (letters > 0 && cjk * 2 >= letters) return "zh"
    val words = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (words.isEmpty) return "und"
    val scores = profiles.view.mapValues(sw => words.count(sw.contains)).toMap
    val (bestLang, bestScore) = scores.toSeq.sortBy { case (l, s) => (-s, l) }.head
    if (bestScore == 0) "und" else bestLang
  }

  private val stopwordsEn = Set("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "this", "with", "for", "as", "on", "at")

  /** Quality metrics for a document (training-data curation heuristics):
    * all integer-valued so they are bit-exact across engines.
    */
  final case class Quality(
      nChars: Long, nWords: Long, nDistinct: Long, maxWordLen: Long,
      stopwordCount: Long, punctCount: Long, digitCount: Long)

  def quality(text: String): Quality = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    Quality(
      nChars = text.length.toLong,
      nWords = words.length.toLong,
      nDistinct = words.map(_.toLowerCase).distinct.length.toLong,
      maxWordLen = if (words.isEmpty) 0L else words.map(_.length).max.toLong,
      stopwordCount = words.count(w => stopwordsEn.contains(w.toLowerCase)).toLong,
      punctCount = text.count(c => !Character.isLetterOrDigit(c) && !Character.isWhitespace(c)).toLong,
      digitCount = text.count(Character.isDigit).toLong
    )
  }
}
