package graft.nlp

import graft.model.Tok

/** Gold span used for labeling: [begin, begin+text.length) in turn text
  * (nalaf Entity `data.py:1817-1830`).
  */
final case class Span(classId: String, begin: Int, text: String) {
  def end: Int = begin + text.length
}

/** Token labelers (`nalaf/preprocessing/labelers.py`) re-expressed as pure
  * functions over one part's sentences of tokens. Each returns one label
  * per token, sentence by sentence, preserving the reference's exact
  * first-matching-annotation and state-machine semantics.
  */
object Labeling {

  /** BIO labeler (`labelers.py:32-62`): first annotation whose start equals
    * the token start → B-class; first whose span strictly contains the
    * token start → I-class; else O.
    */
  def bio(sentences: Seq[Seq[Tok]], anns: Seq[Span]): Vector[Vector[String]] =
    sentences.iterator.map { sent =>
      sent.iterator.map { t =>
        anns.collectFirst {
          case a if a.begin == t.begin           => s"B-${a.classId}"
          case a if a.begin < t.begin && t.begin < a.end => s"I-${a.classId}"
        }.getOrElse("O")
      }.toVector
    }.toVector

  /** BIEO labeler (`labelers.py:175-209`): per annotation, checked in
    * order — start==token.start → B; start < t.start && t.end < end → I;
    * t.end == end → E; first match wins (the reference `break`s).
    */
  def bieo(sentences: Seq[Seq[Tok]], anns: Seq[Span]): Vector[Vector[String]] =
    sentences.iterator.map { sent =>
      sent.iterator.map { t =>
        anns.collectFirst {
          case a if a.begin == t.begin                                   => s"B-${a.classId}"
          case a if a.begin < t.begin && t.begin < t.end && t.end < a.end => s"I-${a.classId}"
          case a if t.end == a.end                                       => s"E-${a.classId}"
        }.getOrElse("O")
      }.toVector
    }.toVector

  /** IO labeler (`labelers.py:212-237`): token fully inside annotation →
    * I-class (note: the reference does NOT break, so the *last* matching
    * annotation wins — preserved here).
    */
  def io(sentences: Seq[Seq[Tok]], anns: Seq[Span]): Vector[Vector[String]] =
    sentences.iterator.map { sent =>
      sent.iterator.map { t =>
        anns.foldLeft("O") { (acc, a) =>
          if (a.begin <= t.begin && t.begin < t.end && t.end <= a.end)
            s"I-${a.classId}"
          else acc
        }
      }.toVector
    }.toVector

  // --- TmVar labeler (`labelers.py:65-172`) -----------------------------

  private val refSeqRe = "(^[cgrmp]$)|(^(ivs|ex|orf)$)".r
  private val typeRe = "(del|ins|dup|tri|qua|con|delins|indel)".r
  private val frameshiftRe = "^(fs|fsX|fsx)$".r
  private val snipRe = "^(rs|RS|Rs)$".r
  private val dnaRe = "^[ATCGUatcgu]+$".r
  private val proteinRe =
    ("(glutamine|glutamic|leucine|valine|isoleucine|lysine|alanine|glycine|" +
      "aspartate|methionine|threonine|histidine|aspartic|asparticacid|arginine|" +
      "asparagine|tryptophan|proline|phenylalanine|cysteine|serine|glutamate|" +
      "tyrosine|stop|frameshift)|(^(cys|ile|ser|gln|met|asn|pro|lys|asp|thr|phe|" +
      "ala|gly|his|leu|arg|trp|val|glu|tyr|fs|fsx)$)|(^[cisqmnpkdtfaghlrwveyx]$)").r

  /** TmVar 10-label scheme with the reference's exact stateful W/M
    * alternation (reset per sentence and at each annotation end), the
    * cross-sentence `previous_token` carry, and the per-sentence
    * `P I P → P P P` sliding-window smoothing (`labelers.py:112-172`).
    * `mutClassId` gates which annotations are labeled.
    */
  def tmvar(sentences: Seq[Seq[Tok]], anns: Seq[Span], mutClassId: String): Vector[Vector[String]] = {
    var prevLabel: Option[String] = None // label of the previous *labeled* token
    sentences.iterator.map { sent =>
      var alternate = "W"
      val labels = Array.fill(sent.length)("O")
      sent.zipWithIndex.foreach { case (t, i) =>
        anns.find(a => a.classId == mutClassId &&
            (a.begin == t.begin || (a.begin < t.begin && t.begin < a.end)))
          .foreach { a =>
            {
              val w = t.word
              val lower = w.toLowerCase
              var label =
                if (refSeqRe.findFirstIn(w).isDefined) "A"
                else if (typeRe.findFirstIn(w).isDefined) "T"
                else if (frameshiftRe.findFirstIn(w).isDefined) "F"
                else if (prevLabel.contains("F") && w == "X") "F"
                else if (snipRe.findFirstIn(w).isDefined) "R"
                else if (dnaRe.findFirstIn(w).isDefined || proteinRe.findFirstIn(lower).isDefined) "*"
                else if (w.forall(_.isDigit) && w.nonEmpty) {
                  if (prevLabel.contains("F")) "S" else "P"
                } else "I"
              if (label == "*") {
                label = alternate
                alternate = if (alternate == "M") "W" else "M"
              }
              labels(i) = label
              prevLabel = Some(label)
              if (t.end == a.end) alternate = "W"
            }
          }
      }
      // P I P → P P P smoothing (`labelers.py:167-172`)
      var i = 1
      while (i + 1 < labels.length) {
        if (labels(i - 1) == "P" && labels(i + 1) == "P" && labels(i) == "I")
          labels(i) = "P"
        i += 1
      }
      labels.toVector
    }.toVector
  }

  /** Decoded mention: [begin, end) char span with aggregated-marginals
    * confidence (`utils/qmath.py:9-31`; arithmetic mean by default).
    */
  final case class Decoded(begin: Int, end: Int, confidence: Double)

  /** `utils/qmath.py:9-19` (raises IndexError on empty — mirrored). */
  def arithmeticMean(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "no element in array")
    xs.sum / xs.length
  }

  /** `utils/qmath.py:21-31` — the reference's alternative confidence
    * aggregator for decoded runs (downweights runs with one weak token).
    * Empty input raises (IndexError in the reference). Documented
    * deviation: an exactly-0.0 element yields 0.0 here (IEEE 1/0 =
    * Infinity), where Python raises ZeroDivisionError — the silent
    * value is the conservative "no confidence" direction.
    */
  def harmonicMean(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "no element in array")
    xs.length / xs.map(1.0 / _).sum
  }

  /** Stable function value of [[arithmeticMean]] — decode's default;
    * recognized by reference equality for the scalar fast path.
    */
  val ArithmeticMean: Seq[Double] => Double = arithmeticMean

  private val RunStops = Set("O", "B", "A")

  /** Gaps-and-islands decode of predicted label runs into mention spans —
    * exact port of `Dataset.form_predicted_annotations`
    * (`data.py:236-273`): a run starts at any non-'O' label and extends
    * while the next label is not one of the literal values 'O', 'B', 'A'.
    * `aggregator` is the reference's pluggable `aggregator_function`
    * (`data.py:236`) over the run's token marginals. The default
    * arithmetic mean keeps the zero-allocation scalar fast path — decode
    * sits in the fused pipeline's allocation-bound hot loop; only a
    * custom aggregator pays for materializing the run's confidences.
    */
  def decode(sent: Seq[Tok], labels: Seq[String], confidences: Seq[Double],
             aggregator: Seq[Double] => Double = ArithmeticMean): Vector[Decoded] = {
    val fastMean = aggregator eq ArithmeticMean
    val out = Vector.newBuilder[Decoded]
    var index = 0
    val n = sent.length
    while (index < n) {
      if (labels(index) != "O") {
        val start = sent(index).begin
        var confSum = confidences(index)
        var confN = 1
        var confs: scala.collection.mutable.Builder[Double, Vector[Double]] = null
        if (!fastMean) { confs = Vector.newBuilder[Double]; confs += confidences(index) }
        var j = index
        while (j + 1 < n && !RunStops.contains(labels(j + 1))) {
          j += 1
          if (fastMean) { confSum += confidences(j); confN += 1 }
          else confs += confidences(j)
        }
        val conf = if (fastMean) confSum / confN else aggregator(confs.result())
        out += Decoded(start, sent(j).end, conf)
        index = j
      }
      index += 1
    }
    out.result()
  }
}
