package graft.nlp

import org.scalatest.funsuite.AnyFunSuite

/** Labeler goldens ported from tests/preprocessing/test_labelers.py — the
  * same fixture string, entity offsets and exact 26-label sequences.
  */
class LabelingSpec extends AnyFunSuite {

  private val text = "some text ... (c.2708_2711delTTAG, p.V903GfsX905) ... text"
  private val anns = Seq(
    Span("e_x", 15, "c.2708_2711delTTAG"),
    Span("e_x", 35, "p.V903GfsX905"))

  private def sentences = {
    val segs = TextOps.segment(text, "tmvar")
    segs.map(_._4)
  }

  test("fixture tokenizes into 26 tokens") {
    assert(sentences.map(_.size).sum == 26)
  }

  // test_labelers.py:20-24
  test("BIO labeler golden") {
    val got = Labeling.bio(sentences, anns).flatten
    val expected = Vector(
      "O", "O", "O", "O", "O", "O", "B-e_x", "I-e_x", "I-e_x", "I-e_x",
      "I-e_x", "I-e_x", "I-e_x", "O",
      "B-e_x", "I-e_x", "I-e_x", "I-e_x", "I-e_x", "I-e_x", "I-e_x",
      "O", "O", "O", "O", "O")
    assert(got == expected)
  }

  // test_labelers.py:26-31
  test("BIEO labeler golden") {
    val got = Labeling.bieo(sentences, anns).flatten
    val expected = Vector(
      "O", "O", "O", "O", "O", "O", "B-e_x", "I-e_x", "I-e_x", "I-e_x",
      "I-e_x", "I-e_x", "E-e_x", "O",
      "B-e_x", "I-e_x", "I-e_x", "I-e_x", "I-e_x", "I-e_x", "E-e_x",
      "O", "O", "O", "O", "O")
    assert(got == expected)
  }

  // test_labelers.py:33-39
  test("TmVar labeler golden") {
    val got = Labeling.tmvar(sentences, anns, "e_x").flatten
    val expected = Vector(
      "O", "O", "O", "O", "O", "O", "A", "I", "P", "P", "P", "T", "W", "O",
      "A", "I", "W", "P", "I", "M", "P", "O", "O", "O", "O", "O")
    assert(got == expected)
  }

  test("IO labeler: tokens fully inside get I-, others O") {
    val got = Labeling.io(sentences, anns).flatten
    assert(got.count(_ == "I-e_x") == 14)
    assert(got.count(_ == "O") == 12)
  }

  // data.py:236-273 semantics
  test("decode: contiguous non-O runs become mentions; conf = mean") {
    val toks = Vector(Tok0(0, 0, 2), Tok0(1, 3, 5), Tok0(2, 6, 8),
      Tok0(3, 9, 11), Tok0(4, 12, 14))
    def t(x: Tok0) = graft.model.Tok(x.tid, "xx", x.b, x.e)
    val sent = toks.map(t)
    // O X X O X → two mentions
    val d1 = Labeling.decode(sent, Seq("O", "T", "P", "O", "W"),
      Seq(0.0, 0.4, 0.6, 0.0, 1.0))
    assert(d1 == Vector(
      Labeling.Decoded(3, 8, 0.5), Labeling.Decoded(12, 14, 1.0)))
    // run ends BEFORE literal 'B' and 'A' labels; B-prefixed labels merge
    val d2 = Labeling.decode(sent, Seq("T", "B", "A", "B-x", "I-x"),
      Seq(1.0, 1.0, 1.0, 1.0, 1.0))
    assert(d2.map(m => (m.begin, m.end)) ==
      Vector((0, 2), (3, 5), (6, 14)))
  }

  test("decode: pluggable harmonic-mean aggregator (qmath.py:21-31)") {
    val toks = Vector(Tok0(0, 0, 2), Tok0(1, 3, 5))
    val sent = toks.map(x => graft.model.Tok(x.tid, "xx", x.b, x.e))
    val d = Labeling.decode(sent, Seq("T", "P"), Seq(0.5, 1.0),
      Labeling.harmonicMean)
    // harmonic(0.5, 1.0) = 2 / (2 + 1) = 2/3 < arithmetic 0.75
    assert(d == Vector(Labeling.Decoded(0, 5, 2.0 / 3.0)))
    assert(Labeling.harmonicMean(Seq(4.0, 4.0)) == 4.0)
    assert(Labeling.arithmeticMean(Seq(0.4, 0.6)) == 0.5)
  }

  private case class Tok0(tid: Int, b: Int, e: Int)

  test("decode → relabel round-trip on BIO output") {
    // label with BIO from known spans, decode with confidences=1 → same spans
    val spans = anns
    val labels = Labeling.bio(sentences, spans)
    val decoded = sentences.zip(labels).flatMap { case (sent, ls) =>
      Labeling.decode(sent, ls, Seq.fill(ls.size)(1.0))
    }
    assert(decoded.map(d => (d.begin, d.end)) ==
      spans.map(a => (a.begin, a.end)).toVector)
  }
}
