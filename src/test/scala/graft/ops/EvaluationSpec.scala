package graft.ops

import graft.SparkSpec

/** Port of tests/learning/test_evaluators.py: the 8-gold/7-predicted
  * mention fixture with golden P/R/F under all three strictnesses.
  */
class EvaluationSpec extends SparkSpec {

  private val E1 = "e_x_1"

  // (conv_id, class_id, begin, text) — test_evaluators.py:27-58
  private def gold = {
    import spark.implicits._
    Seq(
      ("doc_1", E1, 5, "aaaa"), // exact_1
      ("doc_1", E1, 55, "ffff"), // exact_2
      ("doc_1", E1, 75, "hhhh"), // exact_3
      ("doc_1", E1, 25, "cccc"), // overlap_1_1
      ("doc_1", E1, 32, ".. ddd"), // overlap_2_1
      ("doc_1", E1, 65, "gggg"), // overlap_3_1
      ("doc_1", "e2", 45, "eeee"), // missing_1
      ("doc_1", "e2", 84, "jjjj") // missing_2
    ).toDF("conv_id", "class_id", "begin", "text")
  }

  private def pred = {
    import spark.implicits._
    Seq(
      ("doc_1", E1, 5, "aaaa"),
      ("doc_1", E1, 55, "ffff"),
      ("doc_1", E1, 75, "hhhh"),
      ("doc_1", E1, 26, "cc"), // overlap_1_2
      ("doc_1", E1, 36, "ddd ..."), // overlap_2_2
      ("doc_1", E1, 62, ".. gggg .."), // overlap_3_2
      ("doc_1", "e2", 15, "bbbb") // spurious
    ).toDF("conv_id", "class_id", "begin", "text")
  }

  test("mention counts: tp=3 fp=4 fn=5 fp_ov=3 fn_ov=3") {
    val c = Evaluation.mentionCounts(gold, pred)
    assert(c == Evaluation.Counts(3, 4, 5, 3, 3))
  }

  test("exact strictness: P=3/7 R=3/8") {
    val r = Evaluation.compute(Evaluation.mentionCounts(gold, pred), "exact")
    assert(r.precision == 3.0 / 7)
    assert(r.recall == 3.0 / 8)
    assert(r.fMeasure == 2 * (3.0 / 7 * 3.0 / 8) / (3.0 / 7 + 3.0 / 8))
  }

  test("overlapping strictness: P=9/10 R=9/11") {
    val r = Evaluation.compute(Evaluation.mentionCounts(gold, pred), "overlapping")
    assert(r.precision == 9.0 / 10)
    assert(r.recall == 9.0 / 11)
  }

  test("half_overlapping strictness: P=6/10 R=6/11") {
    val r = Evaluation.compute(Evaluation.mentionCounts(gold, pred), "half_overlapping")
    assert(r.precision == (3 + 6 / 2.0) / 10)
    assert(r.recall == (3 + 6 / 2.0) / 11)
  }
}
