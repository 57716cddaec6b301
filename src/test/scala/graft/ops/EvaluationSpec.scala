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

  test("mentionPrfReport: one declarative row == counts + compute() on every strictness") {
    val row = Evaluation.mentionPrfReport(gold, pred).collect().head
    val c = Evaluation.mentionCounts(gold, pred)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((c.tp, c.fp, c.fn, c.fpOv, c.fnOv)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val strict = Seq("exact" -> 5, "overlapping" -> 8, "half_overlapping" -> 11)
    strict.foreach { case (s, i) =>
      val prf = Evaluation.compute(c, s)
      assert(row.getDouble(i) == r6(prf.precision), s"$s precision")
      assert(row.getDouble(i + 1) == r6(prf.recall), s"$s recall")
      assert(row.getDouble(i + 2) == r6(prf.fMeasure), s"$s f1")
    }
  }

  // gold: A(0,"aaaa",sub 9)  B(10,"bbbb",null)  C(20,"cc dd",8)
  //       D(30,"dddd",1)     E(33,"eeee",2)     F(50,"ffff",3)
  private def subGold = {
    import spark.implicits._
    Seq(
      ("doc_1", "e_x", 0, "aaaa", "9"),
      ("doc_1", "e_x", 10, "bbbb", null),
      ("doc_1", "e_x", 20, "cc dd", "8"),
      ("doc_1", "e_x", 30, "dddd", "1"),
      ("doc_1", "e_x", 33, "eeee", "2"),
      ("doc_1", "e_x", 50, "ffff", "3")
    ).toDF("conv_id", "class_id", "begin", "text", "subclass")
  }

  // pred: A'(0,"aaaa",7) exact-matches A -> tp under ITS OWN label 7
  //       P2(21,"c",null) overlaps C only -> fp+fp_ov RE-ATTRIBUTED to 8
  //       P3(40,"zzzz",5) no match -> fp under 5
  //       P4(32,"ddd",null) overlaps D AND E -> last-in-order gold (E)
  //         wins the re-attribution (the reference's mutation loop)
  //       P5(51,"ff",6) overlaps F(3) -> its counts re-attribute to 3,
  //         and its ORIGINAL label 6 must still appear as a zero-count
  //         row (the reference's label universe is pre-mutation, :426-434)
  private def subPred = {
    import spark.implicits._
    Seq(
      ("doc_1", "e_x", 0, "aaaa", "7"),
      ("doc_1", "e_x", 21, "c", null),
      ("doc_1", "e_x", 40, "zzzz", "5"),
      ("doc_1", "e_x", 32, "ddd", null),
      ("doc_1", "e_x", 51, "ff", "6")
    ).toDF("conv_id", "class_id", "begin", "text", "subclass")
  }

  test("subclass breakdown: labelize + overlap re-attribution (evaluators.py:413-489)") {
    import spark.implicits._
    val gold = subGold
    val pred = subPred
    val got = Evaluation.mentionCountsBySubclassByDoc(gold, pred)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got("7") == ((1L, 0L, 0L, 0L, 0L)))
    assert(got("8") == ((0L, 1L, 1L, 1L, 1L)))
    assert(got("5") == ((0L, 1L, 0L, 0L, 0L)))
    assert(got("e_x") == ((0L, 0L, 1L, 0L, 0L))) // B: null subclass -> class label
    assert(got("1") == ((0L, 0L, 1L, 0L, 1L))) // D: swallowed by P4, overlap
    assert(got("2") == ((0L, 1L, 1L, 1L, 1L))) // E: P4 re-attributed here
    // gold A's own label exists as an all-zero row (A was claimed as tp
    // under the pred's label): the reference also materializes zero-count
    // evaluations for every label present (dict.fromkeys, :434)
    assert(got("9") == ((0L, 0L, 0L, 0L, 0L)))
    assert(got("3") == ((0L, 1L, 1L, 1L, 1L))) // F swallowed P5's counts
    assert(got("6") == ((0L, 0L, 0L, 0L, 0L))) // P5's own label: zero row
    assert(got.size == 9)
    // per-label counts decompose the TOTAL row exactly
    val total = Evaluation.mentionCounts(gold.drop("subclass"), pred.drop("subclass"))
    assert(got.values.map(_._1).sum == total.tp)
    assert(got.values.map(_._2).sum == total.fp)
    assert(got.values.map(_._3).sum == total.fn)
    assert(got.values.map(_._4).sum == total.fpOv)
    assert(got.values.map(_._5).sum == total.fnOv)
  }

  test("mentionPrfBySubclass: per-label counts + strictness algebra composition") {
    val byLabel = Evaluation.mentionPrfBySubclass(subGold, subPred, "overlapping")
    // label "8": tp=0 fp=1 fn=1 fp_ov=1 fn_ov=1 → overlapping tp'=2,
    // fp'=0, fn'=0 → P=R=F=1.0
    val (c8, prf8) = byLabel("8")
    assert(c8 == Evaluation.Counts(0, 1, 1, 1, 1))
    assert(prf8 == Evaluation.PRF(1.0, 1.0, 1.0))
    val (c5, prf5) = byLabel("5") // unmatched fp only → P=0
    assert(c5.fp == 1 && prf5.precision == 0.0)
    assert(byLabel.keySet.size == 9)
  }

  test("subclass breakdown: span duplicated with conflicting subclasses counts once") {
    import spark.implicits._
    // one physical gold span arriving twice with different subclass values
    // must contribute ONE count (min label wins deterministically), so the
    // breakdown still decomposes the label-free TOTAL for such input
    val gold = Seq(("d1", "e_x", 0, "aaaa", "2"), ("d1", "e_x", 0, "aaaa", "1"))
      .toDF("conv_id", "class_id", "begin", "text", "subclass")
    val pred = Seq(("d1", "e_x", 0, "aaaa", null: String))
      .toDF("conv_id", "class_id", "begin", "text", "subclass")
    val got = Evaluation.mentionCountsBySubclassByDoc(gold, pred)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    // exact match: one tp under the pred's label, gold row "1" all-zero
    assert(got("e_x") == ((1L, 0L, 0L, 0L, 0L)))
    assert(got("1") == ((0L, 0L, 0L, 0L, 0L)))
    assert(!got.contains("2")) // the conflicting duplicate is dropped
    val total = Evaluation.mentionCounts(gold.drop("subclass"), pred.drop("subclass"))
    assert(got.values.map(_._1).sum == total.tp)
    assert(got.values.map(_._2).sum == total.fp)
    assert(got.values.map(_._3).sum == total.fn)
  }

  test("subclass breakdown: BooleanType subclass follows str(False)/str(True) labelize") {
    import spark.implicits._
    // the reference's clean_subclasses convention stores subclass=False;
    // Spark casts false to "false" (not Python's "False") — the
    // operator must still fall back to class_id for false, and label
    // "True" (capitalized, = str(True)) for true
    val gold = Seq(("d1", "e_x", 0, "aaaa", false))
      .toDF("conv_id", "class_id", "begin", "text", "subclass")
    val pred = Seq(("d1", "e_x", 0, "aaaa", true), ("d1", "e_x", 9, "zz", false))
      .toDF("conv_id", "class_id", "begin", "text", "subclass")
    val got = Evaluation.mentionCountsBySubclassByDoc(gold, pred)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got("True") == ((1L, 0L, 0L, 0L, 0L)))
    assert(got("e_x") == ((0L, 1L, 0L, 0L, 0L)))
    assert(got.size == 2)
  }

  test("deleteSubclassAnnotations: drops listed subclasses, keeps null and unlisted") {
    import spark.implicits._
    val m = Seq(
      ("c1", "e_x", 0, "a", "9"), ("c1", "e_x", 5, "b", "0"),
      ("c1", "e_x", 9, "c", null)
    ).toDF("conv_id", "class_id", "begin", "text", "subclass")
    val kept = DatasetOps.deleteSubclassAnnotations(m, Set("9"))
      .select("text").as[String].collect().toSet
    assert(kept == Set("b", "c"))
    // subclass "0" is a real subclass, not a missing one
    val kept0 = DatasetOps.deleteSubclassAnnotations(m, Set("0"))
      .select("text").as[String].collect().toSet
    assert(kept0 == Set("a", "c"))
    // no subclass column: no-op
    assert(DatasetOps.deleteSubclassAnnotations(
      m.drop("subclass"), Set("9")).count() == 3)
  }

  // ---- EntityEvaluator UNKNOWN-penalization modes (evaluators.py:635-673)

  /** Fixture: A matches by norm; B/B' share span+text but have NO norm;
    * C is gold-only (norm N3); D is pred-only (norm N4).
    */
  private def entityFixture = {
    import spark.implicits._
    val gold = Seq(
      ("d1", E1, 0L, 5L, "alpha", Some("N1")),
      ("d1", E1, 10L, 15L, "beta5", None),
      ("d1", E1, 20L, 25L, "gamma", Some("N3"))
    ).toDF("conv_id", "class_id", "begin", "end", "text", "norm")
    val pred = Seq(
      ("d1", E1, 0L, 5L, "alpha", Some("N1")),
      ("d1", E1, 10L, 15L, "beta5", None),
      ("d1", E1, 30L, 35L, "delta", Some("N4"))
    ).toDF("conv_id", "class_id", "begin", "end", "text", "norm")
    (gold, pred)
  }

  test("entity eval 'no': unknown norms dropped from both sides") {
    val (g, p) = entityFixture
    assert(Evaluation.entityCounts(g, p, "no") == Evaluation.Counts(1, 1, 1, 0, 0))
  }

  test("entity eval 'soft': unknowns match on lowercased text") {
    val (g, p) = entityFixture
    assert(Evaluation.entityCounts(g, p, "soft") == Evaluation.Counts(2, 1, 1, 0, 0))
  }

  test("entity eval 'hard': unknowns never match; gold unknown passed, pred unknown fp") {
    val (g, p) = entityFixture
    assert(Evaluation.entityCounts(g, p, "hard") == Evaluation.Counts(1, 2, 1, 0, 0))
  }

  test("entity eval 'softest'/'agnostic': span-equal unknowns match") {
    val (g, p) = entityFixture
    assert(Evaluation.entityCounts(g, p, "softest") == Evaluation.Counts(2, 1, 1, 0, 0))
    assert(Evaluation.entityCounts(g, p, "agnostic") == Evaluation.Counts(2, 1, 1, 0, 0))
  }

  test("entity eval accept=exact ignores norms; overlapping accepts intersecting spans") {
    import spark.implicits._
    val (g, p) = entityFixture
    // exact: B matches B' by span even under 'hard'
    assert(Evaluation.entityCounts(g, p, "hard", accept = "exact") ==
      Evaluation.Counts(2, 1, 1, 0, 0))
    // overlapping: a pred at [21,27) accepts gold C at [20,25)
    val p2 = p.unionByName(Seq(("d1", E1, 21L, 27L, "gamma x", Some("N9")))
      .toDF("conv_id", "class_id", "begin", "end", "text", "norm"))
    assert(Evaluation.entityCounts(g, p2, "hard", accept = "overlapping") ==
      Evaluation.Counts(3, 1, 0, 0, 0))
  }
}
