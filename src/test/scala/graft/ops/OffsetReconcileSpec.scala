package graft.ops

import graft.SparkSpec

/** Difflib-parity goldens for the diff core (opcodes generated with
  * CPython difflib.SequenceMatcher(autojunk=False) and pinned), the
  * reference's adjustment arithmetic (`gnormplus.py:19-22,60-66`), and
  * the distributed reconcile operator.
  */
class OffsetReconcileSpec extends SparkSpec {

  test("opcodes match CPython difflib goldens") {
    assert(OffsetReconcile.opcodes("merge the table now", "merge  the table now") ==
      Vector(("equal", 0, 5, 0, 5), ("insert", 5, 5, 5, 6), ("equal", 5, 19, 6, 20)))
    assert(OffsetReconcile.opcodes("alpha beta gamma", "alpha gamma") ==
      Vector(("equal", 0, 4, 0, 4), ("delete", 4, 9, 4, 4), ("equal", 9, 16, 4, 11)))
    assert(OffsetReconcile.opcodes("scan a stream", "scan the stream") ==
      Vector(("equal", 0, 5, 0, 5), ("replace", 5, 6, 5, 8), ("equal", 6, 13, 8, 15)))
    assert(OffsetReconcile.opcodes("abc", "abc") == Vector(("equal", 0, 3, 0, 3)))
    assert(OffsetReconcile.opcodes(
      "the filter runs on batch data", "the filter  runs on batch-data xx") ==
      Vector(("equal", 0, 10, 0, 10), ("insert", 10, 10, 10, 11),
        ("equal", 10, 24, 11, 25), ("replace", 24, 25, 25, 26),
        ("equal", 25, 29, 26, 30), ("insert", 29, 29, 30, 33)))
    assert(OffsetReconcile.opcodes("", "xyz") == Vector(("insert", 0, 0, 0, 3)))
    assert(OffsetReconcile.opcodes("xyz", "") == Vector(("delete", 0, 3, 0, 0)))
  }

  test("adjustments reproduce __find_offset_adjustments and remap begins") {
    assert(OffsetReconcile.adjustments(
      "merge the table now", "merge  the table now") == Vector((5, 1)))
    assert(OffsetReconcile.adjustments("alpha beta gamma", "alpha gamma") == Vector())
    assert(OffsetReconcile.adjustments(
      "the filter runs on batch data", "the filter  runs on batch-data xx") ==
      Vector((10, 1), (24, 0), (29, 3)))
    // external text "merge  the table now": 'table' begins at 11 there,
    // at 10 locally (one inserted space before it)
    assert(OffsetReconcile.adjustBegin(11, Vector((5, 1))) == 10)
    // offsets at/before the adjustment point are untouched (strict >)
    assert(OffsetReconcile.adjustBegin(5, Vector((5, 1))) == 5)
    assert(OffsetReconcile.adjustBegin(0, Vector((5, 1))) == 0)
  }

  test("distributed reconcile remaps external-coordinate annotations") {
    import spark.implicits._
    val local = Seq(
      (1L, "merge the table now"),
      (2L, "scan a stream"),
      (3L, "unchanged text")).toDF("doc_id", "text")
    val external = Seq(
      (1L, "merge  the table now"), // inserted space before 'the'
      (2L, "scan the stream"), // 'a' -> 'the'
      (3L, "unchanged text")).toDF("doc_id", "ext_text")
    // annotations with begins in EXTERNAL coordinates
    val anns = Seq(
      (1L, 11, 16, "table"), // local 10..15
      (1L, 0, 5, "merge"), // before the insertion: unchanged
      (2L, 9, 15, "stream"), // local 7..13
      (3L, 10, 14, "text"), // identical texts: unchanged
      (4L, 3, 7, "orph") // no external rendering: unchanged
    ).toDF("doc_id", "begin", "end", "text")
    val out = OffsetReconcile.reconcile(local, external, anns)
      .select("doc_id", "begin", "end", "text")
      .as[(Long, Int, Int, String)].collect().toSet
    assert(out == Set(
      (1L, 10, 15, "table"),
      (1L, 0, 5, "merge"),
      (2L, 7, 13, "stream"),
      (3L, 10, 14, "text"),
      (4L, 3, 7, "orph")))
    // every remapped span lands on the LOCAL text exactly
    val localMap = Map(1L -> "merge the table now", 2L -> "scan a stream",
      3L -> "unchanged text")
    out.filter(r => localMap.contains(r._1)).foreach { case (id, b, e, txt) =>
      assert(localMap(id).substring(b, e) == txt, s"doc $id")
    }
  }
}
