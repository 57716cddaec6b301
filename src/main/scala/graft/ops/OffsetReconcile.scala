package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Offset reconciliation between OUR document text and annotations whose
  * offsets were computed against an external tagger's slightly-different
  * rendering of the same text — the role of the reference's difflib
  * re-adjustment when ingesting GNormPlus output
  * (`domain/bio/gnormplus.py:19-22,60-66`): the external service may
  * normalize whitespace/unicode, so its entity offsets drift and must be
  * mapped back into local coordinates before linking.
  *
  * Two layers:
  *  - a pure, dependency-free diff core ([[matchingBlocks]] /
  *    [[opcodes]] / [[adjustments]]) reproducing Python difflib's
  *    SequenceMatcher contract (Ratcliff–Obershelp longest-matching-block
  *    recursion, ties broken toward the earliest block; the `autojunk`
  *    popularity heuristic is deliberately NOT reproduced — it silently
  *    degrades on long texts, exactly what a deterministic engine must
  *    not do);
  *  - a distributed operator ([[reconcile]]) that computes one
  *    adjustment list per document (a row-local diff — documents are
  *    bounded) and applies it to every annotation with a codegen'd
  *    `aggregate` fold: ONE shuffle on doc_id, no UDF in the per-row
  *    path, adjustment lists broadcast-sized per row.
  */
object OffsetReconcile {

  /** Longest matching block of a[alo,ahi) vs b[blo,bhi) — difflib's
    * find_longest_match without junk handling: earliest-in-a then
    * earliest-in-b tie-break, then extended symmetrically.
    */
  private def longestMatch(a: String, b: String, b2j: Map[Char, Array[Int]],
                           alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
    var besti = alo; var bestj = blo; var bestsize = 0
    var j2len = scala.collection.mutable.HashMap.empty[Int, Int]
    var i = alo
    while (i < ahi) {
      val newj2len = scala.collection.mutable.HashMap.empty[Int, Int]
      b2j.getOrElse(a.charAt(i), Array.emptyIntArray).foreach { j =>
        if (j >= blo && j < bhi) {
          val k = j2len.getOrElse(j - 1, 0) + 1
          newj2len(j) = k
          if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
        }
      }
      j2len = newj2len
      i += 1
    }
    // symmetric extension (no junk classes, so one pass suffices)
    while (besti > alo && bestj > blo && a.charAt(besti - 1) == b.charAt(bestj - 1)) {
      besti -= 1; bestj -= 1; bestsize += 1
    }
    while (besti + bestsize < ahi && bestj + bestsize < bhi &&
      a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)) bestsize += 1
    (besti, bestj, bestsize)
  }

  /** Non-adjacent maximal matching blocks (i, j, size) in both-ascending
    * order, terminated by (a.length, b.length, 0) — difflib's
    * get_matching_blocks (queue recursion + adjacent-block merge).
    */
  def matchingBlocks(a: String, b: String): Vector[(Int, Int, Int)] = {
    val b2j = b.indices.groupBy(b.charAt).map { case (c, js) => (c, js.toArray) }
    val found = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val queue = scala.collection.mutable.Stack((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val m @ (i, j, k) = longestMatch(a, b, b2j, alo, ahi, blo, bhi)
      if (k > 0) {
        found += m
        if (alo < i && blo < j) queue.push((alo, i, blo, j))
        if (i + k < ahi && j + k < bhi) queue.push((i + k, ahi, j + k, bhi))
      }
    }
    val sorted = found.sortBy(m => (m._1, m._2)).toVector
    // merge adjacent blocks (difflib does this to keep opcodes canonical)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    sorted.foreach { case (i, j, k) =>
      merged.lastOption match {
        case Some((pi, pj, pk)) if pi + pk == i && pj + pk == j =>
          merged(merged.length - 1) = (pi, pj, pk + k)
        case _ => merged += ((i, j, k))
      }
    }
    (merged :+ ((a.length, b.length, 0))).toVector
  }

  /** difflib get_opcodes: (tag, i1, i2, j1, j2) covering both strings. */
  def opcodes(a: String, b: String): Vector[(String, Int, Int, Int, Int)] = {
    var i = 0; var j = 0
    val out = Vector.newBuilder[(String, Int, Int, Int, Int)]
    matchingBlocks(a, b).foreach { case (ai, bj, size) =>
      val tag =
        if (i < ai && j < bj) "replace"
        else if (i < ai) "delete"
        else if (j < bj) "insert"
        else ""
      if (tag.nonEmpty) out += ((tag, i, ai, j, bj))
      if (size > 0) out += (("equal", ai, ai + size, bj, bj + size))
      i = ai + size; j = bj + size
    }
    out.result()
  }

  /** `__find_offset_adjustments` (`gnormplus.py:19-22`) 1:1: for each
    * replace/insert opcode of SequenceMatcher(local, external), an
    * (adjustment_offset = startOffset+i1, adjustment = (j2-j1)-(i2-i1))
    * pair. Applying them maps an offset measured in EXTERNAL text
    * coordinates back into LOCAL coordinates.
    */
  def adjustments(local: String, external: String,
                  startOffset: Int = 0): Vector[(Int, Int)] =
    if (local == external) Vector.empty
    else opcodes(local, external).collect {
      case (tag, i1, i2, j1, j2) if tag == "replace" || tag == "insert" =>
        (startOffset + i1, (j2 - j1) - (i2 - i1))
    }

  /** Reference application loop (`gnormplus.py:60-66`) 1:1: the running
    * start is compared (strictly greater) and mutated in adjustment-list
    * order.
    */
  def adjustBegin(begin: Int, adjs: Seq[(Int, Int)]): Int = {
    var s = begin
    adjs.foreach { case (off, d) => if (s > off) s -= d }
    s
  }

  /** Distributed reconciliation: `localTexts` (doc_id, text) joined with
    * `externalTexts` (doc_id, ext_text) yields one adjustment list per
    * document (computed row-locally — a document diff is bounded work);
    * `anns` rows (doc_id, begin, end, ...) get `begin` remapped from
    * external to local coordinates by a codegen'd `aggregate` fold over
    * the per-doc adjustment array, `end` shifted to preserve the span
    * length (the reference keeps entity text fixed). Annotations of
    * documents with identical texts (or with no external rendering) pass
    * through unchanged — their adjustment list is empty/null.
    */
  def reconcile(localTexts: DataFrame, externalTexts: DataFrame,
                anns: DataFrame): DataFrame = {
    val spark = localTexts.sparkSession
    import spark.implicits._
    val adjDf = localTexts.select(col("doc_id"), col("text"))
      .join(externalTexts.select(col("doc_id"), col("ext_text")), Seq("doc_id"))
      .as[(Long, String, String)]
      .map { case (id, lt, et) => (id, adjustments(lt, et)) }
      .toDF("doc_id", "adjs")
    val applied: Column = aggregate(
      col("adjs"),
      col("begin").cast("int"),
      (s, x) => when(s > x.getField("_1"), s - x.getField("_2")).otherwise(s))
    anns.join(adjDf, Seq("doc_id"), "left")
      .withColumn("new_begin",
        when(col("adjs").isNull || size(col("adjs")) === 0, col("begin"))
          .otherwise(applied))
      .withColumn("end", (col("end") + (col("new_begin") - col("begin"))).cast("int"))
      .withColumn("begin", col("new_begin").cast("int"))
      .drop("adjs", "new_begin")
  }
}
