package graft.ops

import graft.SparkSpec

class DatasetOpsSpec extends SparkSpec {

  test("pruneEmptyTurns keeps only turns with mentions") {
    import spark.implicits._
    val turns = Seq(("c1", 0), ("c1", 1), ("c2", 0)).toDF("conv_id", "turn_idx")
    val mentions = Seq(("c1", 0), ("c1", 0)).toDF("conv_id", "turn_idx")
    val got = DatasetOps.pruneEmptyTurns(turns, mentions)
      .as[(String, Int)].collect().toSet
    assert(got == Set(("c1", 0)))
  }

  test("pruneSentences: mention sentences always kept, rest sampled deterministically") {
    import spark.implicits._
    val sents = (0 until 100).map(i => ("c1", 0, i)).toDF("conv_id", "turn_idx", "sent_idx")
    val mentions = Seq(("c1", 0, 7)).toDF("conv_id", "turn_idx", "sent_idx")
    val a = DatasetOps.pruneSentences(sents, mentions, 0.2).collect().length
    val b = DatasetOps.pruneSentences(sents, mentions, 0.2).collect().length
    assert(a == b) // seeded
    assert(a >= 1 && a < 60)
    val kept = DatasetOps.pruneSentences(sents, mentions, 0.0)
      .as[(String, Int, Int)].collect().toSet
    assert(kept == Set(("c1", 0, 7)))
  }

  test("extendByKey: left wins on collision") {
    import spark.implicits._
    val a = Seq(("d1", "va"), ("d2", "va2")).toDF("doc_id", "v")
    val b = Seq(("d2", "vb2"), ("d3", "vb3")).toDF("doc_id", "v")
    val got = DatasetOps.extendByKey(a, b, "doc_id")
      .as[(String, String)].collect().toSet
    assert(got == Set(("d1", "va"), ("d2", "va2"), ("d3", "vb3")))
  }

  test("labelEdges: +1 iff key in conversation's gold set") {
    import spark.implicits._
    val edges = Seq(("c1", "k1"), ("c1", "k2"), ("c2", "k1")).toDF("conv_id", "key")
    val gold = Seq(("c1", "k1")).toDF("conv_id", "key")
    val got = DatasetOps.labelEdges(edges, gold)
      .select("conv_id", "key", "target").as[(String, String, Int)].collect().toSet
    assert(got == Set(("c1", "k1", 1), ("c1", "k2", -1), ("c2", "k1", -1)))
  }

  test("relationDistanceHistogram: min distance per key, then histogram") {
    import spark.implicits._
    val t = Seq(("c1", "k1", 2), ("c1", "k1", 0), ("c1", "k2", 1), ("c2", "k1", 1))
      .toDF("conv_id", "key", "dist")
    val got = DatasetOps.relationDistanceHistogram(t)
      .as[(Int, Long)].collect().toMap
    assert(got == Map(0 -> 1L, 1 -> 2L))
  }

  test("stratifiedSplit: proportional, disjoint, deterministic") {
    val keys = (0 until 50).map(i => (s"a$i", "s1")) ++
      (0 until 30).map(i => (s"b$i", "s2"))
    val (tr, te) = DatasetOps.stratifiedSplit(keys, 0.66)
    assert(tr.size + te.size == 80)
    assert((tr & te).isEmpty)
    assert(tr.count(_.startsWith("a")) == 33) // round(50*0.66)
    assert(tr.count(_.startsWith("b")) == 20) // round(30*0.66)
    assert(DatasetOps.stratifiedSplit(keys, 0.66)._1 == tr)
  }

  test("topMentionWords / cleanSubclasses / uniqueMentionTexts (data.py:312,335,755)") {
    import spark.implicits._
    val m = Seq(
      ("c1", "e_x", "Gene alpha", "9"), ("c1", "e_x", "alpha", null),
      ("c1", "e_x", "beta 42", "0"), ("c1", "e_y", "alpha", null)
    ).toDF("conv_id", "class_id", "text", "subclass")
    // class-filtered, lowercased, alpha-only ("42" dropped), ranked;
    // count ties broken by word for determinism
    val top = DatasetOps.topMentionWords(m, "e_x", topNr = 2)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("alpha", 2L), ("beta", 1L)))
    assert(DatasetOps.topMentionWords(m, "e_x", topNr = 10, alphaOnly = false)
      .as[(String, Long)].collect().toMap.get("42").contains(1L))
    assert(DatasetOps.cleanSubclasses(m)
      .filter(org.apache.spark.sql.functions.col("subclass").isNotNull)
      .count() == 0)
    assert(DatasetOps.uniqueMentionTexts(m).as[String].collect().toSet ==
      Set("Gene alpha", "alpha", "beta 42"))
  }
}
