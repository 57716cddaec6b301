package graft.ops

import graft.SparkSpec
import graft.model._
import graft.nlp.TextOps

/** Ports of tests/preprocessing/test_edges.py and
  * tests/learning/test_taggers.py: the 4-sentence fixture, its exact edge
  * counts at distances 0/1/2/∞, and the three stub extractors' golden
  * tp/fp/fn and F-measures.
  */
class EdgeAndTaggerSpec extends SparkSpec {

  private val E1 = "e_x_1"
  private val E2 = "e_x_2"
  private val R1 = "r_x_1"

  private val text = "Sentence 1: e_1_yolo may be related to e_2_tool plus hey, e_2_coco. Sentence 2: e_1_nin. Sentence 3: e_2_musk. Sentence 4: nothing"

  // fixture entities (class, offset, text) — test_edges.py:26-37
  private val ents = Seq(
    (E1, 12, "e_1_yolo"), (E2, 39, "e_2_tool"), (E2, 58, "e_2_coco"),
    (E1, 80, "e_1_nin"), (E2, 101, "e_2_musk"))

  /** Mentions with sent_idx resolved from the splitter (as the reference
    * resolves `get_sentence_index_for_annotation`).
    */
  private def fixtureMentions: Seq[Mention] = {
    val sents = TextOps.splitSentences(text).zipWithIndex
    ents.map { case (cls, off, t) =>
      val sentIdx = sents.collectFirst {
        case ((s, start), i) if off >= start && off < start + s.length => i
      }.get
      Mention("testid", 0, sentIdx, cls, off, off + t.length, t, 0.0, TextOps.normKey(t))
    }
  }

  private def mentionsDs = {
    import spark.implicits._
    spark.createDataset(fixtureMentions)
  }

  test("sentence-distance edge counts match reference goldens") {
    def n(d: Option[Int]) =
      EdgeGen.sentenceDistance(mentionsDs, E1, E2, R1, d).count()
    assert(n(Some(0)) == 2) // test_edges.py:58-62
    assert(n(Some(1)) == 3) // :65-69
    assert(n(Some(2)) == 1) // :72-76
    assert(n(Some(Int.MaxValue)) == 0) // :79-83
    assert(n(None) == 6) // all pairs
  }

  test("edges are canonically ordered by offset") {
    import spark.implicits._
    val e = EdgeGen.sentenceDistance(mentionsDs, E1, E2, R1, Some(1)).collect()
    e.foreach { r => assert(r.begin1 <= r.begin2 && r.sent1 <= r.sent2) }
  }

  test("combinator edge generator unions and dedups (edges.py:86-100)") {
    // distance 0 (2 edges) ∪ distance 1 (3) ∪ distance ≤1-any-overlap:
    // combining d0 with d0+d1 must not double-count the d0 edges
    val d0 = EdgeGen.sentenceDistance(mentionsDs, E1, E2, R1, Some(0))
    val d1 = EdgeGen.sentenceDistance(mentionsDs, E1, E2, R1, Some(1))
    assert(EdgeGen.combine(Seq(d0, d1)).count() == 5)
    assert(EdgeGen.combine(Seq(d0, d0, d1)).count() == 5)
    assert(EdgeGen.combine(Seq(d0)).count() == 2)
  }

  // canonical triple key, Relation.map semantics (data.py:1997-2015)
  private def tripleKey(relType: String, c1: String, t1: String, c2: String, t2: String): String = {
    val e1 = s"$c1|${t1.toLowerCase}"
    val e2 = s"$c2|${t2.toLowerCase}"
    if (c2 <= c1) s"$relType|$e2|$e1" else s"$relType|$e1|$e2"
  }

  private def goldTriples = {
    import spark.implicits._
    // test_taggers.py:39-48: (yolo,tool), (tool,nin), (nin,musk)
    Seq(
      ("testid", tripleKey(R1, E1, "e_1_yolo", E2, "e_2_tool")),
      ("testid", tripleKey(R1, E2, "e_2_tool", E1, "e_1_nin")),
      ("testid", tripleKey(R1, E1, "e_1_nin", E2, "e_2_musk"))
    ).toDF("conv_id", "key")
  }

  private def predFromEdges(distances: Seq[Option[Int]]) = {
    import spark.implicits._
    distances.map { d =>
      EdgeGen.sentenceDistance(mentionsDs, E1, E2, R1, d)
        .select($"conv_id", $"rel_type", $"class1", $"text1", $"class2", $"text2")
    }.reduce(_ unionByName _)
      .withColumn("key",
        org.apache.spark.sql.functions.expr(
          s"""case when class2 <= class1
             | then concat(rel_type, '|', class2, '|', lower(text2), '|', class1, '|', lower(text1))
             | else concat(rel_type, '|', class1, '|', lower(text1), '|', class2, '|', lower(text2)) end""".stripMargin))
      .select("conv_id", "key")
  }

  test("StubSameSentence: tp=1 fn=2 fp=1, F=0.4 (test_taggers.py:72-76)") {
    val c = Evaluation.relationCounts(goldTriples, predFromEdges(Seq(Some(0))))
    assert(c.tp == 1 && c.fn == 2 && c.fp == 1)
    assert(Evaluation.compute(c, "exact").fMeasure == 0.4)
  }

  test("Stub D0+D1: tp=3 fn=0 fp=2, F=0.7499… (test_taggers.py:100-104)") {
    val c = Evaluation.relationCounts(goldTriples, predFromEdges(Seq(Some(0), Some(1))))
    assert(c.tp == 3 && c.fn == 0 && c.fp == 2)
    assert(math.abs(Evaluation.compute(c, "exact").fMeasure - 0.7499999999999999) < 1e-12)
  }

  test("StubSamePart: tp=3 fn=0 fp=3, F=2/3 (test_taggers.py:124-128)") {
    val c = Evaluation.relationCounts(goldTriples, predFromEdges(Seq(None)))
    assert(c.tp == 3 && c.fn == 0 && c.fp == 3)
    assert(math.abs(Evaluation.compute(c, "exact").fMeasure - 2.0 / 3.0) < 1e-12)
  }
}
