package graft.ops

import graft.SparkSpec

/** Information-gain semantics (`relations/__init__.py:173-263`):
  * hand-computed goldens on a 4-edge fixture.
  */
class InfoGainSpec extends SparkSpec {

  test("perfect, useless and partial features rank correctly") {
    import spark.implicits._
    // 2 positive, 2 negative edges
    val edges = Seq(
      (1L, 1, Map("perfect" -> 1.0, "noise" -> 1.0)),
      (2L, 1, Map("perfect" -> 1.0, "partial" -> 1.0)),
      (3L, -1, Map("noise" -> 1.0, "partial" -> 1.0)),
      (4L, -1, Map("noise" -> 1.0))
    ).toDF("edge_id", "target", "features")
    val ig = InfoGain.compute(edges).as[(String, Double)].collect().toMap

    // H(class) = 1 bit. "perfect" splits 2/2 cleanly → IG = 1
    assert(math.abs(ig("perfect") - 1.0) < 1e-12)
    // "noise": present on {+,-,-} (H=0.918), absent on {+} (H=0)
    val expectedNoise = 1.0 - 0.75 * (-(1.0/3) * math.log(1.0/3) / math.log(2)
      - (2.0/3) * math.log(2.0/3) / math.log(2))
    assert(math.abs(ig("noise") - expectedNoise) < 1e-12)
    // "partial": present {+,-} H=1, absent {+,-} H=1 → IG = 0
    assert(math.abs(ig("partial")) < 1e-12)
    // ranking
    val ranked = InfoGain.compute(edges).as[(String, Double)].collect().map(_._1)
    assert(ranked.head == "perfect" && ranked.last == "partial")
  }
}
