package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Tok

/** Window-feature goldens (tests/features/test_window.py), CV-split
  * contracts, bootstrap-SE sanity.
  */
class FeaturesAndSplitsSpec extends AnyFunSuite {

  // two 3-token sentences, each token has features a[0]=a, b[0]=b
  private def sentences: Seq[IndexedSeq[Tok]] = Seq(
    IndexedSeq(Tok(0, "Make", 0, 4), Tok(1, "making", 5, 11), Tok(2, "made", 12, 16)),
    IndexedSeq(Tok(0, "Try", 18, 21), Tok(1, "tried", 22, 27), Tok(2, "tries", 28, 33)))

  private def baseFeats(sent: IndexedSeq[Tok]) =
    sent.map(_ => Map("a[0]" -> "a", "b[0]" -> "b"))

  // test_window.py:19-34 — default template (-2,-1,1,2)
  test("window features: default template golden") {
    sentences.foreach { sent =>
      val got = TokenFeatures.window(baseFeats(sent))
      assert(got(0) == Map("a[0]" -> "a", "a[1]" -> "a", "a[2]" -> "a",
        "b[0]" -> "b", "b[1]" -> "b", "b[2]" -> "b"))
      assert(got(1) == Map("a[-1]" -> "a", "a[0]" -> "a", "a[1]" -> "a",
        "b[-1]" -> "b", "b[0]" -> "b", "b[1]" -> "b"))
      assert(got(2) == Map("a[-2]" -> "a", "a[-1]" -> "a", "a[0]" -> "a",
        "b[-2]" -> "b", "b[-1]" -> "b", "b[0]" -> "b"))
    }
  }

  // test_window.py:36-43 — custom template (-2, 1)
  test("window features: custom template golden") {
    sentences.foreach { sent =>
      val got = TokenFeatures.window(baseFeats(sent), template = Seq(-2, 1))
      assert(got(0) == Map("a[0]" -> "a", "a[1]" -> "a", "b[0]" -> "b", "b[1]" -> "b"))
      assert(got(1) == Map("a[0]" -> "a", "a[1]" -> "a", "b[0]" -> "b", "b[1]" -> "b"))
      assert(got(2) == Map("a[-2]" -> "a", "a[0]" -> "a", "b[-2]" -> "b", "b[0]" -> "b"))
    }
  }

  // test_window.py:45-56 — include list
  test("window features: include-list golden") {
    sentences.foreach { sent =>
      val got = TokenFeatures.window(baseFeats(sent), includeList = Some(Set("a[0]")))
      assert(got(0) == Map("a[0]" -> "a", "a[1]" -> "a", "a[2]" -> "a", "b[0]" -> "b"))
      assert(got(1) == Map("a[-1]" -> "a", "a[0]" -> "a", "a[1]" -> "a", "b[0]" -> "b"))
      assert(got(2) == Map("a[-2]" -> "a", "a[-1]" -> "a", "a[0]" -> "a", "b[0]" -> "b"))
    }
  }

  test("default pipeline carries stem window -3..3") {
    val sent = IndexedSeq(Tok(0, "running", 0, 7), Tok(1, "fast", 8, 12),
      Tok(2, "tests", 13, 18), Tok(3, "now", 19, 22))
    val feats = TokenFeatures.defaultPipeline(sent)
    assert(feats(0)("word[0]") == "running")
    assert(feats(0)("stem[0]") == "run")
    assert(feats(0)("stem[1]") == "fast")
    assert(feats(0)("stem[2]") == "test")
    assert(feats(0)("stem[3]") == "now")
    assert(!feats(0).contains("stem[-1]"))
    assert(feats(3)("stem[-3]") == "run")
    // only stem is windowed (include list), word is not
    assert(!feats(0).contains("word[1]"))
  }

  test("conjunction feature crossing") {
    val f = IndexedSeq(Map("pos[0]" -> "NOUN", "stem[0]" -> "run"))
    val got = TokenFeatures.conjunction(f, "pos[0]", "stem[0]")
    assert(got(0) == Map("pos[0]|stem[0]" -> "NOUN|run"))
  }

  test("kfold: disjoint, exhaustive, near-equal sizes, deterministic") {
    val keys = (0 until 103).map(i => f"doc_$i%03d")
    val folds = Splits.kfold(keys, 5)
    assert(folds.keySet == keys.toSet)
    val sizes = folds.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0 until 5).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(Splits.kfold(keys, 5) == folds) // deterministic
    assert(Splits.kfold(keys, 5, seed = 1L) != folds) // seed-sensitive
  }

  test("percentage split: 66/34 with disjoint cover") {
    val keys = (0 until 100).map(i => s"doc_$i")
    val (train, test) = Splits.percentage(keys, 0.66)
    assert(train.size == 66 && test.size == 34)
    assert((train ++ test) == keys.toSet)
  }

  test("bootstrap SE: zero variance when all docs identical, small-value x4 rule") {
    val perDoc = (0 until 40).map(i => s"d$i" -> Evaluation.Counts(2, 1, 1, 0, 0)).toMap
    val (mean, se) = Evaluation.bootstrapSE(perDoc, "exact", n = 200)
    assert(mean.precision == 2.0 / 3)
    // identical docs → every resample identical → SE ~ 0 (×4 rule keeps 0)
    assert(se.precision < 1e-6)
    // heterogeneous docs → nonzero SE
    val mixed = (0 until 40).map { i =>
      s"d$i" -> (if (i % 2 == 0) Evaluation.Counts(3, 0, 1, 0, 0)
                 else Evaluation.Counts(0, 2, 2, 0, 0))
    }.toMap
    val (_, se2) = Evaluation.bootstrapSE(mixed, "exact", n = 200)
    assert(se2.precision > 0.001)
  }
}
