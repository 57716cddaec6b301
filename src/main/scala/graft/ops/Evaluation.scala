package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed evaluators — nalaf's `learning/evaluators.py` re-expressed
  * as joins + aggregations. Match mode is an explicit parameter, never the
  * reference's global `Entity.equality_operator` (`data.py:1901-1941`).
  */
object Evaluation {

  final case class Counts(tp: Long, fp: Long, fn: Long, fpOv: Long, fnOv: Long)
  final case class PRF(precision: Double, recall: Double, fMeasure: Double)

  /** P/R/F under 'exact' / 'overlapping' / 'half_overlapping' counting —
    * exact arithmetic of `Evaluation.compute` (`evaluators.py:28-66`).
    */
  def compute(c: Counts, strictness: String): PRF = {
    def safeDiv(n: Double, d: Double) = if (d == 0) 0.0 else n / d
    val (p, r) = strictness match {
      case "exact" =>
        (safeDiv(c.tp.toDouble, (c.tp + c.fp).toDouble),
         safeDiv(c.tp.toDouble, (c.tp + c.fn).toDouble))
      case "overlapping" =>
        val fp = c.fp - c.fpOv; val fn = c.fn - c.fnOv
        val tp = c.tp + c.fpOv + c.fnOv
        (safeDiv(tp.toDouble, (tp + fp).toDouble),
         safeDiv(tp.toDouble, (tp + fn).toDouble))
      case "half_overlapping" =>
        val fp = c.fp - c.fpOv; val fn = c.fn - c.fnOv
        val num = c.tp + (c.fpOv + c.fnOv) / 2.0
        val den = (c.tp + c.fpOv + c.fnOv).toDouble
        (safeDiv(num, den + fp), safeDiv(num, den + fn))
      case other =>
        throw new IllegalArgumentException(s"unknown strictness $other")
    }
    PRF(p, r, 2 * safeDiv(p * r, p + r))
  }

  /** Mention-level evaluation (`MentionLevelEvaluator.evaluate`,
    * `evaluators.py:372-497`): set-membership counting per document.
    * gold/pred schemas: (conv_id, class_id, begin, text). Entity equality:
    * exact = same (class, begin, text); overlap = same class, char ranges
    * intersect, NOT exact (`data.py:1923-1941`). Returns global Counts.
    */
  def mentionCounts(gold: DataFrame, pred: DataFrame): Counts = {
    val g = gold.select(col("conv_id"), col("class_id"), col("begin"),
      col("text"), (col("begin") + length(col("text"))).as("end")).distinct()
    val p = pred.select(col("conv_id"), col("class_id"), col("begin"),
      col("text"), (col("begin") + length(col("text"))).as("end")).distinct()

    val exactKeys = Seq("conv_id", "class_id", "begin", "text")
    val tp = p.join(g, exactKeys, "left_semi").count()
    val fpSet = p.join(g, exactKeys, "left_anti")
    val fnSet = g.join(p, exactKeys, "left_anti")
    val fp = fpSet.count()
    val fn = fnSet.count()

    def overlapCount(a: DataFrame, b: DataFrame): Long = {
      val bb = b.select(col("conv_id").as("conv_id2"), col("class_id").as("class_id2"),
        col("begin").as("begin2"), col("text").as("text2"), col("end").as("end2"))
      a.join(bb,
          col("conv_id") === col("conv_id2") && col("class_id") === col("class_id2") &&
          col("begin") < col("end2") && col("end") > col("begin2") &&
          !(col("begin") === col("begin2") && col("text") === col("text2")))
        .select(col("conv_id"), col("class_id"), col("begin"), col("text"))
        .distinct().count()
    }
    // fp_ov: false positives that overlap some gold; fn_ov: vice versa
    val fpOv = overlapCount(fpSet, g)
    val fnOv = overlapCount(fnSet, p)
    Counts(tp, fp, fn, fpOv, fnOv)
  }

  /** Document-level relation evaluation
    * (`DocumentLevelRelationEvaluator.evaluate`, `evaluators.py:732-787`):
    * gold and predicted triples are reduced to their canonical key sets
    * per document; tp counts gold keys with a matching prediction, fp
    * predicted keys with no gold match, fn gold keys with no prediction.
    * Inputs: DataFrames with (conv_id, key).
    */
  def relationCounts(gold: DataFrame, pred: DataFrame): Counts = {
    val g = gold.select("conv_id", "key").distinct()
    val p = pred.select("conv_id", "key").distinct()
    val tp = g.join(p, Seq("conv_id", "key"), "left_semi").count()
    val fp = p.join(g, Seq("conv_id", "key"), "left_anti").count()
    val fn = g.join(p, Seq("conv_id", "key"), "left_anti").count()
    Counts(tp, fp, fn, 0, 0)
  }

  /** Bootstrap standard errors over per-document counts —
    * `EvaluationWithStandardError` (`evaluators.py:104-172`): n resamples
    * of round(p·|docs|) document keys WITHOUT replacement, SE =
    * sqrt(Σ(x-mean)²/(n-1))/sqrt(n), small values ×4
    * (`evaluators.py:137-143`). The reference samples seedlessly; we fix
    * the seed (SURVEY §4: determinism fixed).
    *
    * Per-doc counts are tiny relative to the corpus (one row per
    * conversation), so this runs on collected counts like the reference.
    */
  def bootstrapSE(perDoc: Map[String, Counts], strictness: String,
                  n: Int = 1000, p: Double = 0.15, seed: Long = 2727L): (PRF, PRF) = {
    def get(keys: Iterable[String]): Counts = {
      var tp = 0L; var fp = 0L; var fn = 0L; var fpo = 0L; var fno = 0L
      keys.foreach { k =>
        perDoc.get(k).foreach { c =>
          tp += c.tp; fp += c.fp; fn += c.fn; fpo += c.fpOv; fno += c.fnOv
        }
      }
      Counts(tp, fp, fn, fpo, fno)
    }
    val mean = compute(get(perDoc.keys), strictness)
    val keys = perDoc.keys.toVector.sorted
    val m = math.round(keys.length * p).toInt
    val rng = new scala.util.Random(seed)
    val samples = (1 to n).map { _ =>
      val shuffled = rng.shuffle(keys)
      compute(get(shuffled.take(m)), strictness)
    }
    def se(meanV: Double, xs: Seq[Double]): Double = {
      val clean = xs.filterNot(_.isNaN)
      val nn = clean.length
      val s = if (nn <= 1) 0.0
      else math.sqrt(clean.map(x => (x - meanV) * (x - meanV)).sum / (nn - 1)) / math.sqrt(nn)
      if (s <= 0.00001) s * 4 else s
    }
    (mean, PRF(
      se(mean.precision, samples.map(_.precision)),
      se(mean.recall, samples.map(_.recall)),
      se(mean.fMeasure, samples.map(_.fMeasure))))
  }

  /** Per-document relation counts as a DataFrame (the distributed form —
    * the scalar Counts variant above collects only final sums).
    */
  def relationCountsByDoc(gold: DataFrame, pred: DataFrame): DataFrame = {
    val g = gold.select("conv_id", "key").distinct().withColumn("g", lit(1))
    val p = pred.select("conv_id", "key").distinct().withColumn("p", lit(1))
    g.join(p, Seq("conv_id", "key"), "full_outer")
      .groupBy("conv_id")
      .agg(
        sum(when(col("g").isNotNull && col("p").isNotNull, 1).otherwise(0)).as("tp"),
        sum(when(col("g").isNull && col("p").isNotNull, 1).otherwise(0)).as("fp"),
        sum(when(col("g").isNotNull && col("p").isNull, 1).otherwise(0)).as("fn"))
  }
}
