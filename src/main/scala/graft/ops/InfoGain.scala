package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-feature information gain over labeled edges —
  * `calculateInformationGain` (`features/relations/__init__.py:173-263`):
  * for every feature key, IG = H(class) − Σ_v p(v)·H(class|v) over the
  * binary present/absent split, classes = {+1, −1}.
  *
  * A pure aggregation pipeline: explode features → two-level groupBy →
  * closed-form entropy expressions → sort. No driver loops; scales as a
  * standard shuffle-bound aggregate.
  */
object InfoGain {

  /** edges: (edge_id, target ∈ {+1,-1}, features MAP<STRING,DOUBLE>).
    * Returns (feature, ig) sorted descending — the reference prints the
    * same ranking.
    */
  def compute(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val total = edges.agg(
      count(lit(1)).as("n"),
      sum(when(col("target") === 1, 1).otherwise(0)).as("n_pos")).first()
    val n = total.getLong(0).toDouble
    val nPos = total.getLong(1).toDouble
    val nNeg = n - nPos
    def h(p: Double): Double =
      if (p <= 0 || p >= 1) 0.0 else -p * math.log(p) / math.log(2) -
        (1 - p) * math.log(1 - p) / math.log(2)
    val hClass = h(nPos / n)

    // presence counts per feature × class
    val present = edges
      .select(col("target"), explode(map_keys(col("features"))).as("feature"))
      .groupBy("feature")
      .agg(count(lit(1)).as("n_f"),
        sum(when(col("target") === 1, 1).otherwise(0)).as("n_f_pos"))

    val log2 = math.log(2)
    def entropyExpr(p: org.apache.spark.sql.Column) = {
      val clamped = when(p <= 0.0 || p >= 1.0, lit(0.0)).otherwise(
        -p * log(p) / log2 - (lit(1.0) - p) * log(lit(1.0) - p) / log2)
      clamped
    }

    present
      .withColumn("n_abs", lit(n) - col("n_f"))
      .withColumn("n_abs_pos", lit(nPos) - col("n_f_pos"))
      .withColumn("h_present", entropyExpr(col("n_f_pos") / col("n_f")))
      .withColumn("h_absent",
        when(col("n_abs") === 0, lit(0.0))
          .otherwise(entropyExpr(col("n_abs_pos") / col("n_abs"))))
      .withColumn("ig",
        lit(hClass) - (col("n_f") / n) * col("h_present")
          - (col("n_abs") / n) * col("h_absent"))
      .select(col("feature"), col("ig"))
      .orderBy(desc("ig"), col("feature"))
  }
}
