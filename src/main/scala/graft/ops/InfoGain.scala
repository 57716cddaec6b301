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
    *
    * ONE job: the class totals are a 1-row aggregate broadcast-cross-
    * joined into the per-feature plan (r5 — an eager `.first()` here was
    * a second barrier, which is what made this query steal-sensitive:
    * 3.51 s in the r4 driver artifact vs a 0.57 s clean min). The entropy
    * arithmetic is unchanged expression-for-expression, so the DuckDB
    * oracle's 6dp-rounded mirror still bit-matches.
    */
  def compute(edges: DataFrame): DataFrame = {
    // class totals as a 1-row plan, NOT a driver value — count cast to
    // double is exact, so values are bit-identical to the .first() form
    val totals = edges.agg(
      count(lit(1)).cast("double").as("n"),
      sum(when(col("target") === 1, 1).otherwise(0)).cast("double").as("n_pos"))

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
      .crossJoin(broadcast(totals))
      .withColumn("n_abs", col("n") - col("n_f"))
      .withColumn("n_abs_pos", col("n_pos") - col("n_f_pos"))
      .withColumn("h_present", entropyExpr(col("n_f_pos") / col("n_f")))
      .withColumn("h_absent",
        when(col("n_abs") === 0, lit(0.0))
          .otherwise(entropyExpr(col("n_abs_pos") / col("n_abs"))))
      .withColumn("ig",
        entropyExpr(col("n_pos") / col("n"))
          - (col("n_f") / col("n")) * col("h_present")
          - (col("n_abs") / col("n")) * col("h_absent"))
      .select(col("feature"), col("ig"))
      .orderBy(desc("ig"), col("feature"))
  }
}
