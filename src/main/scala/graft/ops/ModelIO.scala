package graft.ops

import org.apache.spark.sql.SparkSession

/** Model artifact persistence — the role of the reference's model files
  * (PyCRFSuite trains INTO a crfsuite model file and its taggers load one
  * back, `learning/crfsuite.py:52-73`, `learning/taggers.py:30-52`; the
  * SVM wrapper keeps a fitted sklearn object the same way). Our models
  * are plain data, so the artifacts are parquet TABLES, not opaque
  * binary blobs:
  *
  *  - CRF ([[graft.ops.Crf.Model]]): an `emissions` table
  *    (feature STRING, weights ARRAY<DOUBLE>) — one row per feature, the
  *    layout [[Crf.tagWithTable]] consumes DISTRIBUTED (feature-key join
  *    instead of a driver broadcast) when a model grows past broadcast
  *    size — plus a one-row `meta` table (labels, transitions, start,
  *    stop).
  *  - Linear SVM ([[RelationScoring.LinearModel]]): sparse nonzero
  *    (idx, weight) rows plus a one-row meta (bias, dims) — the hashed
  *    weight vector is mostly zeros on small training sets.
  *
  * Parquet keeps doubles bit-exact, so save→load→annotate is
  * bit-identical to annotating with the in-memory model (tested).
  */
object ModelIO {

  def saveCrf(spark: SparkSession, model: Crf.Model, path: String): Unit = {
    import spark.implicits._
    model.emissions.toSeq.map { case (f, w) => (f, w.toSeq) }
      .toDF("feature", "weights")
      .write.mode("overwrite").parquet(s"$path/emissions")
    Seq((model.labels, model.transitions.map(_.toSeq).toSeq,
      model.start.toSeq, model.stop.toSeq))
      .toDF("labels", "transitions", "start", "stop")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadCrf(spark: SparkSession, path: String): Crf.Model = {
    import spark.implicits._
    val em = spark.read.parquet(s"$path/emissions")
      .as[(String, Seq[Double])].collect()
      .map { case (f, w) => (f, w.toArray) }.toMap
    val meta = spark.read.parquet(s"$path/meta")
      .as[(Vector[String], Seq[Seq[Double]], Seq[Double], Seq[Double])]
      .head()
    Crf.Model(meta._1, em, meta._2.map(_.toArray).toArray,
      meta._3.toArray, meta._4.toArray)
  }

  def saveLinear(spark: SparkSession, model: RelationScoring.LinearModel,
                 path: String): Unit = {
    import spark.implicits._
    model.w.iterator.zipWithIndex.collect { case (v, i) if v != 0.0 => (i, v) }
      .toSeq.toDF("idx", "weight")
      .write.mode("overwrite").parquet(s"$path/weights")
    Seq((model.b, model.w.length))
      .toDF("bias", "dims")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadLinear(spark: SparkSession, path: String): RelationScoring.LinearModel = {
    import spark.implicits._
    val (bias, dims) = spark.read.parquet(s"$path/meta")
      .as[(Double, Int)].head()
    val w = new Array[Double](dims)
    spark.read.parquet(s"$path/weights").as[(Int, Double)].collect()
      .foreach { case (i, v) => w(i) = v }
    RelationScoring.LinearModel(w, bias)
  }
}
