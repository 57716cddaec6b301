package graft.functions

import graft.SparkSpec
import graft.nlp.Hashes

/** The native expression must be bit-identical to the Scala reference
  * implementation, survive codegen, and stay inside WholeStageCodegen.
  */
class TextFingerprintSpec extends SparkSpec {

  test("expression == Hashes.fingerprint on corpus + edge cases") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val samples = Seq("", "a", "the fast key order", "naïve café ∑",
      "x" * 10000) ++ (0 until 50).map(i => s"doc body $i " * (i + 1))
    val got = samples.toDF("text")
      .selectExpr("text", "graft_fingerprint(text) AS fp")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) == Hashes.fingerprint(s), s.take(20))
    }
  }

  test("interpreted eval matches codegen eval") {
    val e = TextFingerprint(org.apache.spark.sql.catalyst.expressions.Literal("hello world"))
    assert(e.eval(null) == Hashes.fingerprint("hello world"))
  }

  test("plan stays inside WholeStageCodegen with pruned scan") {
    val df = graft.ops.TextAnalysis.fingerprint(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    df.collect() // finalize the (adaptive) physical plan
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks WholeStageCodegen stages in simpleString
    assert(plan.contains("*(1) Project"), plan)
    // column pruning: the scan must read only doc_id and text
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("graft_cosine expression == HOF column formula bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val rng = new scala.util.Random(5)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat),
        Array.fill(64)(rng.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x) /
      (sqrt(aggregate(transform(col("a"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x)) *
       sqrt(aggregate(transform(col("b"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x)))
    val diff = rows
      .select(expr("graft_cosine(a, b)").as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")) // bitwise-equal doubles
      .count()
    assert(diff == 0)
    // unequal lengths: dot over the common prefix, norms over full arrays
    val edge = Seq((Array(1f, 2f, 3f), Array(1f, 2f)))
      .toDF("a", "b")
      .select(expr("graft_cosine(a, b)").as("s"))
      .head().getDouble(0)
    val exp = (1.0 + 4.0) / (math.sqrt(14.0) * math.sqrt(5.0))
    assert(edge == exp)
  }
}
