package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness. Reports the driver-contract JSON line
  * ({"metric","value","unit","queries","sf"}), extended with the
  * BASELINE.json headline numbers: transcript turns processed and fused
  * triple-emission throughput in turns/sec.
  *
  * Scaling-efficiency evidence (north_rule: N → 4N executors ≥ 0.8) is
  * produced by running this main twice on the same input with
  * SPARK_GRAFT_CPUS=8 and =32 (the sandbox proxy for cluster sizes) —
  * see tools/bench_scaling.sh and BENCH.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // warm the JVM + parquet footers once so per-query numbers measure
    // the plan, not first-touch classloading
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    // headline: fused triple-emission pipeline, turns/sec (min of 2 —
    // micro-scale timings are JIT/GC-noise-dominated, the min is the
    // plan's real cost)
    val nTurns = ops.Transcripts.fromDocuments(spark, sfDir).count()
    val (nTriples, tPipe0) = time(SparkEntry.kgPipelineFused(spark, sfDir).count())
    val (_, tPipe1) = time(SparkEntry.kgPipelineFused(spark, sfDir).count())
    var tPipe = math.min(tPipe0, tPipe1)

    // a crashing query reports null timing + an errors entry (never a
    // misleadingly fast exception-path timing), and is excluded from total
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] =
      try Some(time(fn(spark, sfDir).count())._2)
      catch { case e: Throwable =>
        errors.getOrElseUpdate(name, e.toString.takeWhile(_ != '\n').take(200))
        None
      }
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = (once(name, fn), once(name, fn)) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case _ => None
      }
      name -> t
    }
    // Outlier re-run (r5): host CPU steal windows (vmstat st>0; see
    // BENCH.md) can hit BOTH back-to-back reps of one query — r4's driver
    // artifact recorded kg_eval at 15.3 s on an unchanged plan that
    // measures 0.78 s clean. A steal window is temporally local, so
    // re-executing suspicious queries at the END of the pass (a different
    // time window) and keeping the min recovers the plan's real cost.
    // Bounded: 2 extra reps only for queries above 3x the suite median
    // (and a 1 s absolute floor).
    val timed = firstPass.flatMap(_._2).sorted
    val median = if (timed.isEmpty) 0.0 else timed(timed.length / 2)
    val cutoff = math.max(1.0, 3.0 * median)
    var reruns = 0
    // a FAILING re-run rep never pollutes `errors`: the query already has
    // a valid timing, and the artifact invariant is "null timing + errors
    // entry, never both"
    def onceQuiet(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] =
      try Some(time(fn(spark, sfDir).count())._2) catch { case _: Throwable => None }
    val results = firstPass.map {
      case (name, Some(t)) if t > cutoff =>
        reruns += 1
        val fn = SparkEntry.queries(name)
        val best = Seq(Some(t), onceQuiet(fn), onceQuiet(fn)).flatten.min
        name -> Some(best)
      case kv => kv
    }
    // the headline pipeline gets the same treatment: one extra rep at the
    // end of the suite if both opening reps look steal-inflated
    if (tPipe > cutoff) {
      val extra =
        try Some(time(SparkEntry.kgPipelineFused(spark, sfDir).count())._2)
        catch { case _: Throwable => None }
      extra.foreach(t => tPipe = math.min(tPipe, t))
    }
    val turnsPerSec = nTurns / tPipe
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.map(_.toString).getOrElse("null") }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"reruns":$reruns,"sf":"$sfDir","cpus":$cpus,"turns":$nTurns,"triples":$nTriples,"pipeline_sec":$tPipe,"turns_per_sec":$turnsPerSec}""")
    SparkEntry.clearCaches()
    spark.stop()
  }
}
