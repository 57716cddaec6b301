package graft

import org.apache.spark.sql.SparkSession

/** Per-query timing probe: run ONE driver query N times in one warm JVM
  * and print each rep's wall seconds — the complement of graft.Bench
  * (whole suite, min-of-2) for isolating a single query's cost from
  * suite-order effects (cache population, session state, ambient noise).
  *
  *   sbt -batch "runMain graft.TimeQuery <queryName> [sfDir] [reps]"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-stage wall durations — where a slow rep actually spends time
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b)
        stages.add((i.stageId, ms.getOrElse(-1L), i.numTasks,
          i.name.take(60).replace("\"", "'")))
      }
    })
    val fn = SparkEntry.queries(name)
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    // stage rows are attributed to reps by snapshotting the queue size
    // at each rep boundary (the listener bus is async — the short sleep
    // lets a rep's trailing stage events land before its mark), so the
    // printed slowest stages name their rep and the warmup count's
    // stages are excluded instead of polluting the ranking
    Thread.sleep(200)
    val repMarks = new Array[Int](reps + 1)
    repMarks(0) = stages.size
    val times = (0 until reps).map { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      repMarks(r + 1) = stages.size
      (n, sec)
    }
    SparkEntry.clearCaches()
    spark.stop() // drain the listener bus before reading stage rows
    import scala.jdk.CollectionConverters._
    def repOf(idx: Int): Int = {
      var r = reps - 1 // late arrivals clamp to the final rep
      var i = 0
      while (i < reps) {
        if (idx < repMarks(i + 1)) { r = i; i = reps } else i += 1
      }
      r
    }
    val top = stages.asScala.toVector.zipWithIndex
      .filter(_._2 >= repMarks(0)) // drop warmup stages
      .sortBy(-_._1._2).take(10)
      .map { case ((id, ms, nt, nm), idx) =>
        s"""{"stage":$id,"rep":${repOf(idx)},"ms":$ms,"tasks":$nt,"name":"$nm"}""" }
    println(s"""{"query":"$name","sf":"$sfDir","rows":${times.head._1},""" +
      s""""reps":[${times.map(t => f"${t._2}%.3f").mkString(",")}],""" +
      s""""slowest_stages":[${top.mkString(",")}]}""")
  }
}
