package graft.ops

import graft.SparkSpec

/** Scale evidence: when the mentions table is stored bucketed by
  * conv_id (the Iceberg `bucket(conv_id)` layout of the north_rule),
  * the edge self-join runs with ZERO exchanges — the one shuffle of the
  * fused pipeline disappears on co-located storage.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-conv_id self-join plans without Exchange") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val grouped = GazetteerTagger.grouped(GazetteerTagger.tag(
        Segmentation.tokenized(Segmentation.turns(
          Transcripts.fromDocuments(spark, "/root/testdata/sf0.001")))))
      spark.sql("DROP TABLE IF EXISTS grouped_mentions")
      grouped.write
        .option("path", s"$wh/grouped_mentions")
        .bucketBy(8, "conv_id").sortBy("conv_id", "turn_idx")
        .saveAsTable("grouped_mentions")

      val t = spark.table("grouped_mentions")
      val edges = EdgeGen.turnWindow(t, GazetteerTagger.OpClass,
        GazetteerTagger.ObjClass, "r_op_obj", window = 1)
      edges.collect()
      val plan = edges.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)

      // and the result matches the unbucketed route
      val viaBuckets = edges.select("conv_id", "turn1", "turn2", "word1", "word2")
        .collect().map(_.toSeq).toSet
      val direct = EdgeGen.turnWindow(grouped, GazetteerTagger.OpClass,
        GazetteerTagger.ObjClass, "r_op_obj", window = 1)
        .select("conv_id", "turn1", "turn2", "word1", "word2")
        .collect().map(_.toSeq).toSet
      assert(viaBuckets == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS grouped_mentions")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10 * 1024 * 1024)
    }
  }
}
