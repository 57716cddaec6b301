package graft.ops

import graft.SparkSpec
import graft.model.Tok
import java.nio.file.Files

/** Model save→load round-trips must be bit-exact: annotating with a
  * loaded model equals annotating with the in-memory one (the contract
  * the reference gets from crfsuite model files,
  * `learning/crfsuite.py:52-73` / `learning/taggers.py:30-52`).
  */
class ModelIOSpec extends SparkSpec {

  test("CRF model round-trip: identical weights and identical tagging") {
    val gaz = Map("merge" -> "op", "table" -> "obj")
    val model = Crf.dictionaryModel(gaz)
    val dir = Files.createTempDirectory("crf_model").toString
    ModelIO.saveCrf(spark, model, dir)
    val loaded = ModelIO.loadCrf(spark, dir)

    assert(loaded.labels == model.labels)
    assert(loaded.emissions.keySet == model.emissions.keySet)
    loaded.emissions.foreach { case (f, w) =>
      assert(w.toSeq == model.emissions(f).toSeq, f)
    }
    assert(loaded.transitions.map(_.toSeq).toSeq ==
      model.transitions.map(_.toSeq).toSeq)
    assert(loaded.start.toSeq == model.start.toSeq)
    assert(loaded.stop.toSeq == model.stop.toSeq)

    import spark.implicits._
    val ts = Segmentation.tokenized(Segmentation.turns(
      Transcripts.fromDocuments(spark, "/root/testdata/sf0.001")))
    val a = Crf.tag(ts, model).collect().toSet
    val b = Crf.tag(ts, loaded).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("tagWithTable: emissions-table join scoring equals broadcast tag") {
    // the distributed consumer of ModelIO's emissions layout: join-based
    // scoring must reproduce the broadcast path bit-for-bit on the
    // dictionary model (integer weights — FP-order-proof), including
    // sentences with no feature hit and empty sentences
    val model = Crf.dictionaryModel(GazetteerTagger.gazetteer)
    val dir = Files.createTempDirectory("crf_table").toString
    ModelIO.saveCrf(spark, model, dir)
    val emissions = spark.read.parquet(s"$dir/emissions")
    val ts = Segmentation.tokenized(Segmentation.turns(
      Transcripts.fromDocuments(spark, "/root/testdata/sf0.001")))
    val broadcastPath = Crf.tag(ts, model).collect().toSet
    val tablePath = Crf.tagWithTable(ts, emissions, model).collect().toSet
    ts.unpersist() // default-lazy tagWithTable leaves the caller the cache
    assert(tablePath == broadcastPath && tablePath.nonEmpty)
    // the table carries a __bias__ row, but it must NEVER enter the
    // feature join — it fires on every token, a guaranteed maximal hot
    // key; r5 folds it into the broadcast instead. featureRows is the
    // exact left side of tagWithTable's join.
    import org.apache.spark.sql.functions.col
    assert(emissions.filter(col("feature") === "__bias__").count() == 1)
    assert(Crf.featureRows(ts).filter(col("feature") === "__bias__").count() == 0)
  }

  test("trained CRF (non-dictionary weights) survives the round-trip") {
    // real-valued weights from a short perceptron run — exercises
    // doubles that are NOT 0/1, where parquet bit-exactness matters
    def sent(ws: String*): IndexedSeq[Tok] = {
      var off = 0
      ws.map { w => val t = Tok(0, w, off, off + w.length); off += w.length + 1; t }
        .toIndexedSeq
    }
    val data = Seq(
      (Crf.tokenFeatures(sent("merge", "the", "table")), Seq("B-op", "O", "B-obj")),
      (Crf.tokenFeatures(sent("scan", "a", "stream")), Seq("B-op", "O", "B-obj")))
    val model = Crf.train(data, epochs = 3)
    val dir = Files.createTempDirectory("crf_model2").toString
    ModelIO.saveCrf(spark, model, dir)
    val loaded = ModelIO.loadCrf(spark, dir)
    model.emissions.foreach { case (f, w) =>
      assert(loaded.emissions(f).toSeq == w.toSeq, f)
    }
  }

  test("linear model round-trip: sparse storage, exact scores") {
    val w = new Array[Double](RelationScoring.Dims)
    val rnd = new scala.util.Random(2727L)
    (0 until 500).foreach(_ => w(rnd.nextInt(w.length)) = rnd.nextGaussian())
    val model = RelationScoring.LinearModel(w, b = 0.1234567891011)
    val dir = Files.createTempDirectory("lin_model").toString
    ModelIO.saveLinear(spark, model, dir)
    val loaded = ModelIO.loadLinear(spark, dir)
    assert(loaded.b == model.b)
    assert(loaded.w.toSeq == model.w.toSeq)
    val f = RelationScoring.hashFeats(Map("a" -> 1.0, "bb" -> 2.5, "ccc" -> -0.5))
    assert(loaded.score(f) == model.score(f))
  }
}
