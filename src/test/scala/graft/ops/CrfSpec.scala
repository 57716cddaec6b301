package graft.ops

import graft.SparkSpec
import graft.model._
import graft.nlp.TextOps

/** CRF scorer tests: broadcast-Viterbi tagging semantics, forward-backward
  * marginal sanity, and end-to-end perceptron training on seeded synthetic
  * transcripts (the reference leaves its CRF tests TODO —
  * tests/learning/test_crfsuite.py — so these are our own contracts).
  */
class CrfSpec extends SparkSpec {

  private val gaz = GazetteerTagger.gazetteer

  test("dictionary model reproduces exact gazetteer tagging") {
    import spark.implicits._
    val text = "please merge the table then filter the stream. sort a vector."
    val turns = Seq(Turn("c0", 0, "user", text, None,
      new java.sql.Timestamp(0L))).toDS()
    val ts = Segmentation.tokenized(turns)
    val viaDict = GazetteerTagger.tag(ts).collect().toSet
    val viaCrf = Crf.tag(ts, Crf.dictionaryModel(gaz)).collect()
      .map(m => m.copy(confidence = 1.0)).toSet
    assert(viaCrf == viaDict)
    assert(viaCrf.nonEmpty)
  }

  test("marginals are a distribution per token") {
    val m = Crf.dictionaryModel(gaz)
    val toks = TextOps.withOffsets("merge the table", TextOps.tmvarTokenize("merge the table"))
    val feats = Crf.tokenFeatures(toks.toIndexedSeq).map(fs => "__bias__" :: fs)
    val marg = Crf.marginals(m, feats)
    marg.foreach { row =>
      assert(math.abs(row.sum - 1.0) < 1e-9)
      row.foreach(p => assert(p >= -1e-12 && p <= 1 + 1e-12))
    }
  }

  /** Build gold-labeled sentences from synthetic transcripts: tokens that
    * are planted subject/object surface forms get B- labels.
    */
  private def goldData(convs: Range): Seq[(IndexedSeq[List[String]], Seq[String])] = {
    val subj = Set("svc_auth", "svc_billing", "svc_search", "job_etl", "agent_planner")
    val obj = Set("db_users", "db_orders", "idx_docs", "topic_events", "cache_main")
    convs.flatMap { c =>
      (0 until 4).flatMap { t =>
        val turn = Transcripts.syntheticTurn(c, t, seed = 42L)
        TextOps.segment(turn.text, "generic").map { case (_, _, _, toks) =>
          val feats = Crf.tokenFeatures(toks).map(fs => "__bias__" :: fs)
          val labels = toks.map { tk =>
            if (subj.contains(tk.word)) "B-svc"
            else if (obj.contains(tk.word)) "B-res"
            else "O"
          }
          (feats, labels: Seq[String])
        }
      }
    }
  }

  test("perceptron training learns the synthetic NER task (F1 > 0.95)") {
    val train = goldData(0 until 40)
    val test = goldData(100 until 120)
    val model = Crf.train(train, epochs = 5)
    var tp = 0; var fp = 0; var fn = 0
    test.foreach { case (feats, gold) =>
      val pred = Crf.viterbi(model, feats)
      pred.zip(gold).foreach {
        case (p, g) if p == g && g != "O" => tp += 1
        case (p, g) if p != g && p != "O" => fp += 1
        case (p, g) if p != g && g != "O" => fn += 1
        case _ =>
      }
    }
    val prec = tp.toDouble / (tp + fp)
    val rec = tp.toDouble / (tp + fn)
    val f1 = 2 * prec * rec / (prec + rec)
    assert(f1 > 0.95, s"f1=$f1 tp=$tp fp=$fp fn=$fn")
  }

  test("DISTRIBUTED parameter-mixing CRF training learns the task (F1 > 0.9)") {
    import spark.implicits._
    val train = goldData(0 until 40)
      .map { case (f, l) => Crf.TaggedSentence(f.map(_.toSeq), l) }
    val test = goldData(100 until 120)
    val model = Crf.trainDistributed(train.toDS().repartition(4),
      rounds = 3, epochsPerRound = 3)
    var tp = 0; var fp = 0; var fn = 0
    test.foreach { case (feats, gold) =>
      val pred = Crf.viterbi(model, feats)
      pred.zip(gold).foreach {
        case (p, g) if p == g && g != "O" => tp += 1
        case (p, g) if p != g && p != "O" => fp += 1
        case (p, g) if p != g && g != "O" => fn += 1
        case _ =>
      }
    }
    val prec = tp.toDouble / (tp + fp)
    val rec = tp.toDouble / (tp + fn)
    val f1 = 2 * prec * rec / (prec + rec)
    assert(f1 > 0.9, s"f1=$f1 tp=$tp fp=$fp fn=$fn")
  }

  test("training is deterministic under a fixed seed") {
    val data = goldData(0 until 10)
    val m1 = Crf.train(data, epochs = 3, seed = 7L)
    val m2 = Crf.train(data, epochs = 3, seed = 7L)
    assert(m1.labels == m2.labels)
    assert(m1.emissions.keySet == m2.emissions.keySet)
    m1.emissions.foreach { case (k, v) =>
      assert(v.sameElements(m2.emissions(k)))
    }
  }
}
