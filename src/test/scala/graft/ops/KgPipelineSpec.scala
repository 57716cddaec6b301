package graft.ops

import graft.SparkSpec
import graft.model._

/** End-to-end pipeline contracts:
  *  - fused stub route == declarative query route (key sets identical),
  *  - trained linear scorer hits the BASELINE bar (P/R ≥ 0.95 vs gold)
  *    on seeded synthetic transcripts,
  *  - per-turn text byte-equality invariant.
  */
class KgPipelineSpec extends SparkSpec {

  private val SubjClass = "e_svc"
  private val ObjClass = "e_res"
  private val RelType = "r_uses"

  private val subjDict = Map(
    "svc_auth" -> SubjClass, "svc_billing" -> SubjClass,
    "svc_search" -> SubjClass, "job_etl" -> SubjClass,
    "agent_planner" -> SubjClass)
  private val objDict = Map(
    "db_users" -> ObjClass, "db_orders" -> ObjClass, "idx_docs" -> ObjClass,
    "topic_events" -> ObjClass, "cache_main" -> ObjClass)
  private val dict = subjDict ++ objDict

  private def dictTagger: IndexedSeq[Tok] => Seq[(String, Int, Int)] =
    toks => toks.flatMap(t => dict.get(t.word).map(c => (c, t.begin, t.end)))

  test("fused stub pipeline matches declarative query route at sf0.001") {
    import spark.implicits._
    val turns = Segmentation.turns(Transcripts.fromDocuments(spark, "/root/testdata/sf0.001"))
    val fused = KgPipeline.triples(turns,
      KgPipeline.Config("r_op_obj", GazetteerTagger.OpClass, GazetteerTagger.ObjClass,
        window = 0, tokenizer = "tmvar"),
      crfModel = None, gaz = GazetteerTagger.gazetteer, scorer = None)
      .select("conv_id", "key").as[(String, String)].collect().toSet
    val declarative = graft.SparkEntry.queries("kg_triples")(spark, "/root/testdata/sf0.001")
      .select("conv_id", "key").as[(String, String)].collect().toSet
    assert(fused == declarative)
  }

  /** Gold triples of a synthetic conversation: the planted fact of each
    * turn (subject verb object sentence).
    */
  private def goldKeys(conv: Int, nTurns: Int): Set[(String, String)] = {
    (0 until nTurns).flatMap { t =>
      val turn = Transcripts.syntheticTurn(conv, t, seed = 42L)
      val words = turn.text.split("[ .]+")
      val s = words.find(subjDict.contains)
      val o = words.find(objDict.contains)
      for (sv <- s; ov <- o) yield {
        val m1 = Mention(turn.conv_id, t, 0, SubjClass, 0, 0, sv, 1.0, sv)
        val m2 = Mention(turn.conv_id, t, 0, ObjClass, 0, 0, ov, 1.0, ov)
        (turn.conv_id, KgPipeline.tripleKey(RelType, m1, m2))
      }
    }.toSet
  }

  test("trained relation scorer reaches P/R >= 0.95 vs gold (BASELINE metric)") {
    val cfg = KgPipeline.Config(RelType, SubjClass, ObjClass, window = 1, tokenizer = "generic")

    // training data: conversations 0..59. label_edges semantics
    // (data.py:205-213) is part-level: an edge is positive iff the gold
    // relation exists in ITS part (= turn here), i.e. the same-sentence
    // planted fact — cross-turn surface coincidences are negatives.
    val train = (0 until 60).flatMap { c =>
      val turns = (0 until 5).map(t => Transcripts.syntheticTurn(c, t, 42L))
      val gold = goldKeys(c, 5).map(_._2)
      KgPipeline.candidateEdges(f"conv_$c%06d", turns, cfg, dictTagger, withFeatures = true)
        .map(cand => (RelationScoring.hashFeats(cand.feats),
          if (cand.sameSentence && gold.contains(cand.key)) 1 else -1))
    }
    val model = RelationScoring.train(train, epochs = 8)

    // held-out conversations 200..279
    var tp = 0L; var fp = 0L; var fn = 0L
    (200 until 280).foreach { c =>
      val turns = (0 until 5).map(t => Transcripts.syntheticTurn(c, t, 42L))
      val pred = KgPipeline.processConversation(f"conv_$c%06d", turns, cfg,
        dictTagger, Some(model)).map(_.key).toSet
      val gold = goldKeys(c, 5).map(_._2)
      tp += (pred & gold).size
      fp += (pred -- gold).size
      fn += (gold -- pred).size
    }
    val p = tp.toDouble / (tp + fp)
    val r = tp.toDouble / (tp + fn)
    assert(p >= 0.95, s"precision=$p (tp=$tp fp=$fp fn=$fn)")
    assert(r >= 0.95, s"recall=$r (tp=$tp fp=$fp fn=$fn)")
  }

  test("DISTRIBUTED parameter-mixing training reaches P/R >= 0.9 held-out") {
    import spark.implicits._
    val cfg = KgPipeline.Config(RelType, SubjClass, ObjClass, window = 1, tokenizer = "generic")
    val train = (0 until 60).flatMap { c =>
      val turns = (0 until 5).map(t => Transcripts.syntheticTurn(c, t, 42L))
      val gold = goldKeys(c, 5).map(_._2)
      KgPipeline.candidateEdges(f"conv_$c%06d", turns, cfg, dictTagger, withFeatures = true)
        .map { cand =>
          val f = RelationScoring.hashFeats(cand.feats)
          RelationScoring.TrainRow(f.idx, f.value,
            if (cand.sameSentence && gold.contains(cand.key)) 1 else -1)
        }
    }
    val model = RelationScoring.trainDistributed(
      train.toDS().repartition(4), rounds = 4, epochsPerRound = 4)
    var tp = 0L; var fp = 0L; var fn = 0L
    (200 until 260).foreach { c =>
      val turns = (0 until 5).map(t => Transcripts.syntheticTurn(c, t, 42L))
      val pred = KgPipeline.processConversation(f"conv_$c%06d", turns, cfg,
        dictTagger, Some(model)).map(_.key).toSet
      val gold = goldKeys(c, 5).map(_._2)
      tp += (pred & gold).size
      fp += (pred -- gold).size
      fn += (gold -- pred).size
    }
    val p = tp.toDouble / (tp + fp)
    val r = tp.toDouble / (tp + fn)
    assert(p >= 0.9, s"precision=$p (tp=$tp fp=$fp fn=$fn)")
    assert(r >= 0.9, s"recall=$r (tp=$tp fp=$fp fn=$fn)")
  }

  test("fused pipeline pins its shuffle parallelism (AQE-coalesce regression guard)") {
    // the conv_id shuffle is byte-light but the downstream stage is
    // CPU-heavy: size-based AQE coalescing must NOT be able to fold it
    // to one task (measured 13s single-task vs 0.6s at 32 when this
    // regressed). User-specified repartition counts are exempt — assert
    // the plan carries one.
    val turns = Segmentation.turns(Transcripts.fromDocuments(spark, "/root/testdata/sf0.001"))
    val cfg = KgPipeline.Config("r", GazetteerTagger.OpClass, GazetteerTagger.ObjClass,
      window = 0, tokenizer = "tmvar")
    val ds = KgPipeline.triples(turns, cfg, None, GazetteerTagger.gazetteer, None)
    ds.count() // finalize the adaptive plan
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("REPARTITION_BY_NUM"), plan)
  }

  test("kg_eval pushes gold-vocabulary prefilters onto both join inputs (plan guard)") {
    // the exact gold rule is an OR-of-ANDs across both sides (post-join
    // only); its weaker per-side projections must appear as IN filters
    // BELOW the turn-window join so sparse gold vocabularies shrink the
    // join input at scale
    val df = graft.SparkEntry.queries("kg_eval")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(" IN (merge,filter,scan,sort)"), plan.take(4000))
    assert(plan.contains(" IN (table,stream,batch,vector)"), plan.take(4000))
    graft.SparkEntry.clearCaches()
  }

  test("per-turn text survives segmentation byte-identically") {
    val turns = Segmentation.turns(Transcripts.fromDocuments(spark, "/root/testdata/sf0.001"))
    assert(Segmentation.invariantViolations(turns).count() == 0)
    // and every tokenized sentence carries an exact substring of its turn
    val bad = Segmentation.tokenized(turns).filter { s =>
      s.tokens.exists(t =>
        s.sent_text.substring(t.begin - s.sent_start, t.end - s.sent_start) != t.word)
    }
    assert(bad.count() == 0)
  }

  test("scoreEdge == w . hashFeats(features) for every candidate (dual-path guard)") {
    val cfg = KgPipeline.Config(RelType, SubjClass, ObjClass, window = 1, tokenizer = "generic")
    val rng = new scala.util.Random(11)
    val w = Array.fill(RelationScoring.Dims)(rng.nextDouble() - 0.5)
    val model = RelationScoring.LinearModel(w, b = 0.123)
    (0 until 10).foreach { c =>
      val turns = (0 until 5).map(t => Transcripts.syntheticTurn(c, t, 42L))
      val withFeats = KgPipeline.candidateEdges(f"conv_$c%06d", turns, cfg, dictTagger,
        withFeatures = true)
      val withScores = KgPipeline.candidateEdges(f"conv_$c%06d", turns, cfg, dictTagger,
        withFeatures = false, scorer = Some(model))
      assert(withFeats.length == withScores.length && withFeats.nonEmpty)
      withFeats.zip(withScores).foreach { case (f, s) =>
        val viaMap = model.score(RelationScoring.hashFeats(f.feats))
        assert(math.abs(viaMap - s.score) < 1e-9, s"$viaMap vs ${s.score} for ${f.key}")
      }
    }
  }

  test("tmvar fast path == cascade on mixed content") {
    val samples = Seq("plain lowercase words only", "Mixed Case c.2708_2711delTTAG",
      "digits 123abc", "naive caf text", "a, b; c!", "")
    samples.foreach { s =>
      // force the general path by prepending a char that disables the
      // fast path without changing the token stream after dropping it
      val viaCascade = graft.nlp.TextOps.tmvarTokenize("X " + s).drop(1)
      val direct = graft.nlp.TextOps.tmvarTokenize(s)
      assert(viaCascade == direct, s)
    }
  }

  test("fused pipeline with broadcast TRAINED CRF tagger == dictionary route") {
    import spark.implicits._
    val cfg = KgPipeline.Config(RelType, SubjClass, ObjClass, window = 1, tokenizer = "generic")
    // train the CRF on gold BIO labels over synthetic convs 0..39
    val train = (0 until 40).flatMap { c =>
      (0 until 5).flatMap { t =>
        val turn = Transcripts.syntheticTurn(c, t, 42L)
        graft.nlp.TextOps.segment(turn.text, "generic").map { case (_, _, _, toks) =>
          val feats = Crf.tokenFeatures(toks).map(fs => "__bias__" :: fs)
          val labels: Seq[String] = toks.map { tk =>
            subjDict.get(tk.word).map("B-" + _)
              .orElse(objDict.get(tk.word).map("B-" + _)).getOrElse("O")
          }
          (feats, labels)
        }
      }
    }
    val crf = Crf.train(train, epochs = 5)
    // held-out conversations 300..329: CRF-tagged triples == dict-tagged
    val turns = (300 until 330).flatMap { c =>
      (0 until 5).map(t => Transcripts.syntheticTurn(c, t, 42L))
    }.toDS()
    val viaCrf = KgPipeline.triples(turns, cfg, Some(crf), Map.empty, None)
      .select("conv_id", "key").as[(String, String)].collect().toSet
    val viaDict = KgPipeline.triples(turns, cfg, None, dict, None)
      .select("conv_id", "key").as[(String, String)].collect().toSet
    assert(viaCrf == viaDict)
    assert(viaCrf.nonEmpty)
  }
}
