package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Tok

class CrossValidationSpec extends AnyFunSuite {

  private val subjDict = Map(
    "svc_auth" -> "e_svc", "svc_billing" -> "e_svc", "svc_search" -> "e_svc",
    "job_etl" -> "e_svc", "agent_planner" -> "e_svc")
  private val objDict = Map(
    "db_users" -> "e_res", "db_orders" -> "e_res", "idx_docs" -> "e_res",
    "topic_events" -> "e_res", "cache_main" -> "e_res")
  private val dict = subjDict ++ objDict
  private val tagger: IndexedSeq[Tok] => Seq[(String, Int, Int)] =
    toks => toks.flatMap(t => dict.get(t.word).map(c => (c, t.begin, t.end)))

  test("5-fold CV on synthetic conversations: merged F1 >= 0.9, folds cover all docs") {
    val cfg = KgPipeline.Config("r_uses", "e_svc", "e_res", window = 1, tokenizer = "generic")
    val convs = (0 until 50).map { c =>
      f"conv_$c%06d" -> (0 until 5).map(t => Transcripts.syntheticTurn(c, t, 42L))
    }.toMap
    val gold = convs.map { case (key, turns) =>
      key -> turns.flatMap { turn =>
        val words = turn.text.split("[ .]+")
        for {
          s <- words.find(subjDict.contains)
          o <- words.find(objDict.contains)
        } yield s"r_uses|e_res|$o|e_svc|$s"
      }.toSet
    }
    val result = CrossValidation.run(convs, gold, cfg, tagger, k = 5, epochs = 5)
    assert(result.folds.size == 5)
    // every fold evaluated some conversations (counts sum > 0)
    assert(result.folds.forall(f => f.counts.tp + f.counts.fn > 0))
    assert(result.prf.fMeasure >= 0.9, result)
    // deterministic
    val again = CrossValidation.run(convs, gold, cfg, tagger, k = 5, epochs = 5)
    assert(again.merged == result.merged)
  }
}
