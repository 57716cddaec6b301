package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.nlp.TextOps

/** Stage 1 of the KG pipeline: transcripts → sentences → tokens.
  *
  * Replaces nalaf's `NLTKSplitter.split` + `TmVarTokenizer.tokenize`
  * (`preprocessing/spliters.py:23-49`, `tokenizers.py:64-101`), which
  * mutate an in-memory object tree document-by-document, with narrow
  * distributed `flatMap`s: no shuffle is introduced — sentence and token
  * rows inherit the input partitioning by conv_id, and tokens stay nested
  * per sentence so all sentence-local ops (windows, Viterbi, paths)
  * remain map-side.
  */
object Segmentation {

  /** transcripts DF (conv_id, turn_idx, role, text, tool, ts) →
    * typed turns. Column pruning: only the 6 contract columns are read.
    */
  def turns(df: DataFrame): Dataset[Turn] = {
    import df.sparkSession.implicits._
    df.select($"conv_id", $"turn_idx", $"role", $"text", $"tool", $"ts").as[Turn]
  }

  /** Sentence rows; `sent_text` is a trimmed substring of turn text,
    * `sent_start` its char offset (invariant:
    * text.substring(sent_start, sent_start+sent_text.length) == sent_text).
    */
  def sentences(turns: Dataset[Turn]): Dataset[SentenceRow] = {
    import turns.sparkSession.implicits._
    turns.flatMap { t =>
      TextOps.splitSentences(t.text).zipWithIndex.map {
        case ((s, start), idx) => SentenceRow(t.conv_id, t.turn_idx, idx, s, start)
      }
    }
  }

  /** Tokenized sentences with turn-text-relative char offsets; tokenizer ∈
    * {"tmvar", "generic"}.
    */
  def tokenized(turns: Dataset[Turn], tokenizer: String = "tmvar"): Dataset[TokenizedSentence] = {
    import turns.sparkSession.implicits._
    turns.flatMap { t =>
      TextOps.segment(t.text, tokenizer).map { case (idx, start, sent, toks) =>
        TokenizedSentence(t.conv_id, t.turn_idx, idx, start, sent, toks)
      }
    }
  }

  /** Flat token table (one row per token) for SQL-facing consumers and
    * the DuckDB oracle: (conv_id, turn_idx, sent_idx, tid, word, begin, end).
    */
  def tokens(ts: Dataset[TokenizedSentence]): DataFrame = {
    import ts.sparkSession.implicits._
    ts.select($"conv_id", $"turn_idx", $"sent_idx", explode($"tokens").as("t"))
      .select($"conv_id", $"turn_idx", $"sent_idx",
        $"t.tid".as("tid"), $"t.word".as("word"),
        $"t.begin".as("begin"), $"t.end".as("end"))
  }

  /** Re-check of the per-turn byte-equality invariant (BASELINE.json
    * input_hint): reconstructible sentence substrings must match the turn
    * text exactly. Returns rows that VIOLATE the invariant (empty = pass).
    */
  def invariantViolations(turnsDf: Dataset[Turn]): DataFrame = {
    import turnsDf.sparkSession.implicits._
    turnsDf.flatMap { t =>
      TextOps.splitSentences(t.text).collectFirst {
        case (s, start) if t.text.substring(start, start + s.length) != s =>
          (t.conv_id, t.turn_idx, start)
      }
    }.toDF("conv_id", "turn_idx", "sent_start")
  }
}
