package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.nlp.{Hashes, LangId}

/** Text-analysis operators for training-data curation: quality scoring,
  * language identification, token statistics, document fingerprinting.
  * All narrow (no shuffle) except the explicit aggregations.
  */
object TextAnalysis {

  /** Integer-valued quality metrics (bit-exact across engines; see
    * graft.nlp.LangId.quality). Pure column expressions — fully codegen'd
    * and DuckDB-oracle-able.
    */
  def quality(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    docs.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      size(words).cast("bigint").as("n_words"),
      size(array_distinct(words)).cast("bigint").as("n_distinct"),
      aggregate(transform(words, w => length(w)), lit(0),
        (acc, x) => greatest(acc, x)).cast("bigint").as("max_word_len"),
      size(filter(words, w => w.isin("the", "a"))).cast("bigint").as("stopword_count"),
      (size(array_distinct(words)).cast("double") / size(words)).as("distinct_ratio")
    )
  }

  /** Language-ID via the deterministic stopword/script heuristic
    * (graft.nlp.LangId) — typed map, ScalaTest-covered; rows-only driver
    * check (not SQL-expressible).
    */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, LangId.detect(t)) }
      .toDF("doc_id", "lang_pred")
  }

  /** BPE-ish token statistics: alpha runs, digit runs, single
    * non-alphanumerics (regexp-based, oracle-able).
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
    docs.select(
      col("doc_id"),
      size(toks).cast("bigint").as("n_tokens"),
      size(array_distinct(toks)).cast("bigint").as("n_distinct_tokens"))
  }

  /** Rolling-hash document fingerprint (base-257 poly mod 2^61-1) via
    * the native codegen expression graft.functions.TextFingerprint —
    * stays in WholeStageCodegen, no row deserialization. Bit-identical
    * to graft.nlp.Hashes.fingerprint (tested); rows-only driver check
    * plus ScalaTest goldens.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"), expr("graft_fingerprint(text)").as("fingerprint"))
  }
}
