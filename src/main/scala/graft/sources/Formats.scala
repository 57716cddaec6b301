package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-format readers/writers (SURVEY §2.1/§2.2) re-expressed as
  * DataFrame scans/sinks. The reference's readers build the in-memory
  * object tree one file at a time (`nalaf/utils/readers.py`); here every
  * format lands in the same flat `docs(doc_id, part_id, text)` /
  * `anns(doc_id, part_id, class_id, begin, text)` shape so the whole
  * pipeline downstream is format-agnostic.
  */
object Formats {

  // ---------------------------------------------------------------------
  // Readers
  // ---------------------------------------------------------------------

  /** `StringReader` (`readers.py:120-144`): one string → 1 doc / 1 part.
    * Test-fixture constructor.
    */
  def fromStrings(spark: SparkSession, texts: Seq[String]): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, "p1", t) }
      .toDF("doc_id", "part_id", "text")
  }

  /** `TextFilesReader` (`readers.py:147-189`): text files → one doc per
    * file, blank-line-separated paragraphs → parts. `wholetext` scan +
    * split + posexplode; doc id = file basename like the reference
    * (basename sans extension).
    */
  def fromTextFiles(spark: SparkSession, dir: String): DataFrame = {
    spark.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("path"), col("value"))
      .select(
        regexp_replace(element_at(split(col("path"), "/"), -1), "\\.txt$", "").as("doc_id"),
        posexplode(split(col("value"), "\n\\s*\n")))
      .select(col("doc_id"),
        concat(lit("p"), (col("pos") + 1).cast("string")).as("part_id"),
        col("col").as("text"))
  }

  /** `SETHReader`-style TSV (`readers.py:257-283`):
    * `pmid \t title \t abstract` → two parts per doc.
    */
  def fromTsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("sep", "\t").csv(path)
      .toDF("doc_id", "title", "abstract")
    raw.select(col("doc_id"), lit("title").as("part_id"), col("title").as("text"))
      .unionByName(raw.select(col("doc_id"), lit("abstract").as("part_id"),
        col("abstract").as("text")))
  }

  /** PubTator reader (`TmVarReader`, `readers.py:440-509`): line blocks
    * `pid|t|title`, `pid|a|abstract`, and annotation rows
    * `pid \t begin \t end \t text \t class`. Abstract entity offsets are
    * title-relative after `len(title)+1` like the reference's split.
    * Returns (docs, anns).
    */
  def fromPubTator(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val lines = spark.read.text(path).filter(length(col("value")) > 0)
    val tit = lines.filter(col("value").rlike("^[^\\t|]+\\|t\\|"))
      .select(split(col("value"), "\\|", 3).as("p"))
      .select(col("p").getItem(0).as("doc_id"), col("p").getItem(2).as("title"))
    val abs = lines.filter(col("value").rlike("^[^\\t|]+\\|a\\|"))
      .select(split(col("value"), "\\|", 3).as("p"))
      .select(col("p").getItem(0).as("doc_id"), col("p").getItem(2).as("abstract"))
    val docs = tit.join(abs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat_ws(" ", col("title"), col("abstract")).as("text"),
        length(col("title")).as("title_len"))
    val anns = lines.filter(col("value").contains("\t"))
      .select(split(col("value"), "\t").as("p"))
      .filter(size(col("p")) >= 5)
      .select(col("p").getItem(0).as("doc_id"),
        col("p").getItem(1).cast("int").as("begin"),
        col("p").getItem(2).cast("int").as("end"),
        col("p").getItem(3).as("text"),
        col("p").getItem(4).as("class_id"))
    (docs.drop("title_len"), anns)
  }

  /** Gold-annotation reader equivalent to `AnnJsonAnnotationReader`
    * (`utils/annotation_readers.py:35-205`): JSON docs with an entities
    * array; drops documents not marked complete; VALIDATES offsets
    * (entity text must equal the document substring,
    * `data.py:297-309`) — violations are side-output, not mutated away.
    * Returns (valid annotations, violations).
    */
  def goldFromJson(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read.json(path)
    val exploded = raw.filter(col("anncomplete"))
      .select(col("doc_id"), col("text"), explode(col("entities")).as("e"))
      .select(col("doc_id"), col("text"),
        col("e.class_id").as("class_id"),
        col("e.offset").cast("int").as("begin"),
        col("e.text").as("ann_text"))
      .withColumn("observed",
        expr("substring(text, begin + 1, length(ann_text))"))
    val valid = exploded.filter(col("observed") === col("ann_text"))
      .select(col("doc_id"), col("class_id"), col("begin"), col("ann_text").as("text"))
    val violations = exploded.filter(col("observed") =!= col("ann_text"))
      .select(col("doc_id"), col("class_id"), col("begin"),
        col("ann_text").as("expected"), col("observed"))
    (valid, violations)
  }

  /** Multi-annotator merge (`AnnJsonMergerAnnotationReader`,
    * `utils/annotation_readers.py:208-330`) re-expressed relationally:
    * overlap-join the two annotators' mention sets (same doc + class,
    * char ranges intersect — Entity 'exact_or_overlapping' equality,
    * `data.py:1923-1941`), resolve each overlap by strategy
    * ('shortest' | 'longest' | 'priority' = left annotator wins), then
    *  - intersection: resolved overlaps only,
    *  - union: resolved overlaps + both sides' non-overlapping rest.
    * Ties and the reference's greedy index bookkeeping are replaced by
    * deterministic ranking (first overlap by begin); the reference
    * itself flags this reader as not thoroughly tested.
    * Mention schema: (doc_id, class_id, begin, text).
    */
  def mergeAnnotators(a: DataFrame, b: DataFrame, strategy: String = "union",
                      entityStrategy: String = "shortest"): DataFrame = {
    require(Set("union", "intersection")(strategy))
    require(Set("shortest", "longest", "priority")(entityStrategy))
    val keyCols = Seq("doc_id", "class_id", "begin", "text")
    val l = a.select(keyCols.map(col): _*)
      .withColumn("end", col("begin") + length(col("text")))
    val r = b.select(keyCols.map(col): _*).toDF(keyCols.map(_ + "_r"): _*)
      .withColumn("end_r", col("begin_r") + length(col("text_r")))
    val overlapped = l.join(r,
      col("doc_id") === col("doc_id_r") && col("class_id") === col("class_id_r") &&
        col("begin") < col("end_r") && col("end") > col("begin_r"))
    // one resolution per left mention: its first overlapping partner
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "class_id", "begin", "text")
      .orderBy(col("begin_r"), col("text_r"))
    val resolved = overlapped.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("pick_left", entityStrategy match {
        case "priority" => lit(true)
        case "shortest" => length(col("text")) <= length(col("text_r"))
        case "longest"  => length(col("text")) >= length(col("text_r"))
      })
      .select(col("doc_id"), col("class_id"),
        when(col("pick_left"), col("begin")).otherwise(col("begin_r")).as("begin"),
        when(col("pick_left"), col("text")).otherwise(col("text_r")).as("text"))
      .distinct()
    if (strategy == "intersection") resolved
    else {
      val lOnly = l.join(r,
        col("doc_id") === col("doc_id_r") && col("class_id") === col("class_id_r") &&
          col("begin") < col("end_r") && col("end") > col("begin_r"), "left_anti")
        .select(keyCols.map(col): _*)
      val rOnly = r.join(l,
        col("doc_id") === col("doc_id_r") && col("class_id") === col("class_id_r") &&
          col("begin") < col("end_r") && col("end") > col("begin_r"), "left_anti")
        .select(col("doc_id_r").as("doc_id"), col("class_id_r").as("class_id"),
          col("begin_r").as("begin"), col("text_r").as("text"))
      resolved.unionByName(lOnly).unionByName(rOnly).distinct()
    }
  }

  // ---------------------------------------------------------------------
  // Writers
  // ---------------------------------------------------------------------

  /** `PubTatorFormat` writer (`utils/writers.py:203-224`): docs + anns →
    * PubTator text blocks (one string per doc, ready for write.text).
    */
  def toPubTator(docs: DataFrame, anns: DataFrame): DataFrame = {
    val annLines = anns.select(col("doc_id"),
        concat_ws("\t", col("doc_id"), col("begin"), col("end"),
          col("text"), col("class_id")).as("line"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("line"))).as("ann_lines"))
    docs.join(annLines, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat(
          col("doc_id"), lit("|t|"), col("text"), lit("\n"),
          when(col("ann_lines").isNotNull, concat_ws("\n", col("ann_lines")))
            .otherwise(lit(""))).as("value"))
  }

  /** `TagTogFormat`-style JSON sink (`writers.py:227-439`): mentions with
    * confidence ≥ threshold, one JSON document per doc_id.
    */
  def toAnnJson(mentions: DataFrame, threshold: Double): DataFrame = {
    mentions.filter(col("confidence") >= threshold)
      .groupBy(col("conv_id"))
      .agg(collect_list(struct(col("class_id"), col("begin"), col("end"),
        col("text"), col("confidence"))).as("entities"))
      .select(col("conv_id"), to_json(struct(col("conv_id"), col("entities"))).as("json"))
  }
}
