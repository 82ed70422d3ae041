package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input validation / quarantine — the 100 TB form of the reference's
  * pydantic constraint surface (stackai-vector-db app/schemas/chunk.py:
  * text min_length=1; start_index ≥ 0; end_index ≥ start_index;
  * page_number ≥ 1; confidence ∈ [0,1]; similarity_threshold ∈ [0,10]
  * per the field_validator at chunk.py:42-54). A serving API rejects a
  * bad request row-by-row; a batch pipeline must instead classify every
  * row and quarantine violators without failing the job — one narrow
  * codegen'd map, no shuffle until the (tiny) violation rollup.
  */
object Validate {

  /** Violation labels for a canonical chunk row
    * (text, start_idx, end_idx, page, confidence, thr) — empty array =
    * valid row. Each rule mirrors one pydantic constraint.
    */
  def violations(text: Column, start: Column, end: Column, page: Column,
                 confidence: Column, thr: Column): Column =
    array_compact(array(
      when(text.isNull || length(text) === 0, "empty_text"),
      when(start < 0, "neg_start"),
      when(end < start, "end_before_start"),
      when(page < 1, "page_lt_1"),
      when(confidence < 0.0 || confidence > 1.0, "confidence_range"),
      when(thr < 0.0 || thr > 10.0, "threshold_range")))

  /** Split a chunk frame (with a `violations` column) into the valid
    * stream and the quarantine stream — both lazy, both scan-aligned.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(size(col("violations")) === 0),
      df.filter(size(col("violations")) > 0))

  /** Driver query: per-rule violation counts over a deterministically
    * perturbed chunk set. The real derived chunks are valid by
    * construction, so the demonstration input injects violations (and
    * synthesizes the metadata fields) with fixed integer arithmetic on
    * (doc_id, chunk_idx) — the perturbation is the test-input
    * generator, the operator under test is the validator. Every row
    * contributes either its violation labels or 'valid_rows'.
    */
  def validateChunks(spark: SparkSession, dir: String): DataFrame = {
    val key = col("doc_id") + col("chunk_idx")
    val perturbed = TextOps.chunks(Tables.documents(spark, dir))
      .select(
        when(key % 17 === 0, lit("")).otherwise(col("chunk_text")).as("text2"),
        when(key % 19 === 0, lit(-1L)).otherwise(col("start_idx")).as("start2"),
        when(key % 13 === 0, col("start_idx") - 1).otherwise(col("end_idx")).as("end2"),
        col("chunk_idx").as("page"),
        (((col("doc_id") * 31 + col("chunk_idx")) % 120) / lit(100.0) - lit(0.05))
          .as("confidence"),
        (((col("doc_id") * 17 + col("chunk_idx")) % 110) / lit(10.0)).as("thr"))
      .withColumn("violations",
        violations(col("text2"), col("start2"), col("end2"),
          col("page"), col("confidence"), col("thr")))
    perturbed
      .select(when(size(col("violations")) === 0, array(lit("valid_rows")))
        .otherwise(col("violations")).as("v"))
      .select(explode(col("v")).as("rule"))
      .groupBy("rule").agg(count(lit(1)).as("n"))
      .orderBy("rule")
  }

  def validateChunksOracleSql: String =
    s"""${TextOps.chunksCteSql},
       |perturbed AS (
       |  SELECT
       |    CASE WHEN (doc_id + chunk_idx) % 17 = 0 THEN '' ELSE chunk_text END AS text2,
       |    CASE WHEN (doc_id + chunk_idx) % 19 = 0 THEN -1 ELSE start_idx END AS start2,
       |    CASE WHEN (doc_id + chunk_idx) % 13 = 0 THEN start_idx - 1 ELSE end_idx END AS end2,
       |    chunk_idx AS page,
       |    ((doc_id*31 + chunk_idx) % 120) / CAST(100.0 AS DOUBLE) - CAST(0.05 AS DOUBLE) AS confidence,
       |    ((doc_id*17 + chunk_idx) % 110) / CAST(10.0 AS DOUBLE) AS thr
       |  FROM chunks),
       |v AS (
       |  SELECT list_filter([
       |    CASE WHEN text2 IS NULL OR length(text2) = 0 THEN 'empty_text' END,
       |    CASE WHEN start2 < 0 THEN 'neg_start' END,
       |    CASE WHEN end2 < start2 THEN 'end_before_start' END,
       |    CASE WHEN page < 1 THEN 'page_lt_1' END,
       |    CASE WHEN confidence < 0.0 OR confidence > 1.0 THEN 'confidence_range' END,
       |    CASE WHEN thr < 0.0 OR thr > 10.0 THEN 'threshold_range' END],
       |    x -> x IS NOT NULL) AS vs
       |  FROM perturbed)
       |SELECT rule, count(*) AS n FROM (
       |  SELECT unnest(CASE WHEN len(vs) = 0 THEN ['valid_rows'] ELSE vs END) AS rule
       |  FROM v) t
       |GROUP BY rule
       |ORDER BY rule""".stripMargin
}
