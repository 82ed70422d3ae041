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

  /** Document-level constraints (app/schemas/document.py:1-168 +
    * app/core/config.py:53-54): title required, non-whitespace, ≤ 255;
    * metadata string bounds (author ≤ 255, source ≤ 500, language ≤ 50,
    * category ≤ 100); word_count ≥ 0.
    */
  def documentViolations(title: Column, author: Column, source: Column,
                         language: Column, category: Column,
                         wordCount: Column): Column =
    array_compact(array(
      when(title.isNull || length(trim(title)) === 0, "empty_title"),
      when(length(title) > 255, "title_too_long"),
      when(length(author) > 255, "author_too_long"),
      when(length(source) > 500, "source_too_long"),
      when(length(language) > 50, "language_too_long"),
      when(length(category) > 100, "category_too_long"),
      when(wordCount < 0, "neg_word_count")))

  /** Library-level constraints (app/schemas/library.py + config.py:53):
    * name required, non-whitespace, ≤ 255; description ≤ 1000;
    * metadata bounds (version ≤ 50, workflow ≤ 100, created_by ≤ 255).
    */
  def libraryViolations(name: Column, description: Column, version: Column,
                        workflow: Column, createdBy: Column): Column =
    array_compact(array(
      when(name.isNull || length(trim(name)) === 0, "empty_name"),
      when(length(name) > 255, "name_too_long"),
      when(length(description) > 1000, "description_too_long"),
      when(length(version) > 50, "version_too_long"),
      when(length(workflow) > 100, "workflow_too_long"),
      when(length(createdBy) > 255, "created_by_too_long")))

  /** Rule-count rollup shared by the three validate_* driver queries:
    * every row contributes its violation labels or 'valid_rows'.
    */
  private def ruleCounts(df: DataFrame): DataFrame =
    df.select(when(size(col("violations")) === 0, array(lit("valid_rows")))
        .otherwise(col("violations")).as("v"))
      .select(explode(col("v")).as("rule"))
      .groupBy("rule").agg(count(lit(1)).as("n"))
      .orderBy("rule")

  /** Driver query: document-entity validation — same
    * perturb-then-quarantine shape as validateChunks, one level up the
    * entity hierarchy. Title/author/etc. are synthesized from the
    * documents table with fixed modular arithmetic on doc_id.
    */
  def validateDocuments(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val perturbed = Tables.documents(spark, dir)
      .select(
        when(id % 11 === 0, lit("   "))
          .when(id % 13 === 0, repeat(lit("t"), 300))
          .otherwise(substring(col("text"), 1, 40)).as("title"),
        when(id % 17 === 0, repeat(lit("a"), 256))
          .otherwise(concat(lit("author_"), id % 7)).as("author"),
        when(id % 19 === 0, repeat(lit("s"), 501)).otherwise(col("source")).as("src"),
        when(id % 23 === 0, repeat(lit("l"), 51)).otherwise(col("lang")).as("language"),
        when(id % 29 === 0, repeat(lit("c"), 101)).otherwise(lit("general")).as("category"),
        when(id % 31 === 0, lit(-1L)).otherwise(col("n_chars")).as("word_count"))
      .withColumn("violations",
        documentViolations(col("title"), col("author"), col("src"),
          col("language"), col("category"), col("word_count")))
    ruleCounts(perturbed)
  }

  def validateDocumentsOracleSql: String =
    """WITH perturbed AS (
      |  SELECT
      |    CASE WHEN doc_id % 11 = 0 THEN '   '
      |         WHEN doc_id % 13 = 0 THEN repeat('t', 300)
      |         ELSE substr(text, 1, 40) END AS title,
      |    CASE WHEN doc_id % 17 = 0 THEN repeat('a', 256)
      |         ELSE 'author_' || (doc_id % 7) END AS author,
      |    CASE WHEN doc_id % 19 = 0 THEN repeat('s', 501) ELSE source END AS src,
      |    CASE WHEN doc_id % 23 = 0 THEN repeat('l', 51) ELSE lang END AS language,
      |    CASE WHEN doc_id % 29 = 0 THEN repeat('c', 101) ELSE 'general' END AS category,
      |    CASE WHEN doc_id % 31 = 0 THEN -1 ELSE n_chars END AS word_count
      |  FROM documents),
      |v AS (
      |  SELECT list_filter([
      |    CASE WHEN title IS NULL OR length(trim(title)) = 0 THEN 'empty_title' END,
      |    CASE WHEN length(title) > 255 THEN 'title_too_long' END,
      |    CASE WHEN length(author) > 255 THEN 'author_too_long' END,
      |    CASE WHEN length(src) > 500 THEN 'source_too_long' END,
      |    CASE WHEN length(language) > 50 THEN 'language_too_long' END,
      |    CASE WHEN length(category) > 100 THEN 'category_too_long' END,
      |    CASE WHEN word_count < 0 THEN 'neg_word_count' END],
      |    x -> x IS NOT NULL) AS vs
      |  FROM perturbed)
      |SELECT rule, count(*) AS n FROM (
      |  SELECT unnest(CASE WHEN len(vs) = 0 THEN ['valid_rows'] ELSE vs END) AS rule
      |  FROM v) t
      |GROUP BY rule ORDER BY rule""".stripMargin

  /** Driver query: library-entity validation over the 20 `source`
    * libraries (source plays Library — SURVEY §3); name/description/
    * metadata synthesized per library from its numeric suffix.
    */
  def validateLibraries(spark: SparkSession, dir: String): DataFrame = {
    val ln = substring(col("source"), 4, 10).cast("int")
    val perturbed = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .select(col("source"), ln.as("ln"))
      .select(
        when(col("ln") % 5 === 0, lit("  "))
          .when(col("ln") % 5 === 1, repeat(lit("n"), 256))
          .otherwise(col("source")).as("name"),
        when(col("ln") % 4 === 2, repeat(lit("d"), 1001))
          .otherwise(concat(lit("library "), col("source"))).as("description"),
        when(col("ln") % 3 === 0, repeat(lit("v"), 51)).otherwise(lit("1.0.0")).as("version"),
        when(col("ln") % 7 === 3, repeat(lit("w"), 101)).otherwise(lit("ingest")).as("workflow"),
        when(col("ln") % 6 === 5, repeat(lit("c"), 256)).otherwise(lit("ops")).as("created_by"))
      .withColumn("violations",
        libraryViolations(col("name"), col("description"), col("version"),
          col("workflow"), col("created_by")))
    ruleCounts(perturbed)
  }

  def validateLibrariesOracleSql: String =
    """WITH libs AS (
      |  SELECT source, CAST(substr(source, 4) AS INT) AS ln
      |  FROM documents GROUP BY source),
      |perturbed AS (
      |  SELECT
      |    CASE WHEN ln % 5 = 0 THEN '  '
      |         WHEN ln % 5 = 1 THEN repeat('n', 256)
      |         ELSE source END AS name,
      |    CASE WHEN ln % 4 = 2 THEN repeat('d', 1001)
      |         ELSE 'library ' || source END AS description,
      |    CASE WHEN ln % 3 = 0 THEN repeat('v', 51) ELSE '1.0.0' END AS version,
      |    CASE WHEN ln % 7 = 3 THEN repeat('w', 101) ELSE 'ingest' END AS workflow,
      |    CASE WHEN ln % 6 = 5 THEN repeat('c', 256) ELSE 'ops' END AS created_by
      |  FROM libs),
      |v AS (
      |  SELECT list_filter([
      |    CASE WHEN name IS NULL OR length(trim(name)) = 0 THEN 'empty_name' END,
      |    CASE WHEN length(name) > 255 THEN 'name_too_long' END,
      |    CASE WHEN length(description) > 1000 THEN 'description_too_long' END,
      |    CASE WHEN length(version) > 50 THEN 'version_too_long' END,
      |    CASE WHEN length(workflow) > 100 THEN 'workflow_too_long' END,
      |    CASE WHEN length(created_by) > 255 THEN 'created_by_too_long' END],
      |    x -> x IS NOT NULL) AS vs
      |  FROM perturbed)
      |SELECT rule, count(*) AS n FROM (
      |  SELECT unnest(CASE WHEN len(vs) = 0 THEN ['valid_rows'] ELSE vs END) AS rule
      |  FROM v) t
      |GROUP BY rule ORDER BY rule""".stripMargin

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

  /** Embedding-vector constraints — the vector-side twin of the
    * chunk/document/library validators (the reference validates
    * embedding shape at the API boundary, app/schemas/chunk.py
    * embedding field + the index services' dimension checks; a batch
    * store must instead quarantine): non-empty, expected dimension,
    * all components finite, not the zero vector (a zero norm breaks
    * every cosine consumer downstream).
    */
  def embeddingViolations(vec: Column, expectedDim: Int): Column =
    array_compact(array(
      when(vec.isNull || size(vec) === 0, "empty_vec"),
      when(size(vec) > 0 && size(vec) =!= expectedDim, "dim_mismatch"),
      when(exists(vec, x => isnan(x) ||
        x === lit(Float.PositiveInfinity) ||
        x === lit(Float.NegativeInfinity)), "non_finite"),
      when(size(vec) > 0 && !exists(vec, x => x =!= lit(0.0f)), "zero_vec")))

  /** Driver query: embedding validation — same perturb-then-quarantine
    * shape as the other three, over the embeddings table. The
    * when-chain makes the perturbation classes disjoint (first match
    * wins): % 23 empty, % 17 truncated to 32 dims, % 19 a NaN in the
    * last slot, % 13 the zero vector.
    */
  def validateEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val id = col("vec_id")
    val v = col("embedding")
    val perturbed = Tables.embeddings(spark, dir)
      .select(
        when(id % 23 === 0, array().cast("array<float>"))
          .when(id % 17 === 0, slice(v, 1, 32))
          .when(id % 19 === 0,
            concat(slice(v, 1, 63), array(lit(Double.NaN).cast("float"))))
          .when(id % 13 === 0, transform(v, _ => lit(0.0f)))
          .otherwise(v).as("vec2"))
      .withColumn("violations", embeddingViolations(col("vec2"), 64))
    ruleCounts(perturbed)
  }

  def validateEmbeddingsOracleSql: String =
    """WITH p AS (
      |  SELECT
      |    CASE WHEN vec_id % 23 = 0 THEN CAST([] AS FLOAT[])
      |         WHEN vec_id % 17 = 0 THEN embedding[1:32]
      |         WHEN vec_id % 19 = 0 THEN list_append(embedding[1:63], CAST('nan' AS FLOAT))
      |         WHEN vec_id % 13 = 0 THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
      |         ELSE embedding END AS v
      |  FROM embeddings),
      |r AS (
      |  SELECT list_filter([
      |    CASE WHEN v IS NULL OR len(v) = 0 THEN 'empty_vec' END,
      |    CASE WHEN len(v) > 0 AND len(v) <> 64 THEN 'dim_mismatch' END,
      |    CASE WHEN len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0 THEN 'non_finite' END,
      |    CASE WHEN len(v) > 0 AND len(list_filter(v, x -> x <> 0)) = 0 THEN 'zero_vec' END],
      |    x -> x IS NOT NULL) AS vs
      |  FROM p)
      |SELECT rule, count(*) AS n FROM (
      |  SELECT unnest(CASE WHEN len(vs) = 0 THEN ['valid_rows'] ELSE vs END) AS rule
      |  FROM r) t
      |GROUP BY rule ORDER BY rule""".stripMargin
}
