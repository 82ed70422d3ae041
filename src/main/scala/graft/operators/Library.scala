package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Library-level surface: the reference's stats/recommendation endpoints
  * re-expressed over the documents corpus (`source` plays Library —
  * SURVEY §3).
  */
object Library {

  /** A9: index-type heuristic per library, mirroring
    * stackai-vector-db app/indexes/manager.py:40-64
    * (recommend_index_type with accuracy_priority=true).
    */
  def indexRecommend(spark: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_vectors"))
      .withColumn("dim", lit(dim))
      .withColumn("recommended",
        when(col("n_vectors") < 1000, "linear")
          .when(col("dim") <= 20 && col("n_vectors") < 50000, "kdtree")
          .when(col("n_vectors") >= 10000 || col("dim") > 50, "ivf")
          .when(col("dim") <= 20, "kdtree")
          .otherwise("linear"))
      .orderBy("source")
  }

  def indexRecommendOracleSql(dim: Int = 64): String =
    s"""SELECT source, count(*) AS n_vectors, $dim AS dim,
       |  CASE WHEN count(*) < 1000 THEN 'linear'
       |       WHEN $dim <= 20 AND count(*) < 50000 THEN 'kdtree'
       |       WHEN count(*) >= 10000 OR $dim > 50 THEN 'ivf'
       |       WHEN $dim <= 20 THEN 'kdtree'
       |       ELSE 'linear' END AS recommended
       |FROM documents
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** A10: per-library corpus stats (the GET /libraries stats surface). */
  def libraryStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("source")
  }

  def libraryStatsOracleSql: String =
    """SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars, min(n_chars) AS min_chars,
      |  max(n_chars) AS max_chars
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** A16: per-library memory-usage estimate for the RECOMMENDED index —
    * the reference's get_memory_usage/get_stats monitoring surface
    * (app/indexes/linear.py:76-112, kdtree.py:177-192, ivf.py:226-242,
    * manager.py:237-250). Byte accounting mirrors the reference:
    * float64 vectors (n·dim·8), kd-tree node overhead 64 B/node, IVF
    * centroid table k·dim·8 + 64 B/inverted-list with
    * k = max(1, min(1000, ⌊√(n/2)⌋)) (ivf.py:42-52); query_complexity
    * carries each algorithm's documented complexity string. Pure
    * arithmetic over the A9 rollup — one shuffle, broadcast-free.
    */
  def indexMemoryStats(spark: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    val n = col("n_vectors")
    val k = greatest(lit(1L), least(lit(1000L), floor(sqrt(n / lit(2.0)))))
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_vectors"))
      .withColumn("algorithm",
        explode(array(lit("ivf"), lit("kdtree"), lit("linear"))))
      .withColumn("vectors_bytes", n * dim * 8L)
      .withColumn("overhead_bytes",
        when(col("algorithm") === "kdtree", n * 64L)
          .when(col("algorithm") === "ivf", k * dim * 8L + k * 64L)
          .otherwise(lit(0L)))
      .withColumn("total_bytes", col("vectors_bytes") + col("overhead_bytes"))
      .withColumn("query_complexity",
        when(col("algorithm") === "linear", "O(N * D)")
          .when(col("algorithm") === "kdtree", "O(log N) average, O(N) worst case")
          .otherwise("O(P * M + k)"))
      .orderBy("source", "algorithm")
  }

  def indexMemoryStatsOracleSql(dim: Int = 64): String =
    s"""WITH r AS (
       |  SELECT source, count(*) AS n_vectors FROM documents GROUP BY source),
       |m AS (
       |  SELECT r.*, t.algorithm,
       |    greatest(1, least(1000, CAST(floor(sqrt(n_vectors/2.0)) AS BIGINT))) AS k
       |  FROM r CROSS JOIN (VALUES ('ivf'), ('kdtree'), ('linear')) t(algorithm))
       |SELECT source, n_vectors, algorithm,
       |  CAST(n_vectors * $dim * 8 AS BIGINT) AS vectors_bytes,
       |  CAST(CASE WHEN algorithm = 'kdtree' THEN n_vectors * 64
       |            WHEN algorithm = 'ivf' THEN k * $dim * 8 + k * 64
       |            ELSE 0 END AS BIGINT) AS overhead_bytes,
       |  CAST(n_vectors * $dim * 8 +
       |       CASE WHEN algorithm = 'kdtree' THEN n_vectors * 64
       |            WHEN algorithm = 'ivf' THEN k * $dim * 8 + k * 64
       |            ELSE 0 END AS BIGINT) AS total_bytes,
       |  CASE WHEN algorithm = 'linear' THEN 'O(N * D)'
       |       WHEN algorithm = 'kdtree' THEN 'O(log N) average, O(N) worst case'
       |       ELSE 'O(P * M + k)' END AS query_complexity
       |FROM m ORDER BY source, algorithm""".stripMargin

  /** A10b: library-level pagination — the reference lists libraries
    * sorted by name.casefold() (app/repositories/in_memory/
    * library_repository.py:21-26) then slices [offset, offset+limit).
    * lower(source) plays casefold (identical on this namespace); the
    * page carries each library's doc count.
    */
  def libraryPagination(spark: SparkSession, dir: String,
                        limit: Int = 8, offset: Int = 5): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs"), lower(col("source")).as("name_lower"))
      .orderBy(col("name_lower"))
      .offset(offset)
      .limit(limit)

  def libraryPaginationOracleSql(limit: Int = 8, offset: Int = 5): String =
    s"""SELECT source, count(*) AS n_docs, lower(source) AS name_lower
       |FROM documents GROUP BY source
       |ORDER BY name_lower LIMIT $limit OFFSET $offset""".stripMargin

  /** Libraries "deleted" by the cascade-delete query (a fixed tombstone
    * set so the oracle is deterministic).
    */
  val DeletedLibraries: Seq[String] = Seq("src3", "src7")

  /** Cascade delete (library_service → delete_documents_by_library →
    * delete_chunks_by_library): removing a library removes its documents
    * and, transitively, their chunks. Spark-first this is an ANTI-JOIN
    * against the tombstone set — the doc side never collects, the
    * tombstones broadcast, and the output is the surviving corpus stats
    * per library. At 100 TB this is exactly how a cascade materializes:
    * one broadcast anti-join per child table, no point deletes.
    */
  def cascadeDelete(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val deletedDocs = docs
      .filter(col("source").isInCollection(DeletedLibraries))
      .select(col("doc_id").as("del_doc_id"))
    val survivingDocs = docs.join(
      broadcast(deletedDocs), col("doc_id") === col("del_doc_id"), "left_anti")
    val chunks = TextOps.chunks(survivingDocs.select("doc_id", "text", "n_chars"))
    survivingDocs.select("doc_id", "source")
      .join(chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks")), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chunks")).as("n_chunks"))
      .orderBy("source")
  }

  def cascadeDeleteOracleSql: String = {
    val tomb = DeletedLibraries.map(s => s"'$s'").mkString(", ")
    s"""WITH surviving AS (
       |  SELECT doc_id, source, n_chars FROM documents
       |  WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE source IN ($tomb))),
       |ch AS (
       |  SELECT doc_id, count(*) AS n_chunks FROM (
       |    SELECT doc_id, unnest(generate_series(0, n_chars-1, 150)) AS s FROM surviving) t
       |  GROUP BY doc_id)
       |SELECT source, count(*) AS n_docs, CAST(sum(n_chunks) AS BIGINT) AS n_chunks
       |FROM surviving JOIN ch USING (doc_id)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  /** Update semantics at scale (chunk_service.update_chunk): CRUD
    * updates arrive as a change log; compaction keeps the last writer
    * per key. Re-expressed as a window dedup over the events stream
    * (latest event per user by (ts, event_id)) — one shuffle, map-side
    * prunable with AQE at scale.
    */
  def upsertLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "ts", "event_type")
      .orderBy("user_id")
  }

  def upsertLatestOracleSql: String =
    """SELECT user_id, event_id, ts, event_type FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin
}
