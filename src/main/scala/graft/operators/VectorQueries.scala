package graft.operators

import graft.Tables
import graft.functions.{FakeEmbedding, VectorMetric}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A-series driver queries: the reference's search surface as
  * deterministic batch queries over the embeddings corpus, each with a
  * DuckDB oracle (SURVEY §2A).
  */
object VectorQueries {

  val TextQuery = "vector database similarity search"
  val Dim = 64

  private def strip(df: DataFrame): DataFrame =
    df.select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")

  /** A1: exact k-NN, euclidean. */
  def knnLinearL2(spark: SparkSession, dir: String): DataFrame =
    strip(Knn.knnSelf(Tables.embeddings(spark, dir), 5, 10, VectorMetric.L2))

  /** A2: exact k-NN, cosine. */
  def knnLinearCosine(spark: SparkSession, dir: String): DataFrame =
    strip(Knn.knnSelf(Tables.embeddings(spark, dir), 5, 10, VectorMetric.Cosine))

  /** A8: the kd-tree's exact contract at different k/query-batch. */
  def knnExactTopk(spark: SparkSession, dir: String): DataFrame =
    strip(Knn.knnSelf(Tables.embeddings(spark, dir), 20, 5, VectorMetric.L2))

  /** A4: k-NN restricted to a metadata predicate (pre-filter). */
  def knnMetadataFilter(spark: SparkSession, dir: String): DataFrame =
    strip(Knn.knnSelf(Tables.embeddings(spark, dir), 5, 10, VectorMetric.L2,
      corpusFilter = col("label").isin(2, 5, 7)))

  /** A5: k-NN + PER-CHUNK similarity-threshold post-filter
    * (search_service.py:187-191: each result is dropped iff its
    * distance exceeds that chunk's own metadata threshold —
    * ChunkMetadata.similarity_threshold in app/domain/entities.py).
    * The testdata has no threshold column, so one is derived
    * deterministically from the chunk's metadata (label), the batch
    * form of per-chunk metadata: a threshold COLUMN, not a constant.
    * Both engines compute it with identical double ops so the
    * comparison is bit-deterministic.
    */
  def knnThreshold(spark: SparkSession, dir: String): DataFrame = {
    val knn = Knn.knnSelf(Tables.embeddings(spark, dir), 5, 10, VectorMetric.Cosine)
    val thr = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("neighbor_id"),
        (lit(0.70) + (col("label") % 3).cast("double") * lit(0.02)).as("thr"))
    thr.join(broadcast(knn), "neighbor_id")
      .filter(col("dist") <= col("thr"))
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** A3: text query — embed through the provider seam (deterministic
    * fake provider; app/clients/embedding.py Protocol) then cosine k-NN.
    */
  def knnTextQuery(spark: SparkSession, dir: String): DataFrame = {
    val qvec = new graft.functions.FakeEmbeddingClient(Dim).embedText(TextQuery).toSeq
    val queries = spark.range(1)
      .select(col("id").as("query_id"), typedlit(qvec).as("qvec"))
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("vec"))
    strip(Knn.knn(queries, corpus, 10, VectorMetric.Cosine))
  }

  private def knnOracle(metric: String, nQueries: Int, k: Int,
                        corpusWhere: String = "TRUE"): String = {
    val order = metric match {
      case "l2" => "list_distance(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
      case "cosine" => "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC"
    }
    s"""SELECT query_id, neighbor_id, rank FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $order, c.vec_id) AS rank
       |  FROM embeddings q, embeddings c
       |  WHERE q.vec_id < $nQueries AND ($corpusWhere)) t
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  def knnLinearL2OracleSql: String     = knnOracle("l2", 5, 10)
  def knnLinearCosineOracleSql: String = knnOracle("cosine", 5, 10)
  def knnExactTopkOracleSql: String    = knnOracle("l2", 20, 5)
  def knnMetadataFilterOracleSql: String =
    knnOracle("l2", 5, 10, "c.label IN (2, 5, 7)")

  def knnThresholdOracleSql: String =
    """SELECT query_id, neighbor_id, rank FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    1.0 - list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS dist,
      |    CAST(0.70 AS DOUBLE) + (c.label % 3) * CAST(0.02 AS DOUBLE) AS thr,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
      |  FROM embeddings q, embeddings c
      |  WHERE q.vec_id < 5) t
      |WHERE rank <= 10 AND dist <= thr
      |ORDER BY query_id, rank""".stripMargin

  def knnTextQueryOracleSql: String = {
    val vec = FakeEmbedding.sqlLiteral(TextQuery, Dim)
    s"""SELECT query_id, neighbor_id, rank FROM (
       |  SELECT CAST(0 AS BIGINT) AS query_id, c.vec_id AS neighbor_id,
       |    row_number() OVER (ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), $vec) DESC, c.vec_id) AS rank
       |  FROM embeddings c) t
       |WHERE rank <= 10
       |ORDER BY rank""".stripMargin
  }
}
