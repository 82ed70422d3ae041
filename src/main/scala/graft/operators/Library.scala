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
      |  sum(n_chars) AS total_chars, min(n_chars) AS min_chars,
      |  max(n_chars) AS max_chars
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin
}
