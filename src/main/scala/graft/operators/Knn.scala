package graft.operators

import graft.functions.{VectorFunctions, VectorMetric}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact k-NN (the Spark-first re-expression of
  * stackai-vector-db's LinearScanIndex.query and the kd-tree's exact
  * contract — app/indexes/linear.py:46-63, kdtree.py).
  *
  * Shape: the (small) query batch is broadcast against the corpus scan,
  * distances are evaluated inside whole-stage codegen, and a bounded
  * TopKByDistance aggregate reduces each scan task to ≤ k candidates per
  * query before the (tiny) shuffle. No global sort, no full distance
  * materialization — the plan is a single corpus pass at any scale.
  */
object Knn {

  /** queries(query_id, qvec) × corpus(neighbor_id, vec) → one row per
    * (query_id, rank<=k): columns (query_id, neighbor_id, rank, dist).
    * Ties broken by neighbor id, matching the reference's stable sort.
    */
  def knn(queries: DataFrame, corpus: DataFrame, k: Int, metric: Int,
          pairFilter: Column = lit(true)): DataFrame = {
    val raw: Column = metric match {
      case VectorMetric.L2     => VectorFunctions.l2Distance(col("vec"), col("qvec"))
      case VectorMetric.Cosine => VectorFunctions.cosineDistance(col("vec"), col("qvec"))
      case VectorMetric.Dot    => -VectorFunctions.dotProduct(col("vec"), col("qvec"))
    }
    // The reference REJECTS dimension-mismatched queries
    // (EmbeddingDimensionMismatchError in VectorIndex.query) — the batch
    // twin must fail the job too, not silently truncate to the shorter
    // vector. The guard is an in-plan codegen'd length compare, so it
    // costs one int comparison per pair and no extra Spark job.
    val dist = when(size(col("vec")) =!= size(col("qvec")),
      raise_error(concat(lit("embedding dimension mismatch: corpus dim="),
        size(col("vec")).cast("string"), lit(", query dim="),
        size(col("qvec")).cast("string"))).cast("double"))
      .otherwise(raw)
    corpus.crossJoin(broadcast(queries))
      .filter(pairFilter)
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKByDistance(dist, col("neighbor_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "nn")))
      .select(
        col("query_id"),
        col("nn.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("nn.dist").as("dist"))
  }

  /** Corpus-side self k-NN: query batch drawn from the corpus itself. */
  def knnSelf(embeddings: DataFrame, nQueries: Int, k: Int, metric: Int,
              corpusFilter: Column = lit(true)): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = graft.Tables.rebalanced(embeddings.filter(corpusFilter)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("vec")))
    knn(queries, corpus, k, metric)
  }
}
