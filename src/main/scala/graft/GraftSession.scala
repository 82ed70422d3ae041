package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft's required tuning applied.
  *
  * objectHashAggregate.sortBased.fallbackThreshold: the bounded top-k
  * aggregate (TypedImperativeAggregate) runs under ObjectHashAggregate,
  * which by default falls back to SORT-based aggregation once a
  * partition sees >128 distinct groups — turning every batch-ANN query
  * (thousands of query-id groups) into a full sort of the joined
  * distance stream, an order-of-magnitude slowdown measured at sf0.1
  * (26s → 2.3s). Top-k buffers are small (k entries), so holding one
  * per group hash-aggregated is exactly what we want at any group count.
  */
object GraftSession {
  val ObjectAggFallbackThreshold = "1000000"

  def builder(cores: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        ObjectAggFallbackThreshold)
      .config("spark.ui.enabled", "false")
}
