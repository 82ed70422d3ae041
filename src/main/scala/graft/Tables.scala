package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd readers for the driver-generated testdata tables.
  *
  * Mirrors the reference's entity stores (stackai-vector-db
  * app/repositories) re-expressed as parquet-backed DataFrames:
  * `documents` plays Document (its `source` column plays Library),
  * `embeddings` plays the built vector store, derived chunk rows play
  * Chunk. The TPC-H-ish tables + `events` exercise the analytics and
  * streaming surface.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a scan across all cores before a CPU-heavy per-row stage.
    *
    * The driver's test parquet is a single row group, so Spark cannot
    * split the scan and every downstream narrow stage runs on ONE core
    * (measured: the whole shingle pipeline serialized behind a
    * 1-partition scan). At 100 TB the storage layout provides thousands
    * of splits and this is a no-op cost-wise; locally the round-robin
    * shuffle moves only the skinny projected rows and unlocks 32×
    * parallelism for the hash/distance work behind it.
    */
  def rebalanced(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as raw long nanos and truncate to micros
    * (integer division — exactly DuckDB's ns→µs conversion).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
