package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch + streaming source/sink surface.
  *
  * Rules that matter at 100 TB:
  *   - ALWAYS pass an explicit schema on read: schema inference is a
  *     full extra pass over the data (and non-deterministic for JSON).
  *   - Parquet is the canonical interchange + index format (predicate
  *     pushdown, column pruning, partitioned layout). CSV/JSON exist
  *     for interop edges only.
  *   - CSV cannot carry nested types: embedding arrays round-trip
  *     through a delimited string column (`packArray`/`unpackArray`),
  *     lossless for float32 via exact decimal rendering.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** array<float> → '|'-delimited string (CSV-safe, lossless: float32
    * values survive a round-trip through their shortest decimal form).
    */
  def packArray(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(transform(c, x => x.cast("string")), "|")

  /** '|'-delimited string → array<float>. */
  def unpackArray(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(split(c, "\\|"), x => x.cast("float"))

  /** Streaming file source: tail a directory (or glob) of files with a
    * known schema (the production shape for landing zones; exactly-once
    * with checkpointing when a real sink is attached). `options` passes
    * source options through — e.g. `basePath` when the glob points at
    * files inside a table directory.
    */
  def streamDir(spark: SparkSession, path: String, schema: StructType,
                format: String = "parquet",
                options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(schema).format(format).options(options).load(path)

  /** Bucketed table write: co-locates rows by join key so a fact-fact
    * join between tables bucketed the same way needs NO shuffle on
    * either side (the scan itself provides the hash partitioning, and
    * sortBy provides the sort order for a zero-exchange sort-merge
    * join). At 100 TB this turns the biggest recurring join from a
    * full-network shuffle into a local merge — the single largest
    * cost lever for repeated fact-fact joins. SourcesSpec asserts the
    * exchange-free plan.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCol: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Small-file compaction: rewrite a parquet directory into
    * size-targeted files. Landing zones and streaming sinks accrete
    * thousands of tiny files; scans then pay one task + one open per
    * file. One pass, round-robin repartition (no semantic key needed),
    * byte-targeted output count.
    */
  def compact(spark: SparkSession, path: String,
              targetBytesPerFile: Long = 128L * 1024 * 1024): Long = {
    val df = spark.read.parquet(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1L, (bytes / BigInt(targetBytesPerFile)).toLong +
      (if (bytes % BigInt(targetBytesPerFile) > 0) 1 else 0))
    val tmp = path.stripSuffix("/") + "__compacting"
    df.repartition(nFiles.toInt).write.mode("overwrite").parquet(tmp)
    // swap only after the rewrite fully landed — and FAIL LOUDLY if the
    // swap does not complete: Hadoop FileSystems report most rename
    // failures by returning false, and ignoring that after the delete
    // would silently orphan the data at the __compacting path
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.delete(new org.apache.hadoop.fs.Path(path), true))
      sys.error(s"compact: could not remove $path; rewritten data is at $tmp")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path)))
      sys.error(s"compact: rename $tmp -> $path failed; recover data from $tmp")
    nFiles
  }

  /** Streaming parquet sink with checkpointing — the exactly-once
    * landing path: the checkpoint's WAL + file-sink manifest make
    * restarts idempotent (a re-processed batch overwrites its own
    * manifest entry instead of duplicating data). Blocks until the
    * currently-available input is drained, then stops — callers that
    * want a long-running query manage the handle themselves.
    */
  def streamToParquet(df: DataFrame, path: String, checkpoint: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }
}
