package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SHARED machinery behind the flat quantized tiers' persisted
  * lifecycles (SQ8 / BQ / PCA — A19b/A21b/A22b): one bucketing rule,
  * one build/append state protocol, one four-phase driver-key shape,
  * so the three tiers cannot drift on the arithmetic (the
  * dedupSurvivorsOn seam principle applied to lifecycles). Each tier
  * keeps only what is genuinely its own: the model sidecar format,
  * the encode expression, and the disk query kernel.
  *
  * All three layouts are `(cluster_id, id, <codes>)` parquet
  * partitioned by `cluster_id = id mod buckets` — these are FLAT scan
  * tiers (no coarse quantizer), so the partition key exists for
  * MUTATION locality, not probe pruning: deletes rewrite only the
  * buckets holding deleted ids (IndexLifecycle.deleteFrom), appends
  * land one file per touched bucket (IndexLifecycle.landAppend).
  */
private[graft] object TierLifecycle {

  /** Minimum bucket count; the actual count SCALES as
    * max(16, √(n/2)) — the IVF list-count growth — because a fixed 16
    * at 100 TB would make a point delete rewrite n/16 rows (~6 TB);
    * with √n buckets a rewrite touches O(√n) rows, the same locality
    * class as the cluster-partitioned tiers. The chosen count
    * persists in each tier's `_meta` so appends land in the SAME
    * bucketing the build used.
    */
  val MinBuckets = 16

  def bucketsFor(n: Long): Int = math.max(MinBuckets, Ivf.defaultK(n))

  def bucketOf(c: Column, buckets: Int): Column =
    pmod(c, lit(buckets.toLong)).cast("int")

  /** Land a fresh build: bucket-partition `rows` (id, payload…),
    * write the lists, run the tier's sidecar writes, then the state —
    * state LAST, so a crash mid-build leaves an unbuilt status, never
    * a built status over half a tree.
    */
  def landBuild(spark: SparkSession, indexPath: String, kind: String,
                rows: DataFrame, n: Long, dim: Int, buckets: Int,
                writeSidecars: () => Unit): IndexStatus = {
    val prev = IndexLifecycle.status(spark, indexPath)
    rows.select(bucketOf(col("id"), buckets).as("cluster_id") +:
        rows.columns.map(col): _*)
      .repartition(col("cluster_id")) // one file per bucket
      .write.mode("overwrite").partitionBy("cluster_id").parquet(indexPath)
    writeSidecars()
    val next = IndexStatus(kind, isBuilt = true, isDirty = false, size = n,
      embeddingDim = dim, builtAt = System.currentTimeMillis(),
      version = prev.version + 1, dirtyCount = 0L, totalVectors = n)
    IndexLifecycle.writeState(spark, indexPath, next)
    next
  }

  /** Incremental add of `n` already-encoded staged rows
    * (cluster_id, id, payload…): the shared dirt accounting + the
    * crash-consistent landAppend protocol. The caller encoded against
    * its FROZEN sidecar model — nothing retrains here.
    */
  def appendStaged(spark: SparkSession, indexPath: String,
                   staged: DataFrame, n: Long): IndexStatus = {
    val s = IndexLifecycle.status(spark, indexPath)
    require(s.isBuilt, "append requires a built index (build first)")
    IndexLifecycle.checkNoHalfAppliedMutation(spark, indexPath)
    val next = s.copy(isDirty = true, dirtyCount = s.dirtyCount + n,
      size = s.size + n)
    IndexLifecycle.landAppend(spark, indexPath, staged, next)
    next
  }

  /** Loud precondition every tier mutation runs BEFORE touching its
    * model sidecar: an unbuilt/half-applied tree must fail with the
    * lifecycle's own message, not an opaque parquet path error from a
    * missing `_model`.
    */
  def requireMutable(spark: SparkSession, indexPath: String): Unit = {
    require(IndexLifecycle.status(spark, indexPath).isBuilt,
      "mutation requires a built index (build first)")
    IndexLifecycle.checkNoHalfAppliedMutation(spark, indexPath)
  }

  /** The read-only sibling of [[requireMutable]], run by every tier
    * SERVE path before loadModel/read (the IndexLifecycle.query
    * contract: 'called by every serve path'): after a crash between a
    * delete's two swap renames the bucket's rows live only under an
    * `_old_cluster_id=N` path parquet readers skip, so a query that
    * skipped this check would silently answer minus an entire bucket
    * instead of refusing loudly.
    */
  def requireServable(spark: SparkSession, indexPath: String): Unit = {
    require(IndexLifecycle.status(spark, indexPath).isBuilt,
      "query requires a built index (build first)")
    IndexLifecycle.checkNoHalfAppliedMutation(spark, indexPath)
  }

  /** Partition-pruned point delete for the modulo-bucketed layouts:
    * unlike a content-assigned layout (IVF — which list holds a vector
    * is unknowable without scanning), these tiers COMPUTE each deleted
    * id's bucket, so the shared deleteFrom scans and rewrites only the
    * affected partitions. The bucket set is a tiny distinct over the
    * delete batch (≤ buckets values), never a corpus job.
    */
  def deletePruned(deleteIds: DataFrame, indexPath: String,
                   buckets: Int): IndexStatus = {
    val hint = deleteIds
      .select(bucketOf(col("id"), buckets).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq
    IndexLifecycle.deleteFrom(deleteIds, indexPath, idCol = "id",
      bucketHint = Some(hint))
  }

  /** The four-phase driver-key body every tier lifecycle shares —
    * build, frozen-model append of ceil(0.05·n) re-keyed vectors,
    * delete of every 7th original (crossing the rebuild threshold),
    * disk read-back — so all the lifecycle keys verify against the
    * ONE A18b oracle (PqLifecycle.ivfpqLifecycleOracleSql).
    */
  def fourPhase(spark: SparkSession, dir: String, tmpPrefix: String,
                build: String => IndexStatus,
                append: (DataFrame, String) => IndexStatus,
                delete: (DataFrame, String) => IndexStatus): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory(tmpPrefix)
    val tmp = tmpDir.toString
    try {
      val n = Tables.embeddings(spark, dir).count()
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val s1 = build(tmp)
      val d = math.ceil(0.05 * n).toLong
      val s2 = append(
        vecs.filter(col("id") < d).select((col("id") + n).as("id"), col("vec")),
        tmp)
      val s3 = delete(vecs.filter(col("id") % 7 === 0).select("id"), tmp)
      val s4 = s3.copy(size = spark.read.parquet(tmp).count()) // read-back
      import spark.implicits._
      Seq(s1, s2, s3, s4).zipWithIndex
        .map { case (s, i) =>
          (i + 1, s.version, s.isDirty, s.dirtyCount, s.size,
            s.shouldRebuild(IndexLifecycle.RebuildThreshold)) }
        .toDF("phase", "version", "is_dirty", "dirty_count", "size", "should_rebuild")
        .orderBy("phase")
        .localCheckpoint()
    } finally graft.streaming.Streams.deleteTree(tmpDir)
  }
}
