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
    * `streamBatchId`/`streamId` are the at-least-once replay guard for
    * foreachBatch callers (the PqLifecycle.append contract verbatim):
    * the per-stream watermark is recorded in the SAME state write
    * landAppend does before moving files in, so a replayed batch sees
    * its own stream's watermark >= batchId and NO-OPs instead of
    * landing duplicate code rows.
    */
  def appendStaged(spark: SparkSession, indexPath: String,
                   staged: DataFrame, n: Long,
                   streamBatchId: Option[Long] = None,
                   streamId: Option[String] = None,
                   stateOpt: Option[IndexStatus] = None): IndexStatus = {
    // stateOpt = the state the caller's requireMutable already read —
    // the per-trigger hot path then pays ONE status read + ONE marker
    // listing per append, matching PqLifecycle.append
    val s = stateOpt.getOrElse {
      val s0 = IndexLifecycle.status(spark, indexPath)
      require(s0.isBuilt, "append requires a built index (build first)")
      IndexLifecycle.checkNoHalfAppliedMutation(spark, indexPath)
      s0
    }
    if (streamBatchId.exists(_ <= s.appliedBatchFor(streamId.getOrElse(""))))
      return s
    val grown = s.copy(isDirty = true, dirtyCount = s.dirtyCount + n,
      size = s.size + n)
    val next = streamBatchId match {
      case Some(b) => grown.withAppliedBatch(streamId.getOrElse(""), b)
      case None => grown
    }
    IndexLifecycle.landAppend(spark, indexPath, staged, next)
    next
  }

  /** Loud precondition every tier mutation runs BEFORE touching its
    * model sidecar: an unbuilt/half-applied tree must fail with the
    * lifecycle's own message, not an opaque parquet path error from a
    * missing `_model`.
    */
  def requireMutable(spark: SparkSession, indexPath: String): IndexStatus =
    requirePrecondition(spark, indexPath, "mutation")

  /** The read-only sibling of [[requireMutable]], run by every tier
    * SERVE path before loadModel/read (the IndexLifecycle.query
    * contract: 'called by every serve path'): after a crash between a
    * delete's two swap renames the bucket's rows live only under an
    * `_old_cluster_id=N` path parquet readers skip, so a query that
    * skipped this check would silently answer minus an entire bucket
    * instead of refusing loudly.
    */
  def requireServable(spark: SparkSession, indexPath: String): IndexStatus =
    requirePrecondition(spark, indexPath, "query")

  /** Recovery-then-precondition for the REBUILD path (the GraphIndex
    * reconcile discipline): a crashed mutation's markers are made
    * whole in place (IndexLifecycle.recoverMutation) instead of
    * refused — rebuild is the repair operation, so it must be able to
    * enter a damaged tree; serve and append/delete keep refusing.
    */
  private[operators] def requireRebuildable(spark: SparkSession,
                                            indexPath: String): IndexStatus = {
    IndexLifecycle.recoverMutation(spark, indexPath)
    requirePrecondition(spark, indexPath, "rebuild")
  }

  /** One implementation of the two preconditions (returns the state it
    * read, so callers pay ONE status read + ONE marker listing).
    */
  private def requirePrecondition(spark: SparkSession, indexPath: String,
                                  verb: String): IndexStatus = {
    val s = IndexLifecycle.status(spark, indexPath)
    require(s.isBuilt, s"$verb requires a built index (build first)")
    IndexLifecycle.checkNoHalfAppliedMutation(spark, indexPath)
    s
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

  /** Out-of-band rebuild for a flat tier — the close of the
    * reference's lazy-rebuild loop (index_service.py:56-198, the
    * exact policy PqLifecycle.rebuild implements for IVF-PQ) on the
    * shared seam: when the dirty-ratio policy fires, retrain the
    * tier's model on the index's CURRENT logical contents, re-encode
    * every vector under the new model, and land the result as
    * version+1 with dirt reset. `currentVecs` is the RAW (id, vec)
    * view of what the index should now hold (the tier's stored codes
    * are lossy, so a rebuild by definition starts from the primary
    * store); the caller passes it ALREADY in the tier's training
    * representation (cosine trees: metric-transformed). `trainEncode`
    * owns what is genuinely the tier's: train the new model from the
    * cached contents, return the encoded (id, payload…) rows, the
    * model dim, and a sidecar writer targeting the STAGED tree.
    *
    * The bucket count is re-derived from the new size (√(n/2) growth —
    * a rebuild is exactly when the layout gets to re-level itself),
    * the whole new tree stages at `<path>_rebuild_tmp` while the live
    * index keeps serving, and the swap runs the SHARED protocol
    * (IndexLifecycle.swapRebuilt: abort-on-concurrent-mutation before
    * and after the move-aside, loud names on every crash window). The
    * stream watermark map carries over — a rebuild must not reopen
    * replay windows for an ingest stream running against the tier.
    */
  def rebuild(currentVecs: DataFrame, indexPath: String, kind: String,
              trainEncode: (DataFrame, Int, String) => (DataFrame, Int, () => Unit),
              beforeSwap: () => Unit = () => (),
              stateOpt: Option[IndexStatus] = None): IndexStatus = {
    val spark = currentVecs.sparkSession
    // stateOpt = the state the caller's requireRebuildable already
    // read (one precondition pass per rebuild, the appendStaged shape)
    val s = stateOpt.getOrElse {
      val s0 = IndexLifecycle.status(spark, indexPath)
      require(s0.isBuilt, "rebuild requires a built index (build first)")
      IndexLifecycle.checkNoHalfAppliedMutation(spark, indexPath)
      s0
    }
    val fs = IndexLifecycle.fs(spark, indexPath)
    val tmp = new org.apache.hadoop.fs.Path(s"${indexPath}_rebuild_tmp")
    fs.delete(tmp, true)
    val v = currentVecs.cache()
    val n = v.count()
    val buckets = bucketsFor(n)
    val (rows, dim, writeSidecars) = trainEncode(v, buckets, tmp.toString)
    rows.select(bucketOf(col("id"), buckets).as("cluster_id") +:
        rows.columns.map(col): _*)
      .repartition(col("cluster_id")) // one file per bucket
      .write.mode("overwrite").partitionBy("cluster_id").parquet(tmp.toString)
    writeSidecars()
    val next = IndexStatus(kind, isBuilt = true, isDirty = false, size = n,
      embeddingDim = dim, builtAt = System.currentTimeMillis(),
      version = s.version + 1, dirtyCount = 0L, totalVectors = n,
      appliedStreams = s.appliedStreams)
    IndexLifecycle.writeState(spark, tmp.toString, next)
    v.unpersist()
    IndexLifecycle.swapRebuilt(spark, indexPath, tmp, s, beforeSwap)
    next
  }

  /** The lazy-rebuild policy applied at read time (IndexLifecycle
    * .buildIfNeeded's contract on the tier seam — the reference's
    * serving flow, index_service.py:88-99): rebuild through the
    * tier's own `rebuildFn` only when the dirty-ratio policy says so,
    * otherwise return the current state untouched. Unlike
    * buildIfNeeded (which can BUILD a fresh path), a tier rebuild
    * retrains against an existing tree's metric/shape sidecars, so an
    * unbuilt path refuses loudly with the lifecycle's message rather
    * than tripping shouldRebuild's unbuilt arm into an opaque crash.
    *
    * This read-time entry is also the REPAIR point: recoverMutation
    * runs first, so a tree damaged by a crashed mutation whose
    * recorded dirt was sub-threshold (deleteFrom writes state LAST —
    * a mid-swap crash records nothing) is made whole here instead of
    * refusing serves forever while the policy sees nothing to do;
    * the recovery's own size-drift reconciliation lands as dirt,
    * which this very policy then answers.
    */
  def rebuildIfNeeded(currentVecs: DataFrame, indexPath: String,
                      rebuildFn: (DataFrame, String) => IndexStatus,
                      threshold: Double = IndexLifecycle.RebuildThreshold): IndexStatus = {
    val spark = currentVecs.sparkSession
    IndexLifecycle.recoverMutation(spark, indexPath)
    val s = IndexLifecycle.status(spark, indexPath)
    require(s.isBuilt,
      "rebuildIfNeeded requires a built index (build the tier first)")
    if (s.shouldRebuild(threshold)) rebuildFn(currentVecs, indexPath) else s
  }

  /** The five-phase driver-key body every tier lifecycle shares —
    * build, frozen-model append of ceil(0.05·n) re-keyed vectors,
    * delete of every 7th original (crossing the rebuild threshold),
    * disk read-back, and the REBUILD the fired policy asks for
    * (retrain on the current logical contents → version 2, dirt
    * reset, its own read-back) — so all the tier keys verify against
    * the ONE shared oracle ([[tierLifecycleOracleSql]]: phases 1-4
    * are the A18b arithmetic verbatim, phase 5 closes the loop).
    */
  def fivePhase(spark: SparkSession, dir: String, tmpPrefix: String,
                build: String => IndexStatus,
                append: (DataFrame, String) => IndexStatus,
                delete: (DataFrame, String) => IndexStatus,
                rebuild: (DataFrame, String) => IndexStatus): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory(tmpPrefix)
    val tmp = tmpDir.toString
    try {
      val n = Tables.embeddingsCount(spark, dir)
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val s1 = build(tmp)
      val d = math.ceil(0.05 * n).toLong
      val appended = vecs.filter(col("id") < d)
        .select((col("id") + n).as("id"), col("vec"))
      val s2 = append(appended, tmp)
      val s3 = delete(vecs.filter(col("id") % 7 === 0).select("id"), tmp)
      val s4 = s3.copy(size = spark.read.parquet(tmp).count()) // read-back
      // phase 3 crossed the threshold (should_rebuild fired) — run the
      // rebuild it asks for, on the index's current LOGICAL contents
      // (originals minus deletions, plus the appended arrivals), then
      // prove the re-encoded tree really landed with a disk read-back
      val current = vecs.filter(col("id") % 7 =!= 0).unionAll(appended)
      val s5 = rebuild(current, tmp)
        .copy(size = spark.read.parquet(tmp).count()) // read-back
      import spark.implicits._
      Seq(s1, s2, s3, s4, s5).zipWithIndex
        .map { case (s, i) =>
          (i + 1, s.version, s.isDirty, s.dirtyCount, s.size,
            s.shouldRebuild(IndexLifecycle.RebuildThreshold)) }
        .toDF("phase", "version", "is_dirty", "dirty_count", "size", "should_rebuild")
        .orderBy("phase")
        .localCheckpoint()
    } finally graft.streaming.Streams.deleteTree(tmpDir)
  }

  /** The same delete WITHOUT the bucket hint — the full-scan twin
    * tools/TierProbe measures [[deletePruned]] against (the probe's
    * evidence that the hint is the at-scale win, not decoration);
    * production callers always hint.
    */
  private[graft] def deleteUnpruned(deleteIds: DataFrame,
                                    indexPath: String): IndexStatus =
    IndexLifecycle.deleteFrom(deleteIds, indexPath, idCol = "id",
      bucketHint = None)

  /** A19c driver query: `tier_compact` — the A20 small-files
    * maintenance pass exercised on the flat-tier bucket layout. Every
    * frozen-model append lands ONE part-file per touched bucket
    * (IndexLifecycle.landAppend — crash-consistent but accretive), so
    * a continuously-fed SQ8/BQ/PCA tree hits the same small-files wall
    * the IVF lists do: at 100 TB a bucket with thousands of tiny files
    * pays a task + footer read per file on every scan. The shared
    * compact (IndexLifecycle.compactLayout through the A20 face —
    * threshold-gated, rename-aside, marker-refusing) answers it
    * identically: build the SQ8 tree, two appends (every touched
    * bucket now holds >1 part-file), compact at maxFiles=1, and a full
    * read-back per phase proving row conservation — the oracle
    * recomputes the expected totals arithmetically (A20's oracle
    * verbatim), so a compaction that lost or duplicated rows cannot
    * pass. File-count collapse, idempotence, and untouched-bucket
    * byte-identity are pinned in TierLifecycleSpec.
    */
  def tierCompact(spark: SparkSession, dir: String): DataFrame =
    IndexLifecycle.compactDemo(spark, dir, "graft_tier_compact",
      (_, tmp) => { Sq8Lifecycle.build(spark, dir, tmp); () },
      (batch, tmp) => { Sq8Lifecycle.append(batch, tmp); () })

  /** Same arithmetic as A20's oracle (same append fractions, same
    * row-conservation shape).
    */
  def tierCompactOracleSql: String = IndexLifecycle.indexCompactOracleSql

  /** The shared tier-lifecycle oracle: phases 1-4 are A18b's
    * arithmetic verbatim (d = ceil(0.05·n) appended, every 7th
    * original deleted, read-back); phase 5 is the rebuild — version 2,
    * clean, size = the rebuilt tree's n + d − r rows, policy reset.
    */
  def tierLifecycleOracleSql: String =
    """WITH p AS (SELECT count(*) AS n,
      |  CAST(ceil(0.05*count(*)) AS BIGINT) AS d,
      |  CAST(count(*) FILTER (WHERE vec_id % 7 = 0) AS BIGINT) AS r FROM embeddings)
      |SELECT 1 AS phase, 1 AS version, false AS is_dirty, CAST(0 AS BIGINT) AS dirty_count,
      |       n AS size, false AS should_rebuild FROM p
      |UNION ALL SELECT 2, 1, true, d, n + d, (1.0*d/n >= 0.1) FROM p
      |UNION ALL SELECT 3, 1, true, d + r, n + d - r, (1.0*(d+r)/n >= 0.1) FROM p
      |UNION ALL SELECT 4, 1, true, d + r, n + d - r, (1.0*(d+r)/n >= 0.1) FROM p
      |UNION ALL SELECT 5, 2, false, CAST(0 AS BIGINT), n + d - r, false FROM p
      |ORDER BY phase""".stripMargin
}
