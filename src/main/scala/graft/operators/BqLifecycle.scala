package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A21b: lifecycle for a PERSISTED BQ (1-bit-per-dim) layout — with
  * A19b/A22b this finishes the §9 "persisted faces" item: EVERY
  * quantized serving tier now speaks the A18b state machine
  * (reference contract: app/services/index_service.py:56-198). The
  * 256× tier is precisely the one worth persisting at 100 TB — the
  * bit codes are 0.4% of the raw corpus, small enough to sit in
  * memory cluster-wide, and this tree is what a cluster would load.
  *
  * Layout and protocols are [[TierLifecycle]]'s. BQ's own parts: the
  * `_model` sidecar (per-dimension (pos, mu) mean thresholds), `_meta`
  * (dim, buckets — no metric: one sign-bit model serves l2 AND cosine,
  * Bq.train's contract), the sign-bit encode, and the hamming disk
  * query. The disk query ranks by HAMMING ALONE — the production
  * refine step joins the shortlist back to the PRIMARY raw-vector
  * store (Bq.topK's two-tier contract), which a codes-only tree by
  * design does not carry; pass `refineWith` to stack it.
  */
object BqLifecycle {

  /** Build (version+1): per-dimension mean thresholds (Bq.train — ONE
    * aggregation), sign-bit codes, bucket-partitioned lists + sidecars.
    */
  def build(spark: SparkSession, dir: String, indexPath: String): IndexStatus = {
    val m = Bq.train(spark, dir)
    val n = Tables.embeddingsCount(spark, dir)
    val buckets = TierLifecycle.bucketsFor(n)
    TierLifecycle.landBuild(spark, indexPath, "bq",
      Bq.encode(spark, dir).select(col("id"), col("codes")),
      n, m.dim, buckets, () => {
        import spark.implicits._
        m.thresholds.indices.map(i => (i, m.thresholds(i))).toDF("pos", "mu")
          .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/_model")
        Seq((m.dim, buckets)).toDF("dim", "buckets")
          .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/_meta")
      })
  }

  /** The persisted thresholds + bucket count from the sidecars. */
  private[graft] def loadModel(spark: SparkSession,
                               indexPath: String): (Bq.Model, Int) = {
    val rows = spark.read.parquet(s"$indexPath/_model")
      .orderBy("pos").collect()
    val buckets = spark.read.parquet(s"$indexPath/_meta")
      .select("buckets").head().getInt(0)
    (Bq.Model(rows.map(_.getDouble(1))), buckets)
  }

  /** Incremental add: sign-bit-encode `newVecs` (id, vec) against the
    * FROZEN sidecar thresholds and land crash-consistently. No
    * retrain — a drifted mean only degrades bit balance, which the
    * dirty-ratio policy eventually answers with a rebuild.
    * `streamBatchId`/`streamId` are the foreachBatch at-least-once
    * guard (the PqLifecycle.append contract, via the shared
    * appendStaged): a replayed batch NO-OPs before paying the encode.
    */
  def append(newVecs: DataFrame, indexPath: String,
             streamBatchId: Option[Long] = None,
             streamId: Option[String] = None): IndexStatus = {
    val spark = newVecs.sparkSession
    val s0 = TierLifecycle.requireMutable(spark, indexPath)
    // replay no-op BEFORE the model load and the batch count; the ONE
    // state read above flows into appendStaged's write
    if (streamBatchId.exists(_ <= s0.appliedBatchFor(streamId.getOrElse(""))))
      return s0
    val (m, buckets) = loadModel(spark, indexPath)
    val v = newVecs.cache()
    val n = v.count()
    val staged = v.select(
      TierLifecycle.bucketOf(col("id"), buckets).as("cluster_id"), col("id"),
      graft.functions.BqFunctions.bqEncode(col("vec"), m.thresholds).as("codes"))
    val next = TierLifecycle.appendStaged(spark, indexPath, staged, n,
      streamBatchId, streamId, stateOpt = Some(s0))
    v.unpersist()
    next
  }

  /** Point delete: the shared PARTITION-PRUNED bucket-rewrite. */
  def delete(deleteIds: DataFrame, indexPath: String): IndexStatus = {
    TierLifecycle.requireMutable(deleteIds.sparkSession, indexPath)
    val (_, buckets) = loadModel(deleteIds.sparkSession, indexPath)
    TierLifecycle.deletePruned(deleteIds, indexPath, buckets)
  }

  /** Disk query: hamming top-k from the stored codes alone (XOR +
    * popcount over 8 bytes/candidate at dim 64); `refineWith` = the
    * caller's raw (id, vec) primary store stacks the exact re-rank
    * (Bq.topK's two-tier shape) — the shortlist is k·refine wide then.
    * `metric` drives only that exact re-rank (the hamming shortlist is
    * metric-free — the one-sign-bit-model-serves-l2-AND-cosine
    * contract): a cosine caller gets a cosine re-rank through the
    * persisted face exactly as through the in-session Bq.topK.
    */
  def query(spark: SparkSession, indexPath: String, queryVec: Array[Float],
            k: Int, refineWith: Option[DataFrame] = None,
            refine: Int = 8,
            metric: Int = graft.functions.VectorMetric.L2): DataFrame = {
    TierLifecycle.requireServable(spark, indexPath)
    val (m, _) = loadModel(spark, indexPath)
    val qCodes = Bq.encodeQuery(queryVec, m)
    val ham = graft.functions.BqFunctions
      .hammingDistance(lit(qCodes), col("codes"), m.nBytes)
    val shortlist = spark.read.parquet(indexPath)
      .select(col("id").as("neighbor_id"), ham.as("hdist"))
      .orderBy(col("hdist"), col("neighbor_id"))
    refineWith match {
      case None =>
        shortlist.select(col("neighbor_id"), col("hdist").cast("double").as("dist"))
          .limit(k)
      case Some(raw) =>
        val exact = Ivf.distCol(metric,
          col("vec"), typedlit(queryVec.toSeq))
        shortlist.limit(k * math.max(1, refine)).select(col("neighbor_id"))
          .join(raw.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
          .select(col("neighbor_id"), exact.as("dist"))
          .orderBy(col("dist"), col("neighbor_id"))
          .limit(k)
    }
  }

  /** Out-of-band rebuild (the shared [[TierLifecycle.rebuild]] with
    * BQ's own parts): retrain the per-dimension mean thresholds on the
    * current contents, re-sign-encode, re-level buckets, staged swap.
    */
  def rebuild(currentVecs: DataFrame, indexPath: String): IndexStatus = {
    val spark = currentVecs.sparkSession
    val s0 = TierLifecycle.requireRebuildable(spark, indexPath)
    TierLifecycle.rebuild(currentVecs, indexPath, "bq", (v, buckets, tmp) => {
      val m = Bq.trainFrom(v)
      val rows = v.select(col("id"),
        graft.functions.BqFunctions.bqEncode(col("vec"), m.thresholds).as("codes"))
      (rows, m.dim, () => {
        import spark.implicits._
        m.thresholds.indices.map(i => (i, m.thresholds(i))).toDF("pos", "mu")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/_model")
        Seq((m.dim, buckets)).toDF("dim", "buckets")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/_meta")
      })
    }, stateOpt = Some(s0))
  }

  /** Lazy-rebuild policy at read time (the shared
    * TierLifecycle.rebuildIfNeeded with this tier's rebuild).
    */
  def rebuildIfNeeded(currentVecs: DataFrame, indexPath: String,
                      threshold: Double = IndexLifecycle.RebuildThreshold): IndexStatus =
    TierLifecycle.rebuildIfNeeded(currentVecs, indexPath, rebuild, threshold)

  /** Driver query: the shared five-phase state machine over the BQ
    * tree (TierLifecycle.fivePhase — the A18b arithmetic for phases
    * 1-4, the rebuild reset as phase 5).
    */
  def bqLifecycle(spark: SparkSession, dir: String): DataFrame =
    TierLifecycle.fivePhase(spark, dir, "graft_bq_lc",
      tmp => build(spark, dir, tmp),
      (vs, tmp) => append(vs, tmp),
      (ids, tmp) => delete(ids, tmp),
      (vs, tmp) => rebuild(vs, tmp))

  def bqLifecycleOracleSql: String = TierLifecycle.tierLifecycleOracleSql
}
