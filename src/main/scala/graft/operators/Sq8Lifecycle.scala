package graft.operators

import graft.Tables
import graft.functions.VectorMetric
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A19b: lifecycle for a PERSISTED SQ8 layout — the round-14 verdict's
  * gap: the 4× tier existed only as an in-session selection-table memo
  * (Sq8.scala exported no write/read/query face) while every other
  * serving tier (IVF-PQ: PqLifecycle, graph: GraphIndex) has
  * build → frozen-model append → partition-rewrite delete → read-back.
  * A served SQ8 index at 100 TB needs the same versioned-state machine
  * (the reference's IndexService contract,
  * app/services/index_service.py:56-198).
  *
  * Layout and protocols are [[TierLifecycle]]'s (the shared flat-tier
  * seam — SQ8/BQ/PCA cannot drift on bucketing or state arithmetic);
  * this object owns only what is genuinely SQ8's: the `_model` sidecar
  * (per-dimension (pos, lo, scale) rows — the FULL frozen model, so an
  * appended vector can never encode under a different model than the
  * build's), the `_meta` (dim, metric, buckets), the encode
  * expression, and the symmetric dequantized-distance disk query.
  */
object Sq8Lifecycle {

  /** Build (version+1): train per-dimension (min, scale) on the corpus
    * (Sq8.train — ONE map-side-combined aggregation), encode every
    * vector to 1-byte-per-dim codes, land the bucket-partitioned tree
    * with its model/meta sidecars, and start the lifecycle state.
    */
  def build(spark: SparkSession, dir: String, indexPath: String,
            metric: Int = VectorMetric.L2): IndexStatus = {
    val m = Sq8.train(spark, dir, metric)
    val n = Tables.embeddingsCount(spark, dir)
    val buckets = TierLifecycle.bucketsFor(n)
    TierLifecycle.landBuild(spark, indexPath, "sq8",
      Sq8.encode(spark, dir, metric).select(col("id"), col("codes")),
      n, m.mins.length, buckets, () => {
        import spark.implicits._
        m.mins.indices.map(i => (i, m.mins(i), m.scales(i)))
          .toDF("pos", "lo", "scale")
          .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/_model")
        Seq((m.mins.length, metric, buckets)).toDF("dim", "metric", "buckets")
          .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/_meta")
      })
  }

  /** The persisted model, read back from the index's own sidecars —
    * append/query never touch the session memo, so a reopened index
    * serves exactly what it was built with.
    */
  private[graft] def loadModel(spark: SparkSession,
                               indexPath: String): (Sq8.Model, Int, Int) = {
    val rows = spark.read.parquet(s"$indexPath/_model")
      .orderBy("pos").collect()
    val meta = spark.read.parquet(s"$indexPath/_meta")
      .select("metric", "buckets").head()
    (Sq8.Model(rows.map(_.getDouble(1)), rows.map(_.getDouble(2))),
      meta.getInt(0), meta.getInt(1))
  }

  /** Incremental add: encode `newVecs` (id, vec — RAW floats) against
    * the FROZEN per-dimension model from the sidecar (cosine indexes
    * normalize the new vectors first, matching the build
    * representation; out-of-range dimensions clamp to 0/255 — the
    * standard SQ8 saturation, never a retrain) and land the
    * (cluster_id, id, codes) rows crash-consistently. Growth is dirt
    * against the as-of-build total, so the dirty-ratio policy decides
    * when the model retrains.
    */
  def append(newVecs: DataFrame, indexPath: String): IndexStatus = {
    val spark = newVecs.sparkSession
    val s0 = TierLifecycle.requireMutable(spark, indexPath)
    val (m, metric, buckets) = loadModel(spark, indexPath)
    val v = Ivf.metricTransform(newVecs, metric).cache()
    val n = v.count()
    val staged = v.select(
      TierLifecycle.bucketOf(col("id"), buckets).as("cluster_id"), col("id"),
      graft.functions.Sq8Functions.sq8Encode(col("vec"), m.mins, m.scales)
        .as("codes"))
    val next = TierLifecycle.appendStaged(spark, indexPath, staged, n,
      stateOpt = Some(s0))
    v.unpersist()
    next
  }

  /** Point delete over the code lists: the PARTITION-PRUNED shared
    * rewrite — the deleted ids' buckets are computable (id mod
    * buckets), so the scan and swap touch only those partitions.
    */
  def delete(deleteIds: DataFrame, indexPath: String): IndexStatus = {
    TierLifecycle.requireMutable(deleteIds.sparkSession, indexPath)
    val (_, _, buckets) = loadModel(deleteIds.sparkSession, indexPath)
    TierLifecycle.deletePruned(deleteIds, indexPath, buckets)
  }

  /** Query the PERSISTED index from disk: quantize the query through
    * the sidecar model and rank the stored codes by the symmetric SQ8
    * distance — the same scan + bounded top-k as the in-session tier,
    * over the read-back tree.
    */
  def query(spark: SparkSession, indexPath: String, queryVec: Array[Float],
            k: Int): DataFrame = {
    TierLifecycle.requireServable(spark, indexPath)
    val (m, metric, _) = loadModel(spark, indexPath)
    require(queryVec.length == m.mins.length,
      s"query dim ${queryVec.length} != index dim ${m.mins.length}")
    val q0 = Pq.metricQuery(queryVec, metric)
    val qCodes: Array[Byte] = q0.indices.map { i =>
      val q = Math.round((q0(i) - m.mins(i)) * m.scales(i)).toInt
      Math.max(0, Math.min(255, q)).toByte
    }.toArray
    val dist = graft.functions.Sq8Functions
      .sq8Distance(lit(qCodes), col("codes"), m.scales)
    spark.read.parquet(indexPath)
      .select(col("id").as("neighbor_id"), dist.as("dist"))
      .orderBy(col("dist"), col("neighbor_id"))
      .limit(k)
  }

  /** Out-of-band rebuild (the shared [[TierLifecycle.rebuild]] with
    * SQ8's own parts): retrain the per-dimension (min, scale) model on
    * the RAW current contents, re-encode every vector, re-level the
    * buckets at the new size, staged swap. The tree's metric is kept
    * across rebuilds (a cosine tree retrains on normalized content,
    * the same representation the build used).
    */
  def rebuild(currentVecs: DataFrame, indexPath: String): IndexStatus = {
    val spark = currentVecs.sparkSession
    val s0 = TierLifecycle.requireRebuildable(spark, indexPath)
    val (_, metric, _) = loadModel(spark, indexPath)
    TierLifecycle.rebuild(Ivf.metricTransform(currentVecs, metric), indexPath,
      "sq8", (v, buckets, tmp) => {
        val m = Sq8.trainFrom(v)
        val rows = v.select(col("id"),
          graft.functions.Sq8Functions.sq8Encode(col("vec"), m.mins, m.scales)
            .as("codes"))
        (rows, m.mins.length, () => {
          import spark.implicits._
          m.mins.indices.map(i => (i, m.mins(i), m.scales(i)))
            .toDF("pos", "lo", "scale")
            .coalesce(1).write.mode("overwrite").parquet(s"$tmp/_model")
          Seq((m.mins.length, metric, buckets)).toDF("dim", "metric", "buckets")
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

  /** Driver query: the SQ8 lifecycle state machine end-to-end as one
    * deterministic table — build, frozen-model append (sub-threshold
    * dirt), delete (crossing the threshold), an on-disk read-back
    * proving the code lists really grew and shrank, and the rebuild
    * the fired policy asks for (retrain + re-encode + version 2 +
    * dirt reset, its own read-back). Phases and arithmetic are the
    * SHARED TierLifecycle.fivePhase (the point: every persisted tier
    * speaks the same state machine), so the oracle is shared too.
    */
  def sq8Lifecycle(spark: SparkSession, dir: String): DataFrame =
    TierLifecycle.fivePhase(spark, dir, "graft_sq8_lc",
      tmp => build(spark, dir, tmp),
      (vs, tmp) => append(vs, tmp),
      (ids, tmp) => delete(ids, tmp),
      (vs, tmp) => rebuild(vs, tmp))

  /** The shared tier arithmetic — phases 1-4 identical to A18b's
    * oracle, phase 5 the rebuild reset.
    */
  def sq8LifecycleOracleSql: String = TierLifecycle.tierLifecycleOracleSql
}
