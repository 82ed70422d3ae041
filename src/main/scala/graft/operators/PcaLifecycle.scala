package graft.operators

import graft.Tables
import graft.functions.{RotateFunctions, VectorFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A22b: lifecycle for a PERSISTED PCA-reduced layout — the third
  * flat tier on the shared [[TierLifecycle]] seam (with A19b SQ8 and
  * A21b BQ), finishing the §9 "persisted faces" item. PCA's own
  * parts: the `_model` sidecar (the top-d TRAINED component rows as
  * (pos, comp array<double>) — the eigenbasis comes from a driver
  * eigendecomposition, so persisting it IS the model's only home;
  * everything downstream is a codegen'd projection), `_meta`
  * (dim, rdim, buckets), the frozen-basis projection append, and the
  * reduced-space l2 disk query (optional exact re-rank against the
  * caller's primary store, Pca.topK's two-tier shape).
  */
object PcaLifecycle {

  /** Build (version+1): train the eigenbasis (Pca.train — sampled
    * covariance + driver eigSym), project every vector to d floats,
    * land the bucket-partitioned lists + sidecars.
    */
  def build(spark: SparkSession, dir: String, indexPath: String,
            d: Int = Pca.ReducedDim): IndexStatus = {
    val m = Pca.train(spark, dir)
    val n = Tables.embeddingsCount(spark, dir)
    val buckets = TierLifecycle.bucketsFor(n)
    TierLifecycle.landBuild(spark, indexPath, "pca",
      Pca.reduce(spark, dir, d).select(col("id"), col("rvec")),
      n, m.dim, buckets, () => {
        import spark.implicits._
        // the FULL square basis, not just the top d: the append must
        // replay the build's rotate-then-slice VERBATIM (RotateVector
        // is a square-matrix kernel), and at dim 64 the full matrix is
        // 32 KB — the model's only home either way
        (0 until m.dim).map(i => (i, m.basis(i).toSeq)).toDF("pos", "comp")
          .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/_model")
        Seq((m.dim, d, buckets)).toDF("dim", "rdim", "buckets")
          .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/_meta")
      })
  }

  /** The persisted full basis + dims + bucket count. */
  private[graft] def loadModel(spark: SparkSession, indexPath: String)
      : (Array[Array[Double]], Int, Int, Int) = {
    val rows = spark.read.parquet(s"$indexPath/_model")
      .orderBy("pos").collect()
    val meta = spark.read.parquet(s"$indexPath/_meta")
      .select("dim", "rdim", "buckets").head()
    (rows.map(_.getSeq[Double](1).toArray),
      meta.getInt(0), meta.getInt(1), meta.getInt(2))
  }

  /** Incremental add: project `newVecs` (id, vec) through the FROZEN
    * sidecar basis with the build's rotate-then-slice VERBATIM, so a
    * copied vector's reduced floats tie byte-exactly — and land
    * crash-consistently.
    */
  def append(newVecs: DataFrame, indexPath: String): IndexStatus = {
    val spark = newVecs.sparkSession
    val s0 = TierLifecycle.requireMutable(spark, indexPath)
    val (basis, dim, d, buckets) = loadModel(spark, indexPath)
    require(basis.length == dim && basis.forall(_.length == dim),
      "basis must be the full square matrix")
    val v = newVecs.cache()
    val n = v.count()
    val staged = v.select(
      TierLifecycle.bucketOf(col("id"), buckets).as("cluster_id"), col("id"),
      slice(RotateFunctions.rotateVector(col("vec"), basis), 1, d).as("rvec"))
    val next = TierLifecycle.appendStaged(spark, indexPath, staged, n,
      stateOpt = Some(s0))
    v.unpersist()
    next
  }

  /** Point delete: the shared PARTITION-PRUNED bucket-rewrite. */
  def delete(deleteIds: DataFrame, indexPath: String): IndexStatus = {
    TierLifecycle.requireMutable(deleteIds.sparkSession, indexPath)
    val (_, _, _, buckets) = loadModel(deleteIds.sparkSession, indexPath)
    TierLifecycle.deletePruned(deleteIds, indexPath, buckets)
  }

  /** Disk query: reduced-space l2 top-k from the stored projections
    * (d floats per candidate — dim/d of the raw scan bytes);
    * `refineWith` = the caller's raw (id, vec) store stacks the exact
    * full-space re-rank over a k·refine shortlist.
    */
  def query(spark: SparkSession, indexPath: String, queryVec: Array[Float],
            k: Int, refineWith: Option[DataFrame] = None,
            refine: Int = 8): DataFrame = {
    TierLifecycle.requireServable(spark, indexPath)
    val (basis, dim, d, _) = loadModel(spark, indexPath)
    require(queryVec.length == dim,
      s"query dim ${queryVec.length} != index dim $dim")
    val rq = Pca.reduceQuery(queryVec, Pca.Model(dim, basis, Array.empty), d)
    val rdist = VectorFunctions.l2Distance(col("rvec"), typedlit(rq.toSeq))
    val shortlist = spark.read.parquet(indexPath)
      .select(col("id").as("neighbor_id"), rdist.as("dist"))
      .orderBy(col("dist"), col("neighbor_id"))
    refineWith match {
      case None => shortlist.limit(k)
      case Some(raw) =>
        val exact = Ivf.distCol(graft.functions.VectorMetric.L2,
          col("vec"), typedlit(queryVec.toSeq))
        shortlist.limit(k * math.max(1, refine)).select(col("neighbor_id"))
          .join(raw.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
          .select(col("neighbor_id"), exact.as("dist"))
          .orderBy(col("dist"), col("neighbor_id"))
          .limit(k)
    }
  }

  /** Out-of-band rebuild (the shared [[TierLifecycle.rebuild]] with
    * PCA's own parts): re-run the sampled covariance +
    * eigendecomposition on the current contents, re-project every
    * vector through the NEW basis (rotate-then-slice, the build's
    * kernel), re-level buckets, staged swap. The tree's reduced dim
    * is kept across rebuilds (the serving contract's shape).
    */
  def rebuild(currentVecs: DataFrame, indexPath: String): IndexStatus = {
    val spark = currentVecs.sparkSession
    val s0 = TierLifecycle.requireRebuildable(spark, indexPath)
    val (_, _, d, _) = loadModel(spark, indexPath)
    TierLifecycle.rebuild(currentVecs, indexPath, "pca", (v, buckets, tmp) => {
      val m = Pca.trainFrom(v)
      val rows = v.select(col("id"),
        slice(RotateFunctions.rotateVector(col("vec"), m.basis), 1, d).as("rvec"))
      (rows, m.dim, () => {
        import spark.implicits._
        (0 until m.dim).map(i => (i, m.basis(i).toSeq)).toDF("pos", "comp")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/_model")
        Seq((m.dim, d, buckets)).toDF("dim", "rdim", "buckets")
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

  /** Driver query: the shared five-phase state machine over the PCA
    * tree (TierLifecycle.fivePhase — the A18b arithmetic for phases
    * 1-4, the rebuild reset as phase 5).
    */
  def pcaLifecycle(spark: SparkSession, dir: String): DataFrame =
    TierLifecycle.fivePhase(spark, dir, "graft_pca_lc",
      tmp => build(spark, dir, tmp),
      (vs, tmp) => append(vs, tmp),
      (ids, tmp) => delete(ids, tmp),
      (vs, tmp) => rebuild(vs, tmp))

  def pcaLifecycleOracleSql: String = TierLifecycle.tierLifecycleOracleSql
}
