package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A25: `index_drift_report` — per-cluster EMBEDDING-DISTRIBUTION
  * drift of the served index against a persisted baseline profile:
  * the distribution-based rebuild signal beside the reference's
  * count-based one. The reference rebuilds when enough vectors have
  * ARRIVED (services/index_service.py:56-198 `should_rebuild`, the
  * policy D12 runs as a stream); but a quantizer goes stale by WHERE
  * arrivals land, not just how many — 10⁶ new vectors spread evenly
  * need no retrain, 10⁵ piling into two clusters (a new domain, a new
  * language, an embedding-model change upstream) mean those lists
  * scan long and their centroids sit off-mass. This key is the
  * dashboard that distinguishes the two, completing the index-health
  * family: A23 (balance NOW), E38 (outliers NOW), A25 (movement SINCE
  * THE BASELINE) — the vector-side sibling of E47's doc-level
  * snapshot diff.
  *
  * Baseline protocol (E47's manifest device): the baseline state is
  * derived deterministically from the corpus — vectors with
  * vec_id % 10 == 7 are "arrivals since the profile was taken", the
  * rest are the baseline. The per-cluster baseline profile
  * (cluster_id, n_base, rsum_base) is WRITTEN to parquet and read
  * back before diffing — the report runs against the persisted
  * artifact, exactly as a real deployment diffs against the profile
  * file its last rebuild wrote (a real system swaps the fixture
  * filter for that file; rebuilds refresh it).
  *
  * Both states assign to the SAME frozen session centroids (drift is
  * measured against the quantizer being served — retraining first
  * would erase the signal being measured), through the ONE residual
  * seam [[Ivf.residualsQ]] E38 also reads (shared-seam: the two
  * health reports cannot drift on the quantization grid). Residuals
  * are floor(l2·1e6) BIGINTs quantized before aggregation, so cluster
  * sums are order-independent and every output column is exact
  * integer arithmetic: per-cluster counts and permille corpus shares
  * for both states, integer-division mean residuals, and two
  * cross-multiplied flags — `growth_flag` (the cluster's corpus share
  * more than DOUBLED: n_cur·total_base > 2·n_base·total_cur; fires
  * for brand-new clusters by construction) and `resid_flag` (mean
  * residual more than doubled: rsum_cur·n_base > 2·rsum_base·n_cur —
  * arrivals landing far from the frozen centroid). On the uniform
  * test split both flags are auditably zero (the E48 precedent: a
  * report whose zeros are checkable beats one that only fires on
  * fireworks); DriftSpec drives a shifted synthetic corpus where both
  * fire.
  *
  * Scale shape: one residual scan per state over the broadcast
  * centroid join (the session index memo — no retrain, no pairwise
  * work), two k-row profiles, totals via a whole-frame window over
  * the CLUSTER-count-sized table (E46's no-second-scan rule), one
  * k-row join. The flag cross-products stay inside BIGINT to ~10⁹
  * vectors·10⁹ total; past that the profile arithmetic stages through
  * DECIMAL (the E29/E31 note).
  */
object DriftReport {

  /** Arrival fixture: vec_id % 10 == 7 joined the corpus after the
    * baseline profile was written.
    */
  val ArrivalMod = 10L
  val ArrivalRem = 7L

  def indexDriftReport(spark: SparkSession, dir: String): DataFrame =
    driftFrom(spark, Ivf.residualsQ(spark, dir),
      pmod(col("vec_id"), lit(ArrivalMod)) === ArrivalRem)

  /** The report over an arbitrary residual table (vec_id, cluster_id,
    * dist_q) and arrival predicate — the synthetic entry DriftSpec
    * drives a shifted corpus through (both flags fire there).
    */
  private[graft] def driftFrom(spark: SparkSession, d: DataFrame,
                               isArrival: org.apache.spark.sql.Column): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift")
    try {
      d.filter(!isArrival)
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_base"), sum(col("dist_q")).as("rsum_base"))
        .write.mode("overwrite").parquet(tmp.resolve("profile").toString)
      val base = spark.read.parquet(tmp.resolve("profile").toString)
      val cur = d.groupBy("cluster_id")
        .agg(count(lit(1)).as("n_cur"), sum(col("dist_q")).as("rsum_cur"))
      diffProfiles(base, cur)
    } finally graft.streaming.Streams.deleteTree(tmp)
  }

  /** The per-cluster diff + flag arithmetic over a BASELINE profile
    * (cluster_id, n_base, rsum_base) and a CURRENT profile
    * (cluster_id, n_cur, rsum_cur) — the ONE definition shared by the
    * A25 report and the PqLifecycle drift-rebuild policy (which diffs
    * against the `_profile` sidecar its last build wrote), so the
    * dashboard and the policy can never disagree on what "drifted"
    * means.
    */
  private[operators] def diffProfiles(base: DataFrame, cur: DataFrame): DataFrame =
    diffProfilesLazy(base, cur)
      .orderBy("cluster_id")
      .localCheckpoint(true)

  /** [[diffProfiles]] without the report's ordering + eager pin — the
    * POLICY entry (PqLifecycle.driftShouldRebuild consults this on a
    * cadence and only needs an any-flag existence check; paying a full
    * sort + a never-unpersisted checkpointed RDD per consult would
    * leak executor storage across a long-lived session).
    */
  private[operators] def diffProfilesLazy(base: DataFrame, cur: DataFrame): DataFrame = {
    val j = cur.join(base, Seq("cluster_id"), "left")
      .select(col("cluster_id"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("rsum_base"), lit(0L)).as("rsum_base"),
        col("n_cur"), col("rsum_cur"))
    val whole = Window.partitionBy()
    j.withColumn("total_base", sum(col("n_base")).over(whole))
      .withColumn("total_cur", sum(col("n_cur")).over(whole))
      .selectExpr(
        "cluster_id",
        "n_base", "n_cur",
        "n_cur - n_base AS delta_n",
        "(n_base * 1000) div total_base AS share_pm_base",
        "(n_cur * 1000) div total_cur AS share_pm_cur",
        "rsum_base div greatest(n_base, 1) AS mean_r_base_q",
        "rsum_cur div n_cur AS mean_r_cur_q",
        "CAST(n_cur * total_base > 2 * n_base * total_cur AS BIGINT) AS growth_flag",
        "CAST(rsum_cur * n_base > 2 * rsum_base * n_cur AS BIGINT) AS resid_flag")
  }

  /** Dynamic oracle: assignment + residual quantization replayed over
    * the centroid literal (E38's replay), both state profiles rebuilt
    * from the same deterministic split, identical integer arithmetic.
    * The oracle recomputes the baseline rather than reading the
    * manifest (E47's convention — the round-trip is engine-side,
    * pinned by DriftSpec).
    */
  def indexDriftReportOracleSql(spark: SparkSession, dir: String): String = {
    val (_, cents) = Ivf.indexFor(spark, dir)
    s"""WITH ${Ivf.assignCtes(cents)},
       |d AS (
       |  SELECT vec_id, CAST(cid AS INTEGER) AS cluster_id,
       |    CAST(floor(dist * 1e6) AS BIGINT) AS dist_q
       |  FROM asg),
       |base AS (
       |  SELECT cluster_id, count(*) AS n_base, sum(dist_q) AS rsum_base
       |  FROM d WHERE vec_id % $ArrivalMod <> $ArrivalRem GROUP BY 1),
       |cur AS (
       |  SELECT cluster_id, count(*) AS n_cur, sum(dist_q) AS rsum_cur
       |  FROM d GROUP BY 1),
       |j AS (
       |  SELECT c.cluster_id,
       |    coalesce(b.n_base, 0) AS n_base, coalesce(b.rsum_base, 0) AS rsum_base,
       |    c.n_cur, c.rsum_cur
       |  FROM cur c LEFT JOIN base b USING (cluster_id)),
       |t AS (
       |  SELECT *, sum(n_base) OVER () AS total_base,
       |    sum(n_cur) OVER () AS total_cur
       |  FROM j)
       |SELECT cluster_id,
       |  CAST(n_base AS BIGINT) AS n_base,
       |  CAST(n_cur AS BIGINT) AS n_cur,
       |  CAST(n_cur - n_base AS BIGINT) AS delta_n,
       |  CAST((n_base * 1000) // total_base AS BIGINT) AS share_pm_base,
       |  CAST((n_cur * 1000) // total_cur AS BIGINT) AS share_pm_cur,
       |  CAST(rsum_base // greatest(n_base, 1) AS BIGINT) AS mean_r_base_q,
       |  CAST(rsum_cur // n_cur AS BIGINT) AS mean_r_cur_q,
       |  CAST(n_cur * total_base > 2 * n_base * total_cur AS BIGINT) AS growth_flag,
       |  CAST(rsum_cur * n_base > 2 * rsum_base * n_cur AS BIGINT) AS resid_flag
       |FROM t ORDER BY cluster_id""".stripMargin
  }
}
