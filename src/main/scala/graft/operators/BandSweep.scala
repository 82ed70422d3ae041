package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E49: `lsh_band_sweep` — the MinHash-LSH BANDING curve, completing
  * the tuning-report family: E45 sweeps the Jaccard THRESHOLD, E50
  * sweeps the coarse index's nprobe, A24 sweeps the quantization tier,
  * and this sweeps the (bands b, rows r) split of the 128-position
  * signature — the knob the published S-curve P(candidate) =
  * 1 − (1 − s^r)^b actually turns (Leskovec/Rajaraman/Ullman ch. 3;
  * the parameter every at-scale fuzzy-dedup recipe fixes up front and
  * rarely re-measures). E3 serves at 16×8; this key answers what that
  * choice buys and costs against its neighbors 8×16 and 32×4 ON THE
  * CORPUS ACTUALLY SERVED, with the same verify bar and the same skew
  * guard as the serving pipeline.
  *
  * Per config (b ∈ {8, 16, 32}, r = 128/b), all exact integers:
  *   - `raw_pair_mass`: Σ_buckets C(n,2) — the UNCAPPED combinatorial
  *     candidate mass (the join fan-out the config would pay with no
  *     skew guard; computed from bucket SIZES, never materialized as
  *     pairs). Band boundaries nest across the power-of-two grid
  *     (width-2r band = two adjacent width-r bands), so a bucket
  *     co-occurrence at b bands implies ≥ 2 at 2b bands —
  *     `raw_pair_mass(2b) ≥ 2·raw_pair_mass(b)`, a theorem the spec
  *     pins, and the cost axis of the S-curve.
  *   - `n_candidates`: distinct candidate pairs through the SERVED
  *     pipeline (bucket cap [[Dedup.LshBucketCap]] applied per config —
  *     the cap is the skew guard, and the sweep measures the pipeline
  *     with its guard on, not an idealization).
  *   - `n_verified`: candidates passing EXACT shingle-set Jaccard ≥
  *     0.8 — by definition a subset of E2's exact pair graph, so
  *     `recall_permille = 1000·n_verified div n_exact` is a true
  *     recall against the exact contract ([[Dedup.ngramJaccardPairs]],
  *     the prefix-filtered graph, memoized).
  *   - `precision_permille` = 1000·n_verified div n_candidates: the
  *     share of proposed pairs worth verifying — the verify-cost axis.
  *
  * One-materialization shape (the E45/A24/E50 lesson applied from day
  * one): the three configs' candidate sets are unioned with a config
  * tag, the exact-Jaccard verify join runs ONCE over the DISTINCT
  * union pairs (localCheckpoint-pinned — the verify join-back is the
  * dominant cost and must not run per grid point), and each config's
  * row is an aggregation over tag ∩ verdict. The signature table and
  * the exact graph's prefix table are the session memos E3/E2 already
  * ride — nothing retrains or re-shingles.
  *
  * At 100 TB: bucket rows are O(docs × Σb) skinny longs; the
  * per-config self-joins are bucket-key shuffles with the cap bounding
  * fan-out; the verify join touches only distinct proposed pairs. The
  * sweep costs roughly the serving pass × the grid's band-mass ratio,
  * and runs over a deterministic doc sample when the corpus is the
  * full crawl (E14's hash filter, same argument as E50).
  *
  * Rows-only by design (the D13/E3/E42 standing structural argument:
  * candidates ride Spark-native xxhash64 minhashes; mirroring the hash
  * in DuckDB would tax the 100 TB hot path to make a test easier) —
  * BandSweepSpec pins the grid shape, the mass-doubling theorem, the
  * E3-agreement pin at 16×8, and measured recall floors at two SFs.
  */
object BandSweep {

  /** Band counts swept; rows per band = 128/b. 16 is E3's serving
    * config; 8 trades recall for fan-out, 32 the reverse.
    */
  val BandGrid: Seq[Int] = Seq(8, 16, 32)

  def lshBandSweep(spark: SparkSession, dir: String): DataFrame =
    lshBandSweepOn(spark, Dedup.signaturesFor(spark, dir),
      Dedup.ngramJaccardPairs(spark, dir))

  /** The sweep over an arbitrary signature table + exact pair graph —
    * the synthetic-corpus entry the spec drives.
    */
  private[graft] def lshBandSweepOn(spark: SparkSession, sig: DataFrame,
                                    exactPairs: DataFrame): DataFrame = {
    import spark.implicits._
    val nExact = exactPairs.count()

    // ONE tagged band table for the whole grid (round-16): the three
    // configs used to pay one bucket-size shuffle + one sequential
    // driver head() + one capped self-join EACH; tagging the band rows
    // with their config turns that into one size aggregation, one
    // masses job, and ONE self-join keyed on (bands, band_id,
    // band_hash) — identical rows per config, a third of the jobs
    val bandsAll = BandSweep.BandGrid
      .map(b => Dedup.bandsOfN(sig, b).withColumn("bands", lit(b)))
      .reduce(_.unionByName(_))
    val sizes = bandsAll.groupBy("bands", "band_id", "band_hash")
      .agg(count(lit(1)).as("bucket_n"))
      .localCheckpoint(true) // feeds the masses job AND the cap join
    // raw mass from bucket SIZES (a bounded aggregate; C(n,2) stays
    // integer via div) — same expression as before, grouped per config
    val massRows = sizes.groupBy("bands")
      .agg(expr("coalesce(sum((bucket_n * (bucket_n - 1)) div 2), 0L)").as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // same guard shape as E3: drop mega-buckets before the self-join
    val capped = bandsAll.join(
      sizes.filter(col("bucket_n") <= Dedup.LshBucketCap),
      Seq("bands", "band_id", "band_hash"))
    // verify ONCE over the distinct union — the expensive join-back is
    // paid one time, each grid row filters the pinned verdict table.
    // `tagged` is itself pinned eagerly: it feeds BOTH verdicts and the
    // final aggregation, so without the checkpoint the band self-join
    // (the dominant cost) would execute twice.
    val tagged = capped.as("a")
      .join(capped.as("b"),
        col("a.bands") === col("b.bands") &&
          col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.bands").as("bands"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("bands", "doc_a", "doc_b")
      .localCheckpoint(true)
    sizes.unpersist() // both consumers materialized
    val verdicts = Dedup.verifyJaccard(
      tagged.select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b"),
      sig.select(col("doc_id"), col("g")),
      Dedup.JaccardThreshold, Skew.PairSalts(1, 1))
      .select(col("doc_a"), col("doc_b"), lit(1L).as("is_dup"))
      .localCheckpoint(true)

    val masses = BandSweep.BandGrid
      .map(b => (b, 128 / b, massRows.getOrElse(b, 0L)))
      .toDF("bands", "rows_per_band", "raw_pair_mass")

    // masses always carries one row per grid config, so it is the LEFT
    // side: a config whose capped candidate set is empty (every bucket
    // over the cap, or no collisions at all) still emits its row with
    // zero candidates instead of silently dropping out of the report.
    val candAgg = tagged.join(verdicts, Seq("doc_a", "doc_b"), "left")
      .groupBy("bands")
      .agg(count(lit(1)).as("n_candidates"),
        coalesce(sum(col("is_dup")), lit(0L)).as("n_verified"))

    masses.join(candAgg, Seq("bands"), "left")
      .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
      .withColumn("n_verified", coalesce(col("n_verified"), lit(0L)))
      .withColumn("n_exact", lit(nExact))
      .selectExpr(
        "CAST(bands AS INT) AS bands",
        "CAST(rows_per_band AS INT) AS rows_per_band",
        "raw_pair_mass",
        "n_candidates", "n_verified", "n_exact",
        "CASE WHEN n_exact > 0 THEN (n_verified * 1000) div n_exact ELSE 0 END AS recall_permille",
        "CASE WHEN n_candidates > 0 THEN (n_verified * 1000) div n_candidates ELSE 0 END AS precision_permille")
      .orderBy("bands")
  }
}
