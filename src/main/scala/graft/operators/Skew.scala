package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One key the frequency probe flagged as hot: `estCount` scaled back
  * to the full frame, `frac` its share of all rows, `salts` the split
  * that brings its biggest slice back to roughly one average task.
  */
case class HotKey(key: Any, estCount: Long, frac: Double, salts: Int)

/** Skew mitigation for hot join keys (SURVEY §5: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's runtime skew-join split handles most cases for free; salting
  * is the explicit fallback when a single key's rows exceed what one
  * task can hold (a viral document id, a null-heavy foreign key, a
  * boilerplate-dominated shingle) — the situation where a shuffle join
  * stalls on one straggler task at 100 TB. The salted join splits each
  * hot key across `salts` shuffle partitions by widening the join key,
  * at the cost of replicating the right side `salts`×, so it fits the
  * skewed-fact × modest-dim shape (dim too large to broadcast, small
  * enough to replicate a few ways).
  */
object Skew {

  /** Equivalent to `left.join(right, key)` (inner), with each left key
    * spread over `salts` shuffle partitions.
    *
    * The left salt is a deterministic hash of the whole row (a pure
    * function of the data, never of partitioning — reruns salt
    * identically); the right side is replicated once per salt value via
    * a tiny explode, and the join key widens to (key, salt). Correct
    * for any multiplicity: every (left-row, right-row) pair with equal
    * keys still meets on exactly one salt value.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val lCols = left.columns.map(col).toSeq
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(lCols: _*), lit(salts.toLong)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** A key is "hot" when its row share exceeds `skewFactor` average
    * shuffle-partition loads — the same shape AQE's skew detector uses
    * (skewedPartitionFactor: a partition ≥ 5× the median is skewed).
    * Below that, AQE's runtime split already handles it; above it, one
    * KEY (not partition) holds the rows and only salting helps.
    */
  val SkewFactor = 5.0

  /** Minimum SAMPLED rows a key needs before it can be flagged hot.
    * Without this floor a tiny sample degenerates: when
    * total·min(SkewFactor/p, 0.5) < 1 every key with a single sampled
    * row would cross the threshold and uniform data would be
    * "recommended" for salting. Ten sampled rows keeps the flag
    * evidence-backed (a key that truly holds ≥ SkewFactor/p of a frame
    * worth salting will clear 10 at any realistic sample).
    */
  val MinSampledRows = 10L

  /** Sampled key-frequency probe — the missing "am I skewed?" half of
    * [[saltedJoin]], so a user needs no prior knowledge of the hot key.
    *
    * Scale shape: ONE pass over a Bernoulli sample (deterministic
    * seed), a map-side-combined count per key, and only the top
    * `maxKeys` sampled counts reach the driver — O(sample) work and a
    * bounded collect at any corpus size. Each flagged key gets the
    * salt count that spreads it back to ~1 average task:
    * ceil(frac · shufflePartitions).
    */
  def detectHotKeys(df: DataFrame, key: String,
                    sampleFraction: Double = 0.01,
                    maxKeys: Int = 20): Seq[HotKey] = {
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sampled =
      if (sampleFraction >= 1.0) df.select(col(key))
      else df.select(col(key)).sample(withReplacement = false, sampleFraction, seed = 0xf00dL)
    val counts = sampled.groupBy(col(key)).agg(count(lit(1)).as("n")).cache()
    try {
      // sum over an empty frame is NULL, not 0 — an empty (or fully
      // sampled-out) input must probe as "no skew", not throw
      val total = Option(counts.agg(sum(col("n"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      if (total == 0) Seq.empty
      else {
        // threshold share min(SkewFactor/p, 0.5): the factor-of-5 rule
        // needs p > 10 to be satisfiable at all (frac caps at 1), and a
        // key holding half the rows is a straggler at ANY partition
        // count — the cap keeps the probe meaningful on small/local p
        val threshold = math.min(SkewFactor / p, 0.5) * total
        counts.filter(col("n") >= math.max(MinSampledRows.toDouble, threshold))
          .orderBy(col("n").desc, col(key))
          .limit(maxKeys)
          .collect()
          .map { r =>
            val n = r.getLong(1)
            val frac = n.toDouble / total
            HotKey(r.get(0), math.round(n / sampleFraction),
              frac, math.max(1, math.ceil(frac * p).toInt))
          }.toSeq
      }
    } finally counts.unpersist()
  }

  /** One number for the whole join: the max per-key salt count, or 1
    * when nothing crosses the skew threshold (= AQE suffices, use the
    * plain join).
    */
  def recommendSalts(df: DataFrame, key: String,
                     sampleFraction: Double = 0.01): Int =
    detectHotKeys(df, key, sampleFraction).map(_.salts).maxOption.getOrElse(1)

  /** Salt counts for the two join-back sides of a bucket-generated
    * candidate-pair verification: the `id_a` side and the `id_b` side
    * are DIFFERENT hot-key questions under the `id_a < id_b` candidate
    * orientation — a hot id that is the LARGEST in its buckets
    * contributes only b-side pairs and is invisible to an a-side-only
    * estimate (the round-6 blind spot).
    */
  case class PairSalts(aSide: Int, bSide: Int)

  /** Salt decision for a bucket-generated candidate-pair join, derived
    * from the exploded (id, bucket) table BEFORE the pair join exists.
    *
    * Probing the candidate stream itself means EXECUTING the candidate
    * self-join once extra per invocation — measured as a 1.6× slowdown
    * on the embedding-LSH dedup path. But the pair fan-out is already
    * determined by the bucket table: under the `id_a < id_b` candidate
    * orientation, a row of bucket B contributes exactly
    * |{partners in B with a larger id}| a-side pairs AND
    * |{partners in B with a smaller id}| b-side pairs, so BOTH hot-key
    * shares come from one windowed count + one aggregation over the
    * SKINNY bucket table — no pair materialization. (Pairs colliding in
    * several buckets count once per bucket; that uniform inflation
    * cancels in the share for clique-shaped skew, and on paths that
    * keep candidates duplicated through verification it is exact. The
    * estimate intentionally ignores downstream size-ratio pruning and
    * candidate dedup — those only REMOVE pairs roughly uniformly, so
    * the share survives; an over-estimate costs a few extra salt
    * replicas, never correctness.)
    *
    * Same hot-key rule as [[detectHotKeys]], applied per side: flag
    * when the max id's share of estimated pairs exceeds
    * min(SkewFactor/p, 0.5) with at least [[MinSampledRows]] estimated
    * pairs of evidence; salts spread the hot id back to ~1 average
    * task.
    */
  def recommendPairSaltsFromBuckets(exploded: DataFrame, idCol: String,
                                    bucketCols: Seq[String]): PairSalts = {
    import org.apache.spark.sql.expressions.Window
    val p = exploded.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val bucket = Window.partitionBy(bucketCols.map(col): _*)
    val ordered = bucket.orderBy(col(idCol))
    val perId = exploded
      .select(col(idCol),
        (count(lit(1)).over(bucket) - row_number().over(ordered)).as("_fan_a"),
        (row_number().over(ordered) - lit(1)).as("_fan_b"))
      .groupBy(col(idCol))
      .agg(sum(col("_fan_a")).as("_est_a"), sum(col("_fan_b")).as("_est_b"))
    val row = perId.agg(sum(col("_est_a")), max(col("_est_a")),
      sum(col("_est_b")), max(col("_est_b"))).head()
    def side(totIdx: Int, maxIdx: Int): Int = {
      val total = Option(row.get(totIdx)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val maxEst = Option(row.get(maxIdx)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val threshold = math.max(MinSampledRows.toDouble,
        math.min(SkewFactor / p, 0.5) * total)
      if (total == 0L || maxEst < threshold) 1
      else math.max(1, math.ceil(maxEst.toDouble / total * p).toInt)
    }
    PairSalts(side(0, 1), side(2, 3))
  }

  /** The a-side salt count alone (the original round-6 surface). */
  def recommendSaltsFromBuckets(exploded: DataFrame, idCol: String,
                                bucketCols: Seq[String]): Int =
    recommendPairSaltsFromBuckets(exploded, idCol, bucketCols).aSide
}
