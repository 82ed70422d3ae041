package graft

import graft.functions.SketchFunctions
import graft.operators.Analytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Space-Saving contracts, both regimes:
  *   - exact (capacity ≥ domain, the oracle-checked driver config):
  *     summary IS the frequency table, err = 0;
  *   - eviction (capacity ≪ domain, the 100 TB config): est ≥ true,
  *     est − true ≤ err ≤ n/capacity, and every item whose true count
  *     exceeds n/capacity is present — the Metwally et al. guarantees,
  *     which must also survive map-side partial aggregation + merge.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Skewed synthetic stream: item i ∈ [0,5) appears 2^(9-i)·10 times
    * (heavy head), items 1000..1499 once each (long tail).
    */
  private def skewed = {
    val head = (0 until 5).flatMap(i => Seq.fill((1 << (9 - i)) * 10)(i.toLong))
    val tail = (1000L until 1500L)
    head ++ tail
  }

  private def summarize(items: Seq[Long], capacity: Int,
                        partitions: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val df = items.toDF("item").repartition(partitions)
    val rows = df.agg(SketchFunctions.spaceSaving(col("item"), capacity).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est"), col("h.err"))
      .collect()
    rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("exact regime: summary equals the exact frequency table with zero error") {
    val items = skewed
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 8)) {
      val s = summarize(items, capacity = 4096, partitions = parts)
      assert(s.size == truth.size)
      truth.foreach { case (k, n) =>
        assert(s(k) == ((n, 0L)), s"item $k: ${s(k)} != ($n, 0) at $parts partitions")
      }
    }
  }

  test("eviction regime: Space-Saving guarantees hold, single partition and merged") {
    val items = skewed
    val n = items.size.toLong
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val capacity = 16
    for (parts <- Seq(1, 8)) {
      val s = summarize(items, capacity, partitions = parts)
      assert(s.size <= capacity)
      // overestimate-with-bound, per tracked item
      s.foreach { case (k, (est, err)) =>
        val t = truth.getOrElse(k, 0L)
        assert(est >= t, s"item $k underestimated: $est < $t ($parts parts)")
        assert(est - t <= err, s"item $k error exceeds its bound ($parts parts)")
      }
      // merged partials sum per-partition bounds: err <= n/capacity per
      // summary, so the merged bound is still <= n/capacity overall
      // only in the 1-partition case; merged errs stay <= n/capacity
      // because every partial's evictions are bounded by ITS stream
      // share. Check the universal bound:
      s.foreach { case (k, (_, err)) =>
        assert(err <= n / capacity,
          s"item $k err $err > n/capacity ${n / capacity} ($parts parts)")
      }
      // completeness: every true heavy hitter above n/capacity tracked
      truth.filter(_._2 > n / capacity).keys.foreach { k =>
        assert(s.contains(k), s"heavy hitter $k missing ($parts parts)")
      }
      // the heavy head must rank by true count among the tracked items
      val top5 = s.toSeq.sortBy { case (k, (est, _)) => (-est, k) }.take(5).map(_._1)
      assert(top5.toSet == Set(0L, 1L, 2L, 3L, 4L), s"head misranked: $top5")
    }
  }

  test("driver key: exact top-10 with deterministic tie order") {
    val rows = Analytics.eventsHeavyHitters(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    assert(rows.forall(_.getLong(3) == 0L), "exact-capacity run must carry zero error")
    // matches the exact groupBy-count ranking
    val exact = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).toSeq == exact)
  }
}
