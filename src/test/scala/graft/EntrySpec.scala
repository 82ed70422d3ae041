package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage of the driver contract on sf0.001: every declared
  * query runs and returns rows, and every query has an oracle (or is
  * knowingly rows-only).
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001 and returns rows") {
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("oracle coverage: every query key has oracle SQL or is documented rows-only") {
    // spec-covered, no SQL-expressible oracle (k-means / probabilistic
    // LSH / approximate-by-design serving path)
    val rowsOnly = Set("ivf_build", "dedup_minhash_lsh", "dedup_simhash",
      "embedding_neardup_lsh", "index_stats", "events_sketch",
      "ivf_query_nprobe", "pq_topk", "pq_topk_opq", "ivfpq_topk", "ann_topk_batch_nprobe",
      "ann_topk_batch_pq", "ann_topk_batch_pq_cos", "ann_topk_batch_pq_refined",
      "ann_topk_batch_pq_dot", "sq8_topk", "bq_topk", "pca_topk",
      "bpe_train", "token_count_bpe")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
