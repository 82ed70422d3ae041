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
    val rowsOnly = Set("ivf_build", "ivf_query", "dedup_minhash_lsh", "dedup_simhash",
      "stream_window_agg", "stream_dedup", "stream_session")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
