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
    // spec-covered, no SQL-expressible oracle: Spark-native xxhash64
    // candidate generation (minhash/simhash), approximate-by-contract
    // sketch estimates, and the inherently iterative BPE merge loop
    val rowsOnly = Set("dedup_minhash_lsh",
      "events_sketch", "bpe_train", "token_count_bpe",
      // the card's learned-tokenizer slice rides the BPE merge loop
      // (BpeSpec pins the rollup ≡ E22b's per-doc counts)
      "corpus_profile_bpe",
      // the composed fuzzy pass rides E3's xxhash64 candidates; its
      // end-to-end agreement with the oracle-checked E16 is pinned in
      // DedupSpec (containment + ≥0.95 survivor-set agreement, two SFs)
      "pipeline_fuzzy_dedup",
      // its continuous-ingest twin (same hash reason; StreamsSpec pins
      // the cross-batch store drop on planted multi-batch arrivals)
      "stream_dedup_fuzzy",
      // D13's periodical rides the same signature store (StreamsSpec
      // pins the non-transitive chain and delta ≡ a from-scratch batch
      // component pass over the same doc set)
      "stream_dedup_reconcile",
      // the banding sweep proposes candidates from the same xxhash64
      // minhashes (BandSweepSpec pins the mass-doubling theorem, the
      // E3 agreement at 16×8, and measured recall floors at two SFs)
      "lsh_band_sweep")
    val covered = SparkEntry.oracleSql.keySet ++ SparkEntry.dynamicOracleSql.keySet
    val missing = SparkEntry.queries.keySet -- covered -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    // rows-only means rows-only: a key with an oracle must not hide there
    assert((rowsOnly & covered).isEmpty,
      s"rows-only keys that actually have oracles: ${rowsOnly & covered}")
    // every oracle belongs to a real query key
    assert((covered -- SparkEntry.queries.keySet).isEmpty,
      s"orphan oracles: ${covered -- SparkEntry.queries.keySet}")
  }
}
