package graft

import graft.operators.DriftReport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A25 index_drift_report contracts: profile totals and per-cluster
  * arithmetic against the corpus split, auditable zeros on the
  * uniform fixture split, both flags firing on a hand-built shifted
  * residual table (with hand-computed expected values), manifest
  * temp-tree cleanup, and determinism.
  */
class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val report = DriftReport.indexDriftReport(spark, sf).collect()

  test("profile totals match the corpus and the fixture split") {
    val nAll = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val nBase = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(DriftReport.ArrivalMod)) =!= DriftReport.ArrivalRem)
      .count()
    assert(report.map(_.getLong(2)).sum == nAll, "sum(n_cur) = corpus size")
    assert(report.map(_.getLong(1)).sum == nBase, "sum(n_base) = baseline size")
    report.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1), "delta_n arithmetic")
      assert(r.getLong(4) <= 1000 && r.getLong(5) <= 1000, "shares are permille")
      assert(r.getLong(1) <= r.getLong(2),
        "baseline is a subset of current, so n_base <= n_cur per cluster")
    }
  }

  test("auditable zeros: the uniform 10% split moves no cluster past either flag") {
    // arrivals are a uniform id-stride sample, so shares barely move
    // and residual means are stable — both flags must be checkably 0
    // (the E48 precedent: a zero the oracle verifies, not an untested
    // branch)
    assert(report.map(_.getLong(8)).sum == 0, "growth_flag all zero")
    assert(report.map(_.getLong(9)).sum == 0, "resid_flag all zero")
  }

  test("both flags fire on a shifted corpus (hand-computed expectations)") {
    import spark.implicits._
    // baseline: 40 vectors spread evenly over clusters 0-3 at residual
    // 100; arrivals (id >= 1000): 30 pile into cluster 0 at residual
    // 1000, one lands in brand-new cluster 9
    val base = (0 until 40).map(i => (i.toLong, i % 4, 100L))
    val pile = (0 until 30).map(i => (1000L + i, 0, 1000L))
    val fresh = Seq((2000L, 9, 500L))
    val d = (base ++ pile ++ fresh).toDF("vec_id", "cluster_id", "dist_q")
    val out = DriftReport.driftFrom(spark, d, col("vec_id") >= 1000L)
      .collect().map(r => r.getInt(0) -> r).toMap

    val c0 = out(0)
    assert(c0.getLong(1) == 10 && c0.getLong(2) == 40 && c0.getLong(3) == 30)
    // share: 10*1000 div 40 = 250 -> 40*1000 div 71 = 563
    assert(c0.getLong(4) == 250 && c0.getLong(5) == 563)
    // mean residual: 100 -> (10*100 + 30*1000) div 40 = 775
    assert(c0.getLong(6) == 100 && c0.getLong(7) == 775)
    // growth: 40*40=1600 > 2*10*71=1420; resid: 31000*10 > 2*1000*40
    assert(c0.getLong(8) == 1 && c0.getLong(9) == 1)

    val c9 = out(9)
    assert(c9.getLong(1) == 0 && c9.getLong(2) == 1)
    assert(c9.getLong(6) == 0 && c9.getLong(7) == 500)
    assert(c9.getLong(8) == 1, "a brand-new cluster flags growth by construction")
    assert(c9.getLong(9) == 0, "resid flag stays integer-false at n_base = 0")

    for (c <- 1 to 3) {
      assert(out(c).getLong(8) == 0 && out(c).getLong(9) == 0,
        s"untouched cluster $c must not flag")
    }
  }

  test("manifest round-trip cleans its temp tree") {
    DriftReport.indexDriftReport(spark, sf).count()
    val leaked = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_drift"))
    assert(leaked.isEmpty, s"drift manifest leaked: ${leaked.mkString(", ")}")
  }

  test("determinism: two invocations agree exactly") {
    val again = DriftReport.indexDriftReport(spark, sf).collect()
    assert(report.toSeq == again.toSeq)
  }
}
