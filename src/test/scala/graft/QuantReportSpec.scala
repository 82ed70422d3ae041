package graft

import graft.operators.QuantReport
import org.scalatest.funsuite.AnyFunSuite

/** A24 quant_tier_report contracts: grid shape, refine monotonicity
  * (a true top-k member present in a shortlist is never displaced by
  * growing it — at most k−1 vectors rank before it globally), the
  * measured tier floors at sf0.001 (everything in the pipeline is
  * deterministic — hash-sampled training, seeded Lloyd, (dist, id)
  * tie-breaks — so these are exact reproducible values, pinned with
  * a small safety margin only against future intentional retunes),
  * and the ladder's two headline orderings: SQ8 near-exact at 4×,
  * OPQ never below PQ at the same byte budget.
  */
class QuantReportSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    QuantReport.quantTierReport(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("grid shape: 6 tiers x 4 refines, consistent sample and budgets") {
    assert(rows.size == 24)
    val tiers = rows.keySet.map(_._1)
    assert(tiers == Set("sq8", "pq", "opq", "pqr", "bq", "pca"))
    rows.foreach { case ((t, r), (cand, nq, hits, permille)) =>
      assert(QuantReport.Refines.contains(r.toInt), s"$t refine $r")
      assert(cand == 10 * r, s"$t/$r cand_per_query")
      assert(nq == 30, s"$t/$r n_queries at sf0.001")
      assert(hits <= nq * 10 && permille <= 1000, s"$t/$r bounds")
      assert(permille == hits * 1000 / (nq * 10), s"$t/$r permille arithmetic")
    }
  }

  test("recall is monotone in refine depth within every tier") {
    for (t <- Seq("sq8", "pq", "opq", "pqr", "bq", "pca");
         Seq(a, b) <- QuantReport.Refines.map(_.toLong).sliding(2)) {
      assert(rows((t, a))._4 <= rows((t, b))._4,
        s"$t recall dropped from refine $a to $b")
    }
  }

  test("measured tier floors at sf0.001 (deterministic pipeline)") {
    // measured: sq8 976/1000/1000/1000, pq 373/733/890/986,
    // opq 413/823/960/996, pqr 480/923/983/1000,
    // bq 216/513/740/913, pca 190/463/723/903
    val floors = Map(
      "sq8" -> Seq(950L, 1000L, 1000L, 1000L),
      "pq"  -> Seq(300L, 650L, 800L, 930L),
      "opq" -> Seq(350L, 750L, 900L, 950L),
      "pqr" -> Seq(400L, 850L, 930L, 980L),
      "bq"  -> Seq(150L, 450L, 650L, 850L),
      "pca" -> Seq(130L, 400L, 650L, 850L))
    for ((t, fs) <- floors; (r, f) <- QuantReport.Refines.map(_.toLong).zip(fs)) {
      assert(rows((t, r))._4 >= f,
        s"$t recall at refine $r fell below its measured floor $f: ${rows((t, r))._4}")
    }
  }

  test("ladder orderings: SQ8 near-exact; OPQ and residual never below PQ at the same budget") {
    for (r <- QuantReport.Refines.map(_.toLong)) {
      assert(rows(("opq", r))._4 >= rows(("pq", r))._4,
        s"OPQ fell below PQ at refine $r")
      // the FAISS-standard residual claim, measured: centroid-offset
      // codes beat raw codes at the SAME M-byte budget
      assert(rows(("pqr", r))._4 >= rows(("pq", r))._4,
        s"residual PQ fell below raw PQ at refine $r")
    }
    // SQ8 saturates: exact recall from refine 4 up (per-dim rounding
    // error only — the 4x rung costs essentially nothing in recall)
    assert(rows(("sq8", 4L))._4 == 1000L)
  }
}
