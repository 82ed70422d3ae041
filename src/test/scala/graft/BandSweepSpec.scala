package graft

import graft.operators.{BandSweep, Dedup}
import org.scalatest.funsuite.AnyFunSuite

/** E49 lsh_band_sweep contracts: grid shape and integer arithmetic,
  * the mass-doubling theorem (nested band boundaries: one width-2r
  * band match implies two width-r band matches, so the uncapped
  * combinatorial pair mass at least doubles per band-count doubling),
  * exact agreement with E3's served pipeline at the shared 16×8
  * config, measured recall floors at two SFs, and candidate
  * containment across the grid on a synthetic corpus small enough
  * that the bucket cap never bites (capped ≡ uncapped there, so the
  * containment theorem is observable end-to-end).
  */
class BandSweepSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  private def rowsAt(dir: String) =
    BandSweep.lshBandSweep(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap

  private lazy val rows001 = rowsAt(sf001)
  private lazy val rows01 = rowsAt(sf01)

  test("grid shape and integer arithmetic") {
    assert(rows001.keySet == BandSweep.BandGrid.toSet)
    rows001.foreach { case (b, (rpb, mass, cand, verified, exact, recall, precision)) =>
      assert(rpb == Dedup.MinhashPerms / b, s"bands=$b rows_per_band")
      assert(verified <= cand, s"bands=$b verified <= candidates")
      assert(verified <= exact, s"bands=$b verified pairs are exact pairs")
      assert(cand <= mass, s"bands=$b capped distinct pairs <= raw mass")
      assert(recall == (if (exact > 0) verified * 1000 / exact else 0),
        s"bands=$b recall arithmetic")
      assert(precision == (if (cand > 0) verified * 1000 / cand else 0),
        s"bands=$b precision arithmetic")
    }
    val exacts = rows001.values.map(_._5).toSet
    assert(exacts.size == 1, "n_exact is the one exact contract across the grid")
  }

  test("mass-doubling theorem: raw_pair_mass(2b) >= 2 * raw_pair_mass(b)") {
    for (dir <- Seq(rows001, rows01); Seq(a, b) <- BandSweep.BandGrid.sliding(2)) {
      assert(dir(b)._2 >= 2 * dir(a)._2,
        s"mass at $b bands must be >= 2x mass at $a bands")
    }
  }

  test("agreement with E3's served pipeline at the shared 16x8 config") {
    // same banding seam, same bucket cap, same exact-Jaccard verify bar
    // => the sweep's verified count at bands=16 IS E3's pair count
    val e3 = Dedup.dedupMinhashLsh(spark, sf001).count()
    assert(rows001(16)._4 == e3,
      s"sweep verified@16 (${rows001(16)._4}) must equal E3 pairs ($e3)")
  }

  test("measured recall floors (deterministic pipeline, two SFs)") {
    // measured: sf0.001 964/1000/1000, sf0.01 1000/1000/1000 — floors
    // carry a small margin only against intentional retunes
    assert(rows001(8)._6 >= 900 && rows01(8)._6 >= 900)
    assert(rows001(16)._6 >= 950 && rows01(16)._6 >= 950)
    assert(rows001(32)._6 >= rows001(16)._6 - 50,
      "32 bands must not collapse below the serving config")
  }

  test("candidate containment across the grid on an uncapped synthetic corpus") {
    import spark.implicits._
    // near-dup clusters + distinct docs; vocabulary small but every
    // bucket far below the cap, so capped == uncapped and the nested-
    // band containment theorem is visible in the served counts
    val docs = (0 until 40).flatMap { i =>
      val base = s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar $i"
      Seq((i * 10L, base), (i * 10L + 1, base + " extra"))
    }.toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs)
    val exact = Dedup.jaccardPairsOn(docs)
    val rows = BandSweep.lshBandSweepOn(spark, sig, exact).collect()
      .map(r => r.getInt(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(rows(8)._1 <= rows(16)._1 && rows(16)._1 <= rows(32)._1,
      "candidate counts monotone in band count when the cap never bites")
    assert(rows(8)._2 <= rows(16)._2 && rows(16)._2 <= rows(32)._2,
      "verified counts monotone too (verified = candidates ∩ exact)")
  }

  test("a config with zero candidates still emits its grid row") {
    import spark.implicits._
    // fully disjoint vocabularies => no shared shingles, no band
    // collisions at any config: every config's candidate set is empty,
    // yet the report must keep one row per grid config (masses is the
    // left side of the final join) with zeroed counts
    val docs = (0 until 12).map { i =>
      val words = (0 until 20).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, words)
    }.toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs)
    val exact = Dedup.jaccardPairsOn(docs)
    val rows = BandSweep.lshBandSweepOn(spark, sig, exact).collect()
    assert(rows.map(_.getInt(0)).toSet == BandSweep.BandGrid.toSet,
      "all grid rows present even with empty candidate sets")
    rows.foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L,
        s"bands=${r.getInt(0)} zero candidates and zero verified")
    }
  }

  test("determinism: two invocations agree exactly") {
    val a = BandSweep.lshBandSweep(spark, sf001).collect().toSeq
    val b = BandSweep.lshBandSweep(spark, sf001).collect().toSeq
    assert(a == b)
  }
}
