package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the combinatorial dedup kernels: random inputs
  * hunt the boundary cases fixed ones miss (the r2 jaccard boundary
  * pair was exactly such a miss). Seeded generators keep runs
  * deterministic.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def bruteJaccard(sets: Seq[(Long, Array[Long])], t: Double)
      : Set[(Long, Long)] =
    (for {
      (ia, ga) <- sets; (ib, gb) <- sets
      if ia < ib
      inter = ga.toSet.intersect(gb.toSet).size
      union = ga.length + gb.length - inter
      if union > 0 && inter.toDouble / union >= t
    } yield (ia, ib)).toSet

  test("prefix-filtered jaccard pairs == brute force, random sets, both thresholds") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small shared vocabulary forces overlaps, hot shingles, and
    // boundary ratios; several independent corpora per threshold
    for (round <- 0 until 3; t <- Seq(0.5, 0.8)) {
      val vocab = 40 + round * 13
      val sets: Seq[(Long, Array[Long])] = (0 until 25).map { i =>
        val size = 1 + rnd.nextInt(30)
        (i.toLong,
          Array.fill(size)(rnd.nextInt(vocab).toLong).distinct)
      }
      val df = sets.toDF("doc_id", "g")
      val got = Dedup.jaccardPairsFromSets(df, t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteJaccard(sets, t)
      assert(got == want,
        s"round=$round t=$t: missing=${want -- got} extra=${got -- want}")
    }
  }

  test("uncapped simhash banding == brute-force hamming<=3 pairs, random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // near-identical docs from a tiny template pool => many close
    // signatures; brute force recomputes hamming from the signatures
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (0 until 30).map { i =>
      val base = Array.fill(12)(words(rnd.nextInt(words.length)))
      if (i % 3 != 0 && i > 0) base(rnd.nextInt(12)) = words(rnd.nextInt(words.length))
      (i.toLong, base.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val sig = Dedup.simhashSignatures(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- docs.map(_._1); b <- docs.map(_._1)
      if a < b && java.lang.Long.bitCount(sig(a) ^ sig(b)) <= Dedup.HammingMax
    } yield (a, b)).toSet
    // write docs to a temp dir so the dir-based operator sees them?
    // no — exercise the banding directly through dedupSimhash's shape:
    // bands from signatures, pigeonhole says uncapped banding is
    // lossless, so compare against the banding-free definition
    val got = Dedup.simhashPairsOn(df, capOpt = None).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }
}
