package graft

import graft.operators.{Ivf, VectorQueries}
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("ivf build assigns every vector to a valid cluster, deterministically") {
    val a1 = Ivf.ivfBuild(spark, sf).collect().map(r => (r.getLong(0), r.getInt(1)))
    val a2 = Ivf.ivfBuild(spark, sf).collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a1.toSeq == a2.toSeq)
    val n = a1.length
    assert(n == 500)
    val k = Ivf.defaultK(n)
    assert(a1.forall { case (_, c) => c >= 0 && c < k })
    // k-means should actually spread the data over several lists
    assert(a1.map(_._2).distinct.length > k / 2)
  }

  test("index stats histogram covers the corpus exactly once") {
    val rows = Ivf.indexStats(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._2).sum == 500L)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    assert(rows.forall(_._2 > 0), "empty lists must not appear")
    val k = Ivf.defaultK(500)
    assert(rows.length <= k)
  }

  test("ivf query probing ALL lists reproduces exact k-NN (A1)") {
    val exact = VectorQueries.knnLinearL2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val k = Ivf.defaultK(500)
    val full = Ivf.ivfQuery(spark, sf, nQueries = 5, k = 10, nprobeOpt = Some(k))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact)
  }

  test("ivf cosine query probing ALL lists matches the exact cosine contract (A2)") {
    val exact = VectorQueries.knnLinearCosine(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Ivf.ivfQuery(spark, sf, nQueries = 5, k = 10,
      nprobeOpt = Some(Int.MaxValue), metric = graft.functions.VectorMetric.Cosine)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact, "metric plumb-through must rank by cosine end-to-end")
  }

  test("nprobe clamps to [1, nClusters] (set_nprobe semantics, ivf.py:214-224)") {
    // nprobe=0 clamps to 1: still a valid query, k results per query
    val low = Ivf.ivfQuery(spark, sf, nQueries = 2, k = 5, nprobeOpt = Some(0))
    assert(low.count() == 10, "nprobe=0 must clamp to probing one list")
    // nprobe far above nClusters clamps to all lists = exact
    val exact = VectorQueries.knnLinearL2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val high = Ivf.ivfQuery(spark, sf, nQueries = 5, k = 10, nprobeOpt = Some(1 << 30))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(high == exact)
  }

  test("ivf query with nprobe=k/4 keeps useful recall at a quarter of the scan") {
    val exact = VectorQueries.knnLinearL2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall unreasonably low for nprobe=k/4")
    assert(approx.size == 50) // still k results per query
  }
}
