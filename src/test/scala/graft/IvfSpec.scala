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

  test("two-level trainer: deterministic, covering, cell-consistent, near-exact assignment") {
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables.rebalanced(
      graft.Tables.embeddings(spark, sf)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))).cache()
    val k = 24
    val q1 = Ivf.trainTwoLevel(vecs, k, iters = 10, tol = 1e-4)
    val q2 = Ivf.trainTwoLevel(vecs, k, iters = 10, tol = 1e-4)
    // deterministic run-to-run (integer-summed level-1 updates,
    // id-sorted per-cell kernels)
    assert(q1.centroids.map(_.toSeq).toSeq == q2.centroids.map(_.toSeq).toSeq)
    assert(q1.cellOf.toSeq == q2.cellOf.toSeq)
    // structure: ~√k cells, cellOf grouped non-decreasing, budget near k
    assert(q1.l1.length == math.ceil(math.sqrt(k.toDouble)).toInt)
    assert(q1.cellOf.toSeq == q1.cellOf.toSeq.sorted)
    assert(q1.centroids.length >= k - q1.l1.length &&
      q1.centroids.length <= k + q1.l1.length,
      s"effective list count ${q1.centroids.length} strayed from k=$k")
    // assignment: full coverage, valid range
    val assigned = Ivf.assignTwoLevel(vecs, q1)
      .select("id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned.size == 500)
    assert(assigned.values.forall(c => c >= 0 && c < q1.centroids.length))
    // w-cell probing agrees with the exact flat argmin on nearly all
    // rows (boundary vectors are the only candidates to miss)
    val exact = Ivf.kmeansAssignExact(vecs, q1.centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val agree = assigned.count { case (id, c) => exact(id) == c }
    assert(agree >= (0.9 * assigned.size).toInt,
      s"two-level assignment agreement $agree/${assigned.size} below floor")
    // the kmeans dispatcher takes the distributed path when forced
    val (adf, cents) = Ivf.kmeans(vecs, k, maxDriverK = 0)
    assert(cents.length == q1.centroids.length)
    assert(adf.count() == 500)
    vecs.unpersist()
  }

  test("two-level batch probe selection overlaps the flat selection") {
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables.rebalanced(
      graft.Tables.embeddings(spark, sf)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))).cache()
    val k = 24
    val q = Ivf.trainTwoLevel(vecs, k, iters = 10, tol = 1e-4)
    val queries = vecs.filter(col("id") < 50)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val np = 6
    def probesOf(hier: Option[Ivf.TwoLevelQuantizer]): Map[Long, Set[Int]] =
      Ivf.probeSelectForSpec(queries, q.centroids, np, hier)
        .select("query_id", "probe_cluster").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).map { case (qid, rs) => qid -> rs.map(_._2).toSet }
    val flat = probesOf(None)
    val twoLevel = probesOf(Some(q))
    assert(twoLevel.values.forall(_.size == np), "np probes per query")
    // the hierarchy prunes cells, not correctness-critical sets: most
    // of the flat selection survives (2× cell oversampling)
    val overlap = flat.keys.toSeq
      .map(qid => (flat(qid) & twoLevel(qid)).size.toDouble / np)
    val mean = overlap.sum / overlap.size
    assert(mean >= 0.7, s"two-level probe overlap $mean < 0.7 vs flat")
    vecs.unpersist()
  }

  test("two-level DOT probe selection overlaps the flat inner-product selection") {
    // round 12: dot no longer stays flat — cells are scored by the
    // Cauchy-Schwarz upper bound q·c ≤ q·l1c + ‖q‖·r_cell, the
    // standard branch-and-bound MIPS cell pruning
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables.rebalanced(
      graft.Tables.embeddings(spark, sf)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))).cache()
    val k = 24
    val q = Ivf.trainTwoLevel(vecs, k, iters = 10, tol = 1e-4)
    val queries = vecs.filter(col("id") < 50)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val np = 6
    def probesOf(hier: Option[Ivf.TwoLevelQuantizer]): Map[Long, Set[Int]] =
      Ivf.probeSelectForSpec(queries, q.centroids, np, hier,
          metric = graft.functions.VectorMetric.Dot)
        .select("query_id", "probe_cluster").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).map { case (qid, rs) => qid -> rs.map(_._2).toSet }
    val flat = probesOf(None)
    val twoLevel = probesOf(Some(q))
    assert(twoLevel.values.forall(_.size == np), "np probes per query")
    val overlap = flat.keys.toSeq
      .map(qid => (flat(qid) & twoLevel(qid)).size.toDouble / np)
    val mean = overlap.sum / overlap.size
    assert(mean >= 0.7, s"two-level DOT probe overlap $mean < 0.7 vs flat")
    vecs.unpersist()
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
