package graft

import graft.operators.{IndexLifecycle, Ivf}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle state machine + the stale-read guarantee: after a
  * marked-dirty rebuild, queries must see the new corpus.
  */
class IndexLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpus(where: org.apache.spark.sql.Column) =
    Tables.embeddings(spark, sf).filter(where)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("state machine: version, dirty count, should_rebuild threshold") {
    val path = java.nio.file.Files.createTempDirectory("graft_lc").toString
    assert(IndexLifecycle.status(spark, path).shouldRebuild(0.1),
      "unbuilt index must demand a build")
    val s1 = IndexLifecycle.build(corpus(col("vec_id") >= 0), path)
    assert(s1.version == 1 && !s1.isDirty && s1.dirtyCount == 0 && s1.size == 500)
    assert(!s1.shouldRebuild(0.1))
    val s2 = IndexLifecycle.markDirty(spark, path, 25) // 5% of 500
    assert(s2.isDirty && s2.dirtyCount == 25 && !s2.shouldRebuild(0.1))
    val s3 = IndexLifecycle.buildIfNeeded(corpus(col("vec_id") >= 0), path)
    assert(s3.version == 1, "sub-threshold dirt must not rebuild")
    val s4 = IndexLifecycle.markDirty(spark, path, 25)
    assert(s4.shouldRebuild(0.1), "10% dirty crosses the threshold")
    val s5 = IndexLifecycle.buildIfNeeded(corpus(col("vec_id") >= 0), path)
    assert(s5.version == 2 && !s5.isDirty && s5.dirtyCount == 0)
    // status round-trips through the persisted state file
    assert(IndexLifecycle.status(spark, path) == s5)
  }

  test("stale reads are impossible after a marked-dirty rebuild") {
    val path = java.nio.file.Files.createTempDirectory("graft_lc").toString
    val qvec = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray

    // v1: corpus WITHOUT vector 0 — its true NN cannot be itself
    IndexLifecycle.build(corpus(col("vec_id") > 0), path)
    val before = IndexLifecycle.query(spark, path, qvec, k = 1, nprobe = 64)
      .head().getLong(0)
    assert(before != 0L)

    // vector 0 arrives: the mutation marks the index dirty; the next
    // read applies the lazy-rebuild policy and must see it
    IndexLifecycle.markDirty(spark, path, 500)
    val s = IndexLifecycle.buildIfNeeded(corpus(col("vec_id") >= 0), path)
    assert(s.version == 2)
    val after = IndexLifecycle.query(spark, path, qvec, k = 1, nprobe = 64)
      .head().getLong(0)
    assert(after == 0L, "rebuilt index must surface the new exact match")
  }

  test("incremental append: new vectors are queryable without a rebuild") {
    val path = java.nio.file.Files.createTempDirectory("graft_lc").toString
    val s1 = IndexLifecycle.build(corpus(col("vec_id") > 0), path)
    val qvec = Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    assert(IndexLifecycle.query(spark, path, qvec, k = 1, nprobe = 64)
      .head().getLong(0) != 0L)
    val s2 = IndexLifecycle.append(corpus(col("vec_id") === 0), path)
    assert(s2.version == s1.version, "append must not retrain")
    assert(s2.size == s1.size + 1 && s2.isDirty && s2.dirtyCount == 1)
    assert(IndexLifecycle.query(spark, path, qvec, k = 1, nprobe = 64)
      .head().getLong(0) == 0L, "appended vector must be queryable immediately")
    // growth counts as dirt: enough appends trip the rebuild policy
    assert(!s2.shouldRebuild(0.1))
    val s3 = IndexLifecycle.markDirty(spark, path, s1.size / 10)
    assert(s3.shouldRebuild(0.1))
  }

  test("dimension-mismatched queries fail the job instead of truncating") {
    import spark.implicits._
    val corpus3 = Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(4f, 5f, 6f)))
      .toDF("neighbor_id", "vec")
    val queries2 = Seq((0L, Seq(1f, 2f))).toDF("query_id", "qvec")
    val e = intercept[Exception](
      graft.operators.Knn.knn(queries2, corpus3, 1, 0).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("dimension mismatch")), e.toString)
  }

  test("session memo invalidation keeps ivfBuild usable and fresh") {
    val a1 = Ivf.ivfBuild(spark, sf).collect()
    Ivf.invalidate(sf)
    val a2 = Ivf.ivfBuild(spark, sf).collect()
    assert(a1.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      a2.map(r => (r.getLong(0), r.getInt(1))).toSeq)
  }
}
