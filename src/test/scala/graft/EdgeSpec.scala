package graft

import graft.functions.VectorMetric
import graft.operators.{Corpus, Dedup, IndexLifecycle, Ivf, Knn, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge contracts mirrored from the reference's index tests
  * (tests/test_indexes.py): empty builds fail, k larger than the
  * corpus returns min(k, n), empty inputs flow through as empty.
  */
class EdgeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("building an index over an empty corpus fails loudly (not silently empty)") {
    val path = java.nio.file.Files.createTempDirectory("graft_edge").toString
    val empty = Tables.embeddings(spark, sf).filter(col("vec_id") < 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    intercept[Exception](IndexLifecycle.build(empty, path))
  }

  test("PQ training on an empty corpus fails loudly; dim mismatch fails loudly") {
    import graft.operators.Pq
    // a corpus dir with zero vectors cannot silently train: use a
    // synthetic empty frame through the public seam (train reads the
    // dir, so probe via the query-side dim check instead)
    val q3 = Array(1f, 2f, 3f)
    intercept[IllegalArgumentException](
      Pq.topK(spark, sf, q3, k = 5).collect())
  }

  test("k larger than the corpus returns min(k, n) neighbors (test_query_k_larger_than_dataset)") {
    val tiny = Tables.embeddings(spark, sf).filter(col("vec_id") < 7)
    val res = Knn.knnSelf(tiny, nQueries = 1, k = 100, VectorMetric.L2)
    assert(res.count() == 7, "one query over 7 vectors must yield exactly 7 neighbors")
  }

  /** Codegen'd kernel failures surface wrapped in SparkException — the
    * contract is that SOME cause in the chain carries the typed message.
    */
  private def causeChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("k-NN entry points reject dimension-mismatched queries with a typed error") {
    import org.apache.spark.sql.functions.typedlit
    val queries = spark.range(1)
      .select(col("id").as("query_id"), typedlit(Seq(1f, 2f, 3f)).as("qvec"))
    val corpus = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("vec"))
    val e = intercept[Exception](
      Knn.knn(queries, corpus, 5, VectorMetric.L2).collect())
    assert(causeChain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("dimension mismatch")),
      s"expected a typed dimension-mismatch error, got $e")
  }

  test("SQ8 encode kernel fails loudly on a dim-mismatched vector (no prefix truncation)") {
    import graft.operators.Sq8
    import org.apache.spark.sql.functions.typedlit
    val m = Sq8.train(spark, sf)
    val bad = spark.range(1).select(typedlit(Seq(1f, 2f, 3f)).as("vec"))
    val e = intercept[Exception](
      bad.select(graft.functions.Sq8Functions
        .sq8Encode(col("vec"), m.mins, m.scales).as("codes")).collect())
    assert(causeChain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("sq8_encode")),
      s"expected the sq8_encode dim guard, got $e")
  }

  test("rotation kernel fails loudly on a dim-mismatched vector") {
    import org.apache.spark.sql.functions.typedlit
    val r = graft.functions.RotateFunctions.randomRotation(8)
    val bad = spark.range(1).select(typedlit(Seq(1f, 2f, 3f)).as("vec"))
    val e = intercept[Exception](
      bad.select(graft.functions.RotateFunctions
        .rotateVector(col("vec"), r).as("out")).collect())
    assert(causeChain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("rotate_vector")),
      s"expected the rotate_vector dim guard, got $e")
  }

  test("delete with duplicate ids counts each vector once (no metadata drift)") {
    import org.apache.spark.sql.functions.lit
    val path = java.nio.file.Files.createTempDirectory("graft_edge_dupdel").toString
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val s1 = IndexLifecycle.build(vecs, path, kOpt = Some(4))
    val dels = spark.range(3).select(lit(3L).as("id")) // id 3, three times
    val s2 = IndexLifecycle.delete(dels, path)
    assert(s2.size == s1.size - 1, s"duplicate delete ids inflated size: $s2")
    assert(s2.dirtyCount == 1L, s"duplicate delete ids inflated dirt: $s2")
  }

  test("selection/forensics edges: no raw split, single source, empty pair graph") {
    import spark.implicits._
    // all docs belong to the target distribution → nothing to select
    val allTarget = Seq((0L, "alpha beta gamma", "en", "src0", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Corpus.dsirSelectOn(allTarget, "src0", 25).count() == 0)
    // a single-source corpus has no source pairs to overlap
    val oneSrcDir = java.nio.file.Files.createTempDirectory("graft_onesrc").toString
    allTarget.write.mode("overwrite").parquet(s"$oneSrcDir/documents.parquet")
    assert(Corpus.sourceOverlap(spark, oneSrcDir).count() == 0)
    // component propagation over an empty pair graph converges empty
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.componentsFromPairs(noPairs).count() == 0)
  }

  test("round-7 operator edges: tiny corpus, degenerate features, k > n") {
    import spark.implicits._
    // classifier on whitespace-only and single-word docs: finite scores,
    // no divide-by-zero NaN (the greatest(·,1) guards)
    val weird = Seq((1L, "   ", "a"), (2L, "x", "a"), (3L, "THE THE THE", "a"))
      .toDF("doc_id", "text", "source")
    val scored = TextOps.qualityClassifierOn(weird).collect()
    assert(scored.length == 3 && scored.forall(!_.isNullAt(2)))
    // mutual kNN at k >= n-1: every directed edge is mutual → the full
    // undirected graph on n vertices
    val tiny = java.nio.file.Files.createTempDirectory("graft_tinyvec").toString
    Tables.embeddings(spark, sf).filter(col("vec_id") < 4)
      .write.mode("overwrite").parquet(s"$tiny/embeddings.parquet")
    assert(Dedup.knnGraphMutual(spark, tiny, k = 10).count() == 4L * 3 / 2)
    // outliers on the same tiny corpus: full coverage, never all flagged
    val o = Ivf.embeddingOutliers(spark, tiny)
    assert(o.count() == 4)
    assert(o.filter(col("is_outlier") === 1L).count() < 4)
    // dataset card on a single-source corpus: one row, exact integers
    val oneDir = java.nio.file.Files.createTempDirectory("graft_onecard").toString
    Seq((0L, "the cat", "en", "s0", 7L), (1L, "a dog", "en", "s0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$oneDir/documents.parquet")
    val card = TextOps.corpusProfile(spark, oneDir).collect()
    assert(card.length == 1)
    assert(card(0).getAs[Long]("n_docs") == 2)
    assert(card(0).getAs[Long]("sum_tokens") == 4)
    assert(card(0).getAs[Long]("p50_tokens") == 2) // both docs are 2 tokens
  }

  test("empty corpora flow through the pipelines as empty results") {
    val noDocs = Tables.documents(spark, sf).filter(col("doc_id") < 0)
    assert(Dedup.jaccardPairsOn(noDocs).count() == 0)
    assert(Dedup.dedupExact(spark, sf).filter(lit(false)).count() == 0)
    val noVecs = Tables.embeddings(spark, sf).filter(col("vec_id") < 0)
    assert(Knn.knnSelf(noVecs, 1, 5, VectorMetric.Cosine).count() == 0)
    // E5b: an empty corpus has no dimension to probe — must yield an
    // empty pair frame, not a head() crash
    assert(Dedup.embeddingNeardupLshOn(spark,
      noVecs.select(col("vec_id"), col("embedding")),
      threshold = 0.4, bandBits = 4).count() == 0)
  }
}
