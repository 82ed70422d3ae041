package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL face: graft's native expressions registered through
  * SparkSessionExtensions behave identically to the Column API.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("vector_l2 / vector_cosine / vector_dot are callable from SQL") {
    import spark.implicits._
    Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT vector_l2(a, b) AS l2, vector_cosine(a, b) AS cos, vector_dot(a, b) AS dot FROM vecs")
      .head()
    assert(math.abs(r.getDouble(0) - math.sqrt(2)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) == 0.0)
  }

  test("topk_by_distance aggregate works from SQL") {
    import spark.implicits._
    Seq((1L, 3.0, 30L), (1L, 1.0, 10L), (1L, 2.0, 20L))
      .toDF("q", "d", "id").createOrReplaceTempView("dists")
    val got = spark.sql(
      "SELECT q, topk_by_distance(d, id, 2) AS nn FROM dists GROUP BY q")
      .selectExpr("q", "inline(nn)")
      .collect().map(r => (r.getDouble(1), r.getLong(2))).toSeq
    assert(got == Seq((1.0, 10L), (2.0, 20L)))
  }

  test("minhash aggregate works from SQL and matches the Column path") {
    import spark.implicits._
    Seq((1L, 42L), (1L, 7L), (1L, 99L)).toDF("doc", "h")
      .createOrReplaceTempView("hs")
    val viaSql = spark.sql("SELECT minhash(h, 8) AS mh FROM hs GROUP BY doc")
      .head().getSeq[Long](0)
    val viaCol = Seq((1L, 42L), (1L, 7L), (1L, 99L)).toDF("doc", "h")
      .groupBy("doc")
      .agg(graft.functions.MinHashAgg.minhash(org.apache.spark.sql.functions.col("h"), 8).as("mh"))
      .select("mh").head().getSeq[Long](0)
    assert(viaSql == viaCol)
    assert(viaSql.length == 8)
  }
}
