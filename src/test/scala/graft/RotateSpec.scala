package graft

import graft.functions.{RotateFunctions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rotation kernel contracts: orthonormality, distance preservation,
  * determinism — the properties OPQ-style quantization relies on.
  */
class RotateSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("random rotation is orthonormal (rows unit-norm, pairwise orthogonal)") {
    val r = RotateFunctions.randomRotation(16)
    for (i <- 0 until 16; j <- 0 until 16) {
      val dot = (0 until 16).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"row $i . row $j = $dot")
    }
    // deterministic: same seed, same matrix
    assert(RotateFunctions.randomRotation(16).map(_.toSeq).toSeq ==
      r.map(_.toSeq).toSeq)
  }

  test("rotation preserves pairwise l2 distances on the real corpus") {
    val rot = RotateFunctions.randomRotation(64)
    val e = Tables.embeddings(spark, sf).filter(col("vec_id") < 50)
      .select(col("vec_id"),
        col("embedding").as("v"),
        RotateFunctions.rotateVector(col("embedding"), rot).as("rv"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        VectorFunctions.l2Distance(col("a.v"), col("b.v")).as("d"),
        VectorFunctions.l2Distance(col("a.rv"), col("b.rv")).as("rd"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (d, rd) = (r.getDouble(0), r.getDouble(1))
      // float32 output re-rounds each component; distances agree to
      // float precision, which is all a quantizer consumes
      assert(math.abs(d - rd) <= 1e-3 * math.max(1.0, d),
        s"distance not preserved: $d vs $rd")
    }
  }
}
