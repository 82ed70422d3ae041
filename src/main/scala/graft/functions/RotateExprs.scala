package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Dense orthonormal rotation of an embedding column: out_i = Σ_j
  * R[i][j]·v[j]. The building block of OPQ-style product quantization
  * (rotate so subspaces decorrelate, then PQ): rotation preserves l2
  * distances exactly, so a rotated PQ index answers the same queries
  * with (usually) less quantization error. The matrix is a codegen
  * REFERENCE OBJECT (dim² doubles — 32 KB at dim 64, and a learned OPQ
  * rotation would be the same size); the kernel is a plain dim² loop
  * inside whole-stage codegen.
  */
case class RotateVector(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "rotate_vector"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rotate_vector expects array<float|double>, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    // a rotation is square: a dim-mismatched input must fail the job
    // (the repo-wide EdgeSpec contract), not rotate a zero-padded prefix
    if (a.numElements() != matrix.length)
      throw new IllegalArgumentException(
        s"rotate_vector: vector dim ${a.numElements()} != matrix dim ${matrix.length}")
    val n = matrix.length
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val row = matrix(i)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        acc += row(j) * x
        j += 1
      }
      out(i) = acc.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("rotMatrix", matrix, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $mRef.length) {
         |  throw new IllegalArgumentException(
         |    "rotate_vector: vector dim " + $a.numElements() + " != matrix dim " + $mRef.length);
         |}
         |float[] $out = new float[$mRef.length];
         |for (int $i = 0; $i < $mRef.length; $i++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $mRef.length; $j++) {
         |    $acc += $mRef[$i][$j] * (double) $a.$get($j);
         |  }
         |  $out[$i] = (float) $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RotateFunctions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def rotateVector(v: Column, matrix: Array[Array[Double]]): Column =
    c(RotateVector(e(v), matrix))

  /** Deterministic random orthonormal matrix: seeded Gaussians +
    * modified Gram-Schmidt. A random rotation is the standard OPQ
    * initialization (and already decorrelates axis-aligned structure);
    * the learned alternating-minimization refinement slots in as a
    * drop-in replacement matrix.
    */
  def randomRotation(dim: Int, seed: Long = 0x0feaL): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val m = Array.fill(dim, dim)(rnd.nextGaussian())
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < i) {
        var dot = 0.0
        var k = 0
        while (k < dim) { dot += m(i)(k) * m(j)(k); k += 1 }
        k = 0
        while (k < dim) { m(i)(k) -= dot * m(j)(k); k += 1 }
        j += 1
      }
      var norm = 0.0
      var k = 0
      while (k < dim) { norm += m(i)(k) * m(i)(k); k += 1 }
      val inv = 1.0 / math.sqrt(norm)
      k = 0
      while (k < dim) { m(i)(k) *= inv; k += 1 }
      i += 1
    }
    m
  }
}
