package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Scalar (int8) quantization kernels — the 4× compression tier of the
  * quantization family (PQ is the 32× tier): each dimension linearly
  * quantizes to [0,255] against per-dimension (min, scale) trained from
  * the corpus. Codes are BINARY — one byte per dimension, the exact
  * byte budget SQ8 advertises (array<int> would cost 4× in cache and
  * shuffle). Both kernels carry their parameter arrays as codegen
  * REFERENCE OBJECTS (the PqExprs lesson: multi-KB literals kill
  * whole-stage codegen), and an equivalent zip_with/transform HOF chain
  * would evaluate interpreted on every row (the r1 HOF lesson).
  */
case class Sq8Encode(child: Expression, mins: Array[Double], scales: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq8_encode expects array<float|double>, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    // dimension-mismatched vectors FAIL the job (the repo-wide contract
    // pinned by EdgeSpec — the reference rejects them with
    // EmbeddingDimensionMismatchError); silently quantizing a prefix
    // would rank garbage
    if (a.numElements() != mins.length)
      throw new IllegalArgumentException(
        s"sq8_encode: vector dim ${a.numElements()} != trained dim ${mins.length}")
    val n = mins.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val q = Math.round((x - mins(i)) * scales(i)).toInt
      out(i) = Math.max(0, Math.min(255, q)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq8Mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("sq8Scales", scales, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val q = ctx.freshName("q")
      s"""
         |int $n = $a.numElements();
         |if ($n != $minsRef.length) {
         |  throw new IllegalArgumentException(
         |    "sq8_encode: vector dim " + $n + " != trained dim " + $minsRef.length);
         |}
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $q = (int) java.lang.Math.round(((double) $a.$get($i) - $minsRef[$i]) * $scalesRef[$i]);
         |  $out[$i] = (byte) java.lang.Math.max(0, java.lang.Math.min(255, $q));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Symmetric l2 distance between two SQ8 code buffers on the
  * dequantized values: sqrt(Σ ((a_i − b_i) / scale_i)²). Exact for the
  * quantized representatives, so ranking error comes only from
  * quantization.
  */
case class Sq8Distance(left: Expression, right: Expression, scales: Array[Double])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_distance"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq8_distance expects binary code columns, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    // code buffers shorter/longer than the trained model mean a
    // different encoder produced them — fail, never rank on a prefix
    if (a.length != scales.length || b.length != scales.length)
      throw new IllegalArgumentException(
        s"sq8_distance: code dims ${a.length}/${b.length} != trained dim ${scales.length}")
    val n = scales.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = ((a(i) & 0xFF) - (b(i) & 0xFF)) / scales(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scalesRef = ctx.addReferenceObj("sq8Scales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |if ($a.length != $scalesRef.length || $b.length != $scalesRef.length) {
         |  throw new IllegalArgumentException(
         |    "sq8_distance: code dims " + $a.length + "/" + $b.length
         |      + " != trained dim " + $scalesRef.length);
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $scalesRef.length; $i++) {
         |  double $d = (($a[$i] & 0xFF) - ($b[$i] & 0xFF)) / $scalesRef[$i];
         |  $acc += $d * $d;
         |}
         |${ev.value} = Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object Sq8Functions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def sq8Encode(v: Column, mins: Array[Double], scales: Array[Double]): Column =
    c(Sq8Encode(e(v), mins, scales))

  def sq8Distance(a: Column, b: Column, scales: Array[Double]): Column =
    c(Sq8Distance(e(a), e(b), scales))
}
