package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Binary (1-bit) quantization kernels — the 256× compression tier
  * below SQ8 (4×) and PQ (32×): each dimension collapses to one SIGN
  * BIT against a per-dimension trained threshold, packed 8 dims per
  * byte, and candidate distance is Hamming — XOR + popcount, the
  * cheapest scan kernel that exists (no table lookups, no float math).
  * The standard shortlist tier for billion-scale search: hamming
  * prunes, the exact re-rank on raw floats restores precision
  * (operators/Bq composes both).
  *
  * Same kernel discipline as the rest of the family: thresholds ride
  * as a codegen REFERENCE OBJECT (multi-KB literals kill whole-stage
  * codegen — the PqExprs lesson), and dimension mismatches FAIL the
  * job (EdgeSpec contract) instead of silently ranking a prefix.
  */
case class BqEncode(child: Expression, thresholds: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "bq_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bq_encode expects array<float|double>, got $other")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != thresholds.length)
      throw new IllegalArgumentException(
        s"bq_encode: vector dim ${a.numElements()} != trained dim ${thresholds.length}")
    val n = thresholds.length
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      // bit i of byte i/8, LSB-first within the byte
      if (x > thresholds(i)) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val thRef = ctx.addReferenceObj("bqThresholds", thresholds, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |if ($n != $thRef.length) {
         |  throw new IllegalArgumentException(
         |    "bq_encode: vector dim " + $n + " != trained dim " + $thRef.length);
         |}
         |byte[] $out = new byte[($n + 7) / 8];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ((double) $a.$get($i) > $thRef[$i]) {
         |    $out[$i >> 3] = (byte) ($out[$i >> 3] | (1 << ($i & 7)));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two packed sign-bit buffers: Σ popcount
  * (a_i XOR b_i), returned as INT. `nBytes` is the trained code width —
  * buffers from any other encoder fail loudly, never rank on a prefix.
  */
case class HammingDistance(left: Expression, right: Expression, nBytes: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming_distance expects binary code columns, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    if (a.length != nBytes || b.length != nBytes)
      throw new IllegalArgumentException(
        s"hamming_distance: code widths ${a.length}/${b.length} != trained width $nBytes")
    var acc = 0
    var i = 0
    while (i < nBytes) {
      acc += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xFF)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $nBytes || $b.length != $nBytes) {
         |  throw new IllegalArgumentException(
         |    "hamming_distance: code widths " + $a.length + "/" + $b.length
         |      + " != trained width " + $nBytes);
         |}
         |int $acc = 0;
         |for (int $i = 0; $i < $nBytes; $i++) {
         |  $acc += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xFF);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BqFunctions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def bqEncode(v: Column, thresholds: Array[Double]): Column =
    c(BqEncode(e(v), thresholds))

  def hammingDistance(a: Column, b: Column, nBytes: Int): Column =
    c(HammingDistance(e(a), e(b), nBytes))
}
