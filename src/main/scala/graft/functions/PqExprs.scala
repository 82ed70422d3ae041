package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Symmetric PQ distance (SDC): approximate distance between two
  * PQ-encoded vectors as M table lookups —
  * dist²(a,b) ≈ Σ_m T[m][a_m][b_m], T[m] the inter-centroid squared-l2
  * table of subspace m's codebook.
  *
  * The table (M×256×256 doubles, ~4 MB at M=8) rides as a CODEGEN
  * REFERENCE OBJECT (`ctx.addReferenceObj`), never as source-embedded
  * literals: an equivalent element_at(literal) expression tree measured
  * 429s where this expression runs the same batch in seconds — nested
  * multi-KB literals blow the janino method-size limit and drop the
  * whole stage to interpreted evaluation, the same failure mode as the
  * r1 centroid-literal bombs but quadratically worse because it sits on
  * the pair stream.
  */
case class SdcDistance(left: Expression, right: Expression,
                       table: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_sdc_distance"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_sdc_distance expects array<int> code columns, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var acc = 0.0
    var m = 0
    while (m < table.length) {
      acc += table(m)(a.getInt(m))(b.getInt(m))
      m += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("sdcTable", table, "double[][][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      s"""
         |double $acc = 0.0;
         |for (int $m = 0; $m < ${table.length}; $m++) {
         |  $acc += $tbl[$m][$a.getInt($m)][$b.getInt($m)];
         |}
         |${ev.value} = Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqFunctions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def sdcDistance(a: Column, b: Column,
                  table: Array[Array[Array[Double]]]): Column =
    c(SdcDistance(e(a), e(b), table))
}
