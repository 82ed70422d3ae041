package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Learned-BPE token counting: the number of tokens a text tokenizes
  * into under a trained merge table (operators/Bpe) — the per-document
  * statistic every token-budget step of a training pipeline needs
  * (shard packing, context-length filtering, cost estimates), computed
  * WITHOUT materializing the token stream.
  *
  * The merge loop is real logic, so the kernel keeps whole-stage
  * codegen by emitting ONE static call into [[BpeKernel]] with the
  * merge table as a codegen reference object — the row pipeline stays
  * compiled, and the per-row work is a plain JVM method (the same
  * plan shape as the other kernel families; a Column-HOF formulation
  * would evaluate interpreted per word).
  */
case class BpeTokenCount(child: Expression, mergesL: Array[String],
                         mergesR: Array[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_token_count expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    BpeKernel.countTokens(v.asInstanceOf[UTF8String].toString, mergesL, mergesR)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeMergesL", mergesL, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("bpeMergesR", mergesR, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.functions.BpeKernel.countTokens($s.toString(), $lRef, $rRef);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The JVM-side BPE application shared by the codegen kernel, the
  * interpreted eval, and the spec's independent checks.
  */
object BpeKernel {
  /** Token count of `text` under the merge table: whitespace-split,
    * lowercased words each start as character symbols; merges apply
    * in RANK ORDER (the Sennrich application rule), each pass fusing
    * every adjacent occurrence of its pair left-to-right.
    */
  def countTokens(text: String, mergesL: Array[String], mergesR: Array[String]): Long = {
    var total = 0L
    val words = text.trim.toLowerCase.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) total += tokenizeWord(w, mergesL, mergesR).length
      wi += 1
    }
    total
  }

  /** Symbol sequence of one word after all merges (spec surface). */
  def tokenizeWord(w: String, mergesL: Array[String],
                   mergesR: Array[String]): Array[String] = {
    var syms = w.map(_.toString).toArray
    var m = 0
    while (m < mergesL.length && syms.length > 1) {
      val l = mergesL(m); val r = mergesR(m)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toArray
      m += 1
    }
    syms
  }
}

object BpeFunctions {
  def bpeTokenCount(text: Column, merges: Array[(String, String)]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text),
      merges.map(_._1), merges.map(_._2)))
}
