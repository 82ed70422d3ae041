package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of word n-grams over an array<string> column —
  * the shingle kernel of the text-dedup pipelines (E2/E3) as ONE native
  * expression instead of a sequence/transform/xxhash64/array_distinct
  * HOF chain. Higher-order functions evaluate interpreted (a measured
  * drag on the corpus scan, SURVEY §8); this runs the whole window loop
  * in one compiled method and stays inside whole-stage codegen via a
  * static call.
  *
  * Hash semantics are IDENTICAL to `xxhash64(w[i], w[i+1], w[i+2])`
  * (XxHash64Function seed-chained from 42, Spark's multi-arg contract),
  * so it is a drop-in for the previous formulation. Output order is
  * sorted-distinct rather than first-occurrence-distinct — every
  * consumer treats the result as a set.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[ShingleHashes]] WITHOUT the sort/dedup: out(i) = the hash of the
  * window starting at word i, in document order — the positional
  * variant the exact-collision decontamination pass (E21b) needs to
  * report WHERE a leaked n-gram sits, not just that one exists.
  */
case class PositionalShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "positional_shingle_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"positional_shingle_hashes expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.computeAll(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.computeAll($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  /** The ONE hashing loop both kernels share — a divergent fix in one
    * variant would silently desynchronize E21's set semantics from
    * E21b's positional ones. Per-word UTF8Strings precompute once
    * (each word participates in up to n windows); null elements hash
    * like Spark's xxhash64 (null contributes nothing to the chain).
    */
  private def hashAll(words: ArrayData, n: Int): Array[Long] = {
    val len = words.numElements()
    if (len < n) return Array.emptyLongArray
    val m = len - n + 1
    val ws = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      ws(i) = if (words.isNullAt(i)) null else words.getUTF8String(i)
      i += 1
    }
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < n) {
        val w = ws(i + j)
        if (w != null) h = XxHash64Function.hash(w, StringType, h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** All window hashes in document order (no dedup) — the positional
    * kernel's body.
    */
  def computeAll(words: ArrayData, n: Int): ArrayData =
    new GenericArrayData(hashAll(words, n))

  /** Sorted-distinct window hashes (the set kernel): [[hashAll]] then
    * sort + dedup in place.
    */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val out = hashAll(words, n)
    if (out.isEmpty) return new GenericArrayData(out)
    java.util.Arrays.sort(out)
    var uniq = 1
    var i = 1
    while (i < out.length) {
      if (out(i) != out(uniq - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  /** Column API. */
  def shingleHashes(words: Column, n: Int = 3): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(words), n))

  def positionalShingleHashes(words: Column, n: Int): Column =
    ColumnBridge.column(PositionalShingleHashes(ColumnBridge.expression(words), n))
}
