package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent word n-grams of an array<string> column, each gram joined
  * with a single space — the bigram/trigram kernel behind the corpus
  * statistics operators (E23 boilerplate df, E25 bigram LM, E27
  * novelty, E29 PMI).
  *
  * Exists for the same reason as [[CharSum]]/[[ShingleHashes]]: the
  * declarative spelling,
  * `transform(sequence(1, size(w)-1), i -> concat_ws(' ', w[i], w[i+1]))`,
  * runs INTERPRETED (higher-order functions are CodegenFallback), and
  * §8d measured that lambda-bind cost as the dominant term of the two
  * slowest corpus keys. This runs the window loop in one compiled
  * method and stays inside whole-stage codegen via a static call.
  *
  * Semantics are identical to the HOF chain: fewer than n words →
  * empty array; null words are skipped inside a gram exactly like
  * `concat_ws` skips null arguments.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {

  private val Space = UTF8String.fromString(" ")

  def compute(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val ws = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      ws(i) = if (words.isNullAt(i)) null else words.getUTF8String(i)
      i += 1
    }
    val m = len - n + 1
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      out(i) =
        if (n == 2) UTF8String.concatWs(Space, ws(i), ws(i + 1))
        else if (n == 3) UTF8String.concatWs(Space, ws(i), ws(i + 1), ws(i + 2))
        else UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(ws, i, i + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API. */
  def wordNgrams(words: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(words), n))
}

/** Max multiplicity over the adjacent word n-grams of an array<string>
  * column — E17's "count of the single most frequent bigram" as one
  * compiled pass, replacing an interpreted zip_with + array_sort +
  * aggregate(fold) chain. Never materializes the gram array into the
  * row: sorts gram references and counts the longest run, O(d log d)
  * per row like the fold it replaces. Returns 0 when fewer than n
  * words.
  */
case class TopNgramCount(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "ngram size must be >= 1")

  override def dataType: DataType = LongType
  override def prettyName: String = "top_ngram_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_ngram_count expects array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    TopNgramCount.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopNgramCount.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopNgramCount {

  def compute(words: ArrayData, n: Int): Long = {
    val grams = WordNgrams.compute(words, n)
    val m = grams.numElements()
    if (m == 0) return 0L
    val arr = new Array[UTF8String](m)
    var i = 0
    while (i < m) { arr(i) = grams.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]])
    var best = 1L
    var run = 1L
    i = 1
    while (i < m) {
      if (arr(i) == arr(i - 1)) run += 1
      else run = 1
      if (run > best) best = run
      i += 1
    }
    best
  }

  /** Column API. */
  def topNgramCount(words: Column, n: Int): Column =
    ColumnBridge.column(TopNgramCount(ColumnBridge.expression(words), n))
}
