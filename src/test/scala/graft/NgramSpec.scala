package graft

import graft.functions.{TopNgramCount, WordNgrams}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the codegen'd n-gram kernels to the declarative HOF spellings
  * they replaced (transform/sequence/concat_ws and
  * zip_with + aggregate fold) — same outputs, compiled execution.
  */
class NgramSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b a b a b a b",                // dominant repeated bigram
    "one two",                        // exactly n for bigrams
    "solo",                           // below n
    "",                               // empty text → one empty word
    "x  y z",                         // double space → empty middle word
    "same same same same")            // run of identical words
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("word_ngrams matches the transform/sequence/concat_ws spelling for n=2 and n=3") {
    val df = samples.toDF("id", "text").select(col("id"), split(col("text"), " ").as("w"))
    for (n <- Seq(2, 3)) {
      val hof = when(size(col("w")) >= n,
        transform(sequence(lit(1), size(col("w")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(col("w"), i + j)): _*)))
        .otherwise(array().cast("array<string>"))
      val rows = df.select(col("id"),
        WordNgrams.wordNgrams(col("w"), n).as("kernel"), hof.as("hof")).collect()
      for (r <- rows)
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n diverged for id ${r.getLong(0)}")
    }
  }

  test("top_ngram_count equals the max bigram multiplicity") {
    val df = samples.toDF("id", "text")
      .select(col("id"), split(trim(lower(col("text"))), "\\s+").as("ws"))
    val got = df.select(col("id"), TopNgramCount.topNgramCount(col("ws"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = samples.map { case (i, t) =>
      val ws = t.trim.toLowerCase.split("\\s+", -1).toSeq
      val grams = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      i -> (if (grams.isEmpty) 0L
            else grams.groupBy(identity).values.map(_.size).max.toLong)
    }.toMap
    assert(got == want)
  }

  test("kernels run inside whole-stage codegen (no CodegenFallback in the scan)") {
    // a range source (not a local relation, which constant-folds the
    // whole projection at plan time) so the kernels really run in the
    // compiled scan stage
    val df = spark.range(10)
      .select(split(concat_ws(" ", col("id").cast("string"), lit("a"),
        col("id").cast("string"), lit("a")), " ").as("w"))
      .select(WordNgrams.wordNgrams(col("w"), 2).as("g"),
        TopNgramCount.topNgramCount(col("w"), 2).as("t"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [word_ngrams"), plan)
    assert(df.collect().forall(_.getLong(1) == 2L))
  }
}
