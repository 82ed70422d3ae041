package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("chunking: size 200 stride 150, last chunk clipped to n_chars") {
    val docs = Seq((1L, "x" * 380, 380L)).toDF("doc_id", "text", "n_chars")
    val got = TextOps.chunks(docs)
      .select("chunk_idx", "start_idx", "end_idx")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((0, 0L, 200L), (1, 150L, 350L), (2, 300L, 380L)))
  }

  test("chunk text overlap: consecutive chunks share 50 chars") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val docs = Seq((1L, text, text.length.toLong)).toDF("doc_id", "text", "n_chars")
    val byIdx = TextOps.chunks(docs).collect()
      .map(r => r.getAs[Int]("chunk_idx") -> r.getAs[String]("chunk_text")).toMap
    assert(byIdx(0) == text.substring(0, 200))
    assert(byIdx(1) == text.substring(150, 350))
    assert(byIdx(0).substring(150) == byIdx(1).substring(0, 50))
  }

  test("fingerprint is order-sensitive (positional rolling hash)") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .select(col("doc_id"),
        ((conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long") % 2147483647L)
          * (col("pos") + 1)).as("contrib"))
      .groupBy("doc_id").agg((sum(col("contrib")) % 1152921504606846976L).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) != fps(2L))
  }

  test("lang_id tie-break is alphabetical and no-hit docs are 'und'") {
    // 'la' is in both the es and fr lists -> tie -> alphabetical -> es
    val rows = Seq((1L, "la la qqq", "xx"), (2L, "qqq zzz", "xx"))
    val df = rows.toDF("doc_id", "text", "lang")
    df.createOrReplaceTempView("docs_tmp")
    val words = split(lower(col("text")), " ")
    // reuse the operator's scoring path by temp-substituting documents
    val got = graft.operators.TextOps.langIdOn(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted")).toMap
    assert(got(1L) == "es")
    assert(got(2L) == "und")
  }
}
