package graft.tools
import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

object JacProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val ws = Tables.rebalanced(Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))).cache()
    t("ws materialize")(ws.count())
    t("shingleHashes 1")(ws.select(col("doc_id"), Dedup.shingleHashes(col("ws")).as("g"))
      .select(sum(size(col("g")))).head())
    t("shingleHashes 2")(ws.select(col("doc_id"), Dedup.shingleHashes(col("ws")).as("g"))
      .select(sum(size(col("g")))).head())
    // variant: no array_distinct
    val nd = when(size(col("ws")) >= 3, transform(sequence(lit(0), size(col("ws")) - 3),
      i => xxhash64(element_at(col("ws"), i + 1), element_at(col("ws"), i + 2), element_at(col("ws"), i + 3))))
      .otherwise(array().cast("array<bigint>"))
    t("no distinct")(ws.select(sum(size(nd))).head())
    // variant: word-hash array first then combine hashes positionally
    val whs = ws.select(col("doc_id"), transform(col("ws"), w => xxhash64(w)).as("whs")).cache()
    t("whs materialize")(whs.count())
    val comb = when(size(col("whs")) >= 3, transform(sequence(lit(0), size(col("whs")) - 3),
      i => xxhash64(element_at(col("whs"), i + 1), element_at(col("whs"), i + 2), element_at(col("whs"), i + 3))))
      .otherwise(array().cast("array<bigint>"))
    t("combine from whs")(whs.select(sum(size(comb))).head())
    spark.stop()
  }
}
