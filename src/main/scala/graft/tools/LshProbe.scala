package graft.tools

import graft.Tables
import graft.operators.Dedup
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Scratch: stage-level timing of the hyperplane-LSH pipeline at sf0.1. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    Dedup.embeddingNeardupLsh(spark, "/root/testdata/sf0.001").count()
    t("full lsh #1")(println("rows=" + Dedup.embeddingNeardupLsh(spark, dir).count()))
    t("full lsh #2")(println("rows=" + Dedup.embeddingNeardupLsh(spark, dir).count()))
    // stages
    val e = Tables.rebalanced(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))).cache()
    t("corpus cache")(e.count())
    spark.stop()
  }
}
