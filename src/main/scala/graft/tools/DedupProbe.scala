package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scratch: stage-level timing of the E2/E3 dedup pipelines at sf0.1. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    // warm
    Dedup.dedupMinhashLsh(spark, "/root/testdata/sf0.001").count()
    Dedup.ngramJaccardPairs(spark, "/root/testdata/sf0.001").count()

    val docs = Tables.documents(spark, dir)
    val sets = t("hashedShingleSets materialize")(
      { val s = Dedup.hashedShingleSets(docs).cache(); s.count(); s })
    val sig = t("minhashSignatures (from scratch)")(
      { val s = Dedup.minhashSignatures(docs).cache(); s.count(); s })
    t("full dedup_minhash_lsh")(println("rows=" + Dedup.dedupMinhashLsh(spark, dir).count()))
    t("full ngram_jaccard_pairs")(println("rows=" + Dedup.ngramJaccardPairs(spark, dir).count()))
    t("full dedup_minhash_lsh AGAIN")(println("rows=" + Dedup.dedupMinhashLsh(spark, dir).count()))
    sets.unpersist(); sig.unpersist()
    spark.stop()
  }
}
