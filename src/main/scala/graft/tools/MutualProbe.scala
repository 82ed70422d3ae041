package graft.tools

import graft.GraftSession
import graft.operators.{Dedup, Ivf}
import graft.Tables
import org.apache.spark.sql.functions._

/** Scratch probe: mutual-kNN-graph recall vs the exact mutual graph as
  * a function of nprobe — the measurement behind E37b's serving
  * nprobe choice (mutuality is a conjunction, so directed misses
  * compound ~quadratically; the serving config has to probe more than
  * the directed-ANN default to keep the mutual graph useful).
  */
object MutualProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 5
    for (sf <- Seq("0.001", "0.01")) {
      val dir = s"/root/testdata/sf$sf"
      val n = Tables.embeddings(spark, dir).count()
      val nc = Ivf.defaultK(n)
      def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("vec_a", "vec_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = edges(Dedup.knnGraphMutual(spark, dir, k))
      val nearMiss = edges(Dedup.knnGraphMutual(spark, dir, 2 * k))
      for (div <- Seq(4, 3, 2)) {
        val np = math.max(1, nc / div)
        val served = edges(Dedup.mutualizeForProbe(
          Ivf.annBatch(spark, dir, k, graft.functions.VectorMetric.Cosine,
            nprobeOpt = Some(np))))
        val recall = (served & exact).size.toDouble / exact.size
        val nm = (served & nearMiss).size.toDouble / served.size
        println(f"[mutual] sf$sf nc=$nc np=$np (nc/$div): recall=$recall%.3f nearMiss2k=$nm%.3f served=${served.size} exact=${exact.size}")
      }
    }
    spark.stop()
  }
}
