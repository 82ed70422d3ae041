package graft.tools

import graft.operators.{Dedup, Ivf}

/** Scratch timing probe for the batch-ANN / near-dup paths at sf0.1. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    // warm codegen at tiny SF
    Dedup.annTopkBatch(spark, "/root/testdata/sf0.001").count()
    t("ivf_build sf0.1 (cold)")(Ivf.ivfBuild(spark, dir).count())
    t("ivf_build sf0.1 (memoized)")(Ivf.ivfBuild(spark, dir).count())
    t("ann probe-all #1")(Dedup.annTopkBatch(spark, dir).count())
    t("ann probe-all #2")(Dedup.annTopkBatch(spark, dir).count())
    t("ann nprobe=12")(Ivf.annBatch(spark, dir, 5,
      graft.functions.VectorMetric.Cosine, Some(12)).count())
    spark.stop()
  }
}
