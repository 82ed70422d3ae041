package graft.tools
import graft.{GraftSession, Tables}
import graft.operators.Coreset
import org.apache.spark.sql.functions._
object KcProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      for (rank <- Seq(3, 4, 5)) {
        val rows = Coreset.sampleKcenter(spark, dir, rank)
          .filter(col("rank") === rank).select("dist").collect()
        val r = rows(0).getDouble(0)
        val n = Coreset.thresholdAdmit(vecs, Seq.empty, r).size
        println(s"[kc] $dir rank=$rank r=$r admitted=$n")
      }
    }
    spark.stop()
  }
}
