package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/profiling probe: runMain graft.tools.ExplainProbe <query> <sfDir> [explain|time] */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val mode = if (args.length > 2) args(2) else "explain"
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (mode == "explain") df.explain("formatted")
    else {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); df.count()
        println(s"run $i: ${(System.nanoTime() - t0) / 1e9}s")
      }
    }
    spark.stop()
  }
}
