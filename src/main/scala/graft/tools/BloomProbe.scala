package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch probe: does Catalyst inject a runtime bloom filter on the
  * lineitem side of a selective orders join at sf0.1, and under which
  * conf thresholds?
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("8", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    for ((thresh, bcast) <- Seq(("10MB", "false"), ("1KB", "false"))) {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", thresh)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      spark.conf.set("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        if (bcast == "false") "-1" else "10MB")
      val ord = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val li = Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      val hasBloom = plan.toLowerCase.contains("bloom")
      println(s"thresh=$thresh bcast=$bcast -> bloom in plan: $hasBloom")
      if (hasBloom) println(plan.split("\n").filter(_.toLowerCase.contains("bloom")).take(3).mkString("\n"))
    }
    spark.stop()
  }
}
