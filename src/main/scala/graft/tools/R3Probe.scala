package graft.tools

import graft.GraftSession

/** Scratch probe: plan audit of the round-3 additions — broadcast
  * declarations honored, date filter pushed into the orders scan,
  * anti-join shape, no corpus broadcast in the IVF-PQ path.
  */
object R3Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    for ((name, df) <- Seq(
      "q17" -> graft.operators.Analytics.q17SmallQtyRevenue(spark, sf),
      "anti" -> graft.operators.Analytics.customersWithoutOrders(spark, sf),
      "pipeline" -> graft.operators.TextOps.pipelineCleanCorpus(spark, sf),
      "ivfpq" -> graft.operators.Pq.ivfpqTopk(spark, sf))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== $name ===")
      println("  broadcasts: " + "BroadcastHashJoin|BroadcastExchange".r
        .findAllIn(plan).toSeq.groupBy(identity).map { case (k, v) => s"$k x${v.size}" })
      println("  joins: " + "(SortMergeJoin\\w*|ShuffledHashJoin) (\\w+)".r
        .findAllIn(plan).toSeq.distinct)
      println("  anti: " + plan.linesIterator.filter(_.contains("LeftAnti")).take(2).toSeq)
      println("  pushed: " + "PushedFilters: \\[[^\\]]*\\]".r
        .findAllIn(plan).toSeq.filter(_.length > 18).distinct.take(4))
    }
    spark.stop()
  }
}
