package graft.tools

import graft.operators.{Dedup, Ivf}

/** Scratch: physical-plan audit for the no-corpus-broadcast criterion. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("8", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val bc = plan.linesIterator.filter(_.contains("BroadcastExchange")).size
      val bnlj = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).size
      println(s"=== $name: BroadcastExchange=$bc BNLJ=$bnlj")
      plan.linesIterator.filter(l => l.contains("Broadcast") || l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
        .foreach(l => println("  " + l.trim.take(150)))
    }
    audit("ann_topk_batch", Dedup.annTopkBatch(spark, dir))
    audit("embedding_neardup", Dedup.embeddingNeardup(spark, dir))
    audit("ivf_query probe-all", Ivf.ivfQuery(spark, dir, nprobeOpt = Some(Int.MaxValue)))
    spark.stop()
  }
}
