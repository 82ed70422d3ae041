package graft.tools

import graft.GraftSession

/** Scratch probe: physical shape of the pagination queries — the
  * offset+limit page must plan as a bounded top-(offset+limit)
  * (TakeOrderedAndProject), never a full global sort + collect.
  */
object PageProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    for ((name, df) <- Seq(
      "doc_pagination" -> graft.operators.TextOps.docPagination(spark, sf),
      "library_pagination" -> graft.operators.Library.libraryPagination(spark, sf))) {
      println(s"=== $name ===")
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(2500))
    }
    spark.stop()
  }
}
