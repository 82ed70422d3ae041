package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.VectorMetric
import graft.operators.{Dedup, GraphIndex, Ivf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe for the round-14 two-phase builder: per metric, the
  * DESCENT substrate recall, the REFINED substrate recall, the served
  * (seeded-beam) recall through the refined graph, and the wall-clock
  * of descent vs refinement — the measured basis for RefinePermille /
  * RefineNprobeMult and the GraphSpec floors.
  */
object RefineProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = 5
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Seq("cos" -> VectorMetric.Cosine, "l2" -> VectorMetric.L2,
        "dot" -> VectorMetric.Dot).foreach { case (name, m) =>
      val exact = Ivf.exactEdges(spark, dir, k, m)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def recallOf(df: DataFrame): Double = {
        val got = df.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val rs = exact.map { case (q, ex) =>
          (ex & got.getOrElse(q, Set.empty)).size.toDouble / k }
        rs.sum / rs.size
      }
      val t0 = System.nanoTime()
      val (g, iters) = Dedup.descentGraph(spark, dir, k, m)
      g.count()
      val tDescent = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rg = GraphIndex.refinedGraph(spark, dir, k, m)
      rg.count()
      val tRefine = (System.nanoTime() - t1) / 1e9
      val sub0 = recallOf(g.select(col("src").as("query_id"),
        col("dst").as("neighbor_id")))
      val sub1 = recallOf(rg.select(col("src").as("query_id"),
        col("dst").as("neighbor_id")))
      val served = recallOf(GraphIndex.graphTopk(spark, dir, k, m))
      println(f"[rp] $name%-3s iters=$iters descent=${tDescent}%.1fs " +
        f"refine=${tRefine}%.1fs sub $sub0%.3f -> $sub1%.3f served $served%.3f")
    }
    println(s"[rp] RefinePermille=${GraphIndex.RefinePermille} " +
      s"RefineNprobeMult=${GraphIndex.RefineNprobeMult} dir=$dir n=" +
      Tables.embeddingsCount(spark, dir))

    // the 25× CLUSTERED corpus (50k×64, the shared ProbeUtil shape —
    // real-embedding-shaped data where descent already converges well):
    // measures what phase 2 costs and buys OFF the adversarial regime
    if (args.drop(1).headOption.contains("25x")) {
      val big = ProbeUtil.writeClusteredCorpus(spark, 50000, "refine")
      val k = 5
      val exact = Ivf.exactEdges(spark, big, k, VectorMetric.Cosine)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def recallOf(df: DataFrame): Double = {
        val got = df.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val rs = exact.map { case (q, ex) =>
          (ex & got.getOrElse(q, Set.empty)).size.toDouble / k }
        rs.sum / rs.size
      }
      val t0 = System.nanoTime()
      val (g, iters) = Dedup.descentGraph(spark, big, k, VectorMetric.Cosine)
      g.count()
      val tD = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rg = GraphIndex.refinedGraph(spark, big, k, VectorMetric.Cosine)
      rg.count()
      val tR = (System.nanoTime() - t1) / 1e9
      val sub0 = recallOf(g.select(col("src").as("query_id"),
        col("dst").as("neighbor_id")))
      val sub1 = recallOf(rg.select(col("src").as("query_id"),
        col("dst").as("neighbor_id")))
      println(f"[rp] 25x clustered iters=$iters descent=${tD}%.1fs " +
        f"refine=${tR}%.1fs (${tR / tD}%.2fx) sub $sub0%.3f -> $sub1%.3f")
      ProbeUtil.rmTree(big)
    }
    spark.stop()
  }
}
