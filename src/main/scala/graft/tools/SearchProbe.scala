package graft.tools

import graft.GraftSession
import graft.operators.Search

/** Scratch probe: where does hybrid_search_rrf spend its time at sf0.1? */
object SearchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    t("bm25Scored.count (cold)") { Search.bm25Scored(spark, dir).count() }
    t("bm25Scored.count (warm)") { Search.bm25Scored(spark, dir).count() }
    t("vecScored.count (cold)") { Search.vecScored(spark, dir).count() }
    t("vecScored.count (warm)") { Search.vecScored(spark, dir).count() }
    t("textSearchBm25") { Search.textSearchBm25(spark, dir).count() }
    t("hybridSearchRrf (cold)") { Search.hybridSearchRrf(spark, dir).count() }
    t("hybridSearchRrf (warm)") { Search.hybridSearchRrf(spark, dir).count() }
    spark.stop()
  }
}
/** Second probe: isolate the rankTopK cost. */
object SearchProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val sc = Search.bm25Scored(spark, dir)
    t("scored.count") { sc.count() }
    t("scored.count again") { sc.count() }
    t("groupBy.topk agg only") {
      sc.groupBy().agg(graft.functions.VectorFunctions
        .topKByDistance(-col("score"), col("doc_id"), 10).as("nn")).count()
    }
    t("orderBy.limit(10) alternative") {
      sc.orderBy(col("score").desc, col("doc_id")).limit(10).count()
    }
    t("full textSearchBm25") { Search.textSearchBm25(spark, dir).count() }
    t("full textSearchBm25 again") { Search.textSearchBm25(spark, dir).count() }
    spark.stop()
  }
}
/** Third probe: stage-by-stage hybrid timing. */
object SearchProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val bmScored = Search.bm25Scored(spark, dir)
    t("warm bm25 scored") { bmScored.count() }
    val veScored = Search.vecScored(spark, dir)
    t("warm vec scored") { veScored.count() }
    val bm = t("bm rankTopK+ckpt") {
      bmScored.groupBy().agg(graft.functions.VectorFunctions
        .topKByDistance(-col("score"), col("doc_id"), 20).as("nn"))
        .select(posexplode(col("nn")).as(Seq("pos", "nn")))
        .select(col("nn.id").as("doc_id"), (col("pos") + 1).cast("int").as("bm25_rank"))
        .localCheckpoint()
    }
    val ve = t("ve rankTopK+ckpt") {
      veScored.groupBy().agg(graft.functions.VectorFunctions
        .topKByDistance(col("dist"), col("doc_id"), 20).as("nn"))
        .select(posexplode(col("nn")).as(Seq("pos", "nn")))
        .select(col("nn.id").as("doc_id"), (col("pos") + 1).cast("int").as("vec_rank"))
        .localCheckpoint()
    }
    val fused = t("fuse join+ckpt") {
      bm.join(ve, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("bm25_rank"), lit(0)).as("bm25_rank"),
          coalesce(col("vec_rank"), lit(0)).as("vec_rank"),
          (coalesce(lit(1.0) / (lit(60.0) + col("bm25_rank")), lit(0.0)) +
           coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0))).as("rrf"))
        .localCheckpoint()
    }
    t("final rank+join") {
      fused.groupBy().agg(graft.functions.VectorFunctions
        .topKByDistance(-col("rrf"), col("doc_id"), 10).as("nn"))
        .select(posexplode(col("nn")).as(Seq("pos", "nn")))
        .select(col("nn.id").as("doc_id"), (col("pos") + 1).cast("int").as("rrf_rank"))
        .join(broadcast(fused.select("doc_id", "bm25_rank", "vec_rank")), Seq("doc_id"))
        .count()
    }
    spark.stop()
  }
}
