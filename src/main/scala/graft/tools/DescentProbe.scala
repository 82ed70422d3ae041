package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch probe: NN-Descent graph construction at the 25× vector
  * scale (50k×64) vs the exact probe-all pass it replaces, on TWO
  * corpora:
  *   - `clustered` — 500 hash-derived centers + small jitter, the
  *     manifold shape real embedding corpora have (and the regime
  *     NN-Descent was built for: neighbors-of-neighbors are
  *     informative);
  *   - `uniform` — the ScaleProbe hash-uniform corpus, the ADVERSARIAL
  *     case: near-equidistant points carry no neighborhood structure,
  *     so no sub-quadratic builder can recover the exact graph there
  *     (propagation saturates; measured honestly below).
  * Prints wall seconds for the constant-budget init + descent rounds
  * and for the exact probe-all batch, plus descent's directed recall
  * vs exact on a deterministic query subsample.
  */
object DescentProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val k = 5
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[descent] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (shape <- Seq("clustered", "uniform")) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_descent_$shape").toString
      val base = spark.range(n.toLong)
      val emb = shape match {
        case "uniform" =>
          base.select(col("id").as("vec_id"),
            transform(sequence(lit(0), lit(63)),
              i => (pmod(xxhash64(col("id"), i), lit(2000L)) / lit(1000.0) - 1.0).cast("float"))
              .as("embedding"),
            pmod(col("id"), lit(10)).cast("int").as("label"))
        case _ =>
          // 500 centers, ±0.05 jitter: within-cluster neighbors
          // dominate (the shared ProbeUtil recipe — CoresetProbe and
          // MmrProbe publish numbers on the SAME corpus)
          base.select(col("id").as("vec_id"),
            ProbeUtil.clusteredEmbedding.as("embedding"),
            pmod(col("id"), lit(10)).cast("int").as("label"))
      }
      emb.repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      println(s"[descent] corpus=$shape n=$n dim=64 k=$k")
      timed(s"$shape: ivf index (memo)") { graft.operators.Ivf.warmIndex(spark, dir) }
      val (edges, iters) = timed(s"$shape: init + descent rounds") {
        val r = graft.operators.Dedup.descentGraph(spark, dir, k)
        r._1.count(); r
      }
      println(s"[descent] $shape: converged after $iters changing rounds")
      val exact = timed(s"$shape: exact probe-all (E37)") {
        val e = graft.operators.Ivf.annBatch(spark, dir, k,
          graft.functions.VectorMetric.Cosine)
        e.queryExecution.toRdd.count()
        e
      }
      val ex = exact.filter(col("query_id") % 100 === 0)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = edges.filter(col("src") % 100 === 0)
        .select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[descent] $shape: sampled recall ${(ex & got).size.toDouble / ex.size}%.4f " +
        s"over ${ex.size / k} queries")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
