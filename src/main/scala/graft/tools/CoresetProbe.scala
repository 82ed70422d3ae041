package graft.tools

import graft.GraftSession

import org.apache.spark.sql.functions._

/** Scratch probe: the E55/E55b coreset trade at the 25× vector scale
  * (50k×64, the DescentProbe clustered corpus) — same center budget
  * (1 + 32) selected by
  *   - SEQUENTIAL greedy (sample_kcenter, T=33: 32 scans), and
  *   - BATCHED greedy (sample_kcenter_batch, 4 rounds × p=8: 4 scans),
  * printing wall seconds and each strategy's FINAL covering radius
  * (max over the corpus of min-distance to its 33 centers, computed by
  * one literal-center scan) — the measured version of the class-note
  * claim that batching trades a bounded amount of coverage for a p×
  * reduction in scans.
  */
object CoresetProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[coreset] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_coreset").toString
    spark.range(n.toLong).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => ((pmod(xxhash64(pmod(col("id"), lit(500L)), i), lit(2000L)) / lit(1000.0) - 1.0) +
            (pmod(xxhash64(col("id"), i, lit(7L)), lit(100L)) / lit(1000.0) - 0.05)).cast("float"))
          .as("embedding"),
        pmod(col("id"), lit(10)).cast("int").as("label"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    println(s"[coreset] corpus=clustered n=$n dim=64 budget=33 centers")

    def coverage(ids: Seq[Long]): Double = {
      val vecs = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val centers = vecs.filter(col("id").isin(ids: _*))
        .select("id", "vec").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      val minDist = centers.map { case (_, v) =>
        graft.functions.VectorFunctions.l2Distance(col("vec"),
          array(v.map(lit): _*))
      }.reduce(least(_, _))
      vecs.filter(!col("id").isin(ids: _*))
        .select(minDist.as("md"))
        .agg(max(col("md"))).head().getDouble(0)
    }

    val seq33 = timed("sequential greedy T=33 (32 scans)") {
      graft.operators.Coreset.sampleKcenter(spark, dir, t = 33).collect()
    }
    val seqIds = seq33.map(_.getLong(1)).toSeq
    val batch = timed("batched greedy 4 rounds x p=8 (4 scans)") {
      graft.operators.Coreset.sampleKcenterBatch(spark, dir).collect()
    }
    val batchIds = batch.map(_.getLong(2)).toSeq
    val covSeq = timed("coverage radius (sequential set)") { coverage(seqIds) }
    val covBatch = timed("coverage radius (batched set)") { coverage(batchIds) }
    println(f"[coreset] sequential covering radius $covSeq%.4f")
    println(f"[coreset] batched    covering radius $covBatch%.4f " +
      f"(${covBatch / covSeq}%.3fx the sequential radius)")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
