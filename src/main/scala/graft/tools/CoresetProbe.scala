package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch probe: the E55/E55b coreset trade at the 25× vector scale
  * (50k×64, the shared ProbeUtil clustered corpus) — same center
  * budget (1 + 32) selected by
  *   - SEQUENTIAL greedy (sample_kcenter, T=33: 32 scans), and
  *   - BATCHED greedy (sample_kcenter_batch, 4 rounds × p=8: 4 scans),
  * printing wall seconds and each strategy's FINAL covering radius
  * (max over the corpus of min-distance to its 33 centers, computed by
  * one literal-center scan) — the measured version of the class-note
  * claim that batching trades a bounded amount of coverage for a p×
  * reduction in scans. Measured: sequential 15.0 s / radius 6.37,
  * batched 4.6 s / radius 7.18 (1.127×).
  */
object CoresetProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = ProbeUtil.timed("coreset")(name)(f)
    val dir = ProbeUtil.writeClusteredCorpus(spark, n, "coreset")
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
    ProbeUtil.rmTree(dir)
    spark.stop()
  }
}
