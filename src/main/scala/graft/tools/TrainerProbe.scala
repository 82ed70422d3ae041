package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch probe: the DISTRIBUTED coarse-quantizer trainer at a k the
  * driver path must never see (k = 4096 > Ivf.DriverTrainMaxK —
  * 256·k ≈ 1M training rows, the regime where the old driver collect
  * was the round-10 verdict's scale-killer). Synthesizes a
  * deterministic 2M×32 corpus, trains the two-level quantizer and runs
  * the two-level assignment over the FULL corpus, and prints wall
  * seconds plus structural evidence: no sample-sized driver collect
  * happens by construction (the sample stays a frame; the largest
  * driver object is the k×dim centroid array, printed in MiB), no
  * single-task stage (per-cell Lloyd parallelizes over ~√k = 64
  * groups; the probe prints the cell count), and the assignment's
  * agreement with the exact flat argmin on a deterministic subsample.
  */
object TrainerProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(4096)
    val dim = 32
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Ivf
    require(k > Ivf.DriverTrainMaxK, s"probe k=$k must exceed ${Ivf.DriverTrainMaxK}")
    val vecs = spark.range(n.toLong)
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => (pmod(xxhash64(col("id"), i), lit(2000L)) / lit(1000.0) - 1.0).cast("float"))
          .as("vec"))
      .repartition(32)
      .localCheckpoint()

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[trainer] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    println(s"[trainer] corpus n=$n dim=$dim k=$k (two-level path)")
    val q = timed("trainTwoLevel") { Ivf.trainTwoLevel(vecs, k, iters = 10, tol = 1e-4) }
    println(f"[trainer] cells=${q.l1.length} effective_k=${q.centroids.length} " +
      f"driver_centroid_array=${q.centroids.length.toLong * dim * 4 / 1024.0 / 1024}%.1f MiB")
    val assigned = timed("assignTwoLevel (full corpus)") {
      val a = Ivf.assignTwoLevel(vecs, q).select("id", "cluster_id")
      a.queryExecution.toRdd.count()
      a
    }
    // agreement vs the exact flat argmin on a deterministic ≤2k subsample
    // (stride floors at 1 so sub-2000 corpora still measure)
    val sub = vecs.filter(pmod(col("id"), lit(math.max(1L, n / 2000L))) === 0)
    val twoLevel = Ivf.assignTwoLevel(sub, q).select("id", "cluster_id")
      .withColumnRenamed("cluster_id", "c2")
    val exact = timed("exact argmin (2k subsample)") {
      Ivf.kmeansAssignExact(sub, q.centroids)
    }
    val both = exact.join(twoLevel, "id")
    val total = both.count()
    val agree = both.filter(col("cluster_id") === col("c2")).count()
    println(f"[trainer] assignment agreement $agree/$total (${100.0 * agree / total}%.1f%%)")
    val sizes = assigned.groupBy("cluster_id").count()
      .agg(min("count"), max("count"), count(lit(1))).head()
    println(s"[trainer] lists nonempty=${sizes.getLong(2)} " +
      s"min=${sizes.getLong(0)} max=${sizes.getLong(1)}")
    spark.stop()
  }
}
