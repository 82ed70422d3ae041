package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch probe: 25× scale stress for the vector-side operators.
  * Synthesizes a deterministic 50k×64 embedding corpus (hash-derived
  * components, no RNG state) into a temp dir shaped like the testdata
  * layout, then drives the SERVING configurations — IVF build,
  * nprobe batch ANN, PQ encode, IVF-PQ query, hyperplane LSH at the
  * 8-bit band setting the scaladoc prescribes for big corpora — and
  * prints wall seconds. The point is shape evidence: no OOM, no
  * corpus broadcast, costs that scale with probes/bands rather than
  * N².
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_scale").toString
    spark.range(n.toLong)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => (pmod(xxhash64(col("id"), i), lit(2000L)) / lit(1000.0) - 1.0).cast("float"))
          .as("embedding"),
        pmod(col("id"), lit(10)).cast("int").as("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    println(s"[scale] corpus n=$n dim=64 at $dir")
    timed("ivf_build+assign (memo)") { graft.operators.Ivf.warmIndex(spark, dir) }
    timed("ann_batch nprobe=8 k=5") {
      graft.operators.Ivf.annBatch(spark, dir, 5,
        graft.functions.VectorMetric.Cosine, nprobeOpt = Some(8)).count()
    }
    timed("pq train+encode (memo)") { graft.operators.Pq.encode(spark, dir).count() }
    timed("ivfpq query raw np=8") {
      val q = Array.tabulate(64)(i => (((i * 37) % 2000) / 1000.0f) - 1.0f)
      graft.operators.Pq.ivfPqTopK(spark, dir, q, 10, nprobe = 8,
        residual = false).count()
    }
    timed("ann_batch SDC nprobe=8 k=5") {
      graft.operators.Pq.sdcBatch(spark, dir, 5, nprobeOpt = Some(8)).count()
    }
    // the residual family (round 10): codes are x − coarse_centroid(x),
    // queries rank through per-cluster-shifted ADC tables — the encode
    // is still a broadcast join + codegen map, the query still a
    // cluster-restricted scan with a bounded top-k
    timed("pq residual encode (memo)") {
      graft.operators.Pq.encodeResidual(spark, dir).count() }
    timed("ivfpq residual query np=8") {
      val q = Array.tabulate(64)(i => (((i * 37) % 2000) / 1000.0f) - 1.0f)
      graft.operators.Pq.ivfPqTopK(spark, dir, q, 10, nprobe = 8).count()
    }
    // round-11 serving: the metadata-FILTERED residual query (selector
    // semi-join inside the probed scan, n/f-widened probes) and the
    // residual BATCH (row-inlined per-cluster shift + on-the-fly ADC)
    timed("ivfpq filtered query np=8") {
      val q = Array.tabulate(64)(i => (((i * 37) % 2000) / 1000.0f) - 1.0f)
      val selector = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("label").isin(2, 5, 7))
        .select(col("vec_id").as("id"))
      graft.operators.Pq.ivfPqTopKFiltered(spark, dir, q, 10, nprobe = 8,
        selector).count()
    }
    timed("res batch ANN nprobe=8 k=5") {
      graft.operators.Pq.resBatch(spark, dir, 5, nprobeOpt = Some(8))
        .queryExecution.toRdd.count()
    }
    // A24 at 50k vectors: 6 compressed tiers × 4 refine depths on a
    // thinned deterministic query sample (stride 1000 → ~50 queries —
    // the at-scale sampling the scaladoc prescribes; the flat
    // compressed scans stay O(queries × corpus) over codes).
    // collect(), not count(): the grid output joins key-unique
    // aggregates, which count() legally eliminates
    timed("quant_tier_report s=1000") {
      graft.operators.QuantReport.quantTierReport(spark, dir, stride = 1000).collect() }
    timed("hyperplane LSH bandBits=8") {
      graft.operators.Dedup.embeddingNeardupLshOn(spark,
        spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding"),
        threshold = 0.9, bandBits = 8).count()
    }
    // cache-resident byte budgets: binary PQ/SQ8 codes vs raw float32
    // vectors for the SAME 50k×64 corpus (the round-4 binary-codes
    // claim, measured — storage memory, not disk)
    timed("sq8 encode (memo)") { graft.operators.Sq8.encode(spark, dir).count() }
    timed("bq encode (memo)") { graft.operators.Bq.encode(spark, dir).count() }
    timed("bq topk refine=8") {
      val q = Array.tabulate(64)(i => (((i * 37) % 2000) / 1000.0f) - 1.0f)
      graft.operators.Bq.topK(spark, dir, q, 10).count()
    }
    timed("pca reduce 64->16 (memo)") { graft.operators.Pca.reduce(spark, dir).count() }
    timed("pca topk refine=8") {
      val q = Array.tabulate(64)(i => (((i * 37) % 2000) / 1000.0f) - 1.0f)
      graft.operators.Pca.topK(spark, dir, q, 10).count()
    }
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    raw.count()
    spark.sparkContext.getRDDStorageInfo.foreach { i =>
      println(f"[scale] cache ${i.memSize / 1024.0 / 1024}%8.2f MiB  ${i.name}")
    }
    raw.unpersist()
    // cleanup
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
