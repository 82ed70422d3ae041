package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Shared probe plumbing. The clustered corpus recipe is LOAD-BEARING:
  * DescentProbe / CoresetProbe / MmrProbe all publish numbers cited in
  * SURVEY as "the DescentProbe clustered corpus", so the generator
  * lives in exactly one place — an edit here moves all three probes
  * together instead of silently desynchronizing their corpora.
  */
object ProbeUtil {

  /** 500 hash-derived centers + ±0.05 jitter over 64 dims — the
    * manifold shape real embedding corpora have.
    */
  def clusteredEmbedding: Column =
    transform(sequence(lit(0), lit(63)),
      i => ((pmod(xxhash64(pmod(col("id"), lit(500L)), i), lit(2000L)) / lit(1000.0) - 1.0) +
        (pmod(xxhash64(col("id"), i, lit(7L)), lit(100L)) / lit(1000.0) - 0.05)).cast("float"))

  /** Write the n-row clustered corpus as a temp embeddings table and
    * return its directory.
    */
  def writeClusteredCorpus(spark: SparkSession, n: Int, tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    spark.range(n.toLong).select(col("id").as("vec_id"),
        clusteredEmbedding.as("embedding"),
        pmod(col("id"), lit(10)).cast("int").as("label"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  def timed[T](tag: String)(name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[$tag] $name%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def rmTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
