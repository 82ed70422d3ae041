package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch probe: what does the E56 MMR rerank COST relative to the
  * shortlist that feeds it, at the 25× vector scale (50k×64, the
  * DescentProbe clustered corpus)? Measures the nprobe shortlist
  * build (E6b's engine at width C=20) and then the greedy fold on top
  * of it (pair table O(N·C²) = 19M skinny rows at 50k, k−1 GREATEST
  * rounds + bounded top-1 argmax) — the number that says whether the
  * diversity rerank is a rounding error or a second index scan.
  */
object MmrProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = ProbeUtil.timed("mmr")(name)(f)
    val dir = ProbeUtil.writeClusteredCorpus(spark, n, "mmr")
    println(s"[mmr] corpus=clustered n=$n dim=64 C=${graft.operators.Mmr.Candidates}")
    timed("ivf index (memo)") { graft.operators.Ivf.warmIndex(spark, dir) }
    val nn = graft.Tables.embeddingsCount(spark, dir)
    val np = math.max(1, graft.operators.Ivf.defaultK(nn) / 4)
    val shortlist = timed(s"nprobe shortlist build (np=$np, C=20)") {
      val s = graft.operators.Ivf.annBatch(spark, dir,
        graft.operators.Mmr.Candidates,
        graft.functions.VectorMetric.Cosine, nprobeOpt = Some(np))
        .localCheckpoint(true)
      s.count(); s
    }
    timed("MMR greedy fold over the shortlist") {
      graft.operators.Mmr.mmrOverShortlistForProbe(spark, dir, shortlist)
        .queryExecution.toRdd.count()
    }
    ProbeUtil.rmTree(dir)
    spark.stop()
  }
}
