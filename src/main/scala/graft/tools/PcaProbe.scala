package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Scratch probe: PCA recall ladder + variance profile (sf0.001). */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("8", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val m = Pca.train(spark, sf)
    println(f"var explained: top1=${m.varExplained(0)}%.4f top16=${m.varExplained.take(16).sum}%.4f top32=${m.varExplained.take(32).sum}%.4f")
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def exactTopK(q: Array[Float], k: Int): Set[Long] =
      all.map { case (id, v) =>
        var acc = 0.0; var i = 0
        while (i < v.length) { val d = v(i) - q(i); acc += d * d; i += 1 }
        (acc, id)
      }.sortBy(identity).take(k).map(_._2).toSet
    val k = 10
    for (refine <- Seq(1, 4, 8, 16)) {
      val recalls = (0L until 10L).map { qid =>
        val q = all.find(_._1 == qid).get._2
        val got = Pca.topK(spark, sf, q, k, refine = refine)
          .collect().map(_.getLong(0)).toSet
        (exactTopK(q, k) & got).size.toDouble / k
      }
      println(f"refine=$refine%2d mean recall@10 = ${recalls.sum / recalls.length}%.3f")
    }
    spark.stop()
  }
}
