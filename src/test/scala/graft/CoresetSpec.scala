package graft

import graft.operators.Coreset
import org.scalatest.funsuite.AnyFunSuite

/** E55 sample_kcenter contracts: the greedy farthest-point traversal
  * replicated by a driver-side fold over the collected fixture corpus
  * (500×dim at sf0.001 — small enough to verify EXACTLY), the
  * non-increasing radius sequence, and determinism.
  */
class CoresetSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val got = Coreset.sampleKcenter(spark, sf).collect()
    .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  test("exact greedy replication on the collected fixture corpus") {
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val seedId = corpus.head._1
    val byId = corpus.toMap
    var md = corpus.filter(_._1 != seedId)
      .map { case (id, v) => (id, l2(v, byId(seedId))) }.toMap
    val want = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)](
      (1, seedId, 0.0))
    (2 to Coreset.DefaultT).foreach { r =>
      val (pid, pd) = md.toSeq.maxBy { case (id, d) => (d, -id) }
      want += ((r, pid, pd))
      md = (md - pid).map { case (id, d) =>
        (id, math.min(d, l2(byId(id), byId(pid))))
      }
    }
    assert(got.map(x => (x._1, x._2)).toSeq == want.map(x => (x._1, x._2)).toSeq,
      s"pick sequence diverged: got ${got.toSeq} want ${want.toSeq}")
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-9, s"radius at rank ${g._1}: ${g._3} vs ${w._3}")
    }
  }

  test("batched variant: exact greedy-batch replication, round radii non-increasing") {
    val gotB = Coreset.sampleKcenterBatch(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val byId = corpus.toMap
    val seedId = corpus.head._1
    var md = corpus.filter(_._1 != seedId)
      .map { case (id, v) => (id, l2(v, byId(seedId))) }.toMap
    val want = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Double)](
      (1, 0, seedId, 0.0))
    var rank = 1
    (1 to Coreset.BatchRounds).foreach { r =>
      val picks = md.toSeq.sortBy { case (id, d) => (-d, id) }
        .take(Coreset.BatchP)
      picks.foreach { case (id, d) =>
        rank += 1; want += ((rank, r, id, d))
      }
      val pickIds = picks.map(_._1).toSet
      md = md.view.filterKeys(!pickIds(_)).toMap.map { case (id, d) =>
        (id, math.min(d, picks.map(p => l2(byId(id), byId(p._1))).min))
      }
    }
    assert(gotB.map(t => (t._1, t._2, t._3)).toSeq ==
      want.map(t => (t._1, t._2, t._3)).toSeq,
      s"batched pick sequence diverged")
    gotB.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 1e-9, s"radius at rank ${g._1}")
    }
    // per-round max radius never increases round over round
    val roundMax = gotB.filter(_._2 > 0).groupBy(_._2).toSeq.sortBy(_._1)
      .map(_._2.map(_._4).max)
    assert(roundMax.zip(roundMax.tail).forall { case (a, b) => a >= b },
      s"round covering radii must not increase: $roundMax")
  }

  test("radius sequence is non-increasing after the seed row") {
    val ds = got.drop(1).map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b },
      s"covering radii must not increase: ${ds.toSeq}")
  }

  test("cosine variant: exact greedy replication under the angular fold") {
    val gotC = Coreset.sampleKcenterCos(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def cosD(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        acc += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val norms = math.sqrt(na) * math.sqrt(nb)
      if (norms == 0.0) 1.0 else 1.0 - acc / norms
    }
    val byId = corpus.toMap
    val seedId = corpus.head._1
    var md = corpus.filter(_._1 != seedId)
      .map { case (id, v) => (id, cosD(v, byId(seedId))) }.toMap
    val want = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)](
      (1, seedId, 0.0))
    (2 to Coreset.DefaultT).foreach { r =>
      val (pid, pd) = md.toSeq.maxBy { case (id, d) => (d, -id) }
      want += ((r, pid, pd))
      md = (md - pid).map { case (id, d) =>
        (id, math.min(d, cosD(byId(id), byId(pid))))
      }
    }
    assert(gotC.map(x => (x._1, x._2)).toSeq ==
      want.map(x => (x._1, x._2)).toSeq,
      s"cosine pick sequence diverged: ${gotC.toSeq}")
    gotC.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-9,
        s"cosine radius at rank ${g._1}: ${g._3} vs ${w._3}")
    }
  }

  test("corpus exhaustion: both variants return the available centers, never throw") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cs_tiny").toString
    // 5 vectors < T=8 and far below 1 + 4*8: exhaustion paths in both
    (0L until 5L).map(i =>
        (i, Array.tabulate(8)(j => (i * 8 + j).toFloat / 10f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val seq5 = Coreset.sampleKcenter(spark, dir).collect()
    assert(seq5.length == 5, s"sequential must return all 5 centers, got ${seq5.length}")
    assert(seq5.map(_.getLong(1)).toSet == (0L until 5L).toSet)
    val batch5 = Coreset.sampleKcenterBatch(spark, dir).collect()
    assert(batch5.length == 5, s"batched must return all 5 centers, got ${batch5.length}")
    assert(batch5.map(_.getLong(2)).toSet == (0L until 5L).toSet)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("threshold admission: driver-fold replication, covered batch admits nothing, tiny corpus refuses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // exact replication of the sequential threshold scan against a
    // driver-side fold (the E55 replication discipline)
    val r = Coreset.thresholdRadius(spark, sf)
    val got = Coreset.kcenterThresholdPicks(spark, sf)
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(x => (x.getLong(0), x.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.sqrt(s)
    }
    var centers = Vector(corpus.head)
    var want = Vector((corpus.head._1, 0.0))
    corpus.tail.foreach { case (id, v) =>
      val md = centers.map(c => l2(v, c._2)).min
      if (md > r) { centers :+= ((id, v)); want :+= ((id, md)) }
    }
    assert(got == want.toSeq,
      s"threshold scan diverged from the driver fold: $got != $want")
    // a batch entirely covered by existing centers admits nothing
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents0 = centers.map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
    assert(Coreset.thresholdAdmit(vecs, cents0, r).isEmpty,
      "re-feeding the corpus against the final center set must admit nothing")
    // an empty frame admits nothing (and doesn't throw on the seed path)
    assert(Coreset.thresholdAdmit(vecs.filter(col("id") < 0), Seq.empty, r).isEmpty)
    // a corpus smaller than RadiusRank refuses loudly (no calibration)
    val dir = java.nio.file.Files.createTempDirectory("graft_kc_tiny").toString
    (0L until (Coreset.RadiusRank - 1).toLong).map(i =>
        (i, Array.tabulate(8)(j => (i * 3 + j).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Coreset.thresholdRadius(spark, dir)
    }
    assert(e.getMessage.contains("fewer than"))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("deterministic across invocations") {
    val again = Coreset.sampleKcenter(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == again.toSeq)
  }
}
