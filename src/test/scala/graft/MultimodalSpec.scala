package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("containers carry the document bytes: parsed body_len == n_chars (ASCII corpus)") {
    val meta = Multimodal.multimodalMeta(spark, sf)
    val n = graft.Tables.documents(spark, sf).count()
    assert(meta.count() == n)
    val joined = meta.join(graft.Tables.documents(spark, sf), "doc_id")
      .filter(expr("body_len <> n_chars"))
    assert(joined.count() == 0)
    // every container resolved by magic dispatch, none fell through
    assert(meta.filter(col("container") === "unknown").count() == 0)
    // header overhead by container type
    val over = meta.join(graft.Tables.documents(spark, sf), "doc_id")
      .select(col("container"), (col("byte_len") - col("n_chars")).as("header"))
      .distinct().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(over == Map("bmp" -> 54L, "wav" -> 44L, "gvid" -> 12L))
  }

  test("audio dedup: amplitude-scaled clip keeps its signature; distinct clip differs") {
    import spark.implicits._
    // canonical 44-byte header + 16-bit LE samples (header bytes are
    // offset padding for the signature engine — it reads samples only)
    def wavOf(samples: Seq[Int]): Array[Byte] = {
      val body = samples.flatMap { s =>
        val u = if (s < 0) s + 65536 else s
        Seq((u & 0xFF).toByte, ((u >> 8) & 0xFF).toByte)
      }
      (Array.fill[Byte](44)(0) ++ body.toArray)
    }
    // a structured clip with |s| < 16384 so the 2x gain cannot clip
    val base = (0 until 256).map(i =>
      (math.sin(i / 7.0) * 8000).toInt + (if (i % 16 == 0) 4000 else 0))
    val scaled = base.map(_ * 2)
    val other = (0 until 256).map(i => (math.cos(i / 3.0) * 9000).toInt)
    val wavs = Seq((0L, wavOf(base)), (1L, wavOf(scaled)), (2L, wavOf(other)))
      .toDF("doc_id", "payload")
    val got = Multimodal.audioCanonGroups(wavs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    // amplitude-scale invariance: same banded-energy sign pattern
    assert(got(0)._2 == got(1)._2,
      s"2x gain changed the signature: ${got(0)._2} != ${got(1)._2}")
    assert(got(0)._3 == 0L && got(1)._3 == 0L && got(0)._4 && !got(1)._4,
      "the scaled twin must canon-group under the base clip")
    // a structurally different clip lands in its own group
    assert(got(2)._2 != got(0)._2 && got(2)._4,
      "a distinct clip must keep its own signature")
    // the signature genuinely uses the samples: non-trivial bit pattern
    assert(got(0)._2 != ((0L, 0L)), "all-zero signature is degenerate")
  }

  test("video dedup: unsampled-frame perturbation collides, sampled-frame change separates") {
    import spark.implicits._
    // GV01: magic + width(4, LE) + n_frames(4, LE) + body
    def gvidOf(frames: Seq[Array[Byte]]): Array[Byte] = {
      def le4(v: Int) = Array[Byte](
        (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      ("GV01".getBytes("UTF-8") ++ le4(32) ++ le4(frames.length) ++
        frames.flatten).toArray
    }
    val every = 4
    // 8 frames of 16 bytes; sampler takes frames 0 and 4
    def frame(seed: Int): Array[Byte] =
      Array.tabulate(16)(i => ((seed * 31 + i * 7) % 251).toByte)
    val base = (0 until 8).map(frame)
    // perturb frame 2 (UNSAMPLED): the perceptual signature must hold
    val unsampledPerturb = base.updated(2, frame(99))
    // perturb frame 4 (SAMPLED): the signature must move
    val sampledPerturb = base.updated(4, frame(99))
    val gvids = Seq((0L, gvidOf(base)), (1L, gvidOf(unsampledPerturb)),
        (2L, gvidOf(sampledPerturb)))
      .toDF("doc_id", "payload")
    val got = Multimodal.videoCanonGroups(gvids, every).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getLong(3)))
      .sortBy(_._1)
    assert(got(0)._2 == got(1)._2,
      "a change confined to unsampled frames must not move the signature")
    assert(got(0)._3 == 0L && got(1)._3 == 0L,
      "the unsampled-perturbed twin canon-groups under the base clip")
    assert(got(2)._2 != got(0)._2,
      "a sampled-frame change must move the signature")
    assert(got(0)._2 != ((0L, 0L)), "all-zero signature is degenerate")
  }

  test("audio dedup: a just-over-the-old-cap clip signatures exactly through the DECIMAL staging") {
    import spark.implicits._
    // 16,000,001 samples — one past the round-14 Long-product cap that
    // refused ~6-minute 44.1 kHz clips; the DECIMAL(38)-staged rule
    // must ACCEPT it and agree with a driver-side BigInt fold
    val n = 16000001
    val bytes = new Array[Byte](44 + 2 * n)
    var i = 0
    while (i < n) {
      // deterministic structured samples (varying magnitude per region)
      bytes(44 + 2 * i) = ((i * 131 + 7) & 0xFF).toByte
      bytes(45 + 2 * i) = (((i >> 8) * 29 + (i >> 16) * 5) & 0xFF).toByte
      i += 1
    }
    val got = Multimodal.audioCanonGroups(
        Seq((0L, bytes)).toDF("doc_id", "payload"))
      .head()
    // driver-side fold in BigInt (immune to any Long boundary)
    val bsum = new Array[BigInt](64).map(_ => BigInt(0))
    val bcnt = new Array[Long](64)
    var tsum = BigInt(0)
    i = 0
    while (i < n) {
      val raw = (bytes(44 + 2 * i) & 0xFF) + 256 * (bytes(45 + 2 * i) & 0xFF)
      val v = math.abs(if (raw >= 32768) raw - 65536 else raw)
      val j = (i.toLong * 64 / n).toInt
      bsum(j) += v; bcnt(j) += 1; tsum += v
      i += 1
    }
    var hi = 0L; var lo = 0L
    (0 until 64).foreach { j =>
      if (bcnt(j) > 0 && bsum(j) * n > tsum * bcnt(j)) {
        if (j < 32) hi |= 1L << j else lo |= 1L << (j - 32)
      }
    }
    assert((got.getLong(1), got.getLong(2)) == ((hi, lo)),
      "engine signature diverged from the BigInt band fold above the old cap")
    assert((hi, lo) != ((0L, 0L)), "all-zero signature is degenerate")
  }

  test("audio dedup driver key: exact replication of the band rule on one clip") {
    // replicate the engine end-to-end in driver-side integer arithmetic
    // for one sf document (the E11e aHash-replication discipline)
    val row = Multimodal.multimodalDedupAudio(spark, sf)
      .filter(col("doc_id") === 1L).head()
    val text = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") === 1L).select("text").head().getString(0)
    val bytes = text.getBytes("UTF-8")
    val n = bytes.length / 2
    val v = (0 until n).map { i =>
      val raw = (bytes(2 * i) & 0xFF) + 256 * (bytes(2 * i + 1) & 0xFF)
      math.abs(if (raw >= 32768) raw - 65536 else raw).toLong
    }
    val byBand = v.zipWithIndex.groupBy { case (_, i) => i.toLong * 64 / n }
    val tsum = v.sum
    var hi = 0L; var lo = 0L
    byBand.foreach { case (j, vs) =>
      val bsum = vs.map(_._1).sum
      if (bsum * n > tsum * vs.length) {
        if (j < 32) hi |= 1L << j else lo |= 1L << (j - 32)
      }
    }
    assert((row.getLong(1), row.getLong(2)) == ((hi, lo)),
      "engine signature diverged from the driver-side band fold")
  }

  test("batched decode emits one feature row per payload with stable stub features") {
    val feats = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.feature.length == 8))
    val again = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.map(f => (f.doc_id, f.feature.toSeq)).toSeq.sortBy(_._1) ==
      again.map(f => (f.doc_id, f.feature.toSeq)).toSeq.sortBy(_._1))
  }

  test("perceptual dedup: driver-side aHash replication, canon-group contracts") {
    val got = Multimodal.multimodalDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val texts = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def sig(text: String): (Long, Long) = {
      val bytes = text.getBytes("UTF-8")
      val nPx = bytes.length / 3
      val v = (0 until nPx).map(i =>
        (bytes(i * 3) & 0xFF).toLong + (bytes(i * 3 + 1) & 0xFF) +
          (bytes(i * 3 + 2) & 0xFF))
      val bsum = new Array[Long](64); val bcnt = new Array[Long](64)
      (0 until nPx).foreach { i =>
        val j = (i.toLong * 64 / nPx).toInt; bsum(j) += v(i); bcnt(j) += 1
      }
      val tsum = v.sum
      var hi = 0L; var lo = 0L
      (0 until 64).foreach { j =>
        if (bcnt(j) > 0 && bsum(j) * nPx > tsum * bcnt(j)) {
          if (j < 32) hi |= (1L << j) else lo |= (1L << (j - 32))
        }
      }
      (hi, lo)
    }
    // exact signature replication for every emitted row
    got.foreach { case (id, hi, lo, _, _) =>
      val (wh, wl) = sig(texts(id))
      assert((hi, lo) == ((wh, wl)), s"aHash diverged for doc $id")
    }
    // canon contracts: rep = min id of the signature group, kept iff rep
    val byGroup = got.groupBy(t => (t._2, t._3))
    byGroup.foreach { case (_, rows) =>
      val minId = rows.map(_._1).min
      assert(rows.forall(_._4 == minId), "rep must be the group min id")
      assert(rows.forall(t => t._5 == (t._1 == minId)), "kept iff canonical")
    }
    // identical texts (planted duplicates) share a group
    val dupTexts = texts.groupBy(_._2).filter(_._2.size > 1)
    dupTexts.foreach { case (_, docs) =>
      val sigs = docs.toSeq.flatMap { case (id, _) =>
        got.find(_._1 == id).map(t => (t._2, t._3))
      }
      assert(sigs.distinct.size <= 1,
        "identical texts must land in one signature group")
    }
  }

  test("JVM header decode agrees with the in-plan Catalyst parse") {
    val meta = Multimodal.multimodalMeta(spark, sf).select("doc_id", "dim1", "dim2")
    val dec = Multimodal.decodeFeatures(spark, sf).toDF()
      .select(col("doc_id"), col("width").cast("long").as("dw"),
        col("height").cast("long").as("dh"))
    val bad = meta.join(dec, "doc_id")
      .filter(col("dim1") =!= col("dw") || col("dim2") =!= col("dh"))
    assert(bad.count() == 0)
  }
}
