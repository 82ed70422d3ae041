package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("payloads carry real bytes: byte_len equals source text length (ASCII corpus)") {
    val meta = Multimodal.multimodalMeta(spark, sf)
    val n = graft.Tables.documents(spark, sf).count()
    assert(meta.count() == n)
    val joined = meta.join(graft.Tables.documents(spark, sf), "doc_id")
      .filter(org.apache.spark.sql.functions.expr("byte_len <> n_chars"))
    assert(joined.count() == 0)
  }

  test("batched decode emits one feature row per payload with stable stub features") {
    val feats = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(f => f.width >= 16 && f.width < 80))
    assert(feats.forall(f => f.height >= 16 && f.height < 80))
    // deterministic across runs
    val again = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.map(f => (f.doc_id, f.feature.toSeq)).toSeq.sortBy(_._1) ==
      again.map(f => (f.doc_id, f.feature.toSeq)).toSeq.sortBy(_._1))
  }

  test("decode dimensions agree with the in-plan metadata extraction") {
    import org.apache.spark.sql.functions._
    val meta = Multimodal.multimodalMeta(spark, sf).select("doc_id", "width", "height")
    val dec = Multimodal.decodeFeatures(spark, sf).toDF()
      .select(col("doc_id"), col("width").as("dw"), col("height").as("dh"))
    val bad = meta.join(dec, "doc_id")
      .filter(col("width") =!= col("dw") || col("height") =!= col("dh"))
    assert(bad.count() == 0)
  }
}
