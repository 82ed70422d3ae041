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

  test("batched decode emits one feature row per payload with stable stub features") {
    val feats = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.feature.length == 8))
    val again = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.map(f => (f.doc_id, f.feature.toSeq)).toSeq.sortBy(_._1) ==
      again.map(f => (f.doc_id, f.feature.toSeq)).toSeq.sortBy(_._1))
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
