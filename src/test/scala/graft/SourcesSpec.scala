package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_src").toString

  test("embeddings round-trip losslessly through CSV via packed arrays") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val path = tmp()
    Sources.writeCsv(e.select(col("vec_id"), Sources.packArray(col("embedding")).as("emb"),
      col("label")), path)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("emb", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("label", org.apache.spark.sql.types.IntegerType)))
    val back = Sources.readCsv(spark, path, schema)
      .select(col("vec_id"), Sources.unpackArray(col("emb")).as("embedding"), col("label"))
    val orig = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rt = back.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rt.keySet == orig.keySet)
    assert(orig.forall { case (k, v) => rt(k) == v })
  }

  test("documents round-trip through JSON with explicit schema") {
    val d = Tables.documents(spark, sf).limit(20)
    val path = tmp()
    Sources.writeJson(d, path)
    val back = Sources.readJson(spark, path, d.schema)
    assert(back.count() == 20)
    assert(back.schema == d.schema)
    val origRows = d.orderBy("doc_id").collect().toSeq
    assert(back.orderBy("doc_id").collect().toSeq == origRows)
  }

  test("bucketed fact-fact join plans with NO shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Sources.writeBucketed(Tables.orders(spark, sf)
        .select("o_orderkey", "o_totalprice"), "b_ord", 8, "o_orderkey")
      Sources.writeBucketed(Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_extendedprice"), "b_li", 8, "l_orderkey")
      val joined = spark.table("b_li").join(spark.table("b_ord"),
        col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          shuffles(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => shuffles(q.plan)
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
        case other => other.children.map(shuffles).sum
      }
      assert(shuffles(joined.queryExecution.executedPlan) == 0,
        s"bucketed join still shuffled:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() ==
        Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_ord")
      spark.sql("DROP TABLE IF EXISTS b_li")
    }
  }

  test("compaction rewrites many small files into size-targeted few, same data") {
    val path = tmp() + "/frag"
    val e = Tables.events(spark, sf).select("event_id", "event_type", "value")
    e.repartition(64).write.parquet(path)
    val before = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 32, s"expected fragmentation, got $before files")
    // order-independent content checksum (double sums reorder under
    // repartition; xor of row hashes does not)
    def checksum() = spark.read.parquet(path)
      .agg(expr("bit_xor(xxhash64(event_id, event_type, value))")).head().getLong(0)
    val sum0 = checksum()
    Sources.compact(spark, path)
    val after = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after < before / 4, s"compaction left $after files (was $before)")
    assert(checksum() == sum0)
    assert(spark.read.parquet(path).count() == e.count())
  }

  test("streaming parquet sink lands exactly-once across a restart") {
    val src = tmp(); val out = tmp(); val ckpt = tmp()
    val events = Tables.events(spark, sf).limit(100)
    events.write.mode("overwrite").parquet(src)
    def run(): Unit = Sources.streamToParquet(
      Sources.streamDir(spark, src, events.schema), out, ckpt)
    run()
    // restart against the same checkpoint: the drained source must not
    // be re-landed (WAL + manifest make the restart a no-op)
    run()
    assert(spark.read.parquet(out).count() == 100)
  }

  test("streaming file source tails a directory with a fixed schema") {
    val path = tmp()
    val events = Tables.events(spark, sf).limit(100)
    events.write.mode("overwrite").parquet(path)
    val stream = Sources.streamDir(spark, path, events.schema)
    assert(stream.isStreaming)
    val q = stream.groupBy("event_type").count()
      .writeStream.format("memory").queryName("src_tail").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("src_tail").agg(sum("count")).head().getLong(0)
    assert(got == 100)
  }
}
