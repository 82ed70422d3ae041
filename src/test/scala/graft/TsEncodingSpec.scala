package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-encoding matrix for events.ts (VERDICT r5 item 5): the same
  * logical event stream written in every ts encoding the testdata has
  * ever shipped — tz-adjusted TIMESTAMP micros, TIMESTAMP_NTZ micros
  * (the current layout), and raw long nanos — must produce IDENTICAL
  * results from every consumer class: the batch reader, unix_micros
  * session arithmetic, gap-fill sequence arithmetic, and the streaming
  * file source. One encoding flip broke eight operators in round 5;
  * this matrix makes that regression class unrepresentable.
  */
class TsEncodingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** 200 events, 7 users, 1..40-minute spacing with per-user jitter so
    * sessionize actually splits sessions (gaps > 30 min exist).
    */
  private def baseMicros: DataFrame =
    spark.range(0, 200).select(
      col("id").as("event_id"),
      (lit(1700000000000000L) + col("id") * 300000000L +
        (col("id") % 5) * 2100000000L).as("us"),
      (col("id") % 7).as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase")),
        (col("id") % 3).cast("int") + 1).as("event_type"),
      ((col("id") % 10).cast("double") + 0.5).as("value"),
      concat(lit("{\"k\":"), (col("id") % 4).cast("string"), lit("}")).as("props"))

  private def writeEncoding(kind: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_enc_$kind").toString
    val b = baseMicros
    val df = kind match {
      case "tz"    => b.withColumn("ts", timestamp_micros(col("us")))
      case "ntz"   => b.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      case "nanos" => b.withColumn("ts", col("us") * 1000L)
    }
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val dirs: Map[String, String] =
    Seq("tz", "ntz", "nanos").map(k => k -> writeEncoding(k)).toMap

  private def rendered(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertAllEncodingsAgree(run: String => DataFrame): Unit = {
    val results = dirs.map { case (k, d) => k -> rendered(run(d)) }
    val ref = results("tz")
    assert(ref.nonEmpty)
    for ((k, r) <- results) assert(r == ref, s"encoding '$k' diverged from 'tz'")
  }

  test("Tables.events canonicalizes every encoding to identical TimestampType rows") {
    for ((k, d) <- dirs) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType, s"encoding '$k'")
    }
    assertAllEncodingsAgree(d => Tables.events(spark, d).select("event_id", "ts"))
  }

  test("unix_micros consumers (sessionize, as-of join) agree across encodings") {
    assertAllEncodingsAgree(d => SparkEntry.queries("events_sessionize")(spark, d))
    assertAllEncodingsAgree(d => SparkEntry.queries("events_asof_join")(spark, d))
  }

  test("gap-fill sequence arithmetic agrees across encodings") {
    assertAllEncodingsAgree(d => SparkEntry.queries("events_gap_fill")(spark, d))
  }

  test("streaming file source agrees across encodings") {
    assertAllEncodingsAgree(d => SparkEntry.queries("stream_window_agg")(spark, d))
  }

  test("embeddings stored as array<double> normalize to array<float> with identical values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_embenc").toString
    val base = spark.range(0, 20).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        i => ((col("id") * 8 + i) % 100).cast("float") / 100.0f).as("embedding"))
    base.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val dirD = java.nio.file.Files.createTempDirectory("graft_embencd").toString
    base.withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$dirD/embeddings.parquet")
    val f = Tables.embeddings(spark, dir)
    val d = Tables.embeddings(spark, dirD)
    assert(d.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true) ||
      d.schema("embedding").dataType == ArrayType(FloatType, containsNull = false))
    assert(rendered(d) == rendered(f))
    // an int-array encoding is not a vector column — fail loudly
    val dirI = java.nio.file.Files.createTempDirectory("graft_embenci").toString
    base.withColumn("embedding", col("embedding").cast("array<int>"))
      .write.mode("overwrite").parquet(s"$dirI/embeddings.parquet")
    val e = intercept[IllegalArgumentException](Tables.embeddings(spark, dirI))
    assert(e.getMessage.contains("unsupported"))
  }

  test("streaming from an empty landing zone starts and drains empty (no schema-probe crash)") {
    // a production landing zone exists before its first file arrives —
    // the footer probe must fall back to the canonical encoding, not
    // fail stream construction
    val empty = java.nio.file.Files.createTempDirectory("graft_emptylz").toString
    assert(graft.streaming.Streams.streamWindowAgg(spark, empty).count() == 0)
  }

  test("an unknown ts encoding fails loudly, never silently mis-times") {
    val bad = baseMicros.withColumn("ts", col("us").cast("string"))
    val e = intercept[IllegalArgumentException](Tables.normalizeTs(bad))
    assert(e.getMessage.contains("unsupported"))
  }
}
