package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** D-series: Structured Streaming jobs over the events stream — the
  * scale path the reference (a point-serving in-memory store) lacks.
  * Each job is the streaming twin of a batch query (C5/C6 semantics)
  * so correctness is checked by equivalence: feed the same rows through
  * a MemoryStream, compare with the batch answer.
  *
  * Scale notes: every job bounds its state with a watermark (late data
  * past 1 hour is dropped, window/session state is purged as the
  * watermark advances), so executor state stays proportional to the
  * active window, not the stream history. Sessionization uses Spark's
  * native session_window (merging-window state in Tungsten) rather than
  * a hand-rolled flatMapGroupsWithState — same semantics, codegen'd
  * state handling.
  */
object Streams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run `job` on the sf events fed through a MemoryStream, write to a
    * memory sink, return the sink contents as a batch DataFrame.
    */
  private def runOnEvents(spark: SparkSession, dir: String,
                          outputMode: String)
                         (job: Dataset[Event] => DataFrame): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect()
    val stream = MemoryStream[Event]
    stream.addData(rows.toIndexedSeq)
    val sink = s"graft_stream_sink_${counter.incrementAndGet()}"
    val q = job(stream.toDS())
      .writeStream.format("memory").queryName(sink).outputMode(outputMode)
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    spark.table(sink)
  }

  /** D1: tumbling 1-hour window aggregation with a 1-hour watermark
    * (streaming twin of C5).
    */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame =
    runOnEvents(spark, dir, "complete") { ds =>
      ds.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 4)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 4))
            .cast("double").as("total_value"))
        .select(col("window.start").as("hour"), col("event_type"),
          col("n_events"), col("total_value"))
    }.orderBy("hour", "event_type")

  /** D2: streaming exact dedup on event_id within the watermark; the
    * per-type rollup happens batch-side on the sink (a streaming query
    * allows one stateful op per chain).
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame =
    runOnEvents(spark, dir, "append") { ds =>
      ds.withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
        .toDF()
    }.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** D4: stream-static enrichment join — the streaming side joins a
    * static dimension (customer) per micro-batch; Spark broadcasts the
    * static side so the stream never shuffles. Output: running event
    * counts per market segment (events from users without a customer
    * row fall into the 'unknown' bucket).
    */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    runOnEvents(spark, dir, "complete") { ds =>
      ds.join(cust, ds("user_id") === cust("c_custkey"), "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("unknown")).as("segment"))
        .agg(count(lit(1)).as("n_events"))
    }.orderBy("segment")
  }

  /** D3: gap-based sessionization (30-minute inactivity) via native
    * session_window — streaming twin of C6. The streaming query emits
    * one row per (user, session); the per-user rollup is batch on the
    * sink.
    */
  def streamSession(spark: SparkSession, dir: String): DataFrame =
    runOnEvents(spark, dir, "complete") { ds =>
      ds.withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
    }.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .orderBy("user_id")
}
