package graft

import graft.operators.Analytics
import graft.streaming.Streams
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** D-series correctness by batch equivalence: the streaming jobs fed the
  * sf0.001 events must reproduce their batch twins (C5/C6).
  */
class StreamsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("D1 stream_window_agg == C5 batch window agg (counts per hour+type)") {
    val stream = Streams.streamWindowAgg(spark, sf)
      .select("hour", "event_type", "n_events")
    val batch = Analytics.eventsWindowAgg(spark, sf)
      .select("hour", "event_type", "n_events")
    assert(rows(stream) == rows(batch))
  }

  test("D2 stream_dedup keeps every distinct event_id (no dups in source)") {
    val stream = Streams.streamDedup(spark, sf)
    val batch = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .orderBy("event_type")
    assert(rows(stream) == rows(batch))
  }

  test("D3 stream_session == C6 batch sessionization (sessions per user)") {
    val stream = Streams.streamSession(spark, sf)
    val batch = Analytics.eventsSessionize(spark, sf)
    assert(rows(stream.select("user_id", "n_sessions", "n_events")) ==
      rows(batch.select("user_id", "n_sessions", "n_events")))
  }

  test("file-streamed harness == MemoryStream harness (same job, same rows)") {
    val viaFiles = Streams.streamWindowAgg(spark, sf)
    val viaMemory = Streams.runOnMemory(spark, sf, "complete")(Streams.windowAggJob)
      .orderBy("hour", "event_type")
    assert(rows(viaFiles) == rows(viaMemory))
  }
}
