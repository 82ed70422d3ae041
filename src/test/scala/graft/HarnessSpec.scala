package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the LOUD-failure contract of the two driver mains (VERDICT r5
  * item 2/3): a deliberately-broken key must surface as an error in
  * both artifacts — never as a silently-absent correctness row or a
  * ~0.05s bench line.
  */
class HarnessSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val boom: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("deliberate harness failure")

  test("Verify.dumpOne writes a graft_error sentinel + stack trace for a throwing key") {
    val out = java.nio.file.Files.createTempDirectory("graft_harness").toString
    val err = Verify.dumpOne(spark, "/nonexistent", out, "broken_key", boom)
    assert(err.exists(_.contains("deliberate harness failure")))
    // sentinel parquet: the driver's compare sees a hard schema/row
    // mismatch for the key instead of no row at all
    val sentinel = spark.read.parquet(s"$out/broken_key")
    assert(sentinel.columns.toSeq == Seq("graft_error"))
    assert(sentinel.count() == 1)
    assert(sentinel.head().getString(0).contains("deliberate harness failure"))
    val trace = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/broken_key.error.txt"))
    assert(trace.contains("IllegalStateException"))
  }

  test("Verify.dumpOne returns None and writes real output for a healthy key") {
    val out = java.nio.file.Files.createTempDirectory("graft_harness").toString
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("id")
    assert(Verify.dumpOne(spark, "/nonexistent", out, "ok_key", ok).isEmpty)
    assert(spark.read.parquet(s"$out/ok_key").count() == 3)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/ok_key.error.txt")))
  }

  test("Bench.timed captures the failure instead of swallowing it") {
    val (_, err) = Bench.timed(() => throw new IllegalStateException("boom bench"))
    assert(err.exists(_.contains("boom bench")))
    val (sec, ok) = Bench.timed(() => ())
    assert(ok.isEmpty && sec >= 0.0)
  }
}
