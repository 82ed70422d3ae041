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

  test("Bench calibration line runs constant work cleanly (no corpus, no leak)") {
    // must not depend on any SF dir or session memo, must clean its
    // temp tree, and must be repeatable within one session
    val before = java.io.File.listRoots()(0) // touch nothing corpus-like
    assert(before != null)
    Bench.calibration(spark)
    Bench.calibration(spark)
    val leaked = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_cal"))
    assert(leaked.isEmpty, s"calibration leaked temp trees: ${leaked.mkString(", ")}")
  }

  test("Bench per-pass storage fields exist and reflect cached state") {
    // a leak-vs-host-noise call must be answerable from the artifact:
    // the snapshot counts cached RDD blocks (cache + localCheckpoint).
    // The session is shared across concurrently-running suites, so a
    // single before/after delta can race another suite's cache or
    // unpersist — retry the short window a few times and require ONE
    // clean observation (the property under test is the snapshot's
    // sensitivity, not the session's global quiescence).
    val clean = (1 to 5).exists { _ =>
      val before = Bench.storageSnapshot(spark)
      val df = spark.range(1000).toDF("id").cache()
      df.count()
      val after = Bench.storageSnapshot(spark)
      df.unpersist(true)
      after._1 == before._1 + 1 && after._2 > before._2
    }
    assert(clean, "no clean +1 cached-rdd / +mem observation in 5 attempts")
    val pj = Bench.passJson("run1", (3, 42L, 7L))
    assert(pj == """{"pass":"run1","cached_rdds":3,"storage_mem_bytes":42,"storage_disk_bytes":7}""")
  }

  test("Bench compact summary line always fits the driver's 2000-char stdout tail") {
    // 3 runs + memos pass, realistic field sizes
    val passes = (Seq("memos") ++ (1 to 3).map("run" + _))
      .map(l => Bench.passJson(l, (999, 123456789012L, 987654321L)))
      .mkString("[", ",", "]")
    val line = Bench.compactJson(1234.567890123, "/root/testdata/sf0.1", 3,
      "[400.1234567,411.2345678,422.3456789]", passes, "{}", "BENCH_LOCAL.json",
      """{"median":0.8312345678,"spread":[0.7612345678,1.2712345678]}""")
    assert(line.length < 1800, s"compact line too long for the tail window: ${line.length}")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.contains(""""passes":[""") && line.contains(""""queries_file":"""))
    assert(line.contains(""""calibration":{"median":"""),
      "compact summary must carry the calibration normalizer")
  }
}
