package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string literal: backslash, quote, and ALL control chars
    * (<0x20) escaped — a tab or CR in builder-authored SQL would
    * otherwise make the driver's json.load fail and silently zero the
    * round's correctness. Shared by both driver mains (Verify's
    * oracle_sql.json and Bench's errors map).
    */
  private[graft] def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump one query's result; on failure write a LOUD sentinel instead
    * of dropping the key. Round 5 proved the silent shape is how a
    * regression ships: a throwing key simply had no row in the driver's
    * correctness report, which reads as "not checked", not "broken".
    * The sentinel is a one-row parquet with a `graft_error` column —
    * the driver's schema/row compare against the real oracle then
    * records a hard mismatch for the key — plus `<name>.error.txt`
    * with the full stack trace for diagnosis. Returns the error
    * rendering, None on success (pinned by HarnessSpec).
    */
  private[graft] def dumpOne(spark: SparkSession, sfDir: String, outDir: String,
                             name: String,
                             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[String] =
    try {
      val df = fn(spark, sfDir)
      // GRAFT_EXPLAIN=1: dump each physical plan for shuffle/pushdown
      // audits (SURVEY §6) without touching the driver's output.
      if (sys.env.contains("GRAFT_EXPLAIN")) {
        println(s"===== $name ====="); df.explain("formatted")
      }
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      None
    } catch { case e: Throwable =>
      val msg = e.toString.linesIterator.take(1).mkString.take(500)
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      try {
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        Files.writeString(Paths.get(s"$outDir/$name.error.txt"), sw.toString)
        import spark.implicits._
        Seq(msg).toDF("graft_error")
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e2: Throwable =>
        // even the sentinel failed (disk?) — the stderr line above is
        // then the only trace; never let the error path kill the run
        System.err.println(s"[verify] $name sentinel write failed: $e2")
      }
      Some(msg)
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // GRAFT_ONLY=key1,key2: restrict the dump to a comma-separated key
    // subset (local iteration on new operators; the driver never sets it).
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(ks) => SparkEntry.queries.filter { case (n, _) => ks(n) }
      case None     => SparkEntry.queries
    }
    selected.foreach { case (name, fn) => dumpOne(spark, sfDir, outDir, name, fn) }
    val q = jsonString _
    // dynamic oracles are filtered BEFORE generation so GRAFT_ONLY
    // iteration never pays an unrelated model's training
    val dynamic = SparkEntry.dynamicOracleSql
      .filter { case (n, _) => only.forall(_(n)) }
      .map { case (n, gen) => n -> gen(spark, sfDir) }
    val oracles = (only match {
      case Some(ks) => SparkEntry.oracleSql.filter { case (n, _) => ks(n) }
      case None     => SparkEntry.oracleSql
    }) ++ dynamic
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
