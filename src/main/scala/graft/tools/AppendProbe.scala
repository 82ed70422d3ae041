package graft.tools

import graft.GraftSession

/** Scratch probe: phase attribution for `stream_index_append` — the
  * most expensive non-memo bench line (12.5 s committed at round 10).
  * Runs the EXACT driver key (Streams.streamIndexAppendTimed — one
  * implementation, no drift between key and probe) at the bench SF and
  * prints per-phase wall seconds: build / landing write / the 3-trigger
  * stream drain (per-trigger encode + profile-consulted landing) /
  * both disk read-backs / the out-of-band rebuild.
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[append] $dir")
    // two passes: pass 1 pays JVM/codegen/session-memo warm-up (like the
    // bench's memo pass); pass 2 is the attribution of record — it
    // matches the bench line's warm median conditions
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.streaming.Streams.streamIndexAppendTimed(spark, dir,
        (name, sec) => println(f"[append] p$pass $name%-26s $sec%8.2f s")).collect()
      println(f"[append] p$pass ${"TOTAL"}%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
