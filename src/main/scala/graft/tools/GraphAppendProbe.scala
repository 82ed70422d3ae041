package graft.tools

import graft.GraftSession

/** Scratch probe: phase attribution for `stream_graph_append` — the
  * most expensive bench line (28.7 s committed at round 12). Runs the
  * EXACT driver key (Streams.streamGraphAppendTimed — one
  * implementation, no drift between key and probe) at the bench SF and
  * prints per-phase wall seconds: build (descent memo warm on pass 2) /
  * landing write / the 3-trigger stream drain (per-trigger beam
  * search-then-link + touched-bucket rewrite) / both disk read-backs /
  * the out-of-band re-descent rebuild.
  */
object GraphAppendProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[gappend] $dir")
    // two passes: pass 1 pays JVM/codegen/session-memo warm-up; pass 2
    // is the attribution of record (the bench's warm-median conditions)
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.streaming.Streams.streamGraphAppendTimed(spark, dir,
        (name, sec) => println(f"[gappend] p$pass $name%-26s $sec%8.2f s")).collect()
      println(f"[gappend] p$pass ${"TOTAL"}%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
