package graft.tools

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Evidence dump for the round-16 "one exchange per dedup+rank round"
  * claim: the serving keys return eagerly-checkpointed frames, so
  * their explain output is a LogicalRDD scan that hides the round
  * shape. This probe dumps the PHYSICAL plan of one real beam round
  * (GraphIndex.beamRoundFrame — the exact loop body the serving keys
  * run) and, for comparison, the same frame with the pre-r16 shape
  * (dropDuplicates paying its own exchange before the top-B
  * aggregate's — the code this round replaced, reconstructed verbatim
  * minus the repartition).
  *
  *   runMain graft.tools.OptPlanProbe <sfDir> <outDir>
  */
object OptPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "plans/r16"
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(out))
    val k = 5
    val graph = graft.operators.GraphIndex.refinedGraph(spark, dir, k)
    val e = graph.select(col("src").as("cand"), col("dst"))
    val vecs = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("cv"))
    val qvecs = vecs.select(col("id").as("query_id"), col("cv").as("qv"))
    val beam = graph.select(col("src").as("query_id"), col("dst").as("cand"))
    val b = graft.operators.GraphIndex.beamWidth(k)

    // shipped shape: the real loop body
    val after = graft.operators.GraphIndex
      .beamRoundFrame(beam, e, qvecs, vecs, b, graft.operators.GraphIndex.DefaultMetric)
    Files.writeString(Paths.get(out, "beam_round_after.txt"),
      "one beam round (GraphIndex.beamRoundFrame) — the shipped round-16 shape:\n" +
        "repartition(query_id) serves BOTH the dedup and the top-B aggregate\n\n" +
        after.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))

    // pre-r16 shape: dropDuplicates pays its own (query_id, cand)
    // exchange, the aggregate pays a second (query_id) one
    val expand = beam.join(e, "cand").select(col("query_id"), col("dst").as("cand"))
    val candsOld = beam.select("query_id", "cand").union(expand)
      .filter(col("cand") =!= col("query_id"))
      .dropDuplicates("query_id", "cand")
    val scoredOld = candsOld
      .join(qvecs, "query_id")
      .join(vecs.select(col("id").as("cand"), col("cv")), "cand")
      .select(col("query_id"), col("cand"),
        // DefaultMetric is cosine; same distance column distCol builds
        graft.functions.VectorFunctions.cosineDistance(col("qv"), col("cv"))
          .as("dist"))
    val before = scoredOld.groupBy("query_id")
      .agg(graft.functions.VectorFunctions
        .topKByDistance(col("dist"), col("cand"), b).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("p"))
      .select(col("query_id"), col("p.id").as("cand"), col("p.dist").as("dist"))
    Files.writeString(Paths.get(out, "beam_round_before.txt"),
      "one beam round — the PRE-round-16 shape (dropDuplicates then groupBy,\n" +
        "each paying its own exchange), reconstructed verbatim for comparison\n\n" +
      before.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    println("[optplan] wrote beam_round_{before,after}.txt")
    spark.stop()
  }
}
