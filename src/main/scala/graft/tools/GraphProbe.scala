package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.{VectorFunctions, VectorMetric}
import graft.operators.{Dedup, GraphIndex, Ivf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch probe: where does graph-serving recall go on the sf
  * corpora? Measures, against the exact cosine contract:
  *   - the descent GRAPH's own recall (the ceiling edges can provide),
  *   - entry-only recall (nprobe=1 init, no graph),
  *   - beam serving at rounds 1..4, directed vs symmetrized expansion,
  *   - entry at nprobe=2.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val k = 5
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val exact = Ivf.exactEdges(spark, dir, k, VectorMetric.Cosine)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(df: DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (q, ex) =>
        (ex & got.getOrElse(q, Set.empty)).size.toDouble / k }
      rs.sum / rs.size
    }

    val (graph, iters) = Dedup.descentGraph(spark, dir, k)
    println(f"[gp] descent graph recall      ${recallOf(
      graph.select(col("src").as("query_id"), col("dst").as("neighbor_id")))}%.3f (iters $iters)")
    println(f"[gp] entry-only np=1 recall    ${recallOf(
      Ivf.annBatch(spark, dir, k, VectorMetric.Cosine, nprobeOpt = Some(1)))}%.3f")
    println(f"[gp] entry-only np=2 recall    ${recallOf(
      Ivf.annBatch(spark, dir, k, VectorMetric.Cosine, nprobeOpt = Some(2)))}%.3f")

    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("cv"))
    val dirEdges = graph.select("src", "dst")
    val symEdges = dirEdges.union(
      dirEdges.select(col("dst").as("src"), col("src").as("dst")))
      .dropDuplicates("src", "dst")
    def beamAt(edges: DataFrame, np: Int, rounds: Int, b: Int,
               seedOwn: Boolean = false): Double = {
      val entry0 = Ivf.annBatch(spark, dir, b, VectorMetric.Cosine,
          nprobeOpt = Some(np))
        .select(col("query_id"), col("neighbor_id").as("cand"))
      val entry = if (!seedOwn) entry0 else entry0
        .union(edges.select(col("src").as("query_id"), col("dst").as("cand")))
        .dropDuplicates("query_id", "cand")
      // inline variant of beamRounds with a round override
      val qvecs = vecs.select(col("id").as("query_id"), col("cv").as("qv"))
      val e = edges.select(col("src").as("cand"), col("dst"))
      var beam = entry
      var cur: DataFrame = null
      (1 to rounds).foreach { _ =>
        val expand = beam.join(e, "cand")
          .select(col("query_id"), col("dst").as("cand"))
        val cands = beam.select("query_id", "cand").union(expand)
          .filter(col("cand") =!= col("query_id"))
          .dropDuplicates("query_id", "cand")
        val scored = cands.join(qvecs, "query_id")
          .join(vecs.select(col("id").as("cand"), col("cv")), "cand")
          .select(col("query_id"), col("cand"),
            VectorFunctions.cosineDistance(col("qv"), col("cv")).as("dist"))
        cur = scored.groupBy("query_id")
          .agg(VectorFunctions.topKByDistance(col("dist"), col("cand"), b).as("nn"))
          .select(col("query_id"), explode(col("nn")).as("p"))
          .select(col("query_id"), col("p.id").as("cand"), col("p.dist").as("dist"))
          .localCheckpoint(true)
        beam = cur.select("query_id", "cand")
      }
      recallOf(cur.groupBy("query_id")
        .agg(VectorFunctions.topKByDistance(col("dist"), col("cand"), k).as("nn"))
        .select(col("query_id"), explode(col("nn")).as("p"))
        .select(col("query_id"), col("p.id").as("neighbor_id")))
    }
    val b = GraphIndex.beamWidth(k)
    (1 to 4).foreach { r =>
      println(f"[gp] dir  np=1 r=$r recall      ${beamAt(dirEdges, 1, r, b)}%.3f")
    }
    (1 to 4).foreach { r =>
      println(f"[gp] sym  np=1 r=$r recall      ${beamAt(symEdges, 1, r, b)}%.3f")
    }
    println(f"[gp] sym  np=2 r=3 recall      ${beamAt(symEdges, 2, 3, b)}%.3f")
    println(f"[gp] sym  np=1 r=3 B=4k recall ${beamAt(symEdges, 1, 3, 4 * k)}%.3f")
    (1 to 3).foreach { r =>
      println(f"[gp] sym+own np=1 r=$r recall   ${beamAt(symEdges, 1, r, b, seedOwn = true)}%.3f")
    }
    // the binding constraint at sf0.1 is the SUBSTRATE (the 5-iter
    // descent saturates at 0.742; served = 0.879): measure whether a
    // deeper descent at build time lifts the ceiling and what serving
    // through the deeper graph buys
    locally {
      val idVecs = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val n = Tables.embeddingsCount(spark, dir)
      val nc = Ivf.defaultK(n)
      val np = math.max(1, math.min(Dedup.DescentInitNprobe, nc))
      val init = Ivf.annBatch(spark, dir, k, VectorMetric.Cosine,
          nprobeOpt = Some(np))
        .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
      Seq(8, 12).foreach { mi =>
        val (deep, it) = Dedup.descentRounds(idVecs, init, n, k, maxIters = mi)
        println(f"[gp] deep descent mi=$mi recall ${recallOf(
          deep.select(col("src").as("query_id"), col("dst").as("neighbor_id")))}%.3f (iters $it)")
        val deepSym = deep.select("src", "dst").union(
          deep.select(col("dst").as("src"), col("src").as("dst")))
          .dropDuplicates("src", "dst")
        println(f"[gp] deep mi=$mi sym+own r=2    ${beamAt(deepSym, 1, 2, b, seedOwn = true)}%.3f")
        deep.unpersist()
      }
    }
    spark.stop()
  }
}
