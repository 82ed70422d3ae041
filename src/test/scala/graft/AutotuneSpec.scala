package graft

import graft.operators.{Autotune, Pq}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** E53 contracts: the tuner's pick satisfies its floor on the measured
  * grids, persists, and is CONSUMED by the tuned serving default.
  */
class AutotuneSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every pick meets its AXIS floor on the measured grids; sentinels only when nothing does") {
    val sweep = Autotune.sweepGrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))) // (nprobe, recall_permille)
    val tiers = Autotune.tierGrid(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(5))) // (tier, refine, recall)
    Autotune.annAutotune(spark, sf).collect().foreach { r =>
      val floor = r.getAs[Long]("floor_permille")
      val axis = r.getAs[Long]("axis_floor_permille")
      // the composed floor qualifies each axis at ceil(sqrt(floor))
      assert(axis == Autotune.axisFloor(floor.toInt).toLong)
      assert(axis >= floor, "the axis bar must be at least the composed floor")
      val np = r.getAs[Long]("nprobe")
      val tier = r.getAs[String]("tier")
      val refine = r.getAs[Long]("refine")
      val qualifying = sweep.filter(_._2 >= axis)
      if (np == -1L) assert(qualifying.isEmpty, s"floor $floor: sentinel despite a qualifying nprobe")
      else {
        assert(qualifying.nonEmpty && np == qualifying.map(_._1).min,
          s"floor $floor: nprobe $np is not the smallest qualifying probe count")
      }
      val tq = tiers.filter(_._3 >= axis)
      if (tier == "none") assert(tq.isEmpty)
      else assert(tq.exists(t => t._1 == tier && t._2 == refine),
        s"floor $floor: chosen ($tier, $refine) does not meet the axis bar on the grid")
    }
  }

  test("PQ-restricted pick comes from the PQ family and is the restricted grid's argmin") {
    val axis = Autotune.axisFloor(500).toLong
    val tiers = Autotune.tierGrid(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    Autotune.annAutotuneTiers(spark, sf, 5, Some(Autotune.PqFamilyTiers))
      .filter(org.apache.spark.sql.functions.col("floor_permille") === 500L)
      .collect().foreach { r =>
        val tier = r.getAs[String]("tier")
        val qualifying = tiers.filter(t =>
          Autotune.PqFamilyTiers.contains(t._1) && t._4 >= axis)
        if (tier == "none") assert(qualifying.isEmpty)
        else {
          assert(Autotune.PqFamilyTiers.contains(tier),
            s"restricted pick must stay in the PQ family, got $tier")
          // the pick is the restricted grid's own argmin by
          // (cand_per_query, bytes, tier) — sq8 can no longer shadow it
          val best = qualifying.minBy(t => (t._3, t._1))
          assert(tier == best._1 && r.getAs[Long]("refine") == best._2,
            s"restricted pick ($tier) is not the qualifying argmin ($best)")
        }
      }
  }

  test("graph tuner: every pick is the measured argmin under its floor; tuned serving consumes it") {
    val gi = graft.operators.GraphIndex
    val grid = gi.graphTuneGrid(spark, sf)
    assert(grid.map(t => (t._1, t._2)).toSet ==
      gi.TuneGrid.map { case (r, m) => (r, gi.beamWidth(5) * m) }.toSet,
      "one measured row per grid config")
    gi.graphAutotune(spark, sf).collect().foreach { r =>
      val floor = r.getAs[Long]("floor_permille")
      val (rounds, beam, rec) = (r.getAs[Long]("rounds"),
        r.getAs[Long]("beam"), r.getAs[Long]("recall_permille"))
      val qual = grid.filter(_._3 >= floor)
      if (rounds < 0) assert(qual.isEmpty,
        s"floor $floor got a sentinel but ${qual.size} configs qualify")
      else {
        assert(rec >= floor, s"pick under floor $floor misses it: $rec")
        val want = qual.minBy { case (rr, bb, _) => (rr.toLong * bb, rr, bb) }
        assert((rounds, beam) == ((want._1.toLong, want._2.toLong)),
          s"floor $floor pick ($rounds,$beam) is not the measured argmin $want")
      }
    }
    // the sidecar round-trips and the tuned serving runs the pick
    val tree = gi.tunedGraphTree(spark, sf)
    val pick = gi.loadGraphAutotune(spark, tree)
    assert(pick.isDefined, "_autotune_graph sidecar must round-trip")
    val (pr, pb) = pick.get
    assert(pr > 0 && pb > 0,
      "the 900-permille floor must be attainable under the two-phase builder")
    val tuned = gi.graphTopkTuned(spark, sf).collect().toSeq
    val explicit = gi.graphTopkAt(spark, sf, 5,
      graft.functions.VectorMetric.Cosine, pr.toInt, pb.toInt).collect().toSeq
    assert(tuned == explicit, "tuned graph serving must run the persisted pick")
  }

  test("per-metric graph tuner: l2/dot picks are their own grids' argmins; tuned serving honors the per-metric sidecar") {
    val gi = graft.operators.GraphIndex
    val tree = gi.tunedGraphTree(spark, sf)
    Seq(graft.functions.VectorMetric.L2,
        graft.functions.VectorMetric.Dot).foreach { m =>
      val grid = gi.graphTuneGrid(spark, sf, metric = m)
      gi.graphAutotune(spark, sf, metric = m).collect().foreach { r =>
        val floor = r.getAs[Long]("floor_permille")
        val (rounds, beam, rec) = (r.getAs[Long]("rounds"),
          r.getAs[Long]("beam"), r.getAs[Long]("recall_permille"))
        val qual = grid.filter(_._3 >= floor)
        if (rounds < 0) assert(qual.isEmpty,
          s"metric $m floor $floor got a sentinel but ${qual.size} configs qualify")
        else {
          assert(rec >= floor, s"metric $m pick under floor $floor misses it: $rec")
          val want = qual.minBy { case (rr, bb, _) => (rr.toLong * bb, rr, bb) }
          assert((rounds, beam) == ((want._1.toLong, want._2.toLong)),
            s"metric $m floor $floor pick ($rounds,$beam) is not the measured argmin $want")
        }
      }
      // the per-metric sidecar row round-trips and tuned serving runs
      // exactly that pick (sentinel ⇒ the family defaults)
      val pick = gi.loadGraphAutotune(spark, tree, m)
      assert(pick.isDefined, s"metric $m row missing from _autotune_graph")
      val (pr, pb) = pick.get
      val (er, eb) =
        if (pr > 0 && pb > 0) (pr.toInt, pb.toInt)
        else (gi.BeamRounds, gi.beamWidth(5))
      val tuned = gi.graphTopkTuned(spark, sf, metric = m).collect().toSeq
      val explicit = gi.graphTopkAt(spark, sf, 5, m, er, eb).collect().toSeq
      assert(tuned == explicit,
        s"metric $m tuned serving must run the persisted pick ($pr,$pb)")
    }
    // a metric-less row set cannot shadow another metric's pick: the
    // cosine row is still there and still the cosine grid's argmin
    val cosPick = gi.loadGraphAutotune(spark, tree)
    assert(cosPick.isDefined, "cosine row missing from the per-metric sidecar")
  }

  test("index_select: each floor's family is the measured argmin under the stated (cand, bytes, family) objective") {
    val gi = graft.operators.GraphIndex
    val n = Tables.embeddings(spark, sf).count()
    val nc = graft.operators.Ivf.defaultK(n).toLong
    val dim = Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0).toLong
    val k = 5
    val sweep = Autotune.sweepGrid(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    val e53 = Autotune.annAutotune(spark, sf).collect()
      .map(r => r.getAs[Long]("floor_permille") ->
        (r.getAs[Long]("nprobe"), r.getAs[String]("tier"),
          r.getAs[Long]("cand_per_query"), r.getAs[Long]("bytes_per_vec"))).toMap
    val graph = gi.graphTuneGrid(spark, sf)
    val got = Autotune.indexSelect(spark, sf).collect()
      .map(r => r.getAs[Long]("floor_permille") ->
        (r.getAs[String]("family"), r.getAs[Long]("cand_per_query"),
          r.getAs[Long]("bytes_per_vec"))).toMap
    Autotune.Floors.foreach { f =>
      // the four families' (cand, bytes) tuples, re-derived from the
      // SAME grids with the scaladoc's arithmetic
      val fams = scala.collection.mutable.ArrayBuffer[(String, Long, Long)](
        ("linear", n, 4L * dim))
      sweep.filter(_._2 >= f).map(_._1).sorted.headOption
        .foreach(np => fams += (("ivf", n * np / nc, 4L * dim)))
      e53.get(f.toLong).collect { case (np, tier, cand, bytes)
          if np > 0 && tier != "none" => fams += (("ivfpq", cand, bytes)) }
      graph.filter(_._3 >= f)
        .sortBy { case (r, b, _) => (r.toLong * b, r, b) }.headOption
        .foreach { case (r, b, _) =>
          fams += (("graph", r.toLong * b * 2 * k, 4L * dim + 20L * k)) }
      val want = fams.minBy { case (fam, cand, bytes) => (cand, bytes, fam) }
      assert(got(f.toLong) == want,
        s"floor $f: pick ${got(f.toLong)} is not the argmin $want over $fams")
    }
    // non-vacuous: at least one floor must pick a non-linear family
    // (the measured grids exist precisely to beat the full scan)
    assert(got.values.exists(_._1 != "linear"),
      "every floor fell back to the linear scan — the grids are degenerate")
  }

  test("knn_auto serves exactly the picked family's own tuned face (the dispatch wiring)") {
    val pick = Autotune.indexSelect(spark, sf)
      .filter(col("floor_permille") === Autotune.AutoFloor.toLong).head()
    val family = pick.getAs[String]("family")
    val got = Autotune.knnAuto(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    // the picked family's key, run DIRECTLY at the pick's operating
    // point — knn_auto must reproduce it row-for-row
    val wantDf = family match {
      case "linear" => graft.operators.Dedup.annTopkBatch(spark, sf)
      case "ivf" =>
        graft.operators.Ivf.annBatch(spark, sf, 5,
          graft.functions.VectorMetric.Cosine,
          nprobeOpt = Some(pick.getAs[Long]("nprobe").toInt))
      case "ivfpq" =>
        // pins the DISPATCH (right family, right (np, rf), right lift)
        // against the family's own shared face; deep serving
        // correctness is the DuckDB oracle's job
        val np = pick.getAs[Long]("nprobe")
        val rf = pick.getAs[Long]("refine")
        val tier = pick.getAs[String]("tier")
        val served =
          if (np > 0 && rf > 0 && graft.operators.Autotune.PqFamilyTiers.contains(tier))
            Pq.ivfpqTopkAt(spark, sf, 5, np.toInt, rf.toInt)
          else Pq.ivfpqTopkTuned(spark, sf, 5)
        served.select(org.apache.spark.sql.functions.lit(0L).as("query_id"),
          col("neighbor_id"), col("rank"))
      case "graph" =>
        graft.operators.GraphIndex.graphTopkAt(spark, sf, 5,
          graft.functions.VectorMetric.Cosine,
          pick.getAs[Long]("rounds").toInt, pick.getAs[Long]("beam").toInt)
    }
    val want = wantDf.select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(got.nonEmpty, "knn_auto served nothing")
    assert(got == want,
      s"knn_auto (family $family) diverged from the family's own serving")
  }

  test("writeAutotune refuses an off-grid floor at write time") {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_at_bad")
    try {
      val e = intercept[IllegalArgumentException] {
        Autotune.writeAutotune(spark, sf, tmpDir.toString, floor = 600)
      }
      assert(e.getMessage.contains("not on the tuned grid"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("the persisted pick is consumed by tuned serving (round trip)") {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_at")
    val tmp = tmpDir.toString
    try {
      Pq.writeIvfPq(spark, sf, tmp)
      Autotune.writeAutotune(spark, sf, tmp, floor = 500)
      val pick = Autotune.loadAutotune(spark, tmp)
      assert(pick.isDefined, "_autotune sidecar must round-trip")
      val (np, rf, tier) = pick.get
      assert(np > 0 && rf > 0, "the 500-permille floor must be attainable here")
      val q = Tables.embeddings(spark, sf)
        .filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0).toArray
      val refineSrc = Some(Tables.embeddings(spark, sf))
      val tuned = Pq.queryIvfPqTuned(spark, tmp, q, 10,
          nprobeDefault = 1, refineWith = refineSrc)
        .collect().map(_.getLong(0)).toSeq
      val explicit = Pq.queryIvfPq(spark, tmp, q, 10, np.toInt,
          refineSrc, rf.toInt)
        .collect().map(_.getLong(0)).toSeq
      if (Autotune.PqFamilyTiers.contains(tier))
        assert(tuned == explicit, "tuned serving must run the persisted pick")
      else {
        // a non-PQ tier's refine was measured against different codes:
        // the sidecar must NOT be applied and the defaults stand
        val defaults = Pq.queryIvfPq(spark, tmp, q, 10, 1, refineSrc, 4)
          .collect().map(_.getLong(0)).toSeq
        assert(tuned == defaults,
          s"a $tier pick must not configure the IVF-PQ serving path")
      }
      // deleting the sidecar falls back to the caller's defaults
      val p = new org.apache.hadoop.fs.Path(s"$tmp/_autotune")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      val fallback = Pq.queryIvfPqTuned(spark, tmp, q, 10,
          nprobeDefault = np.toInt, refineDefault = rf.toInt,
          refineWith = refineSrc)
        .collect().map(_.getLong(0)).toSeq
      assert(fallback == explicit)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmpDir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
