package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("chunking: size 200 stride 150, last chunk clipped to n_chars") {
    val docs = Seq((1L, "x" * 380, 380L)).toDF("doc_id", "text", "n_chars")
    val got = TextOps.chunks(docs)
      .select("chunk_idx", "start_idx", "end_idx")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((0, 0L, 200L), (1, 150L, 350L), (2, 300L, 380L)))
  }

  test("chunk text overlap: consecutive chunks share 50 chars") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val docs = Seq((1L, text, text.length.toLong)).toDF("doc_id", "text", "n_chars")
    val byIdx = TextOps.chunks(docs).collect()
      .map(r => r.getAs[Int]("chunk_idx") -> r.getAs[String]("chunk_text")).toMap
    assert(byIdx(0) == text.substring(0, 200))
    assert(byIdx(1) == text.substring(150, 350))
    assert(byIdx(0).substring(150) == byIdx(1).substring(0, 50))
  }

  test("fingerprint is order-sensitive (positional rolling hash)") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta alpha")).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .select(col("doc_id"),
        ((conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long") % 2147483647L)
          * (col("pos") + 1)).as("contrib"))
      .groupBy("doc_id").agg((sum(col("contrib")) % 1152921504606846976L).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) != fps(2L))
  }

  test("stratified sample is deterministic, band-monotone in rate, and content-keyed by id") {
    import graft.operators.TextOps
    val sf = "/root/testdata/sf0.001"
    val a = TextOps.sampleStratified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val b = TextOps.sampleStratified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(a == b, "sample must be identical across runs")
    assert(a.nonEmpty && a.size < 500, s"sample must be a strict subset, got ${a.size}")
    // keep share grows with the band: (band+1)*150 per mille
    val byBand = a.groupBy(_._2).view.mapValues(_.size).toMap
    val total = graft.Tables.documents(spark, sf).count()
    assert(byBand.keys.forall(band => band >= 0 && band <= 3))
    // membership is pure id arithmetic — recompute one row by hand
    a.take(20).foreach { case (id, band) =>
      assert((id * TextOps.SampleHashMult) % 1000 < (band + 1) * TextOps.SampleRatePerBand)
    }
    assert(total > 0)
  }

  test("token shards: contiguous, budget-bounded, and equal to the global cumsum assignment") {
    import graft.operators.TextOps
    val sf = "/root/testdata/sf0.001"
    val budget = TextOps.ShardTokenBudget
    val rows = TextOps.packTokenShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty)
    // driver-side recomputation of the global prefix-sum assignment:
    // the two-stage distributed version must match exactly
    var prior = 0L
    rows.sortBy(_._1).foreach { case (_, n, shard) =>
      assert(shard == prior / budget, s"shard drifted at prior=$prior")
      prior += n
    }
    // shards are contiguous in doc order and each holds < budget prior
    // tokens plus its last (possibly overflowing) doc
    val shardSums = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxDoc = rows.map(_._2).max
    shardSums.foreach { case (shard, s) =>
      assert(s <= budget + maxDoc, s"shard $shard over budget: $s")
    }
  }

  test("pipeline_dedup_corpus: near-dup canonicalization only ever removes E12 survivors") {
    import graft.operators.TextOps
    val sf = "/root/testdata/sf0.001"
    val e12 = TextOps.pipelineCleanCorpus(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val e16 = TextOps.pipelineDedupCorpus(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(e16.nonEmpty)
    // per source: adding the near-dup filter can only shrink the count,
    // and total shrinkage equals the number of E12 survivors that are
    // non-canonical members of a near-dup component
    e16.foreach { case (src, n) =>
      assert(n <= e12.getOrElse(src, 0L), s"source $src grew under a stricter filter")
    }
    val nonCanon = graft.operators.Dedup.dedupComponents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") =!=
        org.apache.spark.sql.functions.col("component_id"))
      .collect().map(_.getLong(0)).toSet
    val removed = e12.values.sum - e16.values.sum
    assert(removed >= 0 && removed <= nonCanon.size,
      s"removed $removed docs but only ${nonCanon.size} non-canonical members exist")
  }

  test("token_budget_plan == driver-side integer recomputation; budget conserved; flattening") {
    import graft.operators.TextOps
    val sf = "/root/testdata/sf0.001"
    val rows = TextOps.tokenBudgetPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // exact mirror from the collected per-source token counts
    val sq = rows.map { case (_, _, nt, _, _, _) => math.sqrt(nt.toDouble).toLong }
    val totSq = sq.sum
    val budget = rows.map(_._3).sum
    rows.zip(sq).foreach { case ((src, _, nt, w, planned, epochs), s) =>
      assert(w == s * 1000 / totSq, s"$src weight")
      assert(planned == budget * s / totSq, s"$src planned")
      assert(epochs == (budget * s / totSq) * 1000 / nt, s"$src epochs")
    }
    // integer-floor division can only lose mass, never mint it
    assert(rows.map(_._5).sum <= budget)
    // temperature flattening: the token-poorest source repeats at least
    // as hard as the token-richest one. NOT a theorem at near-ties —
    // floor(sqrt(n))/n is non-monotone within one isqrt step around a
    // perfect square — so only assert when the gap is real (ratio ≥ 4
    // ⇒ the √-ratio ≥ 2 dominates any ±1 floor slip)
    val poorest = rows.minBy(_._3)
    val richest = rows.maxBy(_._3)
    if (richest._3 >= 4 * poorest._3)
      assert(poorest._6 >= richest._6,
        s"flattening violated: ${poorest._1}=${poorest._6} < ${richest._1}=${richest._6}")
  }

  test("pipeline_attrition_report: monotone funnel, and n_survivors ≡ E16 per source") {
    import graft.operators.TextOps
    val sf = "/root/testdata/sf0.001"
    val rows = TextOps.pipelineAttritionReport(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, l, q, e, s) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n >= l && l >= q && q >= e && e >= s,
        s"source ${r.getString(0)}: funnel not monotone ($n,$l,$q,$e,$s)")
    }
    // the funnel's last column IS the E16 survivor count — same rule,
    // same graph; E16 omits zero-survivor sources, the funnel keeps them
    val e16 = TextOps.pipelineDedupCorpus(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(5) == e16.getOrElse(r.getString(0), 0L),
        s"source ${r.getString(0)}: funnel survivors ${r.getLong(5)} != E16")
    }
  }

  test("MAD outliers match an independent scala recomputation (lower-median semantics)") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val med = docs.groupBy(_._2).map { case (s, rs) => s -> lowerMedian(rs.map(_._3).toSeq) }
    val mad = docs.groupBy(_._2).map { case (s, rs) =>
      s -> lowerMedian(rs.map(r => math.abs(r._3 - med(s))).toSeq) }
    val expected = docs.filter { case (_, s, n) => math.abs(n - med(s)) > 2 * mad(s) }
      .map(_._1).toSet
    val got = TextOps.qualityOutliersMad(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "test data should contain length outliers")
    assert(got == expected,
      s"missed=${expected -- got} spurious=${got -- expected}")
  }

  test("temperature mixing hits exact sqrt-scaled targets and flattens the lang skew") {
    val sf = "/root/testdata/sf0.001"
    val natural = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sq = natural.map { case (l, n) => l -> math.sqrt(n.toDouble).toLong }
    val bigN = natural.values.sum; val tot = sq.values.sum
    val target = natural.map { case (l, n) => l -> math.min(n, (bigN / 2) * sq(l) / tot) }
    val kept = TextOps.mixLangsTemperature(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == target, s"kept $kept != sqrt-scaled targets $target")
    // flattening: the dominant lang's keep RATE must be strictly below
    // every minority lang's (that is what sub-linear scaling buys)
    val maxLang = natural.maxBy(_._2)._1
    val rate = kept.map { case (l, c) => l -> c.toDouble / natural(l) }
    rate.filter(_._1 != maxLang).foreach { case (l, r) =>
      assert(rate(maxLang) < r, s"$maxLang rate ${rate(maxLang)} !< $l rate $r") }
  }

  test("lang_id tie-break is alphabetical and no-hit docs are 'und'") {
    // 'la' is in both the es and fr lists -> tie -> alphabetical -> es
    val rows = Seq((1L, "la la qqq", "xx"), (2L, "qqq zzz", "xx"))
    val df = rows.toDF("doc_id", "text", "lang")
    df.createOrReplaceTempView("docs_tmp")
    val words = split(lower(col("text")), " ")
    // reuse the operator's scoring path by temp-substituting documents
    val got = graft.operators.TextOps.langIdOn(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted")).toMap
    assert(got(1L) == "es")
    assert(got(2L) == "und")
  }
}
