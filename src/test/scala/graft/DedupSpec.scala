package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH recovers the exact jaccard pairs with high recall and exact precision") {
    val exact = pairs(Dedup.ngramJaccardPairs(spark, sf))
    val lsh = pairs(Dedup.dedupMinhashLsh(spark, sf))
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    // precision is 1.0 by construction: candidates are re-verified exactly
    assert(lsh.subsetOf(exact), s"LSH reported non-dup pairs: ${lsh -- exact}")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (${exact.size} exact, ${lsh.size} lsh)")
  }

  test("pipeline_fuzzy_dedup: exact survivors ⊆ fuzzy survivors, agreement ≥ 0.95 (two SFs)") {
    // LSH-verified edges ⊆ exact edges (same Jaccard ≥ t on every
    // candidate), so LSH components REFINE exact components and a doc
    // canonical under the exact graph (min of its component) stays
    // canonical under any refinement — exact survivors are contained
    // in fuzzy survivors BY THEOREM; the ≥0.95 agreement bounds the
    // extra dups the fuzzy pass lets through end-to-end.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("doc_id").collect().map(_.getLong(0)).toSet
      val exact = ids(graft.operators.TextOps.pipelineDedupSurvivors(spark, d))
      val fuzzy = ids(graft.operators.TextOps.pipelineFuzzySurvivors(spark, d))
      assert(exact.nonEmpty, s"$d: exact pipeline kept nothing")
      assert(exact.subsetOf(fuzzy),
        s"$d: exact survivors missing from fuzzy: ${exact -- fuzzy}")
      val agreement = exact.size.toDouble / fuzzy.size
      assert(agreement >= 0.95,
        s"$d: survivor agreement $agreement < 0.95 " +
          s"(${exact.size} exact, ${fuzzy.size} fuzzy)")
    }
  }

  test("pipeline_dedup_corpus_quality: same survivor count, disagreement only on rules_agree=false clusters") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val sf = "/root/testdata/sf0.001"
    val minId = ids(graft.operators.TextOps.pipelineDedupSurvivors(spark, sf))
    val qual = ids(graft.operators.TextOps.pipelineDedupQualitySurvivors(spark, sf))
    assert(qual.nonEmpty, "quality pipeline kept nothing")
    // the rules swap exactly one member per disagreeing cluster, so the
    // SYMMETRIC DIFFERENCE is confined to docs whose component has
    // rules_agree = false (modulo the clean gate dropping a would-be
    // canonical) — nothing outside a disagreeing cluster may move
    val disagree = graft.operators.Dedup.dedupComponentsQuality(spark, sf)
      .filter(!org.apache.spark.sql.functions.col("rules_agree"))
      .select("component_id").collect().map(_.getLong(0)).toSet
    val members = graft.operators.Dedup.dedupComponents(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (_, c) => disagree(c) }.map(_._1).toSet
    val moved = (minId diff qual) ++ (qual diff minId)
    assert(moved.subsetOf(members),
      s"docs moved outside disagreeing clusters: ${moved -- members}")
    assert(moved.nonEmpty,
      "the sf0.001 corpus must exercise at least one disagreeing cluster " +
        "(otherwise the key is vacuous here)")
  }

  private def vecPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dedup_exact_normalized: planted case/whitespace variants merge, norm ⊆ raw") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_e1c").toString
    // docs 0,1,2 are the SAME page modulo whitespace/case — raw
    // hashing keeps all three, normalized hashing keeps only doc 0
    Seq(
      (0L, "en", "The Cat  Sat", "s0"),
      (1L, "en", "the cat sat", "s0"),
      (2L, "en", "  The   cat SAT", "s1"),
      (3L, "en", "unrelated text", "s1"))
      .map { case (id, lg, t, src) => (id, lg, t, src, t.length.toLong) }
      .toDF("doc_id", "lang", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupExactNormalized(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("s0") == ((2L, 2L, 1L, 1L)), s"s0: ${got("s0")}")
    assert(got("s1") == ((2L, 2L, 1L, 1L)), s"s1: ${got("s1")}")
    // containment theorem on the real corpus: per source, normalized
    // survivors never exceed raw survivors
    Dedup.dedupExactNormalized(spark, sf).collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(2),
        s"${r.getString(0)}: norm survivors exceed raw")
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    }
  }

  test("ann_param_sweep: recall curve monotone in nprobe, bounded, constant query count") {
    val rows = Dedup.annParamSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Dedup.SweepNprobes.map(_.toLong))
    assert(rows.map(_._2).distinct.size == 1, "query count must not vary with nprobe")
    // growing the probe set grows every query's candidate pool, and a
    // displaced served hit is only ever displaced by a closer vector
    // that is itself an exact top-k member — so hits are monotone
    rows.sliding(2).foreach { w =>
      val (lo, hi) = (w(0), w(1))
      assert(lo._3 <= hi._3 && lo._4 <= hi._4 && lo._5 <= hi._5,
        s"curve not monotone between nprobe ${lo._1} and ${hi._1}")
    }
    rows.foreach { case (np, nq, hits, recall, perfect) =>
      assert(recall >= 0L && recall <= 1000L)
      assert(perfect <= nq && hits <= nq * 5)
      assert(recall == hits * 1000 / (nq * 5), s"np=$np recall arithmetic")
    }
  }

  test("contamination_matrix: pair total ≡ E21's detail total, zero-hit sources report") {
    val detail = Dedup.decontaminateEval(spark, sf).collect()
    val matrix = Dedup.contaminationMatrix(spark, sf).collect()
    // same hit rule, two rollups: every contaminated (eval, corp) pair
    // is counted once on each side
    assert(matrix.map(_.getLong(2)).sum == detail.map(_.getLong(1)).sum,
      "matrix n_pairs total must equal the per-eval-doc detail total")
    // the catalog left join keeps every non-eval source, hits or not
    val sources = graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("source") =!= "src0")
      .select("source").distinct().count()
    assert(matrix.length.toLong == sources)
    matrix.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2),
        s"${r.getString(0)}: distinct docs exceed pair count")
      assert((r.getLong(2) == 0L) == (r.getDouble(3) == 0.0),
        s"${r.getString(0)}: zero pairs must mean zero max_jaccard and vice versa")
    }
  }

  test("dedup_threshold_sweep: monotone in threshold, and the 400‰ row == E5 exactly") {
    val rows = Dedup.dedupThresholdSweep(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Dedup.SweepThresholdsPermille.toSet)
    // every stat is non-increasing as the threshold tightens
    Dedup.SweepThresholdsPermille.sliding(2).foreach { case Seq(lo, hi) =>
      val ((pl, vl, dl), (ph, vh, dh)) = (rows(lo), rows(hi))
      assert(pl >= ph && vl >= vh && dl >= dh,
        s"sweep not monotone between $lo‰ and $hi‰")
    }
    rows.foreach { case (t, (p, v, d)) =>
      assert(v <= 2 * p && d <= math.max(v - 1, 0),
        s"$t‰: impossible shape pairs=$p vecs=$v maxdeg=$d")
    }
    // the grid point at E5's threshold (400/1000.0 == the 0.4 literal
    // bit for bit) must reproduce E5's pair count and vector set size
    val e5 = Dedup.embeddingNeardup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows(400L)._1 == e5.length.toLong,
      s"400‰ pairs ${rows(400L)._1} != E5 ${e5.length}")
    assert(rows(400L)._2 == e5.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
  }

  test("hyperplane-LSH embedding near-dup: high recall vs exact, exact precision") {
    val exact = vecPairs(Dedup.embeddingNeardup(spark, sf))
    val lsh = vecPairs(Dedup.embeddingNeardupLsh(spark, sf))
    assert(exact.nonEmpty, "test data should contain near-dup embeddings")
    // candidates are re-verified with the exact cosine => subset of exact
    assert(lsh.subsetOf(exact), s"LSH reported non-dup pairs: ${lsh -- exact}")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (${exact.size} exact, ${lsh.size} lsh)")
  }

  test("hyperplane-LSH at the text-dedup regime (threshold 0.8, 8-bit bands)") {
    // planted corpus: 60 seeded random base vectors + 20 perturbed
    // copies at cos ≈ 0.97 — the regime the E5b scaladoc documents
    // (near-dups at cos ≥ 0.8, where 8-bit bands prune noise hard)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 32
    val base = (0 until 60).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)) }
    val dups = (0 until 20).map { i =>
      val b = base(i)._2
      (1000L + i, b.map(x => x + 0.12f * rnd.nextGaussian().toFloat)) }
    val all = base ++ dups
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val exact = (for {
      (ia, va) <- all; (ib, vb) <- all
      if ia < ib && cos(va, vb) >= 0.8
    } yield (ia, ib)).toSet
    assert(exact.size >= 15, s"plant failed: only ${exact.size} true pairs")
    val df = all.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val lsh = vecPairs(Dedup.embeddingNeardupLshOn(spark, df,
      threshold = 0.8, bandBits = 8))
    assert(lsh.subsetOf(exact), s"non-dup pairs reported: ${lsh -- exact}")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9 at the documented 8-bit config")
  }

  test("simhash bucket cap drops nothing on the test corpus (capped == uncapped)") {
    val capped = pairs(Dedup.dedupSimhash(spark, sf))
    val uncapped = pairs(Dedup.dedupSimhash(spark, sf, capOpt = None))
    assert(capped == uncapped,
      s"cap lost pairs: ${uncapped -- capped}; cap invented pairs: ${capped -- uncapped}")
  }

  test("persisted shingle table reproduces the memo-path jaccard pairs exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_shingles").toString
    Dedup.writeShingleSets(spark, sf, s"$tmp/shingles")
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromTable = triples(Dedup.jaccardPairsFromParquet(spark, s"$tmp/shingles"))
    val fromMemo = triples(Dedup.ngramJaccardPairs(spark, sf))
    assert(fromTable == fromMemo)
  }

  test("batch-ANN nprobe serving config: k rows per query, useful recall vs exact") {
    val exact = Dedup.annTopkBatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.annTopkBatchNprobe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(approx.length == 500 * 5, "every query must still get k neighbors")
    val recall = (exact & approx.toSet).size.toDouble / exact.size
    assert(recall >= 0.3, s"batch-ANN nprobe recall $recall unreasonably low")
  }

  test("hard-negative mining: k per query, never a same-label pair, nprobe recall") {
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exact = Dedup.hardNegativeMining(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(exact.length == labels.size * 5, "every query must get k hard negatives")
    exact.foreach { case (q, n, _) =>
      assert(labels(q) != labels(n), s"same-label pair ($q,$n) leaked through") }
    exact.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to 5), s"ranks not contiguous for $q") }
    // serving configuration: label contract must survive pruning too
    val approx = graft.operators.Ivf.hardNegatives(spark, sf, 5,
      graft.functions.VectorMetric.Cosine, nprobeOpt = Some(4)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    approx.foreach { case (q, n) =>
      assert(labels(q) != labels(n), s"nprobe path leaked same-label pair ($q,$n)") }
    val recall = (exact.map(t => (t._1, t._2)).toSet & approx.toSet).size.toDouble / exact.length
    assert(recall >= 0.3, s"hard-negative nprobe recall $recall unreasonably low")
  }

  test("simhash pairs have verified hamming distance <= 3 and are deterministic") {
    val df = Dedup.dedupSimhash(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) <= 3))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Dedup.dedupSimhash(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("simhash signature: identical docs collide, near-identical docs are close") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val sig = Dedup.simhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(1L))
    assert(java.lang.Long.bitCount(sig(0L) ^ sig(2L)) <
      java.lang.Long.bitCount(sig(0L) ^ sig(3L)))
  }

  test("prefix filter keeps boundary pairs with jaccard exactly t (regression)") {
    // |A|=44 ⊂ |B|=55 ⇒ jaccard = 44/55 = 0.8 exactly. Under double
    // arithmetic the prefix length (55·(1−0.8) → 10.99…8 → one short)
    // and the size bound (55·0.8 rounding above 44) both dropped this
    // pair; the exact-decimal bounds must keep it.
    import spark.implicits._
    val a = (1L to 44L).toArray
    val b = (1L to 44L).toArray ++ (101L to 111L).toArray
    val sets = Seq((1L, a), (2L, b)).toDF("doc_id", "g")
    val pairs = Dedup.jaccardPairsFromSets(sets).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0.8)), s"boundary pair lost: ${pairs.toSeq}")
  }

  test("native shingle_hashes matches the HOF xxhash64 formulation, set-for-set") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val hof = when(size(col("ws")) >= 3,
      array_distinct(transform(sequence(lit(0), size(col("ws")) - 3),
        i => xxhash64(element_at(col("ws"), i + 1), element_at(col("ws"), i + 2),
          element_at(col("ws"), i + 3)))))
      .otherwise(array().cast("array<bigint>"))
    val both = docs.select(col("doc_id"),
      graft.functions.ShingleHashes.shingleHashes(col("ws")).as("native"), hof.as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1).toSet == r.getSeq[Long](2).toSet,
        s"doc ${r.getLong(0)} diverged")
    }
    // SQL registration round-trip
    docs.createOrReplaceTempView("shingle_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, shingle_hashes(ws, 3) AS g FROM shingle_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    both.foreach(r => assert(viaSql(r.getLong(0)) == r.getSeq[Long](1).toSet))
  }

  test("boilerplate-heavy corpus triggers probe-gated salting; output equals the plain-join semantics") {
    import spark.implicits._
    // at a production-shaped partition count (32): 12 copies of one
    // template doc put the smallest clique id in 11 of the 66 candidate
    // pairs — 16.7% of the stream, above the SkewFactor/p = 15.6% share
    // threshold AND the 10-sampled-rows evidence floor — so the verify
    // join-back must salt. 100 fully disjoint docs around it produce no
    // candidates at all. (The shared test session runs p=4, where the
    // share threshold caps at 50% and a clique can never cross it:
    // max doc_a share is 2/cliqueSize < 50% for any clique ≥ 5.)
    val p0 = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
    val clique = (1 to 12).map(i =>
      (i.toLong, "the same boilerplate legal disclaimer repeated across every page"))
    val unique = (100 to 199).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    val docs = (clique ++ unique).toDF("doc_id", "text")
    val want = (for { a <- 1 to 12; b <- a + 1 to 12 }
      yield (a.toLong, b.toLong, 1.0)).toSeq

    val lsh = Dedup.dedupMinhashLshOn(docs)
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    // the probe really fired: the verify join runs on the widened
    // (doc_a, _salt) key
    val plan = lsh.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"),
      "hot template doc did not trigger the salted verify join")
    // and salting changed nothing: exactly the 66 clique pairs, j = 1.0
    assert(got == want, s"salted LSH output drifted: $got")

    // the exact E2 path shares the skew-aware verify join — same pairs
    val exact = Dedup.jaccardPairsOn(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(exact == want, s"salted exact-jaccard output drifted: $exact")

    // a skew-free corpus stays on the plain join (probe says AQE
    // suffices — no salt column anywhere in the plan)
    val uniform = (1 to 30).map(i =>
      (i.toLong, s"u${i}p u${i}q u${i}r u${i}s dup shared tail words here")).toDF("doc_id", "text")
    val plain = Dedup.jaccardPairsOn(uniform)
    plain.collect()
    assert(!plain.queryExecution.executedPlan.toString.contains("_salt"),
      "uniform corpus must not pay the salted join")
    } finally spark.conf.set("spark.sql.shuffle.partitions", p0)
  }

  test("connected components: multi-hop chains merge, independent pairs stay apart") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3 forces several propagation rounds),
    // pair 10-11, and an edge listed "backwards" (20, 5) exercising the
    // undirected contract
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 5L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.componentsFromPairs(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 10L -> 10L, 11L -> 10L, 20L -> 5L))

    // the driver key agrees with a driver-side transitive closure of
    // the E2 pairs on the real corpus
    val sf001 = "/root/testdata/sf0.001"
    val e2 = Dedup.ngramJaccardPairs(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e2.nonEmpty, "test corpus must contain near-dup pairs")
    // brute-force union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    e2.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => (x, find(x))).toSeq.sorted
    val gotSf = Dedup.dedupComponents(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotSf == want, "components must equal the union-find closure of E2 pairs")
  }

  test("connected components: long chain (diameter >> 25) converges in O(log n) rounds") {
    import spark.implicits._
    // A 400-node chain: diameter 399. Round 6's one-hop min-label
    // propagation needed one round PER HOP and aborted at its 25-round
    // cap on exactly this shape; star-contraction must (a) label every
    // node with the chain min and (b) converge in logarithmically many
    // alternation rounds, proving the diameter cliff is gone.
    val n = 400
    val chain = (1 until n).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.componentsFromPairs(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n)
    assert(got.forall(_._2 == 1L), s"all chain nodes must label to the min: ${got.filter(_._2 != 1L).take(5).toSeq}")
    val rounds = Dedup.lastComponentRounds
    assert(rounds <= 15,
      s"star-contraction took $rounds rounds on a diameter-399 chain — expected O(log n), not O(diameter)")

    // two chains + a singleton pair, shuffled edge orientations: labels
    // stay per-component minimal
    val mixed = ((100L to 149L).sliding(2).map(s => (s(1), s(0))) ++
      Iterator((200L, 201L), (202L, 201L), (203L, 202L))).toSeq.toDF("doc_a", "doc_b")
    val gotM = Dedup.componentsFromPairs(mixed).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((100L to 149L).forall(gotM(_) == 100L))
    assert((200L to 203L).forall(gotM(_) == 200L))
  }

  test("shingles produces distinct word 3-grams; short docs give empty sets") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val got = df.select(org.apache.spark.sql.functions.col("doc_id"),
      Dedup.shingles(org.apache.spark.sql.functions.col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L).isEmpty)
  }

  test("decontaminate_eval equals a naive eval-vs-corpus Jaccard scan") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val ev = docs.filter(_._3 == "src0").map(d => (d._1, sh(d._2))).filter(_._2.nonEmpty)
    val co = docs.filter(_._3 != "src0").map(d => (d._1, sh(d._2))).filter(_._2.nonEmpty)
    val want = ev.map { case (eid, ge) =>
      val hits = co.map { case (cid, gc) =>
        val i = (ge & gc).size
        (cid, i.toDouble / (ge.size + gc.size - i))
      }.filter(_._2 >= Dedup.ContaminationThreshold)
      if (hits.isEmpty) (eid, 0L, -1L, 0.0)
      else {
        val top = hits.minBy { case (cid, j) => (-j, cid) }
        (eid, hits.length.toLong, top._1, hits.map(_._2).max)
      }
    }.sortBy(_._1).toSeq
    val got = Dedup.decontaminateEval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall(t => t._2 >= 0))
  }

  // --------------------------------------------------------------- E52

  test("split_leakage_free: no near-dup cluster straddles splits; proportions sane") {
    val rows = Dedup.splitLeakageFree(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    val n = Tables.documents(spark, sf).count()
    assert(rows.length == n, "every document gets a split")
    // the leakage invariant: all members of a canonical share ONE split
    rows.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $canon straddles splits: ${members.toSeq}")
    }
    // paired docs really inherit their component canonical (a doc-id
    // hash here would be the exact leak the operator exists to prevent)
    val comp = Dedup.dedupComponents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = rows.map(t => t._1 -> t._2).toMap
    comp.foreach { case (doc, canon) =>
      assert(byDoc(doc) == canon, s"doc $doc split by its own id, not its cluster")
    }
    // proportions: hash bands land near 80/10/10 (loose floors — the
    // corpus is small and clusters are lumpy by design)
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length.toDouble / n).toMap
    assert(bySplit.getOrElse("train", 0.0) > 0.6 &&
      bySplit.getOrElse("val", 0.0) > 0.02 &&
      bySplit.getOrElse("test", 0.0) > 0.02,
      s"split proportions off: $bySplit")
  }

  // -------------------------------------------------------------- E21b

  test("decontaminate_ngram_exact: planted 13-gram leak found at its position, clean stays clean") {
    import spark.implicits._
    val evalWords = (0 until 20).map(i => s"e$i")
    val evalText = evalWords.mkString(" ")
    // doc 10: 5 own words, then a VERBATIM 13-word run copied from the
    // eval doc (eval positions 2..14) — first collision at corpus
    // position 5, and the run contributes exactly ONE 13-window
    val leaked = ((0 until 5).map(i => s"c$i") ++ evalWords.slice(2, 15)).mkString(" ")
    // doc 11: shares 12-word runs at most (one word substituted mid-run)
    val nearMiss = ((0 until 5).map(i => s"d$i") ++
      evalWords.slice(2, 8) ++ Seq("BREAK") ++ evalWords.slice(9, 15)).mkString(" ")
    // doc 12: shorter than the window — zero grams, clean by construction
    val short = "x0 x1 x2"
    val docs = Seq(
      (1L, evalText, "src0"),
      (10L, leaked, "src1"),
      (11L, nearMiss, "src1"),
      (12L, short, "src1")).toDF("doc_id", "text", "source")
    val got = Dedup.decontaminateNgramsOn(docs, "src0", Dedup.ContamNgramN)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (10L, 6L, 1L, 5L, 1L),   // 18 words → 6 windows; the copied run = 1 hit at pos 5
      (11L, 6L, 0L, -1L, 0L),  // a 12-word overlap is NOT a 13-gram collision
      (12L, 0L, 0L, -1L, 0L)), // sub-window doc: zero grams, clean
      s"planted-contamination pin failed: $got")
  }

  // --------------------------------------------------------------- E1b

  test("dedup_incremental: store match drops, within-batch first wins, unique survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    Seq(
      (1L, "dup text one", "base"),    // standing corpus (id % 5 != 0)
      (2L, "other base", "base"),
      (0L, "dup text one", "batch"),   // batch: hash already in store → dropped
      (5L, "batch unique a", "batch"), // survives
      (10L, "same batch dup", "batch"),// first in batch → survives
      (15L, "same batch dup", "batch"))// later duplicate → dropped
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupIncremental(spark, dir).collect()
      .map(r => r.getLong(0)).toSeq
    assert(got == Seq(5L, 10L))
  }

  test("E57 quality canon: argmax score per component, min-id parity, agree flag") {
    import org.apache.spark.sql.functions.col
    val got = Dedup.dedupComponentsQuality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.nonEmpty, "the fixture corpus has near-dup components")
    val comps = Dedup.dedupComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val scores = graft.operators.TextOps.qualityScore(spark, sf)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.map(_._1).toSet == comps.keySet, "one row per component")
    got.foreach { case (cid, nm, cmin, cq, agree) =>
      val members = comps(cid)
      assert(nm == members.size.toLong, s"member count of $cid")
      assert(cmin == members.min, s"min-id canon of $cid")
      val want = members.toSeq
        .map(id => (id, scores(id)))
        .minBy { case (id, s) => (-s, id) }._1
      assert(cq == want, s"quality canon of $cid: $cq != $want")
      assert(agree == (cmin == cq), s"agree flag of $cid")
    }
  }
}
