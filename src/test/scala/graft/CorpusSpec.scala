package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("corpus_snapshot_diff == driver-side modular-arithmetic mirror per source") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      val ids = ds.map(_._1)
      src -> ((ids.count(_ % 5 == 0).toLong,           // added
               ids.count(_ % 11 == 0).toLong,          // removed (ghosts)
               ids.count(i => i % 5 != 0 && i % 7 == 0).toLong, // changed
               ids.count(i => i % 5 != 0 && i % 7 != 0).toLong)) // same
    }
    val got = graft.operators.Corpus.corpusSnapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want, s"diff mismatch:\n got=$got\nwant=$want")
  }

  test("groupedRowNumber == single-window row_number on a 90%-skewed corpus (asc+desc, ties)") {
    import org.apache.spark.sql.expressions.Window
    // one source holds 90% of the rows; score = id·37 mod 101 collides
    // heavily, so the tie-break path is exercised in every bucket
    val df = spark.range(2000).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) =!= 0, lit("hot"))
        .otherwise(concat(lit("s"), pmod(col("id"), lit(7)))).as("source"),
      pmod(col("id") * 37, lit(101L)).as("score"))
    for (desc <- Seq(true, false)) {
      val fast = graft.operators.Ranks
        .groupedRowNumber(df, "source", "score", descending = desc, tieCol = "doc_id")
        .select(col("doc_id"), col("rn"), col("grp_n"))
      val order = if (desc) col("score").desc else col("score").asc
      val ref = df
        .withColumn("rn_ref", row_number()
          .over(Window.partitionBy("source").orderBy(order, col("doc_id"))).cast("long"))
        .withColumn("n_ref", count(lit(1)).over(Window.partitionBy("source")))
        .select(col("doc_id"), col("rn_ref"), col("n_ref"))
      val diff = fast.join(ref, "doc_id")
        .filter(col("rn") =!= col("rn_ref") || col("grp_n") =!= col("n_ref"))
      assert(diff.count() == 0, s"desc=$desc: two-pass rank diverged from the window")
    }
    // and the plan shape it exists for: no window partitioned by the
    // group ALONE — every Window in E40/E41 must carry the bucket key
    for (plan <- Seq(
        graft.operators.TextOps.mixScheduleInterleave(spark, sf),
        Corpus.perplexityBuckets(spark, sf)).map(_.queryExecution.optimizedPlan)) {
      val soloGroupWindows = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.length < 2 => w
      }
      assert(soloGroupWindows.isEmpty,
        s"found a single-key (skew-prone) window partition: $soloGroupWindows")
    }
    // empty input: typed empty result with the rank columns, no crash
    val empty = graft.operators.Ranks.groupedRowNumber(
      df.filter(lit(false)), "source", "score", descending = false,
      tieCol = "doc_id")
    assert(empty.columns.toSeq.contains("rn") && empty.count() == 0)
  }

  test("boilerplate_ngrams: df is bounded by corpus size and ranking is (df desc, shingle asc)") {
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val rows = Corpus.boilerplateNgrams(spark, sf, k = 15).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 15)
    assert(rows.forall(_._2 <= nDocs), "df of a per-doc-distinct shingle cannot exceed doc count")
    assert(rows.forall(_._2 >= 1))
    val resorted = rows.sortBy { case (s, df) => (-df, s) }
    assert(rows.toSeq == resorted.toSeq, "must be ordered by df desc, shingle asc")
  }

  test("boilerplate_ngrams: per-doc distinct — a shingle repeated within one doc counts once") {
    // "a b c" appears twice in doc 1 but once per doc in 1 and 2 → df 2, not 3.
    val docs = Seq((1L, "a b c x a b c"), (2L, "a b c"), (3L, "z z z z"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("corpus_spec_docs")
    val dfs = docs
      .select(explode(array_distinct(
        when(size(split(col("text"), " ")) >= 3,
          transform(sequence(lit(1), size(split(col("text"), " ")) - 2),
            i => concat_ws(" ",
              element_at(split(col("text"), " "), i),
              element_at(split(col("text"), " "), i + 1),
              element_at(split(col("text"), " "), i + 2))))
          .otherwise(array().cast("array<string>")))).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfs("a b c") == 2L)
    assert(dfs("z z z") == 1L)
  }

  test("pii_redact: detection counts follow the doc_id seeding residues exactly") {
    val got = Corpus.piiRedact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (id, nEmail, nIp, nPhone) =>
      assert(nEmail == (if (id % 3 == 0) 1L else 0L), s"doc $id email count")
      // seeded IPs are 10.x.y.z — but the source text is synthetic prose with
      // no dotted quads, so the IP count is exactly the seeding indicator
      assert(nIp == (if (id % 4 == 0) 1L else 0L), s"doc $id ip count")
      assert(nPhone == (if (id % 5 == 0) 1L else 0L), s"doc $id phone count")
    }
    // every reported row has at least one span; rows with none are dropped
    assert(got.forall { case (_, a, b, c) => a + b + c > 0 })
    // docs with doc_id ≡ 0 (mod 3) exist and none leaked out of the report
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val expected = (0L until nDocs).count(i => i % 3 == 0 || i % 4 == 0 || i % 5 == 0)
    assert(got.length == expected, "report must cover exactly the seeded docs")
  }

  test("pii_redact: redacted text contains no residual PII spans (md5 invariance under double-redaction)") {
    // Redacting an already-redacted text must be the identity: the tags
    // <EMAIL>/<IP>/<PHONE> match none of the three patterns.
    val tags = Seq("x <EMAIL> y", "a <IP> b", "c <PHONE> d").toDF("t")
    val out = tags.select(
      regexp_replace(regexp_replace(regexp_replace(col("t"),
        "[a-z0-9]+@[a-z0-9]+\\.[a-z]+", "<EMAIL>"),
        "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
        "\\+1-555-[0-9]{4}", "<PHONE>").as("r"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("x <EMAIL> y", "a <IP> b", "c <PHONE> d"))
  }

  test("lm_bigram_score: held-out docs are scored, never trained on") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val heldIds = docs.filter(col("source") === "src0")
      .select("doc_id").as[Long].collect().toSet
    assert(heldIds.nonEmpty, "sf0.001 must contain the held-out source")
    val got = Corpus.lmBigramScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc with ≥2 words gets a score row
    val byId = got.map(t => t._1 -> t).toMap
    assert(heldIds.forall(byId.contains), "held-out docs must still be scored")
    got.foreach { case (id, nBigrams, nSeen, fam) =>
      assert(nSeen <= nBigrams, s"doc $id: seen bigrams cannot exceed total")
      assert(fam >= 0L)
      assert(nBigrams >= 1L)
      // familiarity per occurrence is at most 10^6 (c12 <= c1 by construction)
      assert(fam <= 1000000L * nSeen, s"doc $id: ratio bound violated")
    }
    // the training split scores itself: in-LM docs must have full coverage
    // of their own bigrams (every bigram they contain is in the LM)
    val inLm = got.filter(t => !heldIds.contains(t._1))
    assert(inLm.forall(t => t._2 == t._3), "training docs: every bigram is seen")
  }

  test("lm_bigram_score: a bigram unique to the held-out source is unseen; ratios are exact integer quotients") {
    // Synthetic corpus where the held-out split contains a bigram the LM
    // never saw — its occurrences must land in n_bigrams but not n_seen.
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_lm").toString
    Seq(
      (0L, "alpha beta alpha beta", "en", "train", 21L),
      (1L, "alpha beta gamma", "en", "train", 16L),
      (2L, "alpha beta zzz qqq", "en", "src0", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.lmBigramScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sortBy(_._1)
    // LM (train only): "alpha beta"→2+1=3, "beta alpha"→1, "beta gamma"→1
    // marginals: alpha→3, beta→2
    // ratios: "alpha beta" = 10^6*3 div 3 = 1000000; "beta alpha" = 10^6*1 div 2
    //         = 500000; "beta gamma" = 500000
    assert(got(0) == ((0L, 3L, 3L, 1000000L + 500000L + 1000000L)))
    assert(got(1) == ((1L, 2L, 2L, 1000000L + 500000L)))
    // held-out doc: "alpha beta"(seen) + "beta zzz","zzz qqq"(unseen)
    assert(got(2) == ((2L, 3L, 1L, 1000000L)))
  }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    rows.map { case (id, t) => (id, t, "en", "src1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_spans_sliding catches an offset duplicate that fixed-block dedup_spans misses") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc1 copies doc0's words a11..a25 at word offset 3 — no 10-word
    // BLOCK of doc1 equals any block of doc0, but six stride-1 windows do
    val doc0 = (1 to 30).map(i => s"a$i").mkString(" ")
    val doc1 = "b1 b2 b3 " + (11 to 25).map(i => s"a$i").mkString(" ") + " t1 t2"
    val dir = writeDocs(Seq((0L, doc0), (1L, doc1), (2L, ((1 to 10) ++ (1 to 10)).map(i => s"x$i").mkString(" "))))

    val fixed = Corpus.dedupSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(fixed(1)._2 == fixed(1)._3,
      s"fixture broken: fixed-block dedup must MISS the offset copy in doc1, got $fixed")

    val got = Corpus.dedupSpansSliding(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    // doc0 all novel; doc1 drops the 15 covered copy words (dup window
    // starts 3..8 cover word idx 3..17); doc2's self-repeat drops its
    // second half (only window start 10 recurs)
    assert(got(0) == ((0L, 30L, 30L, md5hex(doc0))))
    assert(got(1) == ((1L, 20L, 5L, md5hex("b1 b2 b3 t1 t2"))))
    assert(got(2) == ((2L, 20L, 10L, md5hex((1 to 10).map(i => s"x$i").mkString(" ")))))
  }

  test("dedup_spans: first occurrence wins across and within docs; reassembly is ordered") {
    val spanA = (1 to 10).map(i => s"a$i").mkString(" ")   // one full 10-word span
    val spanB = (1 to 10).map(i => s"b$i").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, s"$spanA $spanB"),          // both spans novel
      (1L, s"$spanB $spanA"),          // both already seen (order ignored at span level)
      (2L, s"$spanA $spanA"),          // within-doc repeat: both seen (doc0 owns spanA)
      (3L, "c1 c2 c3")))               // one partial novel span
    val got = Corpus.dedupSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((0L, 2L, 2L), (1L, 2L, 0L), (2L, 2L, 0L), (3L, 1L, 1L)))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0)._4 == md5(s"$spanA $spanB"), "doc0 keeps its full text in order")
    assert(got(1)._4 == md5(""), "fully-deduped doc reassembles to the empty string")
    assert(got(3)._4 == md5("c1 c2 c3"), "partial trailing span survives as-is")
  }

  test("ngram_novelty: a verbatim copy contributes zero novel trigrams") {
    val a = "w1 w2 w3 w4 w5"                       // 3 trigrams, all novel
    val dir = writeDocs(Seq((0L, a), (1L, a), (2L, s"w3 w4 w5 x1")))
    val got = Corpus.ngramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // doc2: trigrams "w3 w4 w5"(seen), "w4 w5 x1"(novel) → 1/2 → 500‰
    assert(got.toSeq == Seq((0L, 3L, 3L, 1000L), (1L, 3L, 0L, 0L), (2L, 2L, 1L, 500L)))
  }

  test("collocations_pmi: worked example — exact quantized quotients, floor excludes rare pairs") {
    // "p q" ×6 (passes the floor), "p r" ×5, "x y" ×4 (floored out).
    val dir = writeDocs(Seq(
      (0L, "p q p q p q p r p r"),      // bigrams: pq,qp,pq,qp,pq,qp,pr,rp,pr (9)
      (1L, "p q p q p q p r p r"),      // same again (9)
      (2L, "x y x y x y x y")))         // xy,yx,xy,yx,xy,yx,xy (7)
    val got = Corpus.collocationsPmi(spark, dir, k = 15, minCount = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // T = 25 bigram occurrences; unigrams: p=10, q=6, r=4, x=4, y=4
    // c12: pq=6, qp=6, pr=4, rp=2, xy=4, yx=3 → floor(≥5) keeps pq, qp
    // pmi_q(pq) = (1e6·6·25) div (10·6) = 2500000; qp = same counts
    assert(got == Seq(("p", "q", 6L, 2500000L), ("q", "p", 6L, 2500000L)))
  }

  test("dsir_select: worked example — raw docs sharing the target's bigrams rank first, exact integer ratios") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dsir").toString
    Seq(
      (0L, "alpha beta alpha beta", "src0"), // target: ab×2, ba×1 → N_t=3
      (1L, "alpha beta gamma", "srcA"),      // raw: ab, bg → 2
      (2L, "gamma delta gamma", "srcA"))     // raw: gd, dg → 2; N_r=4, V=5
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.dsirSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // rq(ab) = (1e6·(2+1)·(4+5)) div ((1+1)·(3+5)) = 27000000 div 16 = 1687500
    // rq for target-unseen raw bigrams = (1e6·1·9) div (2·8) = 562500
    // doc 1: (1687500 + 562500) = 2250000 over 2 → avg 1125000
    // doc 2: (562500 + 562500) = 1125000 over 2 → avg 562500
    assert(got == Seq((1L, 2L, 2250000L, 1125000L),
      (2L, 2L, 1125000L, 562500L)))
  }

  test("source_overlap: worked example — exact shared-vocabulary permille, zero-overlap pairs absent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_overlap").toString
    Seq(
      (0L, "a b c d", "srcA"),  // trigrams {a b c, b c d}
      (1L, "a b c x", "srcB"),  // trigrams {a b c, b c x}
      (2L, "p q r s", "srcC"))  // disjoint
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Corpus.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // shared {a b c} = 1 of union 3 → (1000·1) div 3 = 333; srcC pairs
    // share nothing and produce no row
    assert(got == Seq(("srcA", "srcB", 2L, 2L, 1L, 333L)))
  }

  test("dedup_cluster_stats: a 3-clique plus singletons histograms as [(1, n-3), (3, 1)]") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cstats").toString
    val clique = (0 to 2).map(i =>
      (i.toLong, "the same boilerplate disclaimer repeated on every page again"))
    val unique = (10 to 14).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    (clique ++ unique)
      .map { case (id, t) => (id, t, "en", "src1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Dedup.dedupClusterStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 5L), (3L, 1L)))
  }

  test("semantic_prune: representatives match a driver-side union-find of the exact pairs") {
    val sf001 = "/root/testdata/sf0.001"
    val pairs = graft.operators.Dedup.embeddingNeardup(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "test corpus must contain semantic near-dups")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = graft.operators.Dedup.semanticPrune(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((vid, rep, kept) <- got) {
      val want = if (parent.contains(vid)) find(vid) else vid
      assert(rep == want, s"vec $vid rep $rep != $want")
      assert(kept == (if (rep == vid) 1L else 0L))
    }
    // the prune keeps exactly one representative per component plus
    // all singletons
    val keptN = got.count(_._3 == 1L)
    val compReps = parent.keys.map(find).toSet.size
    val inPairs = parent.keys.size
    assert(keptN == got.length - inPairs + compReps)
  }
}
