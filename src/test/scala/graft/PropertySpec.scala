package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the combinatorial dedup kernels: random inputs
  * hunt the boundary cases fixed ones miss (the r2 jaccard boundary
  * pair was exactly such a miss). Seeded generators keep runs
  * deterministic.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def bruteJaccard(sets: Seq[(Long, Array[Long])], t: Double)
      : Set[(Long, Long)] =
    (for {
      (ia, ga) <- sets; (ib, gb) <- sets
      if ia < ib
      inter = ga.toSet.intersect(gb.toSet).size
      union = ga.length + gb.length - inter
      if union > 0 && inter.toDouble / union >= t
    } yield (ia, ib)).toSet

  test("prefix-filtered jaccard pairs == brute force, random sets, both thresholds") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small shared vocabulary forces overlaps, hot shingles, and
    // boundary ratios; several independent corpora per threshold
    for (round <- 0 until 3; t <- Seq(0.5, 0.8)) {
      val vocab = 40 + round * 13
      val sets: Seq[(Long, Array[Long])] = (0 until 25).map { i =>
        val size = 1 + rnd.nextInt(30)
        (i.toLong,
          Array.fill(size)(rnd.nextInt(vocab).toLong).distinct)
      }
      val df = sets.toDF("doc_id", "g")
      val got = Dedup.jaccardPairsFromSets(df, t).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = bruteJaccard(sets, t)
      assert(got == want,
        s"round=$round t=$t: missing=${want -- got} extra=${got -- want}")
    }
  }

  test("uncapped simhash banding == brute-force hamming<=3 pairs, random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // near-identical docs from a tiny template pool => many close
    // signatures; brute force recomputes hamming from the signatures
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (0 until 30).map { i =>
      val base = Array.fill(12)(words(rnd.nextInt(words.length)))
      if (i % 3 != 0 && i > 0) base(rnd.nextInt(12)) = words(rnd.nextInt(words.length))
      (i.toLong, base.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val sig = Dedup.simhashSignatures(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (for {
      a <- docs.map(_._1); b <- docs.map(_._1)
      if a < b && java.lang.Long.bitCount(sig(a) ^ sig(b)) <= Dedup.HammingMax
    } yield (a, b)).toSet
    // write docs to a temp dir so the dir-based operator sees them?
    // no — exercise the banding directly through dedupSimhash's shape:
    // bands from signatures, pigeonhole says uncapped banding is
    // lossless, so compare against the banding-free definition
    val got = Dedup.simhashPairsOn(df, capOpt = None).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("BQ kernels: pack/distance == bit-level reference, random vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    for (dim <- Seq(8, 17, 64)) { // 17 exercises the partial last byte
      val th = Array.fill(dim)(rnd.nextDouble() - 0.5)
      val vecs = (0 until 20).map(i =>
        (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
      def refBits(v: Array[Float]): Seq[Boolean] =
        v.zip(th).map { case (x, t) => x > t }.toSeq
      val df = vecs.toDF("id", "vec")
        .select(col("id"), graft.functions.BqFunctions
          .bqEncode(col("vec"), th).as("codes"))
      val codes = df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      // packing: bit i of byte i/8 (LSB-first) equals the reference bit
      vecs.foreach { case (id, v) =>
        val c = codes(id)
        assert(c.length == (dim + 7) / 8)
        refBits(v).zipWithIndex.foreach { case (b, i) =>
          assert(((c(i >> 3) >> (i & 7)) & 1) == (if (b) 1 else 0),
            s"dim=$dim id=$id bit $i mispacked")
        }
        // trailing pad bits of the last byte must be zero (they'd
        // otherwise poison hamming distances)
        (dim until c.length * 8).foreach { i =>
          assert(((c(i >> 3) >> (i & 7)) & 1) == 0, s"pad bit $i set")
        }
      }
      // hamming == reference bit-diff count, for all pairs
      val pairs = vecs.combinations(2).map(p => (p(0), p(1))).toSeq
      val hdf = pairs.map { case ((a, _), (b, _)) => (a, b) }.toDF("a", "b")
        .join(vecs.toDF("a", "va"), "a").join(vecs.toDF("b", "vb"), "b")
        .select(col("a"), col("b"), graft.functions.BqFunctions.hammingDistance(
          graft.functions.BqFunctions.bqEncode(col("va"), th),
          graft.functions.BqFunctions.bqEncode(col("vb"), th),
          (dim + 7) / 8).as("h"))
      val got = hdf.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      pairs.foreach { case ((a, va), (b, vb)) =>
        val want = refBits(va).zip(refBits(vb)).count { case (x, y) => x != y }
        assert(got((a, b)) == want, s"dim=$dim hamming($a,$b): ${got((a, b))} != $want")
      }
    }
  }

  test("Space-Saving invariants under random skewed streams and partitionings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(17)
    for (round <- 0 until 3) {
      // zipf-ish: item k drawn with weight ~ 1/(k+1)
      val domain = 60 + round * 40
      val weights = (0 until domain).map(k => 1.0 / (k + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val items = Seq.fill(3000) {
        val x = rnd.nextDouble() * total
        cum.indexWhere(x <= _).toLong
      }
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = items.size.toLong
      for (cap <- Seq(8, 32); parts <- Seq(1, 7)) {
        val s = items.toDF("item").repartition(parts)
          .agg(graft.functions.SketchFunctions.spaceSaving(col("item"), cap).as("hh"))
          .select(explode(col("hh")).as("h"))
          .select(col("h.item"), col("h.est"), col("h.err"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        assert(s.size <= cap)
        s.foreach { case (k, (est, err)) =>
          val t = truth.getOrElse(k, 0L)
          assert(est >= t && est - t <= err && err <= n / cap,
            s"round=$round cap=$cap parts=$parts item=$k est=$est true=$t err=$err")
        }
        truth.filter(_._2 > n / cap).keys.foreach { k =>
          assert(s.contains(k),
            s"round=$round cap=$cap parts=$parts heavy hitter $k missing")
        }
      }
    }
  }

  test("BPE: trained merges applied to any training word never increase tokens, random tables") {
    val rnd = new scala.util.Random(19)
    for (round <- 0 until 3) {
      val alphabet = "abcdef".toCharArray
      val wc = (0 until 30).map { i =>
        val w = Array.fill(2 + rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.length))).mkString
        (w, 1L + rnd.nextInt(50))
      }.distinct.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      // train driver-side on the synthetic table via the naive rule
      // (same contract as Bpe.train), then apply through the KERNEL
      var words = wc.map { case (w, n) => (w.map(_.toString).toVector, n) }
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      for (_ <- 0 until 10) {
        val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
        words.foreach { case (s, n) =>
          s.zip(s.tail).foreach(p => counts.update(p, counts.getOrElse(p, 0L) + n))
        }
        if (counts.nonEmpty) {
          val ((l, r), _) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
          merges += ((l, r))
          words = words.map { case (s, n) =>
            val b = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += (l + r); i += 2 }
              else { b += s(i); i += 1 }
            }
            (b.toVector, n)
          }
        }
      }
      val mL = merges.map(_._1).toArray; val mR = merges.map(_._2).toArray
      wc.foreach { case (w, _) =>
        val toks = graft.functions.BpeKernel.tokenizeWord(w, mL, mR)
        assert(toks.mkString == w, s"round=$round: merges must preserve the word: $w -> ${toks.mkString}")
        assert(toks.length <= w.length && toks.length >= 1)
        // kernel application == the round-by-round training state
        val trained = words.find(_._1.mkString == w)
        trained.foreach { case (syms, _) =>
          assert(toks.toSeq == syms, s"round=$round: apply diverges from training state on $w")
        }
      }
    }
  }

  test("WordNgrams/TopNgramCount kernels == sliding-window reference, random word arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(0x69a3L)
    val vocab = Vector("a", "bb", "ccc", "", "dd", "e", "é漢")
    for (_ <- 1 to 300) {
      val words = Vector.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val arr = new GenericArrayData(
        words.map(w => UTF8String.fromString(w)).toArray[Any])
      for (n <- 1 to 4) {
        val got = {
          val a = graft.functions.WordNgrams.compute(arr, n)
          (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
        }
        val want = if (words.length < n) Seq.empty[String]
          else words.sliding(n).map(_.mkString(" ")).toSeq
        assert(got == want, s"n=$n words=$words")
        val wantTop = if (want.isEmpty) 0L
          else want.groupBy(identity).values.map(_.size).max.toLong
        assert(graft.functions.TopNgramCount.compute(arr, n) == wantTop,
          s"top n=$n words=$words")
      }
    }
  }

  test("quality_classifier score == reference recomputation on random texts") {
    import spark.implicits._
    import graft.operators.TextOps
    val rnd = new scala.util.Random(23)
    val pieces = Array("the", "a", "of", "and", "is", "Word", "UPPER", "42",
      "x1y2", "!!", "no.stop", "mixedCase7", ";", "plain", "word")
    val texts = (0 until 60).map { i =>
      val n = rnd.nextInt(25)
      (i.toLong, Array.fill(n)(pieces(rnd.nextInt(pieces.length))).mkString(" "), "s")
    }
    def ref(text: String): Long = {
      val words = text.trim.split("\\s+")
      val nW = math.max(words.length, 1).toDouble
      val nC = math.max(text.length, 1).toDouble
      val sumWlen = words.map(_.length).sum.toDouble
      val stop = Set("the", "a", "of", "and", "is")
      val stopHits = text.toLowerCase.split(" ", -1).count(stop).toDouble
      val nDigit = text.count(_.isDigit).toDouble
      val nPunct = text.count(c => ".,!?;:".contains(c)).toDouble
      val nUpper = text.count(c => c >= 'A' && c <= 'Z').toDouble
      val logit = -0.65 +
        0.9 * math.min(nW / 400.0, 1.0) +
        0.8 * (stopHits / nW) +
        0.6 * math.min(sumWlen / nW / 6.0, 1.0) -
        1.5 * (nDigit / nC) -
        0.7 * (nPunct / nC) -
        0.5 * (nUpper / nC)
      math.floor(logit * 1e6).toLong
    }
    val got = TextOps.qualityClassifierOn(texts.toDF("doc_id", "text", "source"))
      .select("doc_id", "score_q").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, text, _) =>
      assert(got(id) == ref(text), s"doc $id text='$text'")
    }
  }

  test("mix_schedule_interleave == driver-side stride schedule on random source splits") {
    import spark.implicits._
    import graft.operators.TextOps
    val rnd = new scala.util.Random(31)
    for (round <- 0 until 3) {
      // skewed random split over 2-5 sources, ids shuffled across them
      val nSrc = 2 + rnd.nextInt(4)
      val docs = (0 until 40 + rnd.nextInt(40)).map { i =>
        (i.toLong, s"doc $i text", "en",
          s"s${(math.sqrt(rnd.nextInt(nSrc * nSrc))).toInt}", 10L)
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_mix$round").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // reference: stride scheduling computed directly
      val bySrc = docs.groupBy(_._4)
      val keyed = bySrc.toSeq.flatMap { case (src, ds) =>
        val n = ds.size
        ds.map(_._1).sorted.zipWithIndex.map { case (id, r0) =>
          ((r0 + 1).toDouble / math.sqrt(n.toDouble), src, id)
        }
      }
      val want = keyed.sorted.zipWithIndex
        .map { case ((_, src, id), i) => (id, src, i + 1L) }
      val got = TextOps.mixScheduleInterleave(spark, dir)
        .as[(Long, String, Long)].collect().sortBy(_._3).toSeq
      assert(got == want, s"round=$round nSrc=$nSrc")
    }
  }

  test("attritionFlagsOn == langId ∘ qualityScore composition on random multilingual docs") {
    import spark.implicits._
    import graft.operators.TextOps
    val rnd = new scala.util.Random(47)
    val vocab = Map(
      "en" -> Seq("the", "a", "of", "and", "is", "cat", "house", "sea"),
      "de" -> Seq("der", "die", "das", "und", "ist", "katze", "haus"),
      "fr" -> Seq("le", "la", "les", "et", "est", "chat", "maison"))
    for (round <- 0 until 3) {
      val docs = (0 until 60).map { i =>
        val lang = vocab.keys.toSeq(rnd.nextInt(3))
        val words = Seq.fill(2 + rnd.nextInt(30))(
          vocab(lang)(rnd.nextInt(vocab(lang).size)))
        (i.toLong, lang, words.mkString(" "), s"s${i % 4}")
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_attr$round").toString
      docs.map { case (id, lg, t, src) => (id, lg, t, src, t.length.toLong) }
        .toDF("doc_id", "lang", "text", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // the seam must agree with the two STANDALONE keys it claims to
      // compose — pass_lang ≡ (E7 predicted == en), pass_qual ≡ that
      // AND (E8 score >= 0.3), on the same corpus
      val predicted = TextOps.langId(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      val score = TextOps.qualityScore(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val flags = TextOps.attritionFlagsOn(
        spark.read.parquet(s"$dir/documents.parquet")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
      docs.foreach { case (id, _, _, _) =>
        val wantLang = if (predicted(id) == "en") 1L else 0L
        val wantQual = if (predicted(id) == "en" && score(id) >= 0.3) 1L else 0L
        assert(flags(id) == ((wantLang, wantQual)),
          s"round=$round doc=$id: seam ${flags(id)} != keys ($wantLang,$wantQual)")
      }
    }
  }

  test("groupedRowNumber == per-group reference under random skew, ties, and non-BMP group names") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    // the supplementary-plane name (U+1F600) vs the high-BMP name
    // (U+FFFD…) ORDER DIFFERENTLY under UTF-16 code units (surrogate
    // 0xD83D < 0xFFFD) and UTF-8 bytes (U+1F600 > U+FFFD) — exactly
    // the offset-attachment hazard the Ranks scaladoc argues; a
    // mis-sorted driver prefix would shift every rank in both groups
    val groupPool = Seq("a", "hot", "\uD83D\uDE00src", "\uFFFDz", "b0")
    for (round <- 0 until 3; desc <- Seq(false, true)) {
      val n = 60 + rnd.nextInt(60)
      val rows = (0 until n).map { i =>
        // 70% of rows land in the hot group; scores collide heavily
        val g = if (rnd.nextInt(10) < 7) groupPool(1)
                else groupPool(rnd.nextInt(groupPool.length))
        (i.toLong, g, rnd.nextInt(4).toLong)
      }
      val got = graft.operators.Ranks
        .groupedRowNumber(rows.toDF("id", "src", "score"), "src", "score",
          descending = desc, tieCol = "id")
        .select("id", "src", "rn", "grp_n")
        .as[(Long, String, Long, Long)].collect()
      val want = rows.groupBy(_._2).flatMap { case (g, rs) =>
        val ordered = if (desc) rs.sortBy(r => (-r._3, r._1))
                      else rs.sortBy(r => (r._3, r._1))
        ordered.zipWithIndex.map { case (r, i) =>
          r._1 -> (g, i + 1L, rs.size.toLong)
        }
      }
      assert(got.length == n)
      got.foreach { case (id, src, rn, gn) =>
        assert(want(id) == ((src, rn, gn)),
          s"round=$round desc=$desc id=$id: got ($src,$rn,$gn) want ${want(id)}")
      }
    }
  }
}
