package graft

import graft.operators.{Analytics, Search, TextOps}
import org.scalatest.funsuite.AnyFunSuite

/** E17-E19 + C15: repetition quality rules, BM25, hybrid RRF, as-of
  * join — each checked against an independent Scala recomputation on
  * sf0.001 (the DuckDB oracle is the cross-engine gate; these pin the
  * SEMANTICS against a second in-process implementation).
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docTexts: Map[Long, String] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  // -------------------------------------------------------------- E17

  test("quality_gopher matches a naive per-doc recomputation") {
    val got = TextOps.qualityGopher(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val texts = docTexts
    assert(got.size == texts.size)
    texts.foreach { case (id, text) =>
      val ws = text.trim.toLowerCase.split("\\s+").toSeq
      val bigrams = ws.sliding(2).map(_.mkString(" ")).toSeq
      val top = if (ws.length < 2) 0L
        else bigrams.groupBy(identity).values.map(_.size).max.toLong
      assert(got(id) == ((ws.length.toLong, ws.distinct.length.toLong, top)),
        s"doc $id")
    }
  }

  test("quality_gopher fractions are exact integer ratios in [0, 1]") {
    TextOps.qualityGopher(spark, sf).collect().foreach { r =>
      val (n, d, top) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(r.getDouble(4) == (n - d).toDouble / n)
      assert(r.getDouble(5) == (if (n < 2) 0.0 else top.toDouble / (n - 1)))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  // -------------------------------------------------------------- E18

  /** Independent BM25: same constants, plain Scala. */
  private def bm25Manual(texts: Map[Long, String]): Map[Long, Double] = {
    val words = texts.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val n = words.size.toDouble
    val sumDl = words.values.map(_.size.toLong).sum.toDouble
    val dfs = Search.QueryTerms.map(t => t -> words.values.count(_.contains(t)).toDouble).toMap
    words.map { case (id, ws) =>
      val dl = ws.size.toDouble
      id -> Search.QueryTerms.map { t =>
        val tf = ws.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ((dl * n) / sumDl)))
      }.sum
    }
  }

  test("text_search_bm25 top-10 equals the manual BM25 ranking") {
    val got = Search.textSearchBm25(spark, sf).collect()
      .map(r => (r.getInt(1), r.getLong(0))).sortBy(_._1).map(_._2).toSeq
    val want = bm25Manual(docTexts).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    assert(got == want)
  }

  test("bm25 scores are finite and zero only for docs with no query term") {
    val rows = Search.bm25Scored(spark, sf)
      .select("doc_id", "score", "tf0", "tf1", "tf2").collect()
    rows.foreach { r =>
      val score = r.getDouble(1)
      assert(!score.isNaN && !score.isInfinite)
      val anyTf = (2 to 4).map(r.getLong).sum > 0
      assert((score > 0.0) == anyTf, s"doc ${r.getLong(0)}")
    }
  }

  test("text_search_bm25_batch equals a manual per-query BM25 with sorted-term folds") {
    val texts = docTexts
    val words = texts.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val n = words.size.toDouble
    val sumDl = words.values.map(_.size.toLong).sum.toDouble
    val want = Search.BatchQueries.flatMap { case (qid, qtext) =>
      val terms = qtext.split(" ").distinct.sorted // fold order = sorted terms
      val dfOf = terms.map(t => t -> words.values.count(_.contains(t)).toDouble).toMap
      val scored = words.toSeq.flatMap { case (id, ws) =>
        val dl = ws.size.toDouble
        val matched = terms.filter(ws.contains)
        if (matched.isEmpty) None
        else Some(id -> matched.foldLeft(0.0) { (acc, t) =>
          val tf = ws.count(_ == t).toDouble
          val idf = math.log(1.0 + (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5))
          acc + idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ((dl * n) / sumDl)))
        })
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, _), i) => (qid, id, i + 1) }
    }
    val got = Search.textSearchBm25Batch(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want)
  }

  // -------------------------------------------------------------- E19

  test("hybrid_search_rrf equals RRF over the two component top-20 lists") {
    import org.apache.spark.sql.functions.col
    val bmTop = Search.bm25Scored(spark, sf)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }.take(20).map(_._1).toSeq
    val veTop = Search.vecScored(spark, sf)
      .select("doc_id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, d) => (d, id) }.take(20).map(_._1).toSeq
    val rrf = (bmTop ++ veTop).distinct.map { id =>
      val b = bmTop.indexOf(id); val v = veTop.indexOf(id)
      val s = (if (b >= 0) 1.0 / (60.0 + (b + 1)) else 0.0) +
        (if (v >= 0) 1.0 / (60.0 + (v + 1)) else 0.0)
      (id, s, if (b >= 0) b + 1 else 0, if (v >= 0) v + 1 else 0)
    }.sortBy { case (id, s, _, _) => (-s, id) }.take(10)
    val got = Search.hybridSearchRrf(spark, sf)
      .orderBy(col("rrf_rank")).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSeq
    assert(got == rrf.map { case (id, _, b, v) => (id, b, v) })
  }

  test("hybrid fused list draws from both rankers") {
    val rows = Search.hybridSearchRrf(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.exists(_.getInt(2) > 0), "some fused doc carries a bm25 rank")
    assert(rows.exists(_.getInt(3) > 0), "some fused doc carries a vector rank")
  }

  // -------------------------------------------------------------- C15

  test("events_asof_join equals the naive per-purchase scan") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getString(3)))
    val clicks = ev.filter(_._4 == "click").groupBy(_._1)
    val want = ev.filter(_._4 == "purchase").flatMap { case (u, pid, pus, _) =>
      clicks.getOrElse(u, Array.empty)
        .filter(c => c._3 < pus || (c._3 == pus))
        .sortBy(c => (c._3, c._2)).lastOption
        .map(c => (pid, u, c._2, pus - c._3))
    }.sortBy(_._1).toSeq
    val got = Analytics.eventsAsofJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("asof gap is non-negative and every matched click precedes its purchase") {
    val rows = Analytics.eventsAsofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 0L))
  }

  // -------------------------------------------------------------- C16

  test("events_funnel equals a per-user sequential simulation") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getString(3)))
      .filter(e => Set("view", "click", "purchase")(e._4))
    var nV = 0L; var nC = 0L; var nP = 0L
    ev.groupBy(_._1).values.foreach { es =>
      var seenView = false; var seenQClick = false
      var v = false; var c = false; var p = false
      es.sortBy(e => (e._3, e._2)).foreach { e =>
        e._4 match {
          case "view" => v = true
          case "click" => if (seenView) { c = true }
          case "purchase" => if (seenQClick) { p = true }
        }
        // flags take effect for STRICTLY LATER events only
        if (e._4 == "view") seenView = true
        if (e._4 == "click" && c) seenQClick = seenQClick || seenView
        ()
      }
      if (v) nV += 1; if (c) nC += 1; if (p) nP += 1
    }
    val got = Analytics.eventsFunnel(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((nV, nC, nP)))
    assert(nV >= nC && nC >= nP && nP > 0)
  }

  // -------------------------------------------------------------- C17

  test("events_cohort_retention equals a naive per-user recomputation") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).getTime * 1000 + r.getTimestamp(1).getNanos / 1000 % 1000))
    val base = ev.map(_._2).min
    val weekUs = 7L * 86400000000L
    val uw = ev.map { case (u, us) => (u, (us - base) / weekUs) }.distinct
    val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val want = uw.groupBy { case (u, w) => (cohort(u), w) }
      .map { case (k, vs) => (k._1, k._2, vs.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = Analytics.eventsCohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // diagonal sanity: every cohort is active in its own first week
    got.groupBy(_._1).foreach { case (cw, rows) =>
      assert(rows.exists(_._2 == cw))
    }
  }

  // -------------------------------------------------------------- E20

  test("keyword_extract_tfidf equals a naive tf-idf recomputation") {
    val texts = docTexts
    val n = texts.size.toLong
    val tf = texts.toSeq.flatMap { case (id, t) =>
      t.trim.toLowerCase.split("\\s+").toSeq.groupBy(identity)
        .map { case (w, g) => (id, w, g.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val want = tf.map { case (id, w, f) => (id, w, f * ((1000000L * n) / df(w))) }
      .groupBy(_._1).toSeq.flatMap { case (id, terms) =>
        terms.sortBy { case (_, w, s) => (-s, w) }.take(3).zipWithIndex
          .map { case ((_, w, s), i) => (id, w, i + 1, s) }
      }.sortBy(t => (t._1, t._3))
    val got = Search.keywordExtractTfidf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  // -------------------------------------------------------------- E28

  test("phrase_search: positional adjacency — repeats count, inversions and gaps do not") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_phrase").toString
    Seq(
      (0L, "merge sort merge sort zz"),  // two occurrences
      (1L, "merge merge sort"),          // one (first 'merge' not adjacent)
      (2L, "sort merge"),                // inverted: none
      (3L, "merge zz sort"),             // gap: none
      (4L, "merge sort"))                // exact doc == phrase
      .map { case (id, t) => (id, t, "en", "src1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Search.phraseSearch(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    assert(got == Seq(0L -> 2L, 1L -> 1L, 4L -> 1L))
  }

  test("phrase_search: a 3-term phrase chains the adjacency join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_phrase3").toString
    Seq(
      (0L, "a b c"), (1L, "a b x c"), (2L, "x a b c y a b c"))
      .map { case (id, t) => (id, t, "en", "src1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Search.phraseSearch(spark, dir, Seq("a", "b", "c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    assert(got == Seq(0L -> 1L, 2L -> 2L))
  }
}
