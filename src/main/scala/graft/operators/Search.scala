package graft.operators

import graft.Tables
import graft.functions.{FakeEmbedding, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E18/E19: keyword (BM25) and hybrid (BM25 ⊕ vector, reciprocal-rank
  * fusion) retrieval over the documents corpus — the text-search half
  * of the hybrid-search surface a vector store grows next (the
  * reference serves the vector half; stackai-vector-db
  * app/services/search_service.py:83-120 is kNN-only).
  *
  * Scale notes:
  *   - The fixed-query BM25 is the inverted-index PROBE shape laid out
  *     as one corpus scan: per-term tf is a per-row array count
  *     (codegen'd, no explode), the corpus stats (N, Σdl, per-term df)
  *     are ONE aggregate row broadcast back, and the top-k is the
  *     repo's bounded TopKByDistance aggregate — map-side combined,
  *     never a global sort. At 100 TB the stats row comes from the
  *     corpus catalog instead, and nothing else changes.
  *   - Ranking outputs RANKS, not scores: the only non-rational step
  *     (ln in idf) can differ by 1 ulp across engines, so scores are
  *     kept internal and ties inside each engine break by doc_id.
  *   - RRF fusion operates on the two top-k lists only (≤ 2k rows,
  *     broadcast): documents outside both lists contribute nothing to
  *     the fused score by construction, so fusing shortlists equals
  *     fusing full rankings truncated at k — the standard serving
  *     shape.
  *
  * BM25 constants: k1 = 1.2, b = 0.75, idf = ln(1 + (N-df+0.5)/(df+0.5))
  * (the always-positive Lucene form). Literals are written identically
  * in the Column expression and the oracle SQL so every double op is
  * IEEE-identical across engines.
  */
object Search {

  /** Fixed demo query: three corpus-vocabulary terms. */
  val QueryTerms: Seq[String] = Seq("vector", "hash", "join")

  /** Per-doc BM25 score for [[QueryTerms]]: doc_id, dl, tf<i>, score.
    *
    * tf counts via a codegen'd regex — `(?:^|\s)term(?=\s|$)` counts
    * exactly the whitespace-delimited token occurrences that
    * `filter(split(text), _ == term)` counts (the lookahead leaves each
    * trailing separator for the next match, so adjacent repeats all
    * count), but the higher-order `filter` runs INTERPRETED per word
    * (CodegenFallback) — measured ~4s vs ~0.5s at sf0.1.
    */
  def bm25Scored(spark: SparkSession, dir: String): DataFrame = {
    val clean = trim(lower(col("text")))
    // rebalance BEFORE the regex/scoring chain: the single-row-group
    // test parquet pins an unsplit scan to one task, serializing the
    // whole per-doc scoring pipeline (measured: hybrid_search_rrf ran
    // 13 single-task stages end-to-end) — a no-op at real scale where
    // storage provides splits (the Tables.rebalanced contract)
    val perDoc = Tables.rebalanced(Tables.documents(spark, dir)).select(
      col("doc_id") +: size(split(clean, "\\s+")).cast("long").as("dl") +:
        QueryTerms.zipWithIndex.map { case (t, i) =>
          regexp_count(clean, lit("(?:^|\\s)" + java.util.regex.Pattern.quote(t) +
            "(?=\\s|$)")).cast("long").as(s"tf$i")
        }: _*)
    val statCols = sum(col("dl")).as("sum_dl") +:
      QueryTerms.indices.map { i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")
      }
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), statCols: _*)
    val n = col("n_docs").cast("double")
    val sumDl = col("sum_dl").cast("double")
    val dl = col("dl").cast("double")
    val score = QueryTerms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val df = col(s"df$i").cast("double")
      val idf = log(lit(1.0) + (n - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * ((dl * n) / sumDl)))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats)).withColumn("score", score)
  }

  /** Top-k ids of `df` by `by` DESC with doc_id tie-break, ranked via
    * the bounded TopKByDistance aggregate (map-side combined — no
    * global sort, no single-partition window).
    */
  private def rankTopK(df: DataFrame, by: Column, k: Int,
                       rankName: String): DataFrame =
    df.groupBy()
      .agg(VectorFunctions.topKByDistance(-by, col("doc_id"), k).as("nn"))
      .select(posexplode(col("nn")).as(Seq("pos", "nn")))
      .select(col("nn.id").as("doc_id"),
        (col("pos") + 1).cast("int").as(rankName))

  /** E18: BM25 top-10 for the fixed query. */
  def textSearchBm25(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    rankTopK(bm25Scored(spark, dir), col("score"), k, "rank")
      .orderBy("rank")

  private def bm25Cte: String = {
    val tfs = QueryTerms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(ws, w -> w = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n    ")
    val dfs = QueryTerms.indices.map { i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i"
    }.mkString(",\n    ")
    val terms = QueryTerms.indices.map { i =>
      s"""ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) * (CAST(tf$i AS DOUBLE) * 2.2) / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * ((CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)) / CAST(sum_dl AS DOUBLE))))"""
    }.mkString("\n      + ")
    s"""bm_d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
       |  FROM documents),
       |bm_f AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
       |    $tfs
       |  FROM bm_d),
       |bm_s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS sum_dl,
       |    $dfs
       |  FROM bm_f),
       |bm_sc AS (
       |  SELECT doc_id,
       |    $terms AS score
       |  FROM bm_f, bm_s)""".stripMargin
  }

  def textSearchBm25OracleSql(k: Int = 10): String =
    s"""WITH $bm25Cte
       |SELECT doc_id, rank FROM (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |  FROM bm_sc) t
       |WHERE rank <= $k
       |ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- E19

  /** Per-doc cosine distance to the fake-embedded [[VectorQueries.TextQuery]]
    * (the same provider-seam contract as embed_chunks / knn_text_query,
    * at the corpus dim).
    */
  def vecScored(spark: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    val clean = trim(lower(col("text")))
    val qv = FakeEmbedding.embed(VectorQueries.TextQuery, dim).toSeq
    // rebalanced for the same single-row-group reason as bm25Scored
    Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("doc_id"),
        graft.functions.TextFunctions.charSum(clean).as("char_sum"),
        length(clean).cast("long").as("len"),
        size(split(clean, "\\s+")).cast("long").as("words"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(dim - 1L)), i =>
          ((col("char_sum") * (i + lit(1L)) + col("len") * (i + lit(7L)) +
            col("words") * (i + lit(13L))) % 1000L) / lit(1000.0) - lit(0.5))
          .as("vec"))
      .select(col("doc_id"),
        VectorFunctions.cosineDistance(col("vec"), typedlit(qv)).as("dist"))
  }

  /** E19: hybrid search — RRF (r ↦ 1/(60+r)) over the BM25 top-20 and
    * the vector top-20, fused top-10. Both shortlists are tiny
    * (broadcast full-outer join); absent ranks contribute 0 and are
    * emitted as 0.
    */
  def hybridSearchRrf(spark: SparkSession, dir: String,
                      kIn: Int = 20, kOut: Int = 10): DataFrame = {
    // each ranker runs ONCE and its k-row list materializes
    // (localCheckpoint): the fused frame is consumed twice below, and
    // without the pin each consumer re-executes the whole scoring
    // pipeline — measured 18.5s → 4s at sf0.1, pure re-run latency
    val bm = rankTopK(bm25Scored(spark, dir), col("score"), kIn, "bm25_rank")
      .localCheckpoint()
    val ve = rankTopK(vecScored(spark, dir), -col("dist"), kIn, "vec_rank")
      .localCheckpoint()
    val fused = bm.join(ve, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("bm25_rank"), lit(0)).as("bm25_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"),
        (coalesce(lit(1.0) / (lit(60.0) + col("bm25_rank")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(60.0) + col("vec_rank")), lit(0.0))).as("rrf"))
    rankTopK(fused, col("rrf"), kOut, "rrf_rank")
      .join(broadcast(fused.select("doc_id", "bm25_rank", "vec_rank")), Seq("doc_id"))
      .select("doc_id", "rrf_rank", "bm25_rank", "vec_rank")
      .orderBy("rrf_rank")
  }

  // --------------------------------------------------------------- E18b

  /** Fixed demo query batch (query_id → text). */
  val BatchQueries: Seq[(Int, String)] = Seq(
    0 -> "vector hash join", 1 -> "stream window agg", 2 -> "table scan filter")

  /** E18b: BATCH BM25 — many queries against the corpus through the
    * inverted-index JOIN shape (E18 specializes one query into scan
    * columns; this is the general serving form): query terms ⋈ the
    * (doc, term, tf) posting table ⋈ per-term df ⋈ per-doc dl, then
    * per-(query, doc) scores and a per-query bounded top-k
    * (TopKByDistance partitioned by query — parallel, no global sort).
    * At scale the posting and df tables are the pre-built inverted
    * index; nothing else changes.
    *
    * Determinism note: a (query, doc) score sums FLOAT contributions
    * of its matched terms, and float addition is not associative — a
    * plain SUM() would let partial-aggregation order perturb last-ulp
    * bits differently per engine (and per Spark run). Contributions
    * are therefore folded in SORTED TERM ORDER on both sides
    * (array_sort + left fold here, list_sort + list_reduce in the
    * oracle) — bit-deterministic everywhere.
    */
  def textSearchBm25Batch(spark: SparkSession, dir: String,
                          k: Int = 10): DataFrame = {
    import spark.implicits._
    val qt = BatchQueries.toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("ws"))
    val tf = docs.select(col("doc_id"), explode(col("ws")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = docs.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = col("n_docs").cast("double")
    val sumDl = col("sum_dl").cast("double")
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val dlD = col("dl").cast("double")
    val idf = log(lit(1.0) + (n - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val s = idf * (tfD * lit(2.2)) /
      (tfD + lit(1.2) * (lit(0.25) + lit(0.75) * ((dlD * n) / sumDl)))
    val contrib = tf.join(broadcast(qt), "term")
      .join(dfs, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"), col("term"), s.as("s"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(collect_list(struct(col("term"), col("s"))).as("cs"))
      .select(col("query_id"), col("doc_id"),
        aggregate(array_sort(col("cs")), lit(0.0),
          (acc, x) => acc + x.getField("s")).as("score"))
    scored.groupBy("query_id")
      .agg(VectorFunctions.topKByDistance(-col("score"), col("doc_id"), k)
        .as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "nn")))
      .select(col("query_id"), col("nn.id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  def textSearchBm25BatchOracleSql(k: Int = 10): String = {
    val vals = BatchQueries
      .map { case (i, t) => s"($i,'$t')" }.mkString(", ")
    s"""WITH q(query_id, qtext) AS (VALUES $vals),
       |qt AS (SELECT DISTINCT query_id, unnest(string_split(qtext,' ')) AS term FROM q),
       |d AS (SELECT doc_id, string_split_regex(trim(lower(text)),'\\s+') AS ws FROM documents),
       |tfd AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM (SELECT doc_id, unnest(ws) AS term FROM d) GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl.dl) AS BIGINT) AS sumdl FROM dl),
       |dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfd GROUP BY term),
       |contrib AS (
       |  SELECT qt.query_id, tfd.doc_id, qt.term,
       |    ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)/(CAST(df AS DOUBLE) + 0.5))
       |      * (CAST(tf AS DOUBLE) * 2.2)
       |      / (CAST(tf AS DOUBLE) + 1.2*(0.25 + 0.75*((CAST(dl.dl AS DOUBLE)*CAST(n AS DOUBLE))/CAST(sumdl AS DOUBLE)))) AS s
       |  FROM qt JOIN tfd ON qt.term = tfd.term
       |  JOIN dfs ON tfd.term = dfs.term
       |  JOIN dl ON tfd.doc_id = dl.doc_id CROSS JOIN stats),
       |sc AS (
       |  SELECT query_id, doc_id,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(list_sort(list({'t': term, 's': s})), r -> r.s)),
       |      (a, b) -> a + b) AS score
       |  FROM contrib GROUP BY query_id, doc_id)
       |SELECT query_id, doc_id, rank FROM (
       |  SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |  FROM sc) t WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- E20

  /** E20: per-document keyword extraction — top-3 distinguishing terms
    * by tf-idf. This is the INVERTED-INDEX BUILD shape (E18 is the
    * probe shape): explode terms → (doc, term) tf [shuffle 1] → term df
    * [shuffle 2, vocab-sized] → join scores back → per-doc top-3 via a
    * doc-partitioned window [shuffle 3]. Every stage is keyed and
    * map-side combined; the window partitions by doc_id so it
    * parallelizes (never a global window).
    *
    * idf is INTEGER-QUANTIZED: idf_q = (1_000_000 · N) div df, so
    * score = tf · idf_q is exact BIGINT arithmetic — bit-identical
    * across engines with no ln() ulp hazard (cf. E18, which must emit
    * ranks only). The quantization error (≤ 1 part in ~10⁴ of idf at
    * this N) is far below any rank-relevant gap.
    */
  def keywordExtractTfidf(spark: SparkSession, dir: String,
                          k: Int = 3): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score", expr("tf * ((1000000 * n_docs) DIV df)"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(byDoc))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"),
        col("score").cast("long").as("score"))
      .orderBy("doc_id", "rank")
  }

  def keywordExtractTfidfOracleSql(k: Int = 3): String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM w GROUP BY doc_id, term),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |sc AS (
       |  SELECT tf.doc_id, tf.term, tf.tf * ((1000000 * n.n_docs) // d.df) AS score
       |  FROM tf JOIN df d ON tf.term = d.term CROSS JOIN n)
       |SELECT doc_id, term, rank, CAST(score AS BIGINT) AS score FROM (
       |  SELECT doc_id, term, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
       |  FROM sc) t
       |WHERE rank <= $k
       |ORDER BY doc_id, rank""".stripMargin

  def hybridSearchRrfOracleSql(kIn: Int = 20, kOut: Int = 10,
                               dim: Int = 64): String = {
    val qvLit = FakeEmbedding.sqlLiteral(VectorQueries.TextQuery, dim)
    s"""WITH $bm25Cte,
       |b20 AS (
       |  SELECT doc_id, rank AS br FROM (
       |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |    FROM bm_sc) t WHERE rank <= $kIn),
       |v_f AS (
       |  SELECT doc_id, trim(lower(text)) AS clean FROM documents),
       |v_feats AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(string_split(clean, ''), x -> ord(x))) AS BIGINT) AS char_sum,
       |    CAST(length(clean) AS BIGINT) AS len,
       |    CAST(len(string_split_regex(clean, '\\s+')) AS BIGINT) AS words
       |  FROM v_f),
       |v_vecs AS (
       |  SELECT doc_id,
       |    list_transform(range(0, $dim), i ->
       |      ((char_sum*(i+1) + len*(i+7) + words*(i+13)) % 1000)/1000.0 - 0.5) AS vec
       |  FROM v_feats),
       |v20 AS (
       |  SELECT doc_id, rank AS vr FROM (
       |    SELECT doc_id,
       |      row_number() OVER (ORDER BY list_cosine_similarity(vec, $qvLit) DESC, doc_id) AS rank
       |    FROM v_vecs) t WHERE rank <= $kIn),
       |fused AS (
       |  SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
       |    CAST(coalesce(b.br, 0) AS INT) AS bm25_rank,
       |    CAST(coalesce(v.vr, 0) AS INT) AS vec_rank,
       |    coalesce(1.0 / (60.0 + b.br), 0.0) + coalesce(1.0 / (60.0 + v.vr), 0.0) AS rrf
       |  FROM b20 b FULL OUTER JOIN v20 v ON b.doc_id = v.doc_id)
       |SELECT doc_id, rrf_rank, bm25_rank, vec_rank FROM (
       |  SELECT doc_id, bm25_rank, vec_rank,
       |    row_number() OVER (ORDER BY rrf DESC, doc_id) AS rrf_rank
       |  FROM fused) t
       |WHERE rrf_rank <= $kOut
       |ORDER BY rrf_rank""".stripMargin
  }

  // ------------------------------------------------------------- E28

  /** Fixed demo phrase: two adjacent corpus-vocabulary terms. */
  val PhraseTerms: Seq[String] = Seq("merge", "sort")

  /** E28: exact phrase search via POSITIONAL postings adjacency — the
    * inverted-index answer to "docs containing the exact phrase", not a
    * substring scan. Per-occurrence count per doc.
    *
    * Shape: the corpus scan prunes to the phrase's vocabulary BEFORE
    * anything shuffles (the wire carries Σ df(term) posting rows, not
    * the corpus), then one equi-join per additional term on the
    * (doc_id, normalized position) key — term i matches at pos-i, so
    * every join shares the same key and Catalyst reuses the exchange.
    * At 100 TB this is the standard phrase-query plan over a postings
    * table; here the postings derive in-plan from the same scan.
    *
    * The oracle is genuinely independent: DuckDB counts RE2 word-
    * boundary regex matches over the raw text (`\bmerge sort\b`) —
    * a different algorithm agreeing on every count. (With distinct
    * first/last terms occurrences cannot overlap, so non-overlapping
    * regex counting is exact.)
    */
  def phraseSearch(spark: SparkSession, dir: String,
                   phrase: Seq[String] = PhraseTerms): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val postings = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(col("w").isin(phrase.distinct: _*))
    val base = postings.filter(col("w") === phrase.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val matched = phrase.zipWithIndex.tail.foldLeft(base) { case (acc, (term, i)) =>
      val t = postings.filter(col("w") === term)
        .select(col("doc_id").as(s"d$i"), (col("pos") - i).as(s"q$i"))
      acc.join(t, acc("doc_id") === t(s"d$i") && col("p0") === t(s"q$i"))
        .drop(s"d$i", s"q$i")
    }
    matched.groupBy("doc_id").agg(count(lit(1)).as("n_occ")).orderBy("doc_id")
  }

  def phraseSearchOracleSql(phrase: Seq[String] = PhraseTerms): String = {
    val p = phrase.mkString(" ")
    s"""SELECT doc_id, n_occ FROM (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '\\b$p\\b')) AS BIGINT) AS n_occ
       |  FROM documents) t
       |WHERE n_occ > 0 ORDER BY doc_id""".stripMargin
  }
}
