package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B-series document/chunk pipeline + E7-E10 text analysis.
  *
  * Re-expresses the reference's ingest surface (stackai-vector-db
  * app/services/chunk_service.py fixed-size chunking,
  * app/clients/embedding.py fake embedding, DocumentMetadata.word_count
  * in app/domain/entities.py:27-41) as declarative DataFrame pipelines,
  * plus the text-analysis operators an LLM-data pipeline needs at scale
  * (language ID, quality scoring, token counting, fingerprinting).
  *
  * Scale notes: every operator here is a narrow per-row map over the
  * documents scan (no shuffle at all except the final presentation
  * ORDER BY, which a 100 TB pipeline would drop). Chunking explodes to
  * ceil(n_chars/stride) rows per doc — output partitioning follows the
  * scan, so downstream per-chunk work stays co-partitioned with the
  * source. All scalar work is Catalyst built-ins (split/transform/
  * aggregate/regexp) so it runs inside whole-stage codegen.
  *
  * Oracle-parity rules: integer arithmetic end-to-end where possible;
  * double appears only as a final, identically-ordered expression in
  * both engines (same IEEE ops in the same order ⇒ identical bits).
  */
object TextOps {

  val ChunkSize = 200
  val ChunkStride = 150

  /** Fixed-size chunking with overlap (size=200, stride=150), the
    * reference's chunk entity derived from documents. One output row
    * per (doc, chunk_idx); start indices 0, 150, 300, … < n_chars.
    */
  def chunks(docs: DataFrame): DataFrame =
    graft.Tables.rebalanced(docs
      .select(col("doc_id"), col("text"), col("n_chars")))
      .withColumn("start_idx",
        explode(sequence(lit(0L), col("n_chars") - 1, lit(ChunkStride.toLong))))
      .select(
        col("doc_id"),
        (col("start_idx") / ChunkStride).cast("int").as("chunk_idx"),
        col("start_idx"),
        least(col("start_idx") + ChunkSize, col("n_chars")).as("end_idx"),
        substring_index_safe(col("text"), col("start_idx")).as("chunk_text"))

  private def substring_index_safe(text: Column, start: Column): Column =
    text.substr(start.cast("int") + 1, lit(ChunkSize))

  /** Shared oracle-side chunk derivation (also used by Validate). */
  private def chunksCte = chunksCteSql
  val chunksCteSql: String =
    s"""WITH starts AS (
       |  SELECT doc_id, n_chars, text,
       |    unnest(generate_series(0, n_chars-1, $ChunkStride)) AS start_idx
       |  FROM documents),
       |chunks AS (
       |  SELECT doc_id, CAST(start_idx/$ChunkStride AS INT) AS chunk_idx, start_idx,
       |    least(start_idx+$ChunkSize, n_chars) AS end_idx,
       |    substr(text, CAST(start_idx+1 AS INT), $ChunkSize) AS chunk_text
       |  FROM starts)""".stripMargin

  /** B1: the chunk table itself. */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame =
    chunks(Tables.documents(spark, dir))
      .orderBy("doc_id", "chunk_idx")

  def chunkDocumentsOracleSql: String =
    s"""$chunksCte
       |SELECT doc_id, chunk_idx, start_idx, end_idx, chunk_text
       |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  /** B2: deterministic fake embedding per chunk (reference formula,
    * app/clients/embedding.py:100-137), dim=8, one row per component so
    * the oracle compares scalars. All features computed in exact integer
    * arithmetic; the single double division is ordered identically in
    * both engines.
    */
  def embedChunks(spark: SparkSession, dir: String, dim: Int = 8): DataFrame = {
    val clean = trim(lower(col("chunk_text")))
    chunks(Tables.documents(spark, dir))
      .select(col("doc_id"), col("chunk_idx"), clean.as("clean"))
      .filter(length(col("clean")) > 0)
      .select(
        col("doc_id"), col("chunk_idx"),
        graft.functions.TextFunctions.charSum(col("clean")).as("char_sum"),
        length(col("clean")).cast("long").as("len"),
        size(split(col("clean"), "\\s+")).cast("long").as("words"))
      .withColumn("comp_idx", explode(sequence(lit(0L), lit(dim - 1L))))
      .select(
        col("doc_id"), col("chunk_idx"), col("comp_idx"),
        (((col("char_sum") * (col("comp_idx") + 1) +
           col("len") * (col("comp_idx") + 7) +
           col("words") * (col("comp_idx") + 13)) % 1000) / 1000.0 - 0.5).as("comp"))
      .orderBy("doc_id", "chunk_idx", "comp_idx")
  }

  def embedChunksOracleSql(dim: Int = 8): String =
    s"""$chunksCte,
       |cleaned AS (
       |  SELECT doc_id, chunk_idx, trim(lower(chunk_text)) AS clean FROM chunks),
       |feats AS (
       |  SELECT doc_id, chunk_idx,
       |    CAST(list_sum(list_transform(string_split(clean, ''), x -> ord(x))) AS BIGINT) AS char_sum,
       |    CAST(length(clean) AS BIGINT) AS len,
       |    CAST(len(string_split_regex(clean, '\\s+')) AS BIGINT) AS words
       |  FROM cleaned WHERE length(clean) > 0)
       |SELECT doc_id, chunk_idx, comp_idx,
       |  ((char_sum*(comp_idx+1) + len*(comp_idx+7) + words*(comp_idx+13)) % 1000)/1000.0 - 0.5 AS comp
       |FROM feats, range(0, $dim) t(comp_idx)
       |ORDER BY doc_id, chunk_idx, comp_idx""".stripMargin

  /** B3: per-document stats (DocumentMetadata.word_count surface). */
  def docStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("char_count"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("word_count"))
      .orderBy("doc_id")

  def docStatsOracleSql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS char_count,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS word_count
      |FROM documents ORDER BY doc_id""".stripMargin

  /** B4: limit/offset pagination as a deterministic ordered page
    * (repositories' list endpoints). Page 3 of 50 over the chunk table.
    */
  def chunkPagination(spark: SparkSession, dir: String,
                      limit: Int = 50, offset: Int = 120): DataFrame =
    chunks(Tables.documents(spark, dir))
      .select("doc_id", "chunk_idx", "start_idx", "end_idx")
      .orderBy("doc_id", "chunk_idx")
      .offset(offset)
      .limit(limit)

  def chunkPaginationOracleSql(limit: Int = 50, offset: Int = 120): String =
    s"""$chunksCte
       |SELECT doc_id, chunk_idx, start_idx, end_idx
       |FROM chunks ORDER BY doc_id, chunk_idx LIMIT $limit OFFSET $offset""".stripMargin

  /** B4b: document-level pagination — the reference lists documents
    * sorted by title.lower() (app/repositories/in_memory/
    * document_repository.py:19-28) then slices [offset, offset+limit).
    * The title analog is the lowercased text prefix; doc_id breaks ties
    * deterministically. Only the page crosses the network: the sort is
    * a TakeOrdered-style bounded operation, never a full result
    * materialization.
    */
  def docPagination(spark: SparkSession, dir: String,
                    limit: Int = 25, offset: Int = 40): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        lower(substring(col("text"), 1, 24)).as("title_lower"), col("source"))
      .orderBy(col("title_lower"), col("doc_id"))
      .offset(offset)
      .limit(limit)

  def docPaginationOracleSql(limit: Int = 25, offset: Int = 40): String =
    s"""SELECT doc_id, lower(substr(text, 1, 24)) AS title_lower, source
       |FROM documents ORDER BY title_lower, doc_id
       |LIMIT $limit OFFSET $offset""".stripMargin

  // ---------------------------------------------------------------- E7

  /** Stopword tables per language. Tiny, inlined as literals — at scale
    * this is a broadcast-free map-side lookup (the sets live in the
    * generated code, no join).
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  private def hits(words: Column, lang: String): Column =
    size(filter(words, w => w.isInCollection(Stopwords(lang))))

  /** E7: n-gram/stopword language ID heuristic: argmax of per-language
    * stopword hits, alphabetical tie-break, 'und' (undetermined) when no
    * list hits at all.
    */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdOn(Tables.documents(spark, dir))
      .select("doc_id", "lang", "predicted")
      .orderBy("doc_id")

  def langIdOn(docs: DataFrame, carry: Seq[Column] = Nil): DataFrame = {
    val words = split(lower(col("text")), " ")
    val Seq(de, en, es, fr, zh) =
      Seq("de", "en", "es", "fr", "zh").map(l => hits(words, l))
    docs
      .select(Seq(col("doc_id"), col("lang"),
        de.as("c_de"), en.as("c_en"), es.as("c_es"), fr.as("c_fr"), zh.as("c_zh"))
        ++ carry: _*)
      .withColumn("predicted",
        when(col("c_de") + col("c_en") + col("c_es") + col("c_fr") + col("c_zh") === 0, "und")
          .when(col("c_de") >= greatest(col("c_en"), col("c_es"), col("c_fr"), col("c_zh")), "de")
          .when(col("c_en") >= greatest(col("c_es"), col("c_fr"), col("c_zh")), "en")
          .when(col("c_es") >= greatest(col("c_fr"), col("c_zh")), "es")
          .when(col("c_fr") >= col("c_zh"), "fr")
          .otherwise("zh"))
  }

  def langIdOracleSql: String = {
    def h(l: String) =
      Stopwords(l).map(w => s"'$w'").mkString(
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN (", ", ", s"))) AS INT)")
    s"""WITH counts AS (
       |  SELECT doc_id, lang,
       |    ${h("de")} AS c_de, ${h("en")} AS c_en, ${h("es")} AS c_es,
       |    ${h("fr")} AS c_fr, ${h("zh")} AS c_zh
       |  FROM documents)
       |SELECT doc_id, lang,
       |  CASE WHEN c_de + c_en + c_es + c_fr + c_zh = 0 THEN 'und'
       |       WHEN c_de >= greatest(c_en, c_es, c_fr, c_zh) THEN 'de'
       |       WHEN c_en >= greatest(c_es, c_fr, c_zh) THEN 'en'
       |       WHEN c_es >= greatest(c_fr, c_zh) THEN 'es'
       |       WHEN c_fr >= c_zh THEN 'fr'
       |       ELSE 'zh' END AS predicted
       |FROM counts ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- E8

  /** E8: composite quality score — doc length, mean word length, and
    * stopword density, each clamped to [0,1]. Exact integer features;
    * one identically-ordered double expression at the end.
    */
  /** The three E8 feature columns from a text column — ONE definition
    * shared by the E8 key and the E44/D14 flag seam, so the formula's
    * inputs cannot drift between the batch and streaming gates.
    */
  private def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val words = split(trim(text), "\\s+")
    Seq(
      "n_words"   -> size(words).cast("long"),
      "sum_wlen"  -> aggregate(words, lit(0L), (acc, w) => acc + length(w)),
      "stop_hits" -> hits(split(lower(text), " "), "en").cast("long"))
  }

  /** The E8 composite over the named feature columns — the exact
    * double expression (operation order and all) the oracle mirrors.
    */
  private def qualityScoreCol: Column =
    least(col("n_words") / lit(100.0), lit(1.0)) * 0.3 +
      least(col("sum_wlen").cast("double") / col("n_words") / lit(8.0), lit(1.0)) * 0.3 +
      (col("stop_hits").cast("double") / col("n_words")) * lit(0.4)

  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(Seq(col("doc_id")) ++
        qualityFeatures(col("text")).map { case (n, c) => c.as(n) }: _*)
      .select(col("doc_id"), col("n_words"), qualityScoreCol.as("score"))
      .orderBy("doc_id")

  def qualityScoreOracleSql: String =
    """WITH feats AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'), w -> length(w))) AS BIGINT) AS sum_wlen,
      |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS BIGINT) AS stop_hits
      |  FROM documents)
      |SELECT doc_id, n_words,
      |  least(n_words/100.0, 1.0) * 0.3 +
      |  least(CAST(sum_wlen AS DOUBLE)/n_words/8.0, 1.0) * 0.3 +
      |  (CAST(stop_hits AS DOUBLE)/n_words) * 0.4 AS score
      |FROM feats ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- E17

  /** E17: repetition-based quality signals (the Gopher/C4-style rules
    * E8's composite does not cover): per doc, the fraction of words
    * that are repeats of an earlier word and the fraction of word
    * bigrams claimed by the single most frequent bigram — the two
    * workhorse filters for template/boilerplate text, where stopword
    * and length stats look fine but the n-gram stream collapses.
    *
    * Shapes: everything is a per-row array expression inside one
    * codegen'd scan — no explode, no shuffle. The most-frequent-bigram
    * count runs the compiled [[graft.functions.TopNgramCount]] kernel
    * (sort gram references, count the longest run — O(d log d) per
    * row, vs the O(d²) count-each-distinct formulation that stops
    * scaling at book-length docs; the oracle keeps the quadratic
    * spelling, the multiset max is the same number). The earlier
    * zip_with + aggregate(fold) spelling of the same idea evaluated
    * interpreted (HOFs are CodegenFallback). Trading a shuffle for
    * bounded per-row CPU is the right side of the trade at 100 TB,
    * where the alternative explodes every bigram through a groupBy.
    * All output fractions are single divisions of exact integers, so
    * both engines produce bit-identical doubles.
    */
  def qualityGopher(spark: SparkSession, dir: String): DataFrame = {
    val words = split(trim(lower(col("text"))), "\\s+")
    Tables.documents(spark, dir)
      .select(col("doc_id"), words.as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
        graft.functions.TopNgramCount.topNgramCount(col("ws"), 2)
          .as("top_bigram_n"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"), col("top_bigram_n"),
        ((col("n_words") - col("n_distinct")).cast("double") / col("n_words"))
          .as("dup_word_frac"),
        when(col("n_words") < 2, lit(0.0))
          .otherwise(col("top_bigram_n").cast("double") / (col("n_words") - 1))
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  def qualityGopherOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CAST(len(ws) AS BIGINT) AS n_words,
      |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
      |    CASE WHEN len(ws) < 2 THEN CAST(0 AS BIGINT) ELSE CAST(
      |      list_max(list_transform(
      |        list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])),
      |        bg -> len(list_filter(
      |          list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]),
      |          y -> y = bg)))) AS BIGINT) END AS top_bigram_n
      |  FROM d)
      |SELECT doc_id, n_words, n_distinct, top_bigram_n,
      |  CAST(n_words - n_distinct AS DOUBLE) / n_words AS dup_word_frac,
      |  CASE WHEN n_words < 2 THEN 0.0
      |       ELSE CAST(top_bigram_n AS DOUBLE) / (n_words - 1) END AS top_bigram_frac
      |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- E30

  /** E30: robust per-source length outliers — median/MAD, the
    * distribution-free screen a mixed-source corpus needs (a 90-char
    * doc is normal in a chat source and truncation damage in a book
    * source; global z-scores can't see that, and mean/stddev are
    * themselves dragged by the very outliers being hunted — median/MAD
    * has a 50% breakdown point). Flags docs with
    * |n_chars − median(source)| > T·MAD(source).
    *
    * Exact discrete semantics, integers end-to-end: lower median =
    * element at 1-based rank (n+1) div 2 of the sorted group (C20's
    * index idiom — never a double `ceil`), deviations stay BIGINT, the
    * threshold compare is integer×integer. Each median pass uses the
    * E39 histogram value-at-rank formulation: groupBy (source, value)
    * → per-source cumulative counts over HISTOGRAM rows → min value
    * whose cumulative count reaches the rank. The only per-source
    * window runs over distinct values (bounded by the value DOMAIN,
    * never the corpus — a source with a billion docs but chars ≤ 100k
    * ranks ≤ 100k histogram rows), so a 90%-skewed crawl source costs
    * its hot task a map-side-combined count, not a full row-set sort —
    * the round-8 E40/E41 straggler class, removed here the same round
    * the library learned the lesson. Two passes (values, then
    * deviations) = two histogram aggregations; the 20-row per-source
    * median/MAD frames broadcast back.
    *
    * Scale note: the 100 TB twin swaps both medians for
    * `approx_percentile(0.5)` sketches (fixed memory, map-side
    * combined) at the cost of the exactness oracle; the threshold
    * logic is unchanged.
    */
  def qualityOutliersMad(spark: SparkSession, dir: String, t: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("source")).orderBy(col(valueCol))
      val wn = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      df.groupBy(col("source"), col(valueCol))
        .agg(count(lit(1)).as("cnt"))
        .select(col("source"), col(valueCol),
          sum(col("cnt")).over(w).as("cum"), sum(col("cnt")).over(wn).as("n"))
        .groupBy(col("source"))
        .agg(min(when(col("cum") >= expr("(n+1) div 2"), col(valueCol))).as(out))
    }
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val dev = docs.join(lowerMedian(docs, "n_chars", "med"), "source")
      .select(col("doc_id"), col("source"), col("n_chars"),
        abs(col("n_chars") - col("med")).as("dev"))
    dev.join(lowerMedian(dev, "dev", "mad"), "source")
      .filter(col("dev") > lit(t.toLong) * col("mad"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("dev"), col("mad"))
      .orderBy("doc_id")
  }

  def qualityOutliersMadOracleSql(t: Int = 2): String =
    s"""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
       |w AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
       |             count(*) OVER (PARTITION BY source) AS n FROM d),
       |med AS (SELECT source, max(CASE WHEN rn = (n+1)//2 THEN n_chars END) AS med
       |        FROM w GROUP BY source),
       |dev AS (SELECT d.doc_id, d.source, d.n_chars, abs(d.n_chars - m.med) AS dev
       |        FROM d JOIN med m USING (source)),
       |w2 AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn,
       |              count(*) OVER (PARTITION BY source) AS n FROM dev),
       |mad AS (SELECT source, max(CASE WHEN rn = (n+1)//2 THEN dev END) AS mad
       |        FROM w2 GROUP BY source)
       |SELECT v.doc_id, v.source, v.n_chars, v.dev, m2.mad
       |FROM dev v JOIN mad m2 USING (source)
       |WHERE v.dev > $t * m2.mad
       |ORDER BY v.doc_id""".stripMargin

  // ---------------------------------------------------------------- E9

  val BpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** E9: whitespace token count + a BPE-ish regex token count (letters
    * runs, digit runs, individual symbols).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit(BpeTokenPattern), lit(0)))
          .cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  def tokenCountOracleSql: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '$BpeTokenPattern')) AS BIGINT) AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  /** E12: the composed cleaning pipeline a training-data run actually
    * executes — language filter (E7) → quality floor (E8) → exact
    * dedup (E1, canonical = min doc_id) → per-source survivor stats.
    * One declarative plan: the scalar stages fuse into the document
    * scan under whole-stage codegen, and the only shuffles are the
    * doc_id co-joins, the dedup groupBy, and the final rollup. The
    * threshold compare is bit-deterministic because the score
    * expression is evaluated in the same IEEE order in both engines
    * (the E8 oracle already pins that).
    */
  def pipelineCleanCorpus(spark: SparkSession, dir: String,
                          lang: String = "en",
                          minScore: Double = 0.3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val predicted = langIdOn(docs).select(col("doc_id"), col("predicted"))
    val quality = qualityScore(spark, dir).select(col("doc_id"), col("score"))
    val clean = docs.select("doc_id", "source", "text")
      .join(predicted, "doc_id")
      .join(quality, "doc_id")
      .filter(col("predicted") === lang && col("score") >= minScore)
    val canonical = clean
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    clean.join(canonical, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_clean"))
      .orderBy("source")
  }

  def pipelineCleanCorpusOracleSql(lang: String = "en",
                                   minScore: Double = 0.3): String =
    s"""WITH lang_pred AS (${langIdOracleSql}),
       |qual AS (${qualityScoreOracleSql}),
       |clean AS (
       |  SELECT d.doc_id, d.source, d.text
       |  FROM documents d
       |  JOIN lang_pred ON d.doc_id = lang_pred.doc_id
       |  JOIN qual ON d.doc_id = qual.doc_id
       |  WHERE lang_pred.predicted = '$lang' AND qual.score >= $minScore),
       |canon AS (
       |  SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text))
       |SELECT source, count(*) AS n_docs_clean
       |FROM clean JOIN canon USING (doc_id)
       |GROUP BY source ORDER BY source""".stripMargin

  /** E16: the FULL pretraining cleanup pass — language filter (E7),
    * quality floor (E8), exact-dup canonicalization (E1), and NEAR-dup
    * cluster canonicalization (E13 connected components): a document
    * survives when it passes both filters, is its exact-duplicate
    * group's canonical, and is not a non-canonical member of a near-dup
    * component. Components are computed over the WHOLE corpus pair
    * graph (membership in a boilerplate family is a property of the
    * corpus, not of the filtered subset); the non-canonical set is
    * tiny, so it drops via a broadcast anti-join. Everything except
    * the O(diameter) propagation rounds is one declarative plan.
    */
  def pipelineDedupCorpus(spark: SparkSession, dir: String,
                          lang: String = "en",
                          minScore: Double = 0.3): DataFrame =
    survivorRollup(pipelineDedupSurvivors(spark, dir, lang, minScore))

  /** E16 survivor set (doc_id, source) — the rollup's input, exposed so
    * DedupSpec can compare survivor SETS between the exact and fuzzy
    * pipelines, not just their per-source counts.
    */
  private[graft] def pipelineDedupSurvivors(spark: SparkSession, dir: String,
                                            lang: String = "en",
                                            minScore: Double = 0.3): DataFrame =
    dedupSurvivorsOn(spark, dir,
      Dedup.dedupComponents(spark, dir)
        .filter(col("doc_id") =!= col("component_id"))
        .select("doc_id"),
      lang, minScore)

  /** Shared E16/E42 survivor core: clean gate (language + quality) →
    * exact-dup canonicalization → drop non-canonical members of the
    * given near-dup components — the pipeline's survivor rule with the
    * near-dup PAIR GRAPH as the one degree of freedom (exact E2 graph
    * for the oracle contract, LSH-verified graph for the 100 TB
    * default). One definition, so the two pipelines can never drift on
    * anything but the graph.
    */
  private def dedupSurvivorsOn(spark: SparkSession, dir: String,
                               nonCanonical: DataFrame,
                               lang: String, minScore: Double): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val predicted = langIdOn(docs).select(col("doc_id"), col("predicted"))
    val quality = qualityScore(spark, dir).select(col("doc_id"), col("score"))
    val clean = docs.select("doc_id", "source", "text")
      .join(predicted, "doc_id")
      .join(quality, "doc_id")
      .filter(col("predicted") === lang && col("score") >= minScore)
    val exactCanon = clean
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    clean.join(exactCanon, "doc_id")
      .join(nonCanonical, Seq("doc_id"), "left_anti")
      .select("doc_id", "source")
  }

  private def survivorRollup(survivors: DataFrame): DataFrame =
    survivors
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_clean"))
      .orderBy("source")

  /** E59: `pipeline_dedup_corpus_quality` — E16 with the RefinedWeb
    * keep-best-of-cluster canonical (E57's (score DESC, doc_id)
    * argmax) in place of min-id: the round-13 verdict's routing task —
    * the quality-aware rule existed only as a REPORT (E57) while the
    * pipelines kept min-id; this runs the pipeline under the better
    * rule through the SAME shared survivor core (the near-dup
    * non-canonical set is the one degree of freedom), so the two
    * pipelines cannot drift on the gates, the exact canon, or the
    * component graph. The exact-dup stage deliberately stays min-id:
    * exact-duplicate members have identical text and therefore
    * identical scores — the rules coincide there by construction
    * (E57's scaladoc), so swapping it would change nothing but cost a
    * second window. DedupSpec pins the survivor-set relationship
    * against E16 (same size per component count, disagreement exactly
    * on the E57 rules_agree=false clusters).
    */
  def pipelineDedupCorpusQuality(spark: SparkSession, dir: String,
                                 lang: String = "en",
                                 minScore: Double = 0.3): DataFrame =
    survivorRollup(pipelineDedupQualitySurvivors(spark, dir, lang, minScore))

  /** E59 survivor set — DedupSpec's comparison handle. */
  private[graft] def pipelineDedupQualitySurvivors(spark: SparkSession,
                                                   dir: String,
                                                   lang: String = "en",
                                                   minScore: Double = 0.3): DataFrame =
    dedupSurvivorsOn(spark, dir, Dedup.qualityNonCanonical(spark, dir),
      lang, minScore)

  /** E42: the AT-SCALE composed fuzzy-dedup pass — the published
    * big-corpus recipe (Lee et al. 2022 "Deduplicating Training Data
    * Makes Language Models Better" §4; Penedo et al. 2023 RefinedWeb
    * §3.3) end-to-end as one key: MinHash-LSH band buckets propose
    * candidates (E3), exact Jaccard verifies them, star-contraction
    * closes the verified graph into components (E13's engine), and the
    * same clean gate + canonical-survivor rule as E16 rolls up
    * per-source counts. E16 keeps the EXACT prefix-filtered pair graph
    * as the oracle contract; this key is what actually runs at 100 TB —
    * O(docs × bands) bucket rows instead of an all-pairs prefix join.
    * Verified LSH edges ⊆ exact edges (identical Jaccard ≥ t check on
    * every candidate), so E16's survivors ⊆ E42's: LSH can only MISS
    * pairs, never invent them — the containment + ≥ 0.95 survivor-set
    * agreement is pinned end-to-end in DedupSpec at two SFs.
    * Rows-only by design: the candidate set rides Spark-native
    * xxhash64 minhashes (same structural reason as E3/E4).
    */
  def pipelineFuzzyDedup(spark: SparkSession, dir: String,
                         lang: String = "en",
                         minScore: Double = 0.3): DataFrame =
    survivorRollup(pipelineFuzzySurvivors(spark, dir, lang, minScore))

  /** E42 survivor set — DedupSpec's comparison handle. */
  private[graft] def pipelineFuzzySurvivors(spark: SparkSession, dir: String,
                                            lang: String = "en",
                                            minScore: Double = 0.3): DataFrame =
    dedupSurvivorsOn(spark, dir, Dedup.fuzzyNonCanonical(spark, dir),
      lang, minScore)

  /** E44: the cleanup-pipeline ATTRITION funnel — per source, how many
    * documents survive each stage of the E16 pass: raw → language
    * gate → + quality floor → + exact-dup canonicalization → + near-dup
    * cluster canonicalization. This is the per-stage loss report every
    * pretraining-data release publishes next to its card (a stage that
    * suddenly eats a source is the bug signal operators watch; the
    * end-to-end count alone can't say WHICH gate moved). One document
    * scan: the language and quality signals are per-row expressions,
    * each stage is a conjunction of flags, and the per-source rollup
    * is conditional sums over the SAME rows — no per-stage re-scan, no
    * self-joins; the two canonicalization flags join back as skinny
    * (doc_id)-keyed tables the stages already compute. Exact BIGINTs
    * throughout; the oracle replays the E12/E16 CTE chain.
    */
  /** Per-row clean-gate flags over a (doc_id, lang, source, text)
    * frame: language prediction (E7's chain) and the quality floor
    * (E8's formula, expression-for-expression — the composed double
    * must match the composed oracle bit for bit) as ONE projection
    * chain with NO joins — a corpus-sized join per signal would
    * shuffle the corpus twice for values that are pure per-row
    * functions. Shared by E44 (batch funnel) and D14 (streaming
    * ingest funnel), so the two can never drift on a gate.
    */
  private[graft] def attritionFlagsOn(docs: DataFrame,
                                      lang: String = "en",
                                      minScore: Double = 0.3): DataFrame =
    qualityFeatures(col("text")).foldLeft(
      langIdOn(docs, carry = Seq(col("source"), col("text")))) {
        case (df, (name, c)) => df.withColumn(name, c)
      }
      .withColumn("score", qualityScoreCol)
      .withColumn("pass_lang", (col("predicted") === lang).cast("long"))
      .withColumn("pass_qual",
        (col("predicted") === lang && col("score") >= minScore).cast("long"))
      .select("doc_id", "source", "text", "pass_lang", "pass_qual")

  def pipelineAttritionReport(spark: SparkSession, dir: String,
                              lang: String = "en",
                              minScore: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // exact canon as a window over the hash (min pass_qual doc_id per
    // text group): one hash shuffle, no groupBy + join-back pair
    val canonWin = Window.partitionBy(md5(col("text")))
    val flagged = attritionFlagsOn(Tables.documents(spark, dir), lang, minScore)
      .withColumn("canon_id",
        min(when(col("pass_qual") === 1L, col("doc_id"))).over(canonWin))
      .withColumn("pass_exact",
        (col("pass_qual") === 1L && col("doc_id") === col("canon_id")).cast("long"))
    val nonCanonical = Dedup.dedupComponents(spark, dir)
      .filter(col("doc_id") =!= col("component_id"))
      .select(col("doc_id"), lit(1L).as("is_neardup"))
    flagged
      .join(nonCanonical, Seq("doc_id"), "left")
      .withColumn("pass_all",
        col("pass_exact") * (lit(1L) - coalesce(col("is_neardup"), lit(0L))))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("pass_lang")).as("n_lang"),
        sum(col("pass_qual")).as("n_quality"),
        sum(col("pass_exact")).as("n_exact_canon"),
        sum(col("pass_all")).as("n_survivors"))
      .orderBy("source")
  }

  /** Shared flag/canon CTE block for the two funnel oracles (E44 batch,
    * D14 streaming ingest) — one definition, so the gates cannot drift
    * between the batch and streaming replays.
    */
  private def attritionFlaggedCtes(lang: String, minScore: Double): String =
    s"""lang_pred AS (${langIdOracleSql}),
       |qual AS (${qualityScoreOracleSql}),
       |flagged AS (
       |  SELECT d.doc_id, d.source, d.text,
       |    CAST(lang_pred.predicted = '$lang' AS BIGINT) AS pass_lang,
       |    CAST(lang_pred.predicted = '$lang' AND qual.score >= $minScore AS BIGINT) AS pass_qual
       |  FROM documents d
       |  JOIN lang_pred ON d.doc_id = lang_pred.doc_id
       |  JOIN qual ON d.doc_id = qual.doc_id),
       |canon AS (
       |  SELECT min(doc_id) AS doc_id FROM flagged WHERE pass_qual = 1
       |  GROUP BY md5(text))""".stripMargin

  /** D14 oracle: the ingest-stage funnel (no near-dup column — the
    * component pass is the batch periodical, not an ingest gate).
    */
  def attritionIngestOracleSql(lang: String = "en",
                               minScore: Double = 0.3): String =
    s"""WITH ${attritionFlaggedCtes(lang, minScore)}
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(pass_lang) AS BIGINT) AS n_lang,
       |  CAST(sum(pass_qual) AS BIGINT) AS n_quality,
       |  CAST(sum(CASE WHEN f.doc_id IN (SELECT doc_id FROM canon)
       |    THEN pass_qual ELSE 0 END) AS BIGINT) AS n_exact_canon
       |FROM flagged f
       |GROUP BY source ORDER BY source""".stripMargin

  /** E44 oracle: the E12/E16 CTE chain, rolled up per stage. */
  def pipelineAttritionReportOracleSql(lang: String = "en",
                                       minScore: Double = 0.3): String =
    s"""WITH RECURSIVE ${attritionFlaggedCtes(lang, minScore)},
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2] for i in range(1, len(ws)-1)]) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |prs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
       |    AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
       |        (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= ${Dedup.JaccardThreshold}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
       |          UNION ALL SELECT doc_b, doc_a FROM prs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |noncanon AS (
       |  SELECT src AS doc_id FROM reach GROUP BY src
       |  HAVING least(src, min(dst)) <> src)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(pass_lang) AS BIGINT) AS n_lang,
       |  CAST(sum(pass_qual) AS BIGINT) AS n_quality,
       |  CAST(sum(CASE WHEN f.doc_id IN (SELECT doc_id FROM canon)
       |    THEN pass_qual ELSE 0 END) AS BIGINT) AS n_exact_canon,
       |  CAST(sum(CASE WHEN f.doc_id IN (SELECT doc_id FROM canon)
       |    AND f.doc_id NOT IN (SELECT doc_id FROM noncanon)
       |    THEN pass_qual ELSE 0 END) AS BIGINT) AS n_survivors
       |FROM flagged f
       |GROUP BY source ORDER BY source""".stripMargin

  /** The shared E16-oracle CTE chain (clean gate, exact canon, the
    * E13 recursive closure through `reach`) — the two survivor rules
    * (min-id / E57 quality) append their own noncanon + final, so
    * they can only differ on the canonical column, exactly like the
    * engine's [[dedupSurvivorsOn]] seam.
    */
  private def pipelineDedupCtes(lang: String, minScore: Double): String =
    s"""lang_pred AS (${langIdOracleSql}),
       |qual AS (${qualityScoreOracleSql}),
       |clean AS (
       |  SELECT d.doc_id, d.source, d.text
       |  FROM documents d
       |  JOIN lang_pred ON d.doc_id = lang_pred.doc_id
       |  JOIN qual ON d.doc_id = qual.doc_id
       |  WHERE lang_pred.predicted = '$lang' AND qual.score >= $minScore),
       |canon AS (
       |  SELECT min(doc_id) AS doc_id FROM clean GROUP BY md5(text)),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2] for i in range(1, len(ws)-1)]) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |prs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
       |    AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
       |        (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= ${Dedup.JaccardThreshold}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM prs
       |          UNION ALL SELECT doc_b, doc_a FROM prs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)""".stripMargin

  /** Oracle: the E12 CTE chain plus the E13 recursive-CTE closure; the
    * survivor rule is identical (exact canon ∧ not a non-canonical
    * component member).
    */
  def pipelineDedupCorpusOracleSql(lang: String = "en",
                                   minScore: Double = 0.3): String =
    s"""WITH RECURSIVE ${pipelineDedupCtes(lang, minScore)},
       |noncanon AS (
       |  SELECT src AS doc_id FROM reach GROUP BY src
       |  HAVING least(src, min(dst)) <> src)
       |SELECT source, count(*) AS n_docs_clean
       |FROM clean JOIN canon USING (doc_id)
       |WHERE doc_id NOT IN (SELECT doc_id FROM noncanon)
       |GROUP BY source ORDER BY source""".stripMargin

  /** E59 oracle: the SAME chain; the near-dup canonical is the E57
    * (score DESC, doc_id) argmax per component instead of min-id —
    * one rule swap, nothing else re-derived.
    */
  def pipelineDedupCorpusQualityOracleSql(lang: String = "en",
                                          minScore: Double = 0.3): String =
    s"""WITH RECURSIVE ${pipelineDedupCtes(lang, minScore)},
       |cmp AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS component_id
       |  FROM reach GROUP BY src),
       |qc AS (
       |  SELECT c.component_id, c.doc_id AS canon_quality_id
       |  FROM cmp c JOIN qual q ON q.doc_id = c.doc_id
       |  QUALIFY row_number() OVER (PARTITION BY c.component_id
       |    ORDER BY q.score DESC, c.doc_id) = 1),
       |noncanonq AS (
       |  SELECT c.doc_id FROM cmp c
       |  JOIN qc ON qc.component_id = c.component_id
       |  WHERE c.doc_id <> qc.canon_quality_id)
       |SELECT source, count(*) AS n_docs_clean
       |FROM clean JOIN canon USING (doc_id)
       |WHERE doc_id NOT IN (SELECT doc_id FROM noncanonq)
       |GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- E10

  /** E10: positional rolling-hash fingerprint:
    * sum over words of (md5-derived 60-bit word hash mod 2^31-1) * (1-based
    * position), mod 2^60. Order-sensitive (unlike a bag-of-words hash)
    * and engine-portable (md5 prefix → integer is exact in both).
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .select(col("doc_id"),
        ((conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long") % 2147483647L)
          * (col("pos") + 1)).as("contrib"))
      .groupBy("doc_id")
      .agg((sum(col("contrib")) % 1152921504606846976L).as("fp"))
      .orderBy("doc_id")

  def docFingerprintOracleSql: String =
    """SELECT doc_id,
      |  CAST(sum((CAST(('0x'||substr(md5(w),1,15)) AS BIGINT) % 2147483647) * i) % 1152921504606846976 AS BIGINT) AS fp
      |FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- E14

  /** Knuth multiplicative constant for the deterministic sampler. */
  val SampleHashMult = 2654435761L
  /** Length-band width (words) and the per-band keep rates out of 1000:
    * longer documents (the scarcer, information-denser stratum in a web
    * corpus) keep a larger share — the standard quality-weighted
    * downsampling move when shrinking a pretraining mix.
    */
  val SampleBandWords = 50L
  val SampleRatePerBand = 150L // rate(band) = (band+1)·150 ‰, bands 0..3

  /** E14: deterministic stratified downsampling — every training-data
    * pipeline's "take X% of the corpus, reproducibly" step. Strata are
    * integer length bands (floor(n_words/50) capped at 3, a quality
    * proxy in exact integer arithmetic — no float threshold can
    * disagree between engines); membership is content-independent
    * arithmetic on the key, (doc_id·2654435761) mod 1000 < rate(band),
    * so the SAME docs are kept on every run, on any cluster, at any
    * partitioning — unlike rand()-based sample(), which changes under
    * retries and repartitioning. Scale shape: a pure codegen'd scan
    * filter, zero shuffles (the ORDER BY is presentation only).
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        least(floor(size(words) / lit(SampleBandWords.toDouble)), lit(3L))
          .cast("long").as("band"))
      .filter(pmod(col("doc_id") * SampleHashMult, lit(1000L)) <
        (col("band") + 1L) * SampleRatePerBand)
      .orderBy("doc_id")
  }

  def sampleStratifiedOracleSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, source,
       |    CAST(least(len(string_split_regex(trim(text), '\\s+')) // $SampleBandWords, 3) AS BIGINT) AS band
       |  FROM documents)
       |SELECT doc_id, source, band FROM f
       |WHERE (doc_id * $SampleHashMult) % 1000 < (band + 1) * $SampleRatePerBand
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- E15

  /** Tokens per shard for the packing demo (≈ a few docs per shard at
    * test SFs; a real run packs 4k-32k-token training sequences).
    */
  val ShardTokenBudget = 2000L

  /** E15: token-budget shard packing — assign doc_id-ordered documents
    * to contiguous shards of ~budget whitespace tokens each (the
    * "split the corpus into training-sequence shards" step).
    * shard_id = floor(prior_cumulative_tokens / budget).
    *
    * A global running sum is the textbook distributed prefix-sum, NOT a
    * single-partition window (which serializes the corpus through one
    * task and dies at 100 TB): documents bucket into FIXED-WIDTH id
    * ranges (deterministic, unlike sampled range partitioning), stage 1
    * aggregates one token sum per bucket (a bounded driver collect —
    * one row per bucket), stage 2 computes the within-bucket running
    * sum with a window PARTITIONED by bucket (parallel) plus the
    * driver-side prefix offset of all earlier buckets, broadcast back
    * as a tiny join. Two scans, no global sort.
    */
  def packTokenShards(spark: SparkSession, dir: String,
                      budget: Long = ShardTokenBudget): DataFrame = {
    import spark.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val maxId = toks.agg(max("doc_id")).head().getLong(0)
    val width = math.max(1L, maxId / 32L + 1L)
    val bucketed = toks.withColumn("bucket", expr(s"doc_id DIV $width"))
    // stage 1: ≤ 33 per-bucket sums to the driver; exclusive prefix
    val sums = bucketed.groupBy("bucket").agg(sum("n_tokens").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (b, s) => val row = (b, acc); acc += s; row }
    // stage 2: parallel per-bucket running sum + broadcast offset join
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsets.toSeq.toDF("bucket", "offset")), "bucket")
      .withColumn("prior",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + col("offset"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"prior DIV $budget").as("shard_id"))
      .orderBy("doc_id")
  }

  /** Oracle: the same assignment via a global window cumsum — correct
    * SQL that DuckDB runs fine at oracle scale, and exactly the
    * single-partition shape the Spark side exists to avoid.
    */
  def packTokenShardsOracleSql(budget: Long = ShardTokenBudget): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM t)
       |SELECT doc_id, n_tokens, CAST(prior // $budget AS BIGINT) AS shard_id
       |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- E31

  /** E31: temperature-based language rebalancing — the multilingual
    * mixture-construction step (the mBERT/XLM-R exponential-smoothing
    * recipe, and the Pile's per-source weighting): the natural corpus
    * is ~40% English, and training on the natural distribution starves
    * low-resource languages, so the kept mixture samples language l
    * proportionally to n_l^(1/2) instead of n_l — sub-linear scaling
    * upweights small languages relative to their natural share. Keep
    * budget = half the corpus; per-language target =
    * min(n_l, (N div 2)·isqrt(n_l) div Σ isqrt) — never oversamples
    * (subsample-only, no repetition), all-integer once the isqrt
    * floors land.
    *
    * Cross-engine exactness: isqrt = floor(sqrt(n)) over IEEE doubles —
    * the ONE double op, identical in both engines for any n ≤ ~10¹²
    * (sqrt is correctly rounded; the floor can only disagree within
    * 2⁻²⁷ of a perfect square, unreachable below that bound); every
    * other step is BIGINT. Doc selection is the deterministic
    * multiplicative-hash rank WITHIN language (same content-keyed
    * contract as E14: stable under retries and repartitioning, no
    * rand()), so the kept set is reproducible anywhere.
    *
    * Scale shape: one map-side-combined count aggregate (5 rows), the
    * target table broadcast back, one rank window partitioned by lang.
    * The per-language window is the honest exact-target cost (same
    * 5-way-parallelism contract as E30/C20); the 100 TB twin trades
    * exact targets for a per-language hash THRESHOLD filter (pure scan,
    * no window) at ±√n count jitter. (N div 2)·isqrt needs DECIMAL
    * staging past ~10¹² docs per language, noted like E29.
    */
  def mixLangsTemperature(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val weights = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .select(col("lang"), col("n"),
        floor(sqrt(col("n").cast("double"))).cast("long").as("sq"))
    val tot = weights.agg(sum("sq").as("tot"), sum("n").as("big_n"))
    val targets = weights.crossJoin(tot)
      .select(col("lang"),
        least(col("n"), expr("(big_n div 2) * sq div tot")).as("target"))
    val w = Window.partitionBy("lang")
      .orderBy(pmod(col("doc_id") * SampleHashMult, lit(100003L)), col("doc_id"))
    docs.withColumn("rk", row_number().over(w))
      .join(broadcast(targets), "lang")
      .filter(col("rk") <= col("target"))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  def mixLangsTemperatureOracleSql: String =
    s"""WITH d AS (SELECT doc_id, lang FROM documents),
       |s AS (SELECT lang, count(*) AS n FROM d GROUP BY 1),
       |w AS (SELECT lang, n, CAST(floor(sqrt(n)) AS BIGINT) AS sq FROM s),
       |t AS (SELECT lang,
       |        least(n, ((SELECT sum(n) FROM w) // 2) * sq // (SELECT sum(sq) FROM w)) AS target
       |      FROM w),
       |r AS (SELECT doc_id, lang,
       |        row_number() OVER (PARTITION BY lang
       |          ORDER BY (doc_id * $SampleHashMult) % 100003, doc_id) AS rk
       |      FROM d)
       |SELECT r.doc_id, r.lang FROM r JOIN t USING (lang)
       |WHERE rk <= target ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- E46

  /** E46: the token-budget PLAN table — the "how many epochs of each
    * source at this budget" sheet every pretraining run publishes
    * (LLaMA Table 1, the Pile §2's per-set epochs): redistribute the
    * corpus's own total token count across sources under temperature
    * n^(1/2) weights (E31's flattening, applied to TOKEN mass), and
    * report each source's natural share, planned share, and the
    * resulting repeat factor. epochs_permille > 1000 means the source
    * is upsampled/repeated at training time (small curated sources),
    * < 1000 means subsampled (the bulk crawl) — the table is the
    * mixture DECISION artifact, upstream of E14/E31's selection and
    * E40's ordering.
    *
    * All-integer after the one isqrt floor (E31's cross-engine
    * contract): weight = sq·1000 div Σsq, planned = budget·sq div Σsq,
    * epochs = planned·1000 div n_tokens. budget·sq stays inside BIGINT
    * to ~10¹² tokens × 10⁶ isqrt — past that the product needs DECIMAL
    * staging (the E29/E31 note). Scale shape: one map-side-combined
    * per-source aggregate off ONE corpus scan, then totals via a
    * whole-frame window over the catalog-sized result (bounded rows —
    * a separate agg + cross join would recompute the subtree and scan
    * the corpus twice); zero joins on data rows.
    */
  def tokenBudgetPlan(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        floor(sqrt(col("n_tokens").cast("double"))).cast("long").as("sq"))
    // totals via a whole-frame window over the CATALOG-sized aggregate
    // (bounded rows, one task over ≤ |sources|): a separate totals agg
    // + cross join would recompute the subtree and bill the corpus
    // scan twice (PlanSpec pins the single scan)
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    perSource
      .withColumn("tot_sq", sum(col("sq")).over(whole))
      .withColumn("budget", sum(col("n_tokens")).over(whole))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("sq * 1000 div tot_sq").as("weight_permille"),
        expr("budget * sq div tot_sq").as("planned_tokens"),
        expr("(budget * sq div tot_sq) * 1000 div n_tokens").as("epochs_permille"))
      .orderBy("source")
  }

  def tokenBudgetPlanOracleSql: String =
    """WITH s AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |w AS (SELECT source, n_docs, n_tokens,
      |        CAST(floor(sqrt(n_tokens)) AS BIGINT) AS sq FROM s),
      |t AS (SELECT CAST(sum(sq) AS BIGINT) AS tot_sq,
      |             CAST(sum(n_tokens) AS BIGINT) AS budget FROM w)
      |SELECT source, n_docs, n_tokens,
      |  CAST(sq * 1000 // tot_sq AS BIGINT) AS weight_permille,
      |  CAST(budget * sq // tot_sq AS BIGINT) AS planned_tokens,
      |  CAST((budget * sq // tot_sq) * 1000 // n_tokens AS BIGINT) AS epochs_permille
      |FROM w, t ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- E40

  /** E40: deterministic training-order interleave — the data-ORDERING
    * stage after selection/dedup/packing: sources are interleaved by
    * stride scheduling (weighted fair queueing: doc r of source s runs
    * at virtual time r/weight_s, weight_s = √n_s — the same
    * temperature-0.5 flattening as E31, applied to ORDER instead of
    * counts), so a small curated source spreads evenly through the
    * epoch instead of clumping at one offset, and the schedule is a
    * pure function of the corpus (reproducible run to run — the
    * training-data provenance contract).
    *
    * Scale shape: the global position is NOT a single-partition
    * window — rows repartitionByRange + sortWithinPartitions on the
    * (unique) schedule key, then zipWithIndex assigns contiguous ranks
    * with one extra count job (the two-pass offset pattern; the only
    * RDD use in the library, exactly the "genuine per-partition
    * imperative logic" carve-out). The per-source sequence numbers
    * come from Ranks.groupedRowNumber — the E15 two-pass prefix-sum,
    * NOT a source-partitioned window, so a source holding 90% of the
    * corpus ranks across `buckets` parallel tasks instead of one
    * straggler (the round-7 skew caveat, closed).
    *
    * Cross-engine exactness: vtime = r/√n_s with both the sqrt and
    * the division correctly rounded IEEE doubles in both engines, and
    * (vtime, source, doc_id) is a STRICT total order (doc_id unique),
    * so the zipWithIndex rank equals the oracle's row_number.
    */
  def mixScheduleInterleave(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val keyed = Ranks
      .groupedRowNumber(docs, "source", "doc_id", descending = false,
        tieCol = "doc_id")
      .select(col("doc_id"), col("source"),
        (col("rn").cast("double") / sqrt(col("grp_n").cast("double")))
          .as("vtime"))
    val sorted = keyed
      .repartitionByRange(col("vtime"), col("source"), col("doc_id"))
      .sortWithinPartitions(col("vtime"), col("source"), col("doc_id"))
    sorted.as[(Long, String, Double)].rdd.zipWithIndex()
      .map { case ((id, src, _), i) => (id, src, i + 1L) }
      .toDF("doc_id", "source", "position")
      .orderBy("position")
  }

  def mixScheduleInterleaveOracleSql: String =
    """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src
      |           FROM documents GROUP BY 1),
      |k AS (
      |  SELECT d.doc_id, d.source,
      |    CAST(row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS DOUBLE)
      |      / sqrt(CAST(c.n_src AS DOUBLE)) AS vtime
      |  FROM documents d JOIN c USING (source))
      |SELECT doc_id, source,
      |  CAST(row_number() OVER (ORDER BY vtime, source, doc_id) AS BIGINT) AS position
      |FROM k ORDER BY position""".stripMargin

  // ---------------------------------------------------------------- E36

  /** E36: model-based quality classification — the "fasttext quality
    * classifier" stage of the published pretraining recipes (LLaMA's
    * Wikipedia-reference classifier, GPT-3's WebText LR filter), as a
    * LINEAR model over engineered features with fixed weights: unlike
    * E8's hand-tuned composite score, this is the learned-model SHAPE —
    * a feature vector dotted with a weight vector and thresholded at
    * the decision boundary — with the weights standing in for a
    * trained model (the sigmoid is monotone, so thresholding the logit
    * at 0 IS thresholding the probability at 0.5; no exp() enters the
    * comparison).
    *
    * Everything is per-row column arithmetic fused into one codegen'd
    * document scan — zero shuffles at any corpus size; the feature
    * bases are exact integers (counts of words/digit/punct/upper
    * chars), the logit is a FIXED-ORDER double expression mirrored
    * op-for-op by the oracle, and the output quantizes via floor
    * (half-mode-free) so both engines emit identical BIGINTs.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityClassifierOn(Tables.documents(spark, dir)).orderBy("doc_id")

  /** E36 over an arbitrary (doc_id, source, text) frame — stateless
    * per-row arithmetic, so it applies unchanged to a STREAMING frame
    * (D11 runs it per micro-batch).
    */
  def qualityClassifierOn(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val words = split(trim(col("text")), "\\s+")
    val carried = carry.map(col)
    docs
      .select(Seq(col("doc_id"), col("source"),
        greatest(size(words).cast("long"), lit(1L)).as("n_words"),
        greatest(length(col("text")).cast("long"), lit(1L)).as("n_chars"),
        aggregate(words, lit(0L), (acc, w) => acc + length(w)).as("sum_wlen"),
        hits(split(lower(col("text")), " "), "en").cast("long").as("stop_hits"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("n_digit"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("long").as("n_punct"),
        (length(col("text")) - length(regexp_replace(col("text"), "[A-Z]", "")))
          .cast("long").as("n_upper"))
        ++ carried: _*)
      .select(Seq(col("doc_id"), col("source"),
        floor((lit(-0.65)
          + lit(0.9) * least(col("n_words").cast("double") / 400.0, lit(1.0))
          + lit(0.8) * (col("stop_hits").cast("double") / col("n_words"))
          + lit(0.6) * least(col("sum_wlen").cast("double") / col("n_words") / 6.0, lit(1.0))
          - lit(1.5) * (col("n_digit").cast("double") / col("n_chars"))
          - lit(0.7) * (col("n_punct").cast("double") / col("n_chars"))
          - lit(0.5) * (col("n_upper").cast("double") / col("n_chars"))
          ) * 1e6).cast("long").as("score_q"))
        ++ carried: _*)
      .select(Seq(col("doc_id"), col("source"), col("score_q"),
        (col("score_q") >= 0L).cast("long").as("kept"))
        ++ carried: _*)
  }

  /** Shared feats + scored CTEs of the E36 oracle (also the base of
    * D11's rollup oracle).
    */
  private def qcScoredCtes: String = {
    val stops = Stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""feats AS (
      |  SELECT doc_id, source,
      |    greatest(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT), 1) AS n_words,
      |    greatest(CAST(length(text) AS BIGINT), 1) AS n_chars,
      |    CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'), w -> length(w))) AS BIGINT) AS sum_wlen,
      |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN ($stops))) AS BIGINT) AS stop_hits,
      |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
      |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
      |    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id, source,
      |    CAST(floor((-0.65
      |      + 0.9 * least(CAST(n_words AS DOUBLE) / 400.0, 1.0)
      |      + 0.8 * (CAST(stop_hits AS DOUBLE) / n_words)
      |      + 0.6 * least(CAST(sum_wlen AS DOUBLE) / n_words / 6.0, 1.0)
      |      - 1.5 * (CAST(n_digit AS DOUBLE) / n_chars)
      |      - 0.7 * (CAST(n_punct AS DOUBLE) / n_chars)
      |      - 0.5 * (CAST(n_upper AS DOUBLE) / n_chars)
      |      ) * 1e6) AS BIGINT) AS score_q
      |  FROM feats)""".stripMargin
  }

  def qualityClassifierOracleSql: String =
    s"""WITH $qcScoredCtes
       |SELECT doc_id, source, score_q,
       |  CAST(score_q >= 0 AS BIGINT) AS kept
       |FROM scored ORDER BY doc_id""".stripMargin

  /** D11 oracle: the same classifier rolled up per source. */
  def qualityClassifierRollupOracleSql: String =
    s"""WITH $qcScoredCtes
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CAST(score_q >= 0 AS BIGINT)) AS BIGINT) AS n_kept
       |FROM scored GROUP BY 1 ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- E39

  /** E39: the dataset card — per-source corpus report every release
    * ships (doc counts, token volume + exact p50/p95 length, language
    * mix, quality-gate admission). ONE fused document scan: language ID
    * (E7's argmax chain, carried through langIdOn) and the E36
    * classifier (carried through qualityClassifierOn) are per-row
    * expressions chained over the same scan — no self-join of derived
    * frames. The percentiles are exact via the HISTOGRAM formulation,
    * not a corpus-sized rank window: one map-side-combined aggregation
    * to (source, n_tokens) rows (token counts have bounded
    * cardinality, so the histogram is tiny regardless of corpus size),
    * then the running-count window and the final rollup run over
    * histogram rows only. A rank window partitioned by source would
    * put a hot source's entire row set in one task at 100 TB; the
    * histogram shape has no such straggler. Value-at-rank equivalence:
    * the value at rank ceil(p·n/100) is the smallest distinct value
    * whose cumulative count reaches that rank. Every output is an
    * exact BIGINT, so cross-engine hashing is trivial.
    *
    * Round 8 extends the card with the CCNet resample outcome: per
    * source, how many docs the E41 graded resample KEEPS from each
    * perplexity tertile (head is kept whole by construction, so
    * n_ppl_head doubles as the tertile size; middle/tail reflect the
    * 50%/10% hash sample on this corpus). Oracle-backed — the E41
    * oracle nests as a derived table. The learned-tokenizer volume
    * lives in the separate rows-only card key (corpus_profile_bpe):
    * BPE counts ride the iterative merge loop no SQL replays, and
    * folding them in here would demote the card's EXACT columns from
    * the hash gate to a rows-only check.
    */
  def corpusProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // rebalanced: the langId/quality scoring chain is narrow CPU work
    // that otherwise serializes on the single-row-group test scan
    val docs = Tables.rebalanced(Tables.documents(spark, dir))
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")).cast("long"))
    val perDoc = qualityClassifierOn(
      langIdOn(docs, carry = Seq(col("source"), col("text"), col("n_tokens")))
        .select("doc_id", "source", "text", "n_tokens", "predicted"),
      carry = Seq("predicted", "n_tokens"))
    val hist = perDoc.groupBy(col("source"), col("n_tokens"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("predicted") === "en", lit(1L)).otherwise(lit(0L))).as("cnt_en"),
        sum(col("kept")).as("cnt_kept"))
    val wh = Window.partitionBy(col("source")).orderBy(col("n_tokens"))
    val whn = wh.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ppl = Corpus.perplexityBuckets(spark, dir)
      .groupBy(col("source"))
      .agg(
        sum(when(col("bucket") === "head", col("kept")).otherwise(lit(0L)))
          .as("n_ppl_head"),
        sum(when(col("bucket") === "middle", col("kept")).otherwise(lit(0L)))
          .as("n_ppl_middle"),
        sum(when(col("bucket") === "tail", col("kept")).otherwise(lit(0L)))
          .as("n_ppl_tail"))
    hist
      .select(col("source"), col("n_tokens"), col("cnt"), col("cnt_en"), col("cnt_kept"),
        sum(col("cnt")).over(wh).as("cum"), sum(col("cnt")).over(whn).as("n"))
      .groupBy(col("source"))
      .agg(
        sum(col("cnt")).as("n_docs"),
        sum(col("n_tokens") * col("cnt")).as("sum_tokens"),
        min(when(col("cum") >= expr("(50 * n + 99) div 100"), col("n_tokens"))).as("p50_tokens"),
        min(when(col("cum") >= expr("(95 * n + 99) div 100"), col("n_tokens"))).as("p95_tokens"),
        sum(col("cnt_en")).as("n_en"),
        sum(col("cnt_kept")).as("n_kept"))
      // LEFT join + zero-fill: a source whose every doc lacks bigrams
      // (≤ 1 word) has no E41 rows at all, and an inner join would
      // silently drop its ENTIRE card row — the card reports every
      // source, with an empty resample outcome where none exists.
      // Explicit broadcast: the rollup is ≤ sources rows but derives
      // from a checkpoint (no stats), so AQE would otherwise plan a
      // corpus-shuffling SortMergeJoin to meet a 20-row table
      .join(broadcast(ppl), Seq("source"), "left")
      .withColumn("n_ppl_head", coalesce(col("n_ppl_head"), lit(0L)))
      .withColumn("n_ppl_middle", coalesce(col("n_ppl_middle"), lit(0L)))
      .withColumn("n_ppl_tail", coalesce(col("n_ppl_tail"), lit(0L)))
      .orderBy("source")
  }

  def corpusProfileOracleSql: String = {
    def h(l: String) =
      Stopwords(l).map(w => s"'$w'").mkString(
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN (", ", ", s"))) AS INT)")
    s"""WITH $qcScoredCtes,
       |lcounts AS (
       |  SELECT doc_id,
       |    ${h("de")} AS c_de, ${h("en")} AS c_en, ${h("es")} AS c_es,
       |    ${h("fr")} AS c_fr, ${h("zh")} AS c_zh
       |  FROM documents),
       |lang AS (
       |  SELECT doc_id,
       |    CASE WHEN c_de + c_en + c_es + c_fr + c_zh = 0 THEN 'und'
       |         WHEN c_de >= greatest(c_en, c_es, c_fr, c_zh) THEN 'de'
       |         WHEN c_en >= greatest(c_es, c_fr, c_zh) THEN 'en'
       |         WHEN c_es >= greatest(c_fr, c_zh) THEN 'es'
       |         WHEN c_fr >= c_zh THEN 'fr'
       |         ELSE 'zh' END AS predicted
       |  FROM lcounts),
       |base AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents d),
       |win AS (
       |  SELECT b.source, b.n_tokens, l.predicted,
       |    CAST(s.score_q >= 0 AS BIGINT) AS kept,
       |    row_number() OVER (PARTITION BY b.source ORDER BY b.n_tokens) AS rn,
       |    count(*) OVER (PARTITION BY b.source) AS n
       |  FROM base b JOIN lang l USING (doc_id) JOIN scored s USING (doc_id)),
       |ppl AS (
       |  SELECT source,
       |    CAST(sum(CASE WHEN bucket = 'head' THEN kept ELSE 0 END) AS BIGINT) AS n_ppl_head,
       |    CAST(sum(CASE WHEN bucket = 'middle' THEN kept ELSE 0 END) AS BIGINT) AS n_ppl_middle,
       |    CAST(sum(CASE WHEN bucket = 'tail' THEN kept ELSE 0 END) AS BIGINT) AS n_ppl_tail
       |  FROM (
       |${Corpus.perplexityBucketsOracleSql}
       |  ) pb GROUP BY source)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(max(CASE WHEN rn = (50*n + 99) // 100 THEN n_tokens END) AS BIGINT) AS p50_tokens,
       |  CAST(max(CASE WHEN rn = (95*n + 99) // 100 THEN n_tokens END) AS BIGINT) AS p95_tokens,
       |  CAST(sum(CASE WHEN predicted = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       |  CAST(sum(kept) AS BIGINT) AS n_kept,
       |  CAST(coalesce(max(n_ppl_head), 0) AS BIGINT) AS n_ppl_head,
       |  CAST(coalesce(max(n_ppl_middle), 0) AS BIGINT) AS n_ppl_middle,
       |  CAST(coalesce(max(n_ppl_tail), 0) AS BIGINT) AS n_ppl_tail
       |FROM win LEFT JOIN ppl USING (source)
       |GROUP BY source ORDER BY source""".stripMargin
  }
}
