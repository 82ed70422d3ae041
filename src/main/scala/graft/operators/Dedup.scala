package graft.operators

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E-series deduplication + similarity search over the documents and
  * embeddings corpora — the operators a 100 TB training-data pipeline
  * runs constantly.
  *
  * Scale shapes (SURVEY §5):
  *   - exact dedup: one hash-groupBy shuffle of (hash, doc_id) pairs.
  *   - n-gram Jaccard: inverted-index join — explode distinct shingles,
  *     self-join on shingle, count shared shingles per pair. The shuffle
  *     is O(docs × shingles), never O(docs²); only pairs sharing ≥1
  *     shingle are ever materialized.
  *   - MinHash-LSH: 128 minhashes → 32 bands of 4 → bucket join, then
  *     exact verification of candidates only. Shuffle is O(docs × bands)
  *     small ints. Precision 1.0 by construction (candidates re-checked
  *     exactly); recall at j=0.8 is 1-(1-0.8^4)^32 ≈ 0.9999.
  *   - SimHash: 64-bit signature, hamming ≤ 3 found via 4×16-bit band
  *     buckets (pigeonhole: ≤3 differing bits ⇒ ≥1 band identical).
  *   - embedding near-dup / batch ANN: brute force here (exact
  *     baseline); the IVF path (operators/Ivf.scala) is the
  *     at-scale approximate variant.
  */
object Dedup {

  // ---------------------------------------------------------------- E1

  /** E1: exact dedup by content hash: canonical doc = min doc_id. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc_id"))
      .orderBy("canonical_doc_id")

  def dedupExactOracleSql: String =
    """SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
      |FROM documents GROUP BY 1 ORDER BY canonical_doc_id""".stripMargin

  // ---------------------------------------------------------------- E2

  val JaccardThreshold = 0.8

  /** Distinct word 3-gram shingles of a text column. */
  def shingles(text: Column): Column = {
    val ws = split(text, " ")
    when(size(ws) >= 3,
      array_distinct(transform(sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** doc_id → distinct shingle set, as (doc_id, shingle) rows + sizes. */
  private def shingleRows(docs: DataFrame): (DataFrame, DataFrame) = {
    val sets = docs.select(col("doc_id"), shingles(col("text")).as("g"))
    val rows = sets.select(col("doc_id"), explode(col("g")).as("shingle"))
    val sizes = sets.select(col("doc_id"), size(col("g")).cast("long").as("sz"))
    (rows, sizes)
  }

  /** E2: exact 3-gram Jaccard ≥ 0.8 pairs via inverted-index join:
    * |A∩B| = count of co-occurring shingles, |A∪B| = |A|+|B|-|A∩B|.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val (rows, sizes) = shingleRows(Tables.documents(spark, dir))
    val inter = rows.as("a")
      .join(rows.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB oracle uses the independent all-pairs list-intersect
    * formulation (different algorithm, same answer).
    */
  def ngramJaccardOracleSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    list_distinct([ws[i]||' '||ws[i+1]||' '||ws[i+2] for i in range(1, len(ws)-1)]) AS g
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
       |      (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jaccard
       |  FROM sh a, sh b WHERE a.doc_id < b.doc_id) t
       |WHERE jaccard >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- E3

  val MinhashPerms = 128
  val LshBands = 32
  val LshRows = 4 // MinhashPerms / LshBands
  private val MersennePrime = 2147483647L // 2^31-1; a*x+b stays < 2^63

  /** Seeded permutation parameters (deterministic across runs). */
  private lazy val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(MinhashPerms)(1L + rnd.nextInt(Int.MaxValue - 1)),
     Array.fill(MinhashPerms)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** doc_id → 128 minhashes over xxhash64 shingle hashes. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val sets = docs.select(col("doc_id"), shingles(col("text")).as("g"))
      .filter(size(col("g")) > 0)
      .select(col("doc_id"),
        transform(col("g"), s => pmod(xxhash64(s), lit(MersennePrime))).as("hs"),
        col("g"))
    val mhCols = (0 until MinhashPerms).map { j =>
      array_min(transform(col("hs"),
        x => pmod(lit(permA(j)) * x + lit(permB(j)), lit(MersennePrime))))
    }
    sets.select(col("doc_id"), col("g"), array(mhCols: _*).as("mh"))
  }

  /** E3: MinHash-LSH near-dup pairs: band-bucket join proposes
    * candidates, exact Jaccard verifies them — same output contract as
    * E2, approximate recall, at O(docs × bands) shuffle cost.
    * Rows-only for the driver; DedupSpec asserts recall vs E2.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(Tables.documents(spark, dir))
    val bandCols = (0 until LshBands).map { k =>
      struct(lit(k).as("band_id"),
        xxhash64((k * LshRows until (k + 1) * LshRows)
          .map(j => element_at(col("mh"), j + 1)): _*).as("band_hash"))
    }
    val buckets = sig
      .select(col("doc_id"), col("g"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("g"), col("band.band_id"), col("band.band_hash"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.g").as("ga"), col("b.g").as("gb"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          (size(col("ga")) + size(col("gb")) -
            size(array_intersect(col("ga"), col("gb"))))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy("doc_a", "doc_b")
  }

  // ---------------------------------------------------------------- E4

  val SimhashBits = 64
  val SimhashBands = 4
  val HammingMax = 3

  /** doc_id → 64-bit simhash over word xxhash64s: bit i is the sign of
    * the sum of ±1 votes from each word's bit i.
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val whs = docs
      .select(col("doc_id"),
        transform(split(col("text"), " "), w => xxhash64(w)).as("whs"))
      .filter(size(col("whs")) > 0)
    val bitCols = (0 until SimhashBits).map { i =>
      val votes = aggregate(col("whs"), lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L)).otherwise(lit(0L))
    }
    // assemble the signature: sum of bit_i << i (bit 63 may set the sign)
    whs.select(col("doc_id"),
      bitCols.zipWithIndex.map { case (b, i) => shiftleft(b, i) }
        .reduce(_.bitwiseXOR(_)).as("simhash"))
  }

  /** E4: simhash near-dup pairs at hamming distance ≤ 3, via 4×16-bit
    * band buckets (pigeonhole guarantees a shared band) + exact hamming
    * verification with bit_count(xor). Rows-only; DedupSpec checks it.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashSignatures(Tables.documents(spark, dir))
    val bandCols = (0 until SimhashBands).map { k =>
      struct(lit(k).as("band_id"),
        shiftright(col("simhash"), k * 16).bitwiseAND(0xFFFFL).as("band_bits"))
    }
    val buckets = sig.select(col("doc_id"), col("simhash"),
      explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("simhash"), col("band.band_id"), col("band.band_bits"))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_bits") === col("b.band_bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= HammingMax)
      .orderBy("doc_a", "doc_b")
  }

  // ---------------------------------------------------------------- E5

  val CosineSimThreshold = 0.4

  /** E5: embedding near-dup pairs: cosine similarity ≥ 0.4 self-join.
    * Exact baseline — the corpus side is broadcast once and each
    * partition scans its slice against it; the LSH/IVF path replaces
    * this at corpus sizes where O(N²/executors) stops being viable.
    */
  def embeddingNeardup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val sim = lit(1.0) - VectorFunctions.cosineDistance(col("a.embedding"), col("b.embedding"))
    e.as("a").join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), sim.as("sim"))
      .filter(col("sim") >= CosineSimThreshold)
      .select("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }

  def embeddingNeardupOracleSql: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id
       |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= $CosineSimThreshold
       |ORDER BY vec_a, vec_b""".stripMargin

  // ---------------------------------------------------------------- E6

  /** E6: batch ANN — every vector's top-5 cosine neighbors (self
    * excluded). Same bounded-top-k shape as Knn: per-partition partial
    * top-k, tiny shuffle, no global sort.
    */
  def annTopkBatch(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("vec"))
    Knn.knn(queries, corpus, k, graft.functions.VectorMetric.Cosine,
      pairFilter = col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  def annTopkBatchOracleSql(k: Int = 5): String =
    s"""SELECT query_id, neighbor_id, rank FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
       |  FROM embeddings q, embeddings c WHERE q.vec_id <> c.vec_id) t
       |WHERE rank <= $k
       |ORDER BY query_id, rank""".stripMargin
}
