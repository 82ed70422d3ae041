package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** E11: multimodal columns — image/audio/video payloads carried as
  * opaque binary columns with typed metadata, plus a batched
  * decode/feature-extract stage.
  *
  * The codec libraries are absent in this environment, so `decode` is a
  * DETERMINISTIC STUB (header-derived fake dimensions); everything
  * around it — the binary column, the metadata schema, the partition-
  * preserving batched map, the feature schema — is the real plumbing a
  * production pipeline would keep, with only the stub body swapped for
  * a real codec call.
  *
  * Scale notes: payloads never leave their scan partition (narrow map,
  * no shuffle); the batched decoder processes a whole partition
  * iterator at a time, which is where a real implementation amortizes
  * codec/model setup per-partition (the JVM analog of a Pandas-UDF
  * batch). Metadata extraction is pure Catalyst built-ins over the
  * binary column, so it codegens into the scan.
  */
object Multimodal {

  /** documents.text encoded as a binary payload column + media-type tag —
    * the ingest shape for opaque media blobs.
    */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables.rebalanced(Tables.documents(spark, dir)).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 3).cast("int").as("media_kind") // 0=image 1=audio 2=video
    )

  /** E11 driver query: typed metadata extracted from the binary payload
    * in-plan: byte length, 4-byte header hex, a 16-byte prefix checksum,
    * and stub-decoded dimensions derived from them.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .select(col("doc_id"), col("media_kind"), col("payload"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        lower(hex(substring(col("payload"), 1, 4))).as("header_hex"),
        (aggregate(
          transform(sequence(lit(1), least(octet_length(col("payload")), lit(16))),
            i => ascii(col("payload").substr(i, lit(1)).cast("string"))),
          lit(0L), (acc, b) => acc + b) % 256).as("checksum"))
      .select(col("doc_id"), col("media_kind"), col("byte_len"),
        col("header_hex"), col("checksum"),
        ((col("byte_len") % 64) + 16).as("width"),
        ((col("checksum") % 64) + 16).as("height"),
        (expr("byte_len div 1000") + 1).as("n_frames"))
      .orderBy("doc_id")

  def multimodalMetaOracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 3 AS INT) AS media_kind, encode(text) AS payload, text
      |  FROM documents),
      |meta AS (
      |  SELECT doc_id, media_kind,
      |    octet_length(payload) AS byte_len,
      |    lower(hex(substr(text, 1, 4))) AS header_hex,
      |    CAST(list_sum([ord(substr(text, i, 1)) for i in range(1, least(octet_length(payload), 16)+1)]) AS BIGINT) % 256 AS checksum
      |  FROM p)
      |SELECT doc_id, media_kind, byte_len, header_hex, checksum,
      |  (byte_len % 64) + 16 AS width,
      |  (checksum % 64) + 16 AS height,
      |  (byte_len//1000) + 1 AS n_frames
      |FROM meta ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- decode

  case class MediaFeature(doc_id: Long, media_kind: Int, byte_len: Long,
                          width: Int, height: Int, feature: Array[Float])

  /** Batched decode + feature-extract over payload partitions. The stub
    * "codec" derives dimensions and an 8-dim feature vector from payload
    * bytes; a real build replaces ONLY the `decodeOne` body with an
    * actual image/audio decode + model call, keeping the per-partition
    * batching (setup is amortized across the iterator, exactly like a
    * Pandas-UDF batch).
    */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeature] = {
    import spark.implicits._
    payloads(spark, dir)
      .select(col("doc_id"), col("media_kind"), col("payload"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec setup" happens ONCE here in a real build
        it.map { case (id, kind, bytes) => decodeOne(id, kind, bytes) }
      }
  }

  /** STUB codec: deterministic pseudo-decode from payload bytes. */
  private def decodeOne(id: Long, kind: Int, bytes: Array[Byte]): MediaFeature = {
    val len = bytes.length.toLong
    val checksum = bytes.take(16).foldLeft(0L)((a, b) => a + (b & 0xFF)) % 256
    val feature = Array.tabulate(8) { i =>
      val slice = bytes.drop(i * 4).take(4).foldLeft(0L)((a, b) => a * 31 + (b & 0xFF))
      ((slice % 1000L) / 1000.0f) - 0.5f
    }
    MediaFeature(id, kind, len, ((len % 64) + 16).toInt, ((checksum % 64) + 16).toInt, feature)
  }
}
