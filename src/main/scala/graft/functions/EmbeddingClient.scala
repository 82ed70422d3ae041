package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding computation failed (mirrors the reference's EmbeddingError,
  * stackai-vector-db app/clients/embedding.py:74-80).
  */
final case class EmbeddingError(message: String, cause: Throwable = null)
  extends RuntimeException(message, cause)

/** Provider seam for embedding computation, re-expressing the
  * reference's EmbeddingClient Protocol (app/clients/embedding.py:49-71)
  * for a batch engine: the driver-side `embedText` serves query-vector
  * construction (one text → one vector), while `embedColumn` is the
  * bulk path — an in-plan Column so a corpus embeds inside the scan
  * with no driver round-trip, which is the only shape that survives
  * 100 TB.
  */
trait EmbeddingClient {
  def embeddingDim: Int
  def modelName: String

  /** One text → one vector, driver-side (the query_text flow). */
  def embedText(text: String): Array[Double]

  /** Driver-side batch (embed_texts). */
  def embedTexts(texts: Seq[String]): Seq[Array[Double]] = texts.map(embedText)

  /** Bulk in-plan embedding: text column → array<double> column. */
  def embedColumn(text: Column): Column
}

object EmbeddingClient {
  val DefaultDim = 64

  /** Provider selection mirroring create_embedding_client
    * (embedding.py:294-308): an API key selects the remote provider,
    * otherwise the deterministic fake. The key is config-gated via
    * GRAFT_EMBED_API_KEY so tests and the driver never construct the
    * remote client implicitly.
    */
  def create(apiKey: Option[String] = sys.env.get("GRAFT_EMBED_API_KEY"),
             dim: Int = DefaultDim): EmbeddingClient =
    apiKey.filter(_.trim.nonEmpty) match {
      case Some(k) => new RemoteEmbeddingClient(k)
      case None    => new FakeEmbeddingClient(dim)
    }
}

/** Deterministic fake provider (FakeEmbeddingClient,
  * embedding.py:100-150): the formula lives in [[FakeEmbedding]] and is
  * shared bit-for-bit between the driver-side path and the in-plan
  * Column path (VectorSpec asserts the two agree).
  */
final class FakeEmbeddingClient(val embeddingDim: Int = EmbeddingClient.DefaultDim)
  extends EmbeddingClient {

  override def modelName: String = "fake-embedding-model"

  override def embedText(text: String): Array[Double] =
    try FakeEmbedding.embed(text, embeddingDim)
    catch { case e: IllegalArgumentException => throw EmbeddingError(e.getMessage, e) }

  override def embedColumn(text: Column): Column = {
    val clean = trim(lower(text))
    // codegen'd code-point sum (≡ aggregate(split(clean,""), _+ascii),
    // which runs interpreted — see functions.CharSum)
    val charSum = TextFunctions.charSum(clean)
    val len = length(clean).cast("long")
    val words = size(split(clean, "\\s+")).cast("long")
    // empty/whitespace text: embedText THROWS (the reference's
    // min_length rejection); the bulk path's analog is NULL, so a
    // pipeline quarantines those rows instead of embedding nonsense
    when(length(clean) === 0,
      lit(null).cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)))
      .otherwise(transform(sequence(lit(0), lit(embeddingDim - 1)), i =>
        ((charSum * (i + 1) + len * (i + 7) + words * (i + 13)) % 1000L) / lit(1000.0)
          - 0.5))
  }
}

/** Config-gated stub for a remote embedding provider, mirroring the
  * shape of the reference's CohereEmbeddingClient (embedding.py:151+):
  * constructor contract (non-blank key, model/batch settings), error
  * type, batching parameter. This build has no network egress, so every
  * embed call fails fast with EmbeddingError instead of issuing a
  * request — the seam exists so a provider implementation slots in
  * without touching any operator.
  */
final class RemoteEmbeddingClient(
    apiKey: String,
    val modelName: String = "remote-embed-v3",
    val batchSize: Int = 96,
    val embeddingDim: Int = EmbeddingClient.DefaultDim)
  extends EmbeddingClient {

  require(apiKey != null && apiKey.trim.nonEmpty, "API key is required")

  private def unavailable: Nothing =
    throw EmbeddingError(
      s"remote provider '$modelName' is not reachable from this offline build; " +
        "unset GRAFT_EMBED_API_KEY to use the deterministic fake provider")

  override def embedText(text: String): Array[Double] = unavailable
  override def embedColumn(text: Column): Column = unavailable
}
