package graft.functions

/** Deterministic fake text embedding, matching stackai-vector-db
  * app/clients/embedding.py:100-137 (FakeEmbeddingClient.embed_text):
  *
  *   comp_i = ((char_sum*(i+1) + len*(i+7) + words*(i+13)) % 1000) / 1000 - 0.5
  *
  * over the lowercased, trimmed text. Used driver-side to turn a text
  * query into a constant query vector (reference's query_text flow,
  * app/services/search_service.py:66-90), and row-wise via `embedSql`
  * for bulk chunk embedding.
  */
object FakeEmbedding {

  def embed(text: String, dim: Int): Array[Double] = {
    val clean = text.trim.toLowerCase
    require(clean.nonEmpty, "Cannot embed empty text")
    val charSum = clean.map(_.toLong).sum
    val length = clean.length.toLong
    val words = clean.split("\\s+").count(_.nonEmpty).toLong
    Array.tabulate(dim) { i =>
      ((charSum * (i + 1) + length * (i + 7) + words * (i + 13)) % 1000L) / 1000.0 - 0.5
    }
  }

  /** SQL literal (DuckDB-compatible) for the embedded vector. */
  def sqlLiteral(text: String, dim: Int): String =
    embed(text, dim).map(d => java.lang.Double.toString(d)).mkString("[", ", ", "]")
}
