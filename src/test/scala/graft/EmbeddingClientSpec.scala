package graft

import graft.functions.{EmbeddingClient, EmbeddingError, FakeEmbedding,
  FakeEmbeddingClient, RemoteEmbeddingClient}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingClientSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("factory: no key selects the fake provider, a key selects the remote stub") {
    assert(EmbeddingClient.create(None).isInstanceOf[FakeEmbeddingClient])
    assert(EmbeddingClient.create(Some("  ")).isInstanceOf[FakeEmbeddingClient])
    assert(EmbeddingClient.create(Some("k-123")).isInstanceOf[RemoteEmbeddingClient])
    intercept[IllegalArgumentException](new RemoteEmbeddingClient(" "))
  }

  test("fake provider matches the reference formula, driver-side and in-plan") {
    import spark.implicits._
    val client = new FakeEmbeddingClient(8)
    val texts = Seq("hello world", "Mixed CASE  ", "a b c d")
    // driver path == raw formula
    texts.foreach { t =>
      assert(client.embedText(t).toSeq == FakeEmbedding.embed(t, 8).toSeq)
    }
    // in-plan bulk path == driver path, row for row
    val got = texts.toDF("text")
      .select(col("text"), client.embedColumn(col("text")).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    texts.foreach { t =>
      assert(got(t) == client.embedText(t).toSeq, s"in-plan mismatch for '$t'")
    }
    assert(client.embedTexts(texts).length == 3)
  }

  test("empty text and remote calls fail with EmbeddingError") {
    intercept[EmbeddingError](new FakeEmbeddingClient(4).embedText("   "))
    val remote = new RemoteEmbeddingClient("key")
    intercept[EmbeddingError](remote.embedText("hi"))
    intercept[EmbeddingError](remote.embedColumn(col("text")))
  }

  test("in-plan path quarantines empty text as NULL (bulk analog of the rejection)") {
    import spark.implicits._
    val got = Seq("  ", "ok text").toDF("text")
      .select(new FakeEmbeddingClient(4).embedColumn(col("text")).as("e"))
      .collect()
    assert(got.count(_.isNullAt(0)) == 1)
    assert(got.count(!_.isNullAt(0)) == 1)
  }
}
