package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join correctness + plan shape: the running code behind
  * SURVEY §5's skew claim.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def skewedData() = {
    import spark.implicits._
    // 90% of fact rows share key 1 — the one-straggler-task shape
    val fact = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (1L + i % 7, 1000L + i)))
      .toDF("k", "payload")
    val dim = (1 to 8).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
    (fact, dim)
  }

  test("salted join returns exactly the plain join's rows (any multiplicity)") {
    val (fact, dim) = skewedData()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(identity).toSeq
    val plain = rows(fact.join(dim, "k"))
    val salted = rows(Skew.saltedJoin(fact, dim, "k", salts = 8))
    assert(plain.nonEmpty && salted == plain)
    // salts=1 degenerates to the plain join
    assert(rows(Skew.saltedJoin(fact, dim, "k", salts = 1)) == plain)
  }

  test("salting widens the shuffle key so the hot key spans partitions") {
    val (fact, dim) = skewedData()
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
    salted.collect()
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"join did not shuffle on the salted key:\n$plan")
    // the hot key's rows really spread: count distinct salts it received
    val spread = fact.withColumn("_salt",
      pmod(xxhash64(col("k"), col("payload")), lit(8L)).cast("int"))
      .filter(col("k") === 1L).select("_salt").distinct().count()
    assert(spread > 1, "hot key landed on a single salt — no skew relief")
  }

  test("salt is a pure function of the data: reruns join identically") {
    val (fact, dim) = skewedData()
    val a = Skew.saltedJoin(fact, dim, "k", 4).collect().length
    val b = Skew.saltedJoin(fact, dim, "k", 4).collect().length
    assert(a == b)
  }
}
