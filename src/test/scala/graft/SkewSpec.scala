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

  test("hot-key probe finds the skew and its recommendation drives saltedJoin end-to-end") {
    val (fact, dim) = skewedData()
    // full-sample probe on the synthetic frame: key 1 holds 90% of rows
    val hot = Skew.detectHotKeys(fact, "k", sampleFraction = 1.0)
    assert(hot.nonEmpty, "the 90% key must be flagged")
    assert(hot.head.key == 1L && hot.head.frac > 0.85 && hot.head.frac < 0.95)
    // 900 hot rows + the 14 tail rows where 1 + i%7 == 1
    assert(hot.head.estCount == 914L, s"full sample must count exactly: ${hot.head}")
    val salts = Skew.recommendSalts(fact, "k", sampleFraction = 1.0)
    assert(salts > 1, "a 90% hot key must recommend salting")
    // the recommendation is ceil(frac * shufflePartitions): the hot
    // key's biggest slice shrinks back to ~one average task's load
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(salts == math.ceil(hot.head.frac * p).toInt)
    // and the recommended salt count drives a correct join
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(identity).toSeq
    assert(rows(Skew.saltedJoin(fact, dim, "k", salts)) == rows(fact.join(dim, "k")))
  }

  test("uniform keys stay below the threshold: AQE suffices, no salting recommended") {
    import spark.implicits._
    val uniform = (1 to 2000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "payload")
    assert(Skew.detectHotKeys(uniform, "k", sampleFraction = 1.0).isEmpty)
    assert(Skew.recommendSalts(uniform, "k", sampleFraction = 1.0) == 1)
  }

  test("salt is a pure function of the data: reruns join identically") {
    val (fact, dim) = skewedData()
    val a = Skew.saltedJoin(fact, dim, "k", 4).collect().length
    val b = Skew.saltedJoin(fact, dim, "k", 4).collect().length
    assert(a == b)
  }

  test("bucket-derived salt estimate flags a template clique and clears a uniform corpus") {
    import spark.implicits._
    val p0 = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      // 12 ids sharing one bucket: under the a<b orientation the
      // smallest id carries 11 of the 66 pairs = 16.7% > 5/32 — the
      // same decision the candidate-stream probe reached, without ever
      // building the pair stream
      val clique = (1 to 12).map(i => (i.toLong, "hot"))
      val singles = (100 to 199).map(i => (i.toLong, s"b$i"))
      val buckets = (clique ++ singles).toDF("id", "bucket")
      val salts = Skew.recommendSaltsFromBuckets(buckets, "id", Seq("bucket"))
      assert(salts > 1, s"clique bucket must recommend salting, got $salts")

      // uniform small buckets: no id crosses the evidence floor
      val uniform = (1 to 200).map(i => (i.toLong, s"u${i / 2}")).toDF("id", "bucket")
      assert(Skew.recommendSaltsFromBuckets(uniform, "id", Seq("bucket")) == 1)

      // empty table: no pairs, no salting, no crash
      val empty = Seq.empty[(Long, String)].toDF("id", "bucket")
      assert(Skew.recommendSaltsFromBuckets(empty, "id", Seq("bucket")) == 1)
    } finally spark.conf.set("spark.sql.shuffle.partitions", p0)
  }

  test("b-side skew (hot id largest in its buckets) is flagged by the b-side estimate") {
    import spark.implicits._
    val p0 = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      // one HUB id (9999) sharing a distinct bucket with each of 40
      // partners, all with SMALLER ids: every hub pair has the hub as
      // id_b, so the a-side estimate sees nothing (each partner carries
      // one a-side pair) while the b-side estimate attributes all 40
      val hub = (1 to 40).flatMap(i =>
        Seq((i.toLong, s"h$i"), (9999L, s"h$i")))
      val singles = (100 to 199).map(i => (i.toLong, s"b$i"))
      val buckets = (hub ++ singles).toDF("id", "bucket")
      val ps = Skew.recommendPairSaltsFromBuckets(buckets, "id", Seq("bucket"))
      assert(ps.aSide == 1, s"no a-side key is hot here, got ${ps.aSide}")
      assert(ps.bSide > 1, s"the hub must be flagged on the b side, got ${ps.bSide}")
      // mirrored orientation: hub id SMALLEST → flags flip sides
      val hubA = (1 to 40).flatMap(i =>
        Seq((0L, s"h$i"), (1000L + i, s"h$i")))
      val psA = Skew.recommendPairSaltsFromBuckets(
        (hubA ++ singles).toDF("id", "bucket"), "id", Seq("bucket"))
      assert(psA.aSide > 1 && psA.bSide == 1,
        s"smallest-id hub must flag the a side only, got $psA")
    } finally spark.conf.set("spark.sql.shuffle.partitions", p0)
  }
}
