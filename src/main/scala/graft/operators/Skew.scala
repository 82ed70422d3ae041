package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §5: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's runtime skew-join split handles most cases for free; salting
  * is the explicit fallback when a single key's rows exceed what one
  * task can hold (a viral document id, a null-heavy foreign key, a
  * boilerplate-dominated shingle) — the situation where a shuffle join
  * stalls on one straggler task at 100 TB. The salted join splits each
  * hot key across `salts` shuffle partitions by widening the join key,
  * at the cost of replicating the right side `salts`×, so it fits the
  * skewed-fact × modest-dim shape (dim too large to broadcast, small
  * enough to replicate a few ways).
  */
object Skew {

  /** Equivalent to `left.join(right, key)` (inner), with each left key
    * spread over `salts` shuffle partitions.
    *
    * The left salt is a deterministic hash of the whole row (a pure
    * function of the data, never of partitioning — reruns salt
    * identically); the right side is replicated once per salt value via
    * a tiny explode, and the join key widens to (key, salt). Correct
    * for any multiplicity: every (left-row, right-row) pair with equal
    * keys still meets on exactly one salt value.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val lCols = left.columns.map(col).toSeq
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(lCols: _*), lit(salts.toLong)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
