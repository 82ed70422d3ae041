package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank attachment for shortlisted (dist, neighbor_id) rows WITHOUT a
  * single-partition WindowExec: the bounded TopKByDistance aggregate
  * re-derives the (dist asc, id asc) order and posexplode numbers it.
  * Over k already-limited rows both formulations cost nothing, but
  * this one keeps WindowExec out of the serving plans entirely (the
  * round-4 audit nit on the pq_topk family) and is the same plan
  * family the batch ANN paths use.
  */
object Ranks {
  def byDistance(df: DataFrame, k: Int): DataFrame =
    df.groupBy()
      .agg(VectorFunctions.topKByDistance(col("dist"), col("neighbor_id"), k)
        .as("nn"))
      .select(posexplode(col("nn")).as(Seq("pos", "nn")))
      .select(col("nn.id").as("neighbor_id"), col("nn.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Skew-safe per-group row_number — `rn` of each row within its
    * `group` under (orderCol asc|desc, tieCol asc), WITHOUT a
    * group-partitioned window: `row_number() OVER (PARTITION BY group)`
    * serializes a hot group's ENTIRE row set through one task, the
    * straggler that killed E40/E41 on the first genuinely skewed
    * corpus (one source holding 90% of a crawl is normal, not
    * pathological). This is E15's two-pass prefix-sum generalized to
    * an arbitrary LONG order key:
    *
    *   1. rows bucket by fixed-width ranges of the ORDER column
    *      (deterministic, order-aligned: bucket k's value range
    *      strictly precedes bucket k+1's in rank order, descending
    *      keys bucket on (max − v) so the alignment holds both ways);
    *   2. stage 1 aggregates ONE count per (group, bucket) — a bounded
    *      driver collect of ≤ groups × (buckets+1) tiny rows — and
    *      prefix-sums them per group on the driver;
    *   3. stage 2 ranks within (group, bucket) — parallel across
    *      buckets, so a hot group spreads over `buckets` tasks — and
    *      adds the broadcast per-(group,bucket) offset.
    *
    * Equal order values land in one bucket by construction, so the
    * within-bucket (orderCol, tieCol) window reproduces the global
    * tie-break exactly: rn ≡ the single-window row_number, just
    * computed in parallel (RanksSpec pins the equivalence on a skewed
    * corpus). Also returns `grp_n`, the group's total row count (the
    * tertile denominators E41 needs), from the SAME stage-1 sums — no
    * second per-group pass.
    *
    * Value-skew caveat (documented, accepted): buckets split the ORDER
    * key's value range, so a group whose order values all collide into
    * one bucket still ranks in one task — that is tie-skew in the DATA
    * (a million equal scores), not group-skew, and no order-preserving
    * split can separate exact ties without changing the tie-break.
    */
  def groupedRowNumber(df: DataFrame, group: String, orderCol: String,
                       descending: Boolean, tieCol: String,
                       buckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mm = df.agg(min(col(orderCol)).cast("long").as("lo"),
      max(col(orderCol)).cast("long").as("hi")).head()
    if (mm.isNullAt(0)) // empty input: keep the schema, nothing to rank
      return df.withColumn("rn", lit(1L)).withColumn("grp_n", lit(0L))
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val width = math.max(1L, (hi - lo) / buckets + 1L)
    val bkt =
      if (descending) expr(s"($hi - CAST($orderCol AS BIGINT)) DIV $width")
      else expr(s"(CAST($orderCol AS BIGINT) - $lo) DIV $width")
    val b = df.withColumn("_rank_bkt", bkt)
    // stage 1: ≤ groups × (buckets+1) rows to the driver
    val sums = b.groupBy(col(group), col("_rank_bkt"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val offsets = sums.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      var acc = 0L
      rs.sortBy(_._2).map { case (_, k, c) => val row = (g, k, acc); acc += c; row }
    }
    val grpN = sums.groupBy(_._1).toSeq
      .map { case (g, rs) => (g, rs.map(_._3).sum) }
    // stage 2: parallel within-(group,bucket) rank + broadcast offsets
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group), col("_rank_bkt"))
      .orderBy(if (descending) col(orderCol).desc else col(orderCol).asc,
        col(tieCol).asc)
    b.join(broadcast(offsets.toDF(group, "_rank_bkt", "_rank_off")),
        Seq(group, "_rank_bkt"))
      .join(broadcast(grpN.toDF(group, "grp_n")), group)
      .withColumn("rn", row_number().over(w).cast("long") + col("_rank_off"))
      .drop("_rank_bkt", "_rank_off")
  }
}
