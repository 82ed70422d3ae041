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
    * pathological).
    *
    * Shape: ONE global range-partitioned sort on the compound key
    * (group, order, tie) + zipWithIndex for contiguous global
    * positions (E40's sanctioned two-pass RDD pattern), then
    * per-group rank = global position − the group's broadcast row
    * offset (groups sort contiguously under the compound key, so the
    * offset is just the exclusive prefix of per-group counts — a
    * bounded driver collect of one row per group). The range
    * partitioner keys on the FULL compound key, and tieCol must be
    * unique, so the key is unique: a hot group splits across as many
    * partitions as its row share demands, and — unlike a first-cut
    * fixed-width value-bucket design — a group whose order values all
    * COLLIDE (millions of equal scores) still spreads, because the
    * unique tie column keeps the range key splittable. Measured on the
    * 125k probe with 90% of docs in one source AND heavily colliding
    * scores: the bucket design ranked in one straggler task; this one
    * doesn't.
    *
    * Also returns `grp_n`, the group's total row count (E41's tertile
    * denominators), from the same bounded counts — no per-group count
    * window. Cost: the range sampling pass + sort + the zipWithIndex
    * count job + the counts aggregate — callers with an expensive
    * upstream pin their input first (perplexity_buckets
    * localCheckpoints its scored table).
    *
    * Contract: `group` may be ANY non-null orderable column type (the
    * key is carried as an opaque Row value — never read as a specific
    * Scala type), and GROUP CARDINALITY is a driver-memory bound: the
    * offsets are one collected row per group, so the helper is for
    * per-SOURCE / per-LANGUAGE scale groupings (≤ ~10⁶ groups), not
    * per-document keys — a caller with unbounded groups wants a plain
    * window and should not be here.
    */
  def groupedRowNumber(df: DataFrame, group: String, orderCol: String,
                       descending: Boolean, tieCol: String): DataFrame = {
    val spark = df.sparkSession
    val order = if (descending) col(orderCol).desc else col(orderCol).asc
    val sortKeys = Seq(col(group).asc, order, col(tieCol).asc)
    // one row per group to the driver; the exclusive prefix MUST use
    // the same group collation as the range sort below, so the rows
    // come back through Spark's own orderBy — a driver-side Scala
    // sortBy compares UTF-16 code units while Spark's string sort is
    // UTF-8 binary, and the two disagree on supplementary-plane
    // characters (an emoji-named source would mis-attach every offset)
    val counts = df.groupBy(col(group)).agg(count(lit(1)).as("c"))
      .orderBy(col(group).asc)
      .collect().map { r =>
        require(!r.isNullAt(0), s"groupedRowNumber: null $group value")
        (r.get(0), r.getLong(1))
      }
    var acc = 0L
    val offsetRows = counts.map { case (g, c) =>
      val row = org.apache.spark.sql.Row(g, acc, c); acc += c; row
    }
    val offsetSchema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(group).copy(name = group),
      org.apache.spark.sql.types.StructField("_grp_off",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp_n",
        org.apache.spark.sql.types.LongType)))
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows.toIndexedSeq, 1), offsetSchema)
    val sorted = df
      .repartitionByRange(sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
    val withPos = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
      },
      sorted.schema.add("_gpos", org.apache.spark.sql.types.LongType))
    withPos
      .join(broadcast(offsets), group)
      .withColumn("rn", col("_gpos") - col("_grp_off"))
      .drop("_gpos", "_grp_off")
  }
}
