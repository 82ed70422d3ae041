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
}
