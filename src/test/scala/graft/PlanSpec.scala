package graft

import graft.operators.{Analytics, VectorQueries}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the properties that make these queries scale
  * must be visible in the physical plan (SURVEY §6) — filters reach the
  * parquet scan, projection prunes the read schema.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(allScans)
  }

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    df.collect() // materialize so AQE finalizes its stages
    allScans(df.queryExecution.executedPlan)
  }

  test("q1: shipdate filter is pushed to the lineitem scan, read schema is pruned") {
    val s = scans(Analytics.q1PricingSummary(spark, sf))
      .find(_.tableIdentifier.isEmpty).getOrElse(fail("no file scan"))
    val pushed = s.metadata("PushedFilters")
    assert(pushed.contains("l_shipdate"), s"no pushed shipdate filter: $pushed")
    val read = s.metadata("ReadSchema")
    assert(!read.contains("l_comment") && !read.contains("l_orderkey"),
      s"unpruned read schema: $read")
    assert(read.contains("l_returnflag") && read.contains("l_tax"))
  }

  test("knn corpus scan reads only (vec_id, embedding)") {
    val all = scans(VectorQueries.knnLinearL2(spark, sf))
    assert(all.nonEmpty)
    all.foreach { s =>
      val read = s.metadata("ReadSchema")
      assert(!read.contains("label"), s"label not pruned from corpus scan: $read")
    }
  }

  test("metadata-filtered knn pushes the label predicate into the scan") {
    val all = scans(VectorQueries.knnMetadataFilter(spark, sf))
    assert(all.exists(_.metadata("PushedFilters").contains("label")),
      "label filter did not reach the parquet scan")
  }

  test("anti-join query: date filter pushed to the orders scan, LeftAnti in plan") {
    val df = Analytics.customersWithoutOrders(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
    val s = scans(df)
    assert(s.exists(_.metadata("PushedFilters").contains("o_orderdate")),
      "order-date filter did not reach the orders scan")
  }

  test("q17: correlated-subquery shape prunes both lineitem read schemas") {
    val all = scans(Analytics.q17SmallQtyRevenue(spark, sf))
    assert(all.nonEmpty)
    all.filter(_.metadata("ReadSchema").contains("l_partkey")).foreach { s =>
      val read = s.metadata("ReadSchema")
      assert(!read.contains("l_comment") && !read.contains("l_shipdate"),
        s"unpruned lineitem read schema: $read")
    }
  }
}
