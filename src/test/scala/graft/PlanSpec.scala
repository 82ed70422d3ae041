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

  private def countNodes(p: org.apache.spark.sql.execution.SparkPlan,
                         pred: org.apache.spark.sql.execution.SparkPlan => Boolean): Int = {
    val self = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        return countNodes(a.executedPlan, pred)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        return countNodes(q.plan, pred)
      case _ => if (pred(p)) 1 else 0
    }
    self + p.children.map(countNodes(_, pred)).sum
  }

  test("asof join: event-type filter pushed to scan, ONE window pass, one data shuffle") {
    val df = Analytics.eventsAsofJoin(spark, sf)
    df.collect()
    val s = scans(df)
    assert(s.exists(_.metadata("PushedFilters").contains("event_type")),
      "event_type IN filter did not reach the events scan")
    val plan = df.queryExecution.executedPlan
    assert(countNodes(plan,
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) == 1,
      "both running columns must land in a single Window exec")
    // exchanges: one shuffle on user_id + the presentation orderBy only
    assert(countNodes(plan,
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) <= 2,
      "asof join must not shuffle beyond user_id + presentation sort")
  }

  test("funnel: one data shuffle, partial aggregation reuses the window partitioning") {
    val df = Analytics.eventsFunnel(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // user_id shuffle + the single-row final agg exchange; the groupBy
    // between them must reuse the window's user_id partitioning
    assert(countNodes(plan,
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) <= 2,
      s"funnel must not re-shuffle between window and per-user aggregation")
  }

  test("bucketed join: zero exchanges below the fact-fact sort-merge join") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    val df = Analytics.bucketedJoin(ss, sf)
    df.collect()
    def findJoin(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.SparkPlan] = p match {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => Some(j)
      case other => other.children.flatMap(findJoin).headOption
    }
    val join = findJoin(df.queryExecution.executedPlan)
      .getOrElse(fail("expected a sort-merge join over the bucketed tables"))
    assert(countNodes(join,
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) == 0,
      s"bucketed join must read bucket-aligned files with no exchange:\n$join")
  }

  test("bm25: no global sort — ranking goes through the bounded top-k aggregate") {
    val df = operators.Search.textSearchBm25(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // the only SortExec allowed is the k-row presentation orderBy; the
    // 5000-row scored corpus must NOT pass through a global sort
    val sorts = countNodes(plan,
      _.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    assert(sorts <= 1, s"bm25 must rank via TopKByDistance, found $sorts sorts")
    assert(plan.toString.contains("topk_by_distance"),
      "bounded top-k aggregate missing from the bm25 plan")
  }

  test("dpp join: runtime partition pruning reaches the partitioned fact scan") {
    // sf0.01: the hot-day set is nonempty there, so AQE cannot
    // empty-propagate the join away before the scan is inspected
    val df = Analytics.dppJoin(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"partitioned fact scan lacks a runtime pruning filter:\n$plan")
  }

  test("bloom join: runtime bloom filter reaches the fact side") {
    val df = Analytics.bloomJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
      s"no injected runtime bloom filter in the plan:\n$plan")
  }

  test("range join: bin-bucketing keeps BNLJ/cartesian out of the plan") {
    val df = Analytics.eventsRangeJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"pure-range join fell back to an all-pairs plan:\n$plan")
  }

  test("dsir_select: top-k is TakeOrdered, scoring join is never a cartesian over bigrams") {
    val df = graft.operators.Corpus.dsirSelect(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be bounded, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"bigram scoring fell back to a cartesian:\n$plan")
  }

  test("source_overlap: vocabulary self-join stays keyed on the shingle (no cartesian)") {
    val df = graft.operators.Corpus.sourceOverlap(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"source overlap fell back to an all-pairs plan:\n$plan")
  }

  test("knn_graph_mutual: reversed-pair symmetrization is an equi-join, never all-pairs") {
    val df = graft.operators.Dedup.knnGraphMutual(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"mutual-edge join fell back to an all-pairs plan:\n$plan")
    // the symmetrization join itself must hash on the reversed pair key
    // (the only sanctioned nested-loop in this plan is probeSelect's
    // k-row broadcast centroid table)
    assert("(BroadcastHash|SortMerge|ShuffledHash)Join \\[query_id".r
      .findFirstIn(plan).isDefined,
      s"reversed-pair symmetrization is not an equi-join:\n$plan")
  }

  test("embedding_outliers: centroid and stats joins broadcast (no corpus-sized shuffle join)") {
    val df = graft.operators.Ivf.embeddingOutliers(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"k-row centroid/stats tables must broadcast into the scan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"residual computation fell back to an all-pairs plan:\n$plan")
  }

  test("ivfpq residual serving: ordinal map broadcasts, one scan, no cartesian") {
    val q = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val df = graft.operators.Pq.ivfPqTopK(spark, sf, q, 10, nprobe = 4, refine = 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the cluster_id -> probe_ord map is nprobe rows: it must broadcast
    // into the code scan (a shuffle join here would reshuffle the code
    // table per query), and the per-cluster table lookup is ONE codegen
    // kernel — no per-probe plan branches, no all-pairs fallback
    assert(plan.contains("BroadcastHashJoin"),
      s"probe-ordinal map must broadcast into the code scan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"residual ADC fell back to an all-pairs plan:\n$plan")
    assert(plan.contains("pq_adc_distance_multi"),
      s"residual ranking must go through the multi-table ADC kernel:\n$plan")
    assert(plan.contains("TakeOrdered"),
      s"the shortlist must be a bounded TakeOrdered, not a global sort:\n$plan")
  }

  test("filtered ivfpq serving: selector is a semi-join inside the scan, pruning intact") {
    val q = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray
    val selector = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("label").isin(2, 5, 7))
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"))
    val df = graft.operators.Pq.ivfPqTopKFiltered(spark, sf, q, 10, nprobe = 4,
      selector, refine = 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the selector must narrow candidates BEFORE the bounded top-k — a
    // LeftSemi in the plan, not a post-filter over collected results
    assert(plan.contains("LeftSemi"),
      s"selector must semi-join the probed candidate stream:\n$plan")
    assert(plan.contains("pq_adc_distance_multi"),
      s"filtered serving must still rank through the residual ADC kernel:\n$plan")
    assert(plan.contains("TakeOrdered"),
      s"the filtered shortlist must stay a bounded TakeOrdered:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"filtered serving fell back to an all-pairs plan:\n$plan")
  }

  test("residual batch ANN: pair stream joins on cluster_id, ranks through the query-side ADC kernel") {
    val df = graft.operators.Pq.resBatch(spark, sf, 5, nprobeOpt = Some(4))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pq_adc_query_distance"),
      s"residual batch must fold through AdcQueryDistance (codes stay M bytes):\n$plan")
    // probes × codes is the candidate join: an equi-join on cluster_id
    // (the only sanctioned nested loop is probeSelect's broadcast
    // centroid table), never a cartesian
    assert(!plan.contains("CartesianProduct"),
      s"residual batch fell back to an all-pairs plan:\n$plan")
    assert("(BroadcastHash|SortMerge|ShuffledHash)Join \\[(cluster_id|probe_cluster)".r
      .findFirstIn(plan).isDefined,
      s"candidate join is not keyed on the cluster:\n$plan")
  }

  // NOTE: graph_topk's returned frame is an eager localCheckpoint (the
  // beam loop's storage hygiene), so its executedPlan is a checkpoint
  // scan — a plan pin there would be vacuous. The beam's join shape is
  // covered by GraphSpec's recall/cost contracts instead.

  test("filtered residual batch: selector is a semi-join on the candidate side") {
    val selector = graft.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("label").isin(2, 5, 7))
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"))
    val df = graft.operators.Pq.resBatchFiltered(spark, sf, 5, nprobe = 4, selector)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"the selector must semi-join the candidate codes before the pair shuffle:\n$plan")
    assert(plan.contains("pq_adc_query_distance"),
      s"the filtered batch must still fold through AdcQueryDistance:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the filtered batch fell back to an all-pairs plan:\n$plan")
  }

  test("mid-selectivity filtered graph serving never plans an N×f nested loop") {
    // the round-12 scale hole: past the ×16 widening cap the old code
    // served queries JOIN survivors ON cand <> query_id — an O(N·f)
    // BroadcastNestedLoopJoin with the corpus on BOTH sides. The
    // routed plan may only contain condition-free Cross BNLJs (the
    // bounded centroid broadcast every probe selection starts from) —
    // never a BNLJ carrying the inequality pair condition.
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val sel = graft.Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(17L)) === 1)
      .select(col("vec_id").as("id"))
    // pre-condition: this selector IS the over-widened regime here
    val kr = 20L
    val n = graft.Tables.embeddingsCount(spark, sf)
    val f = sel.count()
    assert(f > kr, s"selector starved (f=$f) — the spec must drive the routed branch")
    val df = graft.operators.GraphIndex.graphTopkFiltered(spark, sf, 5, sel)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val badBnlj = plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin"))
      .filter(l => l.contains("query_id") || !l.contains("Cross"))
      .toSeq
    assert(badBnlj.isEmpty,
      s"filtered graph serving planned an N×f nested loop:\n${badBnlj.mkString("\n")}")
    assert(!plan.contains("CartesianProduct"),
      s"filtered graph serving planned a cartesian product:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"the selector must semi-join the candidate side:\n$plan")
    assert(plan.contains("pq_adc_query_distance"),
      s"the routed branch must rank through the compressed filtered batch:\n$plan")
  }

  test("persisted filtered graph serving: selector semi-joins the stored side, no all-pairs") {
    // A26k's contract: the stored-layout face must stay a probed scan
    // with the selector semi-joined BEFORE it — the same no-N×f rule
    // as the session face; condition-free Cross BNLJs (the bounded
    // centroid broadcast) are the only nested loops allowed
    val df = graft.operators.GraphIndex
      .graphTopkFilteredPersistedQuery(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val badBnlj = plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin"))
      .filter(l => l.contains("query_id") || !l.contains("Cross"))
      .toSeq
    assert(badBnlj.isEmpty,
      s"persisted filtered serving planned an N×f nested loop:\n${badBnlj.mkString("\n")}")
    assert(!plan.contains("CartesianProduct"),
      s"persisted filtered serving planned a cartesian product:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"the selector must semi-join the stored side:\n$plan")
  }

  test("decontaminate_ngram_exact: eval windows broadcast into one corpus scan") {
    val df = graft.operators.Dedup.decontaminateNgramExact(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the eval hash set must broadcast into the corpus window stream:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the collision check fell back to an all-pairs plan:\n$plan")
  }

  test("quality_classifier: single scan, zero exchanges before the presentation sort") {
    val df = graft.operators.TextOps.qualityClassifier(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // per-row arithmetic only: the one Exchange allowed is the final
    // ORDER BY's range partitioning
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"classifier must not shuffle the corpus:\n$plan")
    assert(scans(df).size == 1, "exactly one documents scan")
  }

  test("corpus_profile: one fused document scan; rollup joins broadcast, never corpus-shuffled") {
    val df = graft.operators.TextOps.corpusProfile(spark, sf)
    df.collect()
    // the histogram side still chains lang + classifier over ONE
    // documents scan (the E41 nest's own scan is pinned behind its
    // eager localCheckpoint, so it cannot re-scan here)
    assert(scans(df).size == 1,
      "per-row signals must chain over ONE scan, not join derived frames")
    val plan = df.queryExecution.executedPlan.toString
    // round 8: the card joins the per-source E41 resample rollup —
    // a ≤ sources-row frame — so joins are allowed but must ALL be
    // broadcast: a SortMergeJoin here would shuffle the corpus to
    // meet a 20-row table
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"dataset card joins must stay broadcast:\n$plan")
  }

  test("dedup_threshold_sweep: pair join stays cluster-keyed; grid joins never shuffle pairs") {
    val df = graft.operators.Dedup.dedupThresholdSweep(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the only pair generator is E5's cluster-layout stream — the grid
    // explode and the final ≤7-row grid joins must not reintroduce an
    // all-pairs plan (the one sanctioned nested-loop is probeSelect's
    // k-row broadcast centroid table, same as the knn_graph_mutual pin)
    assert(!plan.contains("CartesianProduct"),
      s"sweep fell back to an all-pairs plan:\n$plan")
    assert("(BroadcastHash|SortMerge|ShuffledHash)Join".r.findFirstIn(plan).isDefined,
      s"pair stream must join on the cluster key:\n$plan")
  }

  test("token_budget_plan: one pruned documents scan, totals join broadcast") {
    val df = graft.operators.TextOps.tokenBudgetPlan(spark, sf)
    df.collect()
    val ss = scans(df)
    assert(ss.size == 1, "exactly one documents scan")
    val read = ss.head.metadata("ReadSchema")
    assert(!read.contains("lang") && !read.contains("doc_id"),
      s"plan table must read only (source, text): $read")
    val plan = df.queryExecution.executedPlan.toString
    // totals come from a whole-frame window over the catalog-sized
    // aggregate — no join may touch the corpus, and no second scan
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"totals must ride the bounded window, never a corpus join:\n$plan")
  }

  test("pipeline_attrition_report: flag joins stay equi-joins, no cartesian") {
    val df = graft.operators.TextOps.pipelineAttritionReport(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"attrition funnel fell back to an all-pairs plan:\n$plan")
  }

  test("ann_param_sweep: every grid point joins on the pair key, never all-pairs") {
    val df = graft.operators.Dedup.annParamSweep(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // five ANN contracts in one plan: the only sanctioned nested loop
    // is probeSelect's k-row centroid broadcast (the E37 pin); the
    // exact-vs-served hit joins must all hash on (query_id, neighbor_id)
    assert(!plan.contains("CartesianProduct"),
      s"sweep fell back to an all-pairs plan:\n$plan")
    assert("(BroadcastHash|SortMerge|ShuffledHash)Join \\[query_id".r
      .findFirstIn(plan).isDefined,
      s"hit join is not an equi-join on the pair key:\n$plan")
  }

  test("q10: both selective filters pushed below the fact join, top-20 is TakeOrdered") {
    val df = Analytics.q10ReturnedItems(spark, sf)
    val ss = scans(df)
    val liScan = ss.find(_.metadata("ReadSchema").contains("l_returnflag"))
      .getOrElse(fail("no lineitem scan"))
    assert(liScan.metadata("PushedFilters").contains("l_returnflag"),
      s"returnflag not pushed: ${liScan.metadata("PushedFilters")}")
    val ordScan = ss.find(_.metadata("ReadSchema").contains("o_orderdate"))
      .getOrElse(fail("no orders scan"))
    assert(ordScan.metadata("PushedFilters").contains("o_orderdate"),
      s"quarter filter not pushed: ${ordScan.metadata("PushedFilters")}")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must be a bounded TakeOrdered, not a global sort:\n$plan")
  }
}
