package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch probe: 25× scale stress for the corpus-text tier (the
  * round-6 kernels and reports). Synthesizes a deterministic 125k-doc
  * corpus (25× the sf0.1 document count) of ~120-word documents drawn
  * from a 5k-word zipf-ish vocabulary across 20 sources — enough
  * shared n-grams that the dedup/overlap joins do real work — then
  * drives the n-gram-kernel consumers and the new selection/forensics
  * reports and prints wall seconds. The point is shape evidence: the
  * bigram/trigram kernels keep the scans CPU-bound-but-compiled, the
  * aggregation shuffles stay key-partitioned, and nothing degenerates
  * into an all-pairs or driver-side loop at 25×.
  */
object CorpusScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(125000)
    val spark = GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_cscale").toString
    // ~120 words/doc; word w_k with k = (h1·pos + h2) % 5000 biased by
    // pos² so low ids repeat (zipf-ish head, shared across docs)
    spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(119)), i =>
          concat(lit("w"), pmod(
            xxhash64(col("id") * 7 + i) % 71 + i * i % 997,
            lit(5000L))))).as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[cscale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    println(s"[cscale] corpus n=$n ~120 words/doc, 20 sources at $dir")
    timed("lm_bigram_score") { graft.operators.Corpus.lmBigramScore(spark, dir).count() }
    timed("collocations_pmi") { graft.operators.Corpus.collocationsPmi(spark, dir).count() }
    timed("ngram_novelty") { graft.operators.Corpus.ngramNovelty(spark, dir).count() }
    timed("boilerplate_ngrams") { graft.operators.Corpus.boilerplateNgrams(spark, dir).count() }
    timed("quality_gopher") { graft.operators.TextOps.qualityGopher(spark, dir).count() }
    timed("dsir_select") { graft.operators.Corpus.dsirSelect(spark, dir).count() }
    timed("source_overlap") { graft.operators.Corpus.sourceOverlap(spark, dir).count() }
    // E21b at 125k docs: src0 is the 1/20 "eval set" (~6.2k docs ×
    // ~108 windows ≈ 675k broadcast hashes — the benchmark-suite
    // scale the scaladoc prices). toRdd: the left join against the
    // key-unique hit aggregate would be count()-eliminated
    timed("decontaminate_ngram_exact") {
      graft.operators.Dedup.decontaminateNgramExact(spark, dir)
        .queryExecution.toRdd.count() }
    // round-7 per-row/report tier: classifier is a pure scan,
    // corpus_profile aggregates the token histogram, the interleave
    // pays one range-sort + the zipWithIndex count job
    timed("quality_classifier") { graft.operators.TextOps.qualityClassifier(spark, dir).count() }
    timed("corpus_profile") { graft.operators.TextOps.corpusProfile(spark, dir).count() }
    // D11 at the 125k tier: the streamed quality gate over the same
    // corpus (file-streamed landing zone → classifier per micro-batch
    // → one stateful per-source rollup)
    timed("stream_quality_filter") {
      graft.streaming.Streams.streamQualityFilter(spark, dir).count() }
    timed("mix_schedule_interleave") { graft.operators.TextOps.mixScheduleInterleave(spark, dir).count() }
    // E35 rides the doc-pair component labels (the memoized E13 table):
    // components + two small aggs over 125k docs with heavy shared
    // vocabulary — the pair join and label propagation ARE the cost
    timed("dedup_cluster_stats") { graft.operators.Dedup.dedupClusterStats(spark, dir).count() }
    // E52 rides the component memo the line above just built: the
    // increment is one left join + the band projection (toRdd — the
    // key-unique component join is count()-eliminable)
    timed("split_leakage_free") {
      graft.operators.Dedup.splitLeakageFree(spark, dir)
        .queryExecution.toRdd.count() }
    // E42 budget: the LSH-verified pair graph + contraction vs the
    // exact E2 graph the line above just paid for (each line includes
    // its own memo builds — shingle/prefix for exact, shingle/signature
    // for LSH — so the comparison is end-to-end honest)
    timed("components_lsh_e42") { graft.operators.Dedup.warmLshComponents(spark, dir) }
    // the composed passes themselves: with both pair graphs memoized,
    // the increments are the clean gate + survivor rollup
    timed("pipeline_dedup_corpus") { graft.operators.TextOps.pipelineDedupCorpus(spark, dir).count() }
    timed("pipeline_fuzzy_dedup") { graft.operators.TextOps.pipelineFuzzyDedup(spark, dir).count() }
    // E49 at 125k docs (round 10, post localCheckpoint-pin): three
    // band-bucket self-joins over the memoized signatures (the
    // signature/exact-pair memos are already warm from the lines
    // above, so this measures the sweep itself), ONE verify pass over
    // the pinned distinct union. collect(), not count(): the 3-row
    // grid joins key-unique aggregates count() would eliminate
    timed("lsh_band_sweep") { graft.operators.BandSweep.lshBandSweep(spark, dir).collect() }
    // round-8 report tier: the funnel re-cuts the memoized component
    // labels + one flag scan; the plan and diff are single-scan /
    // single-join shapes (E48's matrix is NOT probed here — its eval
    // side is bounded small by definition, and this corpus's 1/20
    // "eval set" would misrepresent the broadcast shape)
    timed("pipeline_attrition_report") {
      graft.operators.TextOps.pipelineAttritionReport(spark, dir).count() }
    timed("token_budget_plan") {
      graft.operators.TextOps.tokenBudgetPlan(spark, dir).count() }
    timed("corpus_snapshot_diff") {
      graft.operators.Corpus.corpusSnapshotDiff(spark, dir).count() }
    // D14 at the 125k tier: the full corpus through the streamed
    // funnel (flags + canon store per micro-batch)
    timed("stream_attrition") {
      graft.streaming.Streams.streamAttrition(spark, dir).count() }

    // SKEWED variant (round-7 verdict item 3): 90% of docs in ONE
    // source — the shape that made the old per-source rank windows a
    // single-task straggler. The two-pass groupedRowNumber spreads the
    // hot source over its order-key buckets; the timings below should
    // sit near the uniform-corpus numbers above, not 10× them.
    val skewDir = java.nio.file.Files.createTempDirectory("graft_cskew").toString
    spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(119)), i =>
          concat(lit("w"), pmod(
            xxhash64(col("id") * 7 + i) % 71 + i * i % 997,
            lit(5000L))))).as("text"),
        lit("en").as("lang"),
        when(pmod(col("id"), lit(10)) =!= 0, lit("src_hot"))
          .otherwise(concat(lit("src"), pmod(col("id"), lit(20)))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")
    timed("mix_schedule_interleave_skew") {
      graft.operators.TextOps.mixScheduleInterleave(spark, skewDir).count() }
    // the LM build on the skew corpus times separately so the buckets
    // line measures the rank/tertile machinery, not the bigram join
    timed("lm_bigram_score_skew") {
      graft.operators.Corpus.lmBigramScore(spark, skewDir).count() }
    timed("perplexity_buckets_skew") {
      graft.operators.Corpus.perplexityBuckets(spark, skewDir).count() }
    // round-9: E30's medians now rank HISTOGRAM rows (distinct values
    // per source), so the hot source costs a map-side-combined count,
    // not a full row-set sort — this line should sit near the uniform
    // corpus's cost, with no single-task stage
    timed("quality_outliers_mad_skew") {
      graft.operators.TextOps.qualityOutliersMad(spark, skewDir).count() }

    // E33 rides the vector tier: 25× the sf0.1 embedding count, built
    // as ~nv/10 base vectors × 10 jittered copies so the cosine
    // near-dup graph has real cliques for components to contract
    val nv = n / 5 * 2 // 50k at the default 125k docs (25× sf0.1's 2k)
    // base-vector modulus must stay >= 1: n < 25 would make nv/10 == 0
    // and pmod(_, 0) nulls would corrupt the synthetic embeddings
    val nBase = math.max(1, nv / 10)
    spark.range(nv.toLong)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          ((pmod(xxhash64(pmod(col("id"), lit(nBase)) * 131 + i), lit(1000L))
            .cast("double") / 1000.0 - 0.5)
            + (pmod(xxhash64(col("id") * 17 + i), lit(100L)).cast("double")
               / 100.0 - 0.5) * 0.02).cast("float")).as("embedding"),
        pmod(col("id"), lit(10L)).cast("int").as("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    timed("semantic_prune") { graft.operators.Dedup.semanticPrune(spark, dir).count() }
    timed("semantic_prune_clustered") { graft.operators.Dedup.semanticPruneClustered(spark, dir).count() }
    // E38 rides the same coarse assignment: one scan + k-row stats
    timed("embedding_outliers") { graft.operators.Ivf.embeddingOutliers(spark, dir).count() }
    // E45 pays one exact pair materialization (the E5 stream the
    // semantic_prune line above also paid) + the grid explode.
    // collect(), NOT count(): the final frame is a left join from the
    // 7-row grid against key-unique aggregates, so count() lets
    // Catalyst eliminate the joins and skip the entire pair pass
    timed("dedup_threshold_sweep") { graft.operators.Dedup.dedupThresholdSweep(spark, dir).collect() }
    // cleanup
    import scala.jdk.CollectionConverters._
    Seq(dir, skewDir).foreach { d =>
      java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
