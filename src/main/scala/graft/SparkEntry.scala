package graft

import graft.operators._
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.knnLinearCosine(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-series: vector search core
    "knn_linear_l2"       -> (VectorQueries.knnLinearL2 _),
    "knn_linear_cosine"   -> (VectorQueries.knnLinearCosine _),
    "knn_text_query"      -> (VectorQueries.knnTextQuery _),
    "knn_metadata_filter" -> (VectorQueries.knnMetadataFilter _),
    "knn_threshold"       -> (VectorQueries.knnThreshold _),
    "knn_exact_topk"      -> (VectorQueries.knnExactTopk _),
    "ivf_build"           -> (Ivf.ivfBuild _),
    // probe-all: exact k-NN by construction, so it carries the A1 oracle;
    // the nprobe<k approximate serving path is benched as its own key
    // below and spec-covered (IvfSpec recall).
    "ivf_query"           -> ((s, d) => Ivf.ivfQuery(s, d, nprobeOpt = Some(Int.MaxValue))),
    "ivf_query_nprobe"    -> ((s, d) => Ivf.ivfQuery(s, d)),
    "index_recommend"     -> ((s, d) => Library.indexRecommend(s, d)),
    "index_lifecycle"     -> (IndexLifecycle.indexLifecycle _),
    "index_delete"        -> (IndexLifecycle.indexDelete _),
    "ivfpq_lifecycle"     -> (PqLifecycle.ivfpqLifecycle _),
    // A19b: the SQ8 tier's persisted lifecycle — build / frozen-model
    // append / bucket-rewrite delete / disk read-back (round 15: the
    // 4x tier joins the A18b state machine every other serving tier
    // already speaks)
    "sq8_lifecycle"       -> (Sq8Lifecycle.sq8Lifecycle _),
    // A21b/A22b: the BQ (256x) and PCA tiers on the same shared
    // TierLifecycle seam — every quantized serving tier now speaks
    // the A18b state machine (closes the §9 "persisted faces" item)
    "bq_lifecycle"        -> (BqLifecycle.bqLifecycle _),
    "pca_lifecycle"       -> (PcaLifecycle.pcaLifecycle _),
    // small-files compaction of the persisted lists (row conservation
    // proven by disk read-back; file behavior pinned in the spec)
    "index_compact"       -> (IndexLifecycle.indexCompact _),
    // A19c: the same maintenance pass on the flat-tier bucket layout
    // (appends are accretive there exactly as in the IVF lists)
    "tier_compact"        -> (TierLifecycle.tierCompact _),
    "index_stats"         -> (Ivf.indexStats _),
    "validate_chunks"     -> (Validate.validateChunks _),
    "validate_documents"  -> (Validate.validateDocuments _),
    "validate_libraries"  -> (Validate.validateLibraries _),
    "validate_embeddings" -> (Validate.validateEmbeddings _),
    "library_stats"       -> (Library.libraryStats _),
    "index_memory_stats"  -> ((s, d) => Library.indexMemoryStats(s, d)),
    "library_pagination"  -> ((s, d) => Library.libraryPagination(s, d)),
    "cascade_delete"      -> (Library.cascadeDelete _),
    "upsert_latest"       -> (Library.upsertLatest _),
    // B-series: document/chunk pipeline
    "chunk_documents"  -> (TextOps.chunkDocuments _),
    "embed_chunks"     -> ((s, d) => TextOps.embedChunks(s, d)),
    "doc_stats"        -> (TextOps.docStats _),
    "chunk_pagination" -> ((s, d) => TextOps.chunkPagination(s, d)),
    "doc_pagination"   -> ((s, d) => TextOps.docPagination(s, d)),
    // E-series: LLM-data-pipeline operators
    "dedup_exact"         -> (Dedup.dedupExact _),
    // E1c: exact dedup under text normalization + the missed-dup delta
    "dedup_exact_normalized" -> (Dedup.dedupExactNormalized _),
    "ngram_jaccard_pairs" -> (Dedup.ngramJaccardPairs _),
    // connected components over the exact pair graph: one canonical
    // survivor per dup CLUSTER (near-duplication is transitive)
    "dedup_components"    -> (Dedup.dedupComponents _),
    // E57: quality-aware canonicalization — per near-dup component,
    // the argmax-E8-quality member vs the min-id rule (the RefinedWeb
    // keep-best-of-cluster policy; disagree rows = picks that change)
    "dedup_components_quality" -> (Dedup.dedupComponentsQuality _),
    // SemDeDup-style semantic prune: exact cosine pairs → components →
    // one representative per group, kept flag per vector
    "semantic_prune"      -> (Dedup.semanticPrune _),
    // the paper's within-cluster serving recipe — N^1.5 pair cost vs
    // the exact key's O(N²) probe-all contract
    "semantic_prune_clustered" -> (Dedup.semanticPruneClustered _),
    // duplicate-cluster size histogram over the exact component labels
    "dedup_cluster_stats" -> (Dedup.dedupClusterStats _),
    // E52: leakage-free split — the near-dup COMPONENT (not the doc)
    // hashes into the 80/10/10 bands, so a cluster never straddles
    // train/val/test (the in-corpus twin of eval decontamination)
    "split_leakage_free"  -> (Dedup.splitLeakageFree _),
    // cross-source shingle-vocabulary contamination matrix
    "source_overlap"      -> (Corpus.sourceOverlap _),
    // E47: release-to-release drift report vs a persisted hash manifest
    "corpus_snapshot_diff" -> (Corpus.corpusSnapshotDiff _),
    // DSIR-style importance selection: contrastive target-vs-raw
    // bigram-LM likelihood ratios, integer-quantized, top-k
    "dsir_select"         -> ((s, d) => Corpus.dsirSelect(s, d)),
    "dedup_minhash_lsh"   -> (Dedup.dedupMinhashLsh _),
    "dedup_simhash"       -> ((s, d) => Dedup.dedupSimhash(s, d)),
    "embedding_neardup"   -> (Dedup.embeddingNeardup _),
    // E45: threshold-sensitivity sweep over the exact pair stream
    "dedup_threshold_sweep" -> (Dedup.dedupThresholdSweep _),
    "embedding_neardup_lsh" -> ((s, d) => Dedup.embeddingNeardupLsh(s, d)),
    // train/eval overlap check: broadcast eval shingle sets, one corpus
    // scan, no pair generation — the decontamination pass
    "decontaminate_eval"  -> ((s, d) => Dedup.decontaminateEval(s, d)),
    // E48: the per-source contamination matrix over the same hit rule
    "contamination_matrix" -> ((s, d) => Dedup.contaminationMatrix(s, d)),
    // E21b: the GPT-3/PaLM exact 13-gram collision check — broadcast
    // eval window hashes into one corpus scan, per-doc count + first
    // collision position
    "decontaminate_ngram_exact" -> ((s, d) => Dedup.decontaminateNgramExact(s, d)),
    "ann_topk_batch"      -> ((s, d) => Dedup.annTopkBatch(s, d)),
    "ann_topk_batch_nprobe" -> ((s, d) => Dedup.annTopkBatchNprobe(s, d)),
    // A26i: the graph tier's own closed tuning loop — the measured
    // (rounds, beam) grid + per-floor cheapest-qualifying argmin
    "graph_autotune" -> ((s, d) => GraphIndex.graphAutotune(s, d)),
    // A26l/A26m: the same measured loop per serving metric — the
    // sidecar carries one pick per metric, so l2/dot serve measured
    // operating points exactly like cosine (round-15: closes the §9
    // cosine-only-grid asymmetry)
    "graph_autotune_l2" -> ((s, d) =>
      GraphIndex.graphAutotune(s, d, metric = graft.functions.VectorMetric.L2)),
    "graph_autotune_dot" -> ((s, d) =>
      GraphIndex.graphAutotune(s, d, metric = graft.functions.VectorMetric.Dot)),
    // A26j: the pick SERVES — persisted sidecar read back as config
    "graph_topk_tuned" -> ((s, d) => GraphIndex.graphTopkTuned(s, d)),
    // A26n/A26o: tuned serving honoring the PER-METRIC sidecar pick
    // (sentinel fallback to the family defaults, same as cosine)
    "graph_topk_tuned_l2" -> ((s, d) =>
      GraphIndex.graphTopkTuned(s, d, metric = graft.functions.VectorMetric.L2)),
    "graph_topk_tuned_dot" -> ((s, d) =>
      GraphIndex.graphTopkTuned(s, d, metric = graft.functions.VectorMetric.Dot)),
    // A26k: the persisted filtered face (stored-layout IVF-style
    // serving with selector semi-join + widened probes) as a key
    "graph_topk_filtered_persisted" ->
      ((s, d) => GraphIndex.graphTopkFilteredPersistedQuery(s, d)),
    // E56: MMR-diversified batch ANN — greedy λ·rel − (1−λ)·max-sim
    // fold over the exact top-C shortlist (the RAG rerank stage);
    // everything after the shortlist is O(N·C²), never corpus×corpus
    "ann_topk_mmr" -> ((s, d) => Mmr.annTopkMmr(s, d)),
    // E56b: the serving twin — the same fold over the nprobe shortlist
    // (E6b's engine); the composition that runs at 100 TB
    "ann_topk_mmr_nprobe" -> ((s, d) => Mmr.annTopkMmrNprobe(s, d)),
    // E58: the λ tuning grid for the rerank — relevance retained vs
    // diversity bought per λ, one shortlist + one pair table for the
    // whole grid; doubles via nested ordered folds, oracle-exact
    "mmr_lambda_sweep" -> ((s, d) => Mmr.mmrLambdaSweep(s, d)),
    // contrastive hard negatives: batch ANN with the label-inequality
    // predicate inside the probed-list scan (not a post-filter)
    "hard_negative_mining" -> ((s, d) => Dedup.hardNegativeMining(s, d)),
    "pq_topk"             -> ((s, d) => Pq.pqTopk(s, d)),
    // learned OPQ rotation in front of the same byte budget
    "pq_topk_opq"         -> ((s, d) => Pq.pqTopkOpq(s, d)),
    "ivfpq_topk"          -> ((s, d) => Pq.ivfpqTopk(s, d)),
    // A18c: the OPQ-residual composition served (FAISS OPQ..,IVF..,PQ..)
    "ivfpq_topk_opq"      -> ((s, d) => Pq.ivfpqTopkOpq(s, d)),
    // A18d: the A4 metadata predicate INSIDE the probed residual scan
    // (selector semi-join + n/f probe widening + starved-filter
    // fallback — the filtered-ANN serving contract)
    "ivfpq_topk_filtered" -> ((s, d) => Pq.ivfpqTopkFiltered(s, d)),
    // A18e: the autotune loop CLOSED on a benched path — the persisted
    // tree serves through the _autotune sidecar's PQ-family pick
    "ivfpq_topk_tuned" -> ((s, d) => Pq.ivfpqTopkTuned(s, d)),
    "ann_topk_batch_pq"   -> ((s, d) => Pq.sdcBatchQuery(s, d)),
    // cosine SDC over the normalized-corpus index (the metric plumbed
    // through the compressed-domain BATCH path, not just point queries)
    "ann_topk_batch_pq_cos" -> ((s, d) =>
      Pq.sdcBatchQuery(s, d, metric = graft.functions.VectorMetric.Cosine)),
    // SDC shortlist + exact re-rank of k*4 survivors (the serving stack)
    "ann_topk_batch_pq_refined" -> ((s, d) => Pq.sdcBatchQuery(s, d, refine = 4)),
    // dot-product SDC batch: dot rides the shared raw-corpus index and
    // codes (Ivf.repr) — only the negated-dot SDC tables differ, so the
    // key costs no extra model build (PqSpec pins its recall vs exact)
    "ann_topk_batch_pq_dot" -> ((s, d) =>
      Pq.sdcBatchQuery(s, d, metric = graft.functions.VectorMetric.Dot)),
    // E6e: batch serving on the RESIDUAL layout — per-cluster query
    // shift row-inlined into the probe frame, on-the-fly ADC fold over
    // M-byte candidate codes (asymmetric ≥ SDC recall at the same bytes)
    "ann_topk_batch_res" -> ((s, d) => Pq.resBatchQuery(s, d)),
    // E6f: the filtered batch — A18d's selector/widening/starved policy
    // composed with the residual batch path (selector semi-joins the
    // candidate side of the pair shuffle; no per-query corpus count)
    "ann_topk_batch_filtered" -> ((s, d) => Pq.resBatchFilteredQuery(s, d)),
    "sq8_topk"            -> ((s, d) => Sq8.sq8Topk(s, d)),
    // binary (1-bit/dim) quantization: hamming shortlist + exact refine
    "bq_topk"             -> ((s, d) => Bq.bqTopk(s, d)),
    // PCA axis-dropping (64->16 dims): reduced-space shortlist + refine
    "pca_topk"            -> ((s, d) => Pca.pcaTopk(s, d)),
    "lang_id"         -> (TextOps.langId _),
    "quality_score"   -> (TextOps.qualityScore _),
    // E36: model-based quality filter — linear classifier logit over
    // engineered features, thresholded at the decision boundary
    "quality_classifier" -> (TextOps.qualityClassifier _),
    // E37: mutual k-NN graph (both endpoints rank each other top-k)
    "knn_graph_mutual" -> ((s, d) => Dedup.knnGraphMutual(s, d)),
    // E37b: the serving twin — same symmetrization over the nprobe
    // batch ANN (E6b's engine) instead of exact probe-all
    "knn_graph_mutual_nprobe" -> ((s, d) => Dedup.knnGraphMutualNprobe(s, d)),
    // E37c: NN-Descent — the at-scale graph BUILDER between probe-all
    // and nprobe lookups: nprobe init, then bounded neighbor-of-
    // neighbor top-k merges to convergence (never a probe-all pass)
    "knn_graph_descent" -> ((s, d) => Dedup.knnGraphDescent(s, d)),
    // E51: graph SERVING — batch beam search (coarse-quantizer entry +
    // bounded expansion rounds) over the converged descent graph
    "graph_topk" -> ((s, d) => GraphIndex.graphTopk(s, d)),
    // E51e: the same serving stack under the L2 metric — the family
    // metric is a per-index invariant (descent, entry, and re-score
    // all run l2), not a hardcoded constant
    "graph_topk_l2" -> ((s, d) =>
      GraphIndex.graphTopk(s, d, metric = graft.functions.VectorMetric.L2)),
    // E51g: the family under DOT (max inner product — the retrieval
    // scoring for unnormalized embeddings): descent, entry, and
    // re-score all rank by negated q·c through the same plumbing —
    // completes the family's metric parity with IVF/PQ (l2/cos/dot)
    "graph_topk_dot" -> ((s, d) =>
      GraphIndex.graphTopk(s, d, metric = graft.functions.VectorMetric.Dot)),
    // E51c: the A18d filtered contract on the graph path — unfiltered
    // navigation, widened beam, selector picked from the scored pool
    "graph_topk_filtered" -> ((s, d) => GraphIndex.graphTopkFilteredQuery(s, d)),
    // E51d: the same contract in the MID-selectivity regime (past the
    // ×16 widening cap, far from starved) — served by the compressed
    // filtered batch, never an O(N·f) nested loop
    "graph_topk_filtered_midsel" -> ((s, d) => GraphIndex.graphTopkFilteredMidselQuery(s, d)),
    // E51b: the persisted graph's lifecycle (build / search-then-link
    // appends / dirty-ratio rebuild / read-back), the A18b shape
    "graph_lifecycle" -> ((s, d) => GraphIndex.graphLifecycle(s, d)),
    // E51f: remove_vector on the graph layout — repair-link delete
    // (in-neighbors inherit the deleted hop's surviving out-neighbors),
    // touched-bucket rewrites, read-backs prove vectors AND edges shrank
    "graph_delete" -> ((s, d) => GraphIndex.graphDelete(s, d)),
    // A26h: the graph family's stats face — symmetrized-degree
    // histogram (hub detection; out-degree is constant k, reverse
    // edges are where hubs form)
    "graph_stats" -> ((s, d) => GraphIndex.graphStats(s, d)),
    // E43: serving-quality dashboard — per-query recall@k histogram
    // of the nprobe tier vs the exact contract, exact integers
    "ann_recall_report" -> ((s, d) => Dedup.annRecallReport(s, d)),
    // E54: the same dashboard for the GRAPH tier — puts the graph
    // family on the selection table next to E43/A24
    "graph_recall_report" -> ((s, d) => GraphIndex.graphRecallReport(s, d)),
    // E50: the nprobe tuning curve (recall@k per grid point vs exact)
    "ann_param_sweep" -> ((s, d) => Autotune.sweepGrid(s, d)),
    // E53: the measured grids' argmin — the operating point picked
    // per recall floor (smallest nprobe; cheapest (tier, refine))
    "ann_autotune" -> ((s, d) => Autotune.annAutotune(s, d)),
    // A27: the MEASURED family-level selection (linear/ivf/ivfpq/graph
    // + operating config) — per-floor argmin over the memoized
    // E50/E53/A26i grids under the stated (cand, bytes, family)
    // objective; closes the selection story A9's heuristic opened
    "index_select" -> ((s, d) => Autotune.indexSelect(s, d)),
    // A28: the manager's DISPATCH role — the A27 pick at the stated
    // floor ROUTES the batch through that family's tuned serving face
    "knn_auto" -> ((s, d) => Autotune.knnAuto(s, d)),
    // A23: one-row index-health summary (list sizes + imbalance
    // permille — the alert signal; index_stats is the detail view)
    "ivf_balance_report" -> (Ivf.ivfBalanceReport _),
    // A24: the quantization TIER-selection curve — recall@k per
    // (tier, refine) vs the exact contract (E50 answers "which
    // nprobe"; this answers "which tier at which refine depth")
    "quant_tier_report" -> ((s, d) => Autotune.tierGrid(s, d)),
    // A25: per-cluster drift vs a persisted baseline profile — the
    // distribution-based rebuild signal beside D12's count-based one
    "index_drift_report" -> ((s, d) => DriftReport.indexDriftReport(s, d)),
    // E49: the MinHash-LSH banding curve (bands×rows grid: raw pair
    // mass, capped candidates, verified recall/precision vs E2's
    // exact graph) — completes the E45/E50/A24 tuning-report family
    "lsh_band_sweep" -> ((s, d) => BandSweep.lshBandSweep(s, d)),
    // E38: k-means-residual embedding outliers (integer-exact test)
    "embedding_outliers" -> (Ivf.embeddingOutliers _),
    // E39: per-source dataset card (counts, exact length percentiles,
    // language mix, quality-gate admission) in one fused scan
    "corpus_profile" -> (TextOps.corpusProfile _),
    // repetition rules (dup-word / top-bigram fractions) — the
    // boilerplate filters E8's composite doesn't cover
    "quality_gopher"  -> (TextOps.qualityGopher _),
    // per-source median/MAD length outliers (robust, integer-exact)
    "quality_outliers_mad" -> ((s, d) => TextOps.qualityOutliersMad(s, d)),
    // temperature (n^1/2) language rebalancing: deterministic
    // hash-ranked subsample to flattened per-lang targets
    "mix_langs_temperature" -> (TextOps.mixLangsTemperature _),
    // E46: the per-source token-budget / epochs planning table
    "token_budget_plan" -> (TextOps.tokenBudgetPlan _),
    // E40: stride-scheduled source interleave — the deterministic
    // training-ORDER stage (weighted fair queueing over sources)
    "mix_schedule_interleave" -> (TextOps.mixScheduleInterleave _),
    // corpus-trained bigram-LM familiarity (integer-quantized; held-out
    // source scored under a model that never saw it)
    "lm_bigram_score" -> ((s, d) => Corpus.lmBigramScore(s, d)),
    // E41: CCNet-style perplexity bucketing + graded resample over
    // E25's integer familiarity (head kept, middle 50%, tail 10%)
    "perplexity_buckets" -> (Corpus.perplexityBuckets _),
    // corpus-wide boilerplate shingles (df over per-doc distinct 3-grams)
    "boilerplate_ngrams" -> ((s, d) => Corpus.boilerplateNgrams(s, d)),
    // PII detect + redact over the deterministically seeded corpus
    "pii_redact"      -> (Corpus.piiRedact _),
    // corpus-wide 10-word-span exact dedup: first occurrence wins,
    // docs reassembled from surviving spans (md5-pinned)
    "dedup_spans"     -> ((s, d) => Corpus.dedupSpans(s, d)),
    // stride-1 sliding-window exact substring dedup (Lee et al. 2021
    // shape): catches >=10-word repeats at ANY alignment, which the
    // fixed-block E26 key misses when the copy is offset
    "dedup_spans_sliding" -> ((s, d) => Corpus.dedupSpansSliding(s, d)),
    // per-doc distinct-trigram novelty in ingestion order
    "ngram_novelty"   -> (Corpus.ngramNovelty _),
    // PMI collocation mining (quantized, min-count floored)
    "collocations_pmi" -> ((s, d) => Corpus.collocationsPmi(s, d)),
    // batch dedup against a persisted fingerprint store (ingest shape)
    "dedup_incremental" -> (Dedup.dedupIncremental _),
    // exact phrase search via positional postings adjacency joins;
    // oracle counts RE2 word-boundary matches — independent algorithm
    "phrase_search"   -> ((s, d) => Search.phraseSearch(s, d)),
    // keyword (BM25) + hybrid RRF retrieval over documents
    "text_search_bm25"  -> ((s, d) => Search.textSearchBm25(s, d)),
    // many queries via the inverted-index JOIN (the general serving
    // form of E18); per-(q,doc) float contributions fold in sorted
    // term order on both engines for bit determinism
    "text_search_bm25_batch" -> ((s, d) => Search.textSearchBm25Batch(s, d)),
    "hybrid_search_rrf" -> ((s, d) => Search.hybridSearchRrf(s, d)),
    "token_count"     -> (TextOps.tokenCount _),
    // learned BPE: bounded word-type collect + driver merge loop...
    "bpe_train"       -> (Bpe.bpeTrain _),
    // ...and its application as a codegen'd per-doc token-count kernel
    "token_count_bpe" -> (Bpe.tokenCountBpe _),
    // E39b: the card's learned-tokenizer slice (per-source BPE volume;
    // rows-only — the merge loop is iterative, BpeSpec pins the rollup)
    "corpus_profile_bpe" -> (Bpe.corpusProfileBpe _),
    "doc_fingerprint" -> (TextOps.docFingerprint _),
    // deterministic corpus shrink + training-shard assignment
    "sample_stratified"  -> (TextOps.sampleStratified _),
    // E55: greedy k-center (farthest-point) coreset over the embedding
    // corpus — the diversity-side complement of semantic_prune: one
    // literal-center scan per round, no shuffle, exact covering radius
    "sample_kcenter" -> ((s, d) => Coreset.sampleKcenter(s, d)),
    // E55b: the batched variant — p farthest per scan (production
    // coreset sizes: 10⁴ centers in 10⁴/p scans; measured trade in
    // CoresetSpec, see the class note)
    "sample_kcenter_batch" -> ((s, d) => Coreset.sampleKcenterBatch(s, d)),
    // E55c: the traversal under cosine distance (angular diversity for
    // normalized-embedding corpora; dot refused — not a metric)
    "sample_kcenter_cos" -> ((s, d) => Coreset.sampleKcenterCos(s, d)),
    "pack_token_shards"  -> ((s, d) => TextOps.packTokenShards(s, d)),
    "pipeline_clean_corpus" -> ((s, d) => TextOps.pipelineCleanCorpus(s, d)),
    // the full cleanup pass: + near-dup CLUSTER canonicalization (E13)
    "pipeline_dedup_corpus" -> ((s, d) => TextOps.pipelineDedupCorpus(s, d)),
    // E59: the same pass under the RefinedWeb keep-best-of-cluster
    // canonical (E57's rule routed into the pipeline's survivor core)
    "pipeline_dedup_corpus_quality" ->
      ((s, d) => TextOps.pipelineDedupCorpusQuality(s, d)),
    // the AT-SCALE fuzzy twin: MinHash-LSH candidates → exact Jaccard
    // verify → star-contraction → same survivor rule (rows-only —
    // xxhash64 candidates; containment + ≥0.95 agreement in DedupSpec)
    "pipeline_fuzzy_dedup" -> ((s, d) => TextOps.pipelineFuzzyDedup(s, d)),
    // E44: per-source per-STAGE attrition funnel of the cleanup pass
    // (raw → lang → quality → exact canon → near-dup survivors)
    "pipeline_attrition_report" -> ((s, d) => TextOps.pipelineAttritionReport(s, d)),
    "multimodal_meta" -> (Multimodal.multimodalMeta _),
    "multimodal_frame_sample" -> ((s, d) => Multimodal.multimodalFrameSample(s, d)),
    "multimodal_resize"       -> ((s, d) => Multimodal.multimodalResize(s, d)),
    // E11d: the BMP pixel buffer DECODED (per-channel integer
    // mean/min/max) — the codec step made real for the 24bpp format
    "multimodal_pixel_stats"  -> ((s, d) => Multimodal.multimodalPixelStats(s, d)),
    // E11e: perceptual image dedup — integer-exact aHash signatures
    // over the decoded BMP pixel stream, exact-signature canon groups
    "multimodal_dedup"        -> ((s, d) => Multimodal.multimodalDedup(s, d)),
    // E11f: banded-energy sign signature over decoded PCM WAV samples
    // (integer-exact like the BMP aHash; amplitude-scale invariant)
    "multimodal_dedup_audio"  -> ((s, d) => Multimodal.multimodalDedupAudio(s, d)),
    // E11g: frame-sampled banded signature over the GV01 byte slices —
    // the modality triple's video member (sampling is the perceptual
    // part; real codecs stay behind the decodeOne stub boundary)
    "multimodal_dedup_video"  -> ((s, d) => Multimodal.multimodalDedupVideo(s, d)),
    // D-series: Structured Streaming jobs (memory-sink execution)
    "stream_window_agg" -> (Streams.streamWindowAgg _),
    "stream_dedup"      -> (Streams.streamDedup _),
    "stream_session"    -> (Streams.streamSession _),
    "stream_enrich"     -> (Streams.streamEnrich _),
    "stream_join"       -> (Streams.streamJoin _),
    "stream_anomaly"    -> (Streams.streamAnomaly _),
    "stream_knn"        -> (Streams.streamKnn _),
    // streaming twin of the C16 funnel: per-user stage machine in
    // flatMapGroupsWithState, append-mode transition rows
    "stream_funnel"     -> (Streams.streamFunnel _),
    // streaming twin of C22: the Space-Saving buffer IS the state —
    // fixed-size at any stream length, merged across micro-batches
    "stream_heavy_hitters" -> (Streams.streamHeavyHitters _),
    // D10: continuous-ingest dedup — each micro-batch anti-joins the
    // persisted fingerprint store, survivors' hashes are absorbed
    "stream_dedup_incremental" -> (Streams.streamDedupIncremental _),
    // D10b: the SAME ingest over three range-ordered triggers with the
    // store compacted MID-STREAM between checkpoint commits — the
    // maintenance step composed with a live query
    "stream_dedup_compacted" -> (Streams.streamDedupCompacted _),
    // D11: streaming quality gate — E36 scored in-flight, per-source
    // admission counts as the one stateful aggregation
    "stream_quality_filter" -> (Streams.streamQualityFilter _),
    // D12: continuous embedding ingest into the persisted IVF-PQ index —
    // foreachBatch → PqLifecycle.append per trigger (frozen model,
    // crash-consistent staging), state + disk read-back as the output
    "stream_index_append" -> (Streams.streamIndexAppend _),
    // D17: the same continuous-ingest lifecycle into the 256x BQ tier
    // (frozen-threshold encode per trigger, mid-stream compaction of
    // the accreted buckets, rebuild closing the fired policy)
    "stream_bq_append" -> (Streams.streamBqAppend _),
    // D15: the continuous-ingest lifecycle for the GRAPH index family —
    // per-trigger search-then-link + dirt + policy-fired re-descent
    "stream_graph_append" -> (Streams.streamGraphAppend _),
    // D16: continuous CORESET maintenance — per-trigger threshold
    // admission (the doubling-algorithm insertion) against a persisted
    // center store; equals the batch sequential scan by construction
    "stream_kcenter" -> ((s, d) => Streams.streamKcenter(s, d)),
    // D16b: the same continuous coreset under COSINE — the angular
    // exemplar set a normalized-embedding ingest maintains (round 15:
    // radius calibrated through the cosine k-center chain, same
    // threshold admission, same batch-split invariance)
    "stream_kcenter_cos" -> ((s, d) =>
      Streams.streamKcenter(s, d, graft.functions.VectorMetric.Cosine)),
    // D13: continuous FUZZY-dedup ingest — arrivals near-dup-checked
    // against a persisted MinHash signature store per micro-batch
    // (rows-only: xxhash64 minhashes; StreamsSpec multi-batch proof)
    "stream_dedup_fuzzy" -> (Streams.streamDedupFuzzy _),
    // D13b: the periodic component reconciliation over D13's
    // accumulated signature store — the canonical-survivor delta the
    // stream's conservative greedy policy leaves for the batch
    // periodical (rows-only: same xxhash64 reason as D13)
    "stream_dedup_reconcile" -> (Streams.streamDedupReconcile _),
    // D14: continuous-ingest attrition funnel (lang/quality/exact-canon
    // stages per micro-batch; the streaming face of E44)
    "stream_attrition" -> (Streams.streamAttrition _),
    // C-series: analytics engine
    "q1_pricing_summary" -> (Analytics.q1PricingSummary _),
    "q3_topk_join"       -> (Analytics.q3TopkJoin _),
    "q5_multijoin"       -> (Analytics.q5MultiJoin _),
    "window_topn"        -> (Analytics.windowTopn _),
    "events_window_agg"  -> (Analytics.eventsWindowAgg _),
    "events_sessionize"  -> (Analytics.eventsSessionize _),
    "events_json_extract" -> (Analytics.eventsJsonExtract _),
    "q4_semijoin"         -> (Analytics.q4SemiJoin _),
    "part_type_revenue"   -> (Analytics.partTypeRevenue _),
    "rollup_revenue"      -> (Analytics.rollupRevenue _),
    "events_sketch"       -> (Analytics.eventsSketch _),
    // fixed-memory Space-Saving heavy hitters (exact at this capacity,
    // eviction regime spec-pinned with synthetic skew)
    "events_heavy_hitters" -> (Analytics.eventsHeavyHitters _),
    // incremental view maintenance: persisted aggregate + O(delta)
    // merge, served from disk; oracle = the full recompute
    "agg_incremental"      -> (Analytics.aggIncremental _),
    // incremental SCD2 history: close touched current rows at the
    // delta's first ts, chain the delta, untouched rows pass through;
    // oracle = the full rebuild
    "scd2_upsert"          -> (Analytics.scd2Upsert _),
    "q17_small_qty_revenue"    -> (Analytics.q17SmallQtyRevenue _),
    "customers_without_orders" -> (Analytics.customersWithoutOrders _),
    "events_moving_avg"        -> (Analytics.eventsMovingAvg _),
    // AS-OF join (last click at-or-before each purchase) via the
    // union+running-window re-expression — O(C+P), no range-join blowup
    "events_asof_join"         -> (Analytics.eventsAsofJoin _),
    // ordered view→click→purchase funnel: one shuffle, chained
    // running-flag windows instead of a 3-way self-join
    "events_funnel"            -> (Analytics.eventsFunnel _),
    // weekly cohort retention triangle (first-week cohorts × active weeks)
    "events_cohort_retention"  -> (Analytics.eventsCohortRetention _),
    // pure-range-predicate join (±60 s concurrency) via bin-bucketing:
    // bin equality + adjacent-bin explode replaces the BNLJ/cartesian
    // Spark would otherwise plan (PlanSpec pins the no-BNLJ shape)
    "events_range_join"        -> (Analytics.eventsRangeJoin _),
    // exact grouped percentiles (discrete, integer-index arithmetic);
    // the fixed-memory twin at scale is events_sketch's GK quantiles
    "events_percentiles"       -> (Analytics.eventsPercentiles _),
    // bucketed co-located fact-fact join: pay the shuffle once at
    // layout time, never at query time (PlanSpec pins zero exchanges
    // below the join)
    "bucketed_join"            -> (Analytics.bucketedJoin _),
    // date-partitioned fact + data-dependent day set: Catalyst DPP
    // prunes the fact scan to the qualifying partitions at runtime
    "dpp_join"                 -> (Analytics.dppJoin _),
    // runtime bloom filter on a NON-partition join key: might_contain
    // pushed to the fact scan drops rows before the shuffle
    "bloom_join"               -> (Analytics.bloomJoin _),
    // ANALYZE-style per-column stats in one Expand scan (exact
    // distinct; the 100 TB variant swaps in the HLL sketch)
    "profile_events"           -> (Analytics.profileEvents _),
    // resample to a dense per-user daily grid + forward fill
    "events_gap_fill"          -> (Analytics.eventsGapFill _),
    // TPC-H Q10-style returned-item report: both selective filters
    // below the fact-fact shuffle, nation broadcast, bounded top-20
    "q10_returned_items"       -> (Analytics.q10ReturnedItems _),
    // per-doc top-3 tf-idf keywords: the inverted-index BUILD shape,
    // integer-quantized idf so scores are exact BIGINTs cross-engine
    "keyword_extract_tfidf"    -> ((s, d) => Search.keywordExtractTfidf(s, d)),
  )

  /** DuckDB-runnable oracle SQL per query key (same column names). */
  def oracleSql: Map[String, String] = Map(
    "knn_linear_l2"       -> VectorQueries.knnLinearL2OracleSql,
    "knn_linear_cosine"   -> VectorQueries.knnLinearCosineOracleSql,
    "knn_text_query"      -> VectorQueries.knnTextQueryOracleSql,
    "knn_metadata_filter" -> VectorQueries.knnMetadataFilterOracleSql,
    "knn_threshold"       -> VectorQueries.knnThresholdOracleSql,
    "knn_exact_topk"      -> VectorQueries.knnExactTopkOracleSql,
    // ivf_query probes all lists => exact k-NN, same contract as A1
    // (ivf_query_nprobe is rows-only: approximate by design, recall
    // pinned in IvfSpec)
    "ivf_query"           -> VectorQueries.knnLinearL2OracleSql,
    // the deterministic quantized tiers: the SQ8/BQ models are single
    // corpus aggregations, so DuckDB re-derives them inline and
    // replays encode + shortlist + refine end-to-end (PCA needs its
    // trained basis as literals → dynamicOracleSql)
    "sq8_topk"            -> Sq8.sq8TopkOracleSql,
    "bq_topk"             -> Bq.bqTopkOracleSql,
    "index_recommend"     -> Library.indexRecommendOracleSql(),
    "index_lifecycle"     -> IndexLifecycle.indexLifecycleOracleSql,
    "index_delete"        -> IndexLifecycle.indexDeleteOracleSql,
    "ivfpq_lifecycle"     -> PqLifecycle.ivfpqLifecycleOracleSql,
    "sq8_lifecycle"       -> Sq8Lifecycle.sq8LifecycleOracleSql,
    "bq_lifecycle"        -> BqLifecycle.bqLifecycleOracleSql,
    "pca_lifecycle"       -> PcaLifecycle.pcaLifecycleOracleSql,
    "index_compact"       -> IndexLifecycle.indexCompactOracleSql,
    "tier_compact"        -> TierLifecycle.tierCompactOracleSql,
    // E51b: the graph lifecycle's state arithmetic (append dirt,
    // threshold crossing, rebuild reset, read-back size)
    "graph_lifecycle"     -> GraphIndex.graphLifecycleOracleSql,
    // E51f: delete state arithmetic + the two disk read-backs
    // (_vectors shrank; zero surviving edges reference a deleted id)
    "graph_delete"        -> GraphIndex.graphDeleteOracleSql,
    "validate_chunks"     -> Validate.validateChunksOracleSql,
    "validate_documents"  -> Validate.validateDocumentsOracleSql,
    "validate_libraries"  -> Validate.validateLibrariesOracleSql,
    "validate_embeddings" -> Validate.validateEmbeddingsOracleSql,
    "library_stats"       -> Library.libraryStatsOracleSql,
    "index_memory_stats"  -> Library.indexMemoryStatsOracleSql(),
    "library_pagination"  -> Library.libraryPaginationOracleSql(),
    "cascade_delete"      -> Library.cascadeDeleteOracleSql,
    "upsert_latest"       -> Library.upsertLatestOracleSql,
    "chunk_documents"  -> TextOps.chunkDocumentsOracleSql,
    "embed_chunks"     -> TextOps.embedChunksOracleSql(),
    "doc_stats"        -> TextOps.docStatsOracleSql,
    "chunk_pagination" -> TextOps.chunkPaginationOracleSql(),
    "doc_pagination"   -> TextOps.docPaginationOracleSql(),
    "dedup_exact"         -> Dedup.dedupExactOracleSql,
    // E4: full simhash replay (md5 word-hash halves, vote sums,
    // banding + cap, hamming) — oracle-backed since round 12
    "dedup_simhash"       -> Dedup.dedupSimhashOracleSql,
    "dedup_exact_normalized" -> Dedup.dedupExactNormalizedOracleSql,
    "ngram_jaccard_pairs" -> Dedup.ngramJaccardOracleSql,
    "dedup_components"    -> Dedup.dedupComponentsOracleSql,
    // E57: the E13 closure + the E8 score CTE + QUALIFY argmax
    "dedup_components_quality" -> Dedup.dedupComponentsQualityOracleSql,
    "split_leakage_free"  -> Dedup.splitLeakageFreeOracleSql,
    "semantic_prune"      -> Dedup.semanticPruneOracleSql,
    "dedup_cluster_stats" -> Dedup.dedupClusterStatsOracleSql,
    "source_overlap"      -> Corpus.sourceOverlapOracleSql,
    "corpus_snapshot_diff" -> Corpus.corpusSnapshotDiffOracleSql,
    "dsir_select"         -> Corpus.dsirSelectOracleSql,
    "decontaminate_eval"  -> Dedup.decontaminateEvalOracleSql,
    "contamination_matrix" -> Dedup.contaminationMatrixOracleSql,
    "decontaminate_ngram_exact" -> Dedup.decontaminateNgramExactOracleSql,
    "embedding_neardup"   -> Dedup.embeddingNeardupOracleSql,
    "dedup_threshold_sweep" -> Dedup.dedupThresholdSweepOracleSql,
    "ann_topk_batch"      -> Dedup.annTopkBatchOracleSql(),
    // E56: nested exact-shortlist replay + k−1 unrolled greedy rounds
    // (GREATEST penalty fold + QUALIFY argmax)
    "ann_topk_mmr"        -> Mmr.annTopkMmrOracleSql(),
    // E58: the same fold generator unrolled per λ over ONE cv/ps block
    "mmr_lambda_sweep"    -> Mmr.mmrLambdaSweepOracleSql(),
    "hard_negative_mining" -> Dedup.hardNegativeMiningOracleSql(),
    "lang_id"         -> TextOps.langIdOracleSql,
    "quality_score"   -> TextOps.qualityScoreOracleSql,
    "quality_classifier" -> TextOps.qualityClassifierOracleSql,
    "corpus_profile"     -> TextOps.corpusProfileOracleSql,
    "knn_graph_mutual"   -> Dedup.knnGraphMutualOracleSql(),
    // D11 ≡ the same classifier + per-source rollup in batch SQL
    "stream_quality_filter" -> TextOps.qualityClassifierRollupOracleSql,
    "stream_index_append"   -> Streams.streamIndexAppendOracleSql,
    "stream_bq_append"      -> Streams.streamBqAppendOracleSql,
    "stream_graph_append"   -> Streams.streamGraphAppendOracleSql,
    "stream_attrition"      -> TextOps.attritionIngestOracleSql(),
    "quality_gopher"  -> TextOps.qualityGopherOracleSql,
    "quality_outliers_mad" -> TextOps.qualityOutliersMadOracleSql(),
    "mix_langs_temperature" -> TextOps.mixLangsTemperatureOracleSql,
    "token_budget_plan" -> TextOps.tokenBudgetPlanOracleSql,
    "mix_schedule_interleave" -> TextOps.mixScheduleInterleaveOracleSql,
    "lm_bigram_score" -> Corpus.lmBigramScoreOracleSql,
    "perplexity_buckets" -> Corpus.perplexityBucketsOracleSql,
    "boilerplate_ngrams" -> Corpus.boilerplateNgramsOracleSql,
    "pii_redact"      -> Corpus.piiRedactOracleSql,
    "dedup_spans"     -> Corpus.dedupSpansOracleSql,
    "dedup_spans_sliding" -> Corpus.dedupSpansSlidingOracleSql,
    "ngram_novelty"   -> Corpus.ngramNoveltyOracleSql,
    "collocations_pmi" -> Corpus.collocationsPmiOracleSql,
    "dedup_incremental" -> Dedup.dedupIncrementalOracleSql,
    "phrase_search"   -> Search.phraseSearchOracleSql(),
    "text_search_bm25"  -> Search.textSearchBm25OracleSql(),
    "text_search_bm25_batch" -> Search.textSearchBm25BatchOracleSql(),
    "hybrid_search_rrf" -> Search.hybridSearchRrfOracleSql(),
    "token_count"     -> TextOps.tokenCountOracleSql,
    "doc_fingerprint" -> TextOps.docFingerprintOracleSql,
    "sample_stratified" -> TextOps.sampleStratifiedOracleSql,
    // E55: T−1 unrolled least-update + argmax CTE blocks (static SQL —
    // the seed is min(vec_id) in-query)
    "sample_kcenter" -> Coreset.sampleKcenterOracleSql(),
    // E55b: R unrolled top-p + grouped min-over-batch LEAST blocks
    "sample_kcenter_batch" -> Coreset.sampleKcenterBatchOracleSql(),
    // E55c: the same generator under the cosine distance template
    "sample_kcenter_cos" -> Coreset.sampleKcenterOracleSql(
      metric = graft.functions.VectorMetric.Cosine),
    "pack_token_shards" -> TextOps.packTokenShardsOracleSql(),
    "pipeline_clean_corpus" -> TextOps.pipelineCleanCorpusOracleSql(),
    "pipeline_dedup_corpus" -> TextOps.pipelineDedupCorpusOracleSql(),
    "pipeline_dedup_corpus_quality" ->
      TextOps.pipelineDedupCorpusQualityOracleSql(),
    "pipeline_attrition_report" -> TextOps.pipelineAttritionReportOracleSql(),
    "multimodal_meta" -> Multimodal.multimodalMetaOracleSql,
    "multimodal_frame_sample" -> Multimodal.multimodalFrameSampleOracleSql(),
    "multimodal_resize"       -> Multimodal.multimodalResizeOracleSql(),
    "multimodal_pixel_stats"  -> Multimodal.multimodalPixelStatsOracleSql,
    // E11e: bytes recomputed from source text, same cross-multiplied
    // bit rule and two-BIGINT packing
    "multimodal_dedup"        -> Multimodal.multimodalDedupOracleSql,
    "multimodal_dedup_audio"  -> Multimodal.multimodalDedupAudioOracleSql,
    "multimodal_dedup_video"  -> Multimodal.multimodalDedupVideoOracleSql(),
    // streaming twins ARE oracle-checkable: D1 ≡ C5-shaped SQL,
    // D3 ≡ C6, D2 ≡ count-by-type (source has no duplicate event_ids)
    "stream_window_agg" -> Analytics.eventsWindowAggOracleSql,
    "stream_dedup"      ->
      """SELECT event_type, count(*) AS n_events FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_session"    -> Analytics.eventsSessionizeOracleSql,
    "stream_enrich"     ->
      """SELECT coalesce(c_mktsegment, 'unknown') AS segment, count(*) AS n_events
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_join"       ->
      """SELECT c.user_id AS user_id, count(*) AS n_pairs
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // D8 ≡ C16: the funnel stage machine's reach counts equal the
    // batch window-chain SQL
    "stream_funnel"     -> Analytics.eventsFunnelOracleSql,
    // D9 ≡ C22 (exact regime: capacity ≥ user domain at every test SF)
    "stream_heavy_hitters" -> Analytics.eventsHeavyHittersOracleSql,
    // D10 ≡ E1b on the final state: one-file landing zone → identical
    // arg-min domain; cross-batch drops pinned by StreamsSpec
    "stream_dedup_incremental" -> Dedup.dedupIncrementalOracleSql,
    // D10b ≡ the same SQL: range-ordered landing makes first-arrival
    // coincide with the global arg-min across all three triggers
    "stream_dedup_compacted" -> Dedup.dedupIncrementalOracleSql,
    // exact-integer twin of the running-mean anomaly rule:
    // cents*n_prior > 2*sum_prior_cents, prior rows in (ts, event_id) order
    "stream_anomaly"    ->
      """WITH w AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value*100) AS BIGINT) AS cents,
        |    sum(CAST(round(value*100) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sum_prior,
        |    count(*) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_prior
        |  FROM events)
        |SELECT user_id, event_id FROM w
        |WHERE n_prior >= 3 AND cents * n_prior > 2 * sum_prior
        |ORDER BY user_id, event_id""".stripMargin,
    // D7: batch twin of the streaming vector search — the fake
    // embedding formula is SQL-expressible (same parity contract as
    // embed_chunks/knn_text_query), nearest neighbor by cosine with
    // vec_id tie-break, then the per-label rollup
    "stream_knn" ->
      """WITH t AS (SELECT DISTINCT event_type FROM events),
        |f AS (SELECT event_type, trim(lower(event_type)) AS clean FROM t),
        |feats AS (
        |  SELECT event_type,
        |    CAST(list_sum(list_transform(string_split(clean, ''), x -> ord(x))) AS BIGINT) AS char_sum,
        |    CAST(length(clean) AS BIGINT) AS len,
        |    CAST(len(string_split_regex(clean, '\s+')) AS BIGINT) AS words
        |  FROM f),
        |qv AS (
        |  SELECT event_type,
        |    list_transform(range(0, 64), i ->
        |      ((char_sum*(i+1) + len*(i+7) + words*(i+13)) % 1000)/1000.0 - 0.5) AS qvec
        |  FROM feats),
        |best AS (
        |  SELECT event_type, label FROM (
        |    SELECT qv.event_type, e.label,
        |      row_number() OVER (PARTITION BY qv.event_type
        |        ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qvec), e.vec_id) AS rn
        |    FROM qv CROSS JOIN embeddings e) WHERE rn = 1)
        |SELECT label, count(*) AS n_events
        |FROM events JOIN best USING (event_type)
        |GROUP BY label ORDER BY label""".stripMargin,
    "q1_pricing_summary" -> Analytics.q1OracleSql,
    "q3_topk_join"       -> Analytics.q3OracleSql,
    "q5_multijoin"       -> Analytics.q5OracleSql,
    "window_topn"        -> Analytics.windowTopnOracleSql,
    "events_window_agg"  -> Analytics.eventsWindowAggOracleSql,
    "events_sessionize"  -> Analytics.eventsSessionizeOracleSql,
    "events_json_extract" -> Analytics.eventsJsonExtractOracleSql,
    "q4_semijoin"         -> Analytics.q4SemiJoinOracleSql,
    "part_type_revenue"   -> Analytics.partTypeRevenueOracleSql,
    "rollup_revenue"      -> Analytics.rollupRevenueOracleSql,
    "q17_small_qty_revenue"    -> Analytics.q17OracleSql,
    "events_heavy_hitters"     -> Analytics.eventsHeavyHittersOracleSql,
    "agg_incremental"          -> Analytics.aggIncrementalOracleSql,
    "scd2_upsert"              -> Analytics.scd2UpsertOracleSql,
    "customers_without_orders" -> Analytics.customersWithoutOrdersOracleSql,
    "events_moving_avg"        -> Analytics.eventsMovingAvgOracleSql,
    "events_asof_join"         -> Analytics.eventsAsofJoinOracleSql,
    "events_funnel"            -> Analytics.eventsFunnelOracleSql,
    "events_cohort_retention"  -> Analytics.eventsCohortRetentionOracleSql,
    "events_range_join"        -> Analytics.eventsRangeJoinOracleSql,
    "events_percentiles"       -> Analytics.eventsPercentilesOracleSql,
    "bucketed_join"            -> Analytics.bucketedJoinOracleSql,
    "dpp_join"                 -> Analytics.dppJoinOracleSql,
    "bloom_join"               -> Analytics.bloomJoinOracleSql,
    "profile_events"           -> Analytics.profileEventsOracleSql,
    "events_gap_fill"          -> Analytics.eventsGapFillOracleSql,
    "q10_returned_items"       -> Analytics.q10OracleSql,
    "keyword_extract_tfidf"    -> Search.keywordExtractTfidfOracleSql(),
  )

  /** Oracles whose SQL embeds SESSION-TRAINED literals (the PCA basis
    * is a driver-side eigendecomposition DuckDB cannot re-derive).
    * Verify merges these into oracle_sql.json after filtering, so the
    * literals come from the same trained model that produced the
    * parquet outputs — the knn_text_query literal pattern, generated
    * at dump time instead of compile time.
    */
  def dynamicOracleSql: Map[String, (SparkSession, String) => String] = Map(
    "pca_topk" -> ((s, d) => Pca.pcaTopkOracleSql(s, d)),
    // the IVF family's trained model is deterministic and memoized, so
    // Verify inlines the session's centroids as literals and DuckDB
    // replays assignment / probe selection / probed top-k end-to-end
    "ivf_build"             -> ((s, d) => Ivf.ivfBuildOracleSql(s, d)),
    "index_stats"           -> ((s, d) => Ivf.indexStatsOracleSql(s, d)),
    "ivf_query_nprobe"      -> ((s, d) => Ivf.ivfQueryNprobeOracleSql(s, d)),
    "ann_topk_batch_nprobe" -> ((s, d) => Ivf.annBatchNprobeOracleSql(s, d)),
    // E56b: the shared MMR fold generator over the nested nprobe
    // shortlist replay (one generator, two shortlist sources)
    "ann_topk_mmr_nprobe" -> ((s, d) => Mmr.annTopkMmrNprobeOracleSql(s, d)),
    // E37b: the E6b oracle as a derived table + the mutual join
    "knn_graph_mutual_nprobe" -> ((s, d) => Dedup.knnGraphMutualNprobeOracleSql(s, d)),
    // E37c: the E6b init replay + the applied NN-Descent rounds
    // unrolled as CTE blocks (iteration count from the converged run)
    "knn_graph_descent" -> ((s, d) => Dedup.knnGraphDescentOracleSql(s, d)),
    // D16: the E55 radius replay + the unrolled threshold-admission
    // chain (block count from the memoized sequential scan)
    "stream_kcenter" -> ((s, d) => Coreset.streamKcenterOracleSql(s, d)),
    // D16b: the unrolled threshold chain under the cosine template
    "stream_kcenter_cos" -> ((s, d) => Coreset.streamKcenterOracleSql(s, d,
      graft.functions.VectorMetric.Cosine)),
    // E51: the descent replay nested as the graph + entry replay +
    // unrolled beam rounds
    "graph_topk" -> ((s, d) => GraphIndex.graphTopkOracleSql(s, d)),
    // E51e: the same replay chain under the l2 distance template
    "graph_topk_l2" -> ((s, d) => GraphIndex.graphTopkOracleSql(s, d,
      metric = graft.functions.VectorMetric.L2)),
    // E51g: and under the negated-inner-product template (MIPS)
    "graph_topk_dot" -> ((s, d) => GraphIndex.graphTopkOracleSql(s, d,
      metric = graft.functions.VectorMetric.Dot)),
    // A26i: four suffixed beam chains over one substrate replay + hit
    // counts vs the exact contract + the same (cost, rounds, beam)
    // argmin SQL
    "graph_autotune" -> ((s, d) => GraphIndex.graphAutotuneOracleSql(s, d)),
    // A26l/A26m: the same grid replay under the l2 / negated-dot
    // distance templates, hit counts vs their own exact contracts
    "graph_autotune_l2" -> ((s, d) => GraphIndex.graphAutotuneOracleSql(s, d,
      metric = graft.functions.VectorMetric.L2)),
    "graph_autotune_dot" -> ((s, d) => GraphIndex.graphAutotuneOracleSql(s, d,
      metric = graft.functions.VectorMetric.Dot)),
    // A26j: the beam chain at the re-derived tuned operating point
    "graph_topk_tuned" -> ((s, d) => GraphIndex.graphTopkTunedOracleSql(s, d)),
    // A26n/A26o: the tuned replay at each metric's re-derived pick
    "graph_topk_tuned_l2" -> ((s, d) => GraphIndex.graphTopkTunedOracleSql(s, d,
      metric = graft.functions.VectorMetric.L2)),
    "graph_topk_tuned_dot" -> ((s, d) => GraphIndex.graphTopkTunedOracleSql(s, d,
      metric = graft.functions.VectorMetric.Dot)),
    // A26k: the widened-probe stored-layout replay (selector on the
    // stored side, self included — the arbitrary-batch contract)
    "graph_topk_filtered_persisted" ->
      ((s, d) => GraphIndex.graphTopkFilteredPersistedOracleSql(s, d)),
    // E51c: the beam replay at the widened width, pooled + selector
    "graph_topk_filtered" -> ((s, d) => GraphIndex.graphTopkFilteredOracleSql(s, d)),
    // E51d: the cosine residual-batch replay at the capped widened
    // probe count + selector candidate join + exact-refine tail
    "graph_topk_filtered_midsel" -> ((s, d) => GraphIndex.graphTopkFilteredMidselOracleSql(s, d)),
    // A26h: the descent replay symmetrized + the two-level count fold
    "graph_stats" -> ((s, d) => GraphIndex.graphStatsOracleSql(s, d)),
    // E43: exact-window ∩ nprobe-replay, folded to the hit histogram
    "ann_recall_report" -> ((s, d) => Dedup.annRecallReportOracleSql(s, d)),
    // E54: exact-window ∩ the full graph-serving replay, same fold
    "graph_recall_report" -> ((s, d) => GraphIndex.graphRecallReportOracleSql(s, d)),
    // E50: UNION ALL of per-nprobe E43 blocks over the same literals
    "ann_param_sweep" -> ((s, d) => Dedup.annParamSweepOracleSql(s, d)),
    // E53: both grid replays nested + the same per-floor argmin
    "ann_autotune" -> ((s, d) => Autotune.annAutotuneOracleSql(s, d)),
    // A27: the three grid replays nested + the family-cost arithmetic
    // + the same (cand, bytes, family) argmin
    "index_select" -> ((s, d) => Autotune.indexSelectOracleSql(s, d)),
    // A28: the same family argmin replayed over the memoized grids,
    // then the routed family's own serving oracle verbatim
    "knn_auto" -> ((s, d) => Autotune.knnAutoOracleSql(s, d)),
    // A23: assignment replay → the same list-size aggregate arithmetic
    "ivf_balance_report" -> ((s, d) => Ivf.ivfBalanceReportOracleSql(s, d)),
    // A24: all five tiers' encode + shortlist + re-rank replayed over
    // the session models (SQ8/BQ inline; PQ/OPQ/PCA literals)
    "quant_tier_report" -> ((s, d) => QuantReport.quantTierReportOracleSql(s, d)),
    // A25: assignment + residual replay over the centroid literal,
    // both state profiles from the same deterministic split
    "index_drift_report" -> ((s, d) => DriftReport.indexDriftReportOracleSql(s, d)),
    // the hyperplane matrix is seeded, so the LSH banding replays too
    "embedding_neardup_lsh" -> ((s, d) => Dedup.embeddingNeardupLshOracleSql(s, d)),
    // the PQ family: codebooks/rotation/ADC tables inlined, encode
    // argmin + ADC/SDC partial sums + refine replayed op-for-op
    "pq_topk"     -> ((s, d) => Pq.pqTopkOracleSql(s, d)),
    "pq_topk_opq" -> ((s, d) => Pq.pqTopkOpqOracleSql(s, d)),
    "ivfpq_topk"  -> ((s, d) => Pq.ivfpqTopkOracleSql(s, d)),
    "ivfpq_topk_opq" -> ((s, d) => Pq.ivfpqTopkOpqOracleSql(s, d)),
    // A18d: the widened-probe residual replay with the selector
    // semi-joined into the ADC candidate set (branch arithmetic shared
    // with the engine)
    "ivfpq_topk_filtered" -> ((s, d) => Pq.ivfpqTopkFilteredOracleSql(s, d)),
    // A18e: the A18 replay at the tuned operating point (the pick
    // re-derived from the same restricted-grid argmin + gate fallback)
    "ivfpq_topk_tuned" -> ((s, d) => Pq.ivfpqTopkTunedOracleSql(s, d)),
    "ann_topk_batch_pq" -> ((s, d) => Pq.sdcBatchOracleSql(s, d)),
    "ann_topk_batch_pq_cos" -> ((s, d) =>
      Pq.sdcBatchOracleSql(s, d, metric = graft.functions.VectorMetric.Cosine)),
    "ann_topk_batch_pq_refined" -> ((s, d) => Pq.sdcBatchOracleSql(s, d, refine = 4)),
    "ann_topk_batch_pq_dot" -> ((s, d) =>
      Pq.sdcBatchOracleSql(s, d, metric = graft.functions.VectorMetric.Dot)),
    // E6e: residual batch — qr = q − centroid in exact doubles per
    // probe row; pair distance replays as list_distance(qr, recon)
    "ann_topk_batch_res" -> ((s, d) => Pq.resBatchOracleSql(s, d)),
    // E6f: the same replay at the WIDENED probe count + selector join
    "ann_topk_batch_filtered" -> ((s, d) => Pq.resBatchFilteredOracleSql(s, d)),
    // E38: residual outliers over the same centroid-literal replay
    "embedding_outliers" -> ((s, d) => Ivf.embeddingOutliersOracleSql(s, d)),
    // E33b: within-cluster SemDeDup — assignment replayed, same closure
    "semantic_prune_clustered" -> ((s, d) => Dedup.semanticPruneClusteredOracleSql(s, d)),
  )
}
