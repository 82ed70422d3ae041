package graft.streaming

import graft.Tables
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** D-series: Structured Streaming jobs over the events stream — the
  * scale path the reference (a point-serving in-memory store) lacks.
  * Each job is a pure transformation `Dataset[Event] => DataFrame`
  * shared by two harnesses:
  *   - the DRIVER path tails the events parquet through a file source
  *     (`Sources.streamDir`) — the production landing-zone shape; no
  *     driver-side collect touches the data, so the same code runs
  *     against a 100 TB directory;
  *   - the spec path feeds a MemoryStream, asserting batch equivalence
  *     (StreamsSpec) and file≡memory harness agreement.
  *
  * Scale notes: every job bounds its state with a watermark (late data
  * past 1 hour is dropped, window/session state is purged as the
  * watermark advances), so executor state stays proportional to the
  * active window, not the stream history. Sessionization uses Spark's
  * native session_window (merging-window state in Tungsten) rather than
  * a hand-rolled flatMapGroupsWithState — same semantics, codegen'd
  * state handling.
  */
object Streams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The events table as a real file-streamed source. Callers pass the
    * scoped streaming session from [[streamingSession]] — this function
    * mutates no conf.
    *
    * A file stream needs an explicit schema, and the `ts` storage
    * encoding has changed between testdata generations (long nanos →
    * TIMESTAMP_NTZ micros) — round 5 hard-coded the nanos layout and
    * compressed every streamed timestamp 1000×. Probe the actual
    * on-disk type with ONE batch footer read (metadata only, no data
    * scan — the same cost as any scan's planning step), then normalize
    * through the same Tables.normalizeTs guard the batch reader uses,
    * so batch and stream can never again disagree on an encoding.
    */
  private def eventFileStream(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    // probe the SAME glob the stream tails (a file named events.parq
    // must not stream under one schema and probe under another). The
    // empty-landing-zone fallback is gated on an explicit file-listing
    // check, NOT a broad AnalysisException catch: only "no files have
    // arrived yet" assumes the current generation's encoding (NTZ
    // micros, with the first arriving file of any other encoding
    // failing the stream loudly) — a corrupt footer, a missing ts
    // column, or a permission failure on an EXISTING file surfaces the
    // real probe error instead of constructing a stream with a guessed
    // schema (round-6 advice)
    val glob = s"$dir/events.parq*"
    val hPath = new org.apache.hadoop.fs.Path(glob)
    val matches = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .globStatus(hPath)
    val tsOnDisk =
      if (matches == null || matches.isEmpty)
        org.apache.spark.sql.types.TimestampNTZType
      else spark.read.parquet(glob).schema("ts").dataType
    val fileSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsOnDisk),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // glob form: the events table is a single file in the sf dir; the
    // file source wants a directory basePath, the glob selects the file
    val raw = Sources.streamDir(spark, s"$dir/events.parq*", fileSchema,
      options = Map("basePath" -> dir))
    Tables.normalizeTs(raw)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
  }

  /** A child session scoped to one streaming run. Streaming wants its
    * own conf (state-partition count, nanos-as-long parquet reads) —
    * setting those on the shared session would silently apply them to
    * any concurrently running batch query, so each run gets a
    * newSession() (same SparkContext + cached data, separate conf and
    * temp-view catalog) and the parent session is never touched.
    */
  private def streamingSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", StreamShufflePartitions)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }

  /** Stateful-op parallelism for the local harness. Each shuffle
    * partition materializes its own state store instance (per join
    * side, per operator) with per-batch checkpoint deltas — at local
    * event volumes the job cost is store/checkpoint I/O, not data, so
    * 32 partitions quadruple the overhead for nothing. A production
    * deployment sizes this to sustained input rate; the state
    * partition count is fixed at the first checkpoint, so it is a
    * per-query deployment decision either way.
    */
  val StreamShufflePartitions = "8"

  /** Drive a streaming frame into a memory sink, return the sink
    * contents once the source is drained. The frame's session is the
    * scoped child from [[streamingSession]], so no shared conf is
    * touched here.
    */
  private def sinkOf(streamDf: DataFrame, outputMode: String): DataFrame = {
    val spark = streamDf.sparkSession
    val sink = s"graft_stream_sink_${counter.incrementAndGet()}"
    // Memory-sink harness checkpoints land on tmpfs when available:
    // the state store fsyncs per-batch delta files into the checkpoint,
    // and on this virtualized disk that I/O dominated the jobs with
    // run-to-run swings of 2.8→18.7s on identical inputs. The DURABLE
    // path (Sources.streamToParquet) still takes an explicit, real
    // checkpoint dir — only the drain-to-memory harness is ephemeral
    // by construction, so RAM-backed checkpoints lose nothing.
    val ckptBase = if (java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get("/dev/shm"))) "/dev/shm" else
      System.getProperty("java.io.tmpdir")
    val ckpt = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(ckptBase), "graft_ckpt")
    val q = streamDf
      .writeStream.format("memory").queryName(sink).outputMode(outputMode)
      .option("checkpointLocation", ckpt.toString)
      .start()
    try { q.processAllAvailable() } finally {
      q.stop()
      deleteTree(ckpt)
    }
    spark.table(sink)
  }

  /** Recursively delete a temp tree (checkpoints, landing zones) — the
    * ephemeral harness dirs are RAM-backed (/dev/shm) or /tmp, so a
    * leak accumulates across bench passes until the tmpfs fills. The
    * walk stream is CLOSED (try/finally): each Files.walk holds an
    * open directory handle per level until closed, and the repo's
    * lifecycle keys delete a tree per invocation — an unclosed stream
    * per delete is an fd leak on a long-lived driver (the round-14
    * ADVICE finding).
    */
  private[graft] def deleteTree(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  }

  /** Run `job` on a streaming Dataset, write to a memory sink, return
    * the sink contents once the source is drained.
    */
  private def runToSink(job: Dataset[Event] => DataFrame, events: Dataset[Event],
                        outputMode: String): DataFrame =
    sinkOf(job(events), outputMode)

  /** Driver harness: file-streamed source (no collect anywhere) in a
    * scoped child session.
    */
  private def runOnFiles(spark: SparkSession, dir: String, outputMode: String)
                        (job: Dataset[Event] => DataFrame): DataFrame =
    runToSink(job, eventFileStream(streamingSession(spark), dir), outputMode)

  /** Spec harness: the same rows through a MemoryStream (lets specs
    * exercise jobs without touching disk, and pins the file harness by
    * equivalence).
    */
  def runOnMemory(spark: SparkSession, dir: String, outputMode: String)
                 (job: Dataset[Event] => DataFrame): DataFrame = {
    val ss = streamingSession(spark)
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val rows = Tables.events(ss, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect()
    val stream = MemoryStream[Event]
    stream.addData(rows.toIndexedSeq)
    runToSink(job, stream.toDS(), outputMode)
  }

  // ------------------------------------------------------------- jobs

  /** D1 core: tumbling 1-hour window aggregation, 1-hour watermark. */
  def windowAggJob(ds: Dataset[Event]): DataFrame =
    ds.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 4)))
          .cast(DecimalType(38, 4)).cast("double").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))

  /** D2 core: exact dedup on event_id within the watermark. */
  def dedupJob(ds: Dataset[Event]): DataFrame =
    ds.withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .toDF()

  /** D4 core: stream-static enrichment join — the static dimension is
    * broadcast per micro-batch, the stream never shuffles.
    */
  def enrichJob(cust: DataFrame)(ds: Dataset[Event]): DataFrame =
    ds.join(cust, ds("user_id") === cust("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("unknown")).as("segment"))
      .agg(count(lit(1)).as("n_events"))

  /** D3 core: gap-based sessionization (30-minute inactivity) via
    * native session_window.
    */
  def sessionJob(ds: Dataset[Event]): DataFrame =
    ds.withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  // ------------------------------------------- driver entries (file-streamed)

  /** D1: streaming twin of C5. */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame =
    runOnFiles(spark, dir, "complete")(windowAggJob)
      .orderBy("hour", "event_type")

  /** D2: dedup within the watermark; the per-type rollup happens
    * batch-side on the sink (a streaming query allows one stateful op
    * per chain).
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame =
    runOnFiles(spark, dir, "append")(dedupJob)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** D4: running event counts per market segment. The static dim is
    * read in the same scoped session as the stream so the whole query
    * resolves under one conf.
    */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamingSession(spark)
    val cust = Tables.customer(ss, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    runToSink(enrichJob(cust), eventFileStream(ss, dir), "complete")
      .orderBy("segment")
  }

  /** D5: stream-stream interval join — each user's purchase events
    * joined to the click that preceded them by ≤ 30 minutes. Both
    * sides carry watermarks and the join condition bounds event-time
    * distance, so the state store holds only a sliding ~30-minute
    * band of each side (unbounded state otherwise — a stream-stream
    * join without a time bound cannot run forever). Per-user pair
    * counts roll up batch-side on the sink.
    */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamingSession(spark)
    val clicks = eventFileStream(ss, dir).toDF()
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = eventFileStream(ss, dir).toDF()
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val pairs = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
    sinkOf(pairs, "append")
      .groupBy(col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** Semantic lookup table for D7: each distinct query text fake-embeds
    * in-plan (the provider seam's bulk column, no driver round-trip)
    * and takes its nearest corpus neighbor by cosine argmin with
    * vec_id tie-break. Vector-search cost is paid once per DISTINCT
    * text — never per event: a first per-event join measured 263s at
    * sf0.1 (150k events × 2k vectors of cosine through a 150k-group
    * stateful argmin) vs ~1s for this shape, and at 100 TB the
    * per-event form is quadratic nonsense. A stream with genuinely
    * per-event texts batches its lookups the same way per micro-batch
    * (foreachBatch + Ivf.annBatch/Pq.queryIvfPq), cached by text hash.
    */
  def semanticLookup(spark: SparkSession, dir: String): DataFrame = {
    val client = new graft.functions.FakeEmbeddingClient(64)
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val dist = graft.functions.VectorFunctions
      .cosineDistance(col("embedding"), col("qvec"))
    Tables.events(spark, dir).select(col("event_type")).distinct()
      .select(col("event_type"),
        client.embedColumn(col("event_type")).as("qvec"), lit(1).as("one"))
      .join(broadcast(corpus.withColumn("one", lit(1))), "one")
      .select(col("event_type"), dist.as("dist"), col("vec_id"), col("label"))
      .groupBy(col("event_type"))
      .agg(min(struct(col("dist"), col("vec_id"), col("label"))).as("m"))
      .select(col("event_type"), col("m.label").as("label"))
  }

  /** D7 core: stateless stream-static enrichment against the semantic
    * lookup (the broadcast join never shuffles the stream), then a
    * tiny per-label running count (state = one row per label).
    */
  def knnJob(lookup: DataFrame)(ds: Dataset[Event]): DataFrame =
    ds.toDF()
      .join(broadcast(lookup), "event_type")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_events"))

  /** D7 driver entry: per-label event counts after nearest-neighbor
    * semantic enrichment.
    */
  def streamKnn(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamingSession(spark)
    runToSink(knnJob(semanticLookup(ss, dir)), eventFileStream(ss, dir), "complete")
      .orderBy("label")
  }

  /** Per-user running state for D6: exact integer cents so the
    * threshold comparison is bit-deterministic across engines
    * (incremental double sums would differ from the oracle's
    * aggregation order in the last ulp).
    */
  case class RunningStats(sumCents: Long, n: Long)

  /** D6: custom stateful processing via flatMapGroupsWithState — the
    * arbitrary-state API for logic no built-in stateful operator
    * expresses: flag each event whose value exceeds 2× the user's
    * running mean over ALL prior events (state crosses micro-batch
    * boundaries; within a batch the group iterator is unordered, so
    * the function orders its slice by event time before folding).
    * Condition evaluated in exact integer arithmetic:
    * cents·n > 2·sumCents.
    */
  def anomalyJob(ds: Dataset[Event]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[RunningStats, (Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (user, events, state) =>
          var s = state.getOption.getOrElse(RunningStats(0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val cents = math.round(e.value * 100)
            if (s.n >= 3 && cents * s.n > 2 * s.sumCents) out += ((user, e.event_id))
            s = RunningStats(s.sumCents + cents, s.n + 1)
          }
          state.update(s)
          out.iterator
      }
      .toDF("user_id", "event_id")
  }

  /** D6 driver entry. */
  def streamAnomaly(spark: SparkSession, dir: String): DataFrame =
    runOnFiles(spark, dir, "append")(anomalyJob)
      .orderBy("user_id", "event_id")

  /** Per-user funnel stage machine for D8: monotone flags, so each
    * stage transition emits exactly once per user (append-mode safe).
    */
  case class FunnelState(seenView: Boolean, seenQClick: Boolean,
                         v: Boolean, c: Boolean, p: Boolean)

  /** D8: streaming twin of C16's ordered funnel — a per-user stage
    * machine in flatMapGroupsWithState. A click qualifies iff a view
    * was processed STRICTLY earlier, a purchase iff a qualifying click
    * was; the state machine updates flags as it folds each user's
    * slice in (ts, event_id) order, which is exactly the batch
    * operator's 1-PRECEDING window frame. Emits one (user, stage) row
    * at each FIRST stage reach — monotone, so state is 5 booleans per
    * user forever and output is append-mode idempotent. Same
    * cross-batch ordering contract as D6: batch boundaries respect
    * event-time order (the landing-zone cadence); within a batch the
    * group slice re-sorts.
    */
  def funnelJob(ds: Dataset[Event]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(e => e.event_type == "view" || e.event_type == "click" ||
        e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, (Long, String)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (user, events, state) =>
          var s = state.getOption.getOrElse(
            FunnelState(seenView = false, seenQClick = false,
              v = false, c = false, p = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
          events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            e.event_type match {
              case "view" =>
                if (!s.v) out += ((user, "view"))
                s = s.copy(v = true, seenView = true)
              case "click" => if (s.seenView) {
                if (!s.c) out += ((user, "click"))
                s = s.copy(c = true, seenQClick = true)
              }
              case _ => if (s.seenQClick && !s.p) {
                out += ((user, "purchase"))
                s = s.copy(p = true)
              }
            }
          }
          state.update(s)
          out.iterator
      }
      .toDF("user_id", "stage")
  }

  /** D8 driver entry: funnel reach counts (same one-row shape and
    * oracle as C16 — the batch twin SQL).
    */
  def streamFunnel(spark: SparkSession, dir: String): DataFrame =
    runOnFiles(spark, dir, "append")(funnelJob)
      .agg(
        sum(when(col("stage") === "view", 1).otherwise(0)).cast("long")
          .as("n_view_users"),
        sum(when(col("stage") === "click", 1).otherwise(0)).cast("long")
          .as("n_view_click_users"),
        sum(when(col("stage") === "purchase", 1).otherwise(0)).cast("long")
          .as("n_full_funnel_users"))

  /** D3: streaming twin of C6; per-user rollup is batch on the sink. */
  def streamSession(spark: SparkSession, dir: String): DataFrame =
    runOnFiles(spark, dir, "complete")(sessionJob)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .orderBy("user_id")

  /** D9 core: the Space-Saving summary as a STREAMING aggregate — the
    * state store carries one serialized ≤ capacity-counter buffer, and
    * each micro-batch's map-side partials merge into it (the same
    * mergeable-summaries property that makes the batch shuffle safe
    * makes cross-batch state safe). Fixed state at any stream length —
    * the configuration a 100 TB event firehose needs; contrast a
    * streaming groupBy(user).count() whose state grows with the key
    * domain.
    */
  def heavyHittersJob(ds: Dataset[Event]): DataFrame =
    ds.groupBy()
      .agg(graft.functions.SketchFunctions
        .spaceSaving(col("user_id"), graft.operators.Analytics.HeavyHitterCapacity)
        .as("hh"))

  /** D9 driver entry: streaming twin of C22 (same exact-regime output
    * and oracle — capacity ≥ the user domain at every test SF). The
    * top-10 explode happens batch-side on the sink row.
    */
  def streamHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    runOnFiles(spark, dir, "complete")(heavyHittersJob)
      .select(posexplode(col("hh")).as(Seq("pos", "hh")))
      .filter(col("pos") < 10)
      .select((col("pos") + 1).cast("int").as("rank"),
        col("hh.item").as("user_id"),
        col("hh.est").as("est_count"),
        col("hh.err").as("err"))

  // --------------------------------------------------------------- D10

  /** Ephemeral checkpoint dir on tmpfs when available — the same
    * rationale as the memory-sink harness above (per-batch fsync on
    * this virtualized disk dominates local runs; the durable path
    * still takes a real checkpoint).
    */
  private def tmpCheckpoint(): java.nio.file.Path = {
    val base = if (java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get("/dev/shm"))) "/dev/shm" else
      System.getProperty("java.io.tmpdir")
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(base), "graft_ckpt")
  }

  /** Exactly-once landing protocol for the foreachBatch ingest stores
    * (D10/D13). foreachBatch is AT-LEAST-once: a crash between a
    * batch's several sink writes re-runs the whole batch, so plain
    * `append` either duplicates output rows (retry after the output
    * append) or LOSES them (retry after the store append: the batch's
    * own absorbed fingerprints drop every retried survivor). Two rules
    * make the retry a no-op instead:
    *
    *   1. every write is an OVERWRITE of a subdirectory keyed by the
    *      trigger's batchId (`b<id>`) — a retry rewrites the same rows
    *      over themselves, never appends a second copy;
    *   2. every read of a store lists its subdirectories and EXCLUDES
    *      the current batch's own (`readStoreExcept`) — a half-applied
    *      prior attempt cannot feed back into its own retry.
    *
    * The batch computation is deterministic given (batch rows, store
    * minus own subdir), so the rewrite is byte-stable. Same role as
    * D12's `_append_tmp` marker, adapted to stores that absorb rows
    * instead of landing them in partition dirs.
    */
  private[graft] def readStoreExcept(spark: SparkSession, path: String,
                                     batchId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
    // a half-applied compaction (_old_* asides) means some landed
    // subdirs are mid-swap — refuse to serve rather than read a store
    // missing (or double-counting) them. A bare _compact_tmp with NO
    // asides is a crash DURING the staging write: every landed subdir
    // is still in place and the underscore filter below already skips
    // the stale staging, so the store serves normally (compactStore
    // deletes the leftover on its next run).
    val markers = all.map(_.getName).filter(_.startsWith("_old_"))
    require(markers.isEmpty,
      s"store $path has a half-applied compaction (${markers.mkString(", ")}); " +
        "recover the _old_* subdirs before serving")
    val dirs = all.map(_.toString)
      .filterNot(_.endsWith(s"/b$batchId"))
      .filterNot(d => new org.apache.hadoop.fs.Path(d).getName.startsWith("_"))
    // every driver seeds its store with a typed `seed` subdir before
    // the stream starts — enforce the convention loudly instead of
    // letting spark.read.parquet throw an opaque path error on an
    // unseeded (or own-batch-only) store
    require(dirs.nonEmpty,
      s"store $path has no subdirectories besides batch $batchId's own — " +
        "seed the store with a (possibly empty) typed `seed` subdir first")
    spark.read.parquet(dirs.toIndexedSeq: _*)
  }

  /** Per-trigger listing cost note: readStoreExcept re-lists the store
    * every trigger, and the store grows one subdirectory per landed
    * batch — O(batches) listing on a long-lived ingest, the same
    * small-files wall A20 answers for inverted lists. [[compactStore]]
    * is the standing maintenance step: collapse the landed subdirs into
    * one between triggers (threshold-gated by the caller), atomically
    * and content-neutrally, so listing cost resets to O(1).
    *
    * Protocol (the A20 rename-aside discipline, one level up): write
    * the union of all current subdirs to `_compact_tmp`, move every
    * absorbed subdir aside under `_old_b*`, rename `_compact_tmp` in as
    * `seed` (the conventional always-present subdir), then clear the
    * asides. A crash mid-SWAP leaves `_old_*` markers — refused loudly
    * here and by readStoreExcept (recovery: restore the asides by hand
    * or re-seed; the LANDED b* subdirs a crash hasn't touched are still
    * complete) — never a silently half-absorbed store. A crash during
    * the STAGING write leaves only a bare `_compact_tmp` with every
    * subdir still in place: the store is fully intact, so serving
    * continues (the underscore filter skips the staging) and the next
    * compact just deletes the stale tmp — staging is disposable until
    * the first rename. Returns the number of subdirectories absorbed
    * (0 = nothing to do, store untouched).
    *
    * Invocation contract: ONLY between triggers (or with the query
    * stopped), after the checkpoint has committed every landed batch —
    * absorbing an UNCOMMITTED batch's subdir into `seed` would feed
    * that batch's own rows back into its retry, exactly what the
    * own-subdir exclusion exists to prevent.
    */
  private[graft] def compactStore(spark: SparkSession, path: String,
                                  maxSubdirs: Int = 1): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(p).map(_.getPath.getName)
    val leftover = names.filter(_.startsWith("_old_"))
    require(leftover.isEmpty,
      s"store $path has a half-applied compaction (${leftover.mkString(", ")}); " +
        "a crash interrupted the swap — recover the _old_* subdirs before compacting")
    // a bare _compact_tmp with no asides: the crash hit during the
    // staging write, before any subdir moved — the store is fully
    // intact and the stale staging is just deleted (the rebuild path's
    // documented stale-staging-is-overwritten behavior)
    if (names.contains("_compact_tmp"))
      fs.delete(new org.apache.hadoop.fs.Path(p, "_compact_tmp"), true)
    val subdirs = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath).filterNot(_.getName.startsWith("_"))
    // threshold gate: a store under its subdir budget is left untouched
    // (callers compact on a cadence, not per trigger)
    if (subdirs.length <= math.max(1, maxSubdirs)) return 0
    val tmp = new org.apache.hadoop.fs.Path(p, "_compact_tmp")
    spark.read.parquet(subdirs.map(_.toString).toIndexedSeq: _*)
      .write.mode("overwrite").parquet(tmp.toString)
    val asides = subdirs.map { d =>
      val aside = new org.apache.hadoop.fs.Path(p, s"_old_${d.getName}")
      if (!fs.rename(d, aside))
        sys.error(s"compactStore: could not move $d aside")
      aside
    }
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(p, "seed")))
      sys.error(s"compactStore: rename $tmp -> seed failed; " +
        "originals kept under _old_*")
    asides.foreach { a =>
      if (!fs.delete(a, true)) sys.error(s"compactStore: could not clean up $a")
    }
    subdirs.length
  }

  /** D10 core: ONE micro-batch of the incremental-dedup ingest (E1b's
    * batch shape, run per trigger): first-wins arg-min WITHIN the
    * micro-batch, one anti-join against the persisted fingerprint
    * store, survivors land in both the output table and the store —
    * so a duplicate arriving in batch N+1 of a hash landed in batch N
    * is dropped by the store anti-join (StreamsSpec proves it across
    * explicit batches). Everything is O(micro-batch): the store is
    * only ever anti-joined (key-partitioned) and grown by one
    * subdirectory, never rewritten — the real continuous-ingest path
    * at 100 TB where the standing hash store dwarfs any batch. Writes
    * follow the exactly-once protocol above.
    *
    * Survivors are pinned with an eager localCheckpoint before the two
    * writes: both sinks must see the SAME materialization, and the
    * store write below would otherwise race the lazy plan that reads
    * the store (the E1b lesson, per batch).
    */
  private[graft] def dedupIncrementalBatch(store: String, out: String)
                                          (batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      val hashed = batch
        .select(col("doc_id"), col("source"), md5(col("text")).as("text_hash"))
      val firstInBatch = hashed.groupBy("text_hash").agg(min("doc_id").as("keep_id"))
      val survivors = hashed.join(firstInBatch, "text_hash")
        .filter(col("doc_id") === col("keep_id"))
        .join(readStoreExcept(spark, store, batchId), Seq("text_hash"), "left_anti")
        .select("doc_id", "source", "text_hash")
        .localCheckpoint()
      survivors.write.mode("overwrite").parquet(s"$out/b$batchId")
      survivors.select("text_hash").write.mode("overwrite")
        .parquet(s"$store/b$batchId")
    }

  /** The D10/D14 static oracles are exact only because the landing glob
    * is consumed in ONE trigger (no maxFilesPerTrigger on the driver
    * entries): under multiple triggers the first-arrival canon can
    * differ from the oracle's global min doc_id when duplicate texts
    * span batches. Asserted after the drain so a future trigger-split
    * change fails LOUDLY here instead of as an oracle hash mismatch
    * (the multi-batch behavior itself is proven separately in
    * StreamsSpec with explicit arrivals).
    */
  private def assertSingleLandedBatch(spark: SparkSession, outPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val landed = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.matches("b\\d+"))
    require(landed.length <= 1,
      s"driver entry expects single-trigger consumption but ${landed.length} " +
        s"batches landed (${landed.mkString(", ")}) — the static oracle's " +
        "global arg-min assumption no longer holds")
  }

  /** Attach the D10 foreachBatch sink to an incoming (doc_id, text,
    * source) stream — shared by the driver file harness and the
    * MemoryStream spec harness.
    */
  private[graft] def runDedupIncremental(incoming: DataFrame, store: String,
                                         out: String)
      : (org.apache.spark.sql.streaming.StreamingQuery, java.nio.file.Path) = {
    val ckpt = tmpCheckpoint()
    val q = incoming.writeStream
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        dedupIncrementalBatch(store, out)(b.toDF(), id))
      .option("checkpointLocation", ckpt.toString)
      .start()
    (q, ckpt)
  }

  /** D10 driver entry: streaming twin of E1b — the standing corpus
    * (doc_id % 5 != 0) seeds the persisted fingerprint store, the
    * remaining docs arrive through a file-streamed landing zone, and
    * each micro-batch anti-joins the store before its survivors'
    * hashes are absorbed. Oracle ≡ E1b's batch SQL over the FINAL
    * state (the driver landing zone is one file → the stream and the
    * batch see the same arg-min domain; the cross-batch drop is pinned
    * by StreamsSpec with explicit multi-batch arrivals).
    */
  /** D11: streaming quality gate — the E36 classifier applied per
    * micro-batch (stateless per-row arithmetic fused into the stream's
    * scan), rolled up to per-source admission counts with ONE stateful
    * aggregation in complete mode. This is the front door of a
    * continuous ingest pipeline: documents land, the model scores them
    * in-flight, and the per-source pass-rate dashboard is the health
    * signal operators actually watch (a source whose admission rate
    * collapses mid-crawl is broken upstream). Oracle ≡ the same
    * classifier + rollup in batch SQL over the full table — streaming
    * and batch agree because the classifier is stateless and count/sum
    * are order-insensitive over exact integers.
    */
  def streamQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamingSession(spark)
    val schema = ss.read.parquet(s"$dir/documents.parq*").schema
    val incoming = Sources
      .streamDir(ss, s"$dir/documents.parq*", schema,
        options = Map("basePath" -> dir))
    val agg = graft.operators.TextOps.qualityClassifierOn(incoming)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"))
    sinkOf(agg, "complete").orderBy("source")
  }

  // --------------------------------------------------------------- D13

  /** Minhash-position agreement count over (mh_a, mh_b) columns — the
    * ONE verify bar shared by the D13 per-batch drops and the D13b
    * reconciler (estimated Jaccard ≥ t as an exact integer
    * comparison), so the stream and its periodical cannot drift.
    */
  private[graft] def minhashAgree: org.apache.spark.sql.Column =
    aggregate(
      zip_with(col("mh_a"), col("mh_b"),
        (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
      lit(0), (acc, v) => acc + v)

  /** D13 core: ONE micro-batch of continuous FUZZY-dedup ingest — the
    * near-dup twin of D10's exact hash store, and the streaming face of
    * E42's composed fuzzy pass: arrivals are near-dup-checked against a
    * PERSISTED MinHash signature store instead of an md5 store. Per
    * trigger: (1) signatures of the batch (E3's kernel — docs under 3
    * words have no signature and pass unconditionally, near-dup
    * semantics need ≥ one shingle); (2) within-batch greedy drop — an
    * arrival drops if it VERIFIES against any smaller-id batch doc
    * (fuzzy matching is not transitive, so unlike D10's exact arg-min
    * this is a documented conservative policy: a chain a~b~c can drop
    * c for matching an already-dropped b — over-dropping near-dups is
    * the safe side for a training corpus); (3) store drop — band keys
    * join the persisted band table (key-partitioned on the band hash,
    * O(batch × matching bands), never a store scan), candidates verify
    * by minhash agreement ≥ MinhashMatchMin of 128 positions
    * (estimated Jaccard ≥ t as an exact integer comparison — the
    * signature-only store is the published at-scale recipe: no shingle
    * sets persisted, storage is 128 longs/doc); (4) survivors append
    * to the output AND their signatures+bands to the store, so a
    * near-dup of a batch-N survivor arriving in batch N+1 drops via
    * the STORE (StreamsSpec proves it across explicit batches).
    * Everything is O(micro-batch + matched band rows): the store is
    * only ever band-joined and appended, never rewritten.
    */
  private[graft] def dedupFuzzyBatch(store: String, out: String)
                                    (batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      import graft.operators.Dedup
      // pinned: the signature table feeds several joins below, and an
      // un-pinned plan would recompute the shingle+minhash pass each time
      val sig = Dedup.minhashSignatures(batch.select(col("doc_id"), col("text")))
        .select("doc_id", "mh").localCheckpoint()
      // hot-bucket cap on the batch side — E3's guard, same constant: a
      // boilerplate-heavy batch would otherwise form O(m²) pairs in one
      // (band_id, band_hash) bucket
      val wBucket = org.apache.spark.sql.expressions.Window
        .partitionBy("band_id", "band_hash")
      val bands = Dedup.bandsOf(sig)
        .withColumn("bucket_n", count(lit(1)).over(wBucket))
        .filter(col("bucket_n") <= Dedup.LshBucketCap)
        .drop("bucket_n")
      val agree = minhashAgree
      def verifiedDrops(cand: DataFrame, right: DataFrame,
                        dropSide: String): DataFrame =
        cand
          .join(sig.select(col("doc_id").as("cand_a"), col("mh").as("mh_a")), "cand_a")
          .join(right.select(col("doc_id").as("cand_b"), col("mh").as("mh_b")), "cand_b")
          .filter(agree >= Dedup.MinhashMatchMin)
          .select(col(dropSide).as("doc_id")).distinct()
      val withinCand = bands.as("a")
        .join(bands.as("b"),
          col("a.band_id") === col("b.band_id") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("cand_a"), col("b.doc_id").as("cand_b"))
        .dropDuplicates("cand_a", "cand_b")
      val withinDrop = verifiedDrops(withinCand, sig, dropSide = "cand_b")
      // store side: restrict the (subdir-globbed, own-batch-excluded)
      // band table to the batch's keys FIRST — a broadcast semi-join,
      // O(matched rows) not O(store) — then cap hot MATCHED keys before
      // pairing, so a boilerplate family in the store cannot go
      // quadratic against a batch that touches its bucket
      val batchKeys = bands.select("band_id", "band_hash").distinct()
      val matched = readStoreExcept(spark, s"$store/bands", batchId)
        .join(broadcast(batchKeys), Seq("band_id", "band_hash"))
        .withColumn("bucket_n", count(lit(1)).over(wBucket))
        .filter(col("bucket_n") <= Dedup.LshBucketCap)
        .drop("bucket_n")
      val storeCand = bands
        .join(matched.select(col("doc_id").as("cand_b"),
          col("band_id"), col("band_hash")), Seq("band_id", "band_hash"))
        .select(col("doc_id").as("cand_a"), col("cand_b"))
        .dropDuplicates("cand_a", "cand_b")
      val storeDrop = verifiedDrops(storeCand,
        readStoreExcept(spark, s"$store/sigs", batchId), dropSide = "cand_a")
      val survivors = batch.select("doc_id", "source", "text")
        .join(withinDrop.union(storeDrop).distinct(), Seq("doc_id"), "left_anti")
        .localCheckpoint()
      // exactly-once landing: batch-scoped overwrites (protocol above)
      survivors.select("doc_id", "source").write.mode("overwrite")
        .parquet(s"$out/b$batchId")
      val keptSigs = sig.join(survivors.select("doc_id"), "doc_id").localCheckpoint()
      keptSigs.write.mode("overwrite").parquet(s"$store/sigs/b$batchId")
      Dedup.bandsOf(keptSigs).write.mode("overwrite")
        .parquet(s"$store/bands/b$batchId")
    }

  /** Attach the D13 foreachBatch sink — shared by the driver file
    * harness and the MemoryStream spec harness.
    */
  private[graft] def runDedupFuzzy(incoming: DataFrame, store: String,
                                   out: String)
      : (org.apache.spark.sql.streaming.StreamingQuery, java.nio.file.Path) = {
    val ckpt = tmpCheckpoint()
    val q = incoming.writeStream
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        dedupFuzzyBatch(store, out)(b.toDF(), id))
      .option("checkpointLocation", ckpt.toString)
      .start()
    (q, ckpt)
  }

  /** D13 driver entry: the standing corpus (doc_id % 5 != 0) seeds the
    * persisted signature+band store, the remaining docs arrive through
    * the file-streamed landing zone, and each micro-batch runs the
    * fuzzy ingest above. Rows-only by design (the E3/E42 reason:
    * xxhash64 minhashes); StreamsSpec pins the cross-batch store drop
    * and the agreement with the batch fuzzy policy on planted docs.
    */
  def streamDedupFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamingSession(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_fz")
    fuzzyIngest(ss, dir, tmp)
    val result = ss.read.parquet(s"${tmp.resolve("survivors")}/*")
      .orderBy("doc_id").localCheckpoint(true)
    deleteTree(tmp)
    result
  }

  /** The D13 ingest end-to-end into `tmp` (store + survivors subtrees):
    * seed the signature/band store with the standing corpus, stream the
    * arrival split through [[dedupFuzzyBatch]], drain. Shared by the
    * D13 driver entry and the D13b reconciler.
    */
  private def fuzzyIngest(ss: SparkSession, dir: String,
                          tmp: java.nio.file.Path): Unit = {
    val docs = Tables.documents(ss, dir)
    val store = tmp.resolve("store").toString
    val out = tmp.resolve("survivors").toString
    // standing signatures come from the per-corpus session memo (the
    // same table E3 serves from), filtered to the standing ids — no
    // per-invocation recompute of the corpus signature pass
    val standingSigs = graft.operators.Dedup.signaturesFor(ss, dir)
      .filter(col("doc_id") % 5 =!= 0)
      .select("doc_id", "mh").localCheckpoint()
    standingSigs.write.mode("overwrite").parquet(s"$store/sigs/seed")
    graft.operators.Dedup.bandsOf(standingSigs)
      .write.mode("overwrite").parquet(s"$store/bands/seed")
    docs.filter(lit(false)).select(col("doc_id"), col("source"))
      .write.mode("overwrite").parquet(s"$out/seed")
    val schema = ss.read.parquet(s"$dir/documents.parq*").schema
    val incoming = Sources
      .streamDir(ss, s"$dir/documents.parq*", schema,
        options = Map("basePath" -> dir))
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"), col("source"))
    val (q, ckpt) = runDedupFuzzy(incoming, store, out)
    try q.processAllAvailable() finally q.stop()
    deleteTree(ckpt)
  }

  /** The D13b periodical over an accumulated signature store: band-
    * bucket candidates (the E3 cap guard) from the persisted band
    * table, verified by the SAME minhash-agreement bar the stream
    * uses, star-contracted to connected components
    * (Dedup.componentsFromPairs — E42's reconciler machinery), then
    * the CANONICAL-SURVIVOR DELTA: store members whose component
    * canonical (min doc_id) is a different doc. O(store bands ×
    * bucket) — the store holds survivors' signatures only, never the
    * corpus, and no shingle set is ever materialized.
    */
  private[graft] def reconcileFuzzyStore(spark: SparkSession,
                                         store: String): DataFrame = {
    import graft.operators.Dedup
    val sigs = readStoreExcept(spark, s"$store/sigs", batchId = -1L)
      .localCheckpoint()
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("band_id", "band_hash")
    val bands = readStoreExcept(spark, s"$store/bands", batchId = -1L)
      .withColumn("bucket_n", count(lit(1)).over(wBucket))
      .filter(col("bucket_n") <= Dedup.LshBucketCap)
      .drop("bucket_n")
      .localCheckpoint()
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("cand_a"), col("b.doc_id").as("cand_b"))
      .dropDuplicates("cand_a", "cand_b")
    val edges = cand
      .join(sigs.select(col("doc_id").as("cand_a"), col("mh").as("mh_a")), "cand_a")
      .join(sigs.select(col("doc_id").as("cand_b"), col("mh").as("mh_b")), "cand_b")
      .filter(minhashAgree >= Dedup.MinhashMatchMin)
      .select("cand_a", "cand_b")
    Dedup.componentsFromPairs(edges)
      .filter(col("doc_id") =!= col("component_id"))
      .select(col("doc_id"), col("component_id").as("canon_id"))
      .orderBy("doc_id")
  }

  /** D13b driver entry: `stream_dedup_reconcile` — the PERIODIC
    * component reconciliation D13's scaladoc promises. The stream's
    * within-batch policy is greedy and documented conservative (fuzzy
    * matching is not transitive: a chain a~b~c can keep both a and c
    * because c only matched the already-dropped b); the periodical
    * closes that gap out of band: run the D13 ingest, then read the
    * STORE the stream accumulated (standing seed + per-batch
    * survivors' signatures) and emit [[reconcileFuzzyStore]]'s
    * canonical-survivor delta — each row (doc_id, canon_id) names a
    * store member the transitive-component policy would defer to a
    * smaller-id canonical. The delta is non-empty by construction on
    * these corpora (the seed is the UN-deduplicated standing corpus,
    * so every standing near-dup pair contributes its non-canonical
    * member). Rows-only by design (the D13/E3/E42 standing structural
    * argument: xxhash64 minhashes); StreamsSpec pins the
    * non-transitive-chain case end-to-end and delta-set equality with
    * a from-scratch batch component pass over the same doc set.
    */
  def streamDedupReconcile(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamingSession(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_fzr")
    fuzzyIngest(ss, dir, tmp)
    val store = tmp.resolve("store").toString
    // the no-orphan invariant (every canonical is itself a store
    // member) is pinned in StreamsSpec, not re-proved per invocation —
    // the served key stays O(store) pure, no extra anti-join + count
    val delta = reconcileFuzzyStore(ss, store)
    val result = delta.localCheckpoint(true)
    deleteTree(tmp)
    result
  }

  // --------------------------------------------------------------- D14

  /** D14 core: ONE micro-batch of the continuous-ingest ATTRITION
    * funnel — the streaming face of E44's per-stage loss report,
    * restricted to the INGEST gates (language, quality floor, exact
    * canonicalization; the near-dup component pass is the batch
    * periodical, not a per-trigger gate). Per trigger: the shared
    * per-row flag seam (TextOps.attritionFlagsOn — one projection
    * chain, no joins, the same expressions as the batch funnel so the
    * two cannot drift), within-batch first-wins canon per text hash
    * (D10's arg-min contract), a store anti-check for cross-batch
    * duplicates, then the per-doc flag rows land batch-scoped and the
    * canon survivors' hashes absorb into the store. O(micro-batch +
    * store matches) per trigger; the rollup the driver reads is over
    * the accumulated flag rows, so the dashboard can be re-cut by any
    * stage/source slice without re-running a gate.
    */
  private[graft] def attritionBatch(store: String, out: String)
                                   (batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      val flagged = graft.operators.TextOps.attritionFlagsOn(batch)
        .withColumn("text_hash", md5(col("text")))
      val firstInBatch = flagged.filter(col("pass_qual") === 1L)
        .groupBy("text_hash").agg(min("doc_id").as("keep_id"))
      // pinned before the two writes below (the E1b lesson, per batch)
      val rows = flagged
        .join(firstInBatch, Seq("text_hash"), "left")
        .join(readStoreExcept(spark, store, batchId)
          .select(col("text_hash")).distinct()
          .withColumn("in_store", lit(1L)), Seq("text_hash"), "left")
        .withColumn("pass_exact",
          (col("pass_qual") === 1L && col("doc_id") === col("keep_id") &&
            col("in_store").isNull).cast("long"))
        .select("doc_id", "source", "text_hash",
          "pass_lang", "pass_qual", "pass_exact")
        .localCheckpoint()
      rows.write.mode("overwrite").parquet(s"$out/b$batchId")
      rows.filter(col("pass_exact") === 1L).select("text_hash")
        .write.mode("overwrite").parquet(s"$store/b$batchId")
    }

  /** Attach the D14 foreachBatch sink — shared by the driver file
    * harness and the MemoryStream spec harness.
    */
  private[graft] def runAttrition(incoming: DataFrame, store: String,
                                  out: String)
      : (org.apache.spark.sql.streaming.StreamingQuery, java.nio.file.Path) = {
    val ckpt = tmpCheckpoint()
    val q = incoming.writeStream
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        attritionBatch(store, out)(b.toDF(), id))
      .option("checkpointLocation", ckpt.toString)
      .start()
    (q, ckpt)
  }

  /** D14 driver entry: the WHOLE corpus arrives through the landing
    * zone (the funnel reports total ingest, so nothing seeds the
    * store), the per-batch core above flags every document, and the
    * result is the per-source per-stage rollup over the accumulated
    * flag rows. Oracle ≡ the batch flag/canon CTE chain over the full
    * arrival set (one landing file → the within-batch arg-min IS the
    * global min, the same argument as D10); cross-batch store drops
    * and stage monotonicity under explicit multi-batch arrivals are
    * pinned in StreamsSpec.
    */
  def streamAttrition(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamingSession(spark)
    val docs = Tables.documents(ss, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_attr")
    val store = tmp.resolve("store").toString
    val out = tmp.resolve("flags").toString
    docs.filter(lit(false)).select(md5(col("text")).as("text_hash"))
      .write.mode("overwrite").parquet(s"$store/seed")
    docs.filter(lit(false))
      .select(col("doc_id"), col("source"), md5(col("text")).as("text_hash"),
        lit(0L).as("pass_lang"), lit(0L).as("pass_qual"),
        lit(0L).as("pass_exact"))
      .write.mode("overwrite").parquet(s"$out/seed")
    val schema = ss.read.parquet(s"$dir/documents.parq*").schema
    val incoming = Sources
      .streamDir(ss, s"$dir/documents.parq*", schema,
        options = Map("basePath" -> dir))
      .select(col("doc_id"), col("lang"), col("text"), col("source"))
    val (q, ckpt) = runAttrition(incoming, store, out)
    try q.processAllAvailable() finally q.stop()
    assertSingleLandedBatch(ss, out)
    val result = ss.read.parquet(s"$out/*")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("pass_lang")).as("n_lang"),
        sum(col("pass_qual")).as("n_quality"),
        sum(col("pass_exact")).as("n_exact_canon"))
      .orderBy("source").localCheckpoint(true)
    deleteTree(ckpt)
    deleteTree(tmp)
    result
  }

  // --------------------------------------------------------------- D12

  /** D12 core: ONE micro-batch of continuous index ingest — the
    * reference's add_vector → dirty → rebuild-policy mutation path
    * (services/index_service.py:56-198, indexes/base.py:36-46) run per
    * trigger against the PERSISTED IVF-PQ index. Each batch of raw
    * (id, vec) arrivals encodes against the index's own FROZEN model
    * (coarse centroids + codebooks + rotation read from the sidecars —
    * nothing retrains in-flight) and lands crash-consistently through
    * PqLifecycle.append's `_append_tmp` staging; the growth accumulates
    * as dirt, so the standing rebuild policy (shouldRebuild at the
    * dirty-ratio threshold) decides retraining OUT of band, exactly the
    * reference's lazy-rebuild contract. Everything is O(micro-batch):
    * appended rows are M-byte codes landing in their cluster
    * partitions, untouched lists are never opened — the continuous
    * embedding-ingest shape a 100 TB vector store actually runs.
    *
    * Empty triggers are skipped outright: an empty append would still
    * write state + staging for nothing (and flip isDirty before any
    * row arrived).
    *
    * At-least-once replay safety: the trigger's batchId rides into
    * PqLifecycle.append, which records it in the same state write the
    * landing protocol already does and NO-OPs any batch the state
    * already accounts for — a sink retry after a completed append
    * (crash between landAppend finishing and the checkpoint commit)
    * can no longer land duplicate code rows or double-count dirt, the
    * same exactly-once discipline the b<batchId> overwrite protocol
    * gives the D10/D13/D14 stores.
    */
  private[graft] def indexAppendBatch(indexPath: String, streamId: String)
                                     (batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) {
      graft.operators.PqLifecycle.append(batch.select("id", "vec"), indexPath,
        streamBatchId = Some(batchId), streamId = Some(streamId))
      ()
    }

  /** Attach the D12 foreachBatch sink to an incoming (id, vec) vector
    * stream — shared by the driver file harness and the MemoryStream
    * spec harness (which proves cross-batch accumulation, untouched-
    * partition immutability, and the half-applied-marker refusal).
    */
  private[graft] def runIndexAppend(incoming: DataFrame, indexPath: String)
      : (org.apache.spark.sql.streaming.StreamingQuery, java.nio.file.Path) = {
    val ckpt = tmpCheckpoint()
    // the checkpoint location IS the stream identity: stable across
    // restarts from the same checkpoint (replays no-op), fresh for a
    // new checkpoint (whose batch ids restart at 0 and must apply)
    val q = incoming.writeStream
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        indexAppendBatch(indexPath, ckpt.toString)(b.toDF(), id))
      .option("checkpointLocation", ckpt.toString)
      .start()
    (q, ckpt)
  }

  /** D12 driver entry: build the persisted IVF-PQ index over the
    * corpus, then stream the arrival set — the first ceil(0.2·n)
    * vectors re-keyed past the corpus (new ids, existing vector
    * content: deterministic at any SF, same convention as
    * ivfpq_lifecycle) — through a multi-file landing zone with
    * maxFilesPerTrigger=1, so the ingest really runs as SEVERAL
    * appends whose dirt accumulates across micro-batches. The output
    * is the lifecycle state machine plus a full disk read-back:
    *   phase 1  built state (clean, size = n)
    *   phase 2  state AFTER the stream drains (dirt = arrivals,
    *            0.2 ≥ 0.1 → the rebuild policy fires)
    *   phase 3  read-back: size = total rows ON DISK, dirty_count =
    *            arrived rows ON DISK (id ≥ n) — the landed codes are
    *            really there and accounted for, not just recorded in
    *            the state file.
    *   phase 4  the loop CLOSES (round 9): should_rebuild fired, so the
    *            out-of-band rebuild runs on the current logical
    *            contents (corpus + arrivals) — fresh coarse quantizer
    *            and codebooks at the NEW size, every vector re-encoded,
    *            version++, dirt reset, old version swapped aside
    *            (PqLifecycle.rebuild — the reference's lazy-rebuild
    *            contract end-to-end, index_service.py:56-198).
    *   phase 5  post-rebuild read-back: both counts from the NEW disk
    *            tree (total = n + d, arrivals still present under the
    *            new model).
    * Every value is arithmetic on the corpus count — the key is
    * oracle-checked, not rows-only; batch-split invariance (the final
    * state is the same no matter how arrivals split into triggers) is
    * exactly what the arithmetic proves, since the oracle has no idea
    * how many micro-batches ran. Code-level equality with a single
    * batch append of the same arrival set, and the rebuild's
    * re-encoding under the new model, are pinned in StreamsSpec /
    * PqLifecycleSpec.
    */
  def streamIndexAppend(spark: SparkSession, dir: String): DataFrame =
    streamIndexAppendTimed(spark, dir, (_, _) => ())

  /** [[streamIndexAppend]] with a phase timer — ONE implementation
    * serves the driver key (no-op hook) and tools/AppendProbe's
    * attribution run (the key is the most expensive non-memo bench
    * line, so its cost must decompose into named phases rather than
    * read as one 12 s blob).
    */
  private[graft] def streamIndexAppendTimed(spark: SparkSession, dir: String,
                                            onPhase: (String, Double) => Unit): DataFrame =
    streamAppendLifecycle(spark, dir, "graft_stream_idx", "index",
      build = (ss, p) => graft.operators.PqLifecycle.build(ss, dir, p),
      runSink = runIndexAppend,
      readBack = (ss, p) => ss.read.parquet(p),
      rebuildIdx = (_, current, p) => graft.operators.PqLifecycle.rebuild(current, p),
      midStream = (_, _) => (),
      onPhase = onPhase)

  /** The ONE harness body behind the three continuous-ingest keys
    * (D12 IVF-PQ / D15 graph / D17 BQ): build → 3-trigger landing-zone
    * drain through the family's foreachBatch sink → optional
    * mid-stream maintenance (D17's compaction — content-neutral, so
    * the shared oracle arithmetic is untouched) → disk read-back →
    * the fired policy's out-of-band rebuild → post-rebuild read-back,
    * emitted as the 5-phase state table every caller verifies against
    * [[streamIndexAppendOracleSql]]'s arithmetic. The hooks carry what
    * is genuinely each family's: the build, the sink, the read-back
    * frame (raw lists vs the graph's `_vectors`), the rebuild, and the
    * maintenance step. One body = the phase arithmetic cannot drift
    * between the three keys that all claim the same oracle.
    */
  private def streamAppendLifecycle(spark: SparkSession, dir: String,
      tag: String, idxName: String,
      build: (SparkSession, String) => graft.operators.IndexStatus,
      runSink: (DataFrame, String) => (org.apache.spark.sql.streaming.StreamingQuery, java.nio.file.Path),
      readBack: (SparkSession, String) => DataFrame,
      rebuildIdx: (SparkSession, DataFrame, String) => graft.operators.IndexStatus,
      midStream: (SparkSession, String) => Unit,
      onPhase: (String, Double) => Unit): DataFrame = {
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      onPhase(name, (System.nanoTime() - t0) / 1e9)
      r
    }
    val ss = streamingSession(spark)
    val tmpRoot = java.nio.file.Files.createTempDirectory(tag)
    val indexPath = tmpRoot.resolve(idxName).toString
    val landing = tmpRoot.resolve("landing").toString
    try {
      val n = Tables.embeddingsCount(ss, dir)
      val vecs = Tables.embeddings(ss, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val s1 = timed("build") { build(ss, indexPath) }
      val d = math.ceil(0.2 * n).toLong
      val arrivals = vecs.filter(col("id") < d)
        .select((col("id") + n).as("id"), col("vec"))
      timed("landing_write") {
        arrivals
          .repartition(3) // 3 landing files -> 3 triggers -> 3 appends
          .write.mode("overwrite").parquet(landing)
      }
      val schema = ss.read.parquet(landing).schema
      val incoming = Sources.streamDir(ss, landing, schema,
        options = Map("maxFilesPerTrigger" -> "1"))
      timed("stream_drain_3_appends") {
        val (q, ckpt) = runSink(incoming, indexPath)
        try q.processAllAvailable() finally q.stop()
        deleteTree(ckpt)
      }
      val s2 = graft.operators.IndexLifecycle.status(ss, indexPath)
      timed("mid_stream_maintenance") { midStream(ss, indexPath) }
      def counts(): (Long, Long) = {
        // one scan for both: total + arrivals (count of a non-null
        // conditional ≡ the filtered count) — was two jobs per read-back
        val disk = readBack(ss, indexPath)
        val r = disk.agg(count(lit(1)), count(when(col("id") >= n, lit(1)))).head()
        (r.getLong(0), r.getLong(1))
      }
      val (total, arrived) = timed("disk_read_back_1") { counts() }
      // the drain left should_rebuild = true - run the out-of-band
      // rebuild on the index's current logical contents
      val s3 = timed("rebuild") {
        rebuildIdx(ss, vecs.unionAll(arrivals), indexPath) }
      val (total2, arrived2) = timed("disk_read_back_2") { counts() }
      val thr = graft.operators.IndexLifecycle.RebuildThreshold
      import ss.implicits._
      Seq(
        (1, s1.version, s1.isDirty, s1.dirtyCount, s1.size, s1.shouldRebuild(thr)),
        (2, s2.version, s2.isDirty, s2.dirtyCount, s2.size, s2.shouldRebuild(thr)),
        (3, s2.version, s2.isDirty, arrived, total, s2.shouldRebuild(thr)),
        (4, s3.version, s3.isDirty, s3.dirtyCount, s3.size, s3.shouldRebuild(thr)),
        (5, s3.version, s3.isDirty, arrived2, total2, s3.shouldRebuild(thr)))
        .toDF("phase", "version", "is_dirty", "dirty_count", "size", "should_rebuild")
        .orderBy("phase")
        // eager: materialize before the temp index tree is deleted
        .localCheckpoint()
    } finally deleteTree(tmpRoot)
  }

  /** d = ceil(0.2·n) arrivals (crossing the 0.1 dirty threshold);
    * phase 3 re-reads both counts from the landed code lists; phases
    * 4-5 are the post-rebuild state (version 2, clean) and its own
    * disk read-back.
    */
  def streamIndexAppendOracleSql: String =
    """WITH p AS (SELECT count(*) AS n,
      |  CAST(ceil(0.2*count(*)) AS BIGINT) AS d FROM embeddings)
      |SELECT 1 AS phase, 1 AS version, false AS is_dirty,
      |       CAST(0 AS BIGINT) AS dirty_count, n AS size,
      |       false AS should_rebuild FROM p
      |UNION ALL SELECT 2, 1, true, d, n + d, (1.0*d/n >= 0.1) FROM p
      |UNION ALL SELECT 3, 1, true, d, n + d, (1.0*d/n >= 0.1) FROM p
      |UNION ALL SELECT 4, 2, false, CAST(0 AS BIGINT), n + d, false FROM p
      |UNION ALL SELECT 5, 2, false, d, n + d, false FROM p
      |ORDER BY phase""".stripMargin

  /** D17's per-trigger sink body: frozen-threshold sign-bit encode of
    * the micro-batch into the persisted BQ tier (BqLifecycle.append)
    * under the same per-stream replay watermark as D12 (a replayed
    * batch NO-OPs before paying the encode). Empty triggers skip.
    */
  private[graft] def bqAppendBatch(indexPath: String, streamId: String)
                                  (batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) {
      graft.operators.BqLifecycle.append(batch.select("id", "vec"), indexPath,
        streamBatchId = Some(batchId), streamId = Some(streamId))
      ()
    }

  /** Attach the D17 foreachBatch sink to an incoming (id, vec) stream —
    * shared by the driver harness and the spec's MemoryStream harness.
    */
  private[graft] def runBqAppend(incoming: DataFrame, indexPath: String)
      : (org.apache.spark.sql.streaming.StreamingQuery, java.nio.file.Path) = {
    val ckpt = tmpCheckpoint()
    val q = incoming.writeStream
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        bqAppendBatch(indexPath, ckpt.toString)(b.toDF(), id))
      .option("checkpointLocation", ckpt.toString)
      .start()
    (q, ckpt)
  }

  /** D17 driver entry: `stream_bq_append` — D12's continuous-ingest
    * lifecycle applied to the BQ tier, the tree a 100 TB cluster
    * actually holds in RAM (the bit codes are 0.4% of the raw corpus —
    * BqLifecycle's own scaladoc argument; this face is how that tree
    * stays fresh without rebuild downtime): build the persisted
    * sign-bit tier, stream the arrival set (first ceil(0.2·n) vectors
    * re-keyed past the corpus) through a 3-file landing zone at
    * maxFilesPerTrigger=1 — three real micro-batches, each encoding
    * against the FROZEN sidecar thresholds and landing one file per
    * touched bucket under the per-stream replay watermark — then run
    * the A19c-shared COMPACTION over the accreted buckets (the D10b
    * mid-stream-maintenance precedent; content-neutral, which the
    * phase-3 read-back proves through the oracle), and close the loop
    * with the fired policy's out-of-band rebuild (TierLifecycle
    * .rebuild: retrained thresholds over corpus + arrivals, version 2,
    * dirt reset) and its own read-back. Same 5-phase arithmetic as
    * D12, so the key is oracle-checked and batch-split invariant by
    * construction; code-level pins live in StreamsSpec.
    */
  def streamBqAppend(spark: SparkSession, dir: String): DataFrame =
    streamAppendLifecycle(spark, dir, "graft_stream_bq", "index",
      build = (ss, p) => graft.operators.BqLifecycle.build(ss, dir, p),
      runSink = runBqAppend,
      readBack = (ss, p) => ss.read.parquet(p),
      rebuildIdx = (_, current, p) => graft.operators.BqLifecycle.rebuild(current, p),
      // mid-stream maintenance: each trigger landed one part-file per
      // touched bucket - compact them away (the D10b precedent);
      // content-neutral, so the phase-3 read-back passing the shared
      // oracle IS the proof
      midStream = (ss, p) =>
        { graft.operators.IndexLifecycle.compact(ss, p, maxFiles = 1); () },
      onPhase = (_, _) => ())

  /** The D12 arithmetic verbatim — the point: the BQ tier's ingest
    * face speaks the same state machine as the IVF-PQ one.
    */
  def streamBqAppendOracleSql: String = streamIndexAppendOracleSql

  /** D15's per-trigger sink body: search-then-link the micro-batch
    * into the persisted GRAPH index (GraphIndex.append — entry at the
    * nearest coarse list, beam search for k out-edges, reverse-cap,
    * touched-bucket rewrite), with the same per-stream replay
    * watermark discipline as D12 (a replayed batch NO-OPs). Empty
    * triggers skip outright.
    */
  private[graft] def graphAppendBatch(indexPath: String, streamId: String)
                                     (batch: DataFrame, batchId: Long): Unit =
    if (!batch.isEmpty) {
      graft.operators.GraphIndex.append(batch.select("id", "vec"), indexPath,
        streamBatchId = Some(batchId), streamId = Some(streamId))
      ()
    }

  /** Attach the D15 foreachBatch sink to an incoming (id, vec) stream —
    * shared by the driver harness and the spec's MemoryStream harness.
    */
  private[graft] def runGraphAppend(incoming: DataFrame, indexPath: String)
      : (org.apache.spark.sql.streaming.StreamingQuery, java.nio.file.Path) = {
    val ckpt = tmpCheckpoint()
    val q = incoming.writeStream
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graphAppendBatch(indexPath, ckpt.toString)(b.toDF(), id))
      .option("checkpointLocation", ckpt.toString)
      .start()
    (q, ckpt)
  }

  /** D15 driver entry: `stream_graph_append` — D12's continuous-ingest
    * lifecycle applied to the GRAPH index family (A26b's layout): build
    * the persisted descent graph, stream the arrival set (first
    * ceil(0.2·n) vectors re-keyed past the corpus) through a 3-file
    * landing zone at maxFilesPerTrigger=1 — three real micro-batches,
    * each search-then-linking against the FROZEN graph and rewriting
    * only its touched buckets, dirt accumulating across triggers under
    * the per-stream replay watermark — then the fired policy runs the
    * out-of-band re-descent (version++, dirt reset, arrivals now
    * linking among themselves) and both read-backs count the
    * `_vectors` tree. Same 5-phase arithmetic as D12, so the key is
    * oracle-checked and batch-split invariant by construction.
    */
  def streamGraphAppend(spark: SparkSession, dir: String): DataFrame =
    streamGraphAppendTimed(spark, dir, (_, _) => ())

  /** [[streamGraphAppend]] with a phase timer — ONE implementation
    * serves the driver key (no-op hook) and tools/GraphAppendProbe's
    * attribution run (the key is the most expensive bench line, so its
    * cost must decompose into named phases rather than read as one
    * ~29 s blob).
    */
  private[graft] def streamGraphAppendTimed(spark: SparkSession, dir: String,
                                            onPhase: (String, Double) => Unit): DataFrame =
    streamAppendLifecycle(spark, dir, "graft_stream_graph", "graph",
      build = (ss, p) => graft.operators.GraphIndex.build(ss, dir, p),
      runSink = runGraphAppend,
      // the graph's rows live under `_vectors` (edges are the root tree)
      readBack = (ss, p) => graft.operators.GraphIndex.readVectors(ss, p),
      // the graph rebuild re-derives from its own stored vectors - the
      // current-contents frame is not needed
      rebuildIdx = (ss, _, p) => graft.operators.GraphIndex.rebuild(ss, p),
      // mid-stream maintenance: each trigger accreted one part-file
      // per touched vbucket - the D17/D10b precedent on the graph
      // family (content-neutral; the phase-3 read-back proves it)
      midStream = (ss, p) =>
        { graft.operators.GraphIndex.compact(ss, p, maxFiles = 1); () },
      onPhase = onPhase)

  /** Identical arithmetic to D12's oracle — same arrival fraction,
    * same threshold, same 5 phases (the graph append counts growth the
    * same way the IVF-PQ one does).
    */
  def streamGraphAppendOracleSql: String = streamIndexAppendOracleSql

  /** D16's per-trigger sink body: threshold-admit the micro-batch into
    * the persisted center store (a point joins iff its distance to
    * EVERY current center exceeds r — the doubling-algorithm insertion
    * step, Coreset.thresholdAdmit's id-order fold), then land the
    * admitted rows as this batch's store subdir. Exactly-once is the
    * D10 store discipline VERBATIM (the round-14 ADVICE item — the
    * old exists-skip treated a PARTIALLY-written b<id> dir from a
    * crash mid parquet job as landed, silently losing the batch's
    * admissions on replay): read the centers from the store MINUS
    * this batch's own subdir, always recompute (deterministic given
    * (batch rows, prior centers)), and OVERWRITE b<id> — a retry
    * rewrites the same rows over themselves and a half-written
    * attempt can neither feed back into the recompute nor masquerade
    * as landed. An admission-free batch still lands an empty typed
    * subdir so the landed count stays honest.
    */
  private[graft] def kcenterBatch(store: String, r: Double,
                                  metric: Int = graft.functions.VectorMetric.L2)
                                 (batch: DataFrame, batchId: Long): Unit = {
    val ss = batch.sparkSession
    val sub = new org.apache.hadoop.fs.Path(s"$store/b$batchId")
    val fsy = sub.getFileSystem(ss.sparkContext.hadoopConfiguration)
    // current centers via own-subdir exclusion: bounded by the corpus'
    // packing number at r — the collect is the doubling algorithm's
    // O(k) state, never data. (No readStoreExcept here only because
    // this store has no seed convention: batch 0 legitimately reads an
    // absent/empty store.)
    val centers0: Seq[(Long, Seq[Float])] =
      if (!fsy.exists(new org.apache.hadoop.fs.Path(store))) Seq.empty
      else {
        val prior = fsy.listStatus(new org.apache.hadoop.fs.Path(store))
          .filter(_.isDirectory).map(_.getPath)
          .filterNot(_.getName == s"b$batchId")
          .filterNot(_.getName.startsWith("_"))
        if (prior.isEmpty) Seq.empty
        else ss.read.parquet(prior.map(_.toString).toIndexedSeq: _*)
          .select("id", "vec").collect()
          .map(row => (row.getLong(0), row.getSeq[Float](1))).toSeq
      }
    val admitted = graft.operators.Coreset.thresholdAdmit(
      batch.select("id", "vec"), centers0, r, metric)
    import ss.implicits._
    admitted.toDF("id", "vec", "dist")
      .coalesce(1).write.mode("overwrite").parquet(sub.toString)
  }

  /** D16 driver entry: `stream_kcenter` — the E55 coreset family run
    * as an INGEST property: a 100 TB pipeline selects exemplars
    * continuously, not in one pass, so the coreset must be MAINTAINED
    * under appended micro-batches. The radius comes from the batch
    * k-center's covering-radius prefix (Coreset.thresholdRadius — the
    * corpus-calibrated doubling-algorithm threshold, oracle-replayable
    * end to end); landing files split by ascending id RANGE and land
    * sequentially between drains (the D10b pattern), so the streamed
    * admission order equals the sequential id-order scan and the
    * result is batch-split invariant BY CONSTRUCTION — StreamsSpec
    * pins equality against Coreset's full-corpus twin, and the
    * unrolled threshold chain oracle-checks the key exactly.
    *
    * `metric` (round 15, the D16 parity task): COSINE maintains the
    * ANGULAR coreset a normalized-embedding ingest wants — the radius
    * calibrates through the cosine k-center chain
    * (Coreset.thresholdRadius(metric)) and admission tests the same
    * cosine distance; dot refuses at the shared E55 seam (not a
    * metric). D16 stays L2, D16b (`stream_kcenter_cos`) serves cosine.
    */
  def streamKcenter(spark: SparkSession, dir: String,
                    metric: Int = graft.functions.VectorMetric.L2): DataFrame = {
    val ss = streamingSession(spark)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_kc")
    val store = tmp.resolve("centers").toString
    val landing = tmp.resolve("landing").toString
    try {
      val vecs = Tables.embeddings(ss, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val r = graft.operators.Coreset.thresholdRadius(ss, dir, metric)
      val maxId = vecs.agg(max(col("id"))).head().getLong(0)
      def land(name: String, pred: org.apache.spark.sql.Column): Unit =
        vecs.filter(pred).coalesce(1).write.mode("overwrite")
          .parquet(s"$landing/$name")
      land("f1", col("id") <= maxId / 3)
      val schema = ss.read.parquet(s"$landing/f1").schema
      val incoming = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$landing/f*")
      val ckpt = tmpCheckpoint()
      val q = incoming.writeStream
        .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
          kcenterBatch(store, r, metric)(b.toDF(), id))
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        q.processAllAvailable()
        land("f2", col("id") > maxId / 3 && col("id") <= 2 * maxId / 3)
        q.processAllAvailable()
        land("f3", col("id") > 2 * maxId / 3)
        q.processAllAvailable()
      } finally q.stop()
      val p = new org.apache.hadoop.fs.Path(store)
      val fsy = p.getFileSystem(ss.sparkContext.hadoopConfiguration)
      val landed = fsy.listStatus(p).filter(_.isDirectory)
        .map(_.getPath.getName).count(_.matches("b\\d+"))
      require(landed == 3,
        s"driver entry expects three landed batches, got $landed")
      // admission order = ascending vec_id (admitted ids strictly
      // increase — see the oracle's theorem note), so the read-back
      // ranks by id
      val result = ss.read.parquet(s"$store/*")
        .select(col("id").as("vec_id"), col("dist"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("vec_id")))
          .cast("int"))
        .select("rank", "vec_id", "dist")
        .orderBy("rank")
        .localCheckpoint(true)
      deleteTree(ckpt)
      result
    } finally deleteTree(tmp)
  }

  def streamDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamingSession(spark)
    val docs = Tables.documents(ss, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_fp")
    val store = tmp.resolve("store").toString
    val out = tmp.resolve("survivors").toString
    // seed subdirs: the exactly-once protocol reads stores as globbed
    // subdirectories (one per landed batch + the seed)
    docs.filter(col("doc_id") % 5 =!= 0)
      .select(md5(col("text")).as("text_hash")).distinct()
      .write.mode("overwrite").parquet(s"$store/seed")
    // seed the output with its (empty) schema so a survivor-free stream
    // still reads back as a typed empty result, never a missing path
    docs.filter(lit(false))
      .select(col("doc_id"), col("source"), md5(col("text")).as("text_hash"))
      .write.mode("overwrite").parquet(s"$out/seed")
    // the landing zone is the documents parquet itself (footer-probed
    // schema, same contract as the events stream)
    val schema = ss.read.parquet(s"$dir/documents.parq*").schema
    val incoming = Sources
      .streamDir(ss, s"$dir/documents.parq*", schema,
        options = Map("basePath" -> dir))
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"), col("source"))
    val (q, ckpt) = runDedupIncremental(incoming, store, out)
    try q.processAllAvailable() finally q.stop()
    assertSingleLandedBatch(ss, out)
    // pin the (tiny) survivor table into Spark block storage so the
    // landing-zone temp tree and the RAM-backed checkpoint can be
    // deleted NOW instead of leaking one set per bench/verify pass
    val result = ss.read.parquet(s"$out/*").orderBy("doc_id").localCheckpoint(true)
    deleteTree(ckpt)
    deleteTree(tmp)
    result
  }

  /** D10b driver entry: `stream_dedup_compacted` — D10's incremental
    * dedup run as a genuinely MULTI-BATCH ingest (three range-ordered
    * landing files, maxFilesPerTrigger=1) with [[compactStore]]
    * exercised MID-STREAM: after each trigger's checkpoint commit the
    * fingerprint store's landed subdirs collapse into `seed` while the
    * SAME StreamingQuery stays live and keeps landing batches against
    * the compacted store. This promotes the compaction contract from a
    * spec-pinned drained-store exercise to the driver surface: the
    * maintenance step composes with a LIVE query (cross-batch drops
    * still hold through the absorbed hashes), which is the standing
    * answer to the one-subdir-per-batch small-files wall on a
    * long-lived ingest — listing cost resets to O(1) on a cadence, the
    * ingest never stops.
    *
    * Oracle ≡ E1b's batch SQL (exactly D10's): the landing files split
    * by doc_id RANGE and land in ascending order, so the stream's
    * first-arrival canon coincides with the oracle's global arg-min —
    * every hash's minimal doc_id copy arrives in the earliest batch
    * containing that hash (within-batch min wins there; later copies
    * drop against the store). In-key requires assert three landed
    * batches and non-zero absorbed subdirs per compact, so a silent
    * fall-back to single-trigger consumption (or a no-op compact)
    * fails loudly instead of serving a weaker proof.
    */
  def streamDedupCompacted(spark: SparkSession, dir: String): DataFrame = {
    val ss = streamingSession(spark)
    val docs = Tables.documents(ss, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_cmp10")
    val store = tmp.resolve("store").toString
    val out = tmp.resolve("survivors").toString
    val landing = tmp.resolve("landing").toString
    docs.filter(col("doc_id") % 5 =!= 0)
      .select(md5(col("text")).as("text_hash")).distinct()
      .write.mode("overwrite").parquet(s"$store/seed")
    docs.filter(lit(false))
      .select(col("doc_id"), col("source"), md5(col("text")).as("text_hash"))
      .write.mode("overwrite").parquet(s"$out/seed")
    val src = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"), col("source"))
    val maxId = src.agg(max(col("doc_id"))).head().getLong(0)
    // files land SEQUENTIALLY between drains, so their natural
    // modification times already order the triggers — never back-date
    // stamps on a LIVE query: if a poll lists a part file in the window
    // between its rename and a setLastModified, the real wall-clock
    // mtime poisons the source's max-age watermark and every later
    // back-dated file is silently ignored as too old (observed as a
    // one-in-several-runs missing trigger)
    def land(name: String, pred: org.apache.spark.sql.Column): Unit =
      src.filter(pred).coalesce(1).write.mode("overwrite").parquet(s"$landing/$name")
    land("f1", col("doc_id") <= maxId / 3)
    val schema = ss.read.parquet(s"$landing/f1").schema
    val incoming = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$landing/f*")
    val (q, ckpt) = runDedupIncremental(incoming, store, out)
    try {
      q.processAllAvailable() // trigger 1 committed
      require(compactStore(ss, store) >= 2,
        "mid-stream compaction absorbed nothing after trigger 1")
      land("f2", col("doc_id") > maxId / 3 && col("doc_id") <= 2 * maxId / 3)
      q.processAllAvailable() // trigger 2 lands against the compacted store
      require(compactStore(ss, store) >= 2,
        "mid-stream compaction absorbed nothing after trigger 2")
      land("f3", col("doc_id") > 2 * maxId / 3)
      q.processAllAvailable()
    } finally q.stop()
    val p = new org.apache.hadoop.fs.Path(out)
    val fsy = p.getFileSystem(ss.sparkContext.hadoopConfiguration)
    val landed = fsy.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).count(_.matches("b\\d+"))
    require(landed == 3,
      s"driver entry expects three landed batches, got $landed")
    val result = ss.read.parquet(s"$out/*").orderBy("doc_id").localCheckpoint(true)
    deleteTree(ckpt)
    deleteTree(tmp)
    result
  }
}
