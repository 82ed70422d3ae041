package graft.operators

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index lifecycle state for a persisted IVF index, mirroring the
  * reference's IndexService/IndexState (stackai-vector-db
  * app/services/index_service.py:56-198): version, built_at, size,
  * dirty tracking, and the `should_rebuild` dirty-ratio policy
  * (threshold 0.1, app/core/config.py:58).
  */
case class IndexStatus(
    algorithm: String,
    isBuilt: Boolean,
    isDirty: Boolean,
    size: Long,
    embeddingDim: Int,
    builtAt: Long,
    version: Int,
    dirtyCount: Long,
    totalVectors: Long,
    /** At-least-once replay watermarks, one PER STREAM IDENTITY (the
      * Delta txn appId+version pattern kept faithfully: a single
      * last-writer pair would let two interleaved streams displace
      * each other's watermark and re-land replayed batches). Keys are
      * caller stream ids verbatim; values the highest applied batch.
      * Typed ListMap so least-recently-updated-first iteration order
      * (which the retention bound's eviction relies on) is an
      * invariant of the type, not a convention a HashMap-constructing
      * caller could silently break.
      */
    appliedStreams: scala.collection.immutable.ListMap[String, Long] =
      scala.collection.immutable.ListMap.empty) {

  /** Highest batch applied by `streamId` (-1 = none). Legacy states
    * (pre-map format) persisted ONE (applied_stream_id, batch) pair;
    * the parser keys that watermark under its persisted id, so a
    * resumed pre-upgrade checkpoint keeps its replay guard with
    * neither duplicates nor loss. The legacy watermark is deliberately
    * NOT applied as a floor to OTHER stream ids: any such floor
    * converts a duplicate-row hazard into a DATA-LOSS hazard (a
    * genuinely new stream's batches 0..floor silently skipped — and
    * since none of its batches can land while under the floor, the
    * map never gains its keyed entry, so the loss window never
    * closes).
    */
  def appliedBatchFor(streamId: String): Long =
    appliedStreams.getOrElse(streamId, -1L)

  /** Record `b` as `streamId`'s watermark with BOUNDED retention
    * (Delta's txn-retention concern: D12-style callers key streams by
    * checkpoint path, so a long-lived index would otherwise accumulate
    * one entry per streaming run in state.json forever). The map is
    * kept in least-recently-updated-first order (re-recording moves an
    * entry to the back) and capped at [[IndexStatus.MaxAppliedStreams]];
    * eviction drops the entry idle longest. An evicted stream that
    * later replays re-lands its batch — the same bounded-retention
    * trade Delta documents for VACUUM'd txn ids; a stream that has
    * been idle across that many OTHER streams' appends is dead in any
    * real deployment.
    */
  def withAppliedBatch(streamId: String, b: Long): IndexStatus = {
    // rebuilt as an explicit insertion-ordered ListMap: the default
    // Map implementations only preserve iteration order incidentally
    val lru = appliedStreams.toSeq.filterNot(_._1 == streamId) :+ (streamId -> b)
    copy(appliedStreams = scala.collection.immutable.ListMap.from(
      lru.takeRight(IndexStatus.MaxAppliedStreams)))
  }

  /** index_service.py:88-99: rebuild when unbuilt, empty, or the dirty
    * ratio reaches the threshold.
    */
  def shouldRebuild(threshold: Double): Boolean =
    !isBuilt || totalVectors == 0 ||
      dirtyCount.toDouble / math.max(totalVectors, 1L) >= threshold
}

object IndexStatus {
  /** Watermark-map retention bound — see [[IndexStatus.withAppliedBatch]]. */
  val MaxAppliedStreams = 64
}

/** Persisted index lifecycle over the cluster-partitioned IVF layout.
  *
  * Layout under `indexPath`:
  *   - `cluster_id=N` directories: inverted lists (Ivf.writeIndex
  *     layout — readers of the lists are unaffected by the extras below
  *     because parquet readers skip underscore-prefixed paths)
  *   - `_centroids/`  the coarse quantizer as (cid, cvec) parquet, so
  *     an index outlives the session that built it
  *   - `_state/state.json` the lifecycle record
  *
  * The reference guards its mutable snapshot with an RW-lock; the batch
  * twin gets the same atomicity from immutable versioned state — every
  * build swaps in a fresh lists+centroids+state trio, and `markDirty`
  * only touches the tiny state file. The contract for mutation
  * pipelines (upsert compaction, cascade delete): call `markDirty`
  * with the number of changed rows after landing the change;
  * `buildIfNeeded` is the lazy-rebuild policy applied at read time,
  * exactly the reference's serving flow (IndexLifecycleSpec exercises
  * the full sequence).
  */
object IndexLifecycle {

  /** app/core/config.py:58. */
  val RebuildThreshold = 0.1

  private[operators] def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def statePath(indexPath: String) = new Path(s"$indexPath/_state/state.json")

  /** Stream ids are HEX-ENCODED in the state file: ids are free-form
    * caller strings (checkpoint paths), and the regex field parser
    * below truncates at ',', '}' or '"' — a comma in a path would
    * silently corrupt the replay guard. Hex keys are [0-9a-f]+ by
    * construction, so no escaping question can ever arise.
    */
  private def hexEncode(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
  private def hexDecode(h: String): String =
    new String(h.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray, "UTF-8")

  private[graft] def writeState(spark: SparkSession, indexPath: String, s: IndexStatus): Unit = {
    val p = statePath(indexPath)
    val f = fs(spark, indexPath)
    // insertion order preserved (NOT key-sorted): the map is LRU-ordered
    // by withAppliedBatch and the parser reads entries back in file order
    val streams = s.appliedStreams.toSeq
      .map { case (id, b) => s""""${hexEncode(id)}":$b""" }.mkString(",")
    val json =
      s"""{"algorithm":"${s.algorithm}","is_built":${s.isBuilt},"is_dirty":${s.isDirty},
         |"size":${s.size},"embedding_dim":${s.embeddingDim},"built_at":${s.builtAt},
         |"version":${s.version},"dirty_count":${s.dirtyCount},"total_vectors":${s.totalVectors},
         |"applied_streams":{$streams}}"""
        .stripMargin.replace("\n", "")
    val out = f.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Unbuilt default state (reference IndexState(): is_dirty=true,
    * version 0).
    */
  private val Unbuilt =
    IndexStatus("ivf", isBuilt = false, isDirty = true, size = 0L,
      embeddingDim = 0, builtAt = 0L, version = 0, dirtyCount = 0L, totalVectors = 0L)

  def status(spark: SparkSession, indexPath: String): IndexStatus = {
    val p = statePath(indexPath)
    val f = fs(spark, indexPath)
    if (!f.exists(p)) Unbuilt
    else {
      val in = f.open(p)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      def fieldOpt(name: String): Option[String] =
        ("\"" + name + "\":\"?([^,}\"]*)").r.findFirstMatchIn(json).map(_.group(1))
      def field(name: String): String =
        fieldOpt(name).getOrElse(sys.error(s"bad state file: missing $name"))
      // watermark map: hex keys parse with a plain character-class
      // regex, FILE ORDER preserved (the retention bound evicts the
      // least-recently-updated entry, so order is state); a LEGACY
      // single-pair field (pre-map states) keys its watermark under the
      // persisted applied_stream_id — "" only when that field is
      // genuinely absent — so a resumed pre-upgrade checkpoint keeps
      // its replay guard with neither duplicates nor loss
      val streams: scala.collection.immutable.ListMap[String, Long] =
        """"applied_streams":\{([^}]*)\}""".r.findFirstMatchIn(json)
          .map(_.group(1)) match {
          case Some(body) =>
            scala.collection.immutable.ListMap.from(
              """"([0-9a-f]*)":(-?\d+)""".r.findAllMatchIn(body)
                .map(m => hexDecode(m.group(1)) -> m.group(2).toLong))
          case None =>
            val b = fieldOpt("applied_stream_batch").map(_.toLong).getOrElse(-1L)
            if (b < 0) scala.collection.immutable.ListMap.empty[String, Long]
            else {
              // pre-map states DID persist their stream id (raw, not hex
              // — see the pre-upgrade writeState); keying the legacy
              // watermark under that id keeps the replay guard for a
              // resumed pre-upgrade checkpoint with neither duplicates
              // nor loss. "" only when the field is genuinely absent.
              val legacyId = fieldOpt("applied_stream_id").getOrElse("")
              scala.collection.immutable.ListMap(legacyId -> b)
            }
        }
      IndexStatus(field("algorithm"), field("is_built").toBoolean,
        field("is_dirty").toBoolean, field("size").toLong,
        field("embedding_dim").toInt, field("built_at").toLong,
        field("version").toInt, field("dirty_count").toLong,
        field("total_vectors").toLong, streams)
    }
  }

  /** Record `n` changed rows against the index (index_service.mark_dirty;
    * the batch analog marks a whole mutation batch at once).
    */
  def markDirty(spark: SparkSession, indexPath: String, n: Long = 1L): IndexStatus = {
    val s = status(spark, indexPath)
    val next = s.copy(isDirty = true, dirtyCount = s.dirtyCount + n)
    writeState(spark, indexPath, next)
    next
  }

  /** Build (version+1) the index for `vecs` (id, vec) at `indexPath`:
    * k-means lists partitioned by cluster_id + persisted centroids +
    * fresh state. The swap is the batch twin of the reference's atomic
    * snapshot replacement (index_service.py:270-284). Pass `corpusDir`
    * when `vecs` came from a testdata/sf dir: the rebuild then drops
    * the session memos (Ivf.built, Dedup.shingleSets) for that dir, so
    * a data change can never serve stale memoized results afterwards.
    * `kOpt` overrides the √(n/2) cluster-count heuristic — the state
    * machine itself is k-independent, so demo/driver flows use a small
    * fixed k rather than paying two full-k builds.
    */
  def build(vecs: DataFrame, indexPath: String,
            corpusDir: Option[String] = None,
            kOpt: Option[Int] = None): IndexStatus = {
    val spark = vecs.sparkSession
    // every per-corpus session memo must drop on a data change — a new
    // memoized operator family MUST be added here (the full set:
    // IVF assignments, shingle sets, PQ models/codes, SQ8 models/codes,
    // BQ models/codes, corpus counts, autotune grids, refined graphs +
    // graph tune grids + tuned graph trees, the kcenter threshold scan)
    corpusDir.foreach { d =>
      Ivf.invalidate(d); Dedup.invalidate(d); Pq.invalidate(d); Sq8.invalidate(d)
      Bq.invalidate(d); Pca.invalidate(d); Bpe.invalidate(d)
      Tables.invalidate(d); Autotune.invalidate(d); GraphIndex.invalidate(d)
      Coreset.invalidate(d)
    }
    val prev = status(spark, indexPath)
    val v = vecs.cache()
    val n = v.count()
    val dim = if (n == 0) 0 else v.select(size(col("vec"))).head().getInt(0)
    val centroids = Ivf.writeIndexFrom(v, indexPath, kOpt)
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, j) => (j, c.toSeq) }.toSeq
      .toDF("cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/_centroids")
    val next = IndexStatus("ivf", isBuilt = true, isDirty = false, size = n,
      embeddingDim = dim, builtAt = System.currentTimeMillis(),
      version = prev.version + 1, dirtyCount = 0L, totalVectors = n)
    writeState(spark, indexPath, next)
    v.unpersist()
    next
  }

  /** Incremental update: assign `newVecs` (id, vec) to the EXISTING
    * quantizer and append them to the cluster-partitioned lists — no
    * retrain, queries see the new vectors immediately (the reference's
    * incremental add, tests/test_indexes.py
    * test_incremental_updates_efficient). The growth is recorded as
    * dirt against the as-of-build total, so the dirty-ratio policy
    * decides when the quantizer itself is retrained.
    */
  def append(newVecs: DataFrame, indexPath: String): IndexStatus = {
    val spark = newVecs.sparkSession
    val s = status(spark, indexPath)
    require(s.isBuilt, "append requires a built index (build first)")
    checkNoHalfAppliedMutation(spark, indexPath)
    val v = newVecs.cache()
    val n = v.count()
    val next = s.copy(isDirty = true, dirtyCount = s.dirtyCount + n, size = s.size + n)
    val cents = loadCentroids(spark, indexPath)
    // through the persisted hierarchy when the build was two-level
    landAppend(spark, indexPath,
      Ivf.assignToQ(v, cents, Ivf.loadHierarchy(spark, indexPath, cents)), next)
    v.unpersist()
    next
  }

  /** Crash-consistent append landing (the delete path's rename-aside
    * discipline applied to growth): stage the cluster_id-keyed `rows`
    * under `_append_tmp` (an underscore path parquet readers skip),
    * record the state transition, then move the staged files into their
    * live lists and clear the staging dir. A crash at any point leaves
    * either no state change + the `_append_tmp` marker, or the new
    * state + the marker — never rows being served that size/dirtyCount
    * don't account for with nothing to detect it;
    * [[checkNoHalfAppliedMutation]] refuses to serve or re-mutate while
    * the marker exists (recovery = rebuild). Spark part-file names
    * carry a per-job UUID, so moved files cannot collide with a list's
    * existing files.
    */
  private[operators] def landAppend(spark: SparkSession, indexPath: String,
                                    rows: DataFrame, next: IndexStatus): Unit = {
    val tmp = s"$indexPath/_append_tmp"
    rows
      .repartition(col("cluster_id")) // one file per touched list
      .write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
    writeState(spark, indexPath, next)
    val f = fs(spark, indexPath)
    val tmpPath = new Path(tmp)
    f.listStatus(tmpPath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cluster_id="))
      .foreach { d =>
        val dst = new Path(s"$indexPath/${d.getPath.getName}")
        if (!f.exists(dst) && !f.mkdirs(dst))
          sys.error(s"append: could not create list dir $dst")
        f.listStatus(d.getPath)
          .filter(_.getPath.getName.startsWith("part-"))
          .foreach { file =>
            if (!f.rename(file.getPath, new Path(dst, file.getPath.getName)))
              sys.error(s"append: rename ${file.getPath} -> $dst failed")
          }
      }
    if (!f.delete(tmpPath, true))
      sys.error(s"append: could not clear staging dir $tmp")
  }

  /** Driver demo for compact(): build, two appends (each lands its own
    * part-files in the touched lists), compact, then prove row
    * conservation by a full disk read-back per phase. The oracle
    * recomputes the expected totals arithmetically from the corpus —
    * the read-back after compaction hash-matching it IS the
    * "compaction loses nothing" check. File-count behavior (affected
    * lists collapse to one file, untouched lists keep their very
    * files, idempotence) is pinned in IndexLifecycleSpec.
    */
  def indexCompact(spark: SparkSession, dir: String): DataFrame =
    compactDemo(spark, dir, "graft_compact",
      (vecs, tmp) => { build(vecs, tmp, kOpt = Some(DemoK)); () },
      (batch, tmp) => { append(batch, tmp); () })

  /** The shared compaction driver body (A20 and A19c differ ONLY in
    * which family builds/appends — the arithmetic, the read-backs and
    * therefore the ONE oracle are structural, not by-convention):
    * build, two appends (each lands one extra part-file in every
    * touched bucket), compact at maxFiles=1, row-conservation
    * read-backs before and after.
    */
  private[operators] def compactDemo(spark: SparkSession, dir: String,
                                     tmpPrefix: String,
                                     buildIdx: (DataFrame, String) => Unit,
                                     appendIdx: (DataFrame, String) => Unit): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory(tmpPrefix)
    val tmp = tmpDir.toString
    try {
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val n = vecs.count()
      val d1 = math.ceil(0.03 * n).toLong
      val d2 = math.ceil(0.02 * n).toLong
      buildIdx(vecs, tmp)
      appendIdx(vecs.filter(col("id") < d1)
        .select((col("id") + n).as("id"), col("vec")), tmp)
      appendIdx(vecs.filter(col("id") < d2)
        .select((col("id") + n + d1).as("id"), col("vec")), tmp)
      def readBack: Long = spark.read.parquet(tmp).count()
      val before = readBack
      // every bucket the appends touched now holds >1 part file
      compact(spark, tmp, maxFiles = 1)
      val after = readBack
      import spark.implicits._
      Seq((1, n + d1 + d2, before), (2, n + d1 + d2, after))
        .toDF("phase", "expected_rows", "total_rows")
        .orderBy("phase")
        .localCheckpoint()
    } finally graft.streaming.Streams.deleteTree(tmpDir)
  }

  def indexCompactOracleSql: String =
    """WITH p AS (SELECT count(*) AS n,
      |  CAST(ceil(0.03*count(*)) AS BIGINT) AS d1,
      |  CAST(ceil(0.02*count(*)) AS BIGINT) AS d2 FROM embeddings)
      |SELECT 1 AS phase, n + d1 + d2 AS expected_rows, n + d1 + d2 AS total_rows FROM p
      |UNION ALL SELECT 2, n + d1 + d2, n + d1 + d2 FROM p
      |ORDER BY phase""".stripMargin

  /** Small-files compaction — the maintenance pass a continuously-fed
    * index needs: every append lands one part-file per touched list
    * (crash-consistent, but accretive), and at 100 TB a list with
    * thousands of tiny files pays a task + footer read per file on
    * every probe (the classic small-files wall). compact() rewrites
    * ONLY the lists whose part-file count exceeds `maxFiles`, one file
    * per list, through the same rename-aside atomic swap as delete:
    * rows are preserved exactly, untouched lists keep their very
    * files, a crash mid-swap leaves the loud `_old_cluster_id=` marker
    * every serve/mutate path refuses, and state is NOT touched —
    * compaction is content-neutral (no dirt, no size change, no
    * version bump). Returns the number of lists rewritten.
    */
  def compact(spark: SparkSession, indexPath: String, maxFiles: Int = 4): Int = {
    val s = status(spark, indexPath)
    require(s.isBuilt, "compact requires a built index (build first)")
    checkNoHalfAppliedMutation(spark, indexPath)
    compactLayout(spark, indexPath, "cluster_id", maxFiles)
  }

  /** The compaction core over ANY `<partCol>=N`-bucketed parquet tree —
    * the A20 contract generalized so every accretive bucket layout in
    * the engine (IVF/IVF-PQ lists and the flat SQ8/BQ/PCA tiers at
    * `cluster_id=`, the graph's `_vectors` at `vbucket=`) shares ONE
    * implementation of threshold-gating, the rename-aside swap, and
    * the `_old_<partCol>=` crash markers. Content-neutral by
    * construction (rows are read and rewritten, state is never
    * touched); callers own their family's preconditions.
    */
  private[operators] def compactLayout(spark: SparkSession, scanPath: String,
                                       partCol: String, maxFiles: Int): Int = {
    val f = fs(spark, scanPath)
    val affected = f.listStatus(new Path(scanPath))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
      .filter(d => f.listStatus(d.getPath)
        .count(_.getPath.getName.startsWith("part-")) > maxFiles)
      .map(_.getPath.getName.stripPrefix(s"$partCol="))
      .toSeq
    if (affected.isEmpty) return 0
    val tmp = s"$scanPath/_compact_rewrite"
    spark.read.parquet(scanPath)
      .filter(col(partCol).cast("string").isInCollection(affected))
      .repartition(col(partCol)) // one file per rewritten bucket
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    affected.foreach { bk =>
      val dst = new Path(s"$scanPath/$partCol=$bk")
      val src = new Path(s"$tmp/$partCol=$bk")
      val aside = new Path(s"$scanPath/_old_$partCol=$bk")
      if (f.exists(dst) && !f.rename(dst, aside))
        sys.error(s"compact: could not move stale bucket $dst aside")
      if (!f.rename(src, dst))
        sys.error(s"compact: rename $src -> $dst failed; stale bucket kept at $aside")
      if (f.exists(aside) && !f.delete(aside, true))
        sys.error(s"compact: could not clean up $aside")
    }
    f.delete(new Path(tmp), true)
    affected.length
  }

  /** Lazy rebuild policy: rebuild only when `shouldRebuild` says so,
    * otherwise return the current state untouched.
    */
  def buildIfNeeded(vecs: DataFrame, indexPath: String,
                    threshold: Double = RebuildThreshold,
                    corpusDir: Option[String] = None,
                    kOpt: Option[Int] = None): IndexStatus = {
    val s = status(vecs.sparkSession, indexPath)
    if (s.shouldRebuild(threshold)) build(vecs, indexPath, corpusDir, kOpt) else s
  }

  /** Point delete (the reference's remove_vector, app/indexes/base.py:46
    * and ivf.py:198-212: drop the vector from every inverted list, keep
    * serving without a rebuild). The batch twin is a broadcast anti-join
    * that REWRITES ONLY THE AFFECTED cluster partitions: one bounded
    * aggregation finds which lists contain a deleted id (partition-
    * pruned scan), only those partitions are rewritten into a temp area
    * and directory-swapped in, and the removals are recorded as dirt so
    * the dirty-ratio policy eventually retrains the quantizer around
    * the holes. Ids not present in the index are a no-op (the
    * reference's `return False`). At 100 TB this touches
    * O(deleted-clusters) data, never the corpus.
    */
  def delete(deleteIds: DataFrame, indexPath: String): IndexStatus =
    deleteFrom(deleteIds, indexPath, idCol = "neighbor_id")

  /** The partition-rewrite delete over any cluster-partitioned list
    * layout — raw-vector lists key their rows as `neighbor_id`
    * (Ivf.writeIndex), IVF-PQ code lists as `id` (Pq.writeIvfPq); the
    * rewrite, the swap and the dirt accounting are identical.
    */
  /** `bucketHint`: for layouts whose partition key is COMPUTABLE from
    * the row id (the TierLifecycle flat tiers: cluster_id = id mod
    * buckets), the caller passes the deleted ids' bucket set and BOTH
    * the hits scan and the rewrite read only those partitions
    * (partition-pruned at the source — at 100 TB a point delete then
    * touches one bucket, never the tree). Content-assigned layouts
    * (IVF lists) cannot know their partitions a priori and pass None.
    */
  private[operators] def deleteFrom(deleteIds: DataFrame, indexPath: String,
                                    idCol: String,
                                    bucketHint: Option[Seq[Int]] = None): IndexStatus = {
    val spark = deleteIds.sparkSession
    val s = status(spark, indexPath)
    require(s.isBuilt, "delete requires a built index (build first)")
    checkNoHalfAppliedMutation(spark, indexPath)
    // distinct: duplicate ids in the delete batch must not inflate the
    // removed count (the anti-join itself is idempotent, but size/
    // dirtyCount would silently drift — even below zero on repeats)
    val ids = broadcast(deleteIds.select(col("id").as("del_id")).distinct())
    val lists0 = spark.read.parquet(indexPath)
    val lists = bucketHint.fold(lists0)(h =>
      lists0.filter(col("cluster_id").isInCollection(h)))
    val hits = lists.join(ids, col(idCol) === col("del_id"))
      .groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .collect()
    if (hits.isEmpty) return s
    val affected = hits.map(_.get(0))
    val removed = hits.map(_.getLong(1)).sum
    val tmp = s"$indexPath/_delete_rewrite"
    lists.filter(col("cluster_id").isInCollection(affected.toSeq))
      .join(ids, col(idCol) === col("del_id"), "left_anti")
      .repartition(col("cluster_id")) // one file per rewritten list
      .write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
    val f = fs(spark, indexPath)
    affected.foreach { cid =>
      val dst = new Path(s"$indexPath/cluster_id=$cid")
      val src = new Path(s"$tmp/cluster_id=$cid")
      // swap via rename-aside, never delete-then-rename: a crash between
      // the two steps must leave a loud marker (_old_cluster_id=N, which
      // parquet readers skip as an underscore path), not a silently
      // missing inverted list. checkNoHalfAppliedMutation refuses to
      // serve or re-mutate an index with such a marker present.
      val aside = new Path(s"$indexPath/_old_cluster_id=$cid")
      if (f.exists(dst) && !f.rename(dst, aside))
        sys.error(s"delete: could not move stale list $dst aside")
      // a fully-deleted list simply disappears (no src dir to swap in)
      if (f.exists(src) && !f.rename(src, dst))
        sys.error(s"delete: rename $src -> $dst failed; stale list kept at $aside")
      if (f.exists(aside) && !f.delete(aside, true))
        sys.error(s"delete: could not clean up $aside")
    }
    f.delete(new Path(tmp), true)
    val next = s.copy(isDirty = true,
      dirtyCount = s.dirtyCount + removed, size = s.size - removed)
    writeState(spark, indexPath, next)
    next
  }

  /** The rebuild SWAP protocol (the reference's atomic snapshot
    * replacement, index_service.py:270-284, expressed as directory
    * renames) — shared by every out-of-band rebuild (PqLifecycle for
    * the IVF-PQ layout, TierLifecycle for the flat SQ8/BQ/PCA tiers),
    * so the concurrent-mutation guards cannot drift between families.
    * `tmp` holds the COMPLETE staged tree (lists + sidecars + its
    * already-written state); `entry` is the live state the caller read
    * on entry. Two checks narrow the lost-update window: the live
    * state re-read just before the renames (abort: staged tree
    * discarded, loud retry error) and a second re-read of the
    * moved-aside tree right after the first rename (restore: live tree
    * renamed back, staged discarded). A crash during staging leaves
    * the live index untouched; a crash between the renames leaves BOTH
    * complete trees under loud names — never a half-mixed model.
    * `beforeSwap` is the test seam that lands a mutation inside the
    * guarded window.
    */
  private[operators] def swapRebuilt(spark: SparkSession, indexPath: String,
                                     tmp: Path, entry: IndexStatus,
                                     beforeSwap: () => Unit = () => ()): Unit = {
    val f = fs(spark, indexPath)
    beforeSwap()
    // abort-before-swap: an append/delete that landed AFTER the
    // caller's contents snapshot exists only in the live tree —
    // swapping it away would silently lose those rows (and a carried
    // stream watermark would even block their replay).
    val live0 = status(spark, indexPath)
    if ((live0.version, live0.dirtyCount, live0.size, live0.appliedStreams) !=
        (entry.version, entry.dirtyCount, entry.size, entry.appliedStreams)) {
      f.delete(tmp, true)
      sys.error(s"rebuild: concurrent mutation landed during staging " +
        s"(entry state $entry, live state $live0) — staged tree discarded, " +
        "re-run rebuild against the current contents")
    }
    val live = new Path(indexPath)
    val aside = new Path(s"${indexPath}_old_v${entry.version}")
    if (!f.rename(live, aside))
      sys.error(s"rebuild: could not move live index $live aside")
    // second check AFTER the move-aside: a mutation that slipped in
    // between the abort check and the rename travelled WITH the tree —
    // restore it and retry rather than deleting it as the old version
    val moved = status(spark, aside.toString)
    if ((moved.version, moved.dirtyCount, moved.size, moved.appliedStreams) !=
        (entry.version, entry.dirtyCount, entry.size, entry.appliedStreams)) {
      if (!f.rename(aside, live))
        sys.error(s"rebuild: late mutation detected but could not restore " +
          s"$aside to $live — recover by hand before serving")
      f.delete(tmp, true)
      sys.error("rebuild: concurrent mutation landed between the abort check " +
        "and the swap — live tree restored, staged tree discarded, re-run " +
        "rebuild against the current contents")
    }
    if (!f.rename(tmp, live))
      sys.error(s"rebuild: rename $tmp -> $live failed; last good version at $aside")
    if (!f.delete(aside, true))
      sys.error(s"rebuild: could not clean up old version $aside")
  }

  /** Make a crashed mutation whole IN PLACE — the `cluster_id`-layout
    * twin of the graph family's rebuild reconcile, and the recovery
    * [[checkNoHalfAppliedMutation]]'s "rebuild the index" message
    * under-serves for STREAMED appends: a full rebuild from the
    * primary store is sound for batch callers, but a crashed streamed
    * append has its batch accounted in the state (watermark included)
    * with the rows still in staging — hand-clearing the marker would
    * lose the batch forever (the stream's replay NO-OPs against the
    * recorded watermark). Repairs, in order:
    *   1. `_old_cluster_id=` asides (a crash inside a delete's or
    *      compact's swap): a MISSING live bucket means the crash hit
    *      between the two renames and the aside IS the authoritative
    *      content — rename it back; a present live bucket means the
    *      replacement landed and the aside is stale — drop it.
    *   2. `_append_tmp` (a crash inside landAppend's
    *      stage → state-write → move-in window): when the state
    *      counts MORE rows than the disk holds, the staged part-files
    *      are exactly the accounted-but-unmoved batch — move them in
    *      (file-by-file; UUID part names make a partial move-in
    *      resumable); otherwise the staging is unaccounted (crash
    *      before the state write) or already applied — discard it.
    *   3. State/disk reconciliation: a delete that crashed after some
    *      bucket swaps removed rows the state never counted
    *      (deleteFrom writes state LAST) — re-point `size` at the
    *      disk truth and record the discrepancy as dirt, so the
    *      rebuild policy answers it; re-running the same delete batch
    *      then converges (the anti-join is idempotent).
    * Called automatically at rebuild entry (PqLifecycle.rebuild /
    * TierLifecycle.rebuild — recovery-then-rebuild, the GraphIndex
    * discipline); serve and append/delete keep REFUSING on the
    * markers, the loud guard. Returns true when anything was repaired.
    */
  def recoverMutation(spark: SparkSession, indexPath: String): Boolean = {
    val f = fs(spark, indexPath)
    val root = new Path(indexPath)
    if (!f.exists(root)) return false
    var repaired = false
    f.listStatus(root)
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("_old_cluster_id="))
      .foreach { st =>
        val live = new Path(indexPath, st.getPath.getName.stripPrefix("_old_"))
        if (f.exists(live)) {
          if (!f.delete(st.getPath, true))
            sys.error(s"recover: could not drop stale aside ${st.getPath}")
        } else if (!f.rename(st.getPath, live))
          sys.error(s"recover: could not restore aside ${st.getPath} -> $live")
        repaired = true
      }
    val tmp = new Path(s"$indexPath/_append_tmp")
    if (f.exists(tmp)) {
      val s = status(spark, indexPath)
      // EXACT-match gate, not a mere size inequality: landAppend's
      // invariant is that the state grew by precisely the staged batch,
      // so the staging is "the accounted-but-unmoved batch" only when
      // state.size − disk == staged rows. A looser (>) gate could land
      // an UNACCOUNTED batch on top of unrelated size drift (a delete
      // that crashed after its last swap but before its state write)
      // and the stream's replay — whose watermark was never recorded —
      // would then land it AGAIN.
      val stagedCount =
        try spark.read.parquet(tmp.toString).count() catch { case _: Throwable => 0L }
      if (stagedCount > 0 &&
          s.size - spark.read.parquet(indexPath).count() == stagedCount) {
        f.listStatus(tmp)
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith("cluster_id="))
          .foreach { d =>
            val dst = new Path(s"$indexPath/${d.getPath.getName}")
            if (!f.exists(dst) && !f.mkdirs(dst))
              sys.error(s"recover: could not create list dir $dst")
            f.listStatus(d.getPath)
              .filter(_.getPath.getName.startsWith("part-"))
              .foreach { file =>
                if (!f.rename(file.getPath, new Path(dst, file.getPath.getName)))
                  sys.error(s"recover: rename ${file.getPath} -> $dst failed")
              }
          }
      }
      if (!f.delete(tmp, true))
        sys.error(s"recover: could not clear staging dir $tmp")
      repaired = true
    }
    // stale rewrite stagings (a delete/compact that crashed before its
    // swap started): invisible to readers and overwritten by the next
    // run either way — dropped here so a recovered tree is clean
    Seq("_delete_rewrite", "_compact_rewrite").foreach { d =>
      val p = new Path(s"$indexPath/$d")
      if (f.exists(p)) {
        if (!f.delete(p, true))
          sys.error(s"recover: could not drop stale staging $p")
        repaired = true
      }
    }
    if (repaired) {
      val s = status(spark, indexPath)
      val disk = spark.read.parquet(indexPath).count()
      if (s.size != disk)
        writeState(spark, indexPath, s.copy(size = disk, isDirty = true,
          dirtyCount = s.dirtyCount + math.abs(s.size - disk)))
    }
    repaired
  }

  /** Refuse to operate on an index carrying a half-applied mutation
    * marker: `_old_cluster_id=N` (a crash between a delete's two swap
    * renames) or `_append_tmp` (a crash inside an append's stage/move
    * window). Either way the on-disk lists are inconsistent with the
    * state file and the only safe recovery is a rebuild (build()'s
    * overwrite drops the markers along with the stale lists). Called by
    * every mutation (append/delete) AND every serve path over a
    * persisted index (query/queryIvfPq) — a half-applied delete would
    * otherwise silently answer queries minus an entire inverted list.
    */
  def checkNoHalfAppliedMutation(spark: SparkSession, indexPath: String): Unit = {
    val f = fs(spark, indexPath)
    val p = new Path(indexPath)
    if (f.exists(p)) {
      val leftover = f.listStatus(p)
        .map(_.getPath.getName)
        .filter(n => n.startsWith("_old_cluster_id=") || n == "_append_tmp")
      require(leftover.isEmpty,
        s"index at $indexPath has a half-applied mutation (${leftover.mkString(", ")}); " +
          "a crash interrupted a partition swap or append landing — rebuild the index")
    }
  }

  /** Centroids of a persisted index (the coarse quantizer survives the
    * building session).
    */
  def loadCentroids(spark: SparkSession, indexPath: String): Array[Array[Float]] =
    spark.read.parquet(s"$indexPath/_centroids")
      .orderBy("cid").collect()
      .map(_.getSeq[Float](1).toArray)

  /** Query a lifecycle-managed index with partition-pruned probes
    * (refusing an index left inconsistent by a crashed mutation).
    */
  def query(spark: SparkSession, indexPath: String, queryVec: Array[Float],
            k: Int, nprobe: Int): DataFrame = {
    checkNoHalfAppliedMutation(spark, indexPath)
    Ivf.queryIndex(spark, indexPath, loadCentroids(spark, indexPath), queryVec, k, nprobe)
  }

  /** Cluster count for the driver's lifecycle/delete state-machine
    * queries. The transitions are k-independent (pure arithmetic on the
    * corpus size), so the demo runs its builds at a small fixed k
    * instead of paying two full √(n/2)-cluster k-means per bench pass.
    */
  val DemoK = 8

  /** Driver query: the lifecycle state machine over the embeddings
    * corpus as one deterministic table — build, sub-threshold dirt
    * (no rebuild), accumulated dirt crossing the threshold, rebuild.
    * Oracle-checkable because every transition is arithmetic on the
    * corpus size.
    */
  def indexLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_lifecycle")
    val tmp = tmpDir.toString
    try {
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      // corpusDir = None: this demo builds a SIDECAR index over an
      // unchanged corpus — the memo-invalidation hook is for actual
      // data changes (spec-covered in IndexLifecycleSpec); wiping the
      // session memo here would just bill a rebuild to whichever
      // ivf-backed query runs next in the bench
      val s1 = build(vecs, tmp, kOpt = Some(DemoK))
      val d = math.ceil(0.05 * s1.size).toLong
      val s2 = markDirty(spark, tmp, d)
      val s3 = buildIfNeeded(vecs, tmp) // below threshold: no-op
      val s4 = markDirty(spark, tmp, d) // crosses threshold
      val s5 = buildIfNeeded(vecs, tmp, kOpt = Some(DemoK)) // rebuilds, version 2
      import spark.implicits._
      Seq(s1, s2, s3, s4, s5).zipWithIndex
        .map { case (s, i) =>
          (i + 1, s.version, s.isDirty, s.dirtyCount, s.size, s.shouldRebuild(RebuildThreshold)) }
        .toDF("phase", "version", "is_dirty", "dirty_count", "size", "should_rebuild")
        .orderBy("phase")
        // localCheckpoint (eager) materializes before the temp index is
        // deleted below; its blocks are GC'd with the DataFrame, unlike
        // a cache() registration the CacheManager would hold forever
        .localCheckpoint()
    } finally {
      // the state table is tiny and checkpointed; the two full index
      // copies under /tmp must not outlive the query (repeated bench
      // runs would otherwise fill the disk)
      graft.streaming.Streams.deleteTree(tmpDir)
    }
  }

  /** Driver query: the point-delete path end-to-end — build, anti-join
    * delete of every 7th vector (rewriting only the affected cluster
    * partitions), then a read-back of the persisted lists proving they
    * really shrank. Phase 3's `size` column comes from scanning the
    * on-disk index, not from the state file, so a delete that failed to
    * rewrite the lists cannot pass the oracle.
    */
  def indexDelete(spark: SparkSession, dir: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_delete")
    val tmp = tmpDir.toString
    try {
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      // corpusDir = None: sidecar index, unchanged corpus (see
      // indexLifecycle)
      val s1 = build(vecs, tmp, kOpt = Some(DemoK))
      val s2 = delete(vecs.filter(col("id") % 7 === 0).select("id"), tmp)
      val survivors = spark.read.parquet(tmp).count()
      val s3 = s2.copy(size = survivors)
      import spark.implicits._
      Seq(s1, s2, s3).zipWithIndex
        .map { case (s, i) =>
          (i + 1, s.version, s.isDirty, s.dirtyCount, s.size, s.shouldRebuild(RebuildThreshold)) }
        .toDF("phase", "version", "is_dirty", "dirty_count", "size", "should_rebuild")
        .orderBy("phase")
        // localCheckpoint (eager) materializes before the temp index is
        // deleted below; its blocks are GC'd with the DataFrame, unlike
        // a cache() registration the CacheManager would hold forever
        .localCheckpoint()
    } finally graft.streaming.Streams.deleteTree(tmpDir)
  }

  /** Every 7th vec_id is deleted; dirty ratio d/n = ~1/7 crosses the
    * 0.1 rebuild threshold, so phases 2-3 report should_rebuild.
    */
  def indexDeleteOracleSql: String =
    """WITH p AS (SELECT count(*) AS n,
      |  CAST(count(*) FILTER (WHERE vec_id % 7 = 0) AS BIGINT) AS d FROM embeddings)
      |SELECT 1 AS phase, 1 AS version, false AS is_dirty, CAST(0 AS BIGINT) AS dirty_count,
      |       n AS size, false AS should_rebuild FROM p
      |UNION ALL SELECT 2, 1, true, d, n - d, (1.0*d/n >= 0.1) FROM p
      |UNION ALL SELECT 3, 1, true, d, n - d, (1.0*d/n >= 0.1) FROM p
      |ORDER BY phase""".stripMargin

  def indexLifecycleOracleSql: String =
    """WITH p AS (SELECT count(*) AS n, CAST(ceil(0.05*count(*)) AS BIGINT) AS d FROM embeddings)
      |SELECT 1 AS phase, 1 AS version, false AS is_dirty, CAST(0 AS BIGINT) AS dirty_count,
      |       n AS size, (1.0*0/n >= 0.1) AS should_rebuild FROM p
      |UNION ALL SELECT 2, 1, true, d, n, (1.0*d/n >= 0.1) FROM p
      |UNION ALL SELECT 3, 1, true, d, n, (1.0*d/n >= 0.1) FROM p
      |UNION ALL SELECT 4, 1, true, 2*d, n, (2.0*d/n >= 0.1) FROM p
      |UNION ALL SELECT 5, 2, false, CAST(0 AS BIGINT), n, false FROM p
      |ORDER BY phase""".stripMargin
}
