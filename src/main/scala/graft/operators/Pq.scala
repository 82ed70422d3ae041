package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization — the memory-compression path a 100 TB
  * embedding corpus actually requires (the FAISS IVF-PQ design; the
  * reference's IVFIndex keeps raw float vectors in its inverted lists,
  * which at 100 TB cannot be held or scanned economically).
  *
  * The vector space is split into M subspaces; each subspace gets its
  * own 256-centroid codebook (driver-local Lloyd on a bounded sample,
  * shared trainer with the IVF coarse quantizer); every vector encodes
  * to M one-byte codes. A 64-dim float32 vector (256 B) becomes 8 B —
  * 32× — while queries run Asymmetric Distance Computation: one
  * M×256 lookup table per query (exact query-to-centroid distances),
  * then each candidate's distance is M table lookups + adds, no float
  * vector ever touched.
  *
  * Scale shape: the codebook is KBs (broadcast); encoding is a
  * broadcast join + two skinny shuffles of (id, subspace, code) rows —
  * O(n·M) small ints, the same banding cost model as minhash-LSH; the
  * ADC scan is a narrow codegen'd map over the code table with a
  * bounded top-k, no shuffle of distances. At 100 TB the encoded table
  * is what sits in storage (optionally inside the IVF cluster layout —
  * IVF-PQ — so probes prune partitions AND read 32× fewer bytes).
  *
  * Approximate by construction (quantization error), so the driver key
  * is rows-only; PqSpec pins recall vs exact k-NN, encoding bounds,
  * and train determinism.
  */
object Pq {

  val SubspaceCount = 8
  val CodebookSize = 256
  /** Sample budget for codebook training (FAISS-style bounded train). */
  val TrainSampleCap = 65536L

  /** codebooks(m)(code) = sub-centroid vector of length subDim. */
  case class Model(dim: Int, m: Int, subDim: Int,
                   codebooks: Array[Array[Array[Float]]])

  private val models =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Model]
  private val encoded =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), DataFrame]

  /** Drop the session memos for a corpus (data-change hook, same
    * contract as Ivf.invalidate / Dedup.invalidate).
    */
  def invalidate(dir: String): Unit = {
    models.keys.filter(_._1 == dir).foreach(models.remove)
    encoded.keys.filter(_._1 == dir)
      .foreach(k => encoded.remove(k).foreach(_.unpersist()))
  }

  import graft.functions.VectorMetric

  /** Corpus for a metric. Cosine routes through the normalize-then-L2
    * identity (‖a−b‖² = 2(1−cosθ) on unit vectors), so every L2
    * kernel downstream — codebook Lloyd, ADC tables, SDC tables —
    * ranks by cosine without a second code path. Zero-norm vectors
    * stay as-is (the reference pins their cosine distance to 1.0;
    * quantized ranking of an all-zero vector is degenerate either
    * way). The norm is the codegen'd dot-product kernel; the division
    * is a one-time encode-path transform, memoized like everything
    * else on this path.
    */
  private def corpus(spark: SparkSession, dir: String,
                     metric: Int = VectorMetric.L2): DataFrame = {
    val raw = Tables.rebalanced(Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec")))
    if (metric != VectorMetric.Cosine) raw
    else {
      val n2 = sqrt(graft.functions.VectorFunctions.dotProduct(col("vec"), col("vec")))
      raw.select(col("id"),
        when(n2 === 0.0, col("vec"))
          .otherwise(transform(col("vec"), x => (x / n2).cast("float")))
          .as("vec"))
    }
  }

  /** Train M per-subspace codebooks on a deterministic hash-sample. */
  def train(spark: SparkSession, dir: String,
            m: Int = SubspaceCount, metric: Int = VectorMetric.L2): Model =
    models.get((dir, m, metric)).getOrElse(synchronized {
      models.getOrElseUpdate((dir, m, metric), {
        val vecs = corpus(spark, dir, metric)
        val n = vecs.count()
        require(n > 0, "cannot train a product quantizer on an empty corpus")
        // ceiling-division modulus: floor (n / cap) under-thins — for
        // cap < n < 2·cap it is 1 (the filter keeps the WHOLE corpus)
        // and in general retains up to ~2× the cap; the orderBy.limit
        // (a bounded TakeOrdered, deterministic under the id order)
        // hard-caps what reaches the driver either way
        val sampled =
          if (n <= TrainSampleCap) vecs
          else vecs.filter(
            pmod(xxhash64(col("id")), lit((n + TrainSampleCap - 1) / TrainSampleCap)) === 0)
        val train = sampled.select(col("id"), col("vec"))
          .orderBy("id").limit(TrainSampleCap.toInt)
          .collect().map(_.getSeq[Float](1).toArray)
        val dim = train(0).length
        require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
        val subDim = dim / m
        val codebooks = (0 until m).map { mi =>
          val sub = train.map(_.slice(mi * subDim, (mi + 1) * subDim))
          Ivf.lloyd(sub, math.min(CodebookSize, sub.length), iters = 10, tol = 1e-4)
        }.toArray
        Model(dim, m, subDim, codebooks)
      })
    })

  /** Codebook as a broadcastable (m_idx, code, cvec) table — M×256
    * rows, KBs. Joined, never inlined as literals (the r1
    * centroid-literal codegen lesson).
    */
  private def codebookDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    (for {
      mi <- model.codebooks.indices
      c <- model.codebooks(mi).indices
    } yield (mi, c, model.codebooks(mi)(c).toSeq)).toDF("m_idx", "code", "cvec")
  }

  /** Encode the corpus: (id, codes array<int> of length M). Argmin per
    * (vector, subspace) over the broadcast codebook, then codes
    * reassembled in subspace order.
    */
  def encode(spark: SparkSession, dir: String,
             m: Int = SubspaceCount, metric: Int = VectorMetric.L2): DataFrame =
    encoded.get((dir, m, metric)).getOrElse(synchronized {
      encoded.getOrElseUpdate((dir, m, metric), {
        val model = train(spark, dir, m, metric)
        val cb = codebookDf(spark, model)
        val sub = slice(col("vec"), col("m_idx") * model.subDim + 1, lit(model.subDim))
        val df = corpus(spark, dir, metric)
          .crossJoin(broadcast(cb))
          .select(col("id"), col("m_idx"), col("code"),
            graft.functions.VectorFunctions.l2Distance(sub, col("cvec")).as("d"))
          .groupBy("id", "m_idx")
          .agg(min(struct(col("d"), col("code"))).as("mc"))
          .groupBy("id")
          .agg(transform(
            array_sort(collect_list(struct(col("m_idx"), col("mc.code").as("code")))),
            s => s.getField("code")).as("codes"))
          .cache()
        df.count()
        df
      })
    })

  /** ADC top-k for one query vector with an exact refine step (the
    * FAISS refine pattern). The per-query M×256 distance table is
    * computed exactly on the driver (M·256 small l2s) and enters the
    * plan as ONE literal; each encoded row's approximate distance is M
    * element_at lookups + adds inside whole-stage codegen. The ADC
    * pass shortlists `k·refine` candidates from the compressed table
    * alone; only the shortlist joins back to raw vectors for an exact
    * re-rank — at 100 TB that is k·refine point reads instead of a
    * corpus scan of float vectors, which is the whole point of PQ.
    * `refine = 1` is pure ADC (no raw-vector access at all).
    */
  def topK(spark: SparkSession, dir: String, queryVec: Array[Float],
           k: Int, m: Int = SubspaceCount, refine: Int = 4,
           metric: Int = VectorMetric.L2): DataFrame =
    adcTopK(spark, dir, encode(spark, dir, m, metric), queryVec, k, m, refine, metric)

  /** IVF-PQ: ADC search INSIDE the IVF cluster layout — the composed
    * 100 TB design. The query selects its nprobe nearest coarse
    * centroids (driver math over the KB-sized centroid table), the
    * candidate set narrows to those clusters' members via the
    * assignment join (partition pruning when the codes land on disk
    * partitioned by cluster_id), and only then does ADC + exact refine
    * run. Cost per query: nprobe/k of the corpus, at M bytes per
    * candidate instead of 4·dim — pruning and compression multiply.
    */
  def ivfPqTopK(spark: SparkSession, dir: String, queryVec: Array[Float],
                k: Int, nprobe: Int, m: Int = SubspaceCount,
                refine: Int = 4): DataFrame = {
    val (assign, centroids) = Ivf.indexFor(spark, dir)
    val probed = centroids.zipWithIndex
      .map { case (c, j) =>
        var acc = 0.0; var i = 0
        while (i < c.length) { val d = c(i) - queryVec(i); acc += d * d; i += 1 }
        (acc, j)
      }
      .sortBy(identity)
      .take(math.min(math.max(1, nprobe), centroids.length))
      .map(_._2)
    val cand = assign.filter(col("cluster_id").isInCollection(probed.toSeq))
      .select("id").join(encode(spark, dir, m), "id")
    adcTopK(spark, dir, cand, queryVec, k, m, refine)
  }

  /** Shared ADC core over any (id, codes) candidate frame. For Cosine
    * the ADC table is built from the NORMALIZED query (matching the
    * normalized codebooks) while the exact refine re-ranks with true
    * cosine distance on the raw vectors.
    */
  private def adcTopK(spark: SparkSession, dir: String, codesDf: DataFrame,
                      queryVec: Array[Float], k: Int, m: Int,
                      refine: Int, metric: Int = VectorMetric.L2): DataFrame = {
    val model = train(spark, dir, m, metric)
    require(queryVec.length == model.dim,
      s"query dim ${queryVec.length} != corpus dim ${model.dim}")
    val q0 =
      if (metric != VectorMetric.Cosine) queryVec
      else {
        val n = math.sqrt(queryVec.map(x => x.toDouble * x).sum)
        if (n == 0.0) queryVec else queryVec.map(x => (x / n).toFloat)
      }
    val table: Seq[Seq[Double]] = (0 until m).map { mi =>
      val q = q0.slice(mi * model.subDim, (mi + 1) * model.subDim)
      model.codebooks(mi).toSeq.map { c =>
        var acc = 0.0; var i = 0
        while (i < q.length) { val d = q(i) - c(i); acc += d * d; i += 1 }
        acc
      }
    }
    val tlit = typedlit(table)
    val adist = (0 until m).map { mi =>
      element_at(element_at(tlit, mi + 1),
        element_at(col("codes"), mi + 1).cast("int") + 1)
    }.reduce(_ + _)
    val shortlist = codesDf
      .select(col("id").as("neighbor_id"), sqrt(adist).as("dist"))
      .orderBy(col("dist"), col("neighbor_id"))
      .limit(k * math.max(1, refine))
    if (refine <= 1) shortlist.limit(k)
    else {
      val exact = metric match {
        case VectorMetric.Cosine => graft.functions.VectorFunctions
          .cosineDistance(col("vec"), typedlit(queryVec.toSeq))
        case _ => graft.functions.VectorFunctions
          .l2Distance(col("vec"), typedlit(queryVec.toSeq))
      }
      shortlist.select(col("neighbor_id"))
        .join(corpus(spark, dir).withColumnRenamed("id", "neighbor_id"),
          "neighbor_id")
        .select(col("neighbor_id"), exact.as("dist"))
        .orderBy(col("dist"), col("neighbor_id"))
        .limit(k)
    }
  }

  /** M inter-centroid squared-l2 tables for symmetric PQ distance. */
  private def sdcTable(model: Model): Array[Array[Array[Double]]] =
    model.codebooks.map { cb =>
      cb.map { a =>
        cb.map { b =>
          var acc = 0.0; var i = 0
          while (i < a.length) { val d = a(i).toDouble - b(i); acc += d * d; i += 1 }
          acc
        }
      }
    }

  /** Batch ANN entirely in the compressed domain (SDC): every corpus
    * vector's top-k neighbors from codes alone. Same probe/shuffle
    * skeleton as Ivf.annBatch (probe set shuffle-joins cluster members,
    * never broadcast), but pair rows carry M-byte codes instead of
    * 4·dim-byte vectors and each pair costs M table lookups via the
    * SdcDistance expression (codebook distance table as a codegen
    * reference object — see PqExprs for why literals would be a
    * disaster here) instead of a full-dim cosine. Both sides quantized
    * ⇒ coarser than ADC: the compressed-domain recall floor is pinned
    * in PqSpec; serving stacks an exact refine on the survivors
    * exactly as topK/queryIvfPq do.
    */
  def sdcBatch(spark: SparkSession, dir: String, k: Int,
               nprobeOpt: Option[Int] = None, m: Int = SubspaceCount): DataFrame = {
    val model = train(spark, dir, m)
    val (assign, centroids) = Ivf.indexFor(spark, dir)
    val queries = corpus(spark, dir)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val codes = encode(spark, dir, m)
    val probes = Ivf.probeSelect(queries, centroids,
      nprobeOpt.getOrElse(centroids.length))
      .select(col("query_id"), col("probe_cluster"))
      .join(codes.select(col("id").as("query_id"), col("codes").as("qcodes")),
        "query_id")
    val codeLists = assign.join(codes, "id")
      .select(col("cluster_id"), col("id").as("neighbor_id"), col("codes"))
    val dist = graft.functions.PqFunctions
      .sdcDistance(col("qcodes"), col("codes"), sdcTable(model))
    codeLists.join(probes, col("cluster_id") === col("probe_cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(graft.functions.VectorFunctions
        .topKByDistance(dist, col("neighbor_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "nn")))
      .select(col("query_id"), col("nn.id").as("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Persist the IVF-PQ index: codes partitioned by cluster_id (probe
    * pruning happens at planning time, same layout contract as
    * Ivf.writeIndex), plus the coarse centroids and PQ codebooks as
    * underscore-prefixed sidecar tables so the index outlives the
    * session that built it.
    */
  def writeIvfPq(spark: SparkSession, dir: String, outPath: String,
                 m: Int = SubspaceCount): Unit = {
    import spark.implicits._
    val (assign, centroids) = Ivf.indexFor(spark, dir)
    val model = train(spark, dir, m)
    assign.join(encode(spark, dir, m), "id")
      .select(col("cluster_id"), col("id"), col("codes"))
      .repartition(col("cluster_id")) // one file per list, not per task×list
      .write.mode("overwrite").partitionBy("cluster_id").parquet(outPath)
    centroids.zipWithIndex.map { case (c, j) => (j, c.toSeq) }.toSeq
      .toDF("cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$outPath/_centroids")
    (for {
      mi <- model.codebooks.indices
      c <- model.codebooks(mi).indices
    } yield (mi, c, model.codebooks(mi)(c).toSeq))
      .toDF("m_idx", "code", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$outPath/_codebooks")
  }

  /** Query a persisted IVF-PQ index: probe selection over the loaded
    * centroids (driver math, KBs), partition-pruned read of ONLY the
    * probed code lists, ADC ranking from the loaded codebooks. Pure
    * compressed-domain search — no raw vector is read; callers that
    * want the exact refine re-rank pass the vector table (at scale:
    * k·refine point lookups against the primary store).
    */
  def queryIvfPq(spark: SparkSession, indexPath: String,
                 queryVec: Array[Float], k: Int, nprobe: Int,
                 refineWith: Option[DataFrame] = None,
                 refine: Int = 4): DataFrame = {
    val centroids = spark.read.parquet(s"$indexPath/_centroids")
      .orderBy("cid").collect().map(_.getSeq[Float](1).toArray)
    val cbRows = spark.read.parquet(s"$indexPath/_codebooks")
      .orderBy("m_idx", "code").collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val codebooks = cbRows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray)).toArray
    val subDim = codebooks(0)(0).length
    require(queryVec.length == m * subDim,
      s"query dim ${queryVec.length} != index dim ${m * subDim}")
    val probed = centroids.zipWithIndex
      .map { case (c, j) =>
        var acc = 0.0; var i = 0
        while (i < c.length) { val d = c(i) - queryVec(i); acc += d * d; i += 1 }
        (acc, j)
      }
      .sortBy(identity)
      .take(math.min(math.max(1, nprobe), centroids.length))
      .map(_._2)
    val table: Seq[Seq[Double]] = (0 until m).map { mi =>
      val q = queryVec.slice(mi * subDim, (mi + 1) * subDim)
      codebooks(mi).toSeq.map { c =>
        var acc = 0.0; var i = 0
        while (i < q.length) { val d = q(i) - c(i); acc += d * d; i += 1 }
        acc
      }
    }
    val tlit = typedlit(table)
    val adist = (0 until m).map { mi =>
      element_at(element_at(tlit, mi + 1),
        element_at(col("codes"), mi + 1).cast("int") + 1)
    }.reduce(_ + _)
    val shortlist = spark.read.parquet(indexPath)
      .filter(col("cluster_id").isInCollection(probed.toSeq))
      .select(col("id").as("neighbor_id"), sqrt(adist).as("dist"))
      .orderBy(col("dist"), col("neighbor_id"))
      .limit(k * math.max(1, refine))
    refineWith match {
      case None => shortlist.limit(k)
      case Some(vecs) =>
        val exact = graft.functions.VectorFunctions
          .l2Distance(col("vec"), typedlit(queryVec.toSeq))
        shortlist.select(col("neighbor_id"))
          .join(vecs.select(col("vec_id").as("neighbor_id"),
            col("embedding").as("vec")), "neighbor_id")
          .select(col("neighbor_id"), exact.as("dist"))
          .orderBy(col("dist"), col("neighbor_id"))
          .limit(k)
    }
  }

  /** Driver query: PQ ADC top-10 for the vec_id=0 query (rows-only —
    * approximate by construction; PqSpec pins recall vs exact), plus
    * the per-vector byte footprint columns that tell the compression
    * story.
    */
  def pqTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val model = train(spark, dir)
    val q = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    topK(spark, dir, q, k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("dist"), col("neighbor_id"))))
      .select(col("neighbor_id"), col("rank"),
        lit(model.dim * 4).as("raw_bytes_per_vec"),
        lit(model.m).as("pq_bytes_per_vec"))
  }

  /** Driver query: compressed-domain batch ANN at the quarter-scan
    * serving configuration (rows-only; PqSpec pins the SDC recall
    * floor vs exact).
    */
  def sdcBatchQuery(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val n = Tables.embeddings(spark, dir).count()
    sdcBatch(spark, dir, k, nprobeOpt = Some(math.max(1, Ivf.defaultK(n) / 4)))
  }

  /** Driver query: IVF-PQ top-10 at nprobe = nClusters/4 for the
    * vec_id=0 query (rows-only; PqSpec pins probe-all ≡ flat-PQ and
    * nprobe recall).
    */
  def ivfpqTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val q = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val (_, centroids) = Ivf.indexFor(spark, dir)
    ivfPqTopK(spark, dir, q, k, nprobe = math.max(1, centroids.length / 4))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("dist"), col("neighbor_id"))))
      .select(col("neighbor_id"), col("rank"))
  }
}
