package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** IVF (inverted-file) ANN: k-means coarse quantizer + cluster-probed
  * search (SURVEY §7.5 "IVF partition pruning" — the second scale path
  * next to hyperplane LSH).
  *
  * Training is deterministic Lloyd's on a bounded, ordered sample
  * (driver-side — coarse quantizers are tiny and trained out-of-band at
  * any scale); the INVERTED LISTS — every vector's cluster assignment,
  * and its PQ codes for the ADC path — are built once per corpus
  * fingerprint and persisted `partitionBy(cluster)` ([[AnnIndex]]), the
  * on-disk analogue of FAISS's inverted lists. A search then touches
  * only its probes: the query batch is collected driver-side (query
  * batches are small by definition — they are the search INPUT, not the
  * corpus), each query names its `nProbe` nearest centroids, and the
  * candidate read is partition-pruned to exactly those clusters. Nothing
  * in the search plan scans, re-assigns, or re-encodes the corpus —
  * candidate volume scales with nProbe/k, and steady-state search cost
  * is O(probed partitions), sublinear in the corpus. */
object Ivf {

  /** The one cluster count shared by every IVF entry point's default
    * (`topKIvf`/`topKIvfPq`/`searchIvf`) AND by [[ivfRecallCurve]]'s
    * probe grid — the curve's "exhaustive at full probing" leg holds
    * only when its last grid point probes ALL cells, so grid and k must
    * move together. */
  val IvfK = 8

  /** Deterministic bounded training sample, shared by the coarse
    * quantizer and the PQ codebooks. Sampling is a value-hash filter
    * (`hash(vec_id) % every == 0`) — distribution-independent (no
    * dense-id assumption), narrow, and never a global sort; the tiny
    * collected set is ordered driver-side for reproducibility. Corpora
    * smaller than `minRows` fall back to the full set. */
  private[ops] def sampledVectors(v: DataFrame, minRows: Int,
                                  sampleCap: Int = 10000): Array[Array[Double]] = {
    val n = v.count()
    val every = math.max(1L, n / sampleCap)
    var rows = v.filter(pmod(hash(col("vec_id")), lit(every)) === 0)
      .select("vec_id", "e").collect()
    if (rows.length < minRows) rows = v.select("vec_id", "e").collect()
    rows.sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
  }

  /** Deterministic k-means centroids from a bounded sample (see
    * [[sampledVectors]] for the sampling contract). */
  def centroids(v: DataFrame, k: Int, iters: Int = 10,
                sampleCap: Int = 10000): Array[Array[Double]] =
    centroidsFrom(sampledVectors(v, k, sampleCap), k, iters)

  /** Driver-side Lloyd's on an already-collected sample. */
  private[ops] def centroidsFrom(sample: Array[Array[Double]], k: Int,
                                 iters: Int = 10): Array[Array[Double]] = {
    require(sample.length >= k)
    val dim = sample.head.length
    var cents = Array.tabulate(k)(i => sample(i * sample.length / k).clone())
    (1 to iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { x =>
        val c = nearest(cents, x)
        var j = 0
        while (j < dim) { sums(c)(j) += x(j); j += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  private[graft] def nearest(cents: Array[Array[Double]], x: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var j = 0
      while (j < x.length) { val t = x(j) - cents(c)(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private[graft] def nearestN(cents: Array[Array[Double]], x: Array[Double], n: Int): Seq[Int] =
    cents.indices.sortBy { c =>
      var d = 0.0
      var j = 0
      while (j < x.length) { val t = x(j) - cents(c)(j); d += t * t; j += 1 }
      d
    }.take(n)

  /** Assign each vector to its nearest centroid (compiled map). */
  def assign(v: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    import v.sparkSession.implicits._
    v.select("vec_id", "e", "nrm").as[(Long, Seq[Double], Double)]
      .map { case (id, e, nrm) => (id, e, nrm, nearest(cents, e.toArray)) }
      .toDF("vec_id", "e", "nrm", "cluster")
  }

  /** Coarse centroids + PQ codebooks for `v`'s vector set, loaded from
    * the persisted model store when fingerprint-fresh, trained (one
    * sampling pass feeding BOTH quantizers — they must train on the same
    * sample anyway) and persisted otherwise. See [[IvfModel]]. */
  private[ops] def trainedModel(v: DataFrame, dir: String, table: String, k: Int,
                                m: Int = 16, codes: Int = 16,
                                version: Option[(Long, Long)] = None): IvfModel.Model =
    IvfModel.trainedOrLoad(v, dir, s"${table}_k${k}m${m}c$codes", () => {
      val sample = sampledVectors(v, math.max(k, codes))
      val cents = centroidsFrom(sample, k)
      (cents, pqCodebooksFrom(sample, cents, m, codes))
    }, version)

  /** Query batch collected to the driver: (vec_id, e, nrm), id-ordered.
    * Queries are the tiny side of a search at any corpus scale. */
  private def collectQueries(v: DataFrame, pred: Column)
      : Array[(Long, Seq[Double], Double)] = {
    import v.sparkSession.implicits._
    v.filter(pred).select("vec_id", "e", "nrm")
      .as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
  }

  /** Ensure the persisted flat inverted lists (vec_id, e, nrm) laid out
    * by cluster exist for (v, model); returns their path. The one-time
    * BUILD widens to full parallelism (a single-file scan would
    * serialize the assignment onto one core); search-path callers can
    * therefore pass unshuffled vectors. */
  private[ops] def ensureFlatLists(v: DataFrame, dir: String, table: String,
                                   m: IvfModel.Model, k: Int): String = {
    val path = AnnIndex.path(dir, s"ivfflat_${table}_k$k", m.fp)
    AnnIndex.ensure(v.sparkSession, path, "cluster", () =>
      assign(v.repartition(v.sparkSession.sparkContext.defaultParallelism),
        m.cents))
    path
  }

  /** IVF top-k over an arbitrary normalized vector table `v` with columns
    * (vec_id, e, nrm): queries (rows matching `queryPred`) probe their
    * `nProbe` nearest clusters, candidates come from a PARTITION-PRUNED
    * read of the persisted inverted lists — the corpus appears nowhere
    * in the search plan. `table` names the vector set for artifact
    * keying.
    *
    * `version`: caller-supplied corpus version replacing the computed
    * value fingerprint as the artifact key (see
    * [[IvfModel.trainedOrLoad]]) — with it, the search plan touches the
    * corpus ZERO times beyond the query-row filter; without it, one
    * no-shuffle scalar fingerprint aggregate guards staleness. */
  def searchIvf(v: DataFrame, dir: String, table: String, queryPred: Column,
                k: Int = IvfK, nProbe: Int = 4, topN: Int = 10,
                version: Option[(Long, Long)] = None): DataFrame = {
    val m = trainedModel(v, dir, table, k, version = version)
    val flat = ensureFlatLists(v, dir, table, m, k)
    probeAndRank(v.sparkSession, m, flat, collectQueries(v, queryPred),
      nProbe, topN, listFilter = None)
  }

  /** The ONE probe-and-rank dataflow shared by plain and filtered IVF
    * search: query batch → nProbe nearest centroids → partition-pruned
    * read of the persisted lists at `listsPath` (plus an optional
    * attribute predicate applied INSIDE the pruned scan) → cosine →
    * per-query top-`topN`. Any change to ranking, tie-breaks, or
    * self-exclusion lands in every search variant at once. */
  private def probeAndRank(s: SparkSession, m: IvfModel.Model,
                           listsPath: String,
                           qRows: Array[(Long, Seq[Double], Double)],
                           nProbe: Int, topN: Int,
                           listFilter: Option[Column]): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graftshim.Shim
    val probesLocal = qRows.toSeq.flatMap { case (id, e, nrm) =>
      nearestN(m.cents, e.toArray, nProbe).map(c => (id, e, nrm, c.toLong)) }
    val probes = probesLocal.toDF("qid", "ea", "na", "cluster")
    val pruned = AnnIndex.readPruned(s, listsPath, "cluster",
      probesLocal.map(_._4).distinct)
    val lists = listFilter.fold(pruned)(pruned.filter)
      .select(col("vec_id").as("nid"), col("e").as("eb"),
        col("nrm").as("nb"), col("cluster").cast("long").as("cluster"))
    val dot = Shim.column(DotDouble(Shim.expression(col("ea")), Shim.expression(col("eb"))))
    // no dedup needed: assignment is a function, so a (query, candidate)
    // pair meets in at most one cluster
    probes.join(lists, Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cosine", round(dot / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))))
      .filter(col("rank") <= topN)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  /** IVF top-k on the embeddings table: queries are vec_id < 10. Raw
    * (unshuffled) vectors — searchIvf's corpus-width touches are the
    * fingerprint aggregate and the one-time build, which widens
    * itself. */
  def topKIvf(s: SparkSession, dir: String, k: Int = IvfK, nProbe: Int = 4): DataFrame =
    searchIvf(Similarity.rawVecs(Tables.load(s, dir, "embeddings")), dir,
      "embeddings", col("vec_id") < 10, k, nProbe)

  /** ann_topk_ivf gates on deterministic recall-vs-brute (see
    * [[Similarity.recallGate]]); the listing itself is cross-checked in
    * OpsSpec. */
  def ivfRecall(s: SparkSession, dir: String): DataFrame =
    Similarity.recallGate(s, dir, "ivf", topKIvf(s, dir))

  // ------------------------------------------- metadata-filtered search

  /** The filter target for the [[topKIvfFiltered]] gate. */
  val FilterLabel = 1

  /** nProbe for filtered search. A metadata filter thins every probed
    * list (only ~1/|labels| of its vectors qualify), so the true
    * filtered neighbors spread over MORE clusters than unfiltered ones —
    * production filtered-ANN probes wider to hold recall; 6 of 8 here. */
  val FilteredNProbe = 6

  /** Fingerprint covering vectors AND the label payload — the `ivfmeta`
    * artifact bakes the label column into the persisted lists, so a
    * label-only change (vectors identical, labels corrected) must miss
    * the artifact key and rebuild; keying by the vector-only model
    * fingerprint would serve STALE labels silently. */
  private def labeledFingerprint(v: DataFrame): (Long, Long) =
    IvfModel.fingerprintOf(v,
      xxhash64(col("vec_id"), hash(col("e")).cast("long"), col("label")))

  /** Metadata-filtered IVF top-k: neighbors must satisfy a predicate on
    * an attribute column (here `label === target`) — the
    * filtered-vector-search shape (every production ANN store supports
    * it: Milvus/Qdrant/Vespa filtered queries).
    *
    * PRE-filtering, done where it scales: the inverted lists are
    * persisted WITH the payload attribute (`ivfmeta` artifact, keyed by
    * [[labeledFingerprint]] — metadata rides the index, the join to
    * attach it happens once at build), so a search partition-prunes to
    * its probed clusters and applies the attribute predicate INSIDE the
    * pruned scan, before any distance is computed. Post-filtering
    * (score first, filter the top-k after) would return < k rows
    * whenever the filter is selective; re-touching the corpus for the
    * attribute would defeat the index. Neither happens here. */
  def topKIvfFiltered(s: SparkSession, dir: String, k: Int = IvfK,
                      nProbe: Int = FilteredNProbe, topN: Int = 10,
                      target: Int = FilterLabel): DataFrame = {
    val v = Similarity.rawVecs(Tables.load(s, dir, "embeddings"))
    val m = trainedModel(v, dir, "embeddings", k)
    val metaPath = AnnIndex.path(dir, s"ivfmeta_embeddings_k$k",
      labeledFingerprint(v))
    AnnIndex.ensure(s, metaPath, "cluster", () =>
      assign(v.repartition(s.sparkContext.defaultParallelism), m.cents)
        .join(v.select(col("vec_id"), col("label")), Seq("vec_id")))
    probeAndRank(s, m, metaPath, collectQueries(v, col("vec_id") < 10),
      nProbe, topN,
      // inside the pruned scan — lands as a parquet pushdown
      listFilter = Some(col("label") === target))
  }

  /** Brute filtered truth: exact top-k among label-matching neighbors —
    * the gate's recall denominator (tiny: |queries| × filtered corpus). */
  private[ops] def bruteFiltered(s: SparkSession, dir: String,
                                 topN: Int = 10,
                                 target: Int = FilterLabel): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    val v = Similarity.vecs(Tables.load(s, dir, "embeddings"))
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("e").as("ea"), col("nrm").as("na"))
    val n = v.filter(col("label") === target)
      .select(col("vec_id").as("nid"), col("e").as("eb"), col("nrm").as("nb"))
    val dot = Shim.column(DotDouble(Shim.expression(col("ea")), Shim.expression(col("eb"))))
    q.join(n, col("qid") =!= col("nid"))
      .withColumn("cosine", round(dot / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))))
      .filter(col("rank") <= topN)
      .select(col("qid"), col("nid"))
  }

  /** ann_topk_filtered gates on deterministic recall vs the exact
    * filtered truth, the [[Similarity.recallGate]] recipe — including
    * its TruthCache: the brute filtered pass runs once per corpus
    * (label-aware fingerprint), not twice per gate invocation. */
  def ivfFilteredRecall(s: SparkSession, dir: String): DataFrame = {
    val fp = labeledFingerprint(
      Similarity.rawVecs(Tables.load(s, dir, "embeddings")))
    val brute = TruthCache.cached(s, "ann_brute_filtered_topk", fp,
      bruteFiltered(s, dir))
    val ann = topKIvfFiltered(s, dir).select(col("qid"), col("nid"))
    brute.join(ann, Seq("qid", "nid"), "left_semi")
      .agg(count(lit(1)).as("hits"))
      .crossJoin(brute.agg(count(lit(1)).as("n_expected")))
      .select(lit("ivf_filtered").as("method"), col("n_expected"),
        expr("(n_expected*7 + 9) DIV 10").as("min_hits"),
        (col("hits") >= expr("(n_expected*7 + 9) DIV 10")).as("recall_ok"))
  }

  // ---------------------------------------------------- IVF-PQ (ADC)

  /** Product-quantization codebooks over coarse-quantizer RESIDUALS:
    * `m` subspaces × `codes` centroids each, trained with the same
    * deterministic driver-side Lloyd's on the same hash-sampled set as
    * [[centroids]] (codebooks are a few KB at any corpus size).
    * Returns cb(sub)(code) = subvector centroid. */
  def pqCodebooks(v: DataFrame, cents: Array[Array[Double]],
                  m: Int, codes: Int, iters: Int = 10,
                  sampleCap: Int = 10000): Array[Array[Array[Double]]] =
    pqCodebooksFrom(sampledVectors(v, codes, sampleCap), cents, m, codes, iters)

  /** PQ codebook training on an already-collected sample. */
  private[ops] def pqCodebooksFrom(sample: Array[Array[Double]],
                                   cents: Array[Array[Double]],
                                   m: Int, codes: Int,
                                   iters: Int = 10): Array[Array[Array[Double]]] = {
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val residuals = sample.map { x =>
      val c = cents(nearest(cents, x))
      Array.tabulate(dim)(j => x(j) - c(j))
    }
    Array.tabulate(m) { s =>
      val slice = residuals.map(r => java.util.Arrays.copyOfRange(r, s * sub, (s + 1) * sub))
      var cb = Array.tabulate(codes)(i => slice(i * slice.length / codes).clone())
      (1 to iters).foreach { _ =>
        val sums = Array.fill(codes)(new Array[Double](sub))
        val counts = new Array[Long](codes)
        slice.foreach { x =>
          val c = nearest(cb, x)
          var j = 0
          while (j < sub) { sums(c)(j) += x(j); j += 1 }
          counts(c) += 1
        }
        cb = Array.tabulate(codes)(c =>
          if (counts(c) == 0) cb(c) else sums(c).map(_ / counts(c)))
      }
      cb
    }
  }

  /** PQ-encode assigned vectors: (vec_id, cluster, codes array<int>, nrm).
    * Storage contract at 100 TB: m bytes per vector (plus the coarse id)
    * instead of 4·dim — the inverted lists fit in memory where raw
    * vectors cannot. The exact norm is retained (8 bytes) so re-ranking
    * cosine denominators stay exact. */
  def pqEncode(assigned: DataFrame, cents: Array[Array[Double]],
               cb: Array[Array[Array[Double]]]): DataFrame = {
    import assigned.sparkSession.implicits._
    val m = cb.length
    assigned.select(col("vec_id"), col("e"), col("nrm"),
      col("cluster").cast("int"))
      .as[(Long, Seq[Double], Double, Int)]
      .map { case (id, e, nrm, c) =>
        val cent = cents(c)
        val dim = e.length
        val sub = dim / m
        val codesArr = Array.tabulate(m) { s =>
          val r = Array.tabulate(sub)(j => e(s * sub + j) - cent(s * sub + j))
          nearest(cb(s), r)
        }
        (id, c, codesArr.toSeq, nrm)
      }
      .toDF("nid", "cluster", "codes", "nb")
  }

  /** IVF-PQ top-k with asymmetric distance computation (ADC): queries
    * probe `nProbe` clusters; candidates are scored from their PQ codes —
    * read PARTITION-PRUNED from the persisted code lists (built once from
    * the flat lists, never re-encoded at search time) — against a
    * per-(query, cluster) lookup table: dot(q, x̂) where x̂ = centroid +
    * Σ codebook entries, O(m) per candidate after an O(codes·dim) LUT
    * built once per (query, cluster) per partition. The ADC
    * top-`shortlist` are then re-ranked with exact vectors fetched from
    * the flat lists under the SAME cluster pruning (every shortlist
    * member lives in a probed cluster). */
  def topKIvfPq(s: SparkSession, dir: String, k: Int = IvfK, nProbe: Int = 4,
                m: Int = 16, codes: Int = 16, shortlist: Int = 50): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.graftshim.Shim
    val v = Similarity.rawVecs(Tables.load(s, dir, "embeddings"))
    val model = trainedModel(v, dir, "embeddings", k, m, codes)
    val flat = ensureFlatLists(v, dir, "embeddings", model, k)
    val pqPath = AnnIndex.path(dir, s"ivfpq_embeddings_k${k}m${m}c$codes", model.fp)
    // the code lists derive from the already-persisted flat lists — the
    // corpus itself is not re-read, let alone re-assigned
    AnnIndex.ensure(s, pqPath, "cluster",
      () => pqEncode(s.read.parquet(flat), model.cents, model.cb))
    val qRows = collectQueries(v, col("vec_id") < 10)
    val probesLocal = qRows.toSeq.flatMap { case (id, e, _) =>
      nearestN(model.cents, e.toArray, nProbe).map(c => (id, e, c.toLong)) }
    val probedClusters = probesLocal.map(_._3).distinct
    val probes = probesLocal.toDF("qid", "ea", "cluster")
    val encoded = AnnIndex.readPruned(s, pqPath, "cluster", probedClusters)
      .select(col("nid"), col("codes"), col("nb"),
        col("cluster").cast("long").as("cluster"))
    val joined = probes.join(encoded, Seq("cluster"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "ea", "cluster", "nid", "codes", "nb")
      .as[(Long, Seq[Double], Long, Long, Seq[Int], Double)]
    val bCents = s.sparkContext.broadcast(model.cents)
    val bCb = s.sparkContext.broadcast(model.cb)
    val approx = joined.mapPartitions { it =>
      val cents = bCents.value
      val cb = bCb.value
      val nSub = cb.length
      // ADC lookup tables, one per (query, cluster) seen in this partition
      val luts = scala.collection.mutable.HashMap
        .empty[(Long, Long), (Double, Array[Array[Double]])]
      it.map { case (qid, ea, cluster, nid, codesSeq, nb) =>
        val (qDotC, lut) = luts.getOrElseUpdate((qid, cluster), {
          val q = ea.toArray
          val cent = cents(cluster.toInt)
          var qc = 0.0
          var j = 0
          while (j < q.length) { qc += q(j) * cent(j); j += 1 }
          val sub = q.length / nSub
          val t = Array.tabulate(nSub) { sIdx =>
            val entries = cb(sIdx)
            Array.tabulate(entries.length) { code =>
              var d = 0.0
              var jj = 0
              while (jj < sub) { d += q(sIdx * sub + jj) * entries(code)(jj); jj += 1 }
              d
            }
          }
          (qc, t)
        })
        var est = qDotC
        var sIdx = 0
        while (sIdx < nSub) { est += lut(sIdx)(codesSeq(sIdx)); sIdx += 1 }
        // the ranking metric is COSINE: divide by the candidate's exact
        // stored norm (the query norm is constant per ranking group) —
        // otherwise a high-norm low-cosine vector crowds the shortlist
        (qid, nid, est / nb)
      }
    }.toDF("qid", "nid", "approx")
    val short = approx
      .withColumn("arank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("approx").desc, col("nid"))))
      .filter(col("arank") <= shortlist)
      .select("qid", "nid")
    // exact re-rank of the shortlist: query vectors are local; candidate
    // vectors come from the flat lists, pruned to the probed clusters
    val q = qRows.toSeq.map { case (id, e, nrm) => (id, e, nrm) }
      .toDF("qid", "ea", "na")
    val nb = AnnIndex.readPruned(s, flat, "cluster", probedClusters)
      .select(col("vec_id").as("nid"), col("e").as("eb"), col("nrm").as("nb"))
    val dot = Shim.column(DotDouble(Shim.expression(col("ea")), Shim.expression(col("eb"))))
    short.join(q, "qid").join(nb, "nid")
      .withColumn("cosine", round(dot / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  /** ann_topk_ivfpq gates on deterministic recall-vs-brute, like IVF. */
  def ivfPqRecall(s: SparkSession, dir: String): DataFrame =
    Similarity.recallGate(s, dir, "ivfpq", topKIvfPq(s, dir))

  /** IVF TUNING CURVE (`ann_recall_curve`) — recall@10 vs nProbe over
    * the persisted inverted lists: the artifact a deployment reads to
    * pick its probe budget (recall rises with probes, cost linearly
    * with probed cells). Two DETERMINISTIC guarantees gate it, next to
    * the single-point recall bounds of the `ann_topk_*` family:
    * hit counts are NON-DECREASING in nProbe (probing more cells can
    * only add candidates — a violation means the probe path DROPS
    * candidates), and at nProbe = k every cell is probed, IVF
    * degenerates to exhaustive search, and the hits equal the brute
    * truth EXACTLY (same 6-dp rounding and (cosine, nid) tiebreak).
    * Cost: 4 partition-pruned probes of the one persisted index plus
    * the fingerprint-cached brute truth. */
  def ivfRecallCurve(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fp = IvfModel.fingerprint(
      Similarity.rawVecs(Tables.load(s, dir, "embeddings")))
    val brute = TruthCache.cached(s, "ann_brute_topk", fp,
      Similarity.topK(s, dir).select(col("qid"), col("nid")))
    // powers of two up to IvfK — derived, so the final grid point always
    // probes EVERY cell and the exact_at_full leg stays exercised if the
    // cluster count changes
    val probeGrid = Iterator.iterate(1)(_ * 2).takeWhile(_ < IvfK).toSeq :+ IvfK
    val perProbe = probeGrid.map { np =>
      brute.join(topKIvf(s, dir, nProbe = np).select(col("qid"), col("nid")),
          Seq("qid", "nid"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(np).as("nprobe"), col("hits"))
    }.reduce(_ unionByName _)
    // the 4-row curve: a global window over it is bounded by the probe
    // grid, never by the corpus (the q05_window_global pattern)
    val w = Window.orderBy("nprobe")
    perProbe.crossJoin(brute.agg(count(lit(1)).as("n_expected")))
      .withColumn("mono_ok",
        coalesce(col("hits") >= lag("hits", 1).over(w), lit(true)))
      .withColumn("exact_at_full",
        col("nprobe") =!= lit(IvfK) || col("hits") === col("n_expected"))
      .select(col("nprobe"), col("n_expected"), col("mono_ok"),
        col("exact_at_full"))
      .orderBy("nprobe")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_ivf" -> (ivfRecall _),
    "ann_topk_ivfpq" -> (ivfPqRecall _),
    "ann_recall_curve" -> (ivfRecallCurve _),
    "ann_topk_filtered" -> (ivfFilteredRecall _))

  private def recallOracle(method: String): String = s"""
      SELECT '$method' AS method,
        CAST(10*COUNT(*) AS BIGINT) AS n_expected,
        CAST((10*COUNT(*)*7 + 9)//10 AS BIGINT) AS min_hits,
        TRUE AS recall_ok
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 10)"""

  val oracle: Map[String, String] = Map(
    "ann_topk_ivf" -> recallOracle("ivf"),
    "ann_topk_ivfpq" -> recallOracle("ivfpq"),
    // the curve's guarantees are literal TRUE; n_expected anchors it
    "ann_recall_curve" -> """
      SELECT nprobe,
        (SELECT CAST(10*COUNT(*) AS BIGINT)
         FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < 10))
          AS n_expected,
        TRUE AS mono_ok, TRUE AS exact_at_full
      FROM (SELECT unnest([1, 2, 4, 8]) AS nprobe)
      ORDER BY nprobe""",
    // n_expected per query = min(10, |label-matching neighbors|), the
    // query itself excluded when it carries the target label — exactly
    // the filtered brute truth's row count
    "ann_topk_filtered" -> s"""
      WITH nl AS (SELECT COUNT(*) AS c FROM embeddings
                  WHERE label = $FilterLabel),
      per AS (
        SELECT LEAST(10, (SELECT c FROM nl) -
          CASE WHEN label = $FilterLabel THEN 1 ELSE 0 END) AS k
        FROM embeddings WHERE vec_id < 10)
      SELECT 'ivf_filtered' AS method,
        CAST(SUM(k) AS BIGINT) AS n_expected,
        CAST((SUM(k)*7 + 9)//10 AS BIGINT) AS min_hits,
        TRUE AS recall_ok
      FROM per""")
}
