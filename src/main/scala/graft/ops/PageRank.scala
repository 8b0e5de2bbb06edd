package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed PageRank — the iterative-graph workload class (the other
  * one, next to [[Components]]' connected components), engine-exact
  * across 10 damped power iterations. Two variants:
  *
  *  - [[pagerank]]: the customer↔supplier trade graph under symmetric
  *    closure — every node has out-edges, so no dangling term.
  *  - [[pagerankDangling]]: the one-way customer→supplier graph, where
  *    every supplier is a SINK. Real 100 TB web/trade graphs have
  *    sinks, and dropping their mass makes ranks drain to the damping
  *    floor; the standard fix redistributes each round's dangling mass
  *    uniformly. That term costs ONE extra 1-row aggregate per round —
  *    the dangling flag rides the rank vector, so no per-round join
  *    finds the sinks — computed inside the round's dataflow and
  *    folded back through a 1-row broadcast, so each round stays ONE
  *    job and the driver holds nothing.
  *
  * Determinism contract (the [[TextAnalysis.classifierTrain]] recipe):
  * per-edge contributions are rounded to 12 dp in DOUBLE — identical
  * IEEE value on both engines — then cast to DECIMAL(18,12) so the
  * per-node SUM is exact integer arithmetic, independent of
  * aggregation order; the damped update re-rounds to 12 dp. The
  * dangling-mass sum rides the same DECIMAL(18,12) exactness (see
  * [[contribOf]] for why 18,12 and not 38,18). The
  * DuckDB oracle replays the identical expression tree as 10 unrolled
  * CTEs.
  *
  * Scale shape: ranks and edges shuffle on the node id only (join on
  * src, aggregate on dst — the same key layout Pregel uses); outdeg is
  * precomputed once and rides the edge table; each iteration is ONE
  * hash exchange (the dst aggregate; the dangling scalar adds a 1-row
  * SinglePartition gather, not a hash shuffle), localCheckpoint'd so
  * lineage stays flat (at 100 TB: checkpoint to durable storage every
  * few rounds, same call). The only driver-side values are the node
  * count and the loop — never a rank vector.
  *
  * Conf isolation: the loop NEEDS AQE off (its re-planning invalidates
  * the carried co-partitioning) and shuffle.partitions pinned to the
  * edge-sized partition count. Those pins live on a PRIVATE session
  * clone (`newSession` — own SQLConf, shared SparkContext), so a
  * concurrent query on the caller's session can never observe mutated
  * global conf (the r8 verdict's latent-hazard note; no try/finally
  * restore dance needed, the clone is simply dropped).
  */
object PageRank {

  val PrIters = 10
  val Damping = 0.85

  /** Fingerprint of the trade-graph inputs (orders ⨝ lineitem) — two
    * narrow scan-side aggregates, mixed; keys the edge-table caches.
    * Every consumer takes an optional caller-supplied `version` that
    * REPLACES this computed fingerprint (the [[IvfModel.trainedOrLoad]]
    * contract): when the corpus lives in a versioned store
    * (ManifestStore), cache validation costs a manifest read, not a
    * corpus scan — the remaining 100 TB scan in the warm path
    * otherwise. The price is identical: a version that fails to change
    * with the data serves stale edge tables by design. */
  private def tradeFingerprint(s: SparkSession, dir: String): (Long, Long) = {
    val o = Tables.load(s, dir, "orders")
    val l = Tables.load(s, dir, "lineitem")
    val (co, ho) = IvfModel.fingerprintOf(o,
      xxhash64(col("o_orderkey"), col("o_custkey")))
    val (cl, hl) = IvfModel.fingerprintOf(l,
      xxhash64(col("l_orderkey"), col("l_suppkey")))
    (co * 1000003L + cl, ho ^ (hl * 31L))
  }

  /** Edges with the source's out-degree attached — a pure function of
    * the corpus, cached per (build, corpus fingerprint) like the
    * triangle edge set; [[pagerank]] re-partitions them on src (the
    * loop's join key) with a data-sized partition count, so no
    * iteration re-shuffles them. */
  private def edgesWithDeg(s: SparkSession, dir: String,
                           version: Option[(Long, Long)] = None): DataFrame =
    TruthCache.cached(s, TruthCache.vtag("pr_edges_sym", version),
      version.map(TruthCache.versionKey(dir, _))
        .getOrElse(tradeFingerprint(s, dir)), {
      val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
      val l = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_suppkey") + 100000L).as("supp"))
        .distinct()
      val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
        .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      edges.join(outdeg, "src")
    })

  /** Target edge rows per loop partition: the static stand-in for
    * AQE's coalescing (AQE is off inside the loop — see above). */
  val EdgeRowsPerPartition = 100000L

  /** Data-sized loop partition count, capped at cluster parallelism —
    * exactly what AQE's coalescing would pick, decided ONCE so every
    * round keeps the same partitioning. Floored at 2: a 1-partition
    * repartition checkpoints as SinglePartition, and the planner then
    * re-shuffles BOTH join sides to hashpartitioning(…, 1) instead of
    * recognizing the co-partitioning (observed on Spark 4.1 at tiny
    * corpora) — two partitions keep the carried hash partitioning and
    * the one-exchange-per-round contract at every scale. */
  private def loopParts(s: SparkSession, edgeCount: Long): Int =
    math.max(2L, math.min(s.sparkContext.defaultParallelism.toLong,
      edgeCount / EdgeRowsPerPartition + 1)).toInt

  def pagerank(s: SparkSession, dir: String): DataFrame = pagerank(s, dir, None)

  /** Checkpointed loop INPUTS (edges on src, nodes on node, node count,
    * partition count), memoized per (parent session, gate, corpus key) —
    * the continuation of the change-1/2/7 memo family: the inputs are
    * pure corpus functions already served from TruthCache, but every
    * invocation re-paid their repartition + localCheckpoint + two counts
    * (~0.5–1 s per graph gate). The corpus key is the same fingerprint /
    * caller version that keys the TruthCache entries, so staleness
    * behavior is unchanged (a rewritten corpus fingerprints differently
    * and misses; a versioned store that fails to bump its version serves
    * stale BY CONTRACT). The checkpointed RDDs are node/edge-sized. */
  private val symInputMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, (Long, Long)), (DataFrame, DataFrame, Long, Int)]()
  private val dangInputMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, (Long, Long)), (DataFrame, DataFrame, Long, Int)]()
  private val kcoreInputMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, (Long, Long)), (DataFrame, DataFrame, Long)]()

  /** The checkpointed RDD behind a localCheckpoint'd frame (the
    * LogicalRDD leaf), for explicit block release. */
  private def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Release a superseded checkpoint's MEMORY_AND_DISK blocks (async —
    * the caller never waits on the block manager). Guide §5: checkpoint
    * blocks that nothing can reference anymore are pure storage-memory
    * pressure on every later query in the session (r15 ADVICE #1: the
    * per-round vectors and superseded memo entries accumulated for the
    * JVM lifetime). */
  private lazy val quietTruncationWarn: Unit =
    // unpersisting a locally-checkpointed RDD logs a WARN that the data
    // "can no longer be recomputed" — for a SUPERSEDED round vector
    // that is the point, not a hazard; silence just that logger so ~30
    // identical lines per graph gate don't drown real warnings
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => }
  private def dropCkpt(df: DataFrame): Unit =
    try {
      quietTruncationWarn
      ckptRdd(df).foreach(_.unpersist(blocking = false))
    } catch { case _: Throwable => }

  /** computeIfAbsent with per-(session, tag) eviction: a NEW corpus
    * fingerprint supersedes every older entry under the same (session,
    * tag) — the old entries' checkpointed inputs can never be served
    * again (the key embeds the fingerprint) and their blocks are
    * unpersisted instead of leaking for the session lifetime (r15
    * ADVICE #1). */
  private def memoGet[V](
      memo: java.util.concurrent.ConcurrentHashMap[
        (SparkSession, String, (Long, Long)), V],
      key: (SparkSession, String, (Long, Long)),
      frames: V => Seq[DataFrame])(build: => V): V = {
    val v = memo.computeIfAbsent(key, _ => build)
    import scala.jdk.CollectionConverters._
    memo.keySet.asScala.toSeq
      .filter(k => (k._1 eq key._1) && k._2 == key._2 && k._3 != key._3)
      .foreach { stale =>
        Option(memo.remove(stale)).foreach(frames(_).foreach(dropCkpt))
      }
    v
  }

  /** Version-keyed entry: `version` (a store snapshot version + tag)
    * replaces the corpus-scan fingerprint as the edge-cache key. */
  def pagerank(s: SparkSession, dir: String,
               version: Option[(Long, Long)]): DataFrame = {
    val sess = pinnedLoopSession(s, s"pr_sym:$dir")
    val fp = version.map(TruthCache.versionKey(dir, _))
      .getOrElse(tradeFingerprint(sess, dir))
    val (ed, nodes, n, parts) = memoGet(symInputMemo,
      (s, s"pr_sym:$dir", fp), (v: (DataFrame, DataFrame, Long, Int)) =>
        Seq(v._1, v._2)) {
        val ed0 = edgesWithDeg(sess, dir, version)
        val p = loopParts(sess, ed0.count())
        sess.conf.set("spark.sql.shuffle.partitions", p)
        val e = ed0.repartition(p, col("src")).localCheckpoint()
        val nd = e.select(col("src").as("node")).distinct()
          .repartition(p, col("node")).localCheckpoint()
        (e, nd, nd.count(), p)
      }
    // the data-sized partition count is re-set per invocation (a pure
    // function of the corpus — concurrent writers write the same value)
    sess.conf.set("spark.sql.shuffle.partitions", parts)
    runSymLoop(ed, nodes, n)
  }

  /** Conf-pinned loop clones, memoized per (parent, tag): a FRESH clone
    * per invocation defeated every session-keyed metadata memo (table
    * loads, fingerprint, cached-artifact frames), so each graph-gate
    * call re-paid the corpus fingerprint scans and artifact listings.
    * AQE is pinned off at creation (constant); shuffle.partitions is
    * re-set per invocation to the data-sized loop partition count —
    * for one (tag = gate + corpus dir) that value is a pure function of
    * the corpus, so concurrent invocations write the same value and can
    * never observe a mutation. */
  private val loopSessions = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), SparkSession]()
  private def pinnedLoopSession(parent: SparkSession, tag: String): SparkSession =
    loopSessions.computeIfAbsent((parent, tag), _ => {
      val c = parent.newSession()
      c.conf.set("spark.sql.adaptive.enabled", "false")
      c
    })

  /** The damped symmetric loop over an ARBITRARY (src, dst, outdeg)
    * edge table — shared by the corpus gate and the closed-form volume
    * spec (ScaleSpec's ring graph). `build` receives the private
    * session clone so the edge dataframe executes under the pinned
    * loop conf. */
  private[graft] def pagerankLoop(s: SparkSession,
      build: SparkSession => DataFrame,
      tag: String = "pr_adhoc"): DataFrame = {
    val sess = pinnedLoopSession(s, tag) // private conf scope — see scaladoc
    val ed0 = build(sess)
    val parts = loopParts(sess, ed0.count())
    sess.conf.set("spark.sql.shuffle.partitions", parts)
    val ed = ed0.repartition(parts, col("src")).localCheckpoint()
    // nodes partitioned on node: the left join against per-round
    // contributions (hash-partitioned on dst by their aggregate) is
    // then co-partitioned — no exchange on either side
    val nodes = ed.select(col("src").as("node")).distinct()
      .repartition(parts, col("node")).localCheckpoint()
    runSymLoop(ed, nodes, nodes.count())
  }

  /** The 10 damped rounds over prepared inputs — shared by the ad-hoc
    * loop above and the memoized gate entry. */
  private def runSymLoop(ed: DataFrame, nodes: DataFrame,
                         n: Long): DataFrame = {
    val base = 0.15 / n // raw double, same expression as the oracle's
    // r0 is checkpointed as its OWN RDD: nodes is also the outer join
    // side of every round, and one checkpoint RDD appearing twice in a
    // plan gets attribute-deduplicated — the second occurrence loses
    // its carried partitioning and round 1 pays two spurious exchanges
    // (observed; rounds 2+ were always clean because derived ranks are
    // distinct plans)
    var ranks = nodes.withColumn("rank", round(lit(1.0 / n), 12))
      .localCheckpoint()
    // each round costs exactly ONE exchange (the dst aggregate):
    // ranks leave every round partitioned on node == the next join's
    // key, the edge side is pinned above, and shuffle_hash joins skip
    // the per-round sorts a merge join would redo on the same data
    for (i <- 1 to PrIters) {
      val next = nodes.join(contribOf(ranks, ed).hint("shuffle_hash"),
          col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit(base) + lit(Damping) *
            coalesce(col("sc").cast("double"), lit(0.0)), 12).as("rank"))
      // cut lineage EVERY round (measured: 0.35 s/round vs 0.73 s/round
      // effective when chaining 4 rounds per cut — shallow 3-stage jobs
      // plan and codegen cheaper than 12-stage chains, and the rank
      // vector is node-sized, so the materialization is the cheap part;
      // at 100 TB: durable checkpoint, same per-superstep cadence)
      val prev = ranks
      ranks = next.localCheckpoint()
      // the new checkpoint is EAGER, so by here nothing can re-read the
      // previous round's vector — release its blocks instead of letting
      // 10 vectors per invocation pile up in the block manager (§5)
      dropCkpt(prev)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy("node")
  }

  /** Per-round contributions: join ranks (on node) to the pinned edges
    * (on src), aggregate on dst — the round's ONE hash exchange.
    *
    * DECIMAL(18,12), not (38,18): a 12-dp-rounded double is EXACTLY a
    * scale-12 decimal (the cast recovers it with no boundary
    * ambiguity), per-node sums are bounded by the total rank mass (<1),
    * and precision ≤18 keeps every addition on Spark's Long-backed
    * Decimal fast path — the (38,18) sums ran the whole loop through
    * BigDecimal. Values are bit-identical either way; the oracle casts
    * the same width. */
  private def contribOf(ranks: DataFrame, ed: DataFrame): DataFrame =
    ranks.join(ed.hint("shuffle_hash"), col("node") === col("src"))
      .select(col("dst"),
        round(col("rank") / col("outdeg"), 12)
          .cast("decimal(18,12)").as("c"))
      .groupBy("dst").agg(sum(col("c")).as("sc"))

  /** One damped dangling-aware iteration: the contribution pipeline
    * plus the round's dangling mass — an exact DECIMAL(18,12) sum over
    * the flagged rows of the rank vector (the flag rides the vector,
    * so no join locates the sinks), computed IN the round's dataflow
    * and folded back through a 1-row broadcast, so each round is ONE
    * job; the driver never touches even the scalar. */
  private def prStepDangling(ranks: DataFrame, ed: DataFrame,
      nodes: DataFrame, base: Double, n: Long): DataFrame = {
    val dm = ranks.filter(col("dang"))
      .agg(coalesce(sum(round(col("rank"), 12).cast("decimal(18,12)")),
        lit(0).cast("decimal(18,12)")).as("dm"))
    nodes.join(contribOf(ranks, ed).hint("shuffle_hash"),
        col("node") === col("dst"), "left")
      .crossJoin(dm)
      .select(col("node"), col("dang"),
        round(lit(base) + lit(Damping) *
          (coalesce(col("sc").cast("double"), lit(0.0)) +
            col("dm").cast("double") / lit(n.toDouble)), 12).as("rank"))
  }

  /** Pinned-conf inputs for the dangling variant: (session clone,
    * edges w/ outdeg on src, flagged nodes on node, n). Shared by the
    * gate and the Plans single-round shape assertion. */
  private[graft] def danglingInputs(s: SparkSession, dir: String,
                                    version: Option[(Long, Long)] = None)
      : (SparkSession, DataFrame, DataFrame, Long) = {
    val sess = pinnedLoopSession(s, s"pr_dang:$dir")
    val fp = version.map(TruthCache.versionKey(dir, _))
      .getOrElse(tradeFingerprint(sess, dir))
    // edge table with out-degrees and the flagged node table are pure
    // corpus functions — cached like the symmetric/triangle edge sets;
    // the repartition + localCheckpoint onto the loop's partitioning is
    // ALSO a pure corpus function and is memoized per (session, corpus
    // key) with the same staleness key (see symInputMemo) — only the
    // live rank iteration recomputes per invocation
    val (ed, nodes, n, parts) = memoGet(dangInputMemo,
      (s, s"pr_dang:$dir", fp), (v: (DataFrame, DataFrame, Long, Int)) =>
        Seq(v._1, v._2)) {
      val ed0 = TruthCache.cached(sess,
        TruthCache.vtag("pr_edges_oneway", version), fp, {
        val o = Tables.load(sess, dir, "orders").select("o_orderkey", "o_custkey")
        val l = Tables.load(sess, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + 100000L).as("dst"))
          .distinct()
        val outdeg = pairs.groupBy("src").agg(count(lit(1)).as("outdeg"))
        pairs.join(outdeg, "src")
      })
      // every node, flagged dangling when it has NO out-edges (here: all
      // suppliers) — partitioned on node with the ranks
      val nodes0 = TruthCache.cached(sess,
        TruthCache.vtag("pr_nodes_oneway", version), fp, {
        val srcs = ed0.select(col("src")).distinct()
        ed0.select(col("src").as("node"))
          .union(ed0.select(col("dst").as("node"))).distinct()
          .join(srcs, col("node") === col("src"), "left")
          .select(col("node"), col("src").isNull.as("dang"))
      })
      val p = loopParts(sess, ed0.count())
      sess.conf.set("spark.sql.shuffle.partitions", p)
      val e = ed0.repartition(p, col("src")).localCheckpoint()
      val nd = nodes0.repartition(p, col("node")).localCheckpoint()
      (e, nd, nd.count(), p)
    }
    // AQE is already pinned off on the memoized clone; only the
    // data-sized partition count is (re-)set per invocation (a pure
    // function of the corpus — concurrent writers write the same value)
    sess.conf.set("spark.sql.shuffle.partitions", parts)
    (sess, ed, nodes, n)
  }

  /** PageRank over the ONE-WAY customer→supplier graph — every
    * supplier is a sink, exercising the per-round dangling-mass
    * redistribution the symmetric gate's closure dodges. */
  def pagerankDangling(s: SparkSession, dir: String): DataFrame =
    pagerankDangling(s, dir, None)

  def pagerankDangling(s: SparkSession, dir: String,
                       version: Option[(Long, Long)]): DataFrame = {
    val (_, ed, nodes, n) = danglingInputs(s, dir, version)
    val base = 0.15 / n
    var ranks = nodes.withColumn("rank", round(lit(1.0 / n), 12))
      .localCheckpoint()
    for (i <- 1 to PrIters) {
      // every superstep materializes (unlike the symmetric loop's
      // every-4 cadence): the vector is consumed TWICE per round — the
      // dangling aggregate and the contribution join — and re-deriving
      // it for each consumer would double the subtree per round
      val prev = ranks
      ranks = prStepDangling(ranks, ed, nodes, base, n).localCheckpoint()
      dropCkpt(prev) // superseded round vector — release (§5)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy("node")
  }

  /** Round 1 of the dangling loop, un-checkpointed — the Plans
    * §graph_pagerank_dangling section asserts the per-round exchange
    * budget on this dataflow (one hash exchange: the dst aggregate). */
  private[graft] def danglingRound(s: SparkSession, dir: String): DataFrame = {
    val (_, ed, nodes, n) = danglingInputs(s, dir)
    val r0 = nodes.withColumn("rank", round(lit(1.0 / n), 12))
      .localCheckpoint()
    prStepDangling(r0, ed, nodes, 0.15 / n, n)
  }

  /** Distributed triangle counting (the third graph workload, next to
    * PageRank and connected components) over the part CO-PURCHASE graph
    * (parts sharing an order, id-deduped).
    *
    * Degree-ordered edge orientation (Suri & Vassilvitskii, WWW'11 /
    * the standard "compact-forward" trick): every edge points from its
    * lower-(degree, id) endpoint to the higher, so each triangle is
    * counted exactly once AND every out-neighborhood is bounded by
    * O(√m) — a hub with millions of co-purchases never anchors the
    * count; its edges all point INTO it. The count itself is the
    * adjacency-intersection form (see [[triangleDataflow]]): per edge,
    * |N⁺(s) ∩ N⁺(t)| evaluated map-side — no wedge stream ever
    * materializes or shuffles. The triangle count is
    * orientation-independent, so the oracle replays a plain id-ordered
    * 3-way join. */
  def triangles(s: SparkSession, dir: String): DataFrame =
    triangles(s, dir, None)

  def triangles(s: SparkSession, dir: String,
                version: Option[(Long, Long)]): DataFrame = {
    val (pairs, triCount) = triangleDataflow(s, dir, version)
    // 1-row × 1-row stats join — the only nested-loop in the query, by
    // construction over two scalar aggregates (the dataflow itself is
    // plan-asserted cross-product-free in PLANS.md §graph_triangles)
    pairs.agg(count(lit(1)).as("n_edges")).crossJoin(triCount)
  }

  /** (distinct co-purchase edges, 1-row triangle count) — the asserted
    * dataflow, shared by the gate and the plan section.
    *
    * The edge set and its degree orientation are PURE FUNCTIONS of the
    * lineitem corpus, and the lineitem self-join that builds them was
    * 13 s of a 135 s bench — rebuilt identically on every run (the r8
    * verdict's top perf note). Both now persist through [[TruthCache]]
    * keyed by (code build, corpus fingerprint): the warm path reads
    * two cached parquet tables and pays only the wedge + closure joins
    * (plan-asserted: the warm plan scans `graft_truth_` stores). A
    * changed corpus or recompiled definition misses the cache and
    * rebuilds — same sensitivity, no redundant recomputation. */
  /** The distinct co-purchase edge set (u < v), fingerprint-cached —
    * shared by triangle counting and [[kcore]]. */
  private[graft] def copurchaseEdges(s: SparkSession, dir: String,
                                     version: Option[(Long, Long)] = None): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    // fingerprint the MEMOIZED load frame directly (same value as over
    // the renamed projection) so the reference-keyed fp memo can hit
    val fp = version.map(TruthCache.versionKey(dir, _)).getOrElse(
      IvfModel.fingerprintOf(Tables.load(s, dir, "lineitem"),
        xxhash64(col("l_orderkey"), col("l_partkey"))))
    TruthCache.cached(s, TruthCache.vtag("tri_pairs", version), fp,
      li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v")).distinct())
  }

  private[graft] def triangleDataflow(s: SparkSession, dir: String,
                                      version: Option[(Long, Long)] = None)
      : (DataFrame, DataFrame) = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    val fp = version.map(TruthCache.versionKey(dir, _)).getOrElse(
      IvfModel.fingerprintOf(Tables.load(s, dir, "lineitem"),
        xxhash64(col("l_orderkey"), col("l_partkey"))))
    val pairs = copurchaseEdges(s, dir, version)
    // orient: (s → t) with (d_s, s) < (d_t, t)
    val oriented = TruthCache.cached(s,
      TruthCache.vtag("tri_oriented", version), fp, {
      val deg = pairs.select(explode(array(col("u"), col("v"))).as("n"))
        .groupBy("n").agg(count(lit(1)).as("d"))
      pairs
        .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
            struct(col("u").as("s"), col("v").as("t")))
            .otherwise(struct(col("v").as("s"), col("u").as("t")))
            .as("e"))
        .select(col("e.s").as("s"), col("e.t").as("t"))
    })
    // count via ADJACENCY INTERSECTION, not wedge enumeration: per
    // oriented edge (s, t), triangles closing over it are exactly
    // |N⁺(s) ∩ N⁺(t)| (each triangle counted once — its two lower
    // corners orient into the apex). Materializing the wedge stream
    // instead (the r8 shape) shuffled ~50M wedge rows through the
    // closure join and cost 17 s warm at sf0.1; the intersection form
    // does the same O(Σ_edges d) work but map-side, with NO wedge
    // exchange. Out-adjacency lists are O(√m)-bounded per node by the
    // degree orientation, so collect_list can never hub-blow, and the
    // node-keyed adjacency table (one row per node) broadcasts at this
    // scale — at 100 TB the same two joins shuffle on the node id,
    // still wedge-free.
    import org.apache.spark.sql.graftshim.Shim
    val adj = oriented.groupBy(col("s"))
      .agg(sort_array(collect_list(col("t"))).as("nb"))
    val perEdge = oriented
      .join(adj.select(col("s"), col("nb").as("nb_s")), Seq("s"))
      .join(adj.select(col("s").as("t"), col("nb").as("nb_t")), Seq("t"))
      .select(Shim.column(IntersectCountSortedLong(
        Shim.expression(col("nb_s")), Shim.expression(col("nb_t")))).as("k"))
    val triCount = perEdge
      .agg(coalesce(sum(col("k")), lit(0L)).cast("bigint").as("n_triangles"))
    (pairs, triCount)
  }

  /** Peel threshold and fixed round count for [[kcore]]. */
  val KCoreK = 80
  val KCoreRounds = 8

  /** k-CORE decomposition (`graph_kcore`) — the fourth graph workload
    * next to PageRank, connected components, and triangles, and a
    * different ITERATION SHAPE: monotone peeling (each round drops
    * every node whose degree among survivors is < k) instead of
    * value propagation. The dense-core extractor a curation pipeline
    * uses to find tightly co-occurring item/document clusters.
    *
    * Determinism: peeling is a pure set computation — no floats
    * anywhere — and it is MONOTONE (survivor sets only shrink, and
    * once the fixpoint is reached further rounds are no-ops), so a
    * FIXED round count [[KCoreRounds]] replayed identically by the
    * unrolled DuckDB oracle gives identical sets whenever the peel
    * converges within the budget; the `converged` output column
    * (round-R survivors all have degree ≥ k) is TRUE in the oracle, so
    * a fixture needing more rounds fails LOUDLY as a hash mismatch
    * instead of silently gating a partial peel. The loop EARLY-EXITS
    * when a round's survivor count equals the previous one (survivor
    * sets only shrink, so equal count ⇒ equal set ⇒ fixpoint; the
    * skipped rounds would be no-ops, so the output is bit-identical
    * to the full budget) — one scalar count per round, the Pregel
    * aggregator allowance.
    *
    * Scale shape: per round, the edge table semi-joins the (shrinking)
    * survivor set on both endpoints — broadcast-sized here, shuffled
    * semi-joins on the node id at 100 TB — and one partial-combined
    * degree aggregate; survivors checkpoint per round (node-sized). */
  def kcore(s: SparkSession, dir: String): DataFrame = kcore(s, dir, None)

  def kcore(s: SparkSession, dir: String,
            version: Option[(Long, Long)]): DataFrame = {
    // symmetric closure + node set are pure corpus functions over the
    // TruthCache'd pair table — their per-invocation localCheckpoint +
    // count are memoized like the PageRank loop inputs (symInputMemo)
    val fp = version.map(TruthCache.versionKey(dir, _)).getOrElse(
      IvfModel.fingerprintOf(Tables.load(s, dir, "lineitem"),
        xxhash64(col("l_orderkey"), col("l_partkey"))))
    val (edges, nodes, nNodes) = memoGet(kcoreInputMemo,
      (s, dir, fp), (v: (DataFrame, DataFrame, Long)) => Seq(v._1, v._2)) {
      val pairs = copurchaseEdges(s, dir, version)
      val e = pairs
        .unionAll(pairs.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint()
      val nd = e.select(col("u").as("n")).distinct().localCheckpoint()
      (e, nd, nd.count())
    }
    def degOf(alive: DataFrame): DataFrame =
      edges.join(alive.select(col("n").as("u")), Seq("u"), "left_semi")
        .join(alive.select(col("n").as("v")), Seq("v"), "left_semi")
        .groupBy("u").agg(count(lit(1)).as("d"))
    var alive = nodes
    var prev = nNodes
    var r = 0
    var fixed = false
    while (r < KCoreRounds && !fixed) {
      val prevAlive = alive
      alive = degOf(alive).filter(col("d") >= KCoreK)
        .select(col("u").as("n")).localCheckpoint()
      // release the superseded survivor set's blocks — but never the
      // memoized node table the loop started from (§5)
      if (!(prevAlive eq nodes)) dropCkpt(prevAlive)
      val c = alive.count()
      fixed = c == prev
      prev = c
      r += 1
    }
    // convergence check: one MORE round would drop nobody — anti-join
    // (not a degree filter: a survivor with zero surviving edges has no
    // degree row at all, and must still count as a violation)
    val violations = alive.join(
        degOf(alive).filter(col("d") >= KCoreK).select(col("u").as("n")),
        Seq("n"), "left_anti")
      .agg(count(lit(1)).as("viol"))
    nodes.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(alive.agg(count(lit(1)).as("core_size"),
        coalesce(sum(col("n")), lit(0L)).as("id_sum")))
      .crossJoin(violations)
      .select(col("n_nodes"), col("core_size"), col("id_sum"),
        (col("viol") === 0L).as("converged"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> ((s: SparkSession, d: String) => pagerank(s, d)),
    "graph_pagerank_dangling" ->
      ((s: SparkSession, d: String) => pagerankDangling(s, d)),
    "graph_kcore" -> ((s: SparkSession, d: String) => kcore(s, d)),
    "graph_triangles" -> ((s: SparkSession, d: String) => triangles(s, d)))

  /** 10 unrolled damped iterations in DuckDB — same rounding points,
    * same DECIMAL(18,12) contribution sums. */
  private def oracleSql: String = {
    val iters = (1 to PrIters).map { k =>
      s"""r$k AS (
        SELECT n.node,
          ROUND(0.15/(SELECT n FROM nn) + $Damping *
            CAST(COALESCE(c.s, 0) AS DOUBLE), 12) AS rank
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node,
            SUM(CAST(ROUND(r.rank / e.outdeg, 12) AS DECIMAL(18,12))) AS s
          FROM r${k - 1} r JOIN edeg e ON r.node = e.src
          GROUP BY e.dst) c
        ON n.node = c.node)"""
    }.mkString(",\n")
    s"""
      WITH pairs AS (
        SELECT DISTINCT o_custkey AS cust, 100000 + l_suppkey AS supp
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      ed AS (
        SELECT cust AS src, supp AS dst FROM pairs
        UNION ALL
        SELECT supp AS src, cust AS dst FROM pairs),
      outd AS (SELECT src, COUNT(*) AS outdeg FROM ed GROUP BY src),
      edeg AS (
        SELECT ed.src, ed.dst, outd.outdeg
        FROM ed JOIN outd ON ed.src = outd.src),
      nodes AS (SELECT DISTINCT src AS node FROM ed),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      r0 AS (SELECT node, ROUND(1.0/(SELECT n FROM nn), 12) AS rank
             FROM nodes),
      $iters
      SELECT node, ROUND(rank, 6) AS rank FROM r$PrIters ORDER BY node"""
  }

  /** The dangling variant's unrolled oracle: per round, a 1-row
    * dangling-mass CTE (exact DECIMAL sum over flagged rows of the
    * previous vector) feeds the identical damped-update expression. */
  private def oracleDanglingSql: String = {
    val iters = (1 to PrIters).map { k =>
      s"""dm$k AS (
        SELECT COALESCE(SUM(CAST(ROUND(rank, 12) AS DECIMAL(18,12))),
          CAST(0 AS DECIMAL(18,12))) AS dm
        FROM r${k - 1} WHERE dang),
      r$k AS (
        SELECT n.node, n.dang,
          ROUND(0.15/(SELECT n FROM nn) + $Damping *
            (CAST(COALESCE(c.s, 0) AS DOUBLE) +
             CAST((SELECT dm FROM dm$k) AS DOUBLE) / (SELECT n FROM nn)),
            12) AS rank
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node,
            SUM(CAST(ROUND(r.rank / e.outdeg, 12) AS DECIMAL(18,12))) AS s
          FROM r${k - 1} r JOIN edeg e ON r.node = e.src
          GROUP BY e.dst) c
        ON n.node = c.node)"""
    }.mkString(",\n")
    s"""
      WITH pairs AS MATERIALIZED (
        SELECT DISTINCT o_custkey AS src, 100000 + l_suppkey AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      outd AS (SELECT src, COUNT(*) AS outdeg FROM pairs GROUP BY src),
      edeg AS MATERIALIZED (
        SELECT p.src, p.dst, outd.outdeg
        FROM pairs p JOIN outd ON p.src = outd.src),
      nodes AS MATERIALIZED (
        SELECT node, node NOT IN (SELECT src FROM pairs) AS dang
        FROM (SELECT src AS node FROM pairs
              UNION SELECT dst AS node FROM pairs)),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      r0 AS (SELECT node, dang, ROUND(1.0/(SELECT n FROM nn), 12) AS rank
             FROM nodes),
      $iters
      SELECT node, ROUND(rank, 6) AS rank FROM r$PrIters ORDER BY node"""
  }

  /** [[KCoreRounds]] unrolled peel rounds; every survivor CTE is
    * MATERIALIZED (each is referenced three times — inlining would
    * blow up exponentially across rounds). */
  private def oracleKcoreSql: String = {
    val rounds = (1 to KCoreRounds).map { r =>
      s"""a$r AS MATERIALIZED (
        SELECT u AS n FROM (
          SELECT u, COUNT(*) AS d FROM ed
          WHERE u IN (SELECT n FROM a${r - 1})
            AND v IN (SELECT n FROM a${r - 1})
          GROUP BY u)
        WHERE d >= $KCoreK)"""
    }.mkString(",\n")
    s"""
      WITH pp AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      ed AS MATERIALIZED (
        SELECT u, v FROM pp UNION ALL SELECT v AS u, u AS v FROM pp),
      a0 AS MATERIALIZED (SELECT DISTINCT u AS n FROM ed),
      $rounds,
      kept AS MATERIALIZED (
        SELECT u FROM (
          SELECT u, COUNT(*) AS d FROM ed
          WHERE u IN (SELECT n FROM a$KCoreRounds)
            AND v IN (SELECT n FROM a$KCoreRounds)
          GROUP BY u)
        WHERE d >= $KCoreK)
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM a0) AS n_nodes,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM a$KCoreRounds) AS core_size,
        (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM a$KCoreRounds)
          AS id_sum,
        (SELECT COUNT(*) FROM a$KCoreRounds
         WHERE n NOT IN (SELECT u FROM kept)) = 0 AS converged"""
  }

  val oracle: Map[String, String] = Map(
    "graph_pagerank" -> oracleSql,
    "graph_pagerank_dangling" -> oracleDanglingSql,
    "graph_kcore" -> oracleKcoreSql,
    // orientation-independent count: the plain id-ordered 3-way join
    "graph_triangles" -> """
      WITH pp AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM pp) AS n_edges,
        (SELECT CAST(COUNT(*) AS BIGINT)
         FROM pp e1 JOIN pp e2 ON e1.v = e2.u
         JOIN pp e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles""")
}
