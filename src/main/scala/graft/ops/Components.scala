package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Connected components over near-duplicate pair edges — the step that
  * turns pairwise dedup output into dedup GROUPS with one canonical
  * survivor per group (reference behavior: dedup keeps the first row per
  * key, eth-contract.py's per-tx dedup; here generalized to transitive
  * near-dup clusters for the LLM-pipeline path, SURVEY §7.5).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SOCC'14) — the
  * standard O(log n)-round, all-shuffle-local formulation:
  *
  *  - large-star: every node points its LARGER neighbors at the minimum
  *    of its neighborhood (including itself);
  *  - small-star: every node points its smaller-or-equal neighbors (in
  *    the max→min directed view) at that minimum.
  *
  * Both rounds are a `groupBy(node)` aggregation plus a re-emit — the
  * shuffle key is the node id, never an all-pairs product, and each
  * round's output is at most the input edge count, so a 100 TB edge set
  * converges in ~log(n) bounded shuffles. Compare label propagation,
  * whose round count is the graph DIAMETER — unbounded on chain-shaped
  * dup graphs. Convergence is detected by an edge-set checksum
  * (count + order-independent hash sum), one tiny aggregate per round.
  */
object Components {

  /** One large-star round: every node points its LARGER neighbors at the
    * minimum of its neighborhood (incl. itself). One groupBy + one join
    * on the node id — the shuffle key is never a pair. */
  private[graft] def largeStar(in: DataFrame): DataFrame = {
    val m = in.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
    in.join(m, "u").filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v")).distinct()
  }

  /** One small-star round: edges directed max→min; all of a node's
    * (smaller) neighbors and the node itself link to the neighborhood
    * minimum. Same shuffle shape as large-star. */
  private[graft] def smallStar(in: DataFrame): DataFrame = {
    val d = in.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v")).distinct()
    val m = d.groupBy("u").agg(min(col("v")).as("m"))
    d.join(m, "u")
      .select(explode(array(
        struct(col("v").as("u"), col("m").as("v")),
        struct(col("u"), col("m").as("v")))).as("e"))
      .select(col("e.u"), col("e.v"))
      .filter(col("u") =!= col("v")).distinct()
  }

  /** (node, component) for every node appearing in `edges` (columns i, j);
    * component = the smallest node id reachable from the node. */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    // undirected view, self-loops dropped. Each round is localCheckpointed:
    // iterated self-referential plans otherwise grow exponentially (every
    // round embeds the previous round's full plan twice) — lineage
    // truncation per round is the standard Spark iterative-graph pattern
    // (a production run on unreliable executors would use reliable
    // checkpoint() to a DFS dir instead).
    var e = edges.select(col("i").cast("long").as("u"), col("j").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    e = e.union(e.select(col("v").as("u"), col("u").as("v"))).distinct()
      .localCheckpoint(true)

    def checksum(d: DataFrame): (Long, String) = {
      // decimal sum: xxhash64 spans the full long range and an ANSI-mode
      // long sum overflows
      val r = d.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toString)
    }

    var sig = checksum(e)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(e))
        // symmetrize back so large-star sees full neighborhoods next round
        .select(explode(array(struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("e"))
        .select(col("e.u"), col("e.v")).distinct()
        .localCheckpoint(true)
      val nextSig = checksum(next)
      e.unpersist()
      e = next
      converged = nextSig == sig
      sig = nextSig
      rounds += 1
    }
    // never emit labels from a non-fixed-point edge set: nodes of one
    // cluster could silently land in different components
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxRounds rounds " +
        s"(${sig._1} edges at last round) — raise maxRounds")
    // fixed point: every edge links a node to its component minimum —
    // min(v) per u is the component; the minima themselves are their own
    val comp = e.groupBy("u").agg(min(col("v")).as("c"))
      .select(col("u").as("node"),
        least(col("c"), col("u")).as("component"))
    comp
  }

  /** Unsorted (doc_id, component, keep) labels over `docs` — component
    * = min doc_id of the transitive cluster over jaccard ≥ 0.7 pairs;
    * docs in no pair are their own singleton. Shared by both queries,
    * which add only their own presentation sort.
    *
    * Edges come from the MinHash-LSH path, NOT the brute shingle
    * self-join: at 100 TB a common shingle is a hot join key and the
    * exact self-join's Σ occ(shingle)² cost blows up one stage before
    * the (scale-safe) star rounds ever run. LSH shares the brute
    * oracle on the fixture's clean similarity separation, so both
    * component queries stay green against the same recursive-CTE
    * oracle. */
  private[ops] def componentLabels(docs: DataFrame): DataFrame = {
    val pairs = Dedup.minhashLsh(docs, 0.7).select("i", "j")
    val comp = connectedComponents(pairs)
    docs.select(col("doc_id"))
      .join(comp, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("keep", col("doc_id") === col("component"))
  }

  /** [[componentLabels]] computed ONCE per corpus fingerprint and
    * persisted ([[TruthCache]]): five downstream products — the label
    * table, keep-only, keep-best, the audit trail, and the cluster
    * histogram — consume ONE labeling pass, the way a production
    * curation run ships a labels table instead of re-running LSH +
    * components per report. The cache key carries the code build stamp
    * and the corpus fingerprint, so a changed corpus or changed
    * labeling code recomputes; the labeling plan itself stays asserted
    * in PLANS.md (§dedup_components star rounds, §LSH edge path). The
    * fingerprint costs one narrow scan-side aggregate; a deployment
    * with a versioned corpus store would key on the snapshot version
    * instead and touch the corpus zero extra times (the
    * [[IvfModel.trainedOrLoad]] `version` pattern). */
  private[ops] def labelsFor(s: SparkSession, dir: String,
                             version: Option[(Long, Long)] = None): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    TruthCache.cached(s, TruthCache.vtag("component_labels", version),
      version.map(TruthCache.versionKey(dir, _))
        .getOrElse(Dedup.docsFingerprint(docs)),
      componentLabels(docs))
  }

  /** Version-keyed labels entry (the [[graft.ops.IvfModel.trainedOrLoad]]
    * `version` contract): a caller whose corpus lives in a versioned
    * store passes its snapshot version — cache validation is then a
    * manifest read, zero corpus scans on the warm path. */
  def labelsVersioned(s: SparkSession, dir: String,
                      version: (Long, Long)): DataFrame =
    labelsFor(s, dir, Some(version))

  /** Dedup groups over the documents table: every doc labeled with its
    * near-dup component and a keep flag for the canonical survivor. */
  def dedupComponents(s: SparkSession, dir: String): DataFrame =
    labelsFor(s, dir).orderBy(col("doc_id"))

  /** INCREMENTAL component maintenance — fold a new batch's near-dup
    * edges into an existing labels table without relabeling the corpus
    * from scratch (the missing piece between [[Dedup.dedupIncremental]]'s
    * per-batch pair detection and the batch-recompute labeling).
    *
    * Star contraction on the CONTRACTED graph: each new edge's old
    * endpoint is replaced by its current component label (every old
    * cluster collapses to one node — its label, which is already the
    * cluster's min doc_id), so the component rounds run over only the
    * labels the batch TOUCHES plus the batch itself — O(batch) nodes,
    * independent of corpus size. Because old labels are cluster minima,
    * the contracted minimum IS the merged cluster's global min doc_id:
    * labels stay canonical, and a batch doc bridging two old clusters
    * merges them correctly (the transitive case OpsSpec plants).
    *
    * Scale shape: the touched-label mapping is O(batch) rows and
    * BROADCAST to relabel the base table — the base labels never
    * shuffle; new edges join the labels table on the endpoint id
    * (the probe output already carries partition-prunable doc ids).
    * At 100 TB the batch relabel is one broadcast map-side pass over
    * the labels store, the way streaming dedup must work. */
  def mergeBatchLabels(baseLabels: DataFrame, newEdges: DataFrame,
                       batchIds: DataFrame): DataFrame = {
    // prune the labels table to the O(batch) edge endpoints FIRST, via a
    // broadcast semi-join — the corpus-sized labels side is then touched
    // only map-side, and the contraction lookups below broadcast the
    // pruned (tiny) label slice. Without this, the left joins would put
    // the full labels table on the build side of an outer join — a
    // corpus-wide shuffle per batch for an O(batch) lookup.
    val endIds = newEdges.select(col("i").as("n"))
      .unionByName(newEdges.select(col("j").as("n"))).distinct()
    val lab = baseLabels.select(col("doc_id").as("n"), col("component").as("l"))
      .join(broadcast(endIds), Seq("n"), "left_semi")
    val contracted = newEdges.select(col("i").as("a"), col("j").as("b"))
      .join(broadcast(lab.select(col("n").as("a"), col("l").as("la"))),
        Seq("a"), "left")
      .join(broadcast(lab.select(col("n").as("b"), col("l").as("lb"))),
        Seq("b"), "left")
      .select(coalesce(col("la"), col("a")).as("i"),
        coalesce(col("lb"), col("b")).as("j"))
      .filter(col("i") =!= col("j"))
    // star rounds over the contracted graph: O(batch) nodes, so the
    // mapping below is broadcast-sized BY CONSTRUCTION
    val remap = connectedComponents(contracted)
    val oldRelabel = broadcast(remap
      .select(col("node").as("component"), col("component").as("newc")))
    val updatedOld = baseLabels
      .join(oldRelabel, Seq("component"), "left")
      .select(col("doc_id"),
        coalesce(col("newc"), col("component")).as("component"))
    val newLab = batchIds.select(col("doc_id"))
      .join(broadcast(remap), col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    updatedOld.unionByName(newLab)
      .withColumn("keep", col("doc_id") === col("component"))
  }

  /** Gate: the incremental path end-to-end over the gate's base/batch
    * split (even ids = stored corpus, odd ids = new batch — the same
    * split the frozen LSH index gates use): base labels computed once
    * over the even half, the batch's edges from the frozen-index PROBE
    * ([[Dedup.probedPairsFor]] — only batch docs are hashed), then
    * [[mergeBatchLabels]]. The oracle is the FULL-corpus transitive
    * closure — the incremental result must be indistinguishable from a
    * batch recompute. */
  def dedupComponentsIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val base = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val baseLabels = TruthCache.cached(s, "component_labels_even",
      Dedup.docsFingerprint(docs),
      componentLabels(base).select("doc_id", "component"))
    val batch = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    mergeBatchLabels(baseLabels,
        Dedup.probedPairsFor(s, dir).select("i", "j"),
        batch.select("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** The dedup pipeline's end product: the corpus with every non-
    * canonical near-duplicate dropped — one survivor (min doc_id) per
    * transitive cluster, all singletons kept. The documents table loads
    * once and the component labels stay unsorted until the final
    * presentation sort. */
  def dedupKeepOnly(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    labelsFor(s, dir).filter(col("keep"))
      .select(col("doc_id"))
      .join(docs, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_fp"))
      .orderBy(col("doc_id"))
  }

  /** Quality-keyed survivor selection — what production curation
    * actually does: per near-dup cluster keep the BEST document (here:
    * max n_chars, ties to min doc_id), not the arbitrary min-id one.
    * One `max_by` aggregate over the component labels (SortAggregate —
    * the struct buffer rules out hash agg — but still with a map-side
    * partial phase): only ONE candidate row per (component, partition)
    * crosses the shuffle, where the window formulation would shuffle
    * every corpus row to its component partition before sorting. The
    * ordering struct (n_chars, −doc_id) makes the argmax deterministic
    * because doc_id is unique. */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    labelsFor(s, dir).select("doc_id", "component")
      .join(docs.select("doc_id", "n_chars"), "doc_id")
      .groupBy("component")
      .agg(max_by(struct(col("doc_id"), col("n_chars")),
        struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("best"))
      .select(col("component"), col("best.doc_id").as("survivor"),
        col("best.n_chars").as("n_chars"))
      .orderBy("component")
  }

  /** Dedup audit trail — for every DROPPED document, its surviving
    * canonical and the exact Jaccard between the two (0.0 when the link
    * is purely transitive and the pair shares no shingle). The
    * governance artifact a curation run ships alongside the deduped
    * corpus: "what did we delete, mapped to what, how similar".
    *
    * Scale shape: only dropped docs' shingles flow into the audit join,
    * keyed (survivor, shingle) — group sizes are bounded by cluster
    * membership, never corpus-wide; the jaccard is per (doc, survivor),
    * one row per dropped doc. */
  def dedupAudit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val dropped = labelsFor(s, dir).filter(!col("keep"))
      .select(col("doc_id"), col("component"))
    // both shingle inputs are semi-join-bounded by cluster membership
    // BEFORE any wide work — the survivor side must not be the full
    // corpus shingle table, or the audit re-shuffles the whole corpus
    val members = dropped.select("doc_id")
      .unionByName(dropped.select(col("component").as("doc_id")))
      .distinct()
    val sh = Dedup.shingles(docs)
      .join(members, Seq("doc_id"), "left_semi")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = dropped.join(sh, "doc_id")
      .join(sh.select(col("doc_id").as("component"), col("sh")),
        Seq("component", "sh"))
      .groupBy("doc_id", "component").agg(count(lit(1)).as("c"))
    dropped
      .join(inter, Seq("doc_id", "component"), "left")
      .join(sizes.select(col("doc_id"), col("sz").as("sz_d")), "doc_id")
      .join(sizes.select(col("doc_id").as("component"), col("sz").as("sz_s")),
        "component")
      .select(col("doc_id"), col("component").as("survivor"),
        coalesce(round(col("c") / (col("sz_d") + col("sz_s") - col("c")), 6),
          lit(0.0)).as("jaccard"))
      .orderBy("doc_id")
  }

  /** Cluster-size histogram over the near-dup components — the
    * one-screen dedup summary ("how many pairs, triples, …; how many
    * docs does dedup delete") read before shipping a curation run.
    *
    * Scale shape: two narrow-keyed hash aggregates (component, then
    * cluster_size), both with map-side partial combine; the result has
    * one row per distinct cluster size — driver-readable at any corpus
    * scale. */
  def dedupClusterStats(s: SparkSession, dir: String): DataFrame =
    labelsFor(s, dir)
      .groupBy("component").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(
        count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"),
        sum(col("cluster_size") - 1).as("n_dropped"))
      .orderBy("cluster_size")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_components" -> (dedupComponents _),
    "dedup_components_incremental" -> (dedupComponentsIncremental _),
    "dedup_keep_only" -> (dedupKeepOnly _),
    "dedup_keep_best" -> (dedupKeepBest _),
    "dedup_audit" -> (dedupAudit _),
    "dedup_cluster_stats" -> (dedupClusterStats _))

  /** Shared oracle prefix: transitive closure over the same jaccard≥0.7
    * edges via a recursive CTE (terminates on cycles because UNION
    * deduplicates), component = min reachable node; `labels` maps EVERY
    * doc of `tbl` to its component (singletons to themselves) — the
    * single source for the five labeling oracles, so the labeling
    * definition can never silently diverge between them. Body form (no
    * leading WITH) so the curation oracle can prepend its own CTEs. */
  private[ops] def componentsCtesBody(tbl: String): String =
    s"""${Dedup.jaccardCtesBody(tbl)},
      edges AS (SELECT i, j FROM jc WHERE jaccard >= 0.7),
      sym AS (SELECT i AS u, j AS v FROM edges
              UNION SELECT j, i FROM edges),
      reach(src, node) AS (
        SELECT u, u FROM sym
        UNION
        SELECT r.src, s.v FROM reach r JOIN sym s ON r.node = s.u),
      comp AS (SELECT src AS node, MIN(node) AS component
               FROM reach GROUP BY src),
      labels AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
        FROM $tbl d LEFT JOIN comp c ON d.doc_id = c.node)"""

  private val componentsCtes: String =
    "WITH RECURSIVE " + componentsCtesBody("documents")

  val oracle: Map[String, String] = Map(
    "dedup_components" -> s"""$componentsCtes
      SELECT doc_id, component, (component = doc_id) AS keep
      FROM labels ORDER BY doc_id""",
    // the incremental path must be INDISTINGUISHABLE from a batch
    // recompute: same closure over the full corpus
    "dedup_components_incremental" -> s"""$componentsCtes
      SELECT doc_id, component, (component = doc_id) AS keep
      FROM labels ORDER BY doc_id""",
    "dedup_keep_only" -> s"""$componentsCtes
      SELECT d.doc_id, d.lang, d.source, d.n_chars, md5(d.text) AS text_fp
      FROM documents d JOIN labels l USING (doc_id)
      WHERE l.component = d.doc_id
      ORDER BY d.doc_id""",
    "dedup_keep_best" -> s"""$componentsCtes
      SELECT component, survivor, n_chars FROM (
        SELECT l.component, d.doc_id AS survivor, d.n_chars,
          ROW_NUMBER() OVER (
            PARTITION BY l.component
            ORDER BY d.n_chars DESC, d.doc_id) AS rk
        FROM documents d JOIN labels l USING (doc_id))
      WHERE rk = 1 ORDER BY component""",
    // dropped doc_id > component always (component = cluster min), so the
    // jc pair is (i=component, j=doc_id); transitive-only links with no
    // shared shingle fall out of jc and surface as jaccard 0.0
    "dedup_audit" -> s"""$componentsCtes,
      dropped AS (
        SELECT doc_id, component FROM labels WHERE doc_id <> component)
      SELECT dr.doc_id, dr.component AS survivor,
        COALESCE(jx.jaccard, 0.0) AS jaccard
      FROM dropped dr LEFT JOIN jc jx
        ON jx.i = dr.component AND jx.j = dr.doc_id
      ORDER BY dr.doc_id""",
    "dedup_cluster_stats" -> s"""$componentsCtes,
      cl AS (SELECT component, COUNT(*) AS cluster_size
             FROM labels GROUP BY 1)
      SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
        CAST(COUNT(*) AS BIGINT) AS n_clusters,
        CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
        CAST(SUM(cluster_size - 1) AS BIGINT) AS n_dropped
      FROM cl GROUP BY 1 ORDER BY 1""")
}
