package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.ManifestStore

/** Persisted MinHash-LSH index over a frozen corpus, the at-scale
  * incremental-dedup pattern (SURVEY §7.5): the corpus is shingled,
  * minhashed and banded ONCE, at ingest time; each new batch then hashes
  * only its own documents and probes the stored band index. Cost per
  * batch is O(new · bands) probe + verification of the (tiny) candidate
  * set — never a re-hash or self-join of the 100 TB corpus.
  *
  * Storage layout (three [[ManifestStore]] tables under `root`, so the
  * index inherits atomic commits, snapshot isolation and time travel):
  *
  *  - `bands`    (band, bandkey, doc_id) — the probe target, laid out
  *                in [[BandShards]] `bk_shard` partitions (bandkey hash)
  *                so a probe's scan partition-prunes to the shards its
  *                batch actually touches;
  *  - `shingles` (doc_id, sh)            — read ONLY for candidate docs
  *                                         during exact-Jaccard
  *                                         verification; files carry
  *                                         doc_id min/max stats, so the
  *                                         read data-skips to the
  *                                         candidates' id range;
  *  - `sizes`    (doc_id, sz)            — per-doc shingle counts (same
  *                                         stats), so verification never
  *                                         recounts the corpus.
  *
  * Stored shingles are xxhash64 fingerprints (fixed 8 bytes), not the
  * raw n-gram strings: set intersection/size — all verification needs —
  * is preserved under hashing (collision odds within a doc's few
  * hundred shingles are ~10⁻¹⁵), and the index is a fraction of the
  * corpus text instead of a second copy of it. Probes hash their batch
  * with the same function, so index and probe agree.
  *
  * Degenerate band keys (occupancy > [[Dedup.MaxBucketOccupancy]]) are
  * dropped at BUILD time, mirroring [[Dedup.lshCandidates]]'s hot-bucket
  * policy: a key collecting ≫ the expected handful of docs carries no
  * signal, and probing it would expand O(occupancy) candidate pairs for
  * every new doc that lands there. The per-append cap cannot see a key
  * that only grows hot ACROSS appends — [[compact]] re-applies it over
  * the whole store on the usual maintenance cadence.
  *
  * Contract: doc_ids are unique across the index and every probed batch
  * (the ingest pipeline's append invariant). [[append]] extends the
  * index with a batch AFTER probing it, keeping the index current.
  */
object LshIndex {

  /** Bands-table partition count: bandkey-hash shards, sized so one
    * shard is a few files at warehouse scale but a small probe batch
    * still touches a strict subset. */
  val BandShards = 32

  /** Test hook: (files read, files total) of the last probe's stored-
    * shingle read — the mechanical witness that the doc_id-stat
    * data-skipping actually prunes the physical read. */
  private[graft] val lastShingleRead =
    new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((0, 0))

  private def bandsStore(root: String) = new ManifestStore(s"$root/bands")
  private def shinglesStore(root: String) = new ManifestStore(s"$root/shingles")
  private def sizesStore(root: String) = new ManifestStore(s"$root/sizes")

  private def withShard(bands: DataFrame): DataFrame =
    bands.withColumn("bk_shard", pmod(col("bandkey"), lit(BandShards)))

  /** Banded signatures over a (persisted) shingle table with
    * over-occupied band keys dropped. */
  private def keptBands(sh: DataFrame,
                        maxBucket: Int = Dedup.MaxBucketOccupancy): DataFrame = {
    val banded = Dedup.bandedSignatures(Dedup.minhash(sh))
    val hot = banded.groupBy("band", "bandkey")
      .agg(count(lit(1)).as("occ")).filter(col("occ") > maxBucket)
      .select("band", "bandkey")
    banded.join(hot, Seq("band", "bandkey"), "left_anti")
  }

  /** Raw shingles → stored form: xxhash64 fingerprint per n-gram. */
  private def hashed(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), xxhash64(col("sh")).as("sh"))

  /** Build (or extend) the index from a corpus batch: one shingle pass,
    * three atomic appends. Safe to call repeatedly — each call appends
    * the new batch's rows only. The hot-bucket cap applies per batch;
    * [[compact]] re-applies it across appends.
    *
    * Commit order matters for crash consistency: `bands` lands LAST.
    * Band rows are what make a doc discoverable — if a crash strands
    * the build mid-way, a bands-less doc is simply not probed yet
    * (correct: the batch isn't in the index), whereas bands WITHOUT
    * shingles would let candidates form and then fail verification
    * silently. A `commitKey` makes the whole build exactly-once under
    * replay: each store skips its own already-committed part. */
  def append(docs: DataFrame, root: String,
             commitKey: Option[String] = None): Unit =
      BuildLog.timed("lsh_append:" + new java.io.File(root).getName) {
    val spark = docs.sparkSession
    val sh = hashed(Dedup.shingles(docs)).persist()
    try {
      shinglesStore(root).append(spark, sh, commitKey = commitKey,
        rangeCol = Some("doc_id"))
      sizesStore(root).append(spark,
        sh.groupBy("doc_id").agg(count(lit(1)).as("sz")),
        commitKey = commitKey, rangeCol = Some("doc_id"))
      bandsStore(root).append(spark, withShard(keptBands(sh)),
        partitionCols = Seq("bk_shard"), commitKey = commitKey)
    } finally { sh.unpersist(); () }
  }

  /** Re-apply the hot-bucket occupancy cap across ALL appends: a band
    * key that stayed under the cap in every batch but is degenerate over
    * the union is dropped here, in one atomic [[ManifestStore.replaceAll]]
    * commit. Run on the same maintenance cadence as store compaction;
    * the caller holds writer exclusivity (replaceAll's contract).
    * Shingles/sizes are untouched — they are per-doc, and verification
    * keeps working for every surviving candidate. */
  def compact(spark: SparkSession, root: String,
              maxBucket: Int = Dedup.MaxBucketOccupancy): Unit =
    bandsStore(root).read(spark).foreach { bands =>
      val hot = bands.groupBy("band", "bandkey")
        .agg(count(lit(1)).as("occ")).filter(col("occ") > maxBucket)
        .select("band", "bandkey")
      val kept0 = bands.join(hot, Seq("band", "bandkey"), "left_anti")
      // upgrade path: recompute the shard UNCONDITIONALLY — a mixed
      // store (pre-shard commits + sharded appends) reads old rows with
      // bk_shard = NULL, and preserving those would write them into the
      // Hive default partition where every probe's shard filter misses
      // them forever
      val kept = withShard(kept0.drop("bk_shard"))
      bandsStore(root).replaceAll(spark, kept,
        partitionCols = Seq("bk_shard"))
    }

  /** Reclaim data files no retained snapshot references (old copies left
    * by [[compact]]'s replace commits, crashed appends' unpublished
    * dirs) across all three stores — the retention contract is
    * [[ManifestStore.vacuum]]'s. */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2,
             minDataAgeMs: Long = ManifestStore.DefaultVacuumMinAgeMs): Unit = {
    bandsStore(root).vacuum(spark, keepVersions, minDataAgeMs)
    shinglesStore(root).vacuum(spark, keepVersions, minDataAgeMs)
    sizesStore(root).vacuum(spark, keepVersions, minDataAgeMs)
  }

  /** Near-dup pairs (i, j, jaccard ≥ threshold) touching at least one
    * doc of `newDocs`, by probing the stored band index: only the new
    * batch is shingled/minhashed here — the corpus side comes entirely
    * from the persisted tables, read PRUNED (bands partition-prune to
    * the batch's bk_shards; shingles/sizes data-skip on doc_id file
    * stats to the candidate id range, then narrow by semi-join). New↔new
    * pairs are found by the same in-batch banding, so a batch's internal
    * dups emit too. An empty or absent index degrades to in-batch LSH
    * dedup. */
  def probe(newDocs: DataFrame, root: String, threshold: Double,
            hashCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    // localCheckpoint, not persist: each is consumed by several jobs
    // inside this probe AND by the returned (lazy) result, and a
    // persist would pin a CacheManager entry per probe call — a
    // per-micro-batch leak in a streaming ingest loop. Checkpointed
    // blocks are released by the ContextCleaner once the result goes
    // unreachable (the embDedupKeepOnly pattern).
    val shNew = hashed(Dedup.shingles(newDocs, counter = hashCounter))
      .localCheckpoint()
    val sigNew = Dedup.minhash(shNew)
    val bandsNew = Dedup.bandedSignatures(sigNew).localCheckpoint()

    // batch-wins exclusion: any stored rows for the PROBING batch's own
    // doc_ids are dropped before use. A crashed append can strand the
    // batch's shingles in the store (shingles commit first); without
    // this, a replayed probe unions those rows with shNew, every
    // intersection double-counts, jaccard inflates 2-4×, and the replay
    // commits a DIFFERENT survivor set than the original run — corpus
    // and index diverge permanently. With it, the probe is idempotent
    // under partial appends and keyed replays reconverge.
    val newIds = newDocs.select("doc_id")

    // partition-prune the bands read to the shards the batch's own band
    // keys hash into (a small batch touches a strict subset of the
    // BandShards layout). Rows with bk_shard NULL are pre-shard commits
    // surfacing through the union's allowMissingColumns null-fill — a
    // MIXED store (old appends + new) must keep them readable, or every
    // old doc silently stops probing; the isNull disjunct keeps them
    // while sharded commits still partition-prune on the IN list.
    // Compaction re-shards them for good ([[compact]]).
    val batchShards = bandsNew
      .select(pmod(col("bandkey"), lit(BandShards)).as("s"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val storedBandsAll = bandsStore(root).read(spark).getOrElse(
      Seq.empty[(Int, Int, Long)].toDF("band", "bandkey", "doc_id"))
    val storedBands =
      (if (storedBandsAll.columns.contains("bk_shard"))
        storedBandsAll.filter(col("bk_shard").isin(batchShards: _*) ||
            col("bk_shard").isNull)
          .drop("bk_shard")
      else storedBandsAll)
        .join(newIds, Seq("doc_id"), "left_anti")

    // new↔corpus candidates: band-key equality against the stored index
    val candOld = bandsNew.select(col("band"), col("bandkey"), col("doc_id").as("p"))
      .join(storedBands, Seq("band", "bandkey"))
      .select(least(col("p"), col("doc_id")).as("i"),
        greatest(col("p"), col("doc_id")).as("j"))
      .filter(col("i") =!= col("j"))
    // new↔new candidates: the batch's own capped-bucket LSH
    val candNew = Dedup.lshCandidates(sigNew)
    val cand = candOld.unionByName(candNew).distinct()
      .localCheckpoint() // consumed by three verification joins + the id bounds

    // refuse an index persisted in the pre-hash format (sh: string):
    // probing it would union string shingles with the batch's long
    // fingerprints, every cross candidate would fail verification, and
    // the recall loss would be SILENT — an error beats wrong pairs
    val shStore = shinglesStore(root)
    val storedShSnap = shStore.read(spark)
    storedShSnap.foreach { df =>
      require(df.schema("sh").dataType ==
        org.apache.spark.sql.types.LongType,
        s"LSH index at $root stores raw-string shingles (pre-fingerprint " +
          "format) — rebuild the index; probing it would silently drop " +
          "all corpus candidates")
    }

    // data-skip the shingle/size reads to the candidates' id range: per-
    // file doc_id min/max stats prune everything outside [lo, hi] before
    // the semi-join narrows to the exact candidate set. The bounds agg is
    // over the candidate set — O(candidates), not the corpus.
    val bounds = cand.agg(min(col("i")), max(col("j"))).head()
    val empty2 = Seq.empty[(Long, Long)].toDF("doc_id", "sh")
    def rangedRead(store: ManifestStore, emptyDf: DataFrame): DataFrame =
      if (bounds.isNullAt(0)) emptyDf
      else if (store.currentRangeCol(spark).contains("doc_id"))
        store.readRange(spark, bounds.getLong(0), bounds.getLong(1))
          .getOrElse(emptyDf)
      else store.read(spark).getOrElse(emptyDf) // pre-stats index
    val storedShRanged = rangedRead(shStore, empty2)
    lastShingleRead.set(
      (storedShRanged.inputFiles.length, shStore.currentFiles(spark).length))
    val storedSh = storedShRanged
      .join(newIds, Seq("doc_id"), "left_anti")
    val storedSizes = rangedRead(sizesStore(root),
      Seq.empty[(Long, Long)].toDF("doc_id", "sz"))
      .join(newIds, Seq("doc_id"), "left_anti")

    val candIds = cand.select(col("i").as("doc_id"))
      .unionByName(cand.select(col("j").as("doc_id"))).distinct()
    val sh = shNew.unionByName(
      storedSh.join(candIds, Seq("doc_id"), "left_semi"))
    val sizes = shNew.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      .unionByName(storedSizes.join(candIds, Seq("doc_id"), "left_semi"))
    Dedup.verifyPairs(sh, cand, threshold, Some(sizes))
  }
}
