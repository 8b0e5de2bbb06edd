package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ingest.ManifestStore
import graft.ops.{Components, ExactIndex, LshIndex}

/** Streaming near-dup-filtered corpus ingestion — the production shape
  * of incremental dedup (SURVEY §7.5): documents arrive as a stream,
  * each micro-batch probes the persisted [[LshIndex]] against everything
  * kept so far, near-duplicates are dropped, and the survivors extend
  * both the corpus store and the index. Cost per batch is the
  * [[LshIndex.probe]] contract — O(batch · bands) hashing plus
  * verification of the candidate set; the accumulated corpus is never
  * re-hashed.
  *
  * Survivor policy (consistent with the batch `dedup_keep_only` end
  * product): connected components over the batch's near-dup pairs —
  * in-batch and batch↔corpus — keep the component minimum. Doc ids must
  * be monotonically increasing across batches (the ingest contract), so
  * the minimum is always the FIRST-SEEN doc: a stored survivor when the
  * cluster touches the corpus, else the earliest doc of the batch.
  * Already-kept docs are never retracted — a late "bridge" doc that
  * links two previously-independent clusters is itself dropped, but
  * both earlier survivors stand (streaming cannot undo an append; the
  * batch pipeline's global components remain the stronger offline
  * compaction).
  *
  * Exactly-once: both appends carry a batch-id commit key, so a
  * replayed micro-batch (offset WAL ahead of the commit log on
  * restart) re-commits nothing — same mechanism as
  * [[ChainStream.ingestStreamAtomic]].
  */
object CorpusStream {

  /** Survivors of one batch against the index at `indexRoot`: the batch
    * rows whose doc_id is its near-dup component's minimum (all rows in
    * no pair survive trivially). Pure batch logic, reusable outside
    * streaming. */
  def batchSurvivors(batch: DataFrame, indexRoot: String,
                     threshold: Double): DataFrame = {
    val pairs = LshIndex.probe(batch, indexRoot, threshold).select("i", "j")
    val labels = Components.connectedComponents(pairs)
      .withColumnRenamed("node", "doc_id")
    batch.join(labels, Seq("doc_id"), "left")
      .filter(col("component").isNull || col("component") === col("doc_id"))
      .drop("component")
  }

  /** Start the dedup-ingest stream: `docs` must contain `doc_id` and
    * `text` (plus any payload columns, which flow through to the corpus
    * store untouched). */
  def dedupIngestStream(docs: DataFrame, indexRoot: String,
                        corpus: ManifestStore, checkpoint: String,
                        threshold: Double = 0.7,
                        maintainEvery: Int = 0,
                        exactFirst: Boolean = false): StreamingQuery =
    ingestStream(docs, indexRoot, corpus, checkpoint, threshold,
      quality = false, sample = false, maintainEvery = maintainEvery,
      exactFirst = exactFirst)

  /** The FULL curation pipeline as a stream — the streaming counterpart
    * of [[graft.ops.Curation.curate]], stage order preserved:
    *
    *  1. quality rules + in-batch exact dedup — the batch pipeline's
    *     fused front ([[graft.ops.Curation.frontStage]]). The md5 stage
    *     is NOT redundant with LSH: a batch carrying more identical
    *     copies than [[graft.ops.Dedup.MaxBucketOccupancy]] would make
    *     every band bucket hot, the cap would drop both the pairs and
    *     the band rows, and every future copy would be admitted forever.
    *     Exact dups ACROSS batches are jaccard-1.0 near-dups against
    *     the stored canonical (a single doc — no hot bucket) and fall
    *     to the probe;
    *  2. near-dup keep-only — [[batchSurvivors]] against the persisted
    *     index;
    *  3. stratified sample LAST — and only on the CORPUS append: the
    *     index receives every quality-passing survivor, so sampling a
    *     doc out never re-admits its future near-duplicates. This is
    *     the same "sampling never alters dedup decisions" contract the
    *     batch pipeline proves in CurationSpec.
    *
    * Input contract: `doc_id`, `text` AND `lang` (the sampling stratum;
    * checked eagerly) plus payload columns, which flow through.
    *
    * Crash windows: the corpus commit lands before the index commit,
    * and [[LshIndex.probe]] ignores stored rows carrying the probing
    * batch's own doc_ids — so a replay after a crash ANYWHERE in the
    * batch (including mid-append, with the batch's shingles already
    * committed) recomputes the identical survivor set and the keyed
    * sub-appends reconverge both stores. */
  def curatedIngestStream(docs: DataFrame, indexRoot: String,
                          corpus: ManifestStore, checkpoint: String,
                          threshold: Double = 0.7,
                          maintainEvery: Int = 0,
                          exactFirst: Boolean = false): StreamingQuery = {
    require(docs.columns.contains("lang"),
      "curatedIngestStream samples by the 'lang' stratum — the input " +
        "stream must carry a lang column")
    ingestStream(docs, indexRoot, corpus, checkpoint, threshold,
      quality = true, sample = true, maintainEvery = maintainEvery,
      exactFirst = exactFirst)
  }

  /** `maintainEvery` > 0 runs the index maintenance pass —
    * [[LshIndex.compact]] (re-apply the hot-bucket cap across appends)
    * then [[LshIndex.vacuum]] — every that-many batches, inside
    * foreachBatch where this stream is provably the only index writer
    * (compact's replaceAll exclusivity contract). Maintenance is
    * deterministic over store content, so a replayed batch re-running it
    * converges to the same index. */
  /** `exactFirst` = true inserts an [[ExactIndex]] probe BEFORE the LSH
    * stage: batch rows whose exact text already survived a previous
    * batch drop on a bloom short-circuit + md5 anti-join instead of
    * being shingled and minhashed — the cheap path for the common
    * recrawl/re-ingest batch. The exact index (under
    * `indexRoot/exact`) receives every survivor the LSH index does, so
    * the two stay aligned; its appends carry the same batch commit key
    * and its probe has the same batch-wins idempotency, so every crash
    * window replays to the same survivor set.
    *
    * Semantics note: for documents long enough to shingle, the exact
    * stage drops only rows LSH would drop anyway (identical text is
    * jaccard-1.0 with its stored canonical); for SUB-SHINGLE-LENGTH
    * documents — which produce no shingles, hence no LSH pairs — it
    * additionally drops exact re-ingests that the LSH-only pipeline
    * admits. That is a strictly-better dedup, but it means exactFirst
    * changes survivor sets for tiny documents: pick per deployment,
    * don't toggle mid-corpus. */
  /** Streaming LABEL maintenance — the live form of the batch labeling
    * (`dedup_components`): every document is ADMITTED (no drops — this
    * is the audit/retrieval-friendly mode where near-dups are labeled,
    * not discarded), and a persisted labels table stays current via
    * [[Components.mergeBatchLabels]]: the batch's probe pairs contract
    * onto existing component labels, the O(batch) remap broadcasts, and
    * the labels table never shuffles for the merge. Every pair of the
    * full corpus is emitted exactly once — by the LATER endpoint's
    * batch probing the index that already holds the earlier one — so
    * the maintained labels equal a full batch recompute at every
    * commit point (CorpusStreamSpec proves final-state equality against
    * the offline labeling).
    *
    * Exactly-once: corpus/index appends and the labels `replaceAll` all
    * carry the batch-id commit key. A crash between commits replays
    * into keyed no-ops for the committed stores and a deterministic
    * recompute for the rest (the probe's batch-wins rule makes the pair
    * set identical under partial index appends). */
  def labeledIngestStream(docs: DataFrame, indexRoot: String,
                          corpus: ManifestStore, labels: ManifestStore,
                          checkpoint: String,
                          threshold: Double = 0.7,
                          maintainEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val b = batch.persist()
        try {
          val pairs = LshIndex.probe(b, indexRoot, threshold)
            .select("i", "j").persist()
          try {
            val base = labels.read(s).map(_.select("doc_id", "component"))
              .getOrElse(b.select(col("doc_id"), col("doc_id").as("component"))
                .limit(0))
            val merged = Components
              .mergeBatchLabels(base, pairs, b.select("doc_id"))
              .select("doc_id", "component")
              .localCheckpoint() // sever from the pre-commit snapshot read
            corpus.append(s, b, commitKey = Some(s"corpus-batch-$batchId"))
            LshIndex.append(b, indexRoot,
              commitKey = Some(s"index-batch-$batchId"))
            labels.replaceAll(s, merged,
              commitKey = Some(s"labels-batch-$batchId"))
            // admit-everything mode MUST maintain: every near-dup lands
            // in the index, so cross-batch hot buckets accumulate faster
            // than in the dropping modes — compact re-applies the
            // occupancy cap, vacuum reclaims replaced snapshots
            if (maintainEvery > 0 && batchId > 0 && batchId % maintainEvery == 0) {
              LshIndex.compact(s, indexRoot)
              LshIndex.vacuum(s, indexRoot)
            }
          } finally { pairs.unpersist(); () }
        } finally {
          b.unpersist()
          s.catalog.clearCache()
        }
      }
      .start()

  private def ingestStream(docs: DataFrame, indexRoot: String,
                           corpus: ManifestStore, checkpoint: String,
                           threshold: Double,
                           quality: Boolean, sample: Boolean,
                           maintainEvery: Int,
                           exactFirst: Boolean = false): StreamingQuery = {
    val exactRoot = s"$indexRoot/exact"
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val filtered =
          if (quality) graft.ops.Curation.frontStage(batch)
          else batch
        val afterExact =
          if (exactFirst)
            filtered.join(
              ExactIndex.probeNew(filtered, exactRoot).select("doc_id"),
              Seq("doc_id"), "left_semi")
          else filtered
        val b = afterExact.persist()
        try {
          val survivors = batchSurvivors(b, indexRoot, threshold).persist()
          try {
            val toCorpus =
              if (sample) {
                // collision-free helper name: payload columns flow
                // through untouched, so a payload named "_draw" must
                // survive
                val dc = Iterator.iterate("_draw")("_" + _)
                  .dropWhile(survivors.columns.contains).next()
                survivors
                  .withColumn(dc, expr(graft.ops.Sampling.DrawSql))
                  .filter(col(dc) < graft.ops.Sampling.rateCol)
                  .drop(dc)
              } else survivors
            corpus.append(batch.sparkSession, toCorpus,
              commitKey = Some(s"corpus-batch-$batchId"))
            LshIndex.append(survivors, indexRoot,
              commitKey = Some(s"index-batch-$batchId"))
            if (exactFirst)
              ExactIndex.append(survivors, exactRoot,
                commitKey = Some(s"exact-batch-$batchId"))
            if (maintainEvery > 0 && batchId > 0 && batchId % maintainEvery == 0) {
              LshIndex.compact(batch.sparkSession, indexRoot)
              LshIndex.vacuum(batch.sparkSession, indexRoot)
              if (exactFirst) {
                ExactIndex.consolidateBlooms(batch.sparkSession, exactRoot)
                ExactIndex.vacuum(batch.sparkSession, exactRoot)
              }
            }
          } finally { survivors.unpersist(); () }
        } finally {
          b.unpersist()
          // the probe pins shingle/candidate intermediates; a dedicated
          // ingest job owns its session, so clearing the cache between
          // micro-batches bounds executor storage memory over an
          // unbounded stream
          batch.sparkSession.catalog.clearCache()
        }
      }
      .start()
  }
}
