package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ingest.ManifestStore
import graft.ops.{Components, LshIndex}

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
                        maintainEvery: Int = 0): StreamingQuery =
    ingestStream(docs, indexRoot, corpus, checkpoint, threshold,
      quality = false, sample = false, maintainEvery = maintainEvery)

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
                          maintainEvery: Int = 0): StreamingQuery = {
    require(docs.columns.contains("lang"),
      "curatedIngestStream samples by the 'lang' stratum — the input " +
        "stream must carry a lang column")
    ingestStream(docs, indexRoot, corpus, checkpoint, threshold,
      quality = true, sample = true, maintainEvery = maintainEvery)
  }

  /** `maintainEvery` > 0 runs the index maintenance pass —
    * [[LshIndex.compact]] (re-apply the hot-bucket cap across appends)
    * then [[LshIndex.vacuum]] — every that-many batches, inside
    * foreachBatch where this stream is provably the only index writer
    * (compact's replaceAll exclusivity contract). Maintenance is
    * deterministic over store content, so a replayed batch re-running it
    * converges to the same index. */
  private def ingestStream(docs: DataFrame, indexRoot: String,
                           corpus: ManifestStore, checkpoint: String,
                           threshold: Double,
                           quality: Boolean, sample: Boolean,
                           maintainEvery: Int): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val filtered =
          if (quality) graft.ops.Curation.frontStage(batch)
          else batch
        val b = filtered.persist()
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
            if (maintainEvery > 0 && batchId > 0 && batchId % maintainEvery == 0) {
              LshIndex.compact(batch.sparkSession, indexRoot)
              LshIndex.vacuum(batch.sparkSession, indexRoot)
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
