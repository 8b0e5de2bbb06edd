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
                        threshold: Double = 0.7): StreamingQuery =
    ingestStream(docs, indexRoot, corpus, checkpoint, threshold,
      quality = false, sample = false)

  /** The FULL curation pipeline as a stream — the streaming counterpart
    * of [[graft.ops.Curation.curate]], stage order preserved:
    *
    *  1. quality rules — a stateless predicate fused into the batch
    *     (rejects never reach the index, so they can never anchor a
    *     cluster);
    *  2. near-dup keep-only — [[batchSurvivors]] against the persisted
    *     index (exact duplicates are jaccard-1.0 near-dups, so the
    *     batch pipeline's separate exact stage is subsumed);
    *  3. stratified sample LAST — and only on the CORPUS append: the
    *     index receives every quality-passing survivor, so sampling a
    *     doc out never re-admits its future near-duplicates. This is
    *     the same "sampling never alters dedup decisions" contract the
    *     batch pipeline proves in CurationSpec.
    *
    * Crash window: the corpus commit lands before the index commit; if
    * the job dies between them, the replayed batch's corpus append is a
    * keyed no-op and the index append completes — the two stores
    * reconverge (CorpusStreamSpec proves keyed replay idempotence). */
  def curatedIngestStream(docs: DataFrame, indexRoot: String,
                          corpus: ManifestStore, checkpoint: String,
                          threshold: Double = 0.7): StreamingQuery =
    ingestStream(docs, indexRoot, corpus, checkpoint, threshold,
      quality = true, sample = true)

  private def ingestStream(docs: DataFrame, indexRoot: String,
                           corpus: ManifestStore, checkpoint: String,
                           threshold: Double,
                           quality: Boolean, sample: Boolean): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val filtered =
          if (quality) batch.filter(graft.ops.TextAnalysis.Quality.keepPredicate)
          else batch
        val b = filtered.persist()
        try {
          val survivors = batchSurvivors(b, indexRoot, threshold).persist()
          try {
            val toCorpus =
              if (sample) survivors
                .withColumn("_draw", expr(graft.ops.Sampling.DrawSql))
                .filter(col("_draw") < graft.ops.Sampling.rateCol)
                .drop("_draw")
              else survivors
            corpus.append(batch.sparkSession, toCorpus,
              commitKey = Some(s"corpus-batch-$batchId"))
            LshIndex.append(survivors, indexRoot,
              commitKey = Some(s"index-batch-$batchId"))
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
