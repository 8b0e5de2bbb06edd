package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.IvfIndex

/** Streaming vector ingestion into an appendable [[IvfIndex]] — the
  * embedding analogue of [[CorpusStream]]: vectors arrive as a stream
  * (new documents' embeddings, in a training-data pipeline), each
  * micro-batch is assigned against the FROZEN coarse quantizer —
  * O(batch) work, the accumulated corpus is never re-assigned — and
  * lands as one keyed atomic commit, so searches running concurrently
  * see whole snapshots and a replayed batch (offset WAL ahead of the
  * commit log on restart) re-commits nothing.
  *
  * The index must be seeded ([[IvfIndex.build]]) before the stream
  * starts: the quantizer trains on the seed corpus and every streamed
  * batch inherits it (the FAISS train-then-add contract; see the
  * frozen-quantizer note on [[IvfIndex]]).
  *
  * Input contract: `vec_id`, `e` (double vector), `nrm` — the
  * [[graft.ops.Similarity.rawVecs]] shape — with ids new to the index
  * (the ingest append invariant). */
object VectorStream {

  /** `maintainEvery` > 0 vacuums unreferenced files every that-many
    * batches (this stream is the only writer inside foreachBatch). */
  def ingestStream(vecs: DataFrame, root: String, checkpoint: String,
                   maintainEvery: Int = 0): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        IvfIndex.append(batch, root, commitKey = Some(s"vec-batch-$batchId"))
        if (maintainEvery > 0 && batchId > 0 && batchId % maintainEvery == 0)
          IvfIndex.vacuum(batch.sparkSession, root)
      }
      .start()
}
