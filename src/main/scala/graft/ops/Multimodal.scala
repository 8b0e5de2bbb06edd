package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for LLM data pipelines (SURVEY §7.5): media as
  * opaque `binary` payloads with typed metadata, processed in batch-shaped
  * partition passes.
  *
  * The actual byte→pixels/samples decode is STUBBED (`decodeStub`): the
  * container has no image/audio codecs, so the stub derives deterministic
  * pseudo-content from the payload bytes. Everything around it — schema,
  * partitioning, batch iteration shape, feature vector contract — is the
  * real engine plumbing a production codec would drop into (the Scala
  * analogue of a `mapInPandas` batch UDF: mapPartitions over an iterator,
  * amortizing per-batch setup).
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, sample_rate: Int,
                         duration_ms: Int)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 features: Array[Float], feature_norm: Double)

  /** Deterministic synthetic media table (no real codecs in the image). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1L, spark.sparkContext.defaultParallelism)
      .map { id =>
        val rnd = new scala.util.Random(id) // per-row deterministic
        val kind = Seq("image", "audio", "video")(rnd.nextInt(3))
        val payload = new Array[Byte](256 + rnd.nextInt(4096))
        rnd.nextBytes(payload)
        Media(id, kind, payload,
          width = if (kind != "audio") 64 + rnd.nextInt(512) else 0,
          height = if (kind != "audio") 64 + rnd.nextInt(512) else 0,
          sample_rate = if (kind == "audio") 16000 else 0,
          duration_ms = if (kind != "image") 1000 + rnd.nextInt(60000) else 0)
      }
  }

  /** STUB decode: a real implementation would decode payload → pixel/PCM
    * buffers here; the deterministic fake averages byte stripes. The
    * signature (bytes in, fixed-dim float vector out) is the contract. */
  private[ops] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val stripe = math.max(1, payload.length / dim)
    var i = 0
    while (i < dim) {
      var acc = 0L
      var j = i * stripe
      val end = math.min(payload.length, j + stripe)
      while (j < end) { acc += (payload(j) & 0xff); j += 1 }
      out(i) = if (end > i * stripe) acc.toFloat / (end - i * stripe) else 0f
      i += 1
    }
    out
  }

  /** Batch-shaped feature extraction: one partition = one iterator, the
    * per-batch setup cost (a real model/codec load) is paid once per
    * partition, mirroring mapInPandas semantics. */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would go here (codec/model initialization)
      it.map { m =>
        val f = decodeStub(m.payload, dim)
        val norm = math.sqrt(f.map(x => x.toDouble * x).sum)
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, f, norm)
      }
    }
  }

  /** Frame sampling stub for video payloads: every k-th fixed-size slice
    * of the payload stands in for a decoded frame. */
  def sampleFrames(media: Dataset[Media], every: Int = 4,
                   frameBytes: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .collect { case (frame, idx) if idx % every == 0 =>
          (m.media_id, idx, frame)
        }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** Rows-only query (no SQL oracle — the stub decode is engine-side):
    * per-kind feature statistics over the synthetic corpus. */
  def mediaFeatureStats(s: SparkSession, dir: String): DataFrame =
    extractFeatures(syntheticMedia(s, 2000)).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(round(col("feature_norm"), 3)), 3).as("avg_norm"))
      .orderBy(col("kind"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (mediaFeatureStats _))

  val oracle: Map[String, String] = Map.empty
}
