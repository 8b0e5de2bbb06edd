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

  val truthPath = "/root/repo/fixtures/truth/multimodal_features.parquet"

  /** Ground truth for the gate, computed by a plain sequential driver
    * loop over the same seeded definitions (never touching the Spark
    * operator pipeline) — so a hash-match proves the distributed
    * plumbing (partitioned generation, mapPartitions decode, decimal
    * aggregation) reproduces the sequential semantics exactly. Norms are
    * 3dp-rounded then summed as decimals: exact and order-independent,
    * so partition count can't perturb the hash. */
  def ensureTruth(spark: SparkSession): Unit = synchronized {
    val marker = new java.io.File("/root/repo/fixtures/_MM_TRUTH_v1")
    if (marker.exists()) return
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long, java.math.BigDecimal)]
    (0 until 2000).foreach { id =>
      val rnd = new scala.util.Random(id.toLong) // mirrors syntheticMedia
      val kind = Seq("image", "audio", "video")(rnd.nextInt(3))
      val payload = new Array[Byte](256 + rnd.nextInt(4096))
      rnd.nextBytes(payload)
      val f = decodeStub(payload, 16)
      val norm = math.sqrt(f.map(x => x.toDouble * x).sum)
      val rounded = java.math.BigDecimal.valueOf(norm)
        .setScale(3, java.math.RoundingMode.HALF_UP)
      val (n, b, s) = acc.getOrElse(kind, (0L, 0L, java.math.BigDecimal.ZERO))
      acc(kind) = (n + 1, b + payload.length, s.add(rounded))
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("kind", StringType),
      StructField("n", LongType), StructField("total_bytes", LongType),
      StructField("norm_sum", DoubleType)))
    val rows = acc.toSeq.sortBy(_._1).map { case (k, (n, b, s)) =>
      org.apache.spark.sql.Row(k, n, b, s.doubleValue)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(truthPath)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/fixtures/_MM_TRUTH_v1"), "ok")
  }

  /** Per-kind feature statistics over the synthetic corpus, gated against
    * the sequential ground truth (see [[ensureTruth]]). */
  def mediaFeatureStats(s: SparkSession, dir: String): DataFrame = {
    ensureTruth(s)
    extractFeatures(syntheticMedia(s, 2000)).toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(round(col("feature_norm"), 3)
          .cast(org.apache.spark.sql.types.DecimalType(18, 3)))
          .cast("double").as("norm_sum"))
      .orderBy(col("kind"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (mediaFeatureStats _))

  val oracle: Map[String, String] = Map(
    "multimodal_features" -> s"""
      SELECT kind, n, total_bytes, norm_sum
      FROM read_parquet('$truthPath/*.parquet')
      ORDER BY kind""")
}
