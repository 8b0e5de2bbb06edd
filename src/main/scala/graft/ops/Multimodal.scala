package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for LLM data pipelines (SURVEY §7.5): media as
  * opaque `binary` payloads with typed metadata, processed in batch-shaped
  * partition passes.
  *
  * The byte→container decode is REAL ([[MediaCodec]]): spec-valid PNG
  * encode/decode (zlib + CRC-validated chunks) and JPEG marker-stream
  * header parsing, gated end-to-end in `multimodal_decode` (planted
  * dimensions and pixel checksums recovered from the bytes alone). The
  * feature EMBEDDING step ([[byteStripeFeatures]]) remains a
  * content-agnostic byte featurizer — a production pipeline would swap
  * in a learned encoder there; the engine plumbing around it (schema,
  * partitioning, mapPartitions batch iteration amortizing per-batch
  * setup, the mapInPandas analogue) is the contract under test.
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

  /** Content-agnostic byte featurizer: fixed-dim stripe averages over the
    * payload bytes — the deterministic stand-in for a LEARNED embedding
    * model (which no container ships); the real container decode lives in
    * [[MediaCodec]] and is gated separately (`multimodal_decode`). The
    * signature (bytes in, fixed-dim float vector out) is the embedding
    * contract downstream ANN consumes. */
  private[ops] def byteStripeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
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
        val f = byteStripeFeatures(m.payload, dim)
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
      val f = byteStripeFeatures(payload, 16)
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

  // ------------------------------------------- features → ANN composition

  /** Center features before similarity: stripe-averages of uniform bytes
    * all point near (127.5, …), so raw cosines are ≈1 everywhere;
    * centering is the usual embedding whitening step and spreads the
    * directions. Mirrored exactly in the sequential truth. */
  private val FeatureCenter = 127.5

  /** The media feature table as a normalized vector table
    * (vec_id, e, nrm) — the contract [[Ivf.searchIvf]] consumes. */
  private[graft] def mediaVectors(s: SparkSession, n: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim
    extractFeatures(syntheticMedia(s, n)).toDF()
      .select(col("media_id").as("vec_id"),
        expr(s"transform(features, x -> CAST(x AS DOUBLE) - ${FeatureCenter}D)").as("e"))
      .withColumn("nrm", sqrt(Shim.column(DotDouble(
        Shim.expression(col("e")), Shim.expression(col("e"))))))
  }

  val annTruthPath = "/root/repo/fixtures/truth/multimodal_ann.parquet"

  /** Sequential ground truth for the media ANN gate: brute-force cosine
    * top-10 for queries media_id < 10 over the same 2000 feature
    * vectors, computed by a plain driver loop that mirrors the Spark
    * arithmetic exactly (float→double is exact; dots are sequential
    * left folds; 6 dp rounding before ranking). */
  def ensureAnnTruth(spark: SparkSession): Unit = synchronized {
    val marker = new java.io.File("/root/repo/fixtures/_MM_ANN_TRUTH_v1")
    if (marker.exists()) return
    val n = 2000
    val vecs = (0 until n).map { id =>
      val rnd = new scala.util.Random(id.toLong) // mirrors syntheticMedia
      rnd.nextInt(3) // the kind draw — consumed to keep the stream aligned
      val payload = new Array[Byte](256 + rnd.nextInt(4096))
      rnd.nextBytes(payload)
      byteStripeFeatures(payload, 16).map(_.toDouble - FeatureCenter)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var j = 0
      while (j < a.length) { d += a(j) * b(j); j += 1 }
      d
    }
    val nrm = vecs.map(v => math.sqrt(dot(v, v)))
    val rows = (0 until 10).flatMap { q =>
      (0 until n).filter(_ != q)
        .map { i =>
          val c = BigDecimal(dot(vecs(q), vecs(i)) / (nrm(q) * nrm(i)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (i.toLong, c)
        }
        .sortBy { case (i, c) => (-c, i) }.take(10)
        .map { case (i, _) => (q.toLong, i) }
    }
    import spark.implicits._
    rows.toDF("qid", "nid").coalesce(1)
      .write.mode("overwrite").parquet(annTruthPath)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/fixtures/_MM_ANN_TRUTH_v1"), "ok")
  }

  /** Gate: media features composed through the persisted-inverted-list
    * IVF search ([[Ivf.searchIvf]] on the `media` vector table), recall
    * asserted against the sequential brute-force truth — proving the
    * feature contract (schema, vector shape, norms) composes with the
    * ANN operators end to end. */
  def mediaAnnRecall(s: SparkSession, dir: String): DataFrame = {
    ensureAnnTruth(s)
    val ann = Ivf.searchIvf(mediaVectors(s, 2000), dir, "media",
      col("vec_id") < 10, k = 8, nProbe = 4)
    val truth = FrameMemo.parquet(s, annTruthPath).select("qid", "nid")
    truth.join(ann.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_semi")
      .agg(count(lit(1)).as("hits"))
      .crossJoin(truth.agg(count(lit(1)).as("n_expected")))
      .select(lit("media_ivf").as("method"), col("n_expected"),
        expr("(n_expected*7 + 9) DIV 10").as("min_hits"),
        (col("hits") >= expr("(n_expected*7 + 9) DIV 10")).as("recall_ok"))
  }

  // ------------------------------------------------- real container decode

  final case class ImageMedia(media_id: Long, payload: Array[Byte])

  /** Deterministic REAL image files: even ids are spec-valid PNGs
    * (seeded dims + pixels, encoded through [[MediaCodec.encodePng]] —
    * zlib + CRC for real), odd ids are JPEG/JFIF marker streams with
    * seeded dims. A distinct seed stream from [[syntheticMedia]] keeps
    * the two fixtures independent. */
  def syntheticImages(spark: SparkSession, n: Int): Dataset[ImageMedia] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1L, spark.sparkContext.defaultParallelism)
      .map { id =>
        val rnd = new scala.util.Random(0xC0DEC0DEL ^ id)
        val w = 16 + rnd.nextInt(120)
        val h = 16 + rnd.nextInt(120)
        val payload =
          if (id % 2 == 0) {
            val pixels = new Array[Byte](w * h)
            rnd.nextBytes(pixels)
            MediaCodec.encodePng(w, h, pixels)
          } else {
            val entropy = new Array[Byte](64 + rnd.nextInt(256))
            rnd.nextBytes(entropy)
            MediaCodec.encodeJpegShell(w, h, entropy)
          }
        ImageMedia(id, payload)
      }
  }

  /** Decode metadata (and, for PNG, pixels) from the BYTES ALONE —
    * format sniffed from the payload, never from a side column:
    * (media_id, format, width, height, pix_sum). pix_sum is the pixel
    * byte checksum recovered through the full inflate+unfilter path
    * (0 for JPEG: header-only parse by design). */
  def decodeImages(media: Dataset[ImageMedia]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val b = m.payload
        if (b.length > 8 && MediaCodec.PngSignature.indices.forall(i =>
            b(i) == MediaCodec.PngSignature(i))) {
          val img = MediaCodec.decodePng(b)
          var s = 0L
          img.pixels.foreach(p => s += (p & 0xff))
          (m.media_id, "png", img.width, img.height, s)
        } else {
          val (w, h, _) = MediaCodec.decodeJpegDims(b)
          (m.media_id, "jpeg", w, h, 0L)
        }
      }
    }.toDF("media_id", "format", "width", "height", "pix_sum")
  }

  val decodeTruthPath = "/root/repo/fixtures/truth/multimodal_decode.parquet"

  /** Sequential PLANTED truth for the decode gate: the same seeded
    * generator loop records what it PUT INTO each file (dims, pixel
    * checksum) without ever running the decoder — so a hash-match
    * proves the encode→bytes→decode roundtrip recovers the planted
    * values, not that the decoder agrees with itself. */
  def ensureDecodeTruth(spark: SparkSession): Unit = synchronized {
    val marker = new java.io.File("/root/repo/fixtures/_MM_DECODE_TRUTH_v1")
    if (marker.exists()) return
    val acc = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long)]
    (0 until 400).foreach { id =>
      val rnd = new scala.util.Random(0xC0DEC0DEL ^ id.toLong) // mirrors syntheticImages
      val w = 16 + rnd.nextInt(120)
      val h = 16 + rnd.nextInt(120)
      val (fmt, pixSum) =
        if (id % 2 == 0) {
          val pixels = new Array[Byte](w * h)
          rnd.nextBytes(pixels)
          var s = 0L
          pixels.foreach(p => s += (p & 0xff))
          ("png", s)
        } else ("jpeg", 0L)
      val (n, ws, hs, ps) = acc.getOrElse(fmt, (0L, 0L, 0L, 0L))
      acc(fmt) = (n + 1, ws + w, hs + h, ps + pixSum)
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("format", StringType),
      StructField("n", LongType), StructField("w_sum", LongType),
      StructField("h_sum", LongType), StructField("pix_total", LongType)))
    val rows = acc.toSeq.sortBy(_._1).map { case (f, (n, ws, hs, ps)) =>
      org.apache.spark.sql.Row(f, n, ws, hs, ps)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(decodeTruthPath)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/fixtures/_MM_DECODE_TRUTH_v1"), "ok")
  }

  /** Gate: per-format dimension and pixel-checksum rollup of the decoded
    * image corpus — equality with the planted oracle proves real PNG
    * decode (CRC walk, inflate, unfilter) and JPEG header parsing from
    * the binary column alone. */
  def mediaDecodeStats(s: SparkSession, dir: String): DataFrame = {
    ensureDecodeTruth(s)
    decodeImages(syntheticImages(s, 400))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"),
        sum(col("width")).as("w_sum"),
        sum(col("height")).as("h_sum"),
        sum(col("pix_sum")).as("pix_total"))
      .orderBy(col("format"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> (mediaFeatureStats _),
    "multimodal_decode" -> (mediaDecodeStats _),
    "multimodal_ann" -> (mediaAnnRecall _))

  val oracle: Map[String, String] = Map(
    "multimodal_features" -> s"""
      SELECT kind, n, total_bytes, norm_sum
      FROM read_parquet('$truthPath/*.parquet')
      ORDER BY kind""",
    "multimodal_decode" -> s"""
      SELECT format, n, w_sum, h_sum, pix_total
      FROM read_parquet('$decodeTruthPath/*.parquet')
      ORDER BY format""",
    "multimodal_ann" -> s"""
      SELECT 'media_ivf' AS method,
        CAST(COUNT(*) AS BIGINT) AS n_expected,
        CAST((COUNT(*)*7 + 9)//10 AS BIGINT) AS min_hits,
        TRUE AS recall_ok
      FROM read_parquet('$annTruthPath/*.parquet')""")
}
