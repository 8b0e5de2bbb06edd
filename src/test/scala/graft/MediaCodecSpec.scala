package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MediaCodec

/** The real media codecs (round-11 agenda #4): PNG encode/decode
  * roundtrip through actual zlib + CRC-validated chunks, JPEG
  * marker-stream dimension parsing, and loud failure on corruption. */
class MediaCodecSpec extends AnyFunSuite {

  test("PNG roundtrip: pixels survive encode → zlib → decode exactly") {
    val rnd = new scala.util.Random(42)
    for ((w, h) <- Seq((1, 1), (16, 16), (120, 37), (233, 101))) {
      val pixels = new Array[Byte](w * h)
      rnd.nextBytes(pixels)
      val png = MediaCodec.encodePng(w, h, pixels)
      // real container: signature + IHDR first
      assert(png.take(8).toSeq == MediaCodec.PngSignature.toSeq)
      val img = MediaCodec.decodePng(png)
      assert((img.width, img.height, img.bitDepth, img.colorType) == (w, h, 8, 0))
      assert(img.pixels.toSeq == pixels.toSeq, s"pixel corruption at ${w}x$h")
    }
  }

  test("PNG: single-bit corruption in IDAT is caught by the chunk CRC") {
    val pixels = Array.tabulate[Byte](64 * 64)(i => (i % 251).toByte)
    val png = MediaCodec.encodePng(64, 64, pixels)
    // flip one bit inside the IDAT payload (well past signature+IHDR)
    val corrupted = png.clone()
    corrupted(60) = (corrupted(60) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      MediaCodec.decodePng(corrupted)
    }
    assert(e.getMessage.contains("CRC"), e.getMessage)
  }

  test("PNG: truncated stream and bad signature fail loudly") {
    val png = MediaCodec.encodePng(8, 8, new Array[Byte](64))
    intercept[IllegalArgumentException] {
      MediaCodec.decodePng(png.take(20))
    }
    intercept[IllegalArgumentException] {
      MediaCodec.decodePng("not a png at all".getBytes)
    }
  }

  test("JPEG: SOF0 dims recovered through APP0/DQT-style segment walk") {
    val entropy = Array.tabulate[Byte](300)(i => (i * 7).toByte) // includes 0xff bytes
    val jpeg = MediaCodec.encodeJpegShell(640, 480, entropy)
    assert((jpeg(0) & 0xff) == 0xd8 || (jpeg(1) & 0xff) == 0xd8) // SOI present
    assert(MediaCodec.decodeJpegDims(jpeg) == ((640, 480, 1)))
    // 0xffff-edge dims survive the 16-bit big-endian encode
    assert(MediaCodec.decodeJpegDims(
      MediaCodec.encodeJpegShell(65535, 1, Array[Byte](1, 2))) == ((65535, 1, 1)))
  }

  test("JPEG: 0xFF fill-byte padding before markers is legal and skipped") {
    // T.81 allows any number of 0xFF fill bytes before a marker; a parser
    // that treats the second 0xFF as the marker misreads the true marker
    // as a segment-length byte
    val jpeg = MediaCodec.encodeJpegShell(320, 200, Array[Byte](5, 6, 7))
    val padded = jpeg.take(2) ++ Array.fill[Byte](4)(0xff.toByte) ++ jpeg.drop(2)
    assert(MediaCodec.decodeJpegDims(padded) == ((320, 200, 1)))
  }

  test("JPEG: stream truncated inside the SOF header fails loudly, not with AIOOBE") {
    val jpeg = MediaCodec.encodeJpegShell(320, 200, Array[Byte](1))
    // cut right after the SOF0 marker+length (before height/width bytes)
    val sofAt = jpeg.indices.find(i =>
      jpeg(i) == 0xff.toByte && jpeg(i + 1) == 0xc0.toByte).get
    val e = intercept[IllegalArgumentException] {
      MediaCodec.decodeJpegDims(jpeg.take(sofAt + 4))
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("JPEG: no SOI / no SOF fail loudly") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeJpegDims(Array[Byte](1, 2, 3, 4))
    }
    // SOI directly followed by EOI: marker walk must not invent dims
    intercept[IllegalArgumentException] {
      MediaCodec.decodeJpegDims(
        Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))
    }
  }

  test("synthetic image corpus: format sniffed from bytes, planted dims recovered") {
    val spark = TestSpark.spark
    val decoded = graft.ops.Multimodal.decodeImages(
      graft.ops.Multimodal.syntheticImages(spark, 64))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getLong(4))).sortBy(_._1)
    assert(decoded.length == 64)
    decoded.foreach { case (id, fmt, w, h, pixSum) =>
      // the planted truth, re-derived independently of the decoder
      val rnd = new scala.util.Random(0xC0DEC0DEL ^ id)
      val (ew, eh) = (16 + rnd.nextInt(120), 16 + rnd.nextInt(120))
      assert(fmt == (if (id % 2 == 0) "png" else "jpeg"), s"id $id")
      assert((w, h) == ((ew, eh)), s"id $id dims")
      if (fmt == "png") {
        val pixels = new Array[Byte](ew * eh)
        rnd.nextBytes(pixels)
        assert(pixSum == pixels.map(_ & 0xff).map(_.toLong).sum, s"id $id pixels")
      } else assert(pixSum == 0L)
    }
  }
}
