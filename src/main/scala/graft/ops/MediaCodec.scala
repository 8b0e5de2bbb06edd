package graft.ops

/** Real media container codecs, pure Scala/JVM (round-11 agenda #4 —
  * replaces the former `Multimodal.decodeStub`, the repo's last declared
  * stub). Both formats are public specifications:
  *
  *  - PNG (ISO/IEC 15948 / RFC 2083): full encode AND decode of the
  *    baseline subset the fixtures use — 8-bit grayscale, non-interlaced,
  *    filter type 0 — with REAL zlib compression (java.util.zip
  *    Deflater/Inflater) and REAL per-chunk CRC-32 validation. The
  *    decoder parses the signature and IHDR (width/height/bit
  *    depth/color type), inflates the concatenated IDAT stream, and
  *    strips scanline filter bytes back to pixels.
  *  - JPEG/JFIF (ITU-T T.81): marker-stream header parsing — walk the
  *    length-prefixed segments from SOI to the first SOF0/SOF1/SOF2
  *    frame header and return (width, height, components). Entropy
  *    decoding is out of scope (the gate needs dimensions, the universal
  *    metadata-extraction operation over a binary media column).
  *
  * Everything throws loudly on malformed input — at 100 TB a silent
  * wrong-dimensions decode poisons every downstream resize/filter. */
object MediaCodec {

  val PngSignature: Array[Byte] = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a,
    0x1a, 0x0a).map(_.toByte)

  final case class PngImage(width: Int, height: Int, bitDepth: Int,
                            colorType: Int, pixels: Array[Byte])

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** One PNG chunk: length + type + data + CRC-32 over (type ++ data). */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** Encode 8-bit grayscale pixels (row-major, width×height) as a real,
    * spec-valid PNG: signature, IHDR, one zlib-deflated IDAT of
    * filter-0 scanlines, IEND. Any standards-compliant viewer opens the
    * result. */
  def encodePng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"encodePng: need width*height=${width * height} pixels, got ${pixels.length}")
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8 /*bit depth*/ , 0 /*grayscale*/ , 0 /*deflate*/ ,
        0 /*adaptive filtering*/ , 0 /*no interlace*/)
    // scanlines: each row prefixed with filter byte 0 (None)
    val raw = new Array[Byte](height * (width + 1))
    var r = 0
    while (r < height) {
      raw(r * (width + 1)) = 0
      System.arraycopy(pixels, r * width, raw, r * (width + 1) + 1, width)
      r += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    PngSignature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Decode a baseline PNG (8-bit grayscale, non-interlaced, filter-0
    * rows): CRC-validated chunk walk, IDAT inflate, scanline unwrap. */
  def decodePng(bytes: Array[Byte]): PngImage = {
    require(bytes.length > 8 && PngSignature.indices.forall(i =>
      bytes(i) == PngSignature(i)), "decodePng: not a PNG (bad signature)")
    var off = 8
    var width, height, bitDepth, colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 8 <= bytes.length, "decodePng: truncated chunk header")
      val len = readBe32(bytes, off)
      // readBe32 is signed: a crafted length >= 2^31 arrives negative and
      // would pass the bound check below, then blow up inside CRC32 with
      // an index error instead of this diagnostic
      require(len >= 0, "decodePng: invalid chunk length")
      val typ = new String(bytes, off + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      require(off + 12 + len <= bytes.length, s"decodePng: truncated $typ")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == readBe32(bytes, off + 8 + len),
        s"decodePng: CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          width = readBe32(bytes, off + 8)
          height = readBe32(bytes, off + 12)
          bitDepth = bytes(off + 16) & 0xff
          colorType = bytes(off + 17) & 0xff
          require(bitDepth == 8 && colorType == 0,
            s"decodePng: unsupported bitDepth=$bitDepth colorType=$colorType " +
              "(baseline 8-bit grayscale decoder)")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped (already CRC-checked)
      }
      off += 12 + len
    }
    require(width > 0 && height > 0, "decodePng: no IHDR before IEND")
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](height * (width + 1))
    var filled = 0
    while (filled < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, filled, raw.length - filled)
      // zero progress while unfinished is ALWAYS fatal, whatever the
      // cause — truncated stream (needsInput) or a preset-dictionary
      // (FDICT) zlib header (needsDictionary): a needsInput-only guard
      // would spin forever on the latter
      require(n > 0, "decodePng: IDAT stream stalled " +
        (if (inflater.needsDictionary) "(preset dictionary unsupported)"
         else "(truncated)"))
      filled += n
    }
    inflater.end()
    require(filled == raw.length,
      s"decodePng: expected ${raw.length} scanline bytes, inflated $filled")
    val pixels = new Array[Byte](width * height)
    var r = 0
    while (r < height) {
      require(raw(r * (width + 1)) == 0,
        s"decodePng: unsupported filter type ${raw(r * (width + 1))} in row $r")
      System.arraycopy(raw, r * (width + 1) + 1, pixels, r * width, width)
      r += 1
    }
    PngImage(width, height, bitDepth, colorType, pixels)
  }

  // ------------------------------------------------------------- JPEG

  /** A structurally valid JPEG/JFIF byte stream carrying real dimensions:
    * SOI, APP0 (JFIF 1.01), SOF0 (8-bit precision, 1 component), SOS,
    * entropy payload, EOI. Sufficient for any marker-walking header
    * parser — the fixture generator for [[decodeJpegDims]]. */
  def encodeJpegShell(width: Int, height: Int,
                      entropy: Array[Byte]): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff)
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((payload.length + 2) >>> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++
        payload
    val app0 = ("JFIF" + "\u0000").getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](1, 1 /*v1.01*/ , 0 /*aspect units*/ , 0, 1, 0, 1 /*density*/ ,
        0, 0 /*no thumbnail*/)
    val sof0 = Array[Byte](8 /*precision*/ ,
      (height >>> 8).toByte, (height & 0xff).toByte,
      (width >>> 8).toByte, (width & 0xff).toByte,
      1 /*components*/ , 1 /*id*/ , 0x11 /*1x1 sampling*/ , 0 /*qtable*/)
    val sos = Array[Byte](1 /*components*/ , 1 /*id*/ , 0 /*tables*/ ,
      0, 63, 0 /*spectral selection*/)
    // entropy bytes: 0xff must be escaped (0xff00) to stay a valid stream
    val esc = entropy.flatMap(b =>
      if (b == 0xff.toByte) Seq(0xff.toByte, 0x00.toByte) else Seq(b))
    Array(0xff.toByte, 0xd8.toByte) ++ // SOI
      seg(0xe0, app0) ++ seg(0xc0, sof0) ++ seg(0xda, sos) ++ esc ++
      Array(0xff.toByte, 0xd9.toByte) // EOI
  }

  /** (width, height, nComponents) from a JPEG's frame header: walk the
    * marker stream from SOI to the first SOF0/SOF1/SOF2 (baseline,
    * extended sequential, progressive — the frame types that carry the
    * dimensions of essentially every JPEG in the wild). */
  def decodeJpegDims(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 4 && bytes(0) == 0xff.toByte &&
      bytes(1) == 0xd8.toByte, "decodeJpegDims: not a JPEG (no SOI)")
    var off = 2
    while (off + 4 <= bytes.length) {
      require(bytes(off) == 0xff.toByte,
        f"decodeJpegDims: expected marker at $off, got 0x${bytes(off)}%02x")
      val marker = bytes(off + 1) & 0xff
      marker match {
        case 0xff =>
          // T.81 permits any number of 0xFF FILL BYTES before a marker —
          // real encoders emit them; treating the second 0xFF as the
          // marker would then misread the true marker byte as a segment
          // length. Slide one byte and re-read.
          off += 1
        case m if m == 0xc0 || m == 0xc1 || m == 0xc2 =>
          require(off + 10 <= bytes.length,
            "decodeJpegDims: truncated SOF frame header")
          val h = readBe16(bytes, off + 5)
          val w = readBe16(bytes, off + 7)
          val ncomp = bytes(off + 9) & 0xff
          return (w, h, ncomp)
        case 0xd9 | 0xda =>
          // EOI, or SOS without a preceding frame header: no dimensions
          throw new IllegalArgumentException(
            "decodeJpegDims: no SOF frame header before scan/end")
        case m if m >= 0xd0 && m <= 0xd7 => off += 2 // standalone RSTn
        case 0x01 => off += 2 // standalone TEM
        case _ => off += 2 + readBe16(bytes, off + 2) // length-prefixed
      }
    }
    throw new IllegalArgumentException("decodeJpegDims: truncated stream")
  }
}
