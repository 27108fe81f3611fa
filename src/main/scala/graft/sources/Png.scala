package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** Dependency-free PNG codec — the second real image container behind
  * the multimodal family (a production thumbnail corpus is
  * mixed-format; [[graft.operators.Multimodal.decodeImage]] dispatches
  * BMP/PNG on magic bytes). Built only on the JDK's zlib bindings
  * (`java.util.zip.Inflater`/`Deflater`) against the public PNG
  * specification (RFC 2083 / ISO 15948): 8-byte signature, length-
  * type-data-CRC chunks, IHDR/IDAT/IEND, zlib-wrapped scanlines with
  * the five per-row filters (None/Sub/Up/Average/Paeth). Same
  * untrusted-input contract as [[Bmp]]/[[Xls]]/[[Xlsx]]: every
  * malformed input — including a corrupted chunk CRC, a declared
  * size the inflated stream doesn't match, or an output-size lie —
  * fails as `IllegalArgumentException`; allocation is capped before
  * inflation (FuzzSpec mutates a valid base).
  *
  * Supported surface: bit depth 8, color types 0 (grayscale),
  * 2 (truecolor RGB) and 6 (RGBA — alpha read and dropped; the gray
  * pipeline keys on luma), non-interlaced. Ancillary chunks are
  * skipped. Decode returns the same normalized [[Bmp.Image]]
  * (packed 0xRRGGBB, row-major, top-left origin), so everything
  * downstream (luma, resample, pHash) is container-agnostic.
  */
object Png {

  private val Signature =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private[graft] def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && Signature.indices.forall(i => b(i) == Signature(i))

  private def i32be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private val MaxSide = 1 << 14
  private val MaxPixels = 1 << 24

  def decode(bytes: Array[Byte]): Bmp.Image =
    try decode0(bytes)
    catch {
      case e: IllegalArgumentException => throw e
      // NonFatal only (see Bmp.decode): OOB / zlib DataFormatException /
      // arithmetic rebrand as malformed input; VM errors surface as-is
      case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(s"malformed PNG: $e", e)
    }

  private def decode0(b: Array[Byte]): Bmp.Image = {
    require(isPng(b), "PNG: missing signature")
    var o = 8
    var width = -1
    var height = -1
    var colorType = -1
    var bytesPerPx = 0
    var sawIhdr = false
    var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new CRC32
    while (o + 8 <= b.length && !sawIend) {
      val len = i32be(b, o)
      // Long arithmetic: a hostile declared length near Int.MaxValue
      // overflows `o + 12 + len` and the Int check would pass on an
      // invalid chunk — validation must reject here, not lean on the
      // downstream AIOOBE-to-IAE rebrand (r12 ADVICE)
      require(len >= 0 && o.toLong + 12L + len <= b.length,
        s"PNG: truncated chunk at offset $o")
      val ctype = new String(b, o + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      crc.reset()
      crc.update(b, o + 4, 4 + len)
      require(crc.getValue == (i32be(b, o + 8 + len).toLong & 0xffffffffL),
        s"PNG: CRC mismatch in '$ctype' chunk")
      ctype match {
        case "IHDR" =>
          require(!sawIhdr, "PNG: duplicate IHDR")
          require(len == 13, s"PNG: IHDR length $len")
          width = i32be(b, o + 8)
          height = i32be(b, o + 12)
          require(width > 0 && width <= MaxSide, s"PNG: bad width $width")
          require(height > 0 && height <= MaxSide, s"PNG: bad height $height")
          require(width.toLong * height <= MaxPixels,
            s"PNG: ${width}x$height exceeds the pixel cap")
          val bitDepth = b(o + 16) & 0xff
          colorType = b(o + 17) & 0xff
          require(bitDepth == 8, s"PNG: bit depth $bitDepth unsupported")
          bytesPerPx = colorType match {
            case 0 => 1 // grayscale
            case 2 => 3 // RGB
            case 6 => 4 // RGBA
            case ct => throw new IllegalArgumentException(
              s"PNG: color type $ct unsupported (0/2/6)")
          }
          require((b(o + 18) & 0xff) == 0, "PNG: nonzero compression method")
          require((b(o + 19) & 0xff) == 0, "PNG: nonzero filter method")
          require((b(o + 20) & 0xff) == 0,
            "PNG: interlaced images unsupported")
          sawIhdr = true
        case "IDAT" =>
          require(sawIhdr, "PNG: IDAT before IHDR")
          idat.write(b, o + 8, len)
        case "IEND" =>
          sawIend = true
        case _ => // ancillary chunk — skipped
      }
      o += 12 + len
    }
    require(sawIhdr, "PNG: no IHDR chunk")
    require(sawIend, "PNG: no IEND chunk")
    require(idat.size() > 0, "PNG: no IDAT data")

    val stride = 1 + width * bytesPerPx // filter byte + scanline
    val rawLen = stride * height
    val raw = new Array[Byte](rawLen)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < rawLen && !inf.finished()) {
      val n = inf.inflate(raw, got, rawLen - got)
      require(n > 0 || inf.finished(),
        "PNG: zlib stream stalled (truncated or needs dictionary)")
      got += n
    }
    val overrun = !inf.finished() && inf.inflate(new Array[Byte](1)) > 0
    inf.end()
    require(got == rawLen && !overrun,
      s"PNG: inflated size mismatch (got $got, want $rawLen)")

    // per-row filter reconstruction (spec §6): a = left, b = up, c = up-left
    def paeth(a: Int, bb: Int, c: Int): Int = {
      val p = a + bb - c
      val pa = math.abs(p - a); val pb = math.abs(p - bb)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
    }
    var r = 0
    while (r < height) {
      val ro = r * stride
      val filter = raw(ro) & 0xff
      require(filter <= 4, s"PNG: unknown filter $filter on row $r")
      var i = 1
      while (i < stride) {
        val x = raw(ro + i) & 0xff
        val a = if (i > bytesPerPx) raw(ro + i - bytesPerPx) & 0xff else 0
        val up = if (r > 0) raw(ro + i - stride) & 0xff else 0
        val c =
          if (r > 0 && i > bytesPerPx) raw(ro + i - bytesPerPx - stride) & 0xff
          else 0
        val v = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + (a + up) / 2
          case 4 => x + paeth(a, up, c)
        }
        raw(ro + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val out = new Array[Int](width * height)
    r = 0
    while (r < height) {
      val ro = r * stride + 1
      var cx = 0
      while (cx < width) {
        val o2 = ro + cx * bytesPerPx
        val px =
          if (bytesPerPx == 1) { val g = raw(o2) & 0xff; (g << 16) | (g << 8) | g }
          else ((raw(o2) & 0xff) << 16) | ((raw(o2 + 1) & 0xff) << 8) |
            (raw(o2 + 2) & 0xff) // alpha (o2+3) dropped for type 6
        out(r * width + cx) = px
        cx += 1
      }
      r += 1
    }
    Bmp.Image(width, height, out)
  }

  /** Encode a grayscale plane as an 8-bit color-type-0 PNG (filter 0
    * rows, one zlib stream, correct chunk CRCs) — the synthesis half
    * for the PNG share of the mixed-container corpus, and the spec /
    * fuzz base. Decoders must reconstruct all five filters;
    * MediaCodecSpec covers 1-4 with hand-filtered fixtures.
    */
  def encodeGray(width: Int, height: Int, gray: Array[Long]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"encodeGray: ${gray.length} values for ${width}x$height")
    require(gray.forall(v => v >= 0 && v <= 255),
      "encodeGray: gray values must be 0-255")
    val raw = new Array[Byte]((1 + width) * height)
    var r = 0
    while (r < height) {
      // raw(r * (1 + width)) = 0: filter None
      var c = 0
      while (c < width) {
        raw(r * (1 + width) + 1 + c) = gray(r * width + c).toByte
        c += 1
      }
      r += 1
    }
    val def_ = new Deflater()
    def_.setInput(raw)
    def_.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!def_.finished()) zBuf.write(tmp, 0, def_.deflate(tmp))
    def_.end()
    val z = zBuf.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](8 /*depth*/, 0 /*gray*/, 0, 0, 0 /*no interlace*/))
    chunk("IDAT", z)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
