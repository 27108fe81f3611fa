package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bmp, Png, Wav}

/** Contract pins for the two real media codecs behind the mm family:
  * [[graft.sources.Bmp]] (image) and [[graft.sources.Wav]] (audio).
  * Round-trips are bit-exact by design (integer luma of gray pixels is
  * the identity; PCM stores the samples verbatim), every decode branch
  * (row order, stride padding, palette, chunk walk) is exercised, and
  * malformed inputs fail as IllegalArgumentException — the
  * untrusted-input contract FuzzSpec then hammers at random.
  */
class MediaCodecSpec extends AnyFunSuite {

  /** Hand-built 8bpp palettized BMP (the decode branch [[Bmp.encode24]]
    * cannot produce): identity grayscale palette, chosen row order.
    */
  private def encode8(width: Int, height: Int, gray: Array[Long],
      topDown: Boolean, colorsUsed: Int = 0): Array[Byte] = {
    val stride = (width + 3) & ~3
    val palN = if (colorsUsed == 0) 256 else colorsUsed
    val pixelOff = 54 + 4 * palN
    val out = new Array[Byte](pixelOff + stride * height)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Int): Unit =
      (0 until 4).foreach(i => out(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    out(0) = 'B'; out(1) = 'M'
    put32(2, out.length); put32(10, pixelOff); put32(14, 40)
    put32(18, width); put32(22, if (topDown) -height else height)
    put16(26, 1); put16(28, 8); put32(30, 0)
    put32(46, colorsUsed)
    for (i <- 0 until palN) { // BGRX identity gray
      out(54 + 4 * i) = i.toByte; out(55 + 4 * i) = i.toByte
      out(56 + 4 * i) = i.toByte
    }
    for (r <- 0 until height; c <- 0 until width) {
      val ir = if (topDown) r else height - 1 - r
      out(pixelOff + r * stride + c) = gray(ir * width + c).toByte
    }
    out
  }

  private def plane(n: Int): Array[Long] =
    Array.tabulate(n)(i => ((i * 37 + 11) % 256).toLong)

  // ── BMP ──────────────────────────────────────────────────────────────

  test("24bpp bottom-up round-trip is bit-exact: luma(decode(encode24)) " +
      "recovers the gray plane") {
    val p = plane(1024)
    val img = Bmp.decode(Bmp.encode24(32, 32, p))
    assert(img.width == 32 && img.height == 32)
    assert(Bmp.luma(img).sameElements(p))
    assert(Bmp.luma32(img).sameElements(p), "32x32 resample is identity")
  }

  test("top-down and bottom-up files decode to the same normalized image") {
    val p = plane(32 * 16)
    val up = Bmp.decode(Bmp.encode24(32, 16, p))
    val down = Bmp.decode(Bmp.encode24(32, 16, p, topDown = true))
    assert(up.pixels.sameElements(down.pixels))
  }

  test("odd-width rows honor the 4-byte stride padding") {
    // width 3 → 9 data bytes, stride 12: a padding bug shears every row
    val p = Array[Long](10, 20, 30, 40, 50, 60)
    val img = Bmp.decode(Bmp.encode24(3, 2, p))
    assert(Bmp.luma(img).sameElements(p))
  }

  test("8bpp palettized decode resolves indices through the palette, " +
      "both row orders, truncated palettes included") {
    val p = plane(8 * 4).map(_ % 200) // fits a 200-entry palette
    for (td <- Seq(false, true); used <- Seq(0, 200)) {
      val img = Bmp.decode(encode8(8, 4, p, topDown = td, colorsUsed = used))
      assert(Bmp.luma(img).sameElements(p), s"topDown=$td colorsUsed=$used")
    }
  }

  /** Hand-built 32bpp BMP (BGRA, alpha ignored) with a selectable DIB
    * header size — covers the two decode branches [[Bmp.encode24]]
    * never emits (32-bit pixels, V4/V5 headers).
    */
  private def encode32(width: Int, height: Int, rgb: Array[Int],
      dibSize: Int): Array[Byte] = {
    val pixelOff = 14 + dibSize
    val out = new Array[Byte](pixelOff + 4 * width * height)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Int): Unit =
      (0 until 4).foreach(i => out(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    out(0) = 'B'; out(1) = 'M'
    put32(2, out.length); put32(10, pixelOff); put32(14, dibSize)
    put32(18, width); put32(22, height) // bottom-up
    put16(26, 1); put16(28, 32); put32(30, 0)
    for (r <- 0 until height; c <- 0 until width) {
      val p = rgb((height - 1 - r) * width + c)
      val o = pixelOff + (r * width + c) * 4
      out(o) = (p & 0xff).toByte // B
      out(o + 1) = ((p >> 8) & 0xff).toByte // G
      out(o + 2) = ((p >> 16) & 0xff).toByte // R
      out(o + 3) = 0x7f // alpha, must be ignored
    }
    out
  }

  test("32bpp BGRA decode drops alpha; V4/V5 DIB headers accepted") {
    val rgb = Array(0x102030, 0xFFEEDD, 0x000000, 0xFF00FF,
      0x00FF00, 0x0000FF)
    for (dib <- Seq(40, 108, 124)) {
      val img = Bmp.decode(encode32(3, 2, rgb, dib))
      assert(img.width == 3 && img.height == 2, s"dib $dib")
      assert(img.pixels.sameElements(rgb), s"dib $dib")
    }
  }

  test("64x64 → 32x32 box resample is the exact integer block mean") {
    // block (by,bx) holds values 4k..4k+3 → mean (16k+6)/4 = 4k+1
    val src = new Array[Long](64 * 64)
    for (by <- 0 until 32; bx <- 0 until 32; dy <- 0 until 2; dx <- 0 until 2)
      src((by * 2 + dy) * 64 + bx * 2 + dx) =
        ((by * 32 + bx) * 4 + dy * 2 + dx) % 256
    val got = Bmp.luma32(Bmp.decode(Bmp.encode24(64, 64, src)))
    for (by <- 0 until 32; bx <- 0 until 32) {
      val k = by * 32 + bx
      val vals = for (dy <- 0 until 2; dx <- 0 until 2)
        yield (k * 4 + dy * 2 + dx) % 256
      assert(got(k) == vals.sum / 4, s"block $k")
    }
  }

  test("the mm pipeline parity: pHash over the PARSED container equals " +
      "pHash over the generator plane, for BOTH containers — the " +
      "oracle's premise") {
    for (text <- Seq("", "hello spark", "a" * 100, "café ☃ corpus")) {
      val p = graft.operators.Multimodal.grayPlane(text.getBytes("UTF-8"))
      val want = graft.operators.Multimodal.phash64(p)
      for (bytes <- Seq(Bmp.encode24(32, 32, p), Png.encodeGray(32, 32, p)))
        assert(graft.operators.Multimodal.phash64(Bmp.luma32(
          graft.operators.Multimodal.decodeImage(bytes))) == want, s"'$text'")
    }
  }

  test("malformed BMPs fail as IllegalArgumentException") {
    val good = Bmp.encode24(32, 32, plane(1024))
    def mut(f: Array[Byte] => Array[Byte]): Array[Byte] = f(good.clone())
    val bads = Seq[(String, Array[Byte])](
      "empty" -> Array.emptyByteArray,
      "bad magic" -> mut { b => b(0) = 'X'; b },
      "truncated pixels" -> good.take(500),
      "bad dib size" -> mut { b => b(14) = 39; b },
      "compression" -> mut { b => b(30) = 1; b },
      "zero width" -> mut { b => b(18) = 0; b(19) = 0; b(20) = 0; b },
      "giant height (allocation bomb)" -> mut { b =>
        b(22) = 0xff.toByte; b(23) = 0xff.toByte; b(24) = 0x7f; b },
      "1bpp" -> mut { b => b(28) = 1; b },
      "pixel offset past EOF" -> mut { b => b(10) = 0xff.toByte
        b(11) = 0xff.toByte; b },
      "palette index OOB" -> {
        // 5-entry palette but indices up to 7
        val p = Array.tabulate[Long](16)(i => (i % 8).toLong)
        encode8(4, 4, p, topDown = false, colorsUsed = 5)
      })
    bads.foreach { case (why, b) =>
      assertThrows[IllegalArgumentException](Bmp.decode(b))
      ()
    }
  }

  // ── PNG ──────────────────────────────────────────────────────────────

  /** Build a PNG from pre-filtered raw scanlines (filter byte + data per
    * row) — lets the tests exercise decode branches the gray encoder
    * never emits (filters 1-4, truecolor, RGBA).
    */
  private def buildPng(width: Int, height: Int, colorType: Int,
      raw: Array[Byte]): Array[Byte] = {
    import java.util.zip.{CRC32, Deflater}
    val d = new Deflater(); d.setInput(raw); d.finish()
    val zb = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) zb.write(tmp, 0, d.deflate(tmp))
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte), 0, 8)
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(t: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val tb = t.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val c = new CRC32; c.update(tb); c.update(data)
      out.write(be32(c.getValue.toInt), 0, 4)
    }
    chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0))
    chunk("IDAT", zb.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("png grayscale round-trip is bit-exact, directly and through " +
      "the Multimodal.decodeImage dispatch") {
    val p = plane(1024)
    val bytes = Png.encodeGray(32, 32, p)
    assert(Bmp.luma(Png.decode(bytes)).sameElements(p))
    assert(Bmp.luma(graft.operators.Multimodal.decodeImage(bytes))
      .sameElements(p))
    // and the dispatch still routes BMP bytes to the BMP parser
    assert(Bmp.luma(graft.operators.Multimodal.decodeImage(
      Bmp.encode24(32, 32, p))).sameElements(p))
  }

  test("png filters 1-4 (Sub/Up/Average/Paeth) reconstruct exactly") {
    val w = 6; val h = 5
    val img = Array.tabulate[Int](w * h)(i => (i * 53 + 7) % 256)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b)
      val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (f <- 1 to 4) {
      // forward-filter every row with filter f (grayscale: bpp = 1)
      val raw = new Array[Byte]((1 + w) * h)
      for (r <- 0 until h) {
        raw(r * (1 + w)) = f.toByte
        for (c <- 0 until w) {
          val x = img(r * w + c)
          val a = if (c > 0) img(r * w + c - 1) else 0
          val up = if (r > 0) img((r - 1) * w + c) else 0
          val ul = if (r > 0 && c > 0) img((r - 1) * w + c - 1) else 0
          val pred = f match {
            case 1 => a
            case 2 => up
            case 3 => (a + up) / 2
            case 4 => paeth(a, up, ul)
          }
          raw(r * (1 + w) + 1 + c) = ((x - pred) & 0xff).toByte
        }
      }
      val got = Png.decode(buildPng(w, h, 0, raw))
      assert(got.pixels.map(_ & 0xff).sameElements(img), s"filter $f")
    }
  }

  test("png truecolor and RGBA decode to packed pixels, alpha dropped") {
    // 2x2: distinct RGB per pixel
    val px = Seq((10, 20, 30), (200, 150, 100), (0, 255, 7), (99, 98, 97))
    val raw2 = Array[Byte](0) ++ px.take(2).flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) } ++
      Array[Byte](0) ++ px.drop(2).flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) }
    val t2 = Png.decode(buildPng(2, 2, 2, raw2))
    assert(t2.pixels.toSeq == px.map { case (r, g, b) =>
      (r << 16) | (g << 8) | b })
    val raw6 = Array[Byte](0) ++ px.take(2).flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte, 0x80.toByte) } ++
      Array[Byte](0) ++ px.drop(2).flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte, 0xff.toByte) }
    val t6 = Png.decode(buildPng(2, 2, 6, raw6))
    assert(t6.pixels.toSeq == px.map { case (r, g, b) =>
      (r << 16) | (g << 8) | b })
  }

  test("malformed PNGs fail as IllegalArgumentException") {
    val good = Png.encodeGray(32, 32, plane(1024))
    def mut(f: Array[Byte] => Array[Byte]): Array[Byte] = f(good.clone())
    val bads = Seq[(String, Array[Byte])](
      "empty" -> Array.emptyByteArray,
      "bad signature" -> mut { b => b(0) = 'X'; b },
      "corrupted IDAT byte (CRC catches it)" -> mut { b =>
        b(60) = (b(60) ^ 0x40).toByte; b },
      "truncated" -> good.take(good.length - 20),
      "no IEND" -> good.take(good.length - 12),
      "interlaced" -> mut { b => b(28) = 1; patchIhdrCrc(b); b },
      "bit depth 16" -> mut { b => b(24) = 16; patchIhdrCrc(b); b },
      "palette color type" -> mut { b => b(25) = 3; patchIhdrCrc(b); b },
      "height lies (inflated size mismatch)" -> mut { b =>
        b(23) = 33; patchIhdrCrc(b); b },
      "unknown filter" -> {
        val raw = Array[Byte](7) ++ Array.fill[Byte](4)(1)
        buildPng(4, 1, 0, raw)
      })
    bads.foreach { case (why, b) =>
      assertThrows[IllegalArgumentException](Png.decode(b))
      ()
    }
  }

  /** Recompute the IHDR CRC after a test mutates IHDR fields, so the
    * failure under test is the FIELD check, not the CRC check.
    */
  private def patchIhdrCrc(b: Array[Byte]): Unit = {
    val c = new java.util.zip.CRC32
    c.update(b, 12, 4 + 13) // type + data
    val v = c.getValue.toInt
    b(29) = ((v >> 24) & 0xff).toByte; b(30) = ((v >> 16) & 0xff).toByte
    b(31) = ((v >> 8) & 0xff).toByte; b(32) = (v & 0xff).toByte
  }

  // ── WAV ──────────────────────────────────────────────────────────────

  test("PCM32 round-trip is verbatim, negatives and code-point range " +
      "included; zero samples decode to an empty stream") {
    for (s <- Seq(Array.empty[Long], Array(0L), Array(-1L, 1L, -2147483648L,
        2147483647L), Array(0x10FFFFL, 65L, 0L, 955L))) {
      assert(Wav.decode(Wav.encodePcm32(s)).sameElements(s))
    }
  }

  test("the chunk walk skips unknown chunks (odd sizes padded) and " +
      "finds data after them") {
    val base = Wav.encodePcm32(Array(7L, -9L, 100000L))
    // splice a LIST chunk (odd 5-byte body + pad) between fmt and data
    val head = base.take(36)
    val tail = base.drop(36)
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'I', 'N', 'F', 'O', 'x', 0 /* pad */)
    val spliced = head ++ list ++ tail
    // fix the RIFF size field (informational, but keep it honest)
    val riffSize = spliced.length - 8
    (0 until 4).foreach(i =>
      spliced(4 + i) = ((riffSize >> (8 * i)) & 0xff).toByte)
    assert(Wav.decode(spliced).sameElements(Array(7L, -9L, 100000L)))
  }

  test("malformed WAVs fail as IllegalArgumentException") {
    val good = Wav.encodePcm32(Array(1L, 2L, 3L))
    def mut(f: Array[Byte] => Array[Byte]): Array[Byte] = f(good.clone())
    val bads = Seq[(String, Array[Byte])](
      "empty" -> Array.emptyByteArray,
      "not RIFF" -> mut { b => b(0) = 'X'; b },
      "not WAVE" -> mut { b => b(8) = 'X'; b },
      "data before fmt / fmt missing" -> (good.take(12) ++ good.drop(36)),
      "16-bit samples" -> mut { b => b(34) = 16; b },
      "stereo" -> mut { b => b(22) = 2; b },
      "non-PCM format tag" -> mut { b => b(20) = 3; b },
      "unaligned data size" -> mut { b => b(40) = 11; b },
      "truncated data" -> good.dropRight(4),
      "giant data size (allocation bomb)" -> mut { b =>
        b(40) = 0; b(41) = 0; b(42) = 0; b(43) = 0x7f; b })
    bads.foreach { case (why, b) =>
      assertThrows[IllegalArgumentException](Wav.decode(b))
      ()
    }
  }
}
