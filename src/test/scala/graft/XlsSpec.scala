package graft

import java.io.ByteArrayOutputStream

/** Legacy `.xls` (BIFF8) scan: fixtures are REAL compound files built
  * by the spec's own [MS-CFB]/[MS-XLS] writer below (the XlsxSpec
  * zip-fixture discipline — no Excel ships here), covering both
  * container layouts a reader meets in the wild: streams under the
  * 4096-byte cutoff living in the 64-byte MINI-sector chain, and
  * padded streams in the normal 512-byte FAT chain. Record coverage:
  * SST with compressed, UTF-16, and CONTINUE-split strings (the
  * continuation re-stating its own grbit — the format's trap),
  * LabelSst, Number, RK (both the ×1/100 and 30-bit-int flavors),
  * MulRk, BoolErr, and Formula with cached numeric and string results.
  */
class XlsSpec extends SparkSpec {

  import XlsFixture._

  private val want = Vector(
    Vector("name", "wert"),
    Vector("alpha-alpha-alpha-Ω-omega", "12.5"),
    Vector("300", "12.34"),
    Vector("7", "8"),
    Vector("1", "99"),
    Vector("calc", null))

  test("BIFF8 parse from the mini-sector chain (stream < 4096 bytes)") {
    val got = sources.Xls.parse(cfbMini(biffStream()))
    assert(got == want, s"got $got")
  }

  test("BIFF8 parse from the normal FAT chain (padded stream)") {
    val got = sources.Xls.parse(cfbBig(biffStream()))
    assert(got == want, s"got $got")
  }

  test("BIFF8 parse from a v4 container (4096-byte sectors)") {
    val got = sources.Xls.parse(cfbV4(biffStream()))
    assert(got == want, s"got $got")
  }

  test("Xlsx.read dispatches on magic: an .xls folder scans like xlsx, " +
      "headers from the first row") {
    val dir = java.nio.file.Files.createTempDirectory("xls").toFile
    java.nio.file.Files.write(
      new java.io.File(dir, "a.xls").toPath, cfbMini(biffStream()))
    val df = sources.Xlsx.read(spark, dir.getAbsolutePath + "/*.xls")
    assert(df.columns.toSeq == Seq("name", "wert"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(p => Option(p._1).getOrElse(""))
    assert(rows.length == 5)
    assert(rows.contains(("300", "12.34")))
    assert(rows.contains(("calc", null)))
  }

  test("a UTF-16 run split on an odd byte boundary fails fast instead " +
      "of spinning (hostile/corrupt SST)") {
    // cch=4 UTF-16 string with 5 bytes of char data in the SST record:
    // after consuming 2 chars, 1 byte remains — take would be 0 with
    // characters still owed, the exact shape that used to loop forever
    val globals = new ByteArrayOutputStream()
    rec(globals, 0x809, body { b =>
      w16(b, 0x0600); w16(b, 0x0005); w16(b, 0); w16(b, 0)
      w32(b, 0); w32(b, 0)
    })
    rec(globals, 0xFC, body { b =>
      w32(b, 1); w32(b, 1)
      w16(b, 4); b.write(1) // cch=4, UTF-16
      b.write("ab".getBytes("UTF-16LE"))
      b.write('x') // stray odd byte before the record ends
    })
    rec(globals, 0x3C, body { b =>
      b.write(1); b.write("cd".getBytes("UTF-16LE"))
    })
    rec(globals, 0x0A, Array.emptyByteArray)
    val e = intercept[IllegalArgumentException] {
      sources.Xls.parse(cfbMini(globals.toByteArray))
    }
    assert(e.getMessage.contains("odd byte boundary"), e.getMessage)
  }

  test("an SST whose rich-format block runs past the last fragment " +
      "fails fast instead of spinning") {
    val globals = new ByteArrayOutputStream()
    rec(globals, 0x809, body { b =>
      w16(b, 0x0600); w16(b, 0x0005); w16(b, 0); w16(b, 0)
      w32(b, 0); w32(b, 0)
    })
    rec(globals, 0xFC, body { b =>
      w32(b, 1); w32(b, 1)
      w16(b, 1); b.write(0x08) // cch=1, compressed, rich flag set
      w16(b, 100)              // declares 100 runs (400 bytes) — absent
      b.write('a')
    })
    rec(globals, 0x0A, Array.emptyByteArray)
    val e = intercept[IllegalArgumentException] {
      sources.Xls.parse(cfbMini(globals.toByteArray))
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("a non-Excel payload fails loudly naming both formats") {
    val e = intercept[IllegalArgumentException] {
      sources.Xlsx.parse("plain,csv\n1,2\n".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains(".xlsx") && e.getMessage.contains(".xls"))
  }
}

/** Shared BIFF8/CFB fixture builders: a minimal [MS-CFB] + [MS-XLS]
  * writer producing REAL compound files (no Excel ships here), used by
  * [[XlsSpec]] (behavior pins) and [[FuzzSpec]] (mutation fuzzing of
  * the same valid baselines).
  */
private[graft] object XlsFixture {

  // ── little-endian emitters ───────────────────────────────────────
  def w16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  def w32(o: ByteArrayOutputStream, v: Int): Unit = {
    w16(o, v & 0xffff); w16(o, (v >> 16) & 0xffff)
  }
  def rec(o: ByteArrayOutputStream, op: Int,
      body: Array[Byte]): Unit = {
    w16(o, op); w16(o, body.length); o.write(body)
  }
  def body(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val b = new ByteArrayOutputStream(); f(b); b.toByteArray
  }
  def f64b(o: ByteArrayOutputStream, d: Double): Unit = {
    var bits = java.lang.Double.doubleToLongBits(d)
    for (_ <- 0 until 8) { o.write((bits & 0xff).toInt); bits >>= 8 }
  }

  /** The BIFF8 `Workbook` stream: globals (BOF, BoundSheet8, SST, EOF)
    * + one worksheet substream exercising every cell record the reader
    * handles. The SST deliberately splits its third string across a
    * CONTINUE boundary, switching it from compressed to UTF-16 in the
    * continuation fragment.
    */
  def biffStream(): Array[Byte] = {
    // ── sheet substream first (to learn its length-independent layout
    // we assemble globals with a placeholder, then patch lbPlyPos)
    val sheet = new ByteArrayOutputStream()
    rec(sheet, 0x809, body { b => // BOF: worksheet
      w16(b, 0x0600); w16(b, 0x0010); w16(b, 0); w16(b, 0)
      w32(b, 0); w32(b, 0)
    })
    def cellHead(b: ByteArrayOutputStream, rw: Int, c: Int): Unit = {
      w16(b, rw); w16(b, c); w16(b, 0) // ixfe
    }
    // row 0: headers from the SST (strings 0 and 1)
    rec(sheet, 0xFD, body { b => cellHead(b, 0, 0); w32(b, 0) })
    rec(sheet, 0xFD, body { b => cellHead(b, 0, 1); w32(b, 1) })
    // row 1: the CONTINUE-split string + a NUMBER
    rec(sheet, 0xFD, body { b => cellHead(b, 1, 0); w32(b, 2) })
    rec(sheet, 0x203, body { b => cellHead(b, 1, 1); f64b(b, 12.5) })
    // row 2: RK int flavor (300 << 2 | 0x02) and RK ×1/100 of int 1234
    rec(sheet, 0x27E, body { b =>
      cellHead(b, 2, 0); w32(b, (300 << 2) | 0x02)
    })
    rec(sheet, 0x27E, body { b =>
      cellHead(b, 2, 1); w32(b, (1234 << 2) | 0x03)
    })
    // row 3: MULRK covering cols 0-1 (ints 7 and 8)
    rec(sheet, 0xBD, body { b =>
      w16(b, 3); w16(b, 0)
      w16(b, 0); w32(b, (7 << 2) | 0x02)
      w16(b, 0); w32(b, (8 << 2) | 0x02)
      w16(b, 1)
    })
    // row 4: BOOLERR true + FORMULA with cached numeric 99
    rec(sheet, 0x205, body { b =>
      cellHead(b, 4, 0); b.write(1); b.write(0)
    })
    rec(sheet, 0x06, body { b =>
      cellHead(b, 4, 1); f64b(b, 99.0); w16(b, 0); w32(b, 0); w16(b, 0)
    })
    // row 5: FORMULA with cached STRING result ("calc")
    rec(sheet, 0x06, body { b =>
      cellHead(b, 5, 0)
      b.write(0); b.write(0); w32(b, 0); w16(b, 0xFFFF) // string marker
      w16(b, 0); w32(b, 0); w16(b, 0)
    })
    rec(sheet, 0x207, body { b => // STRING: cch, grbit=0, "calc"
      w16(b, 4); b.write(0); b.write("calc".getBytes("ISO-8859-1"))
    })
    rec(sheet, 0x0A, Array.emptyByteArray) // EOF
    val sheetBytes = sheet.toByteArray

    // ── globals; SST strings: "name" (compressed), "wert" (UTF-16),
    // and a long compressed string split across a CONTINUE that
    // re-states grbit and SWITCHES to UTF-16 for the remainder
    val longA = "alpha-" * 3 // 18 chars in the SST record...
    val longB = "Ω-omega"    // ...7 more in the CONTINUE, UTF-16
    val split = longA + longB
    val globals = new ByteArrayOutputStream()
    rec(globals, 0x809, body { b => // BOF: workbook globals
      w16(b, 0x0600); w16(b, 0x0005); w16(b, 0); w16(b, 0)
      w32(b, 0); w32(b, 0)
    })
    val boundsheetAt = globals.size()
    rec(globals, 0x85, body { b =>
      w32(b, 0) // lbPlyPos — patched below
      w16(b, 0) // visible, worksheet
      b.write(6); b.write(0) // cch, grbit compressed
      b.write("Sheet1".getBytes("ISO-8859-1"))
    })
    rec(globals, 0xFC, body { b => // SST holding strings 0-2 (truncated)
      w32(b, 3); w32(b, 3)
      w16(b, 4); b.write(0); b.write("name".getBytes("ISO-8859-1"))
      w16(b, 4); b.write(1)
      b.write("wert".getBytes("UTF-16LE"))
      w16(b, split.length); b.write(0) // full cch, compressed so far
      b.write(longA.getBytes("ISO-8859-1")) // record ENDS mid-string
    })
    rec(globals, 0x3C, body { b => // CONTINUE: re-stated grbit, UTF-16
      b.write(1)
      b.write(longB.getBytes("UTF-16LE"))
    })
    rec(globals, 0x0A, Array.emptyByteArray) // EOF
    val g = globals.toByteArray
    // patch BoundSheet8.lbPlyPos = offset of the sheet BOF
    val pos = g.length
    g(boundsheetAt + 4) = (pos & 0xff).toByte
    g(boundsheetAt + 5) = ((pos >> 8) & 0xff).toByte
    g(boundsheetAt + 6) = ((pos >> 16) & 0xff).toByte
    g(boundsheetAt + 7) = ((pos >> 24) & 0xff).toByte
    g ++ sheetBytes
  }

  // ── minimal [MS-CFB] writer ──────────────────────────────────────
  val End = 0xFFFFFFFE
  val Free = 0xFFFFFFFF
  val FatSect = 0xFFFFFFFD

  def dirEntry(name: String, typ: Int, start: Int,
      size: Int): Array[Byte] = body { b =>
    val n = name.getBytes("UTF-16LE")
    b.write(n); b.write(new Array[Byte](64 - n.length))
    w16(b, n.length + 2) // name length incl terminator
    b.write(typ); b.write(1) // colour
    w32(b, Free); w32(b, Free); w32(b, Free) // siblings/child
    b.write(new Array[Byte](36)) // clsid + state + timestamps
    w32(b, start); w32(b, size); w32(b, 0)
  }

  def header(nFat: Int, dirStart: Int, miniFatStart: Int,
      nMiniFat: Int, fatSectors: Seq[Int]): Array[Byte] = body { b =>
    b.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    b.write(new Array[Byte](16)) // clsid
    w16(b, 0x3E); w16(b, 3) // minor, major (v3: 512-byte sectors)
    w16(b, 0xFFFE) // little-endian
    w16(b, 9); w16(b, 6) // sector, mini shifts
    b.write(new Array[Byte](6))
    w32(b, 0) // nDirSectors (v3: 0)
    w32(b, nFat)
    w32(b, dirStart)
    w32(b, 0) // transaction
    w32(b, 4096) // mini cutoff
    w32(b, miniFatStart); w32(b, nMiniFat)
    w32(b, End); w32(b, 0) // DIFAT chain: none
    for (i <- 0 until 109) w32(b, fatSectors.lift(i).getOrElse(Free))
  }

  def pad(b: Array[Byte], unit: Int): Array[Byte] =
    b ++ new Array[Byte]((unit - b.length % unit) % unit)

  /** CFB with the Workbook stream in the MINI chain (size < 4096). */
  def cfbMini(stream: Array[Byte]): Array[Byte] = {
    require(stream.length < 4096)
    val mini = pad(stream, 64)
    val nMini = mini.length / 64
    val miniData = pad(mini, 512)
    val nMiniSectors = miniData.length / 512
    // sectors: 0 FAT, 1 dir, 2 miniFAT, 3.. ministream
    val fat = body { b =>
      w32(b, FatSect); w32(b, End); w32(b, End)
      for (i <- 0 until nMiniSectors)
        w32(b, if (i == nMiniSectors - 1) End else 4 + i)
      for (_ <- 3 + nMiniSectors until 128) w32(b, Free)
    }
    val dir = pad(dirEntry("Root Entry", 5, 3, mini.length) ++
      dirEntry("Workbook", 2, 0, stream.length), 512)
    val miniFat = body { b =>
      for (i <- 0 until nMini) w32(b, if (i == nMini - 1) End else i + 1)
      for (_ <- nMini until 128) w32(b, Free)
    }
    header(1, 1, 2, 1, Seq(0)) ++ fat ++ dir ++ miniFat ++ miniData
  }

  /** CFB with the stream padded into the NORMAL 512-byte chain. */
  def cfbBig(stream0: Array[Byte]): Array[Byte] = {
    val stream = pad(stream0 ++ new Array[Byte](
      math.max(0, 4096 - stream0.length)), 512)
    val n = stream.length / 512
    val fat = body { b =>
      w32(b, FatSect); w32(b, End) // fat, dir
      for (i <- 0 until n) w32(b, if (i == n - 1) End else 3 + i)
      for (_ <- 2 + n until 128) w32(b, Free)
    }
    val dir = pad(dirEntry("Root Entry", 5, End, 0) ++
      dirEntry("Workbook", 2, 2, stream.length), 512)
    header(1, 1, End, 0, Seq(0)) ++ fat ++ dir ++ stream
  }

  /** v4 header: major version 4, sector shift 12 (4096-byte sectors).
    * Per [MS-CFB] 2.2 the header occupies one full sector, so the
    * 512-byte header body is zero-padded to 4096.
    */
  def headerV4(nFat: Int, dirStart: Int,
      fatSectors: Seq[Int]): Array[Byte] = pad(body { b =>
    b.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    b.write(new Array[Byte](16)) // clsid
    w16(b, 0x3E); w16(b, 4) // minor, major (v4: 4096-byte sectors)
    w16(b, 0xFFFE) // little-endian
    w16(b, 12); w16(b, 6) // sector, mini shifts
    b.write(new Array[Byte](6))
    w32(b, 1) // nDirSectors (v4 records the count; v3 writes 0)
    w32(b, nFat)
    w32(b, dirStart)
    w32(b, 0) // transaction
    w32(b, 4096) // mini cutoff
    w32(b, End); w32(b, 0) // mini FAT: none
    w32(b, End); w32(b, 0) // DIFAT chain: none
    for (i <- 0 until 109) w32(b, fatSectors.lift(i).getOrElse(Free))
  }, 4096)

  /** CFB v4 (4096-byte sectors, the branch `Xls.cfbStream` accepts at
    * sector shift 12) with the stream padded into the normal chain —
    * one FAT sector here indexes 1024 entries, so the same builder
    * shape as [[cfbBig]] at the wider sector size.
    */
  def cfbV4(stream0: Array[Byte]): Array[Byte] = {
    val S = 4096
    val stream = pad(stream0 ++ new Array[Byte](
      math.max(0, S - stream0.length)), S)
    val n = stream.length / S
    val fat = pad(body { b =>
      w32(b, FatSect); w32(b, End) // fat(0), dir(1)
      for (i <- 0 until n) w32(b, if (i == n - 1) End else 3 + i)
      for (_ <- 2 + n until S / 4) w32(b, Free)
    }, S)
    val dir = pad(dirEntry("Root Entry", 5, End, 0) ++
      dirEntry("Workbook", 2, 2, stream.length), S)
    headerV4(1, 1, Seq(0)) ++ fat ++ dir ++ stream
  }

}
