package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.concurrent.{Callable, Executors, TimeUnit, TimeoutException}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalacheck.Gen

/** Mutation fuzzer for the hand-written binary parsers — the S4 Excel
  * pair (`.xls` CFB/BIFF8, `.xlsx` zip/XML) and, since r12, the two
  * media codecs behind the mm family (BMP, RIFF/WAVE): random
  * truncations, bit flips, and byte splices of VALID fixtures,
  * asserting the untrusted-input contract — every outcome is either a
  * successful parse or an `IllegalArgumentException`, never any other
  * crash, never a hang, never an allocation bomb. The r9 hardening closed two known
  * malformed shapes (SST odd split, rich-block overrun); this closes
  * the CLASS: any unchecked exception, unbounded loop, or
  * corrupted-length-field allocation a mutation can reach fails here.
  *
  * Mutations are ScalaCheck-generated; each case runs on a worker
  * thread with a wall-clock cap so an accidental infinite loop fails
  * the suite instead of wedging it.
  */
class FuzzSpec extends SparkSpec {

  private val CasesPerBase = 500

  // ── valid baselines ────────────────────────────────────────────────
  private lazy val xlsMini = XlsFixture.cfbMini(XlsFixture.biffStream())
  private lazy val xlsBig = XlsFixture.cfbBig(XlsFixture.biffStream())
  private lazy val xlsV4 = XlsFixture.cfbV4(XlsFixture.biffStream())

  private lazy val xlsxBytes: Array[Byte] = {
    def part(body: String) = body.getBytes("UTF-8")
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="inlineStr"><is><t>inline</t></is></c></row>""" +
        """<row r="3"><c r="A3"><v>12.5</v></c><c r="B3" t="s"><v>2</v></c></row>""" +
        """</sheetData></worksheet>"""
    val shared =
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>id</t></si><si><t>name</t></si><si><t>x&amp;y</t></si></sst>"""
    val wb =
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val rels =
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    for ((n, b) <- Seq("xl/workbook.xml" -> wb,
        "xl/_rels/workbook.xml.rels" -> rels,
        "xl/sharedStrings.xml" -> shared,
        "xl/worksheets/sheet1.xml" -> sheet)) {
      z.putNextEntry(new ZipEntry(n)); z.write(part(b)); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  // ── mutators ───────────────────────────────────────────────────────
  private def truncate(base: Array[Byte]): Gen[Array[Byte]] =
    Gen.chooseNum(0, base.length - 1).map(base.take)

  private def bitFlips(base: Array[Byte]): Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(1, 8)
    offs <- Gen.listOfN(n, Gen.chooseNum(0, base.length - 1))
    bits <- Gen.listOfN(n, Gen.chooseNum(0, 7))
  } yield {
    val b = base.clone()
    offs.zip(bits).foreach { case (o, k) =>
      b(o) = (b(o) ^ (1 << k)).toByte
    }
    b
  }

  private def splice(base: Array[Byte]): Gen[Array[Byte]] = for {
    at <- Gen.chooseNum(0, base.length - 1)
    len <- Gen.chooseNum(1, math.min(64, base.length - at))
    junk <- Gen.listOfN(len, Gen.chooseNum(0, 255))
  } yield {
    val b = base.clone()
    var i = 0
    while (i < len) { b(at + i) = junk(i).toByte; i += 1 }
    b
  }

  private def mutant(base: Array[Byte]): Gen[Array[Byte]] =
    Gen.frequency(2 -> truncate(base), 5 -> bitFlips(base),
      3 -> splice(base))

  // ── the contract ───────────────────────────────────────────────────
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "fuzz-parse"); t.setDaemon(true); t
  }

  /** Parse on a worker with a wall cap; returns a failure description,
    * or None when the outcome honors the contract.
    */
  private def check(parse: Array[Byte] => Any)(bytes: Array[Byte])
      : Option[String] = {
    val fut = pool.submit(new Callable[Option[String]] {
      def call(): Option[String] =
        try { parse(bytes); None }
        catch {
          case _: IllegalArgumentException => None
          case e: Throwable => Some(s"unexpected ${e.getClass.getName}: $e")
        }
    })
    try fut.get(30, TimeUnit.SECONDS)
    catch {
      case _: TimeoutException =>
        fut.cancel(true)
        Some("parser hung (>30s wall)")
    }
  }

  private def fuzz(label: String, base: Array[Byte],
      parse: Array[Byte] => Any = sources.Xlsx.parse): Unit = {
    // warm the parse path so per-case timing is steady-state
    parse(base)
    val cases = Gen.listOfN(CasesPerBase, mutant(base)).sample.get
    val failures = cases.zipWithIndex.flatMap { case (bytes, i) =>
      check(parse)(bytes).map { why =>
        // persist the reproducer before failing
        val f = java.io.File.createTempFile(s"fuzz_${label}_$i", ".bin")
        val o = new FileOutputStream(f)
        o.write(bytes); o.close()
        s"$label case $i: $why (reproducer: $f)"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test(s"xls (mini-chain CFB): $CasesPerBase mutations — every outcome " +
      "is a parse or IllegalArgumentException, never a hang") {
    fuzz("xls_mini", xlsMini)
  }

  test(s"xls (FAT-chain CFB): $CasesPerBase mutations — every outcome " +
      "is a parse or IllegalArgumentException, never a hang") {
    fuzz("xls_big", xlsBig)
  }

  test(s"xls (v4 CFB, 4096-byte sectors): $CasesPerBase mutations — " +
      "every outcome is a parse or IllegalArgumentException, never a " +
      "hang") {
    // the sector-shift-12 branch accepted at Xls.cfbStream was hardened
    // but never fuzzed before r11 — wider sectors mean every FAT/DIFAT
    // offset computation runs at 8× the v3 stride
    fuzz("xls_v4", xlsV4)
  }

  test(s"xlsx (zip/XML): $CasesPerBase mutations — every outcome is a " +
      "parse or IllegalArgumentException, never a hang") {
    fuzz("xlsx", xlsxBytes)
  }

  // the mm-family media codecs get the same treatment (r11 verdict #2)

  private lazy val bmpBytes = sources.Bmp.encode24(32, 32,
    graft.operators.Multimodal.grayPlane(
      "fuzz corpus document".getBytes("UTF-8")))

  private lazy val wavBytes = sources.Wav.encodePcm32(
    "fuzz corpus document with enough samples to matter"
      .codePoints().toArray.map(_.toLong))

  private lazy val pngBytes = sources.Png.encodeGray(32, 32,
    graft.operators.Multimodal.grayPlane(
      "fuzz corpus document".getBytes("UTF-8")))

  test(s"bmp (DIB container): $CasesPerBase mutations — every outcome " +
      "is a parse or IllegalArgumentException, never a hang") {
    fuzz("bmp", bmpBytes, sources.Bmp.decode)
  }

  test(s"png (zlib/chunk container): $CasesPerBase mutations — every " +
      "outcome is a parse or IllegalArgumentException, never a hang") {
    fuzz("png", pngBytes, sources.Png.decode)
  }

  test(s"wav (RIFF/PCM): $CasesPerBase mutations — every outcome is a " +
      "parse or IllegalArgumentException, never a hang") {
    fuzz("wav", wavBytes, sources.Wav.decode)
  }
}
