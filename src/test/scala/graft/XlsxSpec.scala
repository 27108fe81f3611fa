package graft

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** S4 Excel scan: fixtures are written as real SpreadsheetML zips (shared
  * strings, rich text, inline strings, r-ref gaps, skipped rows) so the
  * parser is exercised on the structures Excel/pandas actually emit.
  */
class XlsxSpec extends SparkSpec {

  private def writeXlsx(path: String, sharedXml: String,
      sheetXml: String): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>""")
    if (sharedXml != null) put("xl/sharedStrings.xml", sharedXml)
    put("xl/worksheets/sheet1.xml", sheetXml)
    z.close()
  }

  private def shared(strings: String*): String =
    s"""<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">${
      strings.map(s => s"<si><t>$s</t></si>").mkString}</sst>"""

  private def sheet(rows: String*): String =
    s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>${
      rows.mkString}</sheetData></worksheet>"""

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("xlsx").toString
    writeXlsx(s"$d/a.xlsx",
      shared("id", "name", "amount", "arcus"),
      sheet(
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>""",
        // numeric cells carry no t attribute; B2 is a shared string
        """<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>12.5</v></c></row>""",
        // gap: B3 absent (r-refs jump A3 -> C3); C3 is an inline string
        """<row r="3"><c r="A3"><v>2</v></c><c r="C3" t="inlineStr"><is><t>inline cash</t></is></c></row>"""))
    writeXlsx(s"$d/b.xlsx",
      shared("id", "name", "amount", "stripe"),
      sheet(
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>""",
        """<row r="2"><c r="A2"><v>3</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>7.25</v></c></row>"""))
    d
  }

  test("header row names columns; shared/inline/numeric cells and gaps") {
    val df = sources.Xlsx.read(spark, s"$dir/a.xlsx")
    assert(df.columns.toSeq == Seq("id", "name", "amount"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("1", "arcus", "12.5"),
      ("2", null, "inline cash")))
  }

  test("glob scan unions files, skipping each file's header row") {
    val df = sources.Xlsx.read(spark, s"$dir/*.xlsx")
    assert(df.count() == 3)
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("1", "2", "3"))
  }

  test("write → read roundtrip: numbers, strings, escaping, NULL cells") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a&b <tag>"), Some(12.5)),
      (2L, None, Some(0.25)),
      (3L, Some("plain"), None))
      .toDF("id", "name", "amount")
    val path = s"$dir/out.xlsx"
    sources.Xlsx.write(df, path)
    val back = sources.Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("id", "name", "amount"))
    val rows = back.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("1", "a&b <tag>", "12.5"),
      ("2", null, "0.25"),
      ("3", "plain", null)))
  }

  test("header=false exposes raw rows with positional names") {
    val df = sources.Xlsx.read(spark, s"$dir/b.xlsx", header = false)
    assert(df.columns.toSeq == Seq("_c0", "_c1", "_c2"))
    assert(df.count() == 2) // header row surfaces as data
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("3", "id"))
  }

  private def writeParts(path: String, parts: (String, String)*): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    parts.foreach { case (name, body) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    z.close()
  }

  test("first sheet resolves through workbook.xml, not part filenames") {
    // sheets were deleted/reordered: the workbook's FIRST declared sheet
    // is stored as sheet10.xml, and sheet2.xml (lexicographically and
    // numerically smaller) is a decoy later in the book.
    val p = s"$dir/reordered.xlsx"
    writeParts(p,
      "xl/workbook.xml" ->
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Real" sheetId="7" r:id="rId7"/><sheet name="Decoy" sheetId="2" r:id="rId2"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/><Relationship Id="rId7" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet10.xml"/></Relationships>""",
      "xl/worksheets/sheet2.xml" -> sheet(
        """<row r="1"><c r="A1" t="inlineStr"><is><t>wrong</t></is></c></row>"""),
      "xl/worksheets/sheet10.xml" -> sheet(
        """<row r="1"><c r="A1" t="inlineStr"><is><t>right</t></is></c></row>"""))
    val df = sources.Xlsx.read(spark, p, header = false)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("right"))
  }

  test("fallback without workbook rels sorts by numeric suffix") {
    // sheet2 must win over sheet10 (lexicographic order would pick 10)
    val p = s"$dir/norels.xlsx"
    writeParts(p,
      "xl/worksheets/sheet10.xml" -> sheet(
        """<row r="1"><c r="A1" t="inlineStr"><is><t>ten</t></is></c></row>"""),
      "xl/worksheets/sheet2.xml" -> sheet(
        """<row r="1"><c r="A1" t="inlineStr"><is><t>two</t></is></c></row>"""))
    val df = sources.Xlsx.read(spark, p, header = false)
    assert(df.collect().map(_.getString(0)).toSeq == Seq("two"))
  }

  test("inlineStr rich-text runs concatenate like shared strings") {
    val p = s"$dir/richruns.xlsx"
    writeXlsx(p, null, sheet(
      """<row r="1"><c r="A1" t="inlineStr"><is><r><rPr><b/></rPr><t>bold</t></r><r><t xml:space="preserve"> plain</t></r></is></c><c r="B1" t="inlineStr"><is/></c><c r="C1" t="inlineStr"><is><t>z</t></is></c></row>"""))
    val df = sources.Xlsx.read(spark, p, header = false)
    val row = df.collect().head
    assert(row.getString(0) == "bold plain")
    assert(row.isNullAt(1)) // empty <is/> stays a NULL cell
    assert(row.getString(2) == "z")
  }

  test("non-finite doubles write as inline strings, not <v>NaN</v>") {
    import spark.implicits._
    val df = Seq((1L, Double.NaN), (2L, Double.PositiveInfinity),
      (3L, 2.5)).toDF("id", "x")
    val p = s"$dir/nonfinite.xlsx"
    sources.Xlsx.write(df, p)
    // the sheet part must contain no numeric NaN/Infinity cells
    val zin = new java.util.zip.ZipInputStream(
      new java.io.FileInputStream(p))
    val xml = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .collectFirst { case e if e.getName == "xl/worksheets/sheet1.xml" =>
        new String(zin.readAllBytes(), "UTF-8") }.get
    zin.close()
    assert(!xml.contains("<v>NaN</v>") && !xml.contains("<v>Infinity</v>"))
    // and the values still round-trip through a downstream cast
    val back = sources.Xlsx.read(spark, p)
      .selectExpr("cast(id as long) id", "cast(x as double) x")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(back(0)._2.isNaN)
    assert(back(1)._2.isPosInfinity)
    assert(back(2)._2 == 2.5)
  }

  test("over-cap frame is refused BEFORE any driver materialization") {
    // 1,048,576 data rows + header exceeds the sheet cap; the limit+count
    // probe must refuse it without collecting — collecting a frame this
    // size of Rows onto the driver is exactly the failure mode the guard
    // exists to prevent, so the refusal itself is the evidence the probe
    // ran pre-collect (an OOM/timeout here would be the old behavior)
    val big = spark.range(1048576L).toDF("x")
    val e = intercept[IllegalArgumentException] {
      sources.Xlsx.write(big, s"$dir/overcap.xlsx")
    }
    assert(e.getMessage.contains("cap"))
    assert(!new java.io.File(s"$dir/overcap.xlsx").exists())
  }
}
