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
}
