package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{NumericType, StringType, StructField, StructType}

/** Excel scan (S4): the reference ingests workbooks routinely
  * (`/root/reference/utils/gsheets_utils.py:177-181`, pandas
  * `read_excel`) — BOTH the 2007+ zip/XML `.xlsx` and the legacy
  * 97-2003 binary `.xls`, which [[parse]] dispatches on file magic
  * (zip → here, OLE2/CFB → [[Xls]]). No xlsx library ships in this
  * environment, so this is a minimal self-contained reader for the
  * public OOXML SpreadsheetML format (ECMA-376): an xlsx file is a zip
  * of XML parts with strings interned in `xl/sharedStrings.xml`. "First worksheet" means the first
  * `<sheet>` in `xl/workbook.xml` resolved through
  * `xl/_rels/workbook.xml.rels` — sheet ORDER is defined by the
  * workbook part, not by part filenames (a workbook whose sheets were
  * reordered or deleted may store its first sheet as `sheet3.xml`);
  * when those parts are absent, fall back to the lowest numeric
  * `sheetN.xml` suffix (`sheet2` before `sheet10`).
  *
  * Distribution shape: files load through Spark's `binaryFile` source and
  * each file is parsed where its bytes land, so a folder of workbooks
  * fans out per-file — the same per-file parallelism as a CSV folder
  * scan. (A single workbook is driver-bounded by the format itself:
  * Excel caps sheets at ~1M rows, so per-file splitting is pointless.)
  *
  * Fidelity contract (same as `spark.read.csv` without inferSchema):
  * every cell surfaces as its raw stored string — numbers as the
  * serialized `<v>` value, booleans as 0/1, dates as Excel serial
  * numbers — and downstream casts pick types. The header row of the
  * first file (lexicographic path order) names the columns; each file's
  * own header row is skipped when `header = true`.
  */
object Xlsx {

  /** "C3" → 2; supports multi-letter columns (AA → 26). */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) =>
      a * 26 + (c.toUpper - 'A' + 1)) - 1

  private def newFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // untrusted input: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f
  }

  /** `xl/sharedStrings.xml` → interned strings; rich-text runs (multiple
    * `<t>` per `<si>`) concatenate, as in the spec.
    */
  private def parseShared(bytes: Array[Byte]): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(bytes))
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => sb.clear()
              case "t"  => sb.append(r.getElementText)
              case _    =>
            }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
            out += sb.toString
          case _ =>
        }
      }
    } finally r.close()
    out.result()
  }

  /** One worksheet → rows of cells (null for gaps), each row padded to its
    * own last column.
    */
  private def parseSheet(bytes: Array[Byte],
      shared: Vector[String]): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var nextCol = 0
    var curCol = 0
    var curType = ""
    var curVal: String = null
    // inlineStr cells can hold several rich-text runs (<is><r><t>a</t></r>
    // <r><t>b</t></r></is>); runs concatenate, same as parseShared.
    val inlineSb = new StringBuilder
    var inlineSeen = false
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(bytes))
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" =>
                cells.clear(); nextCol = 0
              case "c" =>
                val ref = r.getAttributeValue(null, "r")
                curType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
                curCol = if (ref != null) colIndex(ref) else nextCol
                // SpreadsheetML caps columns at XFD (16384); a corrupted
                // ref ("ZZZZZZ1") would otherwise size the row array
                // into the gigabytes (or negative, via overflow)
                require(curCol >= 0 && curCol < 16384,
                  s"cell ref '$ref' out of sheet range")
                nextCol = curCol + 1
                curVal = null
                inlineSb.clear(); inlineSeen = false
              case "v" => curVal = r.getElementText
              case "t" if curType == "inlineStr" =>
                inlineSb.append(r.getElementText); inlineSeen = true
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "c" =>
                val resolved =
                  if (curType == "inlineStr")
                    (if (inlineSeen) inlineSb.toString else null)
                  else if (curVal == null) null
                  else if (curType == "s") shared(curVal.trim.toInt)
                  else curVal
                if (resolved != null) cells += ((curCol, resolved))
              case "row" =>
                val width = cells.map(_._1).maxOption.fold(0)(_ + 1)
                val arr = Array.fill[String](width)(null)
                cells.foreach { case (i, v) => arr(i) = v }
                rows += arr.toVector
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    rows.result()
  }

  private val RelNs =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** `xl/workbook.xml` → the first `<sheet>`'s relationship id. */
  private def firstSheetRelId(wb: Array[Byte]): Option[String] = {
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(wb))
    try {
      while (r.hasNext)
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet")
          return Option(r.getAttributeValue(RelNs, "id"))
      None
    } finally r.close()
  }

  /** `xl/_rels/workbook.xml.rels` → the Target part for a given rel id,
    * resolved to a full zip-entry name (Targets are workbook-relative).
    */
  private def relTarget(rels: Array[Byte], rid: String): Option[String] = {
    val r = newFactory().createXMLStreamReader(new ByteArrayInputStream(rels))
    try {
      while (r.hasNext)
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            r.getAttributeValue(null, "Id") == rid)
          return Option(r.getAttributeValue(null, "Target")).map(t =>
            if (t.startsWith("/")) t.drop(1) else "xl/" + t)
      None
    } finally r.close()
  }

  /** Workbook bytes → first worksheet as rows of nullable strings. Sheet
    * order comes from `xl/workbook.xml` (see class doc); the numeric-
    * suffix fallback covers stripped-down workbooks without one.
    */
  /** Format dispatch — the pandas `read_excel` duality: zip magic →
    * OOXML ([[parseXlsx]]), CFB magic → BIFF8 ([[Xls.parse]]), anything
    * else fails loudly NAMING the format instead of a zip error.
    */
  private[graft] def parse(bytes: Array[Byte]): Vector[Vector[String]] =
    if (Xls.isCfb(bytes)) Xls.parse(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'P'.toByte &&
        bytes(1) == 'K'.toByte)
      // untrusted-input contract (FuzzSpec pins it): a corrupted zip /
      // deflate stream / XML part / shared-string index fails as
      // IllegalArgumentException, never as a raw ZipException,
      // XMLStreamException or out-of-bounds crash
      try parseXlsx(bytes)
      catch {
        case e: IllegalArgumentException => throw e
        case e @ (_: java.io.IOException |
                  _: javax.xml.stream.XMLStreamException |
                  _: NumberFormatException |
                  _: IndexOutOfBoundsException |
                  _: NegativeArraySizeException |
                  _: NoSuchElementException) =>
          throw new IllegalArgumentException(s"malformed .xlsx: $e", e)
      }
    else throw new IllegalArgumentException(
      "not an Excel workbook: expected an OOXML zip (.xlsx) or an " +
        "OLE2/BIFF8 compound file (.xls)")

  private def parseXlsx(bytes: Array[Byte]): Vector[Vector[String]] = {
    val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val n = e.getName
        if (n == "xl/sharedStrings.xml" || n == "xl/workbook.xml" ||
            n == "xl/_rels/workbook.xml.rels" ||
            (n.startsWith("xl/worksheets/") && n.endsWith(".xml")))
          parts(n) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    val declared = for {
      wb     <- parts.get("xl/workbook.xml")
      rels   <- parts.get("xl/_rels/workbook.xml.rels")
      rid    <- firstSheetRelId(wb)
      target <- relTarget(rels, rid)
      if parts.contains(target)
    } yield target
    val numbered = "xl/worksheets/sheet([0-9]+)\\.xml".r
    val fallback = parts.keys.toSeq
      .collect { case n @ numbered(i) => (i.toInt, n) }
      .minByOption(_._1).map(_._2)
      .orElse(parts.keys.filter(_.startsWith("xl/worksheets/")).toSeq
        .sorted.headOption)
    val sheetName = declared.orElse(fallback).getOrElse(
      throw new IllegalArgumentException("not an xlsx: no xl/worksheets/"))
    val strings = parts.get("xl/sharedStrings.xml")
      .map(parseShared).getOrElse(Vector.empty[String])
    parseSheet(parts(sheetName), strings)
  }

  /** Read one xlsx file or a glob of them into a string-typed DataFrame.
    * Width and (with `header = true`) column names come from the first
    * file in path order; unnamed extra columns get `_cN`.
    */
  def read(spark: SparkSession, path: String,
      header: Boolean = true): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val first = files.orderBy("path").limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(s"no files match $path"))
    val firstRows = parse(first.getAs[Array[Byte]]("content"))
    val width = firstRows.map(_.length).maxOption.getOrElse(0)
    val names =
      if (header)
        (0 until width).map(i =>
          firstRows.headOption.flatMap(_.lift(i)).flatMap(Option(_))
            .getOrElse(s"_c$i"))
      else (0 until width).map(i => s"_c$i")
    val schema = StructType(names.map(StructField(_, StringType,
      nullable = true)))
    val skip = if (header) 1 else 0
    val rows = files.select(col("content")).rdd.flatMap { r =>
      parse(r.getAs[Array[Byte]](0)).drop(skip).map { cells =>
        Row.fromSeq((0 until width).map(i =>
          cells.lift(i).flatMap(Option(_)).orNull))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** 2 → "C"; 27 → "AB". */
  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ""
    case c => c.toString
  }

  /** Excel sink (S11's engine half): render a SMALL frame as one xlsx
    * workbook at a local `path` — the reference's export path emits
    * report tables for humans (`gsheets_utils.py:39-78`), and the format
    * itself caps a sheet at 1,048,576 rows, so this is a driver-side
    * single-file render BY DESIGN: aggregate upstream (distributed), then
    * render the small result; the upload-to-Drive leg stays connector
    * tier. Header row from column names; numeric cells write as numbers,
    * everything else as escaped inline strings; NULLs become skipped
    * cells (which [[read]] surfaces back as null — lossless roundtrip).
    */
  def write(df: DataFrame, path: String): Unit = {
    // cap probe BEFORE the collect: count() aggregates partial counts
    // map-side (one scalar per partition crosses the wire), so an
    // oversized frame is refused without ever materializing on the
    // driver — the guard would be useless after an OOM-ing collect.
    // The probe and collect are separate jobs (cache upstream if the
    // plan is expensive); the re-check after the collect keeps the
    // guard airtight if the two runs disagree.
    val probed = df.count()
    require(probed < 1048576,
      s"xlsx sheets cap at 1,048,576 rows incl. header (got $probed" +
        ") — aggregate first or use a parquet sink")
    val rows = df.collect()
    require(rows.length < 1048576,
      s"xlsx sheets cap at 1,048,576 rows incl. header (got ${rows.length}" +
        ") — aggregate first or use a parquet sink")
    val isNum = df.schema.fields.map(_.dataType.isInstanceOf[NumericType])
    val names = df.columns
    def cell(ref: String, v: Any, num: Boolean): String = v match {
      case null => ""
      // NaN/Infinity are not valid SpreadsheetML numeric content (Excel
      // itself cannot represent them as numbers) — write them as inline
      // strings; a downstream cast("double") still round-trips them.
      case x: Double if x.isNaN || x.isInfinite =>
        s"""<c r="$ref" t="inlineStr"><is><t>$x</t></is></c>"""
      case x: Float if x.isNaN || x.isInfinite =>
        s"""<c r="$ref" t="inlineStr"><is><t>$x</t></is></c>"""
      case x if num => s"""<c r="$ref"><v>$x</v></c>"""
      case x =>
        s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(x.toString)}</t></is></c>"""
    }
    val sheet = new StringBuilder(
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    sheet ++= names.zipWithIndex
      .map { case (n, i) => cell(s"${colRef(i)}1", n, num = false) }
      .mkString("<row r=\"1\">", "", "</row>")
    rows.zipWithIndex.foreach { case (r, ri) =>
      sheet ++= names.indices
        .map(i => cell(s"${colRef(i)}${ri + 2}", r.get(i), isNum(i)))
        .mkString(s"""<row r="${ri + 2}">""", "", "</row>")
    }
    sheet ++= "</sheetData></worksheet>"
    val z = new ZipOutputStream(new java.io.FileOutputStream(path))
    try {
      def put(name: String, body: String): Unit = {
        z.putNextEntry(new ZipEntry(name))
        z.write(body.getBytes("UTF-8")); z.closeEntry()
      }
      put("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
          """</Types>""")
      put("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>""")
      put("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
          """</Relationships>""")
      put("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
      put("xl/worksheets/sheet1.xml", sheet.toString)
    } finally z.close()
  }
}
