package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Excel scan (S4): the reference ingests xlsx routinely
  * (`/root/reference/utils/gsheets_utils.py:177-181`, pandas
  * `read_excel`). No xlsx library ships in this environment, so this is a
  * minimal self-contained reader for the public OOXML SpreadsheetML
  * format (ECMA-376): an xlsx file is a zip whose first worksheet lives
  * at `xl/worksheets/sheet1.xml` with strings interned in
  * `xl/sharedStrings.xml`.
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
                nextCol = curCol + 1
                curVal = null
              case "v" => curVal = r.getElementText
              case "t" if curType == "inlineStr" => curVal = r.getElementText
              case _ =>
            }
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "c" =>
                val resolved =
                  if (curVal == null) null
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

  /** Workbook bytes → first worksheet as rows of nullable strings. */
  private[graft] def parse(bytes: Array[Byte]): Vector[Vector[String]] = {
    var shared: Array[Byte] = null
    var sheets = List.empty[(String, Array[Byte])]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        e.getName match {
          case "xl/sharedStrings.xml" => shared = zin.readAllBytes()
          case n if n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml") =>
            sheets ::= (n, zin.readAllBytes())
          case _ =>
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    val sheet = sheets.sortBy(_._1).headOption.getOrElse(
      throw new IllegalArgumentException("not an xlsx: no xl/worksheets/"))
    val strings = if (shared == null) Vector.empty[String]
      else parseShared(shared)
    parseSheet(sheet._2, strings)
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
}
