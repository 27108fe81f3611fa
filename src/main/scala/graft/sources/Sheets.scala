package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ArrayNode

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Google-Sheet sink (S12), engine half: the reference exports report
  * frames to a worksheet tab via gspread's `set_with_dataframe`
  * (`/root/reference/utils/gsheets_utils.py:64-78` — header row from
  * column names, then cell values, NULLs as empty cells). The Sheets
  * REST surface that call wraps is `spreadsheets.values.update` with a
  * `ValueRange` JSON body; this renders EXACTLY that body, so the only
  * thing left outside the engine is the authenticated HTTP PUT (connector
  * tier, like the Drive upload leg of [[Xlsx.write]]).
  *
  * Driver-side single-payload render BY DESIGN, same contract as
  * [[Xlsx.write]]: a worksheet is a human-scale report (Sheets caps a
  * spreadsheet at 10M cells), so the distributed part of the job is the
  * aggregation that produces the small frame, not the render. The cell
  * budget is enforced up front.
  *
  * Cell mapping (mirrors `set_with_dataframe`): numeric/boolean columns
  * keep their JSON type (what the API writes as USER_ENTERED numbers),
  * NULL renders as the empty string (an empty cell), everything else —
  * strings, timestamps, dates — renders as its string form.
  */
object Sheets {

  /** Max cells per spreadsheet, per the published Sheets limit. */
  val MaxCells: Long = 10000000L

  /** Render `df` as a `ValueRange` JSON payload for
    * `spreadsheets.values.update`, targeting `tab` at A1.
    */
  def payload(df: DataFrame, tab: String): String = {
    val nCols = df.columns.length.toLong
    require(nCols > 0, "sheet payload needs at least one column")
    // cheap overflow probe FIRST: count() aggregates partial counts
    // map-side (one scalar per partition crosses the wire), where a
    // take(maxRows + 1) would haul up to the full 10M-cell cap of Row
    // objects onto the driver just to refuse them. Only an under-cap
    // frame is ever collected. (The probe and the collect are separate
    // jobs — cache upstream if the plan is expensive; a
    // non-deterministic frame could in principle disagree between them,
    // so the require after take keeps the guard airtight.)
    val maxRows = (MaxCells / nCols - 1L).min(Int.MaxValue.toLong).toInt
    val probed = df.count()
    require(probed <= maxRows,
      s"sheet payload exceeds the $MaxCells-cell cap at $nCols columns " +
        s"(> $maxRows data rows) — aggregate first or use a parquet sink")
    val rows = df.take(maxRows + 1)
    require(rows.length <= maxRows,
      s"sheet payload exceeds the $MaxCells-cell cap at $nCols columns " +
        s"(> $maxRows data rows) — aggregate first or use a parquet sink")
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    // A1 notation quotes a sheet name with single quotes; embedded
    // apostrophes escape by doubling
    root.put("range", s"'${tab.replace("'", "''")}'!A1")
    root.put("majorDimension", "ROWS")
    val values = root.putArray("values")
    val header = values.addArray()
    df.columns.foreach(header.add)
    val numeric = df.schema.fields.map(_.dataType match {
      case _: NumericType | BooleanType => true
      case _                            => false
    })
    rows.foreach { r =>
      val row = values.addArray()
      r.toSeq.zipWithIndex.foreach { case (v, i) =>
        addCell(row, v, numeric(i))
      }
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def addCell(row: ArrayNode, v: Any, numeric: Boolean): Unit =
    v match {
      case null                 => row.add("")
      // non-finite doubles are not representable as JSON numbers (the
      // API would reject the payload) — string form, as in Xlsx.write
      case d: Double if d.isNaN || d.isInfinite => row.add(d.toString)
      case f: Float if f.isNaN || f.isInfinite  => row.add(f.toString)
      case d: Double if numeric  => row.add(d)
      case f: Float if numeric   => row.add(f)
      case l: Long if numeric    => row.add(l)
      case i: Int if numeric     => row.add(i)
      case s: Short if numeric   => row.add(s)
      case b: Byte if numeric    => row.add(b.toInt)
      case b: Boolean            => row.add(b)
      case d: java.math.BigDecimal if numeric => row.add(d)
      case other                 => row.add(other.toString)
    }

  /** Render and write the payload to a local `path` (the artifact a
    * connector PUTs to `spreadsheets.values.update`).
    */
  def write(df: DataFrame, path: String, tab: String = "Sheet1"): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      payload(df, tab).getBytes("UTF-8"))
}
