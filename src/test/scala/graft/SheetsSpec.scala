package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.Sheets

/** S12 engine half: the rendered ValueRange payload must carry the frame
  * faithfully — header row, typed numeric cells, empty-string NULLs —
  * and refuse over-cap frames.
  */
class SheetsSpec extends SparkSpec {

  private def frame = {
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("amount", DoubleType),
      StructField("n", LongType),
      StructField("flag", BooleanType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("a", 1.5, 10L, true),
        Row(null, null, 2L, false),
        Row("c", Double.NaN, null, null)),
      schema)
  }

  test("payload: header, types, nulls, NaN") {
    val tree = new ObjectMapper().readTree(Sheets.payload(frame, "Report"))
    assert(tree.get("range").asText() == "'Report'!A1")
    assert(tree.get("majorDimension").asText() == "ROWS")
    val values = tree.get("values")
    assert(values.size() == 4) // header + 3 rows
    val header = values.get(0)
    assert((0 until 4).map(header.get(_).asText()) ==
      Seq("name", "amount", "n", "flag"))
    val r0 = values.get(1)
    assert(r0.get(0).asText() == "a")
    assert(r0.get(1).isNumber && r0.get(1).asDouble() == 1.5)
    assert(r0.get(2).isNumber && r0.get(2).asLong() == 10L)
    assert(r0.get(3).isBoolean && r0.get(3).asBoolean())
    val r1 = values.get(2)
    assert(r1.get(0).isTextual && r1.get(0).asText() == "") // NULL cell
    assert(r1.get(1).asText() == "")
    val r2 = values.get(3)
    assert(r2.get(1).isTextual && r2.get(1).asText() == "NaN")
    assert(r2.get(3).asText() == "")
  }

  test("apostrophes in the tab name escape by doubling (A1 notation)") {
    val tree = new ObjectMapper()
      .readTree(Sheets.payload(frame, "Bob's Report"))
    assert(tree.get("range").asText() == "'Bob''s Report'!A1")
  }

  test("write: file lands and reparses; over-cap frames are refused") {
    val p = java.nio.file.Files.createTempFile("sheet", ".json")
    Sheets.write(frame, p.toString, "T")
    val tree = new ObjectMapper().readTree(p.toFile)
    assert(tree.get("values").size() == 4)
    java.nio.file.Files.delete(p)

    val big = spark.range(Sheets.MaxCells + 1).toDF("id")
    val e = intercept[IllegalArgumentException](Sheets.payload(big, "T"))
    assert(e.getMessage.contains("cell cap"))
  }
}
