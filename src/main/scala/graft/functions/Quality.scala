package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checking — the capability the reference lists
  * as a known gap ("no data-quality checks",
  * `/root/reference/README.md:183-185`, with "add data validation" in its
  * future-improvements list). Constraints evaluate as one distributed
  * aggregation pass over the table (one row out per constraint), so a
  * 100 TB table costs one scan regardless of how many rules run.
  */
object Quality {

  /** One named rule: `violations` counts rows breaking the constraint. */
  final case class Rule(name: String, violations: Column)

  def notNull(c: String): Rule =
    Rule(s"not_null($c)", count(when(col(c).isNull, 1)))

  def unique(c: String): Rule =
    Rule(s"unique($c)",
      (count(col(c)) - count_distinct(col(c))).cast("bigint"))

  def nonNegative(c: String): Rule =
    Rule(s"non_negative($c)", count(when(col(c) < 0, 1)))

  def inSet(c: String, allowed: Seq[Any]): Rule =
    Rule(s"in_set($c)",
      count(when(!col(c).isin(allowed: _*) || col(c).isNull, 1)))

  /** Evaluate all rules in one aggregation; returns (rule, violations,
    * passed) rows, deterministic order.
    *
    * Built entirely from Columns — rule names ride as LITERALS and the
    * aggregate columns get positional internal aliases, so a column
    * name containing quotes/backticks can't break a spliced SQL text
    * and duplicate rule names (the same check applied twice) simply
    * emit two rows instead of colliding on an alias.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Quality.check requires at least one rule")
    val aliased = rules.zipWithIndex.map { case (r, i) =>
      r.violations.cast("bigint").as(s"__v$i")
    }
    val agg = df.agg(aliased.head, aliased.tail: _*)
    val pairs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__v$i").as("violations"))
    }
    agg.select(explode(array(pairs: _*)).as("rv"))
      .select(col("rv.rule").as("rule"),
        col("rv.violations").as("violations"))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("rule")
  }

  /** Schema-contract check: diff a frame's actual schema against the
    * expected one. Pure metadata (no job runs) — the gate an ingest
    * pipeline applies BEFORE paying a scan, catching upstream drift
    * (renamed/retyped/dropped columns) at plan time. Returns
    * human-readable violations; empty means the contract holds.
    * Extra columns are reported but usually tolerated by the caller
    * (widening is backward-compatible); missing or retyped ones are
    * the hard failures.
    */
  def schemaDiff(df: DataFrame,
      expected: org.apache.spark.sql.types.StructType): Seq[String] = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val exp = expected.map(f => f.name -> f.dataType).toMap
    val missing = expected.collect {
      case f if !actual.contains(f.name) => s"missing column: ${f.name}"
    }
    val retyped = expected.collect {
      case f if actual.get(f.name).exists(_ != f.dataType) =>
        s"type mismatch: ${f.name} expected ${f.dataType.simpleString} " +
          s"got ${actual(f.name).simpleString}"
    }
    val extra = df.schema.collect {
      case f if !exp.contains(f.name) => s"unexpected column: ${f.name}"
    }
    missing ++ retyped ++ extra
  }
}
