package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation over a testdata
  * scale-factor directory plus (when SQL-expressible) an equivalent DuckDB
  * oracle query over the same parquet files. The driver hash-compares the
  * two (see Verify.scala); ops with `oracle = None` get a rows-only check.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  /** DuckDB reads each table directly from its parquet file; queries are
    * written against bare table names, rewritten here to file paths is NOT
    * needed — the driver registers views named after the tables.
    */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
