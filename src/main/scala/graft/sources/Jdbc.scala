package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source (S1): the reference pulls its raw frames from SQL Server
  * over an ODBC connection and an ad-hoc T-SQL string
  * (`/root/reference/utils/fetch_data_utils.py:20-27`,
  * `utils/db_connection.py:34-45`). The Spark-native equivalent is the
  * built-in JDBC relation — the query executes remotely and arrives as a
  * DataFrame, with Catalyst pushing filters/projections declared on top
  * of [[readTable]] down into the generated SQL.
  *
  * Scale note: a bare query/dbtable read is ONE remote cursor on ONE
  * task. For anything big, pass the partitioned-read options
  * (`partitionColumn`, `lowerBound`, `upperBound`, `numPartitions`) so
  * the read fans out into parallel range scans — the JDBC analog of a
  * multi-split file scan.
  */
object Jdbc {

  /** Ad-hoc query read — the `fetch_data(query)` shape. `options` passes
    * through driver class, fetchsize, etc.
    */
  def readQuery(spark: SparkSession, url: String, query: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("query", query)
      .options(options).load()

  /** Whole-table read; unlike `query` this form accepts the partitioned-
    * read options, so it is the entry point for large ingests.
    */
  def readTable(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).load()
}
