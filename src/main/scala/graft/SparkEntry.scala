package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every engine capability is a [[QueryDef]] registered by its module;
  * this object is just the aggregation point the driver calls into.
  */
object SparkEntry {
  private def registry: Map[String, QueryDef] =
    operators.RelationalQueries.defs ++
      operators.LoanQueries.defs ++
      operators.CalendarQueries.defs ++
      operators.TextQueries.defs ++
      operators.DedupQueries.defs ++
      operators.SimilarityQueries.defs ++
      operators.PqQueries.defs ++
      operators.SrpQueries.defs ++
      operators.BpeQueries.defs ++
      operators.UnigramQueries.defs ++
      operators.EventQueries.defs ++
      operators.ReportingQueries.defs ++
      operators.PipelineQueries.defs ++
      operators.GraphQueries.defs ++
      operators.MultimodalQueries.defs ++
      streaming.StreamingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.LoanDetail.pipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }
}
