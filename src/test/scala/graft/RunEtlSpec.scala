package graft

import java.nio.file.Files

/** End-to-end pin for Graft.runEtl: the nightly-run analog must stage all
  * three tables, build the warehouse (with stale-table GC), render both
  * report artifacts, and be idempotent on rerun — the reference's daily
  * full-rebuild contract.
  */
class RunEtlSpec extends SparkSpec {

  test("runEtl stages, syncs, renders, and reruns cleanly") {
    val out = Files.createTempDirectory("etl").toString
    // a stale managed table that the warehouse sync must GC; a crashed
    // prior run can leave the location behind with no catalog entry
    // (in-memory catalog, on-disk warehouse), so clear both
    spark.sql("DROP TABLE IF EXISTS graft_stale_tmp")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_stale_tmp")
    if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    spark.range(3).write.saveAsTable("graft_stale_tmp")

    val manifest = Graft.runEtl(spark, sf, out).collect()
    assert(manifest.map(_.getString(0)).toSeq ==
      Seq("analytics_accounting_report", "dim_calendar", "fact_loan"))
    manifest.foreach(r => assert(r.getLong(2) > 0, r.toString))

    // warehouse: staged tables queryable, stale table gone
    assert(spark.table("fact_loan").count() ==
      manifest.find(_.getString(0) == "fact_loan").get.getLong(2))
    assert(!spark.catalog.tableExists("graft_stale_tmp"))

    // report artifacts render
    assert(new java.io.File(s"$out/accounting_report.xlsx").length() > 0)
    assert(new java.io.File(s"$out/accounting_report_sheet.json").length() > 0)

    // idempotent daily rerun: same manifest
    val again = Graft.runEtl(spark, sf, out).collect()
    assert(again.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      manifest.map(r => (r.getString(0), r.getLong(2))).toSeq)

    // each nightly run published a retained report snapshot (S14)
    val snapRoot = s"$out/report_snapshots"
    assert(graft.sources.Sinks.currentVersion(spark, snapRoot)
      .contains(2L))
    assert(Graft.readLatestSnapshot(spark, snapRoot).count() ==
      manifest.find(_.getString(0) == "analytics_accounting_report")
        .get.getLong(2))
  }
}
