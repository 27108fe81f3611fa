package graft

/** S1 JDBC source against embedded Derby (in-memory, same JVM — the only
  * JDBC database available offline; the jar ships with Spark).
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val seeded: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE loans(id INT, amount DOUBLE, status VARCHAR(8))")
      st.execute("INSERT INTO loans VALUES (1, 10.5, 'F'), (2, 20.0, 'O')" +
        ", (3, 7.25, 'F'), (4, 99.0, 'P')")
      st.close()
    } finally conn.close()
  }

  test("readQuery ships the ad-hoc SQL to the database") {
    seeded
    val df = sources.Jdbc.readQuery(spark, url,
      "SELECT id, amount FROM loans WHERE status = 'F'", opts)
    assert(df.columns.toSeq.map(_.toLowerCase) == Seq("id", "amount"))
    assert(df.collect().map(r => (r.getInt(0), r.getDouble(1))).toSet ==
      Set((1, 10.5), (3, 7.25)))
  }

  test("readTable fans out into partitioned range scans") {
    seeded
    val df = sources.Jdbc.readTable(spark, url, "loans",
      opts ++ Map("partitionColumn" -> "id", "lowerBound" -> "1",
        "upperBound" -> "5", "numPartitions" -> "2"))
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 4)
  }

  test("filters declared on a table read push into the generated SQL") {
    seeded
    val df = sources.Jdbc.readTable(spark, url, "loans", opts)
      .filter("status = 'O'").select("id")
    // JDBCRelation advertises the pushed filter (Derby uppercases names)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(STATUS,O)"), plan.take(1500))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2))
  }
}
