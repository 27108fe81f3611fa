package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Pins the [[GraftExtensions.ensureInstalled]] gate: a session carrying
  * the complete set of OUR registrations is left untouched, while a
  * dropped entry or a foreign same-name registration of ANY of them
  * triggers the full re-install (per-function check, not a sentinel —
  * a foreign `dot_long` must never silently feed the cosine paths).
  * Every mutation is restored in a finally so a failing assertion can't
  * poison the suites sharing this session.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def registry = spark.sessionState.functionRegistry
  private def lookup(name: String) =
    registry.lookupFunction(FunctionIdentifier(name))

  test("ensureInstalled registers the full function set") {
    GraftExtensions.ensureInstalled(spark)
    for (n <- Seq("sum_weighted_entries", "dot_long", "minhash_sigs",
        "kmv_sketch", "bloom_filter_agg"))
      assert(lookup(n).exists(_.getSource == "built-in"), n)
  }

  test("a DROPPED function is restored on the next ensureInstalled — " +
      "the gate checks every function, not a sentinel") {
    GraftExtensions.ensureInstalled(spark)
    try {
      registry.dropFunction(FunctionIdentifier("dot_long"))
      assert(lookup("dot_long").isEmpty)
      GraftExtensions.ensureInstalled(spark)
      assert(lookup("dot_long").exists(_.getSource == "built-in"),
        "ensureInstalled must repair a partially-dropped registry")
    } finally GraftExtensions.install(spark)
  }

  test("a FOREIGN same-name registration of any function is reclaimed, " +
      "not silently used") {
    GraftExtensions.ensureInstalled(spark)
    try {
      // spark.udf.register stamps a non-"built-in" source
      spark.udf.register("dot_long", (a: Seq[Long], b: Seq[Long]) => 0L)
      assert(lookup("dot_long").exists(_.getSource != "built-in"))
      GraftExtensions.ensureInstalled(spark)
      assert(lookup("dot_long").exists(_.getSource == "built-in"),
        "a foreign dot_long would compute wrong rescoring with no error")
    } finally GraftExtensions.install(spark)
  }
}
