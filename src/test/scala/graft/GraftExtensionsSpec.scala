package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Pins the [[GraftExtensions.ensureInstalled]] gate: a session already
  * carrying OUR registrations is left untouched, a session without them
  * (or with a foreign same-name registration) gets the full install.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def registry = spark.sessionState.functionRegistry
  private def lookup(name: String) =
    registry.lookupFunction(FunctionIdentifier(name))

  test("ensureInstalled registers the full function set once and is a " +
      "no-op while the sentinel registration is ours") {
    GraftExtensions.ensureInstalled(spark)
    assert(lookup("sum_weighted_entries").exists(_.getSource == "built-in"))
    assert(lookup("dot_long").exists(_.getSource == "built-in"))

    // prove the second call SKIPS install (not merely that it is
    // harmless): drop a non-sentinel function — if ensureInstalled
    // re-ran install, dot_long would come back
    registry.dropFunction(FunctionIdentifier("dot_long"))
    GraftExtensions.ensureInstalled(spark)
    assert(lookup("dot_long").isEmpty,
      "ensureInstalled must not re-install while the sentinel is ours")

    // restore the full set for the suites sharing this session
    GraftExtensions.install(spark)
    assert(lookup("dot_long").exists(_.getSource == "built-in"))
  }

  test("a foreign same-name registration is replaced, not silently used") {
    GraftExtensions.ensureInstalled(spark)
    // spark.udf.register stamps a non-"built-in" source on the sentinel
    spark.udf.register("sum_weighted_entries",
      (xs: Seq[Long]) => xs.sum)
    assert(lookup("sum_weighted_entries").exists(_.getSource != "built-in"))
    GraftExtensions.ensureInstalled(spark)
    assert(lookup("sum_weighted_entries").exists(_.getSource == "built-in"),
      "ensureInstalled must reclaim the name from a foreign registration")
  }
}
