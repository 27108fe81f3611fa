package graft

import graft.functions.DotLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions: custom Catalyst functions, installable either at
  * session build time (`.config("spark.sql.extensions",
  * "graft.GraftExtensions")`) or retro-fitted onto an existing session with
  * [[GraftExtensions.install]] — the driver owns the sessions handed to
  * `SparkEntry.queries`, so operators call `install` defensively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotLong)
}

object GraftExtensions {
  private val dotLong: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_long"),
    new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
    (args: Seq[Expression]) => DotLong(args(0), args(1)))

  /** Idempotent runtime registration for sessions built without the
    * extensions config.
    */
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      dotLong._1.funcName, dotLong._3, "built-in")
}
