package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VecDotFloat

/** Engine extension point: registers graft's native Catalyst
  * expressions into the session's FunctionRegistry so they are callable
  * from SQL and `expr(...)`. Installed by setting
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession does
  * this); user applications embedding the library get the same
  * functions with zero code changes — the idiomatic Spark mechanism for
  * shipping engine extensions (vs. session-local UDF registration,
  * which isn't visible to SQL-only callers).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotFloat].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDotFloat(children(0), children(1))))
  }
}
