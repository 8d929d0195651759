package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions._

/** Engine extension point: registers graft's native Catalyst
  * expressions into the session's FunctionRegistry so they are callable
  * from SQL and `expr(...)`/`call_function`. Installed by setting
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession does
  * this); user applications embedding the library get the same
  * functions with zero code changes — the idiomatic Spark mechanism for
  * shipping engine extensions (vs. session-local UDF registration,
  * which isn't visible to SQL-only callers).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register(ext: SparkSessionExtensions, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      builder))

  /** n-gram width must be a literal — it shapes the plan, not the data. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "vec_dot")(cs => VecDotFloat(cs(0), cs(1)))
    register(ext, "phash_array")(cs => PHashArray(cs.head, mod = 0L))
    register(ext, "phash_mod_array")(cs => PHashArray(cs.head, mod = Hashing.P))
    register(ext, "minhash_sig")(cs => MinHashSig(cs.head))
    register(ext, "simhash32")(cs => SimHash32(cs.head))
    register(ext, "sorted_intersect_count")(cs =>
      SortedIntersectCount(cs(0), cs(1)))
    register(ext, "word_ngrams")(cs =>
      WordNGrams(cs.head, intLit(cs(1), "word_ngrams"), distinct = false))
    register(ext, "word_shingles")(cs =>
      WordNGrams(cs.head, intLit(cs(1), "word_shingles"), distinct = true))
    register(ext, "winnow_mins")(cs =>
      WinnowMins(cs.head, intLit(cs(1), "winnow_mins")))
    register(ext, "span_window_hashes")(cs =>
      SpanWindowHashes(cs.head, intLit(cs(1), "span_window_hashes")))
    register(ext, "span_anchor_positions")(cs =>
      SpanAnchorPositions(cs.head, intLit(cs(1), "span_anchor_positions")))
  }
}
