package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions over the [[Hashing]] kernels. Each
  * participates in whole-stage codegen (`doGenCode` emits a single
  * static call — no interpreted lambda dispatch, no per-element
  * Expression-tree eval), replacing the `transform`/`aggregate`
  * higher-order-function formulations that Catalyst cannot compile.
  * Registered by [[graft.GraftExtensions]]; reachable from SQL and
  * `call_function`.
  */
private[functions] trait ArrayInUnary extends UnaryExpression {
  /** Expected element type of the array argument. */
  def elementType: DataType
  def prettyName: String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == elementType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<${elementType.simpleString}>, got ${other.catalogString}")
  }
}

/** `phash_array(array<string>) -> array<long>` — portable 56-bit hash
  * per element; `mod > 0` folds into Z_mod (`phash_mod_array`). */
case class PHashArray(child: Expression, mod: Long) extends ArrayInUnary {
  override def elementType: DataType = StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = if (mod > 0) "phash_mod_array" else "phash_array"

  override protected def nullSafeEval(a: Any): Any =
    Hashing.phashArray(a.asInstanceOf[ArrayData], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hashing.phashArray($c, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): PHashArray =
    copy(child = newChild)
}

/** `minhash_sig(array<long>) -> array<long>` — K-permutation MinHash
  * signature with the engine's fixed prime constants. */
case class MinHashSig(child: Expression) extends ArrayInUnary {
  override def elementType: DataType = LongType
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    Hashing.minhashSig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hashing.minhashSig($c);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `simhash32(array<long>) -> long` — 32-bit SimHash fingerprint. */
case class SimHash32(child: Expression) extends ArrayInUnary {
  override def elementType: DataType = LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(a: Any): Any =
    Hashing.simhash32(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hashing.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** `sorted_intersect_count(array<long>, array<long>) -> long` —
  * linear-merge intersection size of two sorted arrays. */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint>, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Hashing.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Hashing.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `winnow_mins(array<long>, w) -> array<long>` — sliding-window
  * minima for winnowing fingerprints. */
case class WinnowMins(child: Expression, w: Int) extends ArrayInUnary {
  override def elementType: DataType = LongType
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "winnow_mins"

  override protected def nullSafeEval(a: Any): Any =
    Hashing.winnowMins(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hashing.winnowMins($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

/** `word_ngrams(array<string>, n) -> array<string>` (clipped-tail
  * n-grams, ≥1 gram); `word_shingles` is the distinct variant. */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
  extends ArrayInUnary {
  override def elementType: DataType = StringType
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = if (distinct) "word_shingles" else "word_ngrams"

  override protected def nullSafeEval(a: Any): Any =
    Hashing.wordNGrams(a.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hashing.wordNGrams($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** `span_window_hashes(string, win) -> array<long>` — content-defined-
  * anchor window hashes for cross-doc exact span dedup (q272): one
  * codegen'd pass per document instead of a per-position interpreted
  * HOF lambda. */
case class SpanWindowHashes(child: Expression, win: Int)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_window_hashes requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_window_hashes"

  override protected def nullSafeEval(a: Any): Any =
    Hashing.spanWindowHashes(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hashing.spanWindowHashes($c, $win);")

  override protected def withNewChildInternal(newChild: Expression): SpanWindowHashes =
    copy(child = newChild)
}

/** `span_anchor_positions(string, win) -> array<long>` — the 1-based
  * anchor positions behind `span_window_hashes`, index-aligned with
  * its output (same rule, no hashing). Used by the q279 scrub plan to
  * recover WHERE each flagged window sits. */
case class SpanAnchorPositions(child: Expression, win: Int)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_anchor_positions requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_anchor_positions"

  override protected def nullSafeEval(a: Any): Any =
    Hashing.spanAnchorPositions(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hashing.spanAnchorPositions($c, $win);")

  override protected def withNewChildInternal(
      newChild: Expression): SpanAnchorPositions =
    copy(child = newChild)
}
