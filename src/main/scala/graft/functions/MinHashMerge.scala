package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable MinHash sketch aggregate (SURVEY §2.5/§4's one genuinely
  * custom aggregation): the element-wise minimum of member signatures.
  *
  * Because min commutes and associates, the MinHash signature of a SET
  * UNION is exactly the element-wise min of the sets' signatures — so
  * aggregating per-row [[Hashing.minhashSig]] signatures with this
  * yields the signature of the whole group's shingle union without
  * ever re-shingling the concatenated text. That is what makes MinHash
  * a *sketch*: group-level (cluster, domain, day-partition) signatures
  * come from a partial-aggregable pass, map-side combine works, and
  * incremental corpus refreshes merge old sketch + new batch sketch in
  * O(K).
  *
  * Null/empty handling: a null input signature (doc with no shingles)
  * contributes nothing; a slot never touched by any input stays
  * Long.MaxValue only if the whole group was empty-signature — callers
  * on non-degenerate corpora never see it. Buffers are mutated in
  * place (the Aggregator contract allows it) — zero allocation per
  * input row beyond the K-slot buffer. */
object MinHashMerge extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  private val K = Hashing.K

  def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
    if (a != null) {
      var i = 0
      while (i < K) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
    }
    b
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = reduce(x, y)

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
