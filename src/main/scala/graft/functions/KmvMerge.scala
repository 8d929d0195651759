package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable K-MINIMUM-VALUES (KMV / bottom-k) distinct sketch: keep
  * the K smallest DISTINCT 56-bit hashes seen. The classic
  * Bar-Yossef et al. estimator: with the hash space treated as
  * (0, 2^56), E[|set|] ≈ (K-1) · 2^56 / kth_min.
  *
  * Why this beside HLL (q51): KMV sketches COMPOSE under set algebra —
  * the K smallest of (K_A ∪ K_B) is exactly the KMV sketch of A ∪ B,
  * and the fraction of that union sketch present in BOTH input
  * sketches estimates the Jaccard ratio, giving an INTERSECTION
  * cardinality estimate (ρ · |A∪B|) that HLL fundamentally cannot
  * provide (inclusion-exclusion over HLLs explodes the relative error
  * of small intersections). This is the theta-sketch idea in its
  * simplest exact-arithmetic form — and because the sketch content is
  * a deterministic function of the hashed input set, a SQL oracle can
  * recompute it value-for-value (unlike sampled sketches).
  *
  * Aggregation-contract notes: the buffer is a SORTED ascending array
  * of ≤ K distinct longs; `reduce` is O(log K) search + O(K) insert
  * only when the value actually enters the sketch (a value ≥ the
  * current K-th minimum is rejected in O(log K) with ZERO allocation —
  * at scale almost every row takes that path once the sketch warms);
  * `merge` is one linear merge of two sorted arrays. Map-side partial
  * aggregation therefore reduces each partition to ≤ K longs before
  * the shuffle — the whole point at 100 TB: per-source distinct
  * cardinalities and pairwise overlaps WITHOUT a corpus-wide
  * distinct shuffle. */
object KmvMerge extends Aggregator[Long, Array[Long], Array[Long]] {
  val K = 64

  def zero: Array[Long] = Array.empty[Long]

  def reduce(b: Array[Long], h: Long): Array[Long] = {
    val n = b.length
    if (n == K && h >= b(n - 1)) return b // common fast path, no alloc
    var idx = java.util.Arrays.binarySearch(b, h)
    if (idx >= 0) return b // already present (distinct semantics)
    idx = -idx - 1 // insertion point
    if (n < K) {
      val out = new Array[Long](n + 1)
      System.arraycopy(b, 0, out, 0, idx)
      out(idx) = h
      System.arraycopy(b, idx, out, idx + 1, n - idx)
      out
    } else {
      // full: h < max (checked above) — insert, drop current max
      val out = new Array[Long](K)
      System.arraycopy(b, 0, out, 0, idx)
      out(idx) = h
      System.arraycopy(b, idx, out, idx + 1, K - idx - 1)
      out
    }
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val out = new Array[Long](math.min(K, x.length + y.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < x.length || j < y.length)) {
      val takeX = j >= y.length || (i < x.length && x(i) <= y(j))
      val v = if (takeX) x(i) else y(j)
      if (takeX) i += 1 else j += 1
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
