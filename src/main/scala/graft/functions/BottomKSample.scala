package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable BOTTOM-K-BY-HASH uniform sample — the quantile companion
  * of [[KmvMerge]] and the last classic sketch beside HLL / MinHash /
  * KMV: keep the K (value) payloads whose 56-bit portable keys hash
  * SMALLEST. Because "the K smallest hashes of a set" is a
  * deterministic, ORDER-INDEPENDENT function of the set (unlike KLL
  * compactions, which depend on merge order and randomness), the
  * sketch composes under merge exactly like KMV — merge = linear
  * merge of two sorted arrays, keep K — and a SQL oracle can
  * recompute the sample row-for-row (`row_number() OVER (ORDER BY
  * hash, value) <= K`). The hash is uniform on the key space, so the
  * kept rows are a uniform K-sample of the group and any rank
  * statistic (median, p90, p99) read off the sorted sample values is
  * the standard bottom-k estimator with error O(1/√K).
  *
  * Aggregation-contract notes (the 100 TB shape): the buffer is a
  * ≤ K-pair array sorted by (hash, value); `reduce` rejects a row
  * whose hash is ≥ the current K-th smallest in O(log K) with zero
  * allocation — the path almost every row takes once the sketch
  * warms — so map-side partial aggregation reduces every partition
  * to ≤ K pairs per group BEFORE the shuffle. Per-group quantiles
  * therefore cost one partial-aggregable rollup instead of the
  * corpus-wide per-group sort a exact-percentile pass needs. Finish
  * emits the VALUES ONLY (hash order): the consumer sorts the ≤ K
  * values and indexes ranks, keeping the estimator arithmetic
  * visible in the plan. */
object BottomKSample extends Aggregator[(Long, Long), Array[(Long, Long)], Array[Long]] {
  val K = 64

  def zero: Array[(Long, Long)] = Array.empty

  private def lt(h1: Long, v1: Long, h2: Long, v2: Long): Boolean =
    h1 < h2 || (h1 == h2 && v1 < v2)

  def reduce(b: Array[(Long, Long)], in: (Long, Long)): Array[(Long, Long)] = {
    val (h, v) = in
    val n = b.length
    if (n == K && !lt(h, v, b(n - 1)._1, b(n - 1)._2)) return b // warm fast path
    // binary search for the (h, v) insertion point
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(b(mid)._1, b(mid)._2, h, v)) lo = mid + 1 else hi = mid
    }
    val out = new Array[(Long, Long)](if (n < K) n + 1 else K)
    System.arraycopy(b, 0, out, 0, lo)
    out(lo) = (h, v)
    System.arraycopy(b, lo, out, lo + 1, out.length - lo - 1)
    out
  }

  def merge(x: Array[(Long, Long)], y: Array[(Long, Long)]): Array[(Long, Long)] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val out = new Array[(Long, Long)](math.min(K, x.length + y.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      val takeX = j >= y.length ||
        (i < x.length && lt(x(i)._1, x(i)._2, y(j)._1, y(j)._2))
      out(o) = if (takeX) x(i) else y(j)
      if (takeX) i += 1 else j += 1
      o += 1
    }
    out
  }

  def finish(b: Array[(Long, Long)]): Array[Long] = b.map(_._2)

  def bufferEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
