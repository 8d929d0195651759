package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** WEIGHTED extension of [[BottomKSample]] — the one quantile form the
  * unweighted sketch can't serve (q149's weighted-median semantics,
  * where a row counts `w` times in the CDF). The sample rule is
  * UNCHANGED: keep the K rows whose 56-bit portable keys hash smallest
  * — a deterministic, order-independent, merge-exact function of the
  * row set — but each kept row carries its (value, weight) payload, so
  * the consumer estimates the weighted quantile by the cumulative-
  * weight walk OVER THE SAMPLE: sort the ≤ K pairs by value and take
  * the smallest value whose cumulative sample weight reaches
  * `(sample_weight + 1) div 2` (the exact q149 lower-median rule,
  * applied to the sample instead of the corpus). The kept rows are a
  * uniform row-sample, so the sample's weighted CDF is the standard
  * Hansen–Hurwitz estimate of the population's — no transcendentals
  * (an Efraimidis–Spirakis exponential-key sample would need log(u),
  * which the Spark↔DuckDB oracle contract bans), and the whole
  * estimator is integer arithmetic the oracle replays row-for-row
  * (`row_number() OVER (ORDER BY hash, value, weight) <= K`, then the
  * same walk).
  *
  * Same aggregation contract as the unweighted form: buffer is a ≤ K
  * triple array sorted by (hash, value, weight) — the weight joins the
  * sort key only to keep duplicate (hash, value) rows deterministic —
  * with the O(log K) zero-allocation warm-path reject, so map-side
  * partial aggregation reduces every partition to ≤ K triples per
  * group before the shuffle. Finish emits (value, weight) pairs in
  * hash order; the consumer's walk stays visible in the plan. */
object WeightedBottomKSample
    extends Aggregator[(Long, Long, Long), Array[(Long, Long, Long)],
      Array[(Long, Long)]] {
  val K = 64

  def zero: Array[(Long, Long, Long)] = Array.empty

  private def lt(h1: Long, v1: Long, w1: Long,
      h2: Long, v2: Long, w2: Long): Boolean =
    h1 < h2 || (h1 == h2 && (v1 < v2 || (v1 == v2 && w1 < w2)))

  def reduce(b: Array[(Long, Long, Long)],
      in: (Long, Long, Long)): Array[(Long, Long, Long)] = {
    val (h, v, w) = in
    val n = b.length
    if (n == K) { // warm fast path: reject without allocating
      val t = b(n - 1)
      if (!lt(h, v, w, t._1, t._2, t._3)) return b
    }
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val m = b(mid)
      if (lt(m._1, m._2, m._3, h, v, w)) lo = mid + 1 else hi = mid
    }
    val out = new Array[(Long, Long, Long)](if (n < K) n + 1 else K)
    System.arraycopy(b, 0, out, 0, lo)
    out(lo) = (h, v, w)
    System.arraycopy(b, lo, out, lo + 1, out.length - lo - 1)
    out
  }

  def merge(x: Array[(Long, Long, Long)],
      y: Array[(Long, Long, Long)]): Array[(Long, Long, Long)] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val out = new Array[(Long, Long, Long)](math.min(K, x.length + y.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      val takeX = j >= y.length ||
        (i < x.length && lt(x(i)._1, x(i)._2, x(i)._3,
          y(j)._1, y(j)._2, y(j)._3))
      out(o) = if (takeX) x(i) else y(j)
      if (takeX) i += 1 else j += 1
      o += 1
    }
    out
  }

  def finish(b: Array[(Long, Long, Long)]): Array[(Long, Long)] =
    b.map(t => (t._2, t._3))

  def bufferEncoder: Encoder[Array[(Long, Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long, Long)]]()
  def outputEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
}
