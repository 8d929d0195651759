package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Distributed probabilistic-filter sketches: a Bloom filter and a
  * Count-Min sketch, both as mergeable [[Aggregator]]s over the
  * portable 56-bit [[graft.Tables.phash]] key.
  *
  * Scale contract (the reason these exist): both sketches are
  * FIXED-SIZE regardless of input cardinality, partially aggregable
  * (map-side combine builds partial sketches; merge is bitwise-OR /
  * element-wise add), and their probe side is plain Column arithmetic
  * over the broadcast sketch array — whole-stage-codegen'd builtins,
  * no UDF, no driver round trip per row. Both are one-sided: the
  * Bloom filter never misses an inserted key and Count-Min never
  * underestimates, so each can PRUNE work for an exact operator
  * without changing its answer (q81 decontamination, q85 heavy
  * hitters). That one-sidedness is what keeps the queries
  * oracle-checkable — the oracle is the exact formulation.
  *
  * Probe positions use Kirsch–Mitzenmacher double hashing
  * pos_i = (h + i·g) mod m with g = (h >>> 17) | 1 — derived from the
  * single 56-bit key with identical integer ops on the JVM
  * aggregation side and the Column probe side (both sides of the
  * contract live in this file, kept in lockstep).
  */
object Sketches {

  /** Bloom geometry: 2^20 bits (128 KiB — broadcast-cheap), 4 probes.
    * For the q81 bench index (~10^4 keys) the false-positive rate is
    * ~(kn/m)^k ≈ 1e-5; at 10^6 keys grow M_BITS, not K. */
  val M_BITS: Long = 1L << 20
  val BLOOM_WORDS: Int = (M_BITS / 64).toInt
  val BLOOM_K: Int = 4

  /** Count-Min geometry: 4 rows × 2^13 counters (256 KiB of longs).
    * Overestimate bias per key ≈ 2·n_total/W per row, min over 4 rows. */
  val CMS_D: Int = 4
  val CMS_W: Int = 1 << 13

  @inline private def gOf(h: Long): Long = (h >>> 17) | 1L

  /** Column twin of [[gOf]] — the probe-side derivation of the
    * double-hash increment, defined ONCE so the JVM aggregate and the
    * Column probe can never desync on the shift constant. h is the
    * 56-bit nonnegative phash, so arithmetic >> equals logical >>>. */
  private def gOf(h: Column): Column =
    shiftright(h, 17).bitwiseOR(lit(1L))

  /** Mergeable Bloom filter over 56-bit keys: zero = empty bitset,
    * reduce = set K probe bits, merge = bitwise OR (union of key sets —
    * Bloom filters of disjoint partial inputs OR into exactly the
    * filter of the union, which is what makes this partially
    * aggregable). */
  object BloomAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](BLOOM_WORDS)
    def reduce(b: Array[Long], h: Long): Array[Long] = {
      val g = gOf(h)
      var i = 0
      while (i < BLOOM_K) {
        val pos = ((h + i * g) % M_BITS).toInt
        b(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < BLOOM_WORDS) { x(i) |= y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Mergeable Count-Min sketch: reduce increments one counter per row,
    * merge adds element-wise (counts of a union = sum of counts, so
    * partial sketches combine losslessly). */
  object CountMinAgg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](CMS_D * CMS_W)
    def reduce(b: Array[Long], h: Long): Array[Long] = {
      val g = gOf(h)
      var r = 0
      while (r < CMS_D) {
        b(r * CMS_W + ((h + r * g) % CMS_W).toInt) += 1L
        r += 1
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < CMS_D * CMS_W) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** The two aggregates as DataFrame columns. */
  lazy val bloomAgg = udaf(BloomAgg, ExpressionEncoder[Long]())
  lazy val cmsAgg = udaf(CountMinAgg, ExpressionEncoder[Long]())

  /** Column-side Bloom membership probe — the IDENTICAL double-hash
    * arithmetic as [[BloomAgg.reduce]], composed from codegen'd
    * builtins over the broadcast bitset array. True for every inserted
    * key (no false negatives); rarely true for others. */
  def bloomMightContain(h: Column, bloom: Column): Column = {
    val g = gOf(h)
    (0 until BLOOM_K).map { i =>
      val pos = (h + lit(i.toLong) * g) % lit(M_BITS)
      val word = element_at(bloom, shiftright(pos, 6).cast(IntegerType) + lit(1))
      call_function("shiftrightunsigned", word, (pos % 64).cast(IntegerType))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Column-side Count-Min frequency estimate (min over the D row
    * counters) — never below the key's true count. */
  def cmsEstimate(h: Column, cms: Column): Column = {
    val g = gOf(h)
    least((0 until CMS_D).map { r =>
      val idx = lit(r * CMS_W) + (h + lit(r.toLong) * g) % lit(CMS_W.toLong)
      element_at(cms, idx.cast(IntegerType) + lit(1))
    }: _*)
  }
}
