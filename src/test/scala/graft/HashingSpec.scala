package graft

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing

/** Pure-JVM specs for the native kernels behind the codegen'd text
  * expressions — the contracts the DuckDB oracles depend on. */
class HashingSpec extends AnyFunSuite {

  private val samples = Seq("", "a", "hello world", "naïve café — ünïcode",
    "the quick brown fox", "0", " ", "\t tab", "日本語テキスト",
    "a b c d e f g h i j k l m n o p")

  private def hexPhash(s: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    new BigInteger(hex.substring(0, 14), 16).longValueExact()
  }

  private def arr(ss: String*): ArrayData =
    new GenericArrayData(ss.map(s =>
      if (s == null) null else UTF8String.fromString(s)).toArray[Any])

  private def strings(a: ArrayData): Seq[String] =
    (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) null else a.getUTF8String(i).toString)

  test("phash56 equals the 14-hex-digit md5 prefix (the SQL spelling)") {
    samples.foreach { s =>
      assert(Hashing.phash56(UTF8String.fromString(s)) === hexPhash(s), s)
    }
  }

  test("phash56 is non-negative (56 bits < sign bit)") {
    samples.foreach { s =>
      assert(Hashing.phash56(UTF8String.fromString(s)) >= 0L, s)
    }
  }

  test("phashArray hashes elements, keeps nulls, applies modulus") {
    val a = Hashing.phashArray(arr("x", null, "y"), 0L)
    assert(a.isNullAt(1))
    assert(a.getLong(0) === hexPhash("x"))
    assert(a.getLong(2) === hexPhash("y"))
    val m = Hashing.phashArray(arr("x"), Hashing.P)
    assert(m.getLong(0) === hexPhash("x") % Hashing.P)
  }

  test("wordNGrams: clipped tails, >=1 gram, distinct keeps first occurrence") {
    def grams(n: Int, distinct: Boolean, ss: String*): Seq[String] =
      strings(Hashing.wordNGrams(arr(ss: _*), n, distinct))
    assert(grams(3, false, "a", "b", "c", "d") === Seq("a b c", "b c d"))
    assert(grams(3, false, "a", "b") === Seq("a b")) // clipped, not empty
    assert(grams(3, false, "a") === Seq("a"))
    assert(grams(2, false, "a") === Seq("a"))
    assert(grams(2, false, "a", "b", "c") === Seq("a b", "b c"))
    assert(grams(2, true, "a", "b", "a", "b") === Seq("a b", "b a"))
    assert(grams(3, false) === Seq("")) // empty input -> one empty gram
  }

  test("wordNGrams gram count = max(size - n + 1, 1)") {
    for (sz <- 0 to 8; n <- 1 to 4) {
      val toks = (0 until sz).map(i => s"t$i")
      val got = Hashing.wordNGrams(arr(toks: _*), n, false).numElements()
      assert(got === math.max(sz - n + 1, 1), s"sz=$sz n=$n")
    }
  }

  test("minhashSig equals brute-force per-permutation minima") {
    val hs = Seq(17L, 923412L, 777L, 123456789L)
    val sig = Hashing.minhashSig(new GenericArrayData(hs.toArray))
    (0 until Hashing.K).foreach { k =>
      val expect = hs.map(h => (Hashing.A(k) * h + Hashing.B(k)) % Hashing.P).min
      assert(sig.getLong(k) === expect)
    }
  }

  test("minhashSig is order-insensitive; empty input -> K nulls") {
    val a = Hashing.minhashSig(new GenericArrayData(Array(5L, 9L)))
    val b = Hashing.minhashSig(new GenericArrayData(Array(9L, 5L)))
    assert((0 until Hashing.K).forall(i => a.getLong(i) == b.getLong(i)))
    val e = Hashing.minhashSig(new GenericArrayData(Array.empty[Any]))
    assert((0 until Hashing.K).forall(e.isNullAt))
  }

  test("sortedIntersectCount equals set intersection on sorted distinct arrays") {
    def longs(xs: Long*): ArrayData = new GenericArrayData(xs.toArray)
    def count(a: Seq[Long], b: Seq[Long]): Long =
      Hashing.sortedIntersectCount(longs(a: _*), longs(b: _*))
    assert(count(Seq(1, 3, 5, 9), Seq(2, 3, 4, 5, 10)) === 2)
    assert(count(Seq(), Seq(1, 2)) === 0)
    assert(count(Seq(7), Seq(7)) === 1)
    assert(count(Seq(1, 2, 3), Seq(4, 5)) === 0)
    // matches the generic set-intersection on random sorted-distinct input
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val a = Seq.fill(50)(rnd.nextLong(1000)).distinct.sorted
      val b = Seq.fill(50)(rnd.nextLong(1000)).distinct.sorted
      assert(count(a, b) === a.toSet.intersect(b.toSet).size.toLong)
    }
  }

  test("winnowMins: sliding minima with clipped tail, >=1 window") {
    def wins(w: Int, xs: Long*): Seq[Long] = {
      val a = Hashing.winnowMins(new GenericArrayData(xs.toArray), w)
      (0 until a.numElements()).map(a.getLong)
    }
    assert(wins(3, 5, 1, 4, 2, 8) === Seq(1, 1, 2))
    assert(wins(3, 9, 7) === Seq(7))  // shorter than window -> one clipped
    assert(wins(1, 3, 1, 2) === Seq(3, 1, 2))
    assert(wins(8, 42) === Seq(42))
    // count = max(n - w + 1, 1)
    for (n <- 1 to 10; w <- 1 to 4)
      assert(wins(w, (1L to n.toLong): _*).size === math.max(n - w + 1, 1))
  }

  test("simhash32 equals the signed-bit-count reference") {
    val cases = Seq(Seq.empty[Long], Seq(0L), Seq(1L, 3L, 7L),
      samples.map(hexPhash), Seq(Long.MaxValue >> 8, 42L, 42L))
    cases.foreach { hs =>
      val expect = (0 until 32).map { b =>
        val c = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (c > 0) 1L << b else 0L
      }.sum
      val got = Hashing.simhash32(new GenericArrayData(hs.toArray))
      assert(got === expect, hs)
    }
  }
}
