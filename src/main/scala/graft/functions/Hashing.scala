package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind graft's native text/sketch expressions
  * ([[TextExpressions]]). Each is a tight primitive loop invoked from
  * whole-stage-generated code via the object's static forwarders — the
  * replacement for interpreted higher-order-function chains
  * (`transform`/`aggregate` lambdas are evaluated row-at-a-time by
  * Catalyst's interpreter and dominated round-2 bench time: the four
  * document queries built on them took 85 of 113 seconds).
  *
  * Portability contract: [[phash56]] equals Spark
  * `conv(substring(md5(x),1,14),16,10)` and DuckDB
  * `('0x' || substring(md5(x),1,14))::BIGINT` — the first 7 MD5 bytes
  * read big-endian — so every sketch built on it stays
  * DuckDB-oracle-checkable (see graft.Tables.phash).
  */
object Hashing {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 56-bit portable content hash: first 14 hex digits of MD5 over the
    * UTF-8 bytes, as a non-negative long. */
  def phash56(s: UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** [[phash56]] of every element; mod > 0 folds into Z_mod. Null
    * elements stay null (mirrors `transform` + null-propagating md5). */
  def phashArray(a: ArrayData, mod: Long): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = phash56(a.getUTF8String(i))
        out(i) = java.lang.Long.valueOf(if (mod > 0) h % mod else h)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash permutation constants (primes): h_i(x) = (A(i)*x + B(i))
    * mod P with x < 2^30 keeps every product within int64. Mirrored
    * literally into the DuckDB oracle (graft.dedup.Dedup). */
  val A: Array[Long] = Array(472882049L, 972663749L, 203280221L, 715225739L,
    179424673L, 899809363L, 32452843L, 49979687L, 67867967L, 86028121L,
    104395301L, 122949823L, 141650939L, 160481183L, 298489861L, 350377849L)
  val B: Array[Long] = Array(15485863L, 86028157L, 256203161L, 533000389L,
    982451653L, 472882027L, 179424691L, 32452867L, 67867979L, 104395303L,
    122949829L, 141650963L, 160481219L, 203280251L, 715225741L, 899809343L)
  val K: Int = 16
  val P: Long = 1000000007L

  /** MinHash signature: per-permutation minimum over the element
    * hashes. Equals `array(array_min(transform(hs, h -> (A_i*h+B_i)%P))
    * for i < K)` — K nulls when the input is empty/all-null, matching
    * array_min's empty-input null. */
  def minhashSig(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val mins = Array.fill(K)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        any = true
        val h = hs.getLong(i)
        var k = 0
        while (k < K) {
          val v = (A(k) * h + B(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](K))
    else new GenericArrayData(mins)
  }

  /** 32-bit SimHash over element hashes (with multiplicity): bit b set
    * iff the signed count of that bit across hashes is positive. Null
    * elements are skipped. */
  def simhash32(hs: ArrayData): Long = {
    val counts = new Array[Int](32)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var v = 0L
    var b = 0
    while (b < 32) { if (counts(b) > 0) v |= 1L << b; b += 1 }
    v
  }

  /** Intersection size of two SORTED long arrays by linear merge —
    * O(na+nb), zero allocation; the verification kernel of the PPJoin
    * similarity join (array_intersect would build a hash set per raw).
    * Duplicate values count once per matching pair step, matching set
    * semantics when inputs are distinct (shingle sets are). Null
    * elements sort wherever the producer put them and are skipped. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    c
  }

  /** Content-defined-anchor window hashes (graft.dedup.Dedup.spanDedup,
    * q272) in ONE pass over the code points: position i (0-based)
    * anchors iff (31*cp(i) + cp(i+1)) % 16 == 0, and each anchor with
    * a full `win`-code-point window emits [[phash56]] of that window.
    * Code-point indexing matches both engines' character semantics
    * (Spark SUBSTRING and DuckDB SUBSTRING/ASCII); equals the DuckDB
    * LIST_FILTER/LIST_TRANSFORM oracle spelling exactly. Replaces a
    * filter/transform HOF chain whose per-position interpreted lambda
    * + substring allocations dominated the query (the round-2 lesson:
    * Catalyst does not compile HOF lambdas). */
  def spanWindowHashes(text: UTF8String, win: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val last = cps.length - win
    if (last < 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any]()
    val md = mdLocal.get()
    var i = 0
    while (i <= last) {
      if ((31L * cps(i) + cps(i + 1)) % 16 == 0) {
        md.reset()
        val d = md.digest(new String(cps, i, win)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v = 0L
        var j = 0
        while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        out.add(java.lang.Long.valueOf(v))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The 1-based anchor POSITIONS selected by [[spanWindowHashes]]'s
    * rule — same filter, no hashing (two integer ops per character).
    * Emitted as longs so positional zips against the hash array and
    * SQL arithmetic need no casts; aligned index-for-index with the
    * hashes by construction (one rule, two projections). */
  def spanAnchorPositions(text: UTF8String, win: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val last = cps.length - win
    if (last < 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i <= last) {
      if ((31L * cps(i) + cps(i + 1)) % 16 == 0)
        out.add(java.lang.Long.valueOf((i + 1).toLong))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Winnowing: minimum of each w-wide sliding window over the hash
    * sequence (Schleimer et al. local fingerprinting). max(n-w+1, 1)
    * windows, the tail window clipped to the array end; null elements
    * are skipped inside a window (all-null/empty window -> null).
    * Output is position-ordered with duplicates — callers dedupe with
    * array_distinct to get the fingerprint set. */
  def winnowMins(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    val cnt = math.max(n - w + 1, 1)
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) {
      val hi = math.min(i + w, n)
      var m = Long.MaxValue
      var any = false
      var j = i
      while (j < hi) {
        if (!hs.isNullAt(j)) {
          any = true
          val v = hs.getLong(j)
          if (v < m) m = v
        }
        j += 1
      }
      if (any) out(i) = java.lang.Long.valueOf(m)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Space-joined word n-grams with clipped tails: max(size-n+1, 1)
    * grams; gram i joins elements [i, min(i+n, size)) skipping nulls —
    * exactly `transform(sequence(...), i -> concat_ws(' ',
    * try_element_at...))`, so a short document yields one clipped gram
    * rather than none. `distinct` keeps first occurrences
    * (array_distinct semantics). */
  def wordNGrams(a: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val sz = a.numElements()
    val cnt = math.max(sz - n + 1, 1)
    val sep = UTF8String.fromString(" ")
    val seen = if (distinct) new java.util.LinkedHashSet[UTF8String]() else null
    val out = new java.util.ArrayList[UTF8String](cnt)
    var i = 0
    while (i < cnt) {
      val hi = math.min(i + n, sz)
      val parts = new Array[UTF8String](hi - i)
      var j = i
      while (j < hi) {
        parts(j - i) = if (a.isNullAt(j)) null else a.getUTF8String(j)
        j += 1
      }
      val g = UTF8String.concatWs(sep, parts: _*) // concatWs skips nulls
      if (distinct) { if (seen.add(g)) out.add(g) } else out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
