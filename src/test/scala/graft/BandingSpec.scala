package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Banding

/** Property tests for the pigeonhole banding core — the one invariant
  * every near-dup family in the engine rests on: ANY pair within
  * Hamming distance nBands − 1 over the concatenated fingerprint
  * shares at least one (band, bkey), for any distribution of the
  * flips across the hash words. Seeded-deterministic cases, one Spark
  * job for the whole sweep. */
class BandingSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()

  test("multiBands: any <=7-flip edit of a 256-bit fingerprint shares a band (500 cases)") {
    import spark.implicits._
    val rnd = new java.util.Random(42L) // fixed seed — deterministic cases
    val cases = (1 to 500).map { i =>
      val h = Array.fill(4)(rnd.nextLong())
      val g = h.clone()
      // d in 0..7 flips at positions drawn WITH replacement across all
      // 256 bits — duplicates un-flip, which only lowers the distance,
      // so every case stays within the guaranteed radius
      val d = i % 8
      (0 until d).foreach { _ =>
        val bit = rnd.nextInt(256)
        g(bit / 64) ^= (1L << (bit % 64))
      }
      (i, h(0), h(1), h(2), h(3), g(0), g(1), g(2), g(3))
    }
    val df = cases.toDF("id", "h1", "h2", "h3", "h4", "g1", "g2", "g3", "g4")
    val miss = df.select(col("id"),
        arrays_overlap(
          Banding.multiBands(Seq(col("h1"), col("h2"), col("h3"), col("h4")), 8, 8),
          Banding.multiBands(Seq(col("g1"), col("g2"), col("g3"), col("g4")), 8, 8))
          .as("hit"))
      .filter(!col("hit")).count()
    assert(miss === 0L, s"$miss fingerprints within radius 7 missed by the banding")
  }

  test("multiBands: the radius bound is tight — 8 flips, one per band, can evade") {
    import spark.implicits._
    // dirty every band once: bit b*8 lives in band b's h1 slice
    val h = Array(0L, 0L, 0L, 0L)
    val g = h.clone()
    (0 until 8).foreach { b => g(0) ^= (1L << (b * 8)) }
    val hit = Seq((h(0), h(1), h(2), h(3), g(0), g(1), g(2), g(3)))
      .toDF("h1", "h2", "h3", "h4", "g1", "g2", "g3", "g4")
      .select(arrays_overlap(
        Banding.multiBands(Seq(col("h1"), col("h2"), col("h3"), col("h4")), 8, 8),
        Banding.multiBands(Seq(col("g1"), col("g2"), col("g3"), col("g4")), 8, 8)))
      .head().getBoolean(0)
    assert(!hit, "8 one-per-band flips must defeat 8-band pigeonhole (bound is tight)")
  }
}
