package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PIGEONHOLE BANDING over fixed-width integer fingerprints — the one
  * shared spelling of the blocking step every Hamming-distance
  * near-dup join in the engine uses (image aHash, acoustic
  * fingerprint, their streaming twins, and the wide-radius variant).
  *
  * The invariant: split a `nBands * bandBits`-bit hash into `nBands`
  * disjoint bands; two hashes within Hamming distance `nBands - 1`
  * differ in at most `nBands - 1` bits, so BY PIGEONHOLE at least one
  * band is bit-identical in both — an equi-join on (band, bkey) is a
  * LOSSLESS candidate prune for any distance threshold
  * `<= nBands - 1`, and the quadratic pair space is never
  * materialized. Recall/cost knob: more, narrower bands widen the
  * catchable radius (4×16 → dist ≤ 3; 8×8 → dist ≤ 7) at the price of
  * more candidate collisions per band (2^bandBits buckets per band).
  *
  * Scale shape: the only thing that ever shuffles is the exploded
  * (band, bkey, hash) row — ~24 bytes — keyed by (band, bkey), which
  * is also the state-partitioning key of the streaming form.
  */
object Banding {

  /** The band fan-out column: an array of `nBands` structs
    * `(band: Int, bkey: Long)` where `bkey` is the `bandBits`-wide
    * slice of `hash` starting at bit `band * bandBits`. Callers
    * `explode` it and equi-join on (band, bkey). */
  def hashBands(hash: Column, nBands: Int, bandBits: Int): Column = {
    require(nBands * bandBits <= 64, "bands must fit a 64-bit hash")
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(hash, b * bandBits).bitwiseAND(lit(mask)).as("bkey"))
    }: _*)
  }

  /** TWO-HASH pigeonhole banding over a 128-bit fingerprint carried as
    * two 64-bit columns: band b's key concatenates the `bitsEach`-wide
    * slice b of BOTH hashes (`bkey = slice_b(h1) | slice_b(h2) <<
    * bitsEach`). The pigeonhole argument is unchanged — a pair within
    * Hamming distance `nBands − 1` over the CONCATENATED 2·64 bits
    * dirties at most `nBands − 1` bands, so at least one band matches
    * exactly in both halves — but each band now carries
    * `2^(2·bitsEach)` buckets instead of `2^bitsEach`: at 8×8 per
    * hash, 65 536 buckets/band vs 256, cutting random band collisions
    * ~256× at the SAME catchable radius. This is the q368→q372 scale
    * lever (SCALE.md §14): widen the fingerprint, not the radius —
    * double the discriminating bits per band while the radius the
    * banding must catch stays ≤ nBands − 1, provided near-dup edits
    * flip few bits of h2 (q372's quadrant-contrast hash flips NONE for
    * the planted single-cell edits). */
  def pairedBands(h1: Column, h2: Column, nBands: Int,
      bitsEach: Int): Column = {
    require(nBands * bitsEach <= 64, "band slices must fit 64-bit hashes")
    require(2 * bitsEach < 64, "the combined band key must fit a long")
    val mask = (1L << bitsEach) - 1L
    array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(h1, b * bitsEach).bitwiseAND(lit(mask))
          .bitwiseOR(shiftleft(
            shiftright(h2, b * bitsEach).bitwiseAND(lit(mask)), bitsEach))
          .as("bkey"))
    }: _*)
  }
}
