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

  /** N-HASH pigeonhole banding — [[pairedBands]] generalized to a
    * fingerprint carried as ANY number of 64-bit columns: band b's key
    * concatenates slice b of every hash word
    * (`bkey = Σ_i slice_b(h_i) << (i·bitsEach)`). Pigeonhole over the
    * concatenated `hashes.length · 64` bits is unchanged — a pair
    * within Hamming distance `nBands − 1` still matches at least one
    * band exactly in EVERY word — while each band carries
    * `2^(hashes.length · bitsEach)` buckets. This is SCALE.md §18's
    * "widen h2" lever taken to its conclusion: with four words at 8×8
    * slices every band carries 32 key bits, so even a band family
    * whose h1 slice is structurally degenerate (q368's dark bottom
    * row) keeps ≥ 21 discriminating bits from the other words and the
    * residual collision term drops from n²/256 to ~n²/2²². The radius
    * guarantee needs near-dup edits to flip few bits across ALL words
    * — contrast-style h2..h4 (q375's quadrant hashes) flip NONE for a
    * base-level edit, so planted distances live entirely in h1. */
  def multiBands(hashes: Seq[Column], nBands: Int, bitsEach: Int): Column = {
    require(hashes.nonEmpty, "at least one hash word")
    require(nBands * bitsEach <= 64, "band slices must fit 64-bit hashes")
    require(hashes.length * bitsEach < 64, "the combined key must fit a long")
    val mask = (1L << bitsEach) - 1L
    array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        hashes.zipWithIndex.map { case (h, i) =>
          shiftleft(shiftright(h, b * bitsEach).bitwiseAND(lit(mask)),
            i * bitsEach): Column
        }.reduce(_.bitwiseOR(_)).as("bkey"))
    }: _*)
  }
}
