package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Sketches

/** Property specs for the mergeable Bloom / Count-Min sketches — the
  * one-sidedness guarantees (no false negatives / no underestimates)
  * that make the q81/q85 sketch-pruned plans EXACT, plus the
  * JVM-aggregate vs Column-probe lockstep and partial-agg mergeability
  * they rely on. */
class SketchesSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  import spark.implicits._

  private def hashed(n: Int, tag: String) =
    (1 to n).map(i => s"$tag-$i").toDF("s")
      .repartition(8) // force partial buffers + merge() paths
      .select(Tables.phash(col("s")).as("h"))

  test("bloom: no false negatives — every inserted key probes true") {
    val keys = hashed(5000, "in")
    val bloom = keys.agg(Sketches.bloomAgg(col("h")).as("bf"))
    val missed = keys.join(broadcast(bloom))
      .filter(!Sketches.bloomMightContain(col("h"), col("bf")))
      .count()
    assert(missed === 0L)
  }

  test("bloom: false-positive rate on disjoint keys is small") {
    val bloom = hashed(5000, "in").agg(Sketches.bloomAgg(col("h")).as("bf"))
    val probes = hashed(5000, "out")
    val fp = probes.join(broadcast(bloom))
      .filter(Sketches.bloomMightContain(col("h"), col("bf")))
      .count()
    // theory at n=5k, m=2^20, k=4: ~(kn/m)^4 ≈ 1e-6; 50 = 1% headroom
    assert(fp < 50, s"false-positive count $fp out of 5000 is not small")
  }

  test("cms: estimates never underestimate true counts") {
    // skewed multiplicities: key i appears i times
    val rows = (1 to 200).flatMap(i => Seq.fill(i)(s"k-$i")).toDF("s")
      .repartition(8)
      .select(col("s"), Tables.phash(col("s")).as("h"))
    val cms = rows.agg(Sketches.cmsAgg(col("h")).as("cms"))
    val under = rows.groupBy(col("s"), col("h"))
      .agg(count(lit(1)).as("true_count"))
      .join(broadcast(cms))
      .filter(Sketches.cmsEstimate(col("h"), col("cms")) < col("true_count"))
      .count()
    assert(under === 0L)
  }

  test("bloom merge is a set union: OR of partial filters equals whole") {
    val whole = Sketches.BloomAgg.zero
    (1 to 100).foreach(i => Sketches.BloomAgg.reduce(whole, i * 7919L))
    val p1 = Sketches.BloomAgg.zero
    (1 to 50).foreach(i => Sketches.BloomAgg.reduce(p1, i * 7919L))
    val p2 = Sketches.BloomAgg.zero
    (51 to 100).foreach(i => Sketches.BloomAgg.reduce(p2, i * 7919L))
    assert(Sketches.BloomAgg.merge(p1, p2).toSeq === whole.toSeq)
  }

  test("cms merge adds counts: sum of partial sketches equals whole") {
    val whole = Sketches.CountMinAgg.zero
    (1 to 100).foreach(i => Sketches.CountMinAgg.reduce(whole, i * 104729L))
    val p1 = Sketches.CountMinAgg.zero
    (1 to 30).foreach(i => Sketches.CountMinAgg.reduce(p1, i * 104729L))
    val p2 = Sketches.CountMinAgg.zero
    (31 to 100).foreach(i => Sketches.CountMinAgg.reduce(p2, i * 104729L))
    assert(Sketches.CountMinAgg.merge(p1, p2).toSeq === whole.toSeq)
  }
}
