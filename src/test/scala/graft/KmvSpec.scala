package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvMerge

/** Specs for the KMV (bottom-k) distinct sketch and its consumers:
  * the Aggregator contract (sorted, distinct, capped, merge-exact),
  * the estimator against known ground truth, and the two round-11
  * composition queries (q365 sketch-vs-exact overlap, q364
  * cross-modal agreement matrix). */
class KmvSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  private val sf = "/root/testdata/sf0.001"

  test("reduce keeps the K smallest distinct values, sorted") {
    var b = KmvMerge.zero
    val vals = Seq(50L, 10L, 50L, 99L, 1L, 10L, 42L)
    vals.foreach(v => b = KmvMerge.reduce(b, v))
    assert(b.toSeq === Seq(1L, 10L, 42L, 50L, 99L))
    // fill past K: only the K smallest survive
    (1000L to 1200L).foreach(v => b = KmvMerge.reduce(b, v))
    assert(b.length === KmvMerge.K)
    (0L to 5L).foreach(v => b = KmvMerge.reduce(b, v))
    assert(b.take(6).toSeq === (0L to 5L).toSeq)
    assert(b.length === KmvMerge.K)
    assert(b.toSeq === b.toSeq.sorted)
  }

  test("BottomKSample: merge equals sequential reduction and the sample is the rank truth") {
    import graft.functions.BottomKSample
    val xs = (0 until 400).map(i =>
      ((i * 2654435761L) % 100003L, (i * 7919L) % 5000L))
    val (l, r) = xs.splitAt(173)
    val seq = xs.foldLeft(BottomKSample.zero)(BottomKSample.reduce)
    val par = BottomKSample.merge(
      l.foldLeft(BottomKSample.zero)(BottomKSample.reduce),
      r.foldLeft(BottomKSample.zero)(BottomKSample.reduce))
    assert(par.toSeq === seq.toSeq)
    // merge is also order-independent (the shuffle-order law)
    assert(BottomKSample.merge(
      r.foldLeft(BottomKSample.zero)(BottomKSample.reduce),
      l.foldLeft(BottomKSample.zero)(BottomKSample.reduce)).toSeq === seq.toSeq)
    // ground truth: the K pairs smallest by (hash, value), values out
    val truth = xs.sorted.take(BottomKSample.K)
    assert(seq.toSeq === truth)
    assert(BottomKSample.finish(seq).toSeq === truth.map(_._2))
    // under-full group: the sample IS the group
    val small = xs.take(10).foldLeft(BottomKSample.zero)(BottomKSample.reduce)
    assert(BottomKSample.finish(small).sorted.toSeq ===
      xs.take(10).map(_._2).sorted)
  }

  test("WeightedBottomKSample: merge law holds and the weighted median walk is exact") {
    import graft.functions.WeightedBottomKSample
    val xs = (0 until 400).map(i =>
      ((i * 2654435761L) % 100003L, (i * 7919L) % 5000L, 1L + (i * 31L) % 7L))
    val (l, r) = xs.splitAt(173)
    val seq = xs.foldLeft(WeightedBottomKSample.zero)(WeightedBottomKSample.reduce)
    val par = WeightedBottomKSample.merge(
      l.foldLeft(WeightedBottomKSample.zero)(WeightedBottomKSample.reduce),
      r.foldLeft(WeightedBottomKSample.zero)(WeightedBottomKSample.reduce))
    assert(par.toSeq === seq.toSeq)
    // merge is order-independent (the shuffle-order law)
    assert(WeightedBottomKSample.merge(
      r.foldLeft(WeightedBottomKSample.zero)(WeightedBottomKSample.reduce),
      l.foldLeft(WeightedBottomKSample.zero)(WeightedBottomKSample.reduce))
      .toSeq === seq.toSeq)
    // ground truth: the K triples smallest by (hash, value, weight);
    // finish drops the hash and keeps (value, weight)
    val truth = xs.sorted.take(WeightedBottomKSample.K)
    assert(seq.toSeq === truth)
    assert(WeightedBottomKSample.finish(seq).toSeq ===
      truth.map(t => (t._2, t._3)))
    // the q149 lower-median walk over the sample: smallest value whose
    // cumulative weight reaches (sw + 1) / 2 — replay it by brute force
    val sample = WeightedBottomKSample.finish(seq)
    val byV = sample.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    val sw = byV.map(_._2).sum
    val kth = (sw + 1) / 2
    var cum = 0L
    val expectMedian = byV.find { case (_, wc) => cum += wc; cum >= kth }.get._1
    cum = 0L
    val walk = byV.map { case (v, wc) => cum += wc; (v, wc, cum) }
      .find { case (_, wc, c) => c >= kth && c - wc < kth }.get
    assert(walk._1 === expectMedian)
    // under-full group: the sample IS the group, weights intact
    val small = xs.take(10)
      .foldLeft(WeightedBottomKSample.zero)(WeightedBottomKSample.reduce)
    assert(WeightedBottomKSample.finish(small).sortBy(identity).toSeq ===
      xs.take(10).map(t => (t._2, t._3)).sortBy(identity))
  }

  test("merge equals sequential reduction (the mergeable-sketch law)") {
    val xs = (0 until 500).map(i => (i * 2654435761L) % 100000L)
    val (l, r) = xs.splitAt(237)
    val seq = xs.foldLeft(KmvMerge.zero)(KmvMerge.reduce)
    val par = KmvMerge.merge(
      l.foldLeft(KmvMerge.zero)(KmvMerge.reduce),
      r.foldLeft(KmvMerge.zero)(KmvMerge.reduce))
    assert(par.toSeq === seq.toSeq)
    // ground truth: the K smallest distinct inputs
    assert(seq.toSeq === xs.distinct.sorted.take(KmvMerge.K))
  }

  test("q365: sketch estimates track the exact audit columns") {
    val rows = dedup.Dedup.kmvSourceOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nUnion = r.getAs[Long]("n_union").toDouble
      val estUnion = r.getAs[Double]("est_union")
      val nInter = r.getAs[Long]("n_inter").toDouble
      val estInter = r.getAs[Double]("est_inter")
      // KMV relative error ~ 1/sqrt(K-1) = 12.6%; allow 4 sigma
      assert(math.abs(estUnion - nUnion) <= 0.5 * nUnion + 1,
        s"${r.getString(0)}x${r.getString(1)}: estUnion=$estUnion exact=$nUnion")
      assert(math.abs(estInter - nInter) <= 0.5 * nUnion + 1,
        s"${r.getString(0)}x${r.getString(1)}: estInter=$estInter exact=$nInter")
    }
  }

  test("q364: agreement matrix cells reconcile against both pair sets") {
    val m = multimodal.Multimodal.crossModalDupMatrix(spark, sf).collect()
      .map(r => (r.getAs[Boolean]("in_text"), r.getAs[Boolean]("in_image")) ->
        r.getAs[Long]("n_pairs")).toMap
    // never a (false, false) row; all three representable cells filled
    // (the mirror feed makes lead-preserving text dups image dups too)
    assert(!m.contains((false, false)))
    assert(m.getOrElse((true, false), 0L) > 0, "text_only")
    assert(m.getOrElse((false, true), 0L) > 0, "image_only")
    assert(m.getOrElse((true, true), 0L) > 0, "both")
    // marginals equal the source pair sets (image = quintet scenes
    // UNION the mirror feed's lead-keyed pairs)
    import org.apache.spark.sql.functions.col
    val nText = dedup.Dedup.ngramJaccard(spark, sf).count()
    val nImage = multimodal.Multimodal.imageNearDupGenerated(spark, sf)
      .select(col("doc_a"), col("doc_b"))
      .unionByName(multimodal.Multimodal
        .imageNearDup(multimodal.Multimodal.mirrorMedia(spark, sf))
        .select(col("doc_a"), col("doc_b")))
      .distinct().count()
    assert(m.getOrElse((true, true), 0L) + m.getOrElse((true, false), 0L) === nText)
    assert(m.getOrElse((true, true), 0L) + m.getOrElse((false, true), 0L) === nImage)
  }

  test("agreement matrix core: all three cells on synthetic pair sets") {
    import spark.implicits._
    val text = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val image = Seq((3L, 4L), (5L, 6L), (7L, 8L)).toDF("doc_a", "doc_b")
    val m = multimodal.Multimodal.dupAgreementMatrix(text, image).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(m === Map((true, false) -> 1L, (false, true) -> 1L,
      (true, true) -> 2L))
  }
}
