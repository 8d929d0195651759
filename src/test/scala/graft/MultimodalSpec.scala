package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaFeatures, MediaRecord}

/** Specs for the multimodal plumbing: the decode step is a stub (no
  * codecs in this container) but the schema, batching, and feature
  * math around it are real. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()

  test("extractFeatures computes byte/pixel counts and mean over batches") {
    import spark.implicits._
    val recs = (0 until 100).map { i =>
      MediaRecord(i.toLong, Array.tabulate[Byte](i + 1)(j => (j % 7).toByte),
        "img/test", 10, 10)
    }
    val out = Multimodal.extractFeatures(recs.toDS()).collect()
      .sortBy(_.doc_id)
    assert(out.length === 100)
    out.foreach { f: MediaFeatures =>
      val n = f.doc_id.toInt + 1
      assert(f.n_bytes === n)
      assert(f.n_pixels === n) // stub: 1 "pixel" per byte
      val expectMean = (0 until n).map(_ % 7).sum.toDouble / n
      assert(math.abs(f.mean_pixel - expectMean) < 1e-12)
    }
  }

  test("resize emits fixed-size row-major buffers with clamped sampling") {
    import spark.implicits._
    val recs = Seq(
      MediaRecord(1L, Array.tabulate[Byte](12)(_.toByte), "img/x", 4, 3),
      MediaRecord(2L, Array.empty[Byte], "img/x", 4, 3)) // empty payload
    val out = Multimodal.resize(recs.toDS(), 2, 2).collect().sortBy(_.doc_id)
    assert(out.forall(r => r.pixels.length === 4))
    // doc 1: px = 0..11 laid out 4x3; NN at (0,0),(2,0),(0,1),(2,1)
    assert(out(0).pixels.toSeq === Seq(0, 2, 4, 6))
    assert(out(1).pixels.toSeq === Seq(0, 0, 0, 0))
  }

  test("frame sampling decimates fixed-size frames and keeps the tail") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](25)(_.toByte) // 3 frames of 10 + tail 5
    val ds = Seq(MediaRecord(7L, payload, "vid/x", 1, 1)).toDS()
    val frames = Multimodal.sampleFrames(ds, frameBytes = 10, every = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2))
    assert(frames(0).n_bytes === 10)
    assert(frames(1).n_bytes === 5) // tail frame kept, short
    assert(frames(0).mean_pixel === (0 until 10).sum.toDouble / 10)
    assert(frames(1).mean_pixel === (20 until 25).sum.toDouble / 5)
  }

  test("media records derive bounded dimensions from content hash") {
    val meta = Multimodal.mediaMeta(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    assert(meta.filter(col("width") < 0 || col("width") >= 640).count() === 0)
    assert(meta.filter(col("height") < 0 || col("height") >= 480).count() === 0)
  }
}
