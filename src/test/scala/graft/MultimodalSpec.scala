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

  test("media records derive bounded dimensions from content hash") {
    val meta = Multimodal.mediaMeta(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    assert(meta.filter(col("width") < 0 || col("width") >= 640).count() === 0)
    assert(meta.filter(col("height") < 0 || col("height") >= 480).count() === 0)
  }
}
