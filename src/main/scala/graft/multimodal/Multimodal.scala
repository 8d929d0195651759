package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal-column plumbing for training-data pipelines (north-star
  * extension, BASELINE.json): media payloads travel as opaque `binary`
  * columns with typed metadata alongside; decode/feature-extraction
  * runs partition-batched over a typed Dataset.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in
  * this container): it deterministically fakes "pixels" from the
  * payload bytes. Everything around it — the binary column, the typed
  * schema, the partition-batched iterator shape (the JVM analogue of a
  * batched pandas UDF), the feature schema — is real and tested
  * (MultimodalSpec).
  *
  * Scale notes: payloads never pass through a shuffle here (narrow
  * pipeline); at 100 TB you partition by content size so decode
  * batches stay memory-bounded, and push metadata-only predicates
  * (format, dimensions) to the parquet scan so undecodable/oversized
  * payloads are pruned before a single byte is fetched.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String,
    width: Int, height: Int)

  /** Per-media extracted features. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, n_pixels: Long,
    mean_pixel: Double)

  /** Decode batch size: bounds peak decoded-buffer memory per task. */
  val DecodeBatch = 32

  /** STUB — a real deployment decodes `payload` with an image/audio
    * codec here; this container has none, so the decoded "pixels" are
    * deterministically faked from the payload bytes themselves. The
    * signature (bytes + metadata in, fixed-size buffer out) is the real
    * contract a codec drops into. */
  def decodeStub(payload: Array[Byte], width: Int, height: Int): Array[Int] =
    payload.map(b => b & 0xff)

  /** The documents table lifted into a media table: text bytes stand in
    * for an image payload; metadata (format, dimensions, content hash)
    * is derived deterministically. */
  /** 56-bit hash as a SQL fragment (integer `div` keeps exactness —
    * Column./ would detour through double and lose bits above 2^53). */
  private val hSql =
    "cast(conv(substring(md5(cast(text as binary)),1,14),16,10) as bigint)"

  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    spread(load(spark, dir, "documents")).select(
      col("doc_id"),
      concat(lit("img/"), col("source")).as("format"),
      length(encode(col("text"), "UTF-8")).cast(LongType).as("n_bytes"),
      expr(s"$hSql % 640").as("width"),
      expr(s"($hSql div 640) % 480").as("height"),
      md5(col("text").cast(BinaryType)).as("content_hash"))
      .orderBy(col("doc_id"))

  /** Typed media records (payload = UTF-8 bytes as the stand-in blob). */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    load(spark, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      concat(lit("img/"), col("source")).as("format"),
      expr(s"$hSql % 640").cast(IntegerType).as("width"),
      expr(s"($hSql div 640) % 480").cast(IntegerType).as("height"))
      .as[MediaRecord]
  }

  /** Partition-batched decode + feature extraction: the mapPartitions
    * iterator is consumed in DecodeBatch-sized groups, mirroring the
    * batch shape a vectorized (Arrow/pandas-style) UDF would see. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        batch.map { r =>
          val px = decodeStub(r.payload, r.width, r.height)
          val mean =
            if (px.isEmpty) 0.0 else px.map(_.toLong).sum.toDouble / px.length
          MediaFeatures(r.doc_id, r.payload.length.toLong, px.length.toLong,
            mean)
        }
      }
    }
  }

  /** A resized image: fixed output dimensions, row-major pixels. */
  case class ResizedMedia(doc_id: Long, out_w: Int, out_h: Int,
    pixels: Array[Int])

  /** One sampled frame's summary. */
  case class FrameSample(doc_id: Long, frame_idx: Int, n_bytes: Long,
    mean_pixel: Double)

  /** Nearest-neighbor resize over the (stub-)decoded pixel buffer. The
    * index math is the real kernel a codec-backed deployment keeps;
    * only the pixel source is the stub. Out-of-range source indices
    * clamp (the stub's buffer length is the payload length, not
    * necessarily w*h). */
  def resizeStub(px: Array[Int], w: Int, h: Int, ow: Int, oh: Int): Array[Int] = {
    val out = new Array[Int](ow * oh)
    if (px.nonEmpty) {
      var y = 0
      while (y < oh) {
        val sy = math.min((y.toLong * h / oh).toInt, h - 1)
        var x = 0
        while (x < ow) {
          val sx = math.min((x.toLong * w / ow).toInt, w - 1)
          out(y * ow + x) = px(math.min(sy * w + sx, px.length - 1))
          x += 1
        }
        y += 1
      }
    }
    out
  }

  /** Batched resize pipeline: same partition-batched iterator shape as
    * [[extractFeatures]]; output schema is fixed-size so downstream
    * tensorization is schema-stable. */
  def resize(ds: Dataset[MediaRecord], ow: Int, oh: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap(_.map { r =>
        val px = decodeStub(r.payload, r.width, r.height)
        ResizedMedia(r.doc_id, ow, oh,
          resizeStub(px, math.max(r.width, 1), math.max(r.height, 1), ow, oh))
      })
    }
  }

  /** Frame sampling for video-like payloads: the payload is treated as
    * contiguous fixed-size frames and every `every`-th frame is
    * decoded and summarized — the standard decimation step before
    * per-frame feature extraction. Short tail frames are kept. */
  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int,
      every: Int): Dataset[FrameSample] = {
    require(frameBytes > 0 && every > 0)
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
      (0 until nFrames by every).map { f =>
        val frame = r.payload.slice(f * frameBytes,
          math.min((f + 1) * frameBytes, r.payload.length))
        val px = decodeStub(frame, r.width, r.height)
        val mean =
          if (px.isEmpty) 0.0 else px.map(_.toLong).sum.toDouble / px.length
        FrameSample(r.doc_id, f, frame.length.toLong, mean)
      }
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_multimodal_meta" -> mediaMeta)

  val oracles: Map[String, String] = Map(
    "q41_multimodal_meta" ->
      s"""SELECT doc_id,
        | 'img/' || source AS format,
        | CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
        | ${phashSql("text")} % 640 AS width,
        | (${phashSql("text")} // 640) % 480 AS height,
        | md5(text) AS content_hash
        |FROM documents
        |ORDER BY doc_id""".stripMargin)
}
