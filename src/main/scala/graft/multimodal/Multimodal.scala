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
  * The decode step is REAL for images: `javax.imageio` ships PNG, JPEG,
  * BMP and GIF codecs inside every JDK, so [[decodeImage]] turns actual
  * image bytes into actual pixels (true dimensions + per-channel
  * stats) with no external dependency. Payloads that are not a
  * decodable image — e.g. the UTF-8 text stand-ins the `documents`
  * table provides — fall back to a deterministic byte-fake
  * ([[decodeFallback]]) so the pipeline stays total; the features row
  * carries a `real_decode` flag distinguishing the two.
  *
  * Scale notes: payloads never pass through a shuffle here (narrow
  * pipeline); at 100 TB you partition by content size so decode
  * batches stay memory-bounded, and push metadata-only predicates
  * (format, dimensions) to the parquet scan so undecodable/oversized
  * payloads are pruned before a single byte is fetched. ImageIO's
  * disk cache is disabled once per executor JVM — a codec that spills
  * every payload to local tmp files would turn decode into an IO
  * bench.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String,
    width: Int, height: Int)

  /** Per-media extracted features. `img_w`/`img_h` and the channel
    * means come from DECODED pixels when `real_decode` is true; on the
    * byte-fallback path they echo the metadata claim and the
    * single-channel mean. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, n_pixels: Long,
    mean_pixel: Double, img_w: Int, img_h: Int, mean_r: Double,
    mean_g: Double, mean_b: Double, real_decode: Boolean)

  /** Decode batch size: bounds peak decoded-buffer memory per task. */
  val DecodeBatch = 32

  /** A decoded image: true dimensions, per-pixel luminance, and
    * per-channel means. */
  case class Decoded(w: Int, h: Int, gray: Array[Int], meanR: Double,
    meanG: Double, meanB: Double)

  // One-time per-JVM ImageIO setup (runs on each executor at first
  // decode): no AWT display needed, no tmp-file cache per payload.
  private lazy val imageIoReady: Unit = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** REAL image decode via the JDK's bundled codecs (PNG/JPEG/BMP/GIF).
    * Returns None for payloads no installed reader recognizes — the
    * caller falls back to [[decodeFallback]]. Luminance is the integer
    * channel average (deterministic across JVMs; no float rounding). */
  def decodeImage(payload: Array[Byte]): Option[Decoded] = {
    imageIoReady
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val gray = new Array[Int](w * h)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < argb.length) {
          val p = argb(i)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          sr += r; sg += g; sb += b
          gray(i) = (r + g + b) / 3
          i += 1
        }
        val n = math.max(argb.length, 1).toDouble
        Some(Decoded(w, h, gray, sr / n, sg / n, sb / n))
      }
    } catch {
      // NOT just IOException: ImageIO readers throw RuntimeExceptions
      // (CMMException, ArrayIndexOutOfBounds…) on payloads whose magic
      // number matches but whose body is corrupt — one bad row must
      // fall back, not kill the task (the pipeline-stays-total contract)
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Fallback for non-image payloads (text stand-ins, video frames):
    * deterministic "pixels" from the payload bytes themselves. Keeps
    * the pipeline total over mixed corpora where only some rows carry
    * decodable media. */
  def decodeFallback(payload: Array[Byte]): Array[Int] =
    payload.map(b => b & 0xff)

  private def meanOf(px: Array[Int]): Double = {
    if (px.isEmpty) return 0.0
    var s = 0L; var i = 0
    while (i < px.length) { s += px(i); i += 1 }
    s.toDouble / px.length
  }

  /** Total decode — THE one decode dispatch (real codec first, byte
    * fallback otherwise), shared by every pipeline stage so fallback
    * semantics can never fork: returns the [[Decoded]] (true dims on a
    * real decode; metadata dims + single-channel means on fallback)
    * plus whether a real codec ran. */
  def decodeTotal(r: MediaRecord): (Decoded, Boolean) =
    decodeImage(r.payload) match {
      case Some(d) => (d, true)
      case None =>
        val px = decodeFallback(r.payload)
        val m = meanOf(px)
        (Decoded(r.width, r.height, px, m, m, m), false)
    }

  /** Pixel-buffer view of [[decodeTotal]]. */
  def decodePixels(r: MediaRecord): (Array[Int], Int, Int, Boolean) = {
    val (d, real) = decodeTotal(r)
    (d.gray, d.w, d.h, real)
  }

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
    * batch shape a vectorized (Arrow/pandas-style) UDF would see. Rows
    * whose payload is a real image get true decoded dimensions and
    * per-channel means; the rest get the deterministic byte-fallback
    * (and echo the metadata dimensions). */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        batch.map { r =>
          val (d, real) = decodeTotal(r)
          // fallback Decoded already holds the byte mean in every
          // channel (single-channel payload) — no second pass
          val mp = if (real) meanOf(d.gray) else d.meanR
          MediaFeatures(r.doc_id, r.payload.length.toLong,
            d.gray.length.toLong, mp, d.w, d.h,
            d.meanR, d.meanG, d.meanB, real_decode = real)
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

  /** Nearest-neighbor resize over the decoded pixel buffer. Out-of-range
    * source indices clamp (the fallback buffer length is the payload
    * length, not necessarily w*h; a real decode always has exactly
    * w*h). */
  def resizeKernel(px: Array[Int], w: Int, h: Int, ow: Int, oh: Int): Array[Int] = {
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
        val (px, w, h, _) = decodePixels(r)
        ResizedMedia(r.doc_id, ow, oh,
          resizeKernel(px, math.max(w, 1), math.max(h, 1), ow, oh))
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
        // a raw frame slice is never a self-contained image container;
        // frame decode goes straight to the byte path
        val px = decodeFallback(frame)
        FrameSample(r.doc_id, f, frame.length.toLong, meanOf(px))
      }
    }
  }

  /** 64-bit perceptual hash of a media row. */
  case class ImageHash(doc_id: Long, ahash: Long, real_decode: Boolean)

  /** AVERAGE-HASH (aHash): decode → 8x8 nearest-neighbor luminance
    * downsample → threshold each cell at the integer mean → 64 bits.
    * The standard cheap perceptual fingerprint: re-encodes of the
    * same pixels (PNG vs BMP) hash IDENTICALLY (decode-then-hash sees
    * pixels, not bytes — a content-hash like q41's md5 cannot), and
    * small edits flip few bits. All-integer (integer luminance,
    * integer mean) so the hash is bit-stable across JVMs. Same
    * partition-batched iterator shape as [[extractFeatures]]. */
  def aHash(ds: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap(_.map { r =>
        val (px, w, h, real) = decodePixels(r)
        val small = resizeKernel(px, math.max(w, 1), math.max(h, 1), 8, 8)
        var sum = 0L
        var i = 0
        while (i < 64) { sum += small(i); i += 1 }
        val mean = sum / 64
        var bits = 0L
        i = 0
        while (i < 64) { if (small(i) > mean) bits |= (1L << i); i += 1 }
        ImageHash(r.doc_id, bits, real)
      })
    }
  }

  /** NEAR-DUPLICATE IMAGE pairs by Hamming distance over [[aHash]],
    * blocked by q79's pigeonhole banding at image granularity: split
    * the 64-bit hash into 4 x 16-bit bands — any pair within Hamming
    * distance 3 agrees EXACTLY on at least one band (4 bands, 3
    * differing bits), so the equi-join on (band, bkey) is a LOSSLESS
    * prune and the quadratic pair space is never materialized. The
    * visual twin of the q31/q79 text near-dup family: catches the
    * same photo re-encoded, resized, or lightly edited across feeds,
    * where byte/content hashes see three unrelated blobs. */
  def imageNearDup(ds: Dataset[MediaRecord], maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4x16 banding is lossless only for dist <= 3")
    val hashes = aHash(ds).toDF()
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("ahash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bkey"))
    }: _*)
    val bands = hashes
      .select(col("doc_id"), col("ahash"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val x = bands.alias("x")
    val y = bands.alias("y")
    x.join(y, col("x.band") === col("y.band") &&
        col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.ahash").as("ha"), col("y.ahash").as("hb"))
      .distinct()
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
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
