package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2.10 L5): opaque binary payloads
  * with typed metadata, batched per-partition feature extraction.
  *
  * The decode step reads REAL image dimensions from the payload's header
  * bytes — PNG IHDR and JPEG SOF, parsed directly from the container
  * formats' public specs (no codec library needed: width/height live in
  * fixed header positions). Payloads that are neither (the text-byte
  * fixture) fall back to a deterministic length-derived size, so the
  * plumbing stays testable end-to-end. Full pixel decode (a JNI codec or
  * Python `mapInPandas` worker) drops into the same per-partition seam.
  * Batches stream through `mapPartitions`, so executors hold one
  * partition's payloads at a time, never the whole table.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String, byte_len: Long)
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
                           width: Int, height: Int, features: Array[Float])

  /** Binary payload table: text bytes stand in for an image/audio blob. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        encode($"text", "UTF-8").as("payload"),
        concat(lit("image/px"), ($"doc_id" % 3).cast("string")).as("media_type"),
        length(encode($"text", "UTF-8")).cast("long").as("byte_len"))
      .as[MediaRow]
  }

  private val PNG_SIG = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** PNG: the 8-byte signature, then the IHDR chunk is mandated first —
    * width/height are the two big-endian u32s at bytes 16 and 20
    * (PNG spec §5.2/§11.2.2). */
  private[graft] def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && b.startsWith(PNG_SIG) &&
        new String(b.slice(12, 16), "US-ASCII") == "IHDR")
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** JPEG: walk the marker segments from SOI (FF D8) until a
    * start-of-frame marker (SOF0–15 minus DHT/JPG/DAC: C0–CF except
    * C4/C8/CC); the frame header carries height then width as big-endian
    * u16s at offsets +5/+7 from the marker byte (ITU-T T.81 §B.2.2). */
  private[graft] def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) { i += 2 } // no payload
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 7) return None
          return Some((be16(b, i + 7), be16(b, i + 5))) // (width, height)
        }
        i += 2 + len
      }
    }
    None
  }

  /** Decoder: real header parse for PNG/JPEG payloads; opaque payloads
    * (the text-byte fixture) get a deterministic length-derived size. The
    * 8-dim feature vector is a strided byte fold either way — the seam a
    * full pixel decode (JNI codec / Python worker via Arrow) drops into. */
  private def decode(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    val dim = 8
    val feats = Array.tabulate(dim) { i =>
      var acc = 0L
      var j = i
      while (j < bytes.length) { acc = (acc * 31 + (bytes(j) & 0xff)) % 1000003; j += dim }
      acc.toFloat / 1000003f
    }
    val (w, h) = pngDims(bytes).orElse(jpegDims(bytes))
      .getOrElse((16 + (bytes.length % 64), 16 + ((bytes.length / 2) % 64)))
    MediaFeatures(row.doc_id, row.media_type, row.byte_len,
      width = w, height = h, features = feats)
  }

  /** Partition-batched decode: the Scala analog of `mapInPandas` — one
    * iterator per partition, constant memory, codec handle reusable per
    * partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map(decode)
    }
  }

  case class FrameSample(doc_id: Long, frame_idx: Int, frame_off: Long,
                         frame_len: Long, n_frames: Long)

  /** Frame geometry: fixed 256-byte windows stand in for codec frames
    * (a real container's keyframe index drops into the same seam), every
    * 4th frame sampled — the standard video-training decimation. */
  val FRAME_BYTES = 256L
  val SAMPLE_EVERY = 4

  /** L5b [EXT]: frame sampling — the video half of the multimodal
    * contract: one input payload fans out to MANY sampled-frame rows.
    * The plumbing is the real thing: `mapPartitions` streams each
    * partition's payloads through a per-partition iterator and FLATTENS
    * to frame rows lazily, so executor memory holds one payload plus one
    * emitted row at a time — never the expanded frame table (the shape
    * that matters when a payload is a 2 GB video and the fan-out is
    * thousands of frames). The frame SPLIT is the declared stub (fixed
    * byte windows instead of a codec's keyframe index); offsets, lengths
    * and the sampling stride are exact arithmetic, which is what the
    * DuckDB oracle replays (generate_series over the same geometry). */
  def sampleFrames(media: Dataset[MediaRow]): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec/demuxer handle would init here
      rows.flatMap { r =>
        val n = (r.byte_len + FRAME_BYTES - 1) / FRAME_BYTES
        Iterator.range(0, n.toInt, SAMPLE_EVERY).map { i =>
          val off = i.toLong * FRAME_BYTES
          FrameSample(r.doc_id, i, off, math.min(FRAME_BYTES, r.byte_len - off), n)
        }
      }
    }
  }

  def l5bFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(mediaTable(spark, sfDir)).toDF().orderBy($"doc_id", $"frame_idx")
  }

  /** L5 query: metadata + decoded-feature summary per media row. The
    * oracle checks the plumbing-visible parts (ids, types, byte lengths);
    * the stub features are covered by MultimodalSpec. */
  def l5MultimodalColumns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, sfDir)).toDF()
      .select($"doc_id", $"media_type", $"byte_len",
        size($"features").cast("long").as("n_features"))
      .orderBy($"doc_id")
  }
}
