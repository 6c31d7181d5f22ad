package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2.10 L5): opaque binary payloads
  * with typed metadata, batched per-partition feature extraction.
  *
  * The decode step is a clearly-marked deterministic STUB (the container
  * has no image/audio codecs); everything around it — schema, binary
  * column handling, partition-batched UDF shape, feature-vector contract —
  * is the real Spark plumbing a production decoder (JNI codec or Python
  * `mapInPandas` worker) drops into. Batches stream through
  * `mapPartitions`, so executors hold one partition's payloads at a time,
  * never the whole table.
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

  /** STUB decoder: a real implementation calls the codec here (e.g. JNI
    * libjpeg / a Python worker via Arrow batches). This fake derives a
    * deterministic 8-dim feature vector + fake dimensions from the bytes
    * so the distributed plumbing is fully testable. */
  private def stubDecode(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    val dim = 8
    val feats = Array.tabulate(dim) { i =>
      var acc = 0L
      var j = i
      while (j < bytes.length) { acc = (acc * 31 + (bytes(j) & 0xff)) % 1000003; j += dim }
      acc.toFloat / 1000003f
    }
    MediaFeatures(row.doc_id, row.media_type, row.byte_len,
      width = 16 + (bytes.length % 64), height = 16 + ((bytes.length / 2) % 64),
      features = feats)
  }

  /** Partition-batched decode: the Scala analog of `mapInPandas` — one
    * iterator per partition, constant memory, codec handle reusable per
    * partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map(stubDecode)
    }
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
