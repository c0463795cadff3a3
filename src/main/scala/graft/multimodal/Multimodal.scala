package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract run as a
  * typed `mapPartitions` over batches of rows (the Scala analog of
  * `mapInPandas`: per-partition batch processing with an explicit output
  * schema, no per-row driver involvement).
  *
  * The codec itself is a STUB — no image/audio libraries exist in this
  * container — implemented as a deterministic fake (`fakeDecode`) so the
  * Spark-side contract (schema, partitioning, batch shape, null handling)
  * is real and tested end-to-end. Swapping in a real decoder changes ONLY
  * the body of [[fakeDecode]].
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      feat0: Int, // first byte (deterministic fake "feature")
      width: Int, // fake decoded dimensions — derived from content
      height: Int,
      checksum: Long)

  /** STUB decoder: deterministic pure function of the bytes. A real
    * implementation would decode the image/audio frame here.
    */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val n = r.payload.length
    var cks = 1125899906842597L
    var i = 0
    while (i < n) { cks = cks * 31 + (r.payload(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      n_bytes = n,
      feat0 = if (n > 0) r.payload(0) & 0xff else -1,
      width = 16 + (math.abs(cks) % 1024).toInt,
      height = 16 + (math.abs(cks >> 10) % 1024).toInt,
      checksum = cks)
  }

  /** Batch feature extraction: partition-parallel, constant memory per
    * task (iterator-to-iterator), output schema fixed by the encoder.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    media.mapPartitions(_.map(fakeDecode))
  }

  /** Build a media table from the documents table (text bytes standing in
    * for an opaque payload) and run the decode pipeline.
    */
  def decodeDocuments(s: SparkSession, dir: String): DataFrame = {
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
    extractFeatures(media).toDF()
  }
}
