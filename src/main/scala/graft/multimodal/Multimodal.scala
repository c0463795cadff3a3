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

  final case class Frame(
      doc_id: Long, frame_idx: Int, frame_bytes: Int, frame_feat0: Int)

  /** Frame sampling — the 1→N multimodal shape (a video payload explodes
    * into per-frame rows): deterministic fake = consecutive `frameSize`-
    * byte chunks, capped at `maxFrames` (a real implementation would seek
    * keyframes here; the row-explosion contract, schema, and constant-
    * memory iterator are the real, tested part). Empty payloads produce
    * zero frames.
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 256,
      maxFrames: Int = 8): Dataset[Frame] = {
    implicit val enc: Encoder[Frame] = Encoders.product[Frame]
    media.mapPartitions(_.flatMap { r =>
      val n = r.payload.length
      val k = math.min((n + frameSize - 1) / frameSize, maxFrames)
      (0 until k).iterator.map { i =>
        val off = i * frameSize
        Frame(r.doc_id, i, math.min(frameSize, n - off), r.payload(off) & 0xff)
      }
    })
  }

  /** Resize — the 1→1 payload-transform shape (image downscale): stub =
    * stride-decimation of the bytes to ≤ `targetBytes`, preserving the
    * first byte. Output is again a MediaRow, so resize composes with
    * [[extractFeatures]] / [[sampleFrames]] like a real transcode stage.
    */
  def resize(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    media.mapPartitions(_.map { r =>
      val n = r.payload.length
      if (n <= targetBytes) r
      else {
        val stride = (n + targetBytes - 1) / targetBytes
        val out = new Array[Byte]((n - 1) / stride + 1)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * stride); i += 1 }
        r.copy(payload = out)
      }
    })
  }

  /** Media table from the documents table — text bytes standing in for an
    * opaque image/audio/video payload.
    */
  def mediaFromDocuments(s: SparkSession, dir: String): Dataset[MediaRow] = {
    implicit val enc: Encoder[MediaRow] = Encoders.product[MediaRow]
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Decode pipeline over the documents-as-media table. */
  def decodeDocuments(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(s, dir)).toDF()

  /** Frame-sampling pipeline (mm_frames query): byte-exact oracle-able —
    * frame boundaries, lengths, and first bytes are pure functions of the
    * payload bytes.
    */
  def frameDocuments(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocuments(s, dir)).toDF()

  /** Resize→decode composition (mm_resize query): decimate payloads to
    * ≤1024 bytes, then re-extract features — shows transforms chain with
    * no driver involvement and yields SQL-checkable lengths/first bytes.
    */
  def resizeDocuments(s: SparkSession, dir: String): DataFrame =
    extractFeatures(resize(mediaFromDocuments(s, dir), targetBytes = 1024))
      .toDF().select(col("doc_id"), col("n_bytes").cast("long").as("resized_bytes"),
        col("feat0").cast("long").as("feat0"))
}
