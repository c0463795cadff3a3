package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Value compression at rest — znap A2 (reference: utils/Compressor.scala
  * :16-42 gzips the JSON value and base64s it for transport; the reader
  * type-dispatches and decompresses, restapi/DynamoDBEntityReader.scala
  * :56-66). In our engine Parquet codecs compress storage, so this codec
  * exists for the SIGNAL/dump payload path where the consumer receives the
  * bytes directly and must be able to recover the original event.
  *
  * Deterministic: GZIPOutputStream with default deflate settings and no
  * mtime variance (the JDK writes MTIME=0) — same input, same bytes.
  */
object GzipCodec {

  def compress(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(s.getBytes(StandardCharsets.UTF_8))
    gz.close()
    bos.toByteArray
  }

  def decompress(bytes: Array[Byte]): String = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** gzip+base64 of a string column (reference Compressor.compressBase64,
    * utils/Compressor.scala:27-29). UDF, not codegen — acceptable: it runs
    * only on the signal side-output (one short payload per changed key),
    * never in the fold/scan hot path.
    */
  val gzipB64: Column => Column = {
    val f = udf((s: String) =>
      java.util.Base64.getEncoder.encodeToString(compress(s)))
    c => f(c)
  }

  /** Inverse — reader-side transparent decompression (reference
    * DynamoDBEntityReader.scala:56-66 dispatches on stored type).
    */
  val gunzipB64: Column => Column = {
    val f = udf((s: String) =>
      decompress(java.util.Base64.getDecoder.decode(s)))
    c => f(c)
  }
}
