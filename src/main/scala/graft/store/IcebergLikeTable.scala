package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-*shaped* snapshot table (SURVEY.md §7.0, §7.3): Parquet data
  * files laid out in hash buckets `bucket = pmod(hash(key), B)` plus an
  * atomic JSON manifest that is the single source of truth for which files
  * are live. Commit = write-temp + atomic rename, exactly the visibility
  * contract `MERGE INTO` gives on a real Iceberg table (no Iceberg runtime
  * jar exists in this image; the interface is drop-in replaceable).
  *
  * znap analog: the DynamoDB KV snapshot table
  * (reference: persistence/dynamo/DynamoDBEventsWriter.scala:32-53) — but
  * MERGE here is transactional per micro-batch rather than convergent
  * per-item, which upgrades znap's at-least-once/idempotent-put argument
  * (SURVEY.md §1.3) to exactly-once.
  *
  * Scale shape: a MERGE rewrites ONLY the buckets containing changed keys
  * (file pruning via the manifest's bucket→files map); reads prune to one
  * bucket for point lookups. At 1000 executors, B is sized so each bucket
  * rewrite is one task's worth of data.
  */
final class IcebergLikeTable(val root: String, val numBuckets: Int)(
    implicit spark: SparkSession) {

  private val manifestPath: Path = Paths.get(root, "manifest.json")
  Files.createDirectories(Paths.get(root, "data"))

  // ---- manifest ------------------------------------------------------
  /** lastBatchId = -1 means "empty table". Minimal hand-rolled JSON (flat
    * structure, only paths and longs) to stay dependency-free.
    */
  final case class Manifest(lastBatchId: Long, buckets: Map[Int, Seq[String]],
      lineageFiles: Seq[String], signalFiles: Seq[String])

  def readManifest(): Manifest =
    if (!Files.exists(manifestPath)) Manifest(-1L, Map.empty, Nil, Nil)
    else parseManifest(Files.readString(manifestPath))

  private def parseManifest(s: String): Manifest = {
    // format (one bucket per line, written by render below):
    //   lastBatchId=<n>
    //   lineage=<f1>,<f2>
    //   signals=<f1>,<f2>
    //   bucket:<id>=<f1>,<f2>,...
    val lines = s.split("\n").filter(_.nonEmpty)
    var last = -1L
    val buckets = scala.collection.mutable.Map[Int, Seq[String]]()
    var lineage: Seq[String] = Nil
    var signals: Seq[String] = Nil
    lines.foreach {
      case l if l.startsWith("lastBatchId=") => last = l.substring(12).toLong
      case l if l.startsWith("lineage=") =>
        lineage = l.substring(8).split(",").filter(_.nonEmpty).toSeq
      case l if l.startsWith("signals=") =>
        signals = l.substring(8).split(",").filter(_.nonEmpty).toSeq
      case l if l.startsWith("bucket:") =>
        val Array(k, v) = l.substring(7).split("=", 2)
        buckets(k.toInt) = v.split(",").filter(_.nonEmpty).toSeq
      case _ =>
    }
    Manifest(last, ListMap(buckets.toSeq.sortBy(_._1): _*), lineage, signals)
  }

  private def renderManifest(m: Manifest): String = {
    val sb = new StringBuilder
    sb.append(s"lastBatchId=${m.lastBatchId}\n")
    sb.append(s"lineage=${m.lineageFiles.mkString(",")}\n")
    sb.append(s"signals=${m.signalFiles.mkString(",")}\n")
    m.buckets.toSeq.sortBy(_._1).foreach { case (b, fs) =>
      sb.append(s"bucket:$b=${fs.mkString(",")}\n")
    }
    sb.toString
  }

  /** Atomic commit: temp file + rename (same-dir rename is atomic on the
    * local FS; on object stores this is the metadata-swap an Iceberg
    * catalog performs).
    */
  private def commitManifest(m: Manifest): Unit = {
    val tmp = Paths.get(root, s"manifest.tmp.${m.lastBatchId}")
    Files.writeString(tmp, renderManifest(m))
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- read ----------------------------------------------------------
  def bucketOf(keyCol: String): org.apache.spark.sql.Column =
    pmod(hash(col(keyCol)), lit(numBuckets))

  /** Snapshot-consistent read: only files the manifest lists. */
  def read(): DataFrame = {
    val m = readManifest()
    val files = m.buckets.values.flatten.map(f => s"$root/$f").toSeq
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Point lookup — prunes to the key's single bucket before scanning
    * (znap Q1: restapi/DynamoDBEntityReader.scala:38-73 consistent getItem).
    */
  def lookup(keyCol: String, key: String): DataFrame = {
    val m = readManifest()
    // Compute the bucket with Spark's own hash to stay consistent with writes.
    val bucket = spark.range(1).select(
      pmod(hash(lit(key)), lit(numBuckets)).cast("int")).head().getInt(0)
    val files = m.buckets.getOrElse(bucket, Nil).map(f => s"$root/$f")
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*).where(col(keyCol) === key)
  }

  def lineage(): DataFrame = {
    val m = readManifest()
    val files = m.lineageFiles.map(f => s"$root/$f")
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  def signals(): DataFrame = {
    val m = readManifest()
    val files = m.signalFiles.map(f => s"$root/$f")
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  // ---- merge (the exactly-once sink primitive) ------------------------
  /** Idempotent keyed MERGE of `updates` (one row per key) guarded by
    * `batchId` (SURVEY.md §7.3):
    *  1. if manifest.lastBatchId >= batchId → duplicate delivery, skip;
    *  2. rewrite only buckets containing updated keys: survivors
    *     (anti-join on key) ∪ updates;
    *  3. commit new manifest atomically — data visible iff commit wrote,
    *     matching znap's data-before-offset ordering
    *     (reference: pipeline/PipelineBuilder.scala:106-111).
    * Returns true iff the batch was applied.
    */
  def merge(updates: DataFrame, keyCol: String, batchId: Long,
      lineageDf: Option[DataFrame] = None,
      signalsDf: Option[DataFrame] = None): Boolean = {
    val m = readManifest()
    if (m.lastBatchId >= batchId) return false // idempotent re-delivery

    val withBucket = updates.withColumn("__bucket", bucketOf(keyCol))
    // Affected-bucket set: tiny (≤ numBuckets) driver-side list — this is
    // manifest metadata, not data.
    val affected = withBucket.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSet

    val version = s"v$batchId"
    val outDir = s"$root/data/$version"

    val oldFiles = affected.toSeq.sorted.flatMap(b =>
      m.buckets.getOrElse(b, Nil).map(f => s"$root/$f"))
    val merged =
      if (oldFiles.isEmpty) withBucket
      else {
        val existing = spark.read.parquet(oldFiles: _*)
          .withColumn("__bucket", bucketOf(keyCol))
        existing.join(withBucket.select(col(keyCol)).distinct(),
          Seq(keyCol), "left_anti")
          .unionByName(withBucket)
      }
    merged
      .repartition(math.max(affected.size, 1), col("__bucket"))
      .sortWithinPartitions(col(keyCol)) // deterministic file content order
      .write.partitionBy("__bucket").parquet(outDir)

    // list written files per bucket
    val newBuckets: Map[Int, Seq[String]] = affected.map { b =>
      val dir = Paths.get(outDir, s"__bucket=$b")
      val fs =
        if (!Files.exists(dir)) Seq.empty[String]
        else Files.list(dir).iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .map(p => s"data/$version/__bucket=$b/${p.getFileName}")
          .toSeq.sorted
      b -> fs
    }.toMap

    var lineageFiles = m.lineageFiles
    lineageDf.foreach { ldf =>
      val ldir = s"$root/lineage/$version"
      ldf.coalesce(1).write.parquet(ldir)
      lineageFiles = lineageFiles ++ listParquet(ldir, s"lineage/$version")
    }
    var signalFiles = m.signalFiles
    signalsDf.foreach { sdf =>
      val sdir = s"$root/signals/$version"
      // NO coalesce: signals carry one row per changed key — at scale this
      // is millions of rows per batch and must write with full task
      // parallelism (a coalesce(1) here was a 35s/run serial bottleneck).
      sdf.write.parquet(sdir)
      signalFiles = signalFiles ++ listParquet(sdir, s"signals/$version")
    }

    val kept = m.buckets.filter { case (b, _) => !affected.contains(b) }
    commitManifest(Manifest(batchId, kept ++ newBuckets, lineageFiles, signalFiles))
    true
  }

  private def listParquet(absDir: String, relDir: String): Seq[String] = {
    val dir = Paths.get(absDir)
    if (!Files.exists(dir)) Nil
    else Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => s"$relDir/${p.getFileName}").toSeq.sorted
  }
}
