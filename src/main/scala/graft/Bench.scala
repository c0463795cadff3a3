package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.Synthetic
import graft.model.{Schemas, Turn}
import graft.replay.Replay
import graft.snapshot.SnapshotFold
import graft.store.IcebergLikeTable

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR plus the north-rule headline — snapshot-build and
  * replay throughput (turns/sec) on a deterministic synthetic transcript
  * stream — and prints ONE JSON line.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_TURNS (synthetic turn count, default 2,000,000).
  */
object Bench {

  def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Delete a temp dir tree after a measurement — a best-of-N bench that
    * leaks ~1 GB of table+checkpoint per rep fills the disk and the later
    * reps measure a 90%-full filesystem (observed: ENOSPC aborts and
    * inflated write times).
    */
  def rmrf(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  /** Generate the synthetic turn log once as parquet (not timed into the
    * fold metrics) and return (dir, exact row count).
    */
  def writeTurns(spark: SparkSession, n: Long, files: Int): (String, Long) = {
    val dir = Files.createTempDirectory("graft-bench-turns").toString + "/turns"
    val p = Synthetic.paramsForTurns(n).copy(hotConvs = 4, hotSize = 20000)
    val ds = Synthetic.turns(spark, p, slices = 128)
    ds.repartitionByRange(files, col("conv_id"), col("turn_idx"))
      .write.parquet(dir)
    (dir, spark.read.parquet(dir).count())
  }

  /** Streaming snapshot build over the turn log (the north-rule pipeline):
    * file-stream in `batches` micro-batches → fMGWS fold → MERGE.
    * Returns wall seconds.
    */
  /** Returns (wall seconds, listener-observed rows/sec) — the O2 metrics
    * path measured on every bench run, not just in tests.
    */
  def streamBuild(spark: SparkSession, turnsDir: String, files: Int): (Double, Double) = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val tmp = Files.createTempDirectory("graft-bench-table").toString
    val stream = spark.readStream.schema(Schemas.turn)
      .option("maxFilesPerTrigger", math.max(files / 8, 1).toString)
      .parquet(turnsDir).as[Turn]
    val table = new IcebergLikeTable(s"$tmp/table", 64)
    val metrics = new graft.ops.MetricsListener
    spark.streams.addListener(metrics)
    val (_, secs) = try time {
      val q = Replay.fromCheckpoint(stream, table, s"$tmp/ckpt", watermark = "3650 days")
      q.processAllAvailable()
      q.stop()
    } finally {
      spark.streams.removeListener(metrics)
      rmrf(tmp)
    }
    (secs, metrics.throughput)
  }

  /** Streaming fold WITHOUT the merge sink (noop foreachBatch) — isolates
    * fMGWS + state-store cost from MERGE cost for scaling diagnosis.
    */
  def streamFoldOnly(spark: SparkSession, turnsDir: String, files: Int): Double = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-bench-fold").toString
    val stream = spark.readStream.schema(Schemas.turn)
      .option("maxFilesPerTrigger", math.max(files / 8, 1).toString)
      .parquet(turnsDir).as[Turn]
    val (_, secs) = try time {
      val q = graft.snapshot.SnapshotStream.updates(stream, "3650 days")
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.model.ConvSnapshot], _: Long) =>
          df.write.mode("overwrite").format("noop").save()
        }
        .start()
      q.processAllAvailable()
      if (sys.env.contains("SPARK_GRAFT_DEBUG")) {
        q.recentProgress.foreach(p => println(s"[batch ${p.batchId}] rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} state=${p.stateOperators.map(s => s"commit=${s.commitTimeMs}").mkString(",")}"))
      }
      q.stop()
    } finally rmrf(tmp)
    secs
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_TURNS", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // max_by/min_by aggregate via ObjectHashAggregate; the default
      // sort-based fallback threshold (4096 groups/partition) forces the
      // snapshot fold into sort-aggregation at any realistic key count
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- driver-table query timings -----------------------------------
    // SPARK_GRAFT_ONLY=q1,q2 narrows to a subset for focused A/B probes
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // per-query shuffle-write bytes: on a cluster the shuffle is network,
    // so bytes predict 100-TB behavior where local seconds cannot
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
      .map { case (name, fn) =>
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // a failed query must be LOUD, not a silently shorter total
          System.err.println(s"[bench] QUERY FAILED $name: $e")
      }
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftshim.Shim.waitListenerBus(spark.sparkContext)
      (name, secs, shuffleBytes.get / 1e6)
    }

    // --- north-rule headline: snapshot build + replay throughput ------
    // (skipped in SPARK_GRAFT_ONLY probe mode — the subset timing is the
    // point there, not the headline)
    def fmtMap(f: ((String, Double, Double)) => (String, Double)): String =
      results.map(r => { val (k, v) = f(r); "\"" + k + "\":" + v })
        .mkString("{", ",", "}")
    val shuffleJson = fmtMap { case (k, _, mb) => k -> mb }
    if (only.isDefined) {
      println(s"""{"metric":"subset","value":${results.map(_._2).sum},""" +
        s""""unit":"sec","queries":${fmtMap(r => r._1 -> r._2)},""" +
        s""""query_shuffle_mb":$shuffleJson,"sf":"$sfDir"}""")
      spark.stop()
      return
    }
    val files = 32
    val (turnsDir, rows) = writeTurns(spark, nTurns, files)
    val (_, batchFoldS) = time {
      SnapshotFold.batchSnapshots(spark.read.parquet(turnsDir))
        .write.mode("overwrite").format("noop").save()
    }
    val (streamS, streamListenerRps) = streamBuild(spark, turnsDir, files)
    val midTs = new java.sql.Timestamp(
      Synthetic.BaseEpochMs + 12 * 3600 * 1000L)
    val (_, replayS) = time {
      import spark.implicits._
      Replay.toTimestamp(spark.read.parquet(turnsDir).as[Turn], midTs)
        .write.mode("overwrite").format("noop").save()
    }

    val qs = fmtMap(r => r._1 -> r._2)
    val total = results.map(_._2).sum + batchFoldS + streamS + replayS
    val extra =
      s""""synthetic":{"turns":$rows,"batch_fold_sec":$batchFoldS,""" +
        s""""batch_fold_turns_per_sec":${rows / batchFoldS},""" +
        s""""stream_build_sec":$streamS,"stream_turns_per_sec":${rows / streamS},""" +
        s""""stream_rows_per_sec_listener":$streamListenerRps,""" +
        s""""replay_to_ts_sec":$replayS,"replay_turns_per_sec":${rows / replayS},""" +
        s""""cpus":$cpus}"""
    // Full record (incl. the per-query shuffle-MB map) goes to a FILE —
    // the driver's stdout tail capture clipped the r3 one-liner mid-JSON
    // and destroyed the primary artifact. stdout gets the compact line
    // (metric/value/queries/synthetic only), printed LAST.
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""query_shuffle_mb":$shuffleJson,$extra,"sf":"$sfDir"}"""
    // Detail write is fail-safe: a bad SPARK_GRAFT_BENCH_OUT path or a
    // full disk must not also destroy the compact stdout line (which
    // stays LAST so the driver's tail capture cannot clip it — the r3
    // lesson) after a multi-hour run.
    try {
      val outFile = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_detail.json"))
      Files.writeString(outFile, fullJson + "\n")
      System.err.println(s"[bench] full record -> ${outFile.toAbsolutePath}")
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"[bench] detail write failed (${e.getMessage}); " +
          "full record follows on stderr:")
        System.err.println(fullJson)
    }
    // Compact stdout line, printed LAST with nothing after it: the driver
    // tail-captures ~2000 chars and parses from the end. The r4 line
    // carried the FULL 115-query map (~4 KB) so its head was clipped out
    // of the window — the compact line carries a fixed headline subset
    // rounded to ms (full map: bench_detail.json) and stays well under
    // the window. build.sbt sets Global/showSuccess := false so sbt's
    // "[success] Total time" banner no longer follows it.
    val headline = Seq("q1_agg", "a1_snapshot_fold", "s1_stream_snapshot",
      "q1_point_lookup", "j2_join_shuffle", "dedup_minhash", "semantic_dedup",
      "ann_ivf_trained", "bm25_topk", "heavy_hitters", "cep_stream",
      "cdc_stream", "topk_per_key_native", "decontam")
    val bySec = results.map(r => r._1 -> r._2).toMap
    val headJson = headline.flatMap(n => bySec.get(n).map(v =>
        "\"" + n + "\":" + f"$v%.3f")).mkString("{", ",", "}")
    rmrf(java.nio.file.Paths.get(turnsDir).getParent.toString)
    spark.stop() // stop FIRST: a shutdown warning after the line would break the tail parse
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      s""""queries":$headJson,$extra,"sf":"$sfDir"}""")
  }
}
