package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.model.{Schemas, Turn}
import graft.replay.Replay
import graft.store.IcebergLikeTable

/** Micro-batch latency exhibit for the two compaction policies (VERDICT r2
  * item 4): with inline compaction every ~maxDeltasPerBucket-th micro-batch
  * pays an O(bucket) rewrite inside its own trigger — a p99 latency spike —
  * while deferred compaction keeps every micro-batch O(batch) and moves the
  * rewrite into separate `compact()` commits outside the latency path (on a
  * real cluster: a background maintenance job between micro-batches; the
  * manifest swap is single-writer, so it interleaves rather than races).
  *
  * Prints one JSON line per mode with per-batch trigger durations
  * (p50/p95/p99/max from StreamingQueryProgress) plus total wall seconds,
  * so BENCH.md can show the p99 flattening directly.
  */
object CompactionBench {

  private def pct(sorted: Seq[Long], p: Double): Long =
    sorted((p * (sorted.size - 1)).round.toInt)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_TURNS", "2000000").toLong
    val files = 256
    val perTrigger = 8 // 32 micro-batches -> 4 compaction waves at threshold 8
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val s: SparkSession = spark

    val (turnsDir, rows) = Bench.writeTurns(spark, nTurns, files)
    try {
      for (inline <- Seq(true, false)) {
        val tmp = Files.createTempDirectory("graft-compact-bench").toString
        val stream = spark.readStream.schema(Schemas.turn)
          .option("maxFilesPerTrigger", perTrigger.toString)
          .parquet(turnsDir).as[Turn]
        val table = new IcebergLikeTable(s"$tmp/table", 64,
          inlineCompaction = inline)
        val (durs, wall) = try {
          val (q, wallSec) = Bench.time {
            val q = Replay.fromCheckpoint(stream, table, s"$tmp/ckpt",
              watermark = "3650 days")
            q.processAllAvailable()
            q
          }
          val d = q.recentProgress.toSeq
            .map(p => p.durationMs.get("triggerExecution").longValue())
          q.stop()
          (d, wallSec)
        } catch { case e: Throwable => Bench.rmrf(tmp); throw e }
        // Deferred mode: drain the accumulated deltas OUTSIDE the
        // latency path and time it — the background-maintenance cost.
        val (_, compactSec) =
          if (inline) (false, 0.0) else Bench.time(table.compact())
        Bench.rmrf(tmp)
        val sorted = durs.sorted
        println(f"""{"mode":"${if (inline) "inline" else "deferred"}",""" +
          f""""turns":$rows,"batches":${durs.size},"wall_sec":$wall%.2f,""" +
          f""""compact_sec":$compactSec%.2f,""" +
          f""""batch_ms_p50":${pct(sorted, 0.50)},""" +
          f""""batch_ms_p95":${pct(sorted, 0.95)},""" +
          f""""batch_ms_p99":${pct(sorted, 0.99)},""" +
          f""""batch_ms_max":${sorted.last}}""")
      }
    } finally Bench.rmrf(turnsDir.stripSuffix("/turns"))
    spark.stop()
  }
}
