package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Schemas, Turn}
import graft.ops.LagReport
import graft.replay.Replay
import graft.store.IcebergLikeTable

/** The real streaming pipeline run end-to-end inside a query: events →
  * file-stream (multi-batch) → watermark → flatMapGroupsWithState fold →
  * foreachBatch MERGE into the Iceberg-like table → batch read-back.
  * Because the DuckDB oracle checks the RESULT, this is machine-checked
  * proof that the streaming path equals the batch SQL semantics
  * (SURVEY.md §2 rows S1/S4/A1/O1/G2 in one plan).
  */
object StreamQueries {

  /** Map the driver's events table onto the turns schema: user_id is the
    * conversation key, event_id the per-key order (events are generated in
    * ts order, so max event_id == latest ts — same tie-break as the fold).
    */
  private def eventsAsTurns(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id").cast("string").as("conv_id"),
      col("event_id").cast("int").as("turn_idx"),
      col("event_type").as("role"),
      col("props").as("text"),
      lit("").as("tool"),
      col("ts"))

  /** Runs the pipeline into a fresh temp table and returns (table, dir). */
  private def runPipeline(s: SparkSession, d: String): IcebergLikeTable = {
    import s.implicits._
    implicit val sp: SparkSession = s
    val tmp = Files.createTempDirectory("graft-stream-q").toString
    val inDir = s"$tmp/in"
    // 4 range-partitioned files + maxFilesPerTrigger=1 → 4 micro-batches,
    // exercising cross-batch state carry (znap's multi-batch ingest).
    eventsAsTurns(s, d).repartitionByRange(4, col("ts")).write.parquet(inDir)
    val stream = s.readStream.schema(Schemas.turn)
      .option("maxFilesPerTrigger", "1").parquet(inDir).as[Turn]
    val table = new IcebergLikeTable(s"$tmp/table", 8)
    // wide watermark: file arrival order is not ts order, nothing is late
    val q = Replay.fromCheckpoint(stream, table, s"$tmp/ckpt", watermark = "3650 days")
    q.processAllAvailable()
    q.stop()
    table
  }

  /** S1+A1+O1: streaming snapshot, DuckDB-oracled. */
  def s1StreamSnapshot(s: SparkSession, d: String): DataFrame =
    runPipeline(s, d).read().select(
      col("conv_id"),
      col("last_turn_idx").cast("long").as("last_turn_idx"),
      col("last_role"),
      col("turn_count"),
      unix_micros(col("first_ts")).as("first_ts_us"),
      unix_micros(col("last_ts")).as("last_ts_us"))

  val s1StreamSnapshotSql: String =
    """WITH t AS (SELECT CAST(user_id AS VARCHAR) AS conv_id,
                         event_id AS turn_idx, event_type AS role, ts
                  FROM events),
       r AS (SELECT conv_id, turn_idx, role, row_number() OVER
               (PARTITION BY conv_id ORDER BY turn_idx DESC) AS rn FROM t),
       a AS (SELECT conv_id, count(*) AS turn_count,
                    min(epoch_us(ts)) AS first_ts_us,
                    max(epoch_us(ts)) AS last_ts_us
             FROM t GROUP BY conv_id)
       SELECT a.conv_id, r.turn_idx AS last_turn_idx, r.role AS last_role,
              a.turn_count, a.first_ts_us, a.last_ts_us
       FROM a JOIN r ON a.conv_id = r.conv_id AND r.rn = 1"""

  /** Typed-Aggregator surface (SURVEY.md §2.2 UDAF row): the same fold as
    * the streaming pipeline, run as a batch `Aggregator[Turn,Buf,Snap]` —
    * shares the s1 oracle, so Aggregator == streaming == SQL.
    */
  def aggTypedFold(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.snapshot.SnapshotFold.typedSnapshots(eventsAsTurns(s, d).as[Turn])
      .toDF().select(
        col("conv_id"),
        col("last_turn_idx").cast("long").as("last_turn_idx"),
        col("last_role"),
        col("turn_count"),
        unix_micros(col("first_ts")).as("first_ts_us"),
        unix_micros(col("last_ts")).as("last_ts_us"))
  }

  /** O1/H1 exhibit: per-batch lineage + lag of the same run (rows-only:
    * per-batch partition stats depend on the runner's core count).
    */
  def o1Lineage(s: SparkSession, d: String): DataFrame =
    runPipeline(s, d).lineage()

  def h1Lag(s: SparkSession, d: String): DataFrame = {
    val table = runPipeline(s, d)
    LagReport(table.lineage(), eventsAsTurns(s, d))
  }
}
