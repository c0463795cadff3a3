package graft.ops

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** In-flight metrics + progress/lag observability (SURVEY.md §2 rows O2/H1).
  *
  * The reference hand-rolls Dropwizard meters around every stage
  * (pipeline/PipelineBuilder.scala:59-76,277-307) and a 60-second
  * ProgressChecker comparing stored offsets against the retention window
  * (healthcheck/ProgressChecker.scala:95-146). Structured Streaming emits
  * all of that natively in StreamingQueryProgress — rows/sec, batch
  * durations, per-source start/end/latest offsets, state-store rows — so
  * this listener only records and summarizes.
  */
final class MetricsListener extends StreamingQueryListener {

  final case class BatchProgress(
      batchId: Long,
      numInputRows: Long,
      processedRowsPerSecond: Double,
      durationMs: Long,
      stateRows: Long)

  private val buf = ArrayBuffer[BatchProgress]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = synchronized {
    val p = event.progress
    val stateRows =
      if (p.stateOperators != null && p.stateOperators.nonEmpty)
        p.stateOperators.map(_.numRowsTotal).sum
      else 0L
    buf += BatchProgress(
      p.batchId,
      p.numInputRows,
      if (p.processedRowsPerSecond.isNaN) 0.0 else p.processedRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
      stateRows)
  }

  def batches: Seq[BatchProgress] = synchronized(buf.toSeq)

  /** Total rows / total wall = sustained ingest throughput (rows/sec). */
  def throughput: Double = synchronized {
    val rows = buf.map(_.numInputRows).sum
    val ms = buf.map(_.durationMs).sum
    if (ms == 0) 0.0 else rows.toDouble * 1000.0 / ms.toDouble
  }
}

/** Lag report over the engine's lineage table — znap's ProgressChecker
  * restated: for each partition, how far the committed fold trails the
  * newest available turn (healthcheck/ProgressChecker.scala:148-158 gauges).
  */
object LagReport {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** @param lineage the snapshot table's lineage() frame
    * @param source  the turn log (batch view of the stream)
    */
  def apply(lineage: DataFrame, source: DataFrame): DataFrame = {
    val committed = lineage.groupBy(col("partition_id"))
      .agg(max(col("committed_ts")).as("committed_ts"),
        sum(col("row_count")).as("rows_committed"))
    val newest = source.agg(max(col("ts")).as("newest_ts"))
    committed.crossJoin(newest)
      .withColumn("lag_ms",
        (unix_micros(col("newest_ts")) - unix_micros(col("committed_ts"))) / 1000)
  }
}
