package graft.sink

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.ConvSnapshot
import graft.store.IcebergLikeTable

/** Exactly-once snapshot sink (SURVEY.md §7.3): `foreachBatch` handler
  * performing an idempotent keyed MERGE into an [[IcebergLikeTable]],
  * plus per-partition lineage and change-signal side outputs committed in
  * the SAME atomic manifest swap.
  *
  * Ordering contract vs the reference: znap writes data, then signals,
  * then offsets (pipeline/PipelineBuilder.scala:106-111) so a crash never
  * acknowledges unwritten data. Structured Streaming writes the batch's
  * offset intent before foreachBatch and the commit log after it returns;
  * our batchId guard makes redelivery of the same batch a no-op, so the
  * composite is exactly-once end-to-end.
  */
object MergeSink {

  /** Lineage: per-partition stats of the update batch
    * (znap analogs: offset store DynamoDBOffsetWriter.scala:23-31 +
    * ProgressChecker gauges :148-158). committed_ts comes from batch data
    * (max last_ts), never the wall clock — deterministic in tests.
    *
    * `shard` picks the partitioning lineage is tracked against. The
    * default — the physical spark partition — mirrors znap's per-runner
    * offsets but is meaningless across cluster sizes; production should
    * pass a LOGICAL key shard (e.g. `pmod(hash(key), n)`), the analog of
    * znap's per-Kinesis/Nakadi-partition offset rows: stable across
    * executor counts, re-plans, and replays, so a lag/progress dashboard
    * keyed on it survives a cluster resize (and the o1/h1 oracle rows
    * become runner-independent).
    */
  def lineageOf(updates: DataFrame, batchId: Long,
      shard: Column = spark_partition_id().cast("long")): DataFrame =
    updates
      .groupBy(shard.as("partition_id"))
      .agg(
        min(struct(col("conv_id"), col("last_turn_idx"))).as("mn"),
        max(struct(col("conv_id"), col("last_turn_idx"))).as("mx"),
        count(lit(1)).as("row_count"),
        max(col("last_ts")).as("committed_ts"))
      .select(
        lit(batchId).as("batch_id"),
        col("partition_id"),
        col("mn.conv_id").as("min_conv_id"),
        col("mn.last_turn_idx").as("min_turn_idx"),
        col("mx.conv_id").as("max_conv_id"),
        col("mx.last_turn_idx").as("max_turn_idx"),
        col("row_count"),
        col("committed_ts"))

  /** Signals: change notifications for every key touched in the batch
    * (reference publish types keys / events / events-compressed,
    * config/SnapshotPipeline.scala:51-56; gzip+base64 payload
    * utils/Compressor.scala:27-42).
    */
  def signalsOf(updates: DataFrame, batchId: Long, publishType: String): DataFrame = {
    val payload = publishType match {
      case "keys" => col("conv_id")
      case "events" => to_json(struct(col("conv_id"), col("last_turn_idx"),
        col("last_role"), col("last_text")))
      // gzip+base64 of the event JSON — consumers recover the event by
      // base64-decode + gunzip, like the reference's Compressor
      // (utils/Compressor.scala:27-42). A digest here would be
      // unrecoverable and useless to a signal consumer.
      case "events-compressed" => graft.functions.GzipCodec.gzipB64(
        to_json(struct(col("conv_id"), col("last_turn_idx"),
          col("last_role"), col("last_text"))))
      case other => throw new IllegalArgumentException(
        s"unknown publishType '$other' (expected keys|events|events-compressed)")
    }
    updates.select(
      lit(batchId).as("batch_id"),
      col("conv_id"),
      lit(publishType).as("publish_type"),
      payload.as("payload"))
  }

  /** The foreachBatch handler. Usage:
    * {{{
    * SnapshotStream.updates(turns).writeStream
    *   .outputMode("update")
    *   .option("checkpointLocation", ckpt)
    *   .foreachBatch(MergeSink(table))
    *   .start()
    * }}}
    */
  def apply(table: IcebergLikeTable, publishType: String = "keys",
      lineageShard: Option[Column] = None)(
      batch: Dataset[ConvSnapshot], batchId: Long): Unit = {
    val df = batch.toDF()
    // Persist BEFORE the emptiness probe: the probe is an action, and on
    // an unpersisted batch frame it re-executed the whole stateful
    // micro-batch plan (fold + state-store reads) once for the probe and
    // once more for the merge consumers — every batch paid the fold
    // twice (guide §1.2: don't compute things you throw away). Persisted,
    // the probe fills the cache and merge/lineage/signals read it.
    df.persist()
    try {
      if (!df.isEmpty) {
        val shard = lineageShard.getOrElse(spark_partition_id().cast("long"))
        table.merge(df, "conv_id", batchId,
          lineageDf = Some(lineageOf(df, batchId, shard)),
          signalsDf = Some(signalsOf(df, batchId, publishType)))
        ()
      }
    } finally df.unpersist()
  }
}
