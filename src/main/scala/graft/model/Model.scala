package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Core data model of the engine (SURVEY.md §1).
  *
  * The reference (fogfish/znap) folds a partitioned, offset-addressable
  * event stream into a key/value snapshot `key -> latest event`
  * (reference: persistence/dynamo/DynamoDBEventsWriter.scala:32-53).
  * Our payload is typed: multi-turn conversation transcripts
  * (BASELINE.json `input_hint`), so znap's schemaless JsonNode becomes
  * the fixed [[Turn]] schema and the snapshot value becomes the typed
  * [[ConvSnapshot]] fold state.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // "" = none (kept non-null for deterministic hashing)
    ts: Timestamp)

/** Snapshot state per conversation — a *real* fold (latest turn plus
  * counters), strictly stronger than znap's "latest event only"
  * (reference: DynamoDBEventsWriter.scala:36-47 stores just the event).
  */
final case class ConvSnapshot(
    conv_id: String,
    last_turn_idx: Int,
    last_role: String,
    last_tool: String,
    last_text: String,
    turn_count: Long,
    tool_counts: Map[String, Long],
    first_ts: Timestamp,
    last_ts: Timestamp)

/** One GENERATION of a conversation's snapshot under the bounded-state
  * (TTL-evicting) fold: cumulative state since the generation's first
  * on-time turn (`gen` = that turn's event time in epoch micros). A
  * conversation idle past the TTL is evicted from the state store; if it
  * returns, a NEW generation starts from zero — the table's additive
  * read ([[graft.snapshot.SnapshotTtl]]) recombines generations into the
  * exact unbounded-state snapshot.
  */
final case class ConvSnapshotGen(
    conv_id: String,
    gen: Long,
    last_turn_idx: Int,
    last_role: String,
    last_tool: String,
    last_text: String,
    turn_count: Long,
    tool_counts: Map[String, Long],
    first_ts: Timestamp,
    last_ts: Timestamp)

/** Per-partition, per-batch lineage record — the observability analog of
  * znap's offset store + ProgressChecker gauges
  * (reference: persistence/dynamo/DynamoDBOffsetWriter.scala:23-31,
  * healthcheck/ProgressChecker.scala:148-158). `committed_ts` is taken
  * from batch data (max ts), never the wall clock, for determinism.
  */
final case class LineageRecord(
    batch_id: Long,
    partition_id: Int,
    min_conv_id: String,
    min_turn_idx: Int,
    max_conv_id: String,
    max_turn_idx: Int,
    row_count: Long,
    committed_ts: Timestamp)

/** Change-notification side output — znap's SQS signalling
  * (reference: pipeline/PipelineBuilder.scala:219-246; publish types
  * keys-only / events / events-compressed, config/SnapshotPipeline.scala:51-56).
  */
final case class Signal(
    batch_id: Long,
    conv_id: String,
    publish_type: String, // "keys" | "events" | "events-compressed"
    payload: String)

object Schemas {
  val turn: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tool", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  /** TTL-mode generation rows as stored (keyed by row_key = conv:gen). */
  val snapshotGen: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("gen", LongType, nullable = false),
    StructField("last_turn_idx", IntegerType, nullable = false),
    StructField("last_role", StringType, nullable = false),
    StructField("last_tool", StringType, nullable = false),
    StructField("last_text", StringType, nullable = false),
    StructField("turn_count", LongType, nullable = false),
    StructField("tool_counts", MapType(StringType, LongType), nullable = false),
    StructField("first_ts", TimestampType, nullable = false),
    StructField("last_ts", TimestampType, nullable = false),
    StructField("row_key", StringType, nullable = false)))

  val lineage: StructType = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("partition_id", IntegerType, nullable = false),
    StructField("min_conv_id", StringType, nullable = false),
    StructField("min_turn_idx", IntegerType, nullable = false),
    StructField("max_conv_id", StringType, nullable = false),
    StructField("max_turn_idx", IntegerType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("committed_ts", TimestampType, nullable = false)))

  val signal: StructType = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("conv_id", StringType, nullable = false),
    StructField("publish_type", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  val snapshot: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("last_turn_idx", IntegerType, nullable = false),
    StructField("last_role", StringType, nullable = false),
    StructField("last_tool", StringType, nullable = false),
    StructField("last_text", StringType, nullable = false),
    StructField("turn_count", LongType, nullable = false),
    StructField("tool_counts", MapType(StringType, LongType), nullable = false),
    StructField("first_ts", TimestampType, nullable = false),
    StructField("last_ts", TimestampType, nullable = false)))
}
