package graft.snapshot

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import graft.model.{ConvSnapshot, Turn}

/** The snapshot fold on Spark 4's `transformWithState` API — the
  * successor to [[SnapshotStream]]'s flatMapGroupsWithState form, same
  * semantics (znap's per-key latest-event upsert, reference:
  * pipeline/PipelineBuilder.scala:106-111), different state runtime:
  *
  *  - State lives in named, Encoder-typed [[ValueState]] handles inside
  *    the RocksDB state store (transformWithState requires the RocksDB
  *    provider) — at 10^8 conversations the fold's state is off-heap
  *    and incrementally checkpointed (changelog), where the fMGWS
  *    HDFS-backed default holds the map on-heap per partition.
  *  - Watermark-based late-row filtering uses the SAME rule as
  *    [[SnapshotStream.stateFn]]: rows older than the engine watermark
  *    are dropped deterministically before touching state (north rule:
  *    "same input stream + watermark ⇒ same rows"). TWS hands the
  *    watermark to the processor via [[TimerValues]] instead of
  *    `GroupState.getCurrentWatermarkMs`.
  *  - State schema evolves independently of the query plan (named state
  *    variables + per-variable encoders), so adding a counter to the
  *    snapshot does not invalidate the checkpoint wholesale — the
  *    operational gap that forces fMGWS pipelines into full rebuilds.
  *
  * Both folds delegate to [[SnapshotFold.fold]], so streaming ≡ batch ≡
  * TWS is one shared transition function checked by one oracle.
  */
object SnapshotTws {

  implicit private val snapEnc: Encoder[ConvSnapshot] = Encoders.product[ConvSnapshot]
  implicit private val strEnc: Encoder[String] = Encoders.STRING

  /** Per-conversation processor: previous snapshot ⊕ new turns, emit the
    * updated snapshot once per batch the key appears in (Update
    * semantics — znap's per-event upsert conflated to per batch).
    */
  final class SnapshotProcessor
      extends StatefulProcessor[String, Turn, ConvSnapshot] {

    @transient private var snap: ValueState[ConvSnapshot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      snap = getHandle.getValueState[ConvSnapshot](
        "snap", snapEnc, TTLConfig.NONE)

    override def handleInputRows(convId: String, turns: Iterator[Turn],
        timers: TimerValues): Iterator[ConvSnapshot] = {
      val wm = timers.getCurrentWatermarkInMs() // 0 when no progress yet
      val onTime = turns.filter(_.ts.getTime >= wm)
      val prev = if (snap.exists()) Some(snap.get()) else None
      SnapshotFold.fold(prev, onTime) match {
        case Some(s) if !prev.contains(s) =>
          snap.update(s); Iterator.single(s)
        case _ => Iterator.empty // nothing survived the late filter
      }
    }
  }

  /** Streaming Dataset of snapshot updates (one row per conv touched in
    * the micro-batch), event-time mode, watermark-bounded lateness.
    */
  def updates(turns: Dataset[Turn],
      watermark: String = "10 minutes"): Dataset[ConvSnapshot] =
    turns.withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .transformWithState(new SnapshotProcessor,
        TimeMode.EventTime, OutputMode.Update, snapEnc)

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** RocksDB provider tuning applied alongside the provider switch:
    *  - trackTotalNumberOfRows=false — with tracking on, every put/delete
    *    pays an extra point GET to maintain the numRows metric; the
    *    metric is observability-only (no query reads it), so the state
    *    path should not tax every write for it (guide §1.2 per-task work).
    *  - changelogCheckpointing — commits upload the per-batch changelog
    *    instead of snapshotting SST files every commit; snapshots happen
    *    in the background at minDeltasForSnapshot cadence. This is the
    *    documented production setting for commit-heavy stateful queries
    *    and is semantics-neutral (checkpoint format only).
    * Values are restored after `body`, like the provider itself.
    */
  private val Tuning = Seq(
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  /** Run `body` with the RocksDB state-store provider set (required by
    * transformWithState), restoring the previous provider after.
    */
  def withRocksDb[T](s: SparkSession)(body: => T): T = {
    val keys = ProviderKey +: Tuning.map(_._1)
    val olds = keys.map(k => k -> s.conf.getOption(k))
    s.conf.set(ProviderKey, RocksDb)
    Tuning.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
