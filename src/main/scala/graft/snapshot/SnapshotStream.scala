package graft.snapshot

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{ConvSnapshot, Turn}

/** The streaming snapshot pipeline — znap's ingest path restated as
  * Structured Streaming (SURVEY.md §3.1): per-key stateful fold via
  * flatMapGroupsWithState, Update output mode, watermark-bounded late data.
  *
  * znap's per-partition sequential apply (reference:
  * pipeline/PipelineBuilder.scala:106-111) becomes: Spark hash-partitions
  * the stream by conv_id for the stateful op (state is partition-local),
  * and the fold itself sorts each group's batch by (turn_idx, ts) so the
  * result is invariant under arrival order — deterministic where znap is
  * merely convergent (SURVEY.md §1.3).
  */
object SnapshotStream {

  implicit private val snapEnc: Encoder[ConvSnapshot] = Encoders.product[ConvSnapshot]
  implicit private val strEnc: Encoder[String] = Encoders.STRING

  /** The per-group state transition: previous snapshot ⊕ new turns.
    * Emits the group's updated snapshot each batch (Update semantics —
    * exactly znap's per-event upsert, conflated to once per batch).
    *
    * Late-data rule: Spark filters late rows automatically for windowed
    * aggregations but NOT for (flat)MapGroupsWithState — so we apply the
    * drop ourselves against the engine's current event-time watermark
    * (deterministic: watermark = max event ts of prior batches − delay;
    * north rule "same input stream + watermark ⇒ same rows").
    */
  def stateFn(convId: String, turns: Iterator[Turn],
      state: GroupState[ConvSnapshot]): Iterator[ConvSnapshot] = {
    val wm = state.getCurrentWatermarkMs() // 0 when no progress yet
    val onTime = turns.filter(_.ts.getTime >= wm)
    SnapshotFold.fold(state.getOption, onTime) match {
      case Some(s) if !state.getOption.contains(s) =>
        state.update(s); Iterator.single(s)
      case Some(_) => Iterator.empty // nothing survived the late filter
      case None => Iterator.empty
    }
  }

  /** Streaming Dataset of snapshot updates (one row per conv touched in
    * the micro-batch). `watermark` bounds accepted event-time lateness:
    * turns older than (max ts seen − watermark) are dropped
    * deterministically before the stateful op (north rule: "same input
    * stream + watermark").
    */
  def updates(turns: Dataset[Turn], watermark: String = "10 minutes"): Dataset[ConvSnapshot] =
    foldUpdates(turns.withWatermark("ts", watermark))

  /** Fold over a stream whose watermark is already assigned upstream —
    * Spark forbids redefining it, so a pipeline with a prior stateful
    * stage (e.g. [[graft.streaming.DedupStream.dedupTurns]]) composes
    * with this form.
    */
  def foldUpdates(turns: Dataset[Turn]): Dataset[ConvSnapshot] =
    turns
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(stateFn)
}
