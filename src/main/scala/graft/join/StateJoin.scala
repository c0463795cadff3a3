package graft.join

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{ConvSnapshot, Turn}
import graft.snapshot.SnapshotFold

/** Joining turn events against *prior* snapshot state (north rule:
  * stream-stream stateful join; SURVEY.md §2.2 joins row — the reference
  * has no joins at all, its point lookup Q1 is a get).
  *
  * Two implementations, same semantics, both tested against the batch
  * window-function oracle ("state before turn i" = fold of turns < i):
  *
  *  - [[enriched]]: join-to-state INSIDE flatMapGroupsWithState — the
  *    state store IS the prior snapshot, so the "join" is a local state
  *    read with zero extra shuffle. This is the scale-preferred form: one
  *    hash partitioning by conv_id total.
  *  - [[joinUpdates]]: a genuine stream-stream join of the turn stream
  *    against the snapshot-update stream, watermark-bounded on both sides
  *    so Spark can evict join state.
  */
object StateJoin {

  final case class EnrichedTurn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: String,
      ts: java.sql.Timestamp,
      prev_turn_count: Long,
      prev_last_turn_idx: Int, // -1 when no prior state
      prev_last_role: String)

  implicit private val encE: Encoder[EnrichedTurn] = Encoders.product[EnrichedTurn]
  implicit private val encS: Encoder[String] = Encoders.STRING
  implicit private val encSnap: Encoder[ConvSnapshot] = Encoders.product[ConvSnapshot]

  /** Per-group transition: emit each turn tagged with the state that
    * preceded it (in (turn_idx, ts) order), folding as we go.
    */
  def enrichFn(convId: String, turns: Iterator[Turn],
      state: GroupState[ConvSnapshot]): Iterator[EnrichedTurn] = {
    // same deterministic late-drop rule as SnapshotStream.stateFn
    val wm = state.getCurrentWatermarkMs()
    val sorted = turns.filter(_.ts.getTime >= wm)
      .toArray.sortBy(t => (t.turn_idx, t.ts.getTime))
    val out = new ArrayBuffer[EnrichedTurn](sorted.length)
    var st = state.getOption
    sorted.foreach { t =>
      out += EnrichedTurn(t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts,
        st.map(_.turn_count).getOrElse(0L),
        st.map(_.last_turn_idx).getOrElse(-1),
        st.map(_.last_role).getOrElse(""))
      st = SnapshotFold.fold(st, Iterator.single(t))
    }
    st.foreach(state.update)
    out.iterator
  }

  def enriched(turns: Dataset[Turn], watermark: String = "10 minutes"): Dataset[EnrichedTurn] =
    turns
      .withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(enrichFn)

  /** Stream-stream inner join: each turn matched with snapshot updates for
    * the same conversation whose state time falls within `within` before
    * the turn. Watermarks on both sides bound the buffered state.
    */
  def joinUpdates(turns: Dataset[Turn], updates: Dataset[ConvSnapshot],
      watermark: String = "10 minutes", within: String = "1 hour"): DataFrame =
    turns.withWatermark("ts", watermark).alias("t")
      .join(
        updates.toDF().withWatermark("last_ts", watermark).alias("u"),
        expr(s"""t.conv_id = u.conv_id AND
                 u.last_ts >= t.ts - INTERVAL $within AND
                 u.last_ts <= t.ts"""))
      .select(col("t.conv_id").as("conv_id"), col("t.turn_idx").as("turn_idx"),
        col("t.ts").as("ts"), col("u.last_turn_idx").as("state_turn_idx"),
        col("u.turn_count").as("state_turn_count"))
}
