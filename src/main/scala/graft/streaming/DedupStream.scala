package graft.streaming

import org.apache.spark.sql.Dataset
import graft.model.Turn

/** In-flight exact dedup for at-least-once upstreams.
  *
  * znap's source redelivers events after reconnects (at-least-once,
  * SURVEY.md §1.3 item 3); its snapshot upsert is idempotent so the
  * VALUE converges — but our fold is richer than last-writer-wins
  * (turn_count, tool_counts), and a redelivered turn would inflate the
  * counters. Dropping re-deliveries of the same (conv_id, turn_idx)
  * before the stateful fold makes the at-least-once source
  * effectively-once end-to-end.
  *
  * State is bounded by the watermark (a key is remembered only while a
  * duplicate could still legally arrive), the same bound every other
  * stateful op in this engine uses — so this adds no unbounded state at
  * 10^12 turns.
  */
object DedupStream {

  def dedupTurns(turns: Dataset[Turn], watermark: String): Dataset[Turn] =
    turns
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")
}
