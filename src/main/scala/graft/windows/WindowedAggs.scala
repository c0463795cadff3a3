package graft.windows

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregates over the turns schema (FIXTURES.md §5).
  * Each builder works identically on a batch DataFrame and a streaming one
  * (add `.withWatermark("ts", ...)` upstream for append-mode streaming) —
  * the batch form is the oracle for the streaming form in WindowSpec.
  */
object WindowedAggs {

  /** Tumbling turn-rate: turns + distinct conversations per window. */
  def tumblingTurnRate(turns: DataFrame, width: String = "5 minutes"): DataFrame =
    turns.groupBy(window(col("ts"), width))
      .agg(count(lit(1)).as("n_turns"),
        approx_count_distinct(col("conv_id")).as("approx_convs"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_turns"), col("approx_convs"))

  /** Sliding turn-rate. */
  def slidingTurnRate(turns: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    turns.groupBy(window(col("ts"), width, slide))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("window.start").as("window_start"), col("n_turns"))

  /** Session windows per conversation (gap-based). */
  def sessionsPerConv(turns: DataFrame, gap: String = "30 minutes"): DataFrame =
    turns.groupBy(session_window(col("ts"), gap), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("conv_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_turns"))

  /** Tool-usage per window × tool (tool ≠ ""). */
  def toolUsage(turns: DataFrame, width: String = "5 minutes"): DataFrame =
    turns.filter(col("tool") =!= "")
      .groupBy(window(col("ts"), width), col("tool"))
      .agg(count(lit(1)).as("n_calls"))
      .select(col("window.start").as("window_start"), col("tool"), col("n_calls"))
}
