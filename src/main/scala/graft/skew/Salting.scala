package graft.skew

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew handling for hot conversations (north rule; the reference leaves
  * skew unhandled — a hot key hammers one Dynamo partition, SURVEY.md §4.2).
  *
  * Two-phase salted fold: phase 1 groups by (conv_id, salt) where
  * salt = pmod(hash(conv_id, turn_idx), S) — a hot conversation's rows are
  * spread over S reducers and pre-combined; phase 2 merges the ≤S partials
  * per conv_id. The merge is associative/commutative (max_by on
  * (turn_idx, ts), sum of counts, min/max of bounds) so the result is
  * identical to the unsalted fold — asserted in SnapshotFoldSpec
  * ("salted fold equals unsalted fold").
  *
  * At 100 TB: phase 1's shuffle keys are uniform by construction; phase 2
  * shuffles ≤ S rows per conversation. AQE skew-join splitting
  * (spark.sql.adaptive.skewJoin.enabled) covers the join side of the same
  * problem; salting covers aggregation, which AQE does not split.
  */
object Salting {

  /** Salted batch snapshot fold, semantically identical to
    * [[graft.snapshot.SnapshotFold.batchSnapshots]].
    */
  def saltedBatchSnapshots(turns: DataFrame, salts: Int = 16): DataFrame = {
    val salted = turns.withColumn("__salt",
      pmod(hash(col("conv_id"), col("turn_idx")), lit(salts)))
    val partial = salted.groupBy(col("conv_id"), col("__salt")).agg(
      max_by(
        struct(col("turn_idx"), col("role"), col("tool"), col("text"), col("ts")),
        struct(col("turn_idx"), col("ts"))).as("last"),
      count(lit(1)).as("turn_count"),
      min(col("ts")).as("first_ts"),
      max(col("ts")).as("last_ts"))
    partial.groupBy(col("conv_id")).agg(
      max_by(col("last"), struct(col("last.turn_idx"), col("last.ts"))).as("last"),
      sum(col("turn_count")).as("turn_count"),
      min(col("first_ts")).as("first_ts"),
      max(col("last_ts")).as("last_ts"))
      .select(
        col("conv_id"),
        col("last.turn_idx").as("last_turn_idx"),
        col("last.role").as("last_role"),
        col("last.tool").as("last_tool"),
        col("last.text").as("last_text"),
        col("turn_count"), col("first_ts"), col("last_ts"))
  }
}
