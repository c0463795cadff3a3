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

  /** Salted equi-join for a skewed probe side joining a replicable dim
    * side — the MANUAL analog of AQE skew-join splitting, for the places
    * AQE can't re-plan (streaming micro-batches pin their shuffle layout;
    * broadcast-unable mid-size dims; stateful joins). The skewed side
    * computes salt = pmod(hash(saltCols), salts) — deterministic, so
    * replays are stable — and the dim side replicates each row to ALL
    * `salts` salt values; the join key becomes (keys..., salt), spreading
    * a hot key over `salts` reducers. Result set is identical to the
    * unsalted join (every skewed row still meets every same-key dim row,
    * exactly once, in its salt slice); cost is dim × salts replication —
    * pick salts ≈ hot-key-rows / average-partition-rows.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String],
      saltCols: Seq[String], salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val left = skewed.withColumn("__salt",
      pmod(hash(saltCols.map(col): _*), lit(salts)))
    val right = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    left.join(right, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Salted batch snapshot fold, semantically identical to
    * [[graft.snapshot.SnapshotFold.batchSnapshots]]. With
    * `includeToolCounts` the histogram — the actually skew-prone
    * aggregate — also runs two-phase: per-(conv_id, salt, tool) partials,
    * summed per (conv_id, tool), then recombined into one canonical map
    * per key (the same merge [[graft.snapshot.SnapshotTtl]] does across
    * generations).
    */
  def saltedBatchSnapshots(turns: DataFrame, salts: Int = 16,
      includeToolCounts: Boolean = false): DataFrame = {
    val salted = turns.withColumn("__salt",
      pmod(hash(col("conv_id"), col("turn_idx")), lit(salts)))
    val partial = salted.groupBy(col("conv_id"), col("__salt")).agg(
      graft.functions.GraftFunctions.latest_by(
        struct(col("turn_idx"), col("role"), col("tool"), col("text"), col("ts")),
        col("turn_idx"), col("ts")).as("last"),
      count(lit(1)).as("turn_count"),
      min(col("ts")).as("first_ts"),
      max(col("ts")).as("last_ts"))
    val base = partial.groupBy(col("conv_id")).agg(
      graft.functions.GraftFunctions.latest_by(col("last"),
        col("last.turn_idx"), col("last.ts")).as("last"),
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
    if (!includeToolCounts) base
    else {
      val tc = salted.filter(col("tool") =!= "")
        .groupBy(col("conv_id"), col("__salt"), col("tool"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("conv_id"), col("tool")).agg(sum(col("cnt")).as("cnt"))
        .groupBy(col("conv_id"))
        .agg(map_from_entries(
          array_sort(collect_list(struct(col("tool"), col("cnt")))))
          .as("tool_counts"))
      base.join(tc, Seq("conv_id"), "left")
        .select(col("conv_id"), col("last_turn_idx"), col("last_role"),
          col("last_tool"), col("last_text"), col("turn_count"),
          coalesce(col("tool_counts"),
            map().cast("map<string,bigint>")).as("tool_counts"),
          col("first_ts"), col("last_ts"))
    }
  }
}
