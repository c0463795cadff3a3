package graft.snapshot

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{ConvSnapshot, ConvSnapshotGen, Turn}
import graft.store.IcebergLikeTable

/** Bounded-state snapshot fold — the 10^12-turn answer to the default
  * pipeline's `GroupStateTimeout.NoTimeout`, whose state store holds every
  * conversation ever seen and therefore grows without bound over the
  * stream's lifetime.
  *
  * Mechanism: event-time TTL. Each group arms a timeout at
  * `last event ts + ttl`; when the watermark passes it, the state is
  * REMOVED (the snapshot is already durable in the table — eviction loses
  * nothing). State size is then bounded by conversations active within
  * the trailing TTL window, independent of stream age.
  *
  * Correctness under re-arrival: a conversation returning after eviction
  * starts a fresh GENERATION (gen = first on-time turn's event-time
  * micros) whose counters restart from zero. Every turn is folded into
  * exactly one generation, so the true snapshot is recoverable exactly:
  *   - latest fields  = the row holding the globally-latest turn
  *     (max (last_turn_idx, last_ts) across generations — NOT max gen: a
  *     within-watermark late turn can open a generation that is older
  *     than an evicted one);
  *   - turn_count     = Σ over generations of the generation's count;
  *   - first_ts/last_ts = min/max over generations;
  *   - tool_counts    = key-wise sum over generations.
  * [[readAdditive]] performs that recombination at read; the result is
  * byte-identical to the unbounded fold (asserted in SnapshotTtlSpec and
  * by the `s1_ttl_snapshot` DuckDB-oracled query, which shares the plain
  * s1 oracle).
  *
  * znap never faces this: its "state" lives entirely in DynamoDB and the
  * JVM holds nothing per key (reference:
  * persistence/dynamo/DynamoDBEventsWriter.scala:25-53). Spark's state
  * store is what buys the 20x fold speedup, and TTL+generations is what
  * keeps it bounded at 10^12 turns.
  */
object SnapshotTtl {

  implicit private val genEnc: Encoder[ConvSnapshotGen] = Encoders.product[ConvSnapshotGen]
  implicit private val stEnc: Encoder[GenState] = Encoders.product[GenState]
  implicit private val strEnc: Encoder[String] = Encoders.STRING

  /** State = current generation id + the cumulative fold since its start. */
  final case class GenState(gen: Long, snap: ConvSnapshot)

  private def stateFn(ttlMs: Long)(convId: String, turns: Iterator[Turn],
      state: GroupState[GenState]): Iterator[ConvSnapshotGen] = {
    if (state.hasTimedOut) {
      // idle past TTL: snapshot is durable in the table; free the memory
      state.remove()
      return Iterator.empty
    }
    val wm = state.getCurrentWatermarkMs()
    val onTime = turns.filter(_.ts.getTime >= wm).toArray
    if (onTime.isEmpty) return Iterator.empty
    val prev = state.getOption
    val gen = prev.map(_.gen).getOrElse(
      SnapshotFold.tsToMicros(onTime.minBy(t => (t.ts.getTime, t.turn_idx)).ts))
    SnapshotFold.fold(prev.map(_.snap), onTime.iterator) match {
      case Some(s) =>
        state.update(GenState(gen, s))
        // arm eviction at (newest event this conv has seen) + ttl;
        // fires once the WATERMARK passes it — deterministic in event
        // time, like every other lateness rule in this engine. Spark
        // rejects a timeout at-or-before the current watermark, so clamp
        // (the group is then evicted at the next watermark advance).
        state.setTimeoutTimestamp(math.max(s.last_ts.getTime + ttlMs, wm + 1))
        Iterator.single(ConvSnapshotGen(s.conv_id, gen, s.last_turn_idx,
          s.last_role, s.last_tool, s.last_text, s.turn_count,
          s.tool_counts, s.first_ts, s.last_ts))
      case None => Iterator.empty
    }
  }

  /** Streaming generation updates (one row per touched conv per batch). */
  def updates(turns: Dataset[Turn], watermark: String,
      ttlMs: Long): Dataset[ConvSnapshotGen] =
    turns
      .withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(stateFn(ttlMs))

  /** Sink handler: rows are keyed by (conv_id, gen) in the table — the
    * within-generation MERGE stays plain last-writer-wins.
    */
  def sink(table: IcebergLikeTable)(
      batch: Dataset[ConvSnapshotGen], batchId: Long): Unit = {
    val df = batch.toDF()
    // persist before the emptiness probe — see MergeSink.apply: the probe
    // otherwise re-executes the stateful micro-batch plan
    df.persist()
    try {
      if (!df.isEmpty) {
        table.merge(
          df.withColumn("row_key",
            concat_ws(":", col("conv_id"), col("gen"))),
          table.keyCol, batchId)
        ()
      }
    } finally df.unpersist()
  }

  /** Recombine generations into the exact snapshot (see class doc). */
  def readAdditive(table: IcebergLikeTable): DataFrame = {
    val gens = table.read() // one row per (conv_id, gen), already LWW-resolved
    val heads = gens.groupBy(col("conv_id")).agg(
      max_by(
        struct(col("last_turn_idx"), col("last_role"), col("last_tool"),
          col("last_text")),
        struct(col("last_turn_idx"), col("last_ts"), col("gen"))).as("last"),
      sum(col("turn_count")).as("turn_count"),
      min(col("first_ts")).as("first_ts"),
      max(col("last_ts")).as("last_ts"))
    // key-wise sum of the per-generation tool histograms, deterministic
    // map ordering via sort_array (the canonMap analog)
    val tools = gens
      .select(col("conv_id"), explode(col("tool_counts")).as(Seq("tool", "n")))
      .groupBy(col("conv_id"), col("tool")).agg(sum(col("n")).as("n"))
      .groupBy(col("conv_id"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("tool"), col("n")))))
        .as("tool_counts"))
    heads.join(tools, Seq("conv_id"), "left").select(
      col("conv_id"),
      col("last.last_turn_idx").as("last_turn_idx"),
      col("last.last_role").as("last_role"),
      col("last.last_tool").as("last_tool"),
      col("last.last_text").as("last_text"),
      col("turn_count"),
      coalesce(col("tool_counts"),
        map().cast("map<string,bigint>")).as("tool_counts"),
      col("first_ts"), col("last_ts"))
  }
}
