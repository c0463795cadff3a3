package graft.snapshot

import java.sql.Timestamp
import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.model.{ConvSnapshot, Turn}

/** The snapshot fold — znap's central operator (SURVEY.md §2 row A1):
  * "for each key, keep the latest event" (reference:
  * persistence/dynamo/DynamoDBEventsWriter.scala:25-53, unconditional
  * last-writer-wins put). Ours is a *real* fold: latest turn plus
  * counters, deterministic under any batch slicing because the total
  * order is (conv_id, turn_idx) (SURVEY.md §1.3).
  *
  * Three equivalent forms, all tested against each other:
  *  1. [[fold]] — pure Scala, the semantic definition (streaming state op
  *     uses it inside flatMapGroupsWithState);
  *  2. [[SnapshotAgg]] — typed Aggregator, partial-merge capable (Catalyst
  *     plans a partial aggregation before the shuffle, so only one
  *     pre-combined row per (conv_id, map-partition) crosses the wire);
  *  3. [[batchSnapshots]] — untyped DataFrame form with max_by, fully
  *     codegen'd, for the SQL-oracle checks.
  */
object SnapshotFold {

  /** Canonical, deterministically-ordered tool histogram. */
  def canonMap(m: Map[String, Long]): Map[String, Long] =
    ListMap(m.toSeq.sortBy(_._1): _*)

  /** Pure fold of new turns into (optional) previous state.
    * Turns are sorted by turn_idx (ties by ts) before application, so the
    * result is invariant under arrival order — the determinism the
    * reference only gets per-partition (SURVEY.md §1.3 items 1-2).
    */
  def fold(prev: Option[ConvSnapshot], turns: Iterator[Turn]): Option[ConvSnapshot] = {
    val sorted = turns.toArray.sortBy(t => (t.turn_idx, t.ts.getTime))
    if (sorted.isEmpty) prev
    else {
      val last = sorted.last
      val newTools = sorted.iterator
        .filter(_.tool.nonEmpty)
        .foldLeft(Map.empty[String, Long]) { (m, t) =>
          m.updated(t.tool, m.getOrElse(t.tool, 0L) + 1L)
        }
      prev match {
        case None =>
          Some(ConvSnapshot(
            conv_id = last.conv_id,
            last_turn_idx = last.turn_idx,
            last_role = last.role,
            last_tool = last.tool,
            last_text = last.text,
            turn_count = sorted.length.toLong,
            tool_counts = canonMap(newTools),
            first_ts = sorted.head.ts,
            last_ts = last.ts))
        case Some(s) =>
          val takeNew = last.turn_idx >= s.last_turn_idx
          Some(ConvSnapshot(
            conv_id = s.conv_id,
            last_turn_idx = if (takeNew) last.turn_idx else s.last_turn_idx,
            last_role = if (takeNew) last.role else s.last_role,
            last_tool = if (takeNew) last.tool else s.last_tool,
            last_text = if (takeNew) last.text else s.last_text,
            turn_count = s.turn_count + sorted.length,
            tool_counts = canonMap(newTools.foldLeft(s.tool_counts) {
              case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v)
            }),
            first_ts = if (sorted.head.ts.before(s.first_ts)) sorted.head.ts else s.first_ts,
            last_ts = if (last.ts.after(s.last_ts)) last.ts else s.last_ts))
      }
    }
  }

  /** Timestamp ⇄ epoch-micros without precision loss (Timestamp.getTime
    * is millis-only; the driver tables carry microsecond timestamps).
    */
  def tsToMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Mergeable partial state for the typed Aggregator. `last_sel_ts_us`
    * is the event time of the currently-selected last turn — carried so
    * [[SnapshotAgg.merge]] can tie-break equal turn_idx on (turn_idx, ts)
    * exactly like [[fold]] and [[batchSnapshots]] (otherwise the typed
    * fold would be nondeterministic under duplicate turn_idx values,
    * diverging from the other two forms by partial-merge order).
    */
  final case class Buf(
      conv_id: String,
      last_turn_idx: Int,
      last_sel_ts_us: Long,
      last_role: String,
      last_tool: String,
      last_text: String,
      turn_count: Long,
      tool_counts: Map[String, Long],
      first_ts_us: Long,
      last_ts_us: Long)

  object SnapshotAgg extends Aggregator[Turn, Buf, ConvSnapshot] {
    def zero: Buf =
      Buf("", -1, Long.MinValue, "", "", "", 0L, Map.empty, Long.MaxValue, Long.MinValue)
    def reduce(b: Buf, t: Turn): Buf = {
      val tUs = tsToMicros(t.ts)
      val take = t.turn_idx > b.last_turn_idx ||
        (t.turn_idx == b.last_turn_idx && tUs >= b.last_sel_ts_us)
      Buf(
        conv_id = if (b.conv_id.isEmpty) t.conv_id else b.conv_id,
        last_turn_idx = if (take) t.turn_idx else b.last_turn_idx,
        last_sel_ts_us = if (take) tUs else b.last_sel_ts_us,
        last_role = if (take) t.role else b.last_role,
        last_tool = if (take) t.tool else b.last_tool,
        last_text = if (take) t.text else b.last_text,
        turn_count = b.turn_count + 1L,
        tool_counts =
          if (t.tool.nonEmpty)
            b.tool_counts.updated(t.tool, b.tool_counts.getOrElse(t.tool, 0L) + 1L)
          else b.tool_counts,
        first_ts_us = math.min(b.first_ts_us, tsToMicros(t.ts)),
        last_ts_us = math.max(b.last_ts_us, tsToMicros(t.ts)))
    }
    def merge(a: Buf, b: Buf): Buf = {
      val bWins = b.last_turn_idx > a.last_turn_idx ||
        (b.last_turn_idx == a.last_turn_idx && b.last_sel_ts_us > a.last_sel_ts_us)
      val (hi, lo) = if (bWins) (b, a) else (a, b)
      hi.copy(
        conv_id = if (hi.conv_id.isEmpty) lo.conv_id else hi.conv_id,
        turn_count = a.turn_count + b.turn_count,
        tool_counts = b.tool_counts.foldLeft(a.tool_counts) {
          case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v)
        },
        first_ts_us = math.min(a.first_ts_us, b.first_ts_us),
        last_ts_us = math.max(a.last_ts_us, b.last_ts_us))
    }
    def finish(b: Buf): ConvSnapshot = ConvSnapshot(
      b.conv_id, b.last_turn_idx, b.last_role, b.last_tool, b.last_text,
      b.turn_count, canonMap(b.tool_counts),
      microsToTs(b.first_ts_us), microsToTs(b.last_ts_us))
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[ConvSnapshot] = Encoders.product[ConvSnapshot]
  }

  /** Typed batch snapshot: one shuffle on conv_id, partial-agg before it. */
  def typedSnapshots(turns: Dataset[Turn]): Dataset[ConvSnapshot] = {
    implicit val enc: Encoder[ConvSnapshot] = Encoders.product[ConvSnapshot]
    implicit val se: Encoder[String] = Encoders.STRING
    turns.groupByKey(_.conv_id).agg(SnapshotAgg.toColumn.name("snap"))
      .map(_._2)
  }

  /** Canonical per-key tool histogram as an untyped two-level aggregation:
    * (conv_id, tool) counts — partial-agg'd map-side, so the skew-prone
    * histogram merges distributively — then one map_from_entries over the
    * tool-sorted entry list (the untyped analog of [[canonMap]]).
    */
  def toolCountsByKey(turns: DataFrame): DataFrame =
    turns.filter(col("tool") =!= "")
      .groupBy(col("conv_id"), col("tool")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("conv_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("tool"), col("cnt")))))
        .as("tool_counts"))

  /** Untyped DataFrame form — the oracle shape. The native
    * `latest_by(struct(...), turn_idx, ts)` = last-writer-wins with the
    * deterministic (turn_idx, ts) tie-break, planned as
    * ObjectHashAggregate with map-side partial combine (the earlier
    * `max_by(struct, struct)` planned SortAggregate — round-3 finding;
    * see functions/LatestBy.scala). `includeToolCounts`
    * additionally joins in [[toolCountsByKey]] (two extra conv_id-keyed
    * shuffles) so the untyped form covers EVERY ConvSnapshot field;
    * callers that don't need the histogram keep the single-shuffle plan.
    */
  def batchSnapshots(turns: DataFrame,
      includeToolCounts: Boolean = false): DataFrame = {
    val base = turns.groupBy(col("conv_id")).agg(
      graft.functions.GraftFunctions.latest_by(
        struct(col("turn_idx"), col("role"), col("tool"), col("text")),
        col("turn_idx"), col("ts")).as("last"),
      count(lit(1)).as("turn_count"),
      min(col("ts")).as("first_ts"),
      max(col("ts")).as("last_ts"))
      .select(
        col("conv_id"),
        col("last.turn_idx").as("last_turn_idx"),
        col("last.role").as("last_role"),
        col("last.tool").as("last_tool"),
        col("last.text").as("last_text"),
        col("turn_count"), col("first_ts"), col("last_ts"))
    if (!includeToolCounts) base
    else base.join(toolCountsByKey(turns), Seq("conv_id"), "left")
      .select(col("conv_id"), col("last_turn_idx"), col("last_role"),
        col("last_tool"), col("last_text"), col("turn_count"),
        coalesce(col("tool_counts"),
          map().cast("map<string,bigint>")).as("tool_counts"),
        col("first_ts"), col("last_ts"))
  }
}
