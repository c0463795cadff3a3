package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._
import graft.model.{ConvSnapshot, Turn}
import graft.ops.MetricsListener
import graft.snapshot.{SnapshotFold, SnapshotTtl}
import graft.store.IcebergLikeTable

/** Bounded-state fold: TTL eviction must shrink the state store, and the
  * additive-generation read must reproduce the unbounded fold EXACTLY,
  * including for conversations that return after eviction (the failure
  * mode a naive TTL silently gets wrong: counters reset to the last
  * generation only).
  */
class SnapshotTtlSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private val genSchema = StructType(Seq(
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

  private def newTable(dir: String) =
    new IcebergLikeTable(s"$dir/table", 4, keyCol = "row_key",
      emptySchema = genSchema)

  private def turn(conv: String, idx: Int, minute: Long, tool: String = "") =
    Turn(conv, idx, "user", s"$conv-t$idx", tool,
      new Timestamp(Synthetic.BaseEpochMs + minute * 60000L))
  private object Synthetic { val BaseEpochMs = graft.gen.Synthetic.BaseEpochMs }

  private def expected(turns: Seq[Turn]): Map[String, ConvSnapshot] =
    turns.groupBy(_.conv_id).map { case (k, ts) =>
      k -> SnapshotFold.fold(None, ts.iterator).get
    }

  private def runTtl(batches: Seq[Seq[Turn]], dir: String,
      ttlMinutes: Long, watermark: String = "1 minute"): (IcebergLikeTable, MetricsListener) = {
    val table = newTable(dir)
    val input = MemoryStream[Turn](spark)
    val metrics = new MetricsListener
    spark.streams.addListener(metrics)
    try {
      val q = SnapshotTtl.updates(input.toDS(), watermark, ttlMinutes * 60000L)
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(SnapshotTtl.sink(table) _)
        .start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
    } finally spark.streams.removeListener(metrics)
    (table, metrics)
  }

  private def readBack(table: IcebergLikeTable): Map[String, ConvSnapshot] =
    SnapshotTtl.readAdditive(table).as[ConvSnapshot].collect()
      .map(x => x.conv_id -> x).toMap

  test("a conversation returning AFTER eviction recombines exactly (counters, tools, bounds)") {
    // conv A: turns at t=0..2, then idle while B advances the watermark
    // far past A's ttl timeout, then A RETURNS at t=120 with more turns.
    val b1 = Seq(turn("A", 0, 0, "search"), turn("A", 1, 2, "code"),
      turn("B", 0, 1))
    val b2 = Seq(turn("B", 1, 60)) // watermark → ~59min; A(ttl=30m@t2) evicts
    val b3 = Seq(turn("B", 2, 61)) // timeout processing batch
    val b4 = Seq(turn("A", 2, 120, "search"), turn("A", 3, 121),
      turn("B", 3, 122))
    val all = b1 ++ b2 ++ b3 ++ b4
    val (table, _) = runTtl(Seq(b1, b2, b3, b4), tmpDir("ttlreturn"), ttlMinutes = 30)

    // the raw table must hold TWO generations for A — otherwise nothing
    // was evicted and the test is vacuous
    val gensA = table.read().where($"conv_id" === "A")
      .select($"gen").distinct().count()
    assert(gensA === 2, s"expected 2 generations for A, got $gensA (no eviction?)")

    assert(readBack(table) === expected(all),
      "additive read diverged from the unbounded batch fold")
  }

  test("TTL eviction shrinks the state store (bounded state)") {
    // 50 convs appear once early; one long-liver keeps the stream going.
    val early = (0 until 50).map(i => turn(s"c$i", 0, 0))
    val b1 = early :+ turn("live", 0, 1)
    val later = (1 to 5).map(i => Seq(turn("live", i, 100 + i * 10L)))
    val (_, metrics) = runTtl(Seq(b1) ++ later, tmpDir("ttlshrink"), ttlMinutes = 30)
    val stateRows = metrics.batches.map(_.stateRows)
    assert(stateRows.max >= 51, s"state never held the early convs: $stateRows")
    assert(stateRows.last <= 2,
      s"state not evicted — still ${stateRows.last} rows at end: $stateRows")
  }

  test("with TTL larger than the stream span, additive read equals the plain fold (no eviction)") {
    val p = graft.gen.Synthetic.Params(numConvs = 20, avgTurns = 6,
      hotConvs = 1, hotSize = 40, seed = 3L)
    val turns = (0L until p.numConvs).flatMap(c => graft.gen.Synthetic.genConv(c, p))
    // wide watermark: generator batches are conv-ordered, not time-ordered
    val (table, _) = runTtl(turns.grouped(50).toSeq, tmpDir("ttlwide"),
      ttlMinutes = 1000000L, watermark = "3650 days")
    assert(readBack(table) === expected(turns))
    // no eviction → exactly one generation per conv
    assert(table.read().select($"conv_id", $"gen").distinct().count() ===
      table.read().select($"conv_id").distinct().count())
  }
}
