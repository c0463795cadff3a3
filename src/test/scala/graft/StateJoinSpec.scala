package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.gen.Synthetic
import graft.join.StateJoin
import graft.model.{ConvSnapshot, Turn}

/** Stream-state join semantics (north rule; SURVEY.md §7.5 item 4): the
  * streaming enrich — each turn tagged with the state that preceded it —
  * must equal the batch window-function oracle; the stream-stream join
  * variant matches a hand-computed fixture.
  */
class StateJoinSpec extends SparkSpec {
  import spark.implicits._

  private val params = Synthetic.Params(numConvs = 15, avgTurns = 10,
    hotConvs = 1, hotSize = 60, seed = 31L)
  private def turns: Seq[Turn] =
    (0L until params.numConvs).flatMap(c => Synthetic.genConv(c, params))

  test("streaming enrich equals batch lag/count oracle, across batch splits") {
    val input = MemoryStream[Turn](spark)
    val q = StateJoin.enriched(input.toDS(), "1 day").writeStream
      .outputMode("append").format("memory").queryName("enrich_out").start()
    turns.grouped(37).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val got = spark.table("enrich_out")
      .select($"conv_id", $"turn_idx", $"prev_turn_count",
        $"prev_last_turn_idx", $"prev_last_role")
      .as[(String, Int, Long, Int, String)].collect().toSet

    val w = Window.partitionBy($"conv_id").orderBy($"turn_idx", $"ts")
    val exp = spark.createDataset(turns)
      .withColumn("prev_turn_count", row_number().over(w).cast("long") - 1)
      .withColumn("prev_last_turn_idx",
        coalesce(lag($"turn_idx", 1).over(w), lit(-1)))
      .withColumn("prev_last_role",
        coalesce(lag($"role", 1).over(w), lit("")))
      .select($"conv_id", $"turn_idx", $"prev_turn_count",
        $"prev_last_turn_idx", $"prev_last_role")
      .as[(String, Int, Long, Int, String)].collect().toSet
    assert(got === exp)
  }

  test("stream-stream join matches fixture semantics") {
    val base = Synthetic.BaseEpochMs
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    val turnStream = MemoryStream[Turn](spark)
    val updateStream = MemoryStream[ConvSnapshot](spark)
    val joined = StateJoin.joinUpdates(
      turnStream.toDS(), updateStream.toDS(), watermark = "10 minutes",
      within = "1 hour")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()

    def snap(conv: String, idx: Int, n: Long, atMin: Long) =
      ConvSnapshot(conv, idx, "user", "", "x", n, Map.empty, ts(0), ts(atMin))
    // state for conv a exists at minute 5; turns arrive at minute 10 (joins)
    // and minute 80 (outside the 1h window → no match); conv c has no state.
    updateStream.addData(snap("a", 0, 1L, 5))
    turnStream.addData(
      Turn("a", 1, "assistant", "y", "", ts(10)),
      Turn("a", 2, "user", "z", "", ts(80)),
      Turn("c", 0, "user", "w", "", ts(10)))
    q.processAllAvailable()
    // advance both watermarks far enough to close and emit
    updateStream.addData(snap("zz", 0, 1L, 1000))
    turnStream.addData(Turn("zz", 9, "user", "", "", ts(1000)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssjoin_out")
      .select($"conv_id", $"turn_idx", $"state_turn_idx", $"state_turn_count")
      .as[(String, Int, Int, Long)].collect().toSet
    assert(got.contains(("a", 1, 0, 1L)), s"expected a/1 joined, got $got")
    assert(!got.exists(r => r._1 == "a" && r._2 == 2), "turn outside window must not join")
    assert(!got.exists(_._1 == "c"), "conv without state must not join (inner)")
  }
}
