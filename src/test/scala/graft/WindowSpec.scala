package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.gen.Synthetic
import graft.model.Turn
import graft.windows.WindowedAggs

/** Windowed aggregates: streaming == batch on the same data (FIXTURES.md §5
  * — the batch form is the oracle), session-window semantics vs a hand
  * computation, conservation checks.
  */
class WindowSpec extends SparkSpec {
  import spark.implicits._

  private val params = Synthetic.Params(numConvs = 25, avgTurns = 12,
    hotConvs = 1, hotSize = 150, seed = 23L)
  private def turns: Seq[Turn] =
    (0L until params.numConvs).flatMap(c => Synthetic.genConv(c, params))

  test("streaming tumbling agg (complete mode) equals batch agg") {
    val input = MemoryStream[Turn](spark)
    val q = WindowedAggs.tumblingTurnRate(input.toDS().toDF()).writeStream
      .outputMode("complete").format("memory").queryName("tumbling_out").start()
    turns.grouped(80).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val got = spark.table("tumbling_out")
      .select($"window_start", $"n_turns", $"approx_convs")
      .as[(Timestamp, Long, Long)].collect().toSet
    val exp = WindowedAggs.tumblingTurnRate(spark.createDataset(turns).toDF())
      .select($"window_start", $"n_turns", $"approx_convs")
      .as[(Timestamp, Long, Long)].collect().toSet
    assert(got === exp)
  }

  test("session windows match hand-computed gaps-and-islands") {
    val base = Synthetic.BaseEpochMs
    def t(conv: String, idx: Int, offMin: Long) =
      Turn(conv, idx, "user", "x", "", new Timestamp(base + offMin * 60000L))
    // conv a: turns at 0,10,20 (one session), 60 (new: gap 40 >= 30)
    // conv b: turns at 0, 29.9' (merge), 59.9' (merge again: gap 30' - 6s)
    val fixture = Seq(
      t("a", 0, 0), t("a", 1, 10), t("a", 2, 20), t("a", 3, 60),
      Turn("b", 0, "user", "x", "", new Timestamp(base)),
      Turn("b", 1, "user", "x", "", new Timestamp(base + 29 * 60000L + 54000L)),
      Turn("b", 2, "user", "x", "", new Timestamp(base + 59 * 60000L + 48000L)))
    val got = WindowedAggs.sessionsPerConv(spark.createDataset(fixture).toDF())
      .select($"conv_id", $"session_start", $"session_end", $"n_turns")
      .as[(String, Timestamp, Timestamp, Long)].collect().toSet
    val exp = Set(
      ("a", new Timestamp(base), new Timestamp(base + 50 * 60000L), 3L),
      ("a", new Timestamp(base + 60 * 60000L), new Timestamp(base + 90 * 60000L), 1L),
      ("b", new Timestamp(base), new Timestamp(base + 89 * 60000L + 48000L), 3L))
    assert(got === exp)
  }

  test("tool usage conserves the total number of tool-bearing turns") {
    val df = spark.createDataset(turns).toDF()
    val total = WindowedAggs.toolUsage(df).agg(sum($"n_calls")).as[Long].head()
    assert(total === turns.count(_.tool.nonEmpty))
  }

  test("sliding windows count each turn width/slide times") {
    val df = spark.createDataset(turns).toDF()
    val total = WindowedAggs.slidingTurnRate(df).agg(sum($"n_turns")).as[Long].head()
    assert(total === 2L * turns.size) // 10min window / 5min slide = 2 windows per turn
  }
}
