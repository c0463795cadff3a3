package graft

import java.sql.Timestamp
import graft.ops.LagReport

/** H1 lag arithmetic on hand-built frames with known values — the
  * ProgressChecker analog must report exactly (newest source ts − max
  * committed ts) per partition (reference:
  * healthcheck/ProgressChecker.scala:148-158 gauges).
  */
class LagReportSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("lag is newest-source minus max-committed per partition, in ms") {
    val lineage = Seq(
      // (batch_id, partition_id, row_count, committed_ts)
      (0L, 0, 10L, ts(100)),
      (1L, 0, 5L, ts(160)),  // partition 0 committed through t=160
      (0L, 1, 7L, ts(90))    // partition 1 committed through t=90
    ).toDF("batch_id", "partition_id", "row_count", "committed_ts")
    val source = Seq(ts(50), ts(200)).toDF("ts") // newest available: t=200
    val byPart = LagReport(lineage, source)
      .select($"partition_id", $"rows_committed", $"lag_ms")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byPart(0) === ((15L, 40000.0)))  // 200-160 = 40s behind
    assert(byPart(1) === ((7L, 110000.0))) // 200-90 = 110s behind
  }
}
