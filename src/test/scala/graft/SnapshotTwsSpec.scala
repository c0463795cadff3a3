package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.gen.Synthetic
import graft.model.{ConvSnapshot, Turn}
import graft.sink.MergeSink
import graft.snapshot.{SnapshotFold, SnapshotStream, SnapshotTws}
import graft.store.IcebergLikeTable

/** transformWithState fold (SnapshotTws) carries the same promises as the
  * fMGWS fold it succeeds: streaming == batch, invariance under
  * micro-batch slicing, checkpoint resume equality — plus cross-API
  * equivalence (TWS == fMGWS on identical input), since both delegate to
  * SnapshotFold.fold.
  */
class SnapshotTwsSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private val params = Synthetic.Params(numConvs = 30, avgTurns = 8,
    hotConvs = 1, hotSize = 120, seed = 23L)
  private def allTurns: Seq[Turn] =
    (0L until params.numConvs).flatMap(c => Synthetic.genConv(c, params))

  private def expected(turns: Seq[Turn]): Map[String, ConvSnapshot] =
    turns.groupBy(_.conv_id).map { case (k, ts) =>
      k -> SnapshotFold.fold(None, ts.iterator).get
    }

  private def tableSnapshots(table: IcebergLikeTable): Map[String, ConvSnapshot] =
    table.read().as[ConvSnapshot].collect().map(s => s.conv_id -> s).toMap

  private def runTws(batches: Seq[Seq[Turn]], dir: String,
      watermark: String = "1 day"): IcebergLikeTable =
    SnapshotTws.withRocksDb(spark) {
      val table = new IcebergLikeTable(s"$dir/table", 8)
      val input = MemoryStream[Turn](spark)
      val q = SnapshotTws.updates(input.toDS(), watermark).writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(MergeSink(table) _)
        .start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
      table
    }

  test("TWS snapshot equals batch fold, invariant under slicing") {
    val turns = allTurns
    val exp = expected(turns)
    Seq(Seq(turns), turns.grouped(41).toSeq).zipWithIndex.foreach {
      case (batches, i) =>
        val table = runTws(batches, tmpDir(s"tws$i"))
        assert(tableSnapshots(table) === exp, s"slicing $i diverged")
    }
  }

  test("TWS resume from checkpoint reproduces the full-run snapshot") {
    val turns = allTurns
    val (first, second) = turns.splitAt(turns.length / 2)
    val dir = tmpDir("twsresume")
    SnapshotTws.withRocksDb(spark) {
      val table = new IcebergLikeTable(s"$dir/table", 8)
      val input = MemoryStream[Turn](spark)
      def startQuery() = SnapshotTws.updates(input.toDS(), "1 day").writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(MergeSink(table) _)
        .start()
      input.addData(first)
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      // a NEW query against the SAME checkpoint: RocksDB state + offset
      // log recover, counters continue mid-conversation (S4 resume)
      input.addData(second)
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
      assert(tableSnapshots(table) === expected(turns))
    }
  }

  test("TWS equals the fMGWS fold on identical input") {
    val turns = allTurns
    val batches = turns.grouped(37).toSeq
    val twsTable = runTws(batches, tmpDir("twsx"))
    // fMGWS pipeline, same slicing, default (HDFS-backed) provider
    val dir = tmpDir("fmgwsx")
    val table = new IcebergLikeTable(s"$dir/table", 8)
    val input = MemoryStream[Turn](spark)
    val q = SnapshotStream.updates(input.toDS(), "1 day").writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(MergeSink(table) _)
      .start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    assert(tableSnapshots(twsTable) === tableSnapshots(table))
  }
}
