package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.gen.Synthetic
import graft.model.{ConvSnapshot, Turn}
import graft.sink.MergeSink
import graft.snapshot.{SnapshotFold, SnapshotStream}
import graft.store.IcebergLikeTable

/** The engine's central promises (SURVEY.md §5 items 2, 3, 5; north rule):
  *  - streaming snapshot == batch fold of the same turns;
  *  - result invariant under micro-batch slicing;
  *  - resumable from checkpoint with byte-identical outcome;
  *  - idempotent sink under batch re-delivery;
  *  - watermark drops late turns deterministically;
  *  - lineage recorded per batch; point lookup prunes to one bucket.
  */
class StreamSnapshotSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private val params = Synthetic.Params(numConvs = 30, avgTurns = 8,
    hotConvs = 1, hotSize = 120, seed = 11L)
  private def allTurns: Seq[Turn] =
    (0L until params.numConvs).flatMap(c => Synthetic.genConv(c, params))

  private def expectedSnapshots(turns: Seq[Turn]): Map[String, ConvSnapshot] =
    turns.groupBy(_.conv_id).map { case (k, ts) =>
      k -> SnapshotFold.fold(None, ts.iterator).get
    }

  private def tableSnapshots(table: IcebergLikeTable): Map[String, ConvSnapshot] =
    table.read().as[ConvSnapshot].collect().map(s => s.conv_id -> s).toMap

  /** Run the full pipeline over `batches` of turns, one micro-batch each.
    * Default watermark is wide (1 day) so slicing tests exercise pure
    * order-invariance; the late-drop test passes a tight one explicitly.
    */
  private def runPipeline(batches: Seq[Seq[Turn]], dir: String,
      watermark: String = "1 day"): IcebergLikeTable = {
    val table = new IcebergLikeTable(s"$dir/table", 8)
    val input = MemoryStream[Turn](spark)
    val q = SnapshotStream.updates(input.toDS(), watermark).writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(MergeSink(table) _)
      .start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    table
  }

  test("streaming snapshot equals batch fold (single batch)") {
    val turns = allTurns
    val table = runPipeline(Seq(turns), tmpDir("snap1"))
    assert(tableSnapshots(table) === expectedSnapshots(turns))
  }

  test("snapshot invariant under micro-batch slicing (replay equality)") {
    val turns = allTurns
    val exp = expectedSnapshots(turns)
    // three different slicings, including pathological 1-turn tail batches
    val slicings = Seq(
      turns.grouped(50).toSeq,
      turns.grouped(7).toSeq,
      Seq(turns.take(1), turns.slice(1, 2), turns.drop(2)))
    slicings.zipWithIndex.foreach { case (batches, i) =>
      val table = runPipeline(batches, tmpDir(s"snapslice$i"))
      assert(tableSnapshots(table) === exp, s"slicing $i diverged")
    }
  }

  test("resume from checkpoint reproduces the full-run snapshot") {
    val turns = allTurns
    // split mid-conversation on purpose: resumed state must carry counters
    val (first, second) = turns.splitAt(turns.length / 2)
    val dir = tmpDir("snapresume")
    val table = new IcebergLikeTable(s"$dir/table", 8)
    val input = MemoryStream[Turn](spark)
    def startQuery() = SnapshotStream.updates(input.toDS(), "1 day").writeStream
      .outputMode("update").option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(MergeSink(table) _).start()

    input.addData(first)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()

    // restart against the SAME checkpoint — znap S4 offset resume analog
    // (reference NakadiPublisher.scala:63-100): state store + offset log
    // recover, the fold continues mid-conversation.
    input.addData(second)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    assert(tableSnapshots(table) === expectedSnapshots(turns))
  }

  test("sink is idempotent under batch re-delivery (exactly-once)") {
    val turns = allTurns.take(40)
    val ds = spark.createDataset(turns)
    val updates = SnapshotFold.typedSnapshots(ds)
    val dir = tmpDir("snapidem")
    val table = new IcebergLikeTable(s"$dir/table", 4)
    assert(table.merge(updates.toDF(), "conv_id", 0L,
      lineageDf = Some(MergeSink.lineageOf(updates.toDF(), 0L))))
    val after1 = tableSnapshots(table)
    val lineage1 = table.lineage().collect().toSeq
    // re-deliver the same batchId — must be a no-op
    assert(!table.merge(updates.toDF(), "conv_id", 0L,
      lineageDf = Some(MergeSink.lineageOf(updates.toDF(), 0L))))
    assert(tableSnapshots(table) === after1)
    assert(table.lineage().collect().toSeq === lineage1)
  }

  test("watermark drops late turns deterministically") {
    val base = Synthetic.BaseEpochMs
    def turn(conv: String, idx: Int, offMs: Long) =
      Turn(conv, idx, "user", s"t$idx", "", new Timestamp(base + offMs))
    val b1 = Seq(turn("on-time", 0, 60 * 60 * 1000L)) // 1h — sets watermark to 50min
    val b2 = Seq(
      turn("late", 0, 30 * 60 * 1000L), // 30min < 50min watermark → dropped
      turn("fresh", 0, 61 * 60 * 1000L))
    val table = runPipeline(Seq(b1, b2), tmpDir("snaplate"), watermark = "10 minutes")
    val got = tableSnapshots(table)
    assert(got.contains("on-time") && got.contains("fresh"))
    assert(!got.contains("late"), "late turn must be dropped by the watermark")
  }

  test("lineage records per-batch partition stats; committed_ts from data") {
    val turns = allTurns
    val table = runPipeline(turns.grouped(60).toSeq, tmpDir("snaplin"))
    val lineage = table.lineage()
    val batches = lineage.select("batch_id").distinct().as[Long].collect().sorted
    assert(batches.nonEmpty && batches.sameElements(batches.indices.map(_.toLong)))
    val maxCommitted = lineage.agg(max($"committed_ts")).as[Timestamp].head()
    assert(maxCommitted === new Timestamp(allTurns.map(_.ts.getTime).max))
    // signals side output: every conv signalled at least once
    assert(table.signals().select("conv_id").distinct().count() === params.numConvs)
  }

  test("point lookup returns the conversation's snapshot (bucket-pruned)") {
    val turns = allTurns
    val table = runPipeline(Seq(turns), tmpDir("snaplookup"))
    val key = turns.head.conv_id
    val row = table.lookup("conv_id", key).as[ConvSnapshot].collect()
    assert(row.length === 1)
    assert(row.head === expectedSnapshots(turns)(key))
    assert(table.lookup("conv_id", "no-such-conv").isEmpty)
  }
}
