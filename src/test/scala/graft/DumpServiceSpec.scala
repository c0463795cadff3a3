package graft

import scala.jdk.CollectionConverters._
import graft.gen.Synthetic
import graft.model.Turn
import graft.ops.{DumpManager, DumpService, DumpStatus}
import graft.snapshot.SnapshotFold
import graft.store.IcebergLikeTable

/** D2 — dump pipeline over a real snapshot table: complete key set
  * published (including the last page/batch — the reference's scanner
  * drops its final page, SURVEY.md §2.1 quirk note), lifecycle flips,
  * publish parallelism = table partitions.
  */
class DumpServiceSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  test("dump publishes the complete key set exactly once and finishes") {
    val params = Synthetic.Params(numConvs = 25, avgTurns = 6, hotConvs = 1,
      hotSize = 40, seed = 17L)
    val turns: Seq[Turn] =
      (0L until params.numConvs).flatMap(c => Synthetic.genConv(c, params))
    val table = new IcebergLikeTable(tmpDir("dumptbl") + "/t", 4)
    table.merge(SnapshotFold.typedSnapshots(spark.createDataset(turns)).toDF(),
      "conv_id", 0L)

    val acc = spark.sparkContext.collectionAccumulator[String]("dumped")
    val manager = new DumpManager
    val uid = DumpService.runDump(manager, "snapshots", table,
      it => it.foreach(acc.add))
    assert(manager.status(uid) === DumpStatus.FinishedSuccessfully)
    val published = acc.value.asScala.toSeq
    assert(published.size === published.distinct.size, "duplicate keys published")
    assert(published.toSet === turns.map(_.conv_id).toSet,
      "dump must cover every key incl. the final page")
    // a second dump for the same target is allowed after the first finished
    val uid2 = DumpService.runDump(manager, "snapshots", table, _ => ())
    assert(uid2 !== uid)
  }

  test("incremental dump publishes only changed keys; invalid since-batch fails fast") {
    def lineageRow(b: Long) = Seq(graft.model.LineageRecord(b, 0, "a", 0, "z", 9,
      1L, new java.sql.Timestamp(1700000000000L + b))).toDF()
    val table = new IcebergLikeTable(tmpDir("incdump") + "/t", 4)
    table.merge(Seq(("a", 1), ("b", 1), ("c", 1)).toDF("conv_id", "n"),
      "conv_id", 0L, lineageDf = Some(lineageRow(0L)))
    table.merge(Seq(("b", 2), ("d", 1)).toDF("conv_id", "n"),
      "conv_id", 1L, lineageDf = Some(lineageRow(1L)))

    val acc = spark.sparkContext.collectionAccumulator[String]("inc-dumped")
    val manager = new DumpManager
    val uid = DumpService.runIncrementalDump(manager, "snapshots", table, 0L,
      it => it.foreach(acc.add))
    assert(manager.status(uid) === DumpStatus.FinishedSuccessfully)
    assert(acc.value.asScala.toSet === Set("b", "d"))

    // a since-batch outside the committed lineage window fails fast (S4)
    // and flips the dump to Failed — never a silent wrong-sized dump
    val ex = intercept[graft.replay.InvalidOffsetException] {
      DumpService.runIncrementalDump(manager, "snapshots", table, 7L, _ => ())
    }
    assert(ex.getMessage.contains("outside committed window"))
  }
}
