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
/** Evolution fixtures: the V2 state class adds an Option field — the one
  * avro-compatible evolution shape (new field, nullable, appended).
  */
private[graft] case class EvoStateV1(count: Long)
private[graft] case class EvoStateV2(count: Long, toolCalls: Option[Long])

private[graft] class EvoProcessorV1
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, Turn, (String, Long, Long)] {
  @transient private var st: org.apache.spark.sql.streaming.ValueState[EvoStateV1] = _
  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[EvoStateV1]("evo",
      org.apache.spark.sql.Encoders.product[EvoStateV1],
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override def handleInputRows(convId: String, rows: Iterator[Turn],
      timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Long, Long)] = {
    val n = (if (st.exists()) st.get().count else 0L) + rows.size
    st.update(EvoStateV1(n))
    Iterator.single((convId, n, -1L))
  }
}

private[graft] class EvoProcessorV2
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, Turn, (String, Long, Long)] {
  @transient private var st: org.apache.spark.sql.streaming.ValueState[EvoStateV2] = _
  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[EvoStateV2]("evo",
      org.apache.spark.sql.Encoders.product[EvoStateV2],
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override def handleInputRows(convId: String, rows: Iterator[Turn],
      timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Long, Long)] = {
    val batch = rows.toSeq
    val prev = if (st.exists()) st.get() else EvoStateV2(0L, None)
    val n = prev.count + batch.size
    val tc = prev.toolCalls.getOrElse(0L) +
      batch.count(t => t.tool != null && t.tool.nonEmpty)
    st.update(EvoStateV2(n, Some(tc)))
    Iterator.single((convId, n, tc))
  }
}

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

  test("state-schema evolution on resume: avro encoding evolves (old state keeps counting, new field defaults), unsaferow fails loudly") {
    val turns = allTurns
    val (first, second) = turns.splitAt(turns.length / 2)
    // one MemoryStream per scenario, shared across the two incarnations —
    // its offsets line up with the checkpoint exactly as a durable source's
    // would; the sink is foreachBatch (checkpoint-recoverable, unlike memory)
    def run(dir: String, input: MemoryStream[Turn],
        processor: () => org.apache.spark.sql.streaming
          .StatefulProcessor[String, Turn, (String, Long, Long)],
        data: Seq[Turn], encoding: String): Map[String, (Long, Long)] =
      SnapshotTws.withRocksDb(spark) {
        val k = "spark.sql.streaming.stateStore.encodingFormat"
        val old = spark.conf.getOption(k)
        spark.conf.set(k, encoding)
        try {
          implicit val enc: org.apache.spark.sql.Encoder[(String, Long, Long)] =
            org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.STRING,
              org.apache.spark.sql.Encoders.scalaLong,
              org.apache.spark.sql.Encoders.scalaLong)
          val out = input.toDS()
            .groupByKey(_.conv_id)
            .transformWithState(processor(),
              org.apache.spark.sql.streaming.TimeMode.None(),
              org.apache.spark.sql.streaming.OutputMode.Update(), enc)
          val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
          val q = out.writeStream.outputMode("update")
            .option("checkpointLocation", s"$dir/ckpt")
            .foreachBatch { (ds: org.apache.spark.sql.Dataset[(String, Long, Long)],
                _: Long) => got ++= ds.collect(); () }
            .start()
          input.addData(data); q.processAllAvailable(); q.stop()
          got.groupBy(_._1).map { case (k2, rs) =>
            k2 -> (rs.map(_._2).max, rs.map(_._3).max) }
        } finally {
          old match { case Some(v) => spark.conf.set(k, v)
            case None => spark.conf.unset(k) }
        }
      }

    // ---- avro: resume across a state-class upgrade works ----
    val avroDir = tmpDir("twsevo-avro")
    val avroIn = MemoryStream[Turn](spark)
    run(avroDir, avroIn, () => new EvoProcessorV1, first, "avro")
    val got = run(avroDir, avroIn, () => new EvoProcessorV2, second, "avro")
    val expTotal = turns.groupBy(_.conv_id).view.mapValues(_.size.toLong).toMap
    val expTool = second.groupBy(_.conv_id).view
      .mapValues(_.count(_.tool.nonEmpty).toLong).toMap
    got.foreach { case (conv, (total, tool)) =>
      // counts CONTINUE across the upgrade (old V1 state was readable)
      assert(total === expTotal(conv), s"$conv total")
      // the added field defaulted (None -> 0 base), counts only post-upgrade
      assert(tool === expTool.getOrElse(conv, 0L), s"$conv tool")
    }
    assert(got.keySet === second.map(_.conv_id).toSet)

    // ---- unsaferow (default): the same upgrade is a LOUD failure ----
    val urDir = tmpDir("twsevo-ur")
    val urIn = MemoryStream[Turn](spark)
    run(urDir, urIn, () => new EvoProcessorV1, first, "unsaferow")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(urDir, urIn, () => new EvoProcessorV2, second, "unsaferow")
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).map(_.toString).mkString("\n")
    assert(msg.toLowerCase.contains("schema"),
      s"expected a state-schema incompatibility error, got:\n$msg")
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
