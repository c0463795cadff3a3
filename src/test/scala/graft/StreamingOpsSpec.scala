package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Operational streaming modes beyond the core pipeline specs:
  * stream-STATIC dimension enrichment (the broadcast-join analog inside a
  * micro-batch — no state store involved, the dim re-resolves per batch)
  * and Trigger.AvailableNow (drain-everything-then-stop — the
  * incremental-batch mode a 100-TB backfill runs in, with checkpointed
  * resumability but bounded job lifetime).
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("the stateful fold runs on the RocksDB state store (the 10^8-key config)") {
    // tools/submit.sh recommends RocksDB for production state; prove the
    // fMGWS fold is provider-agnostic: same pipeline, same results.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val base = tmpDir("graft-rocksdb")
      val turns = graft.gen.Synthetic.turns(spark,
        graft.gen.Synthetic.paramsForTurns(3000), slices = 4)
      turns.repartitionByRange(4, col("conv_id"), col("turn_idx"))
        .write.parquet(s"$base/in")
      import graft.model.{Schemas, Turn}
      val stream = spark.readStream.schema(Schemas.turn)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in").as[Turn]
      val q = graft.snapshot.SnapshotStream.updates(stream, "3650 days")
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .format("memory").queryName("rocksdb_fold").start()
      q.processAllAvailable(); q.stop()
      val got = spark.table("rocksdb_fold")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"conv_id")
            .orderBy($"turn_count".desc)))
        .filter($"rn" === 1)
        .select($"conv_id", $"turn_count").as[(String, Long)].collect().toMap
      val want = graft.snapshot.SnapshotFold.batchSnapshots(turns.toDF())
        .select($"conv_id", $"turn_count").as[(String, Long)].collect().toMap
      assert(got === want)
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("observe() metrics surface per-batch row counts without extra passes") {
    // Dataset.observe computes metrics DURING the pass (an accumulator on
    // the existing plan, zero extra jobs) and streams them through
    // QueryProgress.observedMetrics — the Dataset-native complement to
    // the O2 StreamingQueryListener.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val observed = mem.toDF().toDF("conv_id", "v")
      .observe("ingest", count(lit(1)).as("rows"), sum($"v").as("v_sum"))
    val q = observed.writeStream.outputMode("append")
      .format("noop").start()
    mem.addData(("a", 1L), ("b", 2L)); q.processAllAvailable()
    mem.addData(("c", 4L)); q.processAllAvailable()
    val metrics = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("ingest")))
      .map(r => (r.getAs[Long]("rows"), r.getAs[Long]("v_sum")))
    q.stop()
    assert(metrics.contains((2L, 3L)) && metrics.contains((1L, 4L)),
      s"missing batch metrics: $metrics")
  }

  test("stream-static join enriches each micro-batch against the dim table") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Long)]
    val enriched = mem.toDF().toDF("event_id", "user_id")
      .join(broadcast(dim), Seq("user_id"), "left")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    mem.addData((10L, 1L), (11L, 2L), (12L, 3L))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ss_join")
      .select($"event_id", $"tier").as[(Long, Option[String])]
      .collect().toMap
    assert(got === Map(10L -> Some("gold"), 11L -> Some("silver"), 12L -> None))
  }

  test("Trigger.AvailableNow drains the backlog into the MERGE sink and terminates") {
    import graft.model.{Schemas, Turn}
    import graft.store.IcebergLikeTable
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val base = tmpDir("graft-availnow")
    val turns = graft.gen.Synthetic.turns(spark,
      graft.gen.Synthetic.paramsForTurns(4000), slices = 4)
    turns.repartitionByRange(4, col("conv_id"), col("turn_idx"))
      .write.parquet(s"$base/in")
    val table = new IcebergLikeTable(s"$base/table", 8)
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(Schemas.turn)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/in").as[Turn]
      val q = graft.snapshot.SnapshotStream.updates(stream, "3650 days")
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch(graft.sink.MergeSink(table) _)
        .trigger(Trigger.AvailableNow())
        .start()
      // AvailableNow terminates by itself once the backlog is drained
      assert(q.awaitTermination(120000), "query did not self-terminate")
    }
    runOnce()
    val afterFirst = table.readManifest().lastBatchId
    assert(afterFirst >= 0)
    // second run on the same checkpoint: resume, find no new files,
    // exit clean, commit nothing — the incremental-batch contract
    runOnce()
    assert(table.readManifest().lastBatchId === afterFirst)
    val got = table.read().select($"conv_id", $"turn_count")
      .as[(String, Long)].collect().toMap
    val batch = graft.snapshot.SnapshotFold.batchSnapshots(turns.toDF())
      .select($"conv_id", $"turn_count").as[(String, Long)].collect().toMap
    assert(got === batch)
  }
}
