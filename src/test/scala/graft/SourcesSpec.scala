package graft

import org.apache.spark.sql.functions._
import graft.gen.Synthetic
import graft.model.{Schemas, Turn}
import graft.snapshot.SnapshotFold

/** Source-format independence (SURVEY.md §2.2 scans row): the snapshot
  * pipeline is declared over a typed Dataset[Turn], so the SAME fold runs
  * unchanged over parquet, JSON-lines (znap's wire format — its Nakadi
  * events are JSON), and CSV — batch and streaming — and must produce
  * identical snapshots. Timestamps round-trip at full microsecond
  * precision via an explicit timestampFormat on both ends. Also asserts
  * the JSON scan prunes to the columns a narrow query needs.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  // microsecond-precise, timezone-explicit — the lossless wire format
  private val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  private lazy val turns = {
    val p = Synthetic.paramsForTurns(20000)
    Synthetic.turns(spark, p, slices = 8).cache()
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
    df.select(col("conv_id"), col("last_turn_idx"), col("last_role"),
      col("turn_count"), unix_micros(col("first_ts")).as("f"),
      unix_micros(col("last_ts")).as("l"))
      .as[(String, Int, String, Long, Long, Long)]
      .collect().map(_.toString).sorted

  test("jsonl and csv batch sources fold to the parquet result exactly") {
    val base = tmpDir("graft-sources")
    turns.write.parquet(s"$base/pq")
    turns.toDF().write.option("timestampFormat", tsFmt).json(s"$base/jsonl")
    turns.toDF().write.option("timestampFormat", tsFmt)
      .option("header", "true").csv(s"$base/csv")

    val fromPq = SnapshotFold.batchSnapshots(spark.read.parquet(s"$base/pq"))
    val fromJson = SnapshotFold.batchSnapshots(
      spark.read.schema(Schemas.turn).option("timestampFormat", tsFmt)
        .json(s"$base/jsonl"))
    val fromCsv = SnapshotFold.batchSnapshots(
      spark.read.schema(Schemas.turn).option("timestampFormat", tsFmt)
        .option("header", "true").csv(s"$base/csv"))
    val expect = canon(fromPq)
    assert(expect.length > 0)
    assert(canon(fromJson) === expect, "jsonl fold diverged from parquet")
    assert(canon(fromCsv) === expect, "csv fold diverged from parquet")
  }

  test("jsonl STREAMING source drives the stateful fold to the batch result") {
    val base = tmpDir("graft-src-stream")
    turns.toDF().repartition(4)
      .write.option("timestampFormat", tsFmt).json(s"$base/in")
    val stream = spark.readStream.schema(Schemas.turn)
      .option("timestampFormat", tsFmt)
      .option("maxFilesPerTrigger", "1").json(s"$base/in").as[Turn]
    val q = graft.snapshot.SnapshotStream.updates(stream, "3650 days")
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$base/ckpt")
      .format("memory").queryName("src_jsonl_snap")
      .start()
    q.processAllAvailable(); q.stop()
    // the update-mode memory sink keeps every per-batch emission; the
    // final state per key is the one with the highest turn_count
    val got = spark.table("src_jsonl_snap")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("conv_id"))
          .orderBy(col("turn_count").desc)))
      .filter(col("rn") === 1).drop("rn")
    assert(canon(got) === canon(SnapshotFold.batchSnapshots(turns.toDF())))
  }

  test("json scan prunes to the folded columns (ReadSchema)") {
    val base = tmpDir("graft-src-prune")
    turns.toDF().write.option("timestampFormat", tsFmt).json(s"$base/jsonl")
    val narrow = spark.read.schema(Schemas.turn)
      .option("timestampFormat", tsFmt).json(s"$base/jsonl")
      .select(col("conv_id"), col("turn_idx"))
    val scan = narrow.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<conv_id:string,turn_idx:int>"),
      s"json scan did not prune columns:\n$scan")
  }
}
