package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Schemas, Turn}
import graft.queries.{Tables, TextQueries}

/** Extra, non-contract benchmarks (guide §1.4: noop-sink isolation of the
  * expensive queries' sub-stages). NOT part of the driver handshake —
  * `graft.Bench` is the frozen measurement surface; this main exists so
  * OPTIMIZATION_r06.md can cite stage-level numbers (signature pass vs
  * candidate join vs verify join; stream fold vs MERGE sink) without
  * touching the contract. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt -batch "runMain graft.BenchExtra [names...]"
  * Prints one "name seconds" line per measurement.
  */
object BenchExtra {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    val measurements: Seq[(String, () => Unit)] = Seq(
      // --- ngram_jaccard_lsh decomposition ------------------------------
      "tok_explode" -> (() => noop(
        docs.select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
            .as("tok")))),
      "sig_explode" -> (() => noop(
        docs.select(col("doc_id"),
          explode(graft.dedup.Dedup.shingleArr(col("text"))).as("sh")))),
      "sig_hash" -> (() => noop(
        docs.select(col("doc_id"),
          explode(graft.dedup.Dedup.shingleArr(col("text"))).as("sh"))
          .select(col("doc_id"), xxhash64(col("sh")).as("hb")))),
      "sig_agg1" -> (() => noop(
        docs.select(col("doc_id"),
          explode(graft.dedup.Dedup.shingleArr(col("text"))).as("sh"))
          .select(col("doc_id"), xxhash64(col("sh")).as("hb"))
          .groupBy(col("doc_id")).agg(min(xxhash64(lit(0L), col("hb")))))),
      "lsh_signatures" -> (() => noop(
        graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text", 32))),
      "lsh_candidates" -> (() => noop(
        graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text",
          numHashes = 32, rowsPerBand = 2))),
      "lsh_full" -> (() => noop(TextQueries.ngramJaccardLsh(spark, sfDir))),
      "jaccard300" -> (() => noop(TextQueries.ngramJaccard(spark, sfDir))),
      // --- dedup_simhash decomposition ----------------------------------
      "simhash_sig" -> (() => noop(
        graft.dedup.Dedup.simhashMd5(docs, "doc_id", "text"))),
      "simhash_full" -> (() => noop(
        graft.dedup.Dedup.simhashCandidatesOracle(docs, "doc_id", "text"))),
      // stage split: token explode + md5 + nibble decode WITHOUT the
      // 60-sum vote aggregation (is the aggregate worth a native
      // TypedImperativeAggregate?)
      "simhash_chars" -> (() => {
        import org.apache.spark.sql.functions._
        val toks = docs.select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
            .as("tok"))
        noop(toks.select(col("doc_id") +: (0 until 15).map { k =>
          val a = ascii(substring(md5(col("tok").cast("binary")), k + 1, 1))
          when(a <= 57, a - 48).otherwise(a - 87).as(s"c$k")
        }: _*))
      }),
      // A/B probe: does pinning the signature frame (vs relying on
      // exchange reuse across the guarded-pairs branches) cut the full
      // candidate pass?
      "simhash_persist" -> (() => {
        val sig = graft.dedup.Dedup.simhashMd5(docs, "doc_id", "text").persist()
        try noop(graft.dedup.Dedup.candidatesFromSimhash(sig,
          maxHamming = 3, bits = 60, nChunks = 4))
        finally { sig.unpersist(); () }
      }),
      // --- cep_funnel_stream decomposition: TWS drain vs MERGE sink -----
      "funnel_noop" -> (() => {
        import org.apache.spark.sql.functions._
        val tmp = Files.createTempDirectory("graft-bx-funnel").toString
        val inDir = s"$tmp/in"
        Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
          .repartitionByRange(4, col("ts")).write.parquet(inDir)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "user_id bigint, event_id bigint, event_type string, ts timestamp")
        val steps = Seq("signup", "click", "purchase")
        val mask = steps.zipWithIndex.map { case (st, j) =>
          when(col("event_type") === st, lit(1 << j)).otherwise(lit(0))
        }.reduce(_ + _)
        graft.snapshot.SnapshotTws.withRocksDb(spark) {
          graft.queries.StreamQueries.withStreamParallelism(spark, inDir) {
            import spark.implicits._
            val events = spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "2").parquet(inDir)
              .select(col("user_id").cast("string").as("convId"),
                col("event_id").as("idx"), unix_micros(col("ts")).as("tsUs"),
                mask.as("mask"), col("ts"))
              .withWatermark("ts", "1 minute")
              .as[graft.cep.CepEvent]
            val q = graft.cep.FunnelTws
              .updates(events, 3, 3L * 24 * 3600 * 1000000)(spark)
              .writeStream.outputMode("update")
              .option("checkpointLocation", s"$tmp/ckpt")
              .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.cep.FunnelRow], _: Long) =>
                df.write.mode("overwrite").format("noop").save()
              }
              .start()
            try q.processAllAvailable() finally q.stop()
          }
        }
        Bench.rmrf(tmp)
      }),
      // --- snapshot pipeline: fold-only vs fold+MERGE -------------------
      "pipe_fold_noop" -> (() => {
        import spark.implicits._
        val tmp = Files.createTempDirectory("graft-bx-fold").toString
        val inDir = s"$tmp/in"
        graft.queries.StreamQueries.eventsAsTurns(spark, sfDir)
          .repartitionByRange(4, col("ts")).write.parquet(inDir)
        graft.queries.StreamQueries.withStreamParallelism(spark, inDir) {
          val stream = spark.readStream.schema(Schemas.turn)
            .option("maxFilesPerTrigger", "1").parquet(inDir).as[Turn]
          val q = graft.snapshot.SnapshotStream.updates(stream, "3650 days")
            .writeStream.outputMode("update")
            .option("checkpointLocation", s"$tmp/ckpt")
            .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.model.ConvSnapshot], _: Long) =>
              df.write.mode("overwrite").format("noop").save()
            }
            .start()
          try q.processAllAvailable() finally q.stop()
        }
        Bench.rmrf(tmp)
      }),
      "pipe_fold_merge" -> (() => {
        import spark.implicits._
        implicit val sp: SparkSession = spark
        val tmp = Files.createTempDirectory("graft-bx-merge").toString
        val inDir = s"$tmp/in"
        graft.queries.StreamQueries.eventsAsTurns(spark, sfDir)
          .repartitionByRange(4, col("ts")).write.parquet(inDir)
        graft.queries.StreamQueries.withStreamParallelism(spark, inDir) {
          val stream = spark.readStream.schema(Schemas.turn)
            .option("maxFilesPerTrigger", "1").parquet(inDir).as[Turn]
          val table = new graft.store.IcebergLikeTable(s"$tmp/table", 8,
            keyBloomNdv = Some(4096L))
          val q = graft.replay.Replay.fromCheckpoint(stream, table, s"$tmp/ckpt",
            watermark = "3650 days",
            lineageShard = Some(pmod(col("conv_id").cast("long"), lit(8))))
          try q.processAllAvailable() finally q.stop()
        }
        Bench.rmrf(tmp)
      }))

    val only = args.toSet
    // SPARK_GRAFT_REPS reps in one JVM: rep 0 absorbs JVM/codegen warmup,
    // the LAST rep is the comparable number (guide §1 — measure warm)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    (1 to reps).foreach { r =>
      measurements.filter(m => only.isEmpty || only.contains(m._1)).foreach {
        case (name, body) =>
          spark.sparkContext.setJobDescription(s"bench-extra: $name")
          val (_, secs) = Bench.time(body())
          println(f"[$r] $name%-18s $secs%8.3f s")
      }
    }
    spark.stop()
  }
}
