package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.snapshot.SnapshotFold

/** Two-parallelism-level scaling evidence (BASELINE.md Table 2): the same
  * job on the same input at local[N] and local[4N] — the sandbox proxy for
  * N vs 4N executors.
  *
  * One JVM per measurement: sequential SparkSessions in a single JVM
  * contaminate each other (GC/code-cache state skewed a third-session run
  * 10x in either direction), so `tools/scaling.sh` runs GenTurns once and
  * then one `ScalingBench <cores>` JVM per core count, combining the JSON
  * lines into BENCH.md.
  *
  * Workloads (output fully materialized via the noop sink — a bare count()
  * would let Catalyst prune the aggregate measures):
  *  - batch_fold: SnapshotFold.batchSnapshots over the turn log;
  *  - window_agg: tumbling window + per-window approx-distinct;
  *  - stream_fold: fMGWS pipeline, noop sink (state-store cost isolated);
  *  - stream_build: full pipeline incl. Iceberg-like MERGE sink.
  */
object ScalingBench {

  /** Input dir override (SPARK_GRAFT_INPUT): lets a measurement use an
    * alternate distribution — e.g. the long-conversation input for the
    * per-key top-k crossover — without perturbing the standard one.
    */
  def SharedInput: String =
    sys.env.getOrElse("SPARK_GRAFT_INPUT", "/tmp/graft-scaling-input/turns")

  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt)
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_CORES", "32").toInt)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // Shuffle/state partition count is FIXED across core counts — exactly
    // as on a real cluster, where the streaming job's shuffle partitions
    // (baked into the state checkpoint) stay constant while executors
    // scale. Scaling N→4N then means the same 64 work units spread over
    // 4x the threads; letting partitions track cores would instead vary
    // the per-partition fixed costs and measure the wrong thing.
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "64")
    require(Files.exists(Paths.get(SharedInput)),
      s"run graft.GenTurns first to create $SharedInput")

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // keep the fixed 64-partition layout through AQE: post-shuffle
      // coalescing to 64MB targets collapses the final fold to ~6
      // partitions, starving the 16-core run (scaling artifact, not a
      // production recommendation — on a real cluster the target size
      // would be tuned to executor count)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // max_by/min_by aggregate via ObjectHashAggregate; the default
      // sort-based fallback threshold (4096 groups/partition) forces the
      // snapshot fold into sort-aggregation at any realistic key count
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = spark.read.parquet(SharedInput).count()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def best(body: => Unit): Double =
      (1 to reps).map(_ => Bench.time(body)._2).min

    // Shuffle-write bytes per workload: locally a shuffle is page-cache
    // I/O and invisible in wall time, but on a real cluster it is network
    // — bytes are the number that predicts 100-TB behavior, so report
    // them alongside seconds (averaged over reps; identical per rep).
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def want(k: String) = only.forall(_.contains(k))
    val all = Seq[(String, () => Double)](
      "scan_only" -> (() => best {
        noop(spark.read.parquet(SharedInput))
      }),
      "shuffle_rt" -> (() => best {
        noop(spark.read.parquet(SharedInput)
          .repartition(64, col("conv_id")))
      }),
      "batch_fold" -> (() => best {
        noop(SnapshotFold.batchSnapshots(spark.read.parquet(SharedInput)))
      }),
      // same fold via the typed Aggregator: plans ObjectHashAggregate
      // (no per-partition sorts) where the untyped max_by form is forced
      // into SortAggregate by its declarative struct buffer — the faster
      // production path, benched separately to quantify the gap
      "typed_fold" -> (() => best {
        import spark.implicits._
        noop(SnapshotFold.typedSnapshots(
          spark.read.parquet(SharedInput).as[graft.model.Turn]).toDF())
      }),
      // merge-on-read READ path: resolve a delta-bearing store snapshot
      // (groups ≈ rows — the regime where the resolution aggregate's
      // plan shape matters most). Setup (4 merge commits, deferred
      // compaction so every bucket keeps its delta chain) is OUTSIDE the
      // timed region; reps time read() only.
      "store_read" -> (() => {
        implicit val sp: org.apache.spark.sql.SparkSession = spark
        val tmp = java.nio.file.Files.createTempDirectory("graft-storeread").toString
        val snaps = SnapshotFold.batchSnapshots(spark.read.parquet(SharedInput))
          .persist()
        try {
          val t = new graft.store.IcebergLikeTable(s"$tmp/t", 64,
            inlineCompaction = false, maxDeltasPerBucket = 1000)
          (0 until 4).foreach { b =>
            t.merge(snaps.where(pmod(hash(col("conv_id")), lit(4)) === b),
              "conv_id", b.toLong)
          }
          best { noop(t.read()) }
        } finally { snaps.unpersist(); Bench.rmrf(tmp) }
      }),
      // same read with row-level delete markers present (1% of keys
      // deleted in a 5th commit): quantifies the marker-filter cost the
      // delete feature added to every resolution read
      "store_read_del" -> (() => {
        implicit val sp: org.apache.spark.sql.SparkSession = spark
        val tmp = java.nio.file.Files.createTempDirectory("graft-storereadd").toString
        val snaps = SnapshotFold.batchSnapshots(spark.read.parquet(SharedInput))
          .persist()
        try {
          val t = new graft.store.IcebergLikeTable(s"$tmp/t", 64,
            inlineCompaction = false, maxDeltasPerBucket = 1000)
          (0 until 4).foreach { b =>
            t.merge(snaps.where(pmod(hash(col("conv_id")), lit(4)) === b),
              "conv_id", b.toLong)
          }
          t.delete(snaps.select("conv_id")
            .where(pmod(hash(col("conv_id")), lit(100)) === 0), 4L)
          best { noop(t.read()) }
        } finally { snaps.unpersist(); Bench.rmrf(tmp) }
      }),
      "window_agg" -> (() => best {
        noop(spark.read.parquet(SharedInput)
          .groupBy(window(col("ts"), "5 minutes"))
          .agg(count(lit(1)).as("n"),
            approx_count_distinct(col("conv_id")).as("nc")))
      }),
      // CEP strict 3-step pattern (user → tool turn → user) over the
      // full transcript log: ONE conv-keyed window pass, step predicates
      // evaluated once and led k−1 rows (cep/Cep.matchStrict) — the
      // sequence-detection cost is the sort share, same shape as
      // asof_tool. (The streaming NFA shares stream_fold's fMGWS
      // machinery; its scaling evidence is that workload's.)
      "cep_strict" -> (() => best {
        noop(graft.cep.Cep.matchStrict(spark.read.parquet(SharedInput),
          col("conv_id"), col("ts"), col("turn_idx"),
          Seq(graft.cep.Cep.Step("u", col("role") === "user"),
            graft.cep.Cep.Step("t", col("role") === "tool"),
            graft.cep.Cep.Step("u2", col("role") === "user")),
          withinUs = 6L * 3600 * 1000000))
      }),
      // Lexical retrieval at transcript scale: every turn a doc, BM25
      // scored against a 3-term query in the single-scan form (narrow
      // size(filter(tokens)) projections + one broadcast stats row +
      // TakeOrderedAndProject) — the retrieval category's scaling row;
      // the only exchange is the 1-row stats aggregate.
      "bm25_score" -> (() => best {
        val terms = Seq("merge", "shuffle", "token").sorted
        val perDoc = spark.read.parquet(SharedInput)
          .select(xxhash64(col("conv_id"), col("turn_idx")).as("doc_id"),
            expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("w"))
          .select(col("doc_id") +: size(col("w")).as("dl") +:
            terms.map(t => size(filter(col("w"), x => x === lit(t)))
              .cast("double").as(s"tf_$t")): _*)
        val statCols = count(lit(1)).as("n") +:
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
          terms.map(t =>
            sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
        val stats = perDoc.agg(statCols.head, statCols.tail: _*)
        def contrib(t: String) = {
          val idf = log(lit(1.0) + (col("n") - col(s"df_$t") + lit(0.5)) /
            (col(s"df_$t") + lit(0.5)))
          when(col(s"tf_$t") > 0, idf * ((col(s"tf_$t") * lit(2.2)) /
            (col(s"tf_$t") + lit(1.2) *
              (lit(0.25) + (lit(0.75) * col("dl")) / col("avgdl")))))
            .otherwise(lit(0.0))
        }
        noop(perDoc.crossJoin(broadcast(stats))
          .filter(terms.map(t => col(s"tf_$t") > 0).reduce(_ || _))
          .select(col("doc_id"),
            terms.foldLeft(lit(0.0))((a, t) => a + contrib(t)).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(100))
      }),
      // Range-read A/B: the SAME ts-stats table (24M turns, one row per
      // turn, 4 hash-interleaved commits so neither files nor row groups
      // are time-clustered on arrival), timed on a 5% time-slice
      // readRange — raw layout vs after optimize(ts_us). Build is outside
      // the timed region; the pair quantifies what the clustered rewrite
      // buys a replay-to-timestamp read at scale.
      "store_range_raw" -> (() => rangeReadBench(spark, optimize = false)),
      "store_range_opt" -> (() => rangeReadBench(spark, optimize = true)),
      // CPU-bound reference workload (regex shingling + 32 hash functions
      // per row): shows the engine's scaling when not memory-bandwidth
      // bound. 1/16 deterministic sample keeps the 4-core run ~1 minute.
      "minhash_sig" -> (() => best {
        noop(graft.dedup.Dedup.minhashSignatures(
          spark.read.parquet(SharedInput)
            .where(pmod(hash(col("conv_id"), col("turn_idx")), lit(16)) === 0)
            .select(concat_ws("-", col("conv_id"), col("turn_idx")).as("doc_id"),
              col("text")),
          "doc_id", "text", numHashes = 32))
      }),
      // the FULL LSH-routed near-dup pipeline at transcript scale (the
      // corpus-dedup bill of a real 100 TB build): signatures → banded
      // candidates → exact shingle-Jaccard verify joins — the same shape
      // as the ngram_jaccard_lsh row, turns-as-docs, doc_id an 8-byte
      // hash (1/16 sample like minhash_sig; synthetic transcripts
      // duplicate heavily, so the candidate stage carries real volume)
      "lsh_dedup" -> (() => best {
        val docs = spark.read.parquet(SharedInput)
          .where(pmod(hash(col("conv_id"), col("turn_idx")), lit(16)) === 0)
          .select(xxhash64(col("conv_id"), col("turn_idx")).as("doc_id"),
            col("text"))
        val cands = graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text",
          numHashes = 32, rowsPerBand = 2).select("doc_a", "doc_b")
        val sh = docs.select(col("doc_id"),
          graft.dedup.Dedup.shingleArr(col("text")).as("sh"))
        noop(cands
          .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
            size(col("sh_a")).cast("long").as("n_a"),
            size(col("sh_b")).cast("long").as("n_b"))
          .filter(col("inter") * 2 >= col("n_a") + col("n_b") - col("inter")))
      }),
      // test-set decontamination at transcript scale: every turn a doc.
      // The CORPUS side carries the scaling (1/4 sample, ~12M docs —
      // the side that grows to 100 TB); the BENCHMARK side is pinned
      // eval-sized by a 2-nibble membership rule (~1/256 of docs,
      // ~15 MB broadcast) exactly as the op's design assumes — a
      // benchmark that grew with the corpus would serialize on the
      // driver's broadcast build (measured: the 1/64-sample 1-nibble
      // variant spent its wall on the broadcast and scaled at 0.35).
      "decontam" -> (() => best {
        noop(graft.queries.TextQueries.decontaminateOver(
          spark.read.parquet(SharedInput)
            .where(pmod(hash(col("conv_id"), col("turn_idx")), lit(4)) === 0)
            .select(xxhash64(col("conv_id"), col("turn_idx")).as("doc_id"),
              col("text")),
          benchNibbles = 2))
      }),
      // SemDeDup at scale over deterministic synthetic embeddings
      // (dim 64): C=512 coarse clusters bound the pairwise term to
      // N²/C; the timed region is the full op — broadcast-centroid
      // argmax assignment (N×C fused-codegen cosines through the
      // latest_by reduction) + cluster-keyed pair join + drop marking.
      "semdedup" -> (() => best {
        val n = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_N", "200000").toLong
        val emb = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)), j =>
            (pmod(xxhash64(col("id"), j), lit(2000001L)).cast("double")
              / 1000000.0 - 1.0).cast("float")).as("embedding"))
        noop(graft.ann.Ann.semanticDedup(emb,
          numCentroids = 512, minCos = 0.99))
      }),
      // as-of self-join at transcript scale: every turn gets the most
      // recent prior tool turn of its conversation — union + ONE keyed
      // shuffle + per-conv sort (the SMJ cost shape, no range blowup)
      "asof_tool" -> (() => best {
        val t = spark.read.parquet(SharedInput)
        val tools = t.filter(col("tool") =!= "")
          .select(col("conv_id"), col("ts").as("tool_ts"),
            col("tool").as("prior_tool"))
        noop(graft.join.AsOfJoin.asOf(
          t.select("conv_id", "turn_idx", "ts"), tools,
          Seq("conv_id"), "ts", "tool_ts", Seq("prior_tool"),
          matchedTsAs = "prior_tool_ts"))
      }),
      // duplicate-class clustering at scale: connected components over a
      // deterministic pseudo-random graph (8M edges on 4M nodes, avg
      // degree 4 → a giant component + fringe; many large-star/small-star
      // rounds). Workload rows = edges, not turns — the reported
      // turns_per_sec column is only used as a cross-core RATIO here.
      // Graph size is tunable: iterative BSP rounds have fixed driver
      // barriers (checkpoint + fixpoint job per round), so efficiency
      // rises with per-round work — measure at a size where compute,
      // not the barrier, dominates (as it does at production scale).
      "cc_components" -> (() => best {
        val nEdges = sys.env.getOrElse("SPARK_GRAFT_CC_EDGES", "8000000").toLong
        val edges = spark.range(nEdges).select(
          pmod(xxhash64(col("id")), lit(nEdges / 2)).as("src"),
          pmod(xxhash64(col("id") + 1234567L), lit(nEdges / 2)).as("dst"))
        noop(graft.dedup.ConnectedComponents.components(edges, "src", "dst",
          verbose = sys.env.contains("SPARK_GRAFT_DEBUG")))
      }),
      // the sort-free star formulation on the SAME graph (exchange-reuse
      // + shuffle-hash join instead of window sorts) — the A/B that
      // decides which shape the engine should prefer at cluster scale
      "cc_hash" -> (() => best {
        val nEdges = sys.env.getOrElse("SPARK_GRAFT_CC_EDGES", "8000000").toLong
        val edges = spark.range(nEdges).select(
          pmod(xxhash64(col("id")), lit(nEdges / 2)).as("src"),
          pmod(xxhash64(col("id") + 1234567L), lit(nEdges / 2)).as("dst"))
        noop(graft.dedup.ConnectedComponents.components(edges, "src", "dst",
          verbose = sys.env.contains("SPARK_GRAFT_DEBUG"),
          useHashAgg = true))
      }),
      // per-key top-k ("latest k turns per conversation"): the bounded-
      // buffer Aggregator vs the row_number window formulation on the
      // same input — quantifies the partial-agg shuffle reduction
      // (functions/TopKPerKey: ≤k rows/key/partition cross the shuffle
      // vs every row shuffled + partition-sorted)
      "topk_agg" -> (() => best {
        import spark.implicits._
        noop(spark.read.parquet(SharedInput).as[graft.model.Turn]
          .groupByKey(_.conv_id)
          .agg(new graft.functions.TopKPerKey.LatestK(8).toColumn.name("topk"))
          .toDF("conv_id", "topk"))
      }),
      // native TypedImperativeAggregate form: same shuffle reduction as
      // topk_agg without the Dataset-encoder decode per row
      "topk_native" -> (() => best {
        noop(spark.read.parquet(SharedInput)
          .groupBy(col("conv_id"))
          .agg(graft.functions.GraftFunctions.bounded_topk(8, col("turn_idx"),
            struct(col("turn_idx"), col("role"), col("text"))).as("topk")))
      }),
      "topk_window" -> (() => best {
        import org.apache.spark.sql.expressions.Window
        noop(spark.read.parquet(SharedInput)
          .withColumn("rn", row_number().over(
            Window.partitionBy("conv_id").orderBy(col("turn_idx").desc)))
          .filter(col("rn") <= 8)
          .select("conv_id", "turn_idx", "role", "text"))
      }),
      // deterministic epoch shuffle over the full turn log (per-turn key):
      // ONE shard exchange + in-shard sort + row_number — the write-shard
      // layout a trainer streams. md5 keying is the per-row CPU; the sort
      // is the shuffle-partition-local cost that must scale with cores.
      "epoch_shuffle" -> (() => best {
        import org.apache.spark.sql.expressions.Window
        val keyed = spark.read.parquet(SharedInput)
          .select(md5(concat_ws("#", col("conv_id"), col("turn_idx"),
            lit("e1"))).as("ord_key"))
        val shard = substring(col("ord_key"), 1, 2)
        noop(keyed.withColumn("shard", shard)
          .withColumn("pos", row_number().over(
            Window.partitionBy(shard).orderBy(col("ord_key")))))
      }),
      // temperature source mixing over the full turn log ("source" = tool):
      // tiny broadcast rate table + one codegen'd md5 predicate per row —
      // the corpus never shuffles, so this should track scan_only.
      "mixture" -> (() => best {
        val t = spark.read.parquet(SharedInput)
        val counts = t.groupBy("tool").agg(count(lit(1)).as("n"))
        val nMin = counts.agg(min(col("n")).as("n_min"))
        val rates = counts.crossJoin(broadcast(nMin)).select(col("tool"),
          floor(lit(4096) * sqrt(col("n_min").cast("double") /
            col("n").cast("double"))).as("k"))
        noop(t.join(broadcast(rates), Seq("tool"))
          .where(col("k") >= 4096 ||
            substring(md5(concat_ws("#", col("conv_id"), col("turn_idx"),
              lit("mix"))), 1, 3) <
              lpad(lower(hex(least(col("k"), lit(4095L)))), 3, "0"))
          .select(col("conv_id"), col("turn_idx"), col("tool")))
      }),
      // incremental materialized-view maintenance vs from-scratch
      // recompute: per-TURN base (one row per turn, every row a key),
      // view = the per-CONVERSATION rollup (turns + total text length
      // per conv — HIGH-cardinality groups, the production MV shape
      // where the recompute's GROUP BY is a real key shuffle, not a
      // map-side-collapsible 5-group agg). 5 update batches of ~16
      // touched keys each against a 256-bucket clean-base replica.
      // mv_incr times 5 MaterializedAgg.applyBatch calls (bucket-pruned
      // pre-image + view reads: ≤16 of 256 buckets each); mv_full times
      // the 5 full GROUP BYs a view without maintenance would run
      // (recompute only, no view rewrite — a LOWER bound on the
      // alternative). Update content varies per rep (tlen + batch id)
      // so replays are real work, never MERGE-idempotent no-ops; batch
      // ids advance monotonically across reps.
      "mv_incr" -> (() => {
        implicit val sp: org.apache.spark.sql.SparkSession = spark
        val tmp = java.nio.file.Files.createTempDirectory("graft-mvincr").toString
        val sums = Seq("tlen" -> "len_sum")
        def turnsBase = spark.read.parquet(SharedInput)
          .select(concat_ws("-", col("conv_id"), col("turn_idx")).as("tkey"),
            col("conv_id"), length(col("text")).cast("long").as("tlen"))
        try {
          val src = new graft.store.IcebergLikeTable(s"$tmp/src", 256,
            keyCol = "tkey")
          val replica = new graft.store.IcebergLikeTable(s"$tmp/rep", 256,
            keyCol = "tkey")
          val mv = new graft.store.IcebergLikeTable(s"$tmp/mv", 256,
            emptySchema = graft.pipeline.MaterializedAgg
              .viewSchema("conv_id", sums))
          // bootstrap (untimed): replica = all turns, COMPACTED to a
          // clean base via a threshold-1 handle on the same root — the
          // steady state a maintained table sits in; the update batches
          // then layer deltas only on their touched buckets
          new graft.store.IcebergLikeTable(s"$tmp/rep", 256,
            keyCol = "tkey", maxDeltasPerBucket = 1)
            .merge(turnsBase, "tkey", 0L)
          new graft.store.IcebergLikeTable(s"$tmp/mv", 256,
            maxDeltasPerBucket = 1)
            .merge(replica.read().groupBy(col("conv_id"))
              .agg(count(lit(1)).as("n"), sum(col("tlen")).as("len_sum")),
              "conv_id", 0L)
          // ~16-key deterministic update slices, materialized untimed
          val slice = math.max(rows / 16L, 1L)
          val upds = (1 to 5).map { b =>
            val u = turnsBase.where(pmod(hash(col("tkey")), lit(slice)) === b)
              .persist()
            u.count(); u
          }
          var nextBatch = 1L
          val sec = best {
            upds.foreach { u0 =>
              val u = u0.withColumn("tlen", col("tlen") + lit(nextBatch))
                .withColumn("__seq", lit(nextBatch))
              graft.pipeline.MaterializedAgg.applyBatch(src, replica, mv,
                "conv_id", sums, u, nextBatch)
              nextBatch += 1
            }
          }
          upds.foreach(_.unpersist())
          sec
        } finally { Bench.rmrf(tmp) }
      }),
      // the no-maintenance alternative: 5 from-scratch GROUP BYs over
      // the same per-turn table (what each mv_incr batch avoids)
      "mv_full" -> (() => {
        implicit val sp: org.apache.spark.sql.SparkSession = spark
        val tmp = java.nio.file.Files.createTempDirectory("graft-mvfull").toString
        try {
          val replica = new graft.store.IcebergLikeTable(s"$tmp/rep", 256,
            keyCol = "tkey")
          // same compacted clean-base state as mv_incr's replica
          new graft.store.IcebergLikeTable(s"$tmp/rep", 256,
            keyCol = "tkey", maxDeltasPerBucket = 1)
            .merge(spark.read.parquet(SharedInput)
              .select(concat_ws("-", col("conv_id"), col("turn_idx")).as("tkey"),
                col("conv_id"), length(col("text")).cast("long").as("tlen")),
              "tkey", 0L)
          best {
            (1 to 5).foreach { _ =>
              noop(replica.read().groupBy(col("conv_id"))
                .agg(count(lit(1)).as("n"), sum(col("tlen")).as("len_sum")))
            }
          }
        } finally { Bench.rmrf(tmp) }
      }),
      "stream_fold" -> (() => (1 to reps).map(_ =>
        Bench.streamFoldOnly(spark, SharedInput, files = 256)).min),
      "stream_build" -> (() => (1 to reps).map(_ =>
        Bench.streamBuild(spark, SharedInput, files = 256)._1).min))
    val results = all.filter(w => want(w._1)).map { case (k, f) =>
      shuffleBytes.set(0L)
      val sec = f()
      org.apache.spark.sql.graftshim.Shim.waitListenerBus(spark.sparkContext)
      (k, sec, shuffleBytes.get.toDouble / reps / 1e6)
    }

    results.foreach { case (k, sec, mb) =>
      println(f"""{"workload":"$k","cores":$cores,"turns":$rows,""" +
        f""""sec":$sec%.3f,"turns_per_sec":${rows / sec}%.0f,""" +
        f""""shuffle_mb":$mb%.1f}""")
    }
    spark.stop()
  }

  /** store_range_raw / store_range_opt: one ts-stats table of 24M turn
    * rows (4 hash-interleaved commits — neither files nor row groups are
    * time-clustered on arrival), folded to a clean base by compact()
    * (raw: key-sorted files, time-random row groups) or optimize(ts_us)
    * (opt: time-clustered row groups). Timed region: a 5% time-slice
    * readRange, best-of-reps. 8 MB parquet blocks so each ~1.5M-row
    * bucket file holds several row groups — the skipping unit under
    * test; both variants build identically, so the delta is clustering
    * alone.
    */
  private def rangeReadBench(spark: SparkSession, optimize: Boolean): Double = {
    implicit val sp: SparkSession = spark
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val tmp = Files.createTempDirectory("graft-rangeab").toString
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", (8 * 1024 * 1024).toString)
    try {
      val turns = spark.read.parquet(SharedInput)
        .where(pmod(hash(col("conv_id"), col("turn_idx")), lit(2)) === 0)
        .select(concat_ws("-", col("conv_id"), col("turn_idx")).as("tkey"),
          col("conv_id"), col("turn_idx"), col("role"),
          unix_micros(col("ts")).as("ts_us"))
      val t = new graft.store.IcebergLikeTable(s"$tmp/t", 16, keyCol = "tkey",
        emptySchema = turns.schema, inlineCompaction = false,
        maxDeltasPerBucket = 2, statsCol = Some("ts_us"))
      (0 until 4).foreach { b =>
        t.merge(turns.where(pmod(hash(col("tkey")), lit(4)) === b),
          "tkey", b.toLong)
      }
      if (optimize) t.optimize(Seq("ts_us")) else t.compact()
      val r = turns.agg(min(col("ts_us")), max(col("ts_us"))).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val mid = lo + (hi - lo) / 2
      (1 to reps).map { _ =>
        Bench.time {
          t.readRange(mid, mid + (hi - lo) / 20)
            .write.mode("overwrite").format("noop").save()
        }._2
      }.min
    } finally {
      if (oldBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", oldBlock)
      Bench.rmrf(tmp)
    }
  }
}

/** Writes the shared scaling input once (idempotent). */
object GenTurns {
  def main(args: Array[String]): Unit = {
    val nTurns = sys.env.getOrElse("SPARK_GRAFT_TURNS", "16000000").toLong
    if (Files.exists(Paths.get(ScalingBench.SharedInput))) {
      println(s"input exists: ${ScalingBench.SharedInput}")
      return
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_AVG_TURNS reshapes the conversation-length distribution
    // (default 300 ≈ 24 turns/conv after the Zipf tail; 50000 ≈ thousands
    // of turns/conv — the long-transcript regime)
    val avg = sys.env.getOrElse("SPARK_GRAFT_AVG_TURNS", "300").toInt
    val p = graft.gen.Synthetic.paramsForTurns(nTurns, avgTurns = avg)
      .copy(hotConvs = 4, hotSize = 20000)
    graft.gen.Synthetic.turns(spark, p, slices = 128)
      .repartitionByRange(256, col("conv_id"), col("turn_idx"))
      .write.parquet(ScalingBench.SharedInput)
    println(s"wrote ${spark.read.parquet(ScalingBench.SharedInput).count()} turns")
    spark.stop()
  }
}
