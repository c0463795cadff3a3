package graft

import org.apache.spark.sql.execution.SparkPlan
import graft.queries._

/** Plan-quality assertions (the 100-TB contract): filters and projections
  * must reach the parquet scan, small dimensions must broadcast, the
  * snapshot fold must partial-aggregate before its single shuffle.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("F1 filter is pushed into the parquet scan") {
    val p = planOf(SnapshotQueries.f1Filter(spark, dir))
    assert(p.contains("PushedFilters:") &&
      p.contains("In(event_type") && p.contains("GreaterThanOrEqual(value"),
      s"filter not pushed:\n$p")
  }

  test("D1 dump-keys scan reads only the key column (projection pushdown)") {
    val p = planOf(SnapshotQueries.d1DumpKeys(spark, dir))
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("user_id") && !read.contains("props") &&
      !read.contains("event_type"), s"scan not pruned: $read")
  }

  test("J1 uses a broadcast hash join (no shuffle of the fact side)") {
    val p = planOf(RelationalQueries.j1JoinBroadcast(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("A1 snapshot fold partial-aggregates before its single shuffle") {
    val df = SnapshotQueries.a1SnapshotLatest(spark, dir)
    val p = planOf(df)
    // partial max_by before the exchange, final after — exactly one exchange
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected exactly 1 shuffle, plan:\n$p")
    assert(p.contains("partial_max_by") || p.contains("partial_maxby") ||
      p.toLowerCase.contains("partial"), s"no partial aggregation:\n$p")
  }

  test("A1 snapshot fold plans ObjectHashAggregate, not SortAggregate") {
    // the round-3 finding: max_by(struct, struct) is a struct-buffer
    // DeclarativeAggregate → HashAggregateExec refuses it → SortAggregate
    // (sorts both sides of the shuffle). The native latest_by form must
    // keep the fold in object-hash aggregation.
    val p = planOf(SnapshotQueries.a1SnapshotLatest(spark, dir))
    assert(p.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$p")
    assert(!p.contains("SortAggregate"), s"SortAggregate on the fold:\n$p")
  }

  test("store read with outstanding deltas resolves via ObjectHashAggregate") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val t = new graft.store.IcebergLikeTable(tmpDir("planread") + "/t",
      numBuckets = 2, maxDeltasPerBucket = 100, inlineCompaction = false,
      emptySchema = org.apache.spark.sql.types.StructType.fromDDL(
        "conv_id string, n int"))
    t.merge(Seq(("a", 1), ("b", 1)).toDF("conv_id", "n"), "conv_id", 0L)
    t.merge(Seq(("a", 2)).toDF("conv_id", "n"), "conv_id", 1L)
    assert(t.fileStats()._2 > 0, "test needs outstanding deltas")
    val p = planOf(t.read())
    assert(p.contains("ObjectHashAggregate"),
      s"delta resolution should object-hash aggregate:\n$p")
    assert(!p.contains("SortAggregate"),
      s"SortAggregate on the store read path:\n$p")
    assert(t.read().as[(String, Int)].collect().toMap === Map("a" -> 2, "b" -> 1))
  }

  test("whole-stage codegen covers scan→filter→agg pipelines") {
    // q1Agg: declarative sums/counts stay in codegen'd HashAggregate.
    // (The max_by fold uses ObjectHashAggregate — partial-agg capable but
    // not codegen; its scan/project stages below it still fuse.)
    val df = RelationalQueries.q1Agg(spark, dir)
    df.collect() // materialize THIS plan so AQE finalizes it (count() builds its own)
    val p = planOf(df)
    assert(p.contains("isFinalPlan=true"), s"AQE did not finalize:\n$p")
    // "*(n) Op" is the simple-string marker for a WholeStageCodegen span
    assert(p.contains("*(") && p.contains("HashAggregate"),
      s"no codegen spans:\n$p")
  }

  test("top-k queries plan a distributed TakeOrderedAndProject, not a global-window sort") {
    // The anti-pattern: row_number().over(Window.orderBy(...)) with no
    // partitionBy shuffles EVERY scored row to one task. The fixed shape
    // sorts per-partition, keeps k per partition, and only then windows
    // over the tiny k-row result.
    val emb = Tables.embeddings(spark, dir)
    val plans = Seq(
      "ann_bruteforce" -> graft.ann.Ann.bruteForceTopK(emb, 0L, 10),
      "ann_expr" -> graft.ann.Ann.bruteForceTopKExpr(emb, 0L, 10),
      "ann_lsh" -> graft.ann.Ann.lshTopK(emb, 0L, 10),
      "ann_ivf" -> graft.ann.Ann.ivfTopK(emb, 0L, 10),
      "topk_hot_keys" -> RelationalQueries.topkHotKeys(spark, dir),
      "bm25_topk" -> RetrievalQueries.bm25TopK(spark, dir))
    plans.foreach { case (name, df) =>
      val p = planOf(df)
      assert(p.contains("TakeOrderedAndProject"),
        s"$name: expected TakeOrderedAndProject:\n$p")
      // the big scored side must NOT feed a single-partition exchange before
      // the top-k: the only SinglePartition exchange allowed is the one
      // feeding the k-row ranking window, which sits ABOVE TakeOrdered.
      val lines = p.linesIterator.toSeq
      val takeIdx = lines.indexWhere(_.contains("TakeOrderedAndProject"))
      // Exception: a SinglePartition exchange whose child is a PARTIAL
      // scalar aggregate (keys=[]) moves one row per upstream partition,
      // not the scored side — the unavoidable (and scale-safe) shape of a
      // corpus-level scalar like bm25's (N, avgdl).
      val badBelow = lines.zipWithIndex.drop(takeIdx + 1).exists { case (l, i) =>
        l.contains("Exchange SinglePartition") &&
          !lines.drop(i + 1).headOption.exists(c =>
            c.contains("partial_") && c.contains("keys=[]"))
      }
      assert(!badBelow, s"$name: single-partition exchange below the top-k:\n$p")
    }
  }

  test("same-bucketed tables join with ZERO exchanges (co-located SortMergeJoin)") {
    import graft.store.BucketedTables
    val ev = Tables.events(spark, dir)
    BucketedTables.writeBucketed(
      ev.select("user_id", "event_id", "event_type"), "bk_events", 8, "user_id")
    BucketedTables.writeBucketed(
      ev.groupBy(org.apache.spark.sql.functions.col("user_id"))
        .count(), "bk_counts", 8, "user_id")
    // force the non-broadcast path (at sf0.001 both sides fit under the
    // broadcast threshold; at 100 TB neither would)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.colocatedJoin(spark, "bk_events", "bk_counts", "user_id")
      joined.collect() // finalize AQE plan
      val p = planOf(joined)
      assert(p.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("point lookup prunes with an IsNotNull+EqualTo pushed filter") {
    val p = planOf(SnapshotQueries.q1PointLookup(spark, dir))
    assert(p.contains("EqualTo(user_id,7)"), s"lookup filter not pushed:\n$p")
  }

  test("pivot (as conditional agg) is one partial-agg'd hash aggregate") {
    // Dataset.pivot — even with explicit values — plans a second shuffle
    // (pre-agg on (key, pivot-col) then pivotfirst); the conditional-agg
    // spelling is the one-exchange form the query must keep.
    val p = planOf(RelationalQueries.pivotCounts(spark, dir))
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"pivot should shuffle once, plan:\n$p")
    assert(p.toLowerCase.contains("partial_count"), s"no partial agg:\n$p")
  }

  test("unpivot is a narrow Expand over the pivot aggregate — no extra shuffle") {
    val p = planOf(RelationalQueries.unpivotCounts(spark, dir))
    assert(p.contains("Expand"), s"unpivot should plan an Expand node:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"unpivot must add no shuffle beyond the pivot's:\n$p")
  }

  test("higher-order array fns are a pure narrow projection — zero exchanges") {
    val p = planOf(TextQueries.hofFns(spark, dir))
    assert(!p.contains("Exchange"), s"hof projection must not shuffle:\n$p")
    assert(!p.toLowerCase.contains("generate"), s"no explode expected:\n$p")
  }

  test("CMS sketch aggregates partially before its single exchange") {
    val p = planOf(RelationalQueries.cmsCounts(spark, dir))
    // the sketch agg side: ObjectHashAggregate partial (matrix merge is
    // associative) then one exchange to the final agg
    assert(p.contains("ObjectHashAggregate"), s"no object hash agg:\n$p")
    assert(p.toLowerCase.contains("partial"), s"no partial agg stage:\n$p")
  }

  test("runtime bloom filter prunes the fact scan of a selective dim join") {
    // At 100 TB a shuffle join against a filtered dimension should not
    // scan-and-shuffle the whole fact side: Spark's runtime bloom filter
    // injects might_contain(fact key) below the fact scan. Thresholds
    // are production-scale, so pin them down to fire on test data.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, dir)
      val dim = Tables.orders(spark, dir)
        .filter(org.apache.spark.sql.functions.col("o_totalprice") > 500000.0)
      val joined = fact.join(dim,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.toLowerCase.contains("bloom"),
        s"no runtime bloom filter injected:\n$p")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("epoch_shuffle plans exactly one exchange (the shard write's own)") {
    val p = planOf(CurationQueries.epochShuffle(spark, dir))
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected exactly 1 shuffle, plan:\n$p")
    // column pruning: only doc_id leaves the scan
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && !read.contains("text"),
      s"scan not pruned: $read")
  }

  test("mixture_sample never shuffles the corpus (broadcast rate table only)") {
    val p = planOf(CurationQueries.mixtureSample(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"rate table must broadcast:\n$p")
    // the only hash exchanges allowed are under the tiny counts aggregate —
    // the corpus side joins via broadcast, so no exchange may carry text
    val corpusShuffled = p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("doc_id"))
    assert(!corpusShuffled, s"corpus rows crossed an exchange:\n$p")
  }
}
