package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.plans.GraftScan
import graft.store.IcebergLikeTable

/** The custom-Catalyst exhibit: GraftScan leaf + GraftBucketPrune rule.
  * A WHERE key='k' predicate over the symbolic relation must plan as a
  * single-bucket manifest read; every other shape must plan as the full
  * snapshot scan — same rows as the imperative API either way.
  */
class GraftScanSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): IcebergLikeTable = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val t = new IcebergLikeTable(tmpDir("graft-scan"), numBuckets = 8,
      emptySchema = org.apache.spark.sql.types.StructType.fromDDL(
        "conv_id string, turn_count int, last_role string"))
    val rows = (0 until 200).map(i => (s"c$i", i % 7 + 1, if (i % 2 == 0) "user" else "assistant"))
    t.merge(rows.toDF("conv_id", "turn_count", "last_role"), "conv_id", 0L)
    // second batch: updates for a subset → deltas exist, resolve() path live
    val upd = (0 until 50).map(i => (s"c$i", 99, "tool"))
    t.merge(upd.toDF("conv_id", "turn_count", "last_role"), "conv_id", 1L)
    t
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.inputFiles.toSeq
    }.flatten

  test("point predicate over the SQL view prunes to one bucket and matches lookup()") {
    GraftScan.install(spark)
    val t = mkTable()
    GraftScan.relation(spark, t).createOrReplaceTempView("graft_snap")

    val q = spark.sql(
      "SELECT conv_id, turn_count, last_role FROM graft_snap WHERE conv_id = 'c7'")
    val full = scannedFiles(GraftScan.relation(spark, t))
    val pruned = scannedFiles(q)
    assert(pruned.nonEmpty && full.nonEmpty)
    assert(pruned.size < full.size,
      s"expected bucket pruning: scanned ${pruned.size} of ${full.size} files")
    // exactly the files of c7's bucket (base + delta), nothing else
    assert(pruned.toSet.subsetOf(full.toSet))

    val viaSql = q.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val viaApi = t.lookup("conv_id", "c7").select("conv_id", "turn_count", "last_role")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(viaSql.toSeq == viaApi.toSeq)
    assert(viaSql.toSeq == Seq(("c7", 99, "tool"))) // the batch-1 update won
  }

  test("IN-list predicate (batch get) prunes to the union of the keys' buckets") {
    GraftScan.install(spark)
    val t = mkTable()
    val rel = GraftScan.relation(spark, t)
    rel.createOrReplaceTempView("graft_snap_in")
    // small IN stays In; >10 items becomes InSet via OptimizeIn — cover both
    val small = spark.sql(
      "SELECT conv_id, turn_count FROM graft_snap_in WHERE conv_id IN ('c7','c8')")
    val big = spark.sql("SELECT conv_id, turn_count FROM graft_snap_in WHERE conv_id IN (" +
      (0 until 12).map(i => s"'c$i'").mkString(",") + ")")
    val full = scannedFiles(rel).size
    assert(scannedFiles(small).size < full)
    assert(scannedFiles(big).size <= full)
    assert(small.collect().map(_.getString(0)).sorted.toSeq == Seq("c7", "c8"))
    assert(big.count() == 12)
    val viaApi = t.lookupMany("conv_id", Seq("c7", "c8"))
      .select("conv_id", "turn_count").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(viaApi == Set(("c7", 99), ("c8", 99))) // both in the batch-1 update range
  }

  test("non-key shapes fall back to the full snapshot scan with identical rows") {
    GraftScan.install(spark)
    val t = mkTable()
    val rel = GraftScan.relation(spark, t)
    rel.createOrReplaceTempView("graft_snap2")

    // aggregation over the view == aggregation over the imperative read
    val viaSql = spark.sql(
      "SELECT last_role, count(*) AS n FROM graft_snap2 GROUP BY last_role ORDER BY last_role")
      .as[(String, Long)].collect().toSeq
    val viaApi = t.read().groupBy("last_role").agg(count("*").as("n"))
      .orderBy("last_role").as[(String, Long)].collect().toSeq
    assert(viaSql == viaApi)

    // non-key predicate: full file set, filtered rows still correct
    val q = spark.sql("SELECT conv_id FROM graft_snap2 WHERE turn_count = 99")
    assert(scannedFiles(q).size == scannedFiles(rel).size)
    assert(q.count() == 50)

    // residual conjunct alongside the key predicate is enforced
    val none = spark.sql(
      "SELECT conv_id FROM graft_snap2 WHERE conv_id = 'c7' AND turn_count = 1")
    assert(none.count() == 0)
  }

  test("joins through the SQL view rebind attributes correctly") {
    GraftScan.install(spark)
    val t = mkTable()
    GraftScan.relation(spark, t).createOrReplaceTempView("graft_snap_j")
    Seq(("c7", "x"), ("c60", "y"), ("nope", "z"))
      .toDF("conv_id", "tag").createOrReplaceTempView("dim_j")
    val got = spark.sql(
      """SELECT s.conv_id, s.turn_count, d.tag
         FROM graft_snap_j s JOIN dim_j d USING (conv_id) ORDER BY s.conv_id""")
      .as[(String, Int, String)].collect().toSeq
    assert(got == Seq(("c60", 5), ("c7", 99)).map { case (c, n) =>
      (c, n, if (c == "c7") "x" else "y") })
  }

  test("aggregate-above-point-filter and projection shapes still prune") {
    GraftScan.install(spark)
    val t = mkTable()
    GraftScan.relation(spark, t).createOrReplaceTempView("graft_snap_s")
    val full = scannedFiles(GraftScan.relation(spark, t)).size

    // projection above the filter: Catalyst pushes the filter to the leaf
    // before our rule runs, so pruning still applies
    val proj = spark.sql(
      "SELECT turn_count FROM graft_snap_s WHERE conv_id = 'c3'")
    assert(scannedFiles(proj).size < full)
    assert(proj.as[Int].collect().toSeq == Seq(99))

    // aggregate above the point filter: pruned scan feeds the agg
    val agg = spark.sql(
      "SELECT count(*) AS n, sum(turn_count) AS s FROM graft_snap_s WHERE conv_id = 'c3'")
    assert(scannedFiles(agg).size < full)
    assert(agg.as[(Long, Long)].head() == ((1L, 99L)))
  }

  test("a pinned view is immune to commits landing after the pin (snapshot consistency)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val t = mkTable()
    val before = t.read().select("conv_id", "turn_count")
      .as[(String, Int)].collect().toMap
    val pin = t.pin()
    // a commit lands "between two leaf rebinds" of one query
    t.merge(Seq(("c7", -1, "ghost")).toDF("conv_id", "turn_count", "last_role"),
      "conv_id", 2L)
    // every read/lookup from the pin still observes the pre-commit snapshot
    assert(pin.read().select("conv_id", "turn_count")
      .as[(String, Int)].collect().toMap === before)
    assert(pin.lookup("conv_id", "c7").select("turn_count")
      .as[Int].collect().toSeq === Seq(99))
    assert(pin.lookupMany("conv_id", Seq("c7", "c60")).select("turn_count")
      .as[Int].collect().sorted.toSeq === Seq(5, 99))
    // the live table sees the new commit
    assert(t.lookup("conv_id", "c7").select("turn_count")
      .as[Int].collect().toSeq === Seq(-1))
  }

  test("self-join through the SQL view is consistent (one pin serves both leaves)") {
    GraftScan.install(spark)
    val t = mkTable()
    GraftScan.relation(spark, t).createOrReplaceTempView("graft_snap_self")
    // both leaves materialize from one pinned manifest inside the rule —
    // equal turn_count on the join key must therefore always hold, even
    // for the keys batch 1 updated
    val mismatches = spark.sql(
      """SELECT a.conv_id FROM graft_snap_self a JOIN graft_snap_self b
         USING (conv_id) WHERE a.turn_count <> b.turn_count""").count()
    assert(mismatches === 0L)
    assert(spark.sql(
      """SELECT count(*) FROM graft_snap_self a JOIN graft_snap_self b
         USING (conv_id)""").as[Long].head() === 200L)
  }

  private def mkRangeTable(appendOnly: Boolean): IcebergLikeTable = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val t = new IcebergLikeTable(tmpDir("graft-scan-rng"), numBuckets = 4,
      keyCol = "k", statsCol = Some("ts_us"), inlineCompaction = false,
      maxDeltasPerBucket = 1000, appendOnly = appendOnly,
      emptySchema = org.apache.spark.sql.types.StructType.fromDDL(
        "k string, ts_us bigint, v int"))
    // 4 commits of DISJOINT time quartiles, disjoint keys (append-only
    // content either way) → per-file stats are tight per commit
    (0 until 4).foreach { b =>
      val rows = (0 until 200).map(i => (s"k${b * 200 + i}",
        (b * 1000 + i * 5).toLong, i))
      t.merge(rows.toDF("k", "ts_us", "v"), "k", b.toLong)
    }
    t
  }

  test("SQL range over an append-only stats table scans only the " +
      "intersecting commits' files") {
    GraftScan.install(spark)
    val t = mkRangeTable(appendOnly = true)
    GraftScan.relation(spark, t).createOrReplaceTempView("graft_rng_ao")
    val q = spark.sql(
      "SELECT k, v FROM graft_rng_ao WHERE ts_us BETWEEN 1000 AND 1995")
    val full = scannedFiles(GraftScan.relation(spark, t))
    val pruned = scannedFiles(q)
    assert(pruned.nonEmpty && pruned.size < full.size,
      s"expected range file-skipping: ${pruned.size} of ${full.size}")
    assert(pruned.toSet.subsetOf(full.toSet))
    assert(q.count() === 200L)
    // one-sided bound prunes too
    val half = spark.sql(
      "SELECT count(*) FROM graft_rng_ao WHERE ts_us >= 3000").head().getLong(0)
    assert(half === 200L)
    assert(scannedFiles(spark.sql(
      "SELECT k FROM graft_rng_ao WHERE ts_us >= 3000")).size < full.size)
  }

  test("SQL range over a NON-append-only table with live deltas falls " +
      "back to the full exact read") {
    GraftScan.install(spark)
    val t = mkRangeTable(appendOnly = false)
    GraftScan.relation(spark, t).createOrReplaceTempView("graft_rng_mut")
    val q = spark.sql(
      "SELECT k, v FROM graft_rng_mut WHERE ts_us BETWEEN 1000 AND 1995")
    // file skipping under last-writer-wins is unprovable with live
    // deltas: a superseded in-range row could shadow a newer
    // out-of-range version in a skipped file
    assert(scannedFiles(q).size ===
      scannedFiles(GraftScan.relation(spark, t)).size)
    assert(q.count() === 200L)
  }

  test("pruned and full plans agree for every key (superset guarantee)") {
    GraftScan.install(spark)
    val t = mkTable()
    GraftScan.relation(spark, t).createOrReplaceTempView("graft_snap3")
    val expect = t.read().select("conv_id", "turn_count").as[(String, Int)]
      .collect().toMap
    Seq("c0", "c49", "c50", "c199", "absent").foreach { k =>
      val got = spark.sql(
        s"SELECT turn_count FROM graft_snap3 WHERE conv_id = '$k'")
        .as[Int].collect().toSeq
      assert(got == expect.get(k).toSeq, s"key $k")
    }
  }
}
