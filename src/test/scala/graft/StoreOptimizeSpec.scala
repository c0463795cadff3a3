package graft

import scala.jdk.CollectionConverters._

import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, ZOrderBits}
import graft.store.IcebergLikeTable

/** OPTIMIZE (clustered rewrite): logical content unchanged, deltas
  * folded, and — the point — parquet row groups become skippable for
  * range reads on the cluster column(s). Interleaved-range merges make
  * every pre-optimize file span the whole time range, so any observed
  * row-group exclusion below is the clustering's alone. The z-order
  * expression itself is checked bit-level and under CODEGEN_ONLY.
  */
class StoreOptimizeSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: SparkSession = spark

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "k string, ts_us bigint, v bigint")

  /** 4 merges, each INTERLEAVED across the full ts range (stride-4), so
    * every delta file's (min, max) spans ~everything.
    */
  private def mkTable(rows: Int): IcebergLikeTable = {
    val t = new IcebergLikeTable(tmpDir("graft-opt") + "/t", 4,
      keyCol = "k", emptySchema = schema, inlineCompaction = false,
      maxDeltasPerBucket = 1000, statsCol = Some("ts_us"))
    (0 until 4).foreach { b =>
      // hash-shuffled row order inside each batch: merge input arrives
      // keyed, not time-ordered, so pre-optimize ROW GROUPS span the
      // whole ts range too (spark.range's natural order would hand the
      // unoptimized files time-tight row groups for free)
      val df = spark.range(rows).filter(pmod(col("id"), lit(4)) === b)
        .orderBy(hash(col("id")))
        .select(concat(lit("k"), col("id")).as("k"),
          col("id").as("ts_us"), pmod(col("id") * 7919, lit(10000)).as("v"))
      t.merge(df, "k", b.toLong)
    }
    t
  }

  test("zorder_bits: bit-exact interleave, sign-safe, SQL + codegen-only") {
    assert(ZOrderBits.interleave(0L, 0L) === 0L)
    assert(ZOrderBits.interleave(3L, 0L) === 5L)   // 0b11 -> 0b0101
    assert(ZOrderBits.interleave(0L, 3L) === 10L)  // 0b11 -> 0b1010
    assert(ZOrderBits.interleave(0x7FFFFFFFL, 0x7FFFFFFFL) ===
      0x3FFFFFFFFFFFFFFFL) // full 31+31 bits, never negative
    GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT zorder_bits(3L, 0L)").head().getLong(0) === 5L)
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      // two instances in one projection must codegen into one function
      val r = Seq((3L, 4L)).toDF("a", "b").select(
        GraftFunctions.zorder_bits(col("a"), col("b")).as("z1"),
        GraftFunctions.zorder_bits(col("b"), col("a")).as("z2")).head()
      assert(r.getLong(0) === ZOrderBits.interleave(3L, 4L))
      assert(r.getLong(1) === ZOrderBits.interleave(4L, 3L))
    } finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("delta files land key-sorted on disk (EliminateSorts regression)") {
    // the partitionBy writer's own Sort(__bucket) used to make Catalyst
    // drop the explicit key sort — files landed in arrival order and the
    // "key-sorted files" page-pruning premise was silently void
    val t = mkTable(4000)
    val m = t.readManifest()
    m.dataFiles.take(4).foreach { f =>
      val ks = spark.read.parquet(s"${t.root}/$f")
        .select("k").as[String].collect().toSeq
      assert(ks === ks.sorted, s"$f not key-sorted")
    }
  }

  test("optimize preserves content exactly and folds deltas") {
    val t = mkTable(4000)
    val before = t.read().as[(String, Long, Long)].collect().toSet
    assert(t.optimize(Seq("ts_us")))
    assert(t.read().as[(String, Long, Long)].collect().toSet === before)
    val m = t.readManifest()
    assert(m.deltas.values.forall(_.isEmpty))
    // per-file stats refreshed for the rewritten base: a range read of
    // the first quarter must not scan files stats exclude
    val quarter = t.readRange(0L, 999L).as[(String, Long, Long)].collect().toSet
    assert(quarter === before.filter(_._2 <= 999L))
  }

  test("optimize(ts) makes row groups skippable on ts; z-order on BOTH dims") {
    // small row groups so one file holds many: the skipping unit under test
    val hconf = spark.sparkContext.hadoopConfiguration
    val oldBlock = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", "16384")
    try {
      val rows = 120000
      val t = mkTable(rows)
      def rowGroups(filter: Option[FilterCompat.Filter]): (Int, Int) = {
        val m = t.readManifest()
        val files = m.dataFiles.map(f => s"${t.root}/$f")
        val counts = files.map { f =>
          val in = HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), hconf)
          val b0: org.apache.parquet.ParquetReadOptions.Builder =
            org.apache.parquet.HadoopReadOptions.builder(hconf)
          val opts = filter.fold(b0)(fl =>
            b0.withRecordFilter(fl).useStatsFilter(true)).build()
          val r = ParquetFileReader.open(in, opts)
          try r.getRowGroups.size finally r.close()
        }
        (counts.sum, files.size)
      }
      def tsRange(lo: Long, hi: Long) = FilterCompat.get(FilterApi.and(
        FilterApi.gtEq(FilterApi.longColumn("ts_us"), java.lang.Long.valueOf(lo)),
        FilterApi.ltEq(FilterApi.longColumn("ts_us"), java.lang.Long.valueOf(hi))))
      def vRange(lo: Long, hi: Long) = FilterCompat.get(FilterApi.and(
        FilterApi.gtEq(FilterApi.longColumn("v"), java.lang.Long.valueOf(lo)),
        FilterApi.ltEq(FilterApi.longColumn("v"), java.lang.Long.valueOf(hi))))

      val (allPre, _) = rowGroups(None)
      val (hitPre, _) = rowGroups(Some(tsRange(0, rows / 100)))
      // interleaved writes: stats exclude (almost) nothing pre-optimize
      assert(allPre > 8, s"need multiple row groups, got $allPre")
      assert(hitPre > allPre / 2,
        s"pre-optimize stats unexpectedly selective: $hitPre of $allPre")

      assert(t.optimize(Seq("ts_us")))
      val (allTs, _) = rowGroups(None)
      val (hitTs, _) = rowGroups(Some(tsRange(0, rows / 100)))
      assert(allTs > 8)
      assert(hitTs <= math.max(allTs / 4, 8),
        s"ts-clustered: expected most of $allTs row groups excluded, read $hitTs")

      val before = t.read().as[(String, Long, Long)].collect().toSet
      assert(t.optimize(Seq("ts_us", "v")))
      assert(t.read().as[(String, Long, Long)].collect().toSet === before)
      val (allZ, _) = rowGroups(None)
      val (hitZts, _) = rowGroups(Some(tsRange(0, rows / 20)))
      val (hitZv, _) = rowGroups(Some(vRange(0, 10000 / 20)))
      // z-order trades per-dim tightness for BOTH dims skipping: each
      // narrow single-dim range must still exclude a solid majority
      assert(hitZts <= math.max(allZ / 2, 8),
        s"z-order: ts range read $hitZts of $allZ row groups")
      assert(hitZv <= math.max(allZ / 2, 8),
        s"z-order: v range read $hitZv of $allZ row groups")
    } finally {
      if (oldBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", oldBlock)
    }
  }
}
