package graft

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.store.IcebergLikeTable

/** Per-file min/max column stats in the manifest (the Iceberg
  * metadata-skipping analog): readRange must scan ONLY files whose
  * recorded bounds intersect the range — plan-asserted AND
  * listener-asserted — while staying row-exact against the unpruned
  * filter; files without stats are never skipped.
  */
class StatsPruneSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "evt string, user_id bigint, ts_us bigint")

  /** Append-only event-log table: 4 commits, each a disjoint ts_us range
    * of 1000 (per-commit files therefore carry tight disjoint bounds).
    */
  private def mkLog(tag: String): IcebergLikeTable = {
    val t = new IcebergLikeTable(tmpDir(tag) + "/t", numBuckets = 2,
      keyCol = "evt", emptySchema = schema,
      inlineCompaction = false, maxDeltasPerBucket = 1000,
      statsCol = Some("ts_us"))
    (0 until 4).foreach { b =>
      val rows = (0 until 50).map(i =>
        (s"e-$b-$i", (i % 5).toLong, (b * 1000 + i * 20).toLong))
      t.merge(rows.toDF("evt", "user_id", "ts_us"), "evt", b.toLong)
    }
    t
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.inputFiles.toSeq
    }.flatten

  test("commit records per-file bounds; readRange skips non-intersecting files") {
    val t = mkLog("stats")
    val m = t.readManifest()
    assert(m.fileStats.size === m.dataFiles.size,
      "every written file should have footer stats")
    m.fileStats.foreach { case (f, (mn, mx)) =>
      assert(mn <= mx && mn >= 0 && mx < 4000, s"bounds off for $f: ($mn,$mx)")
    }
    // range = commit 1 only (ts_us 1000..1980): files of commits 0/2/3 skip
    val inRange = t.filesInRange(1000L, 1999L)
    assert(inRange.nonEmpty && inRange.size < m.dataFiles.size,
      s"no skipping: ${inRange.size} of ${m.dataFiles.size}")
    assert(inRange.forall(_.contains("delta-v1")), s"wrong files kept: $inRange")
    val scanned = scannedFiles(t.readRange(1000L, 1999L))
    assert(scanned.nonEmpty && scanned.forall(_.contains("delta-v1")),
      s"plan scans out-of-range files: $scanned")
  }

  test("readRange rows == unpruned filter rows (exactness on the append-only log)") {
    val t = mkLog("statsrows")
    val want = t.read().where(col("ts_us") >= 500L && col("ts_us") <= 2500L)
      .as[(String, Long, Long)].collect().toSet
    val got = t.readRange(500L, 2500L)
      .as[(String, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // the listener evidence: the pruned read touches fewer input rows
    def rowsRead(body: => Unit): Long = {
      val n = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) n.addAndGet(m.inputMetrics.recordsRead)
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        org.apache.spark.sql.graftshim.Shim.waitListenerBus(spark.sparkContext)
        n.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val full = rowsRead { t.read().where(col("ts_us").between(1000L, 1999L)).count() }
    val pruned = rowsRead { t.readRange(1000L, 1999L).count() }
    assert(pruned < full, s"pruned read $pruned rows, full $full")
  }

  test("files without stats are never skipped; stats survive compaction") {
    // A file can lack a stat entry even under consistent writers (e.g. a
    // footer unreadable at commit time): absent bounds must read as
    // "unknown, never skip". Simulate by stripping one delta file's stat
    // line from the manifest. (A whole stats-BLIND writer is no longer
    // constructible against this table — the commit-time contract guard
    // rejects it; see TableMaintenanceSpec.)
    val t = mkLog("statslegacy")
    val mPath = java.nio.file.Paths.get(t.root, "manifest.json")
    val lines = java.nio.file.Files.readString(mPath).split("\n").toSeq
    // victim: a commit-0 file (bounds inside [0, 999])
    val victim = lines.find(l => l.startsWith("stat:") &&
      l.contains("delta-v0")).get
    val victimFile = victim.substring(5, victim.lastIndexOf('='))
    java.nio.file.Files.writeString(mPath,
      lines.filterNot(_ == victim).mkString("\n") + "\n")
    // range [3000, 3999] excludes the victim's rows by VALUE, but with
    // its bounds forgotten the file must be KEPT (scanned)
    val kept = t.filesInRange(3000L, 3999L)
    assert(kept.contains(victimFile), "stat-less file was skipped")
    // readRange stays row-correct: the value filter still excludes it
    assert(t.readRange(3000L, 3999L).as[(String, Long, Long)].collect()
      .forall(v => v._3 >= 3000L && v._3 <= 3999L))
    // compaction (through the manifest-restored contract) rewrites with
    // fresh footer bounds — the stripped entry is re-enriched
    val t2 = IcebergLikeTable.open(t.root, inlineCompaction = false,
      maxDeltasPerBucket = 1)
    assert(t2.compact())
    val m2 = t2.readManifest()
    assert(m2.deltas.values.forall(_.isEmpty))
    assert(m2.fileStats.size === m2.dataFiles.size,
      "compacted bases should carry fresh stats")
    assert(t2.read().count() === 200L)
  }
}
