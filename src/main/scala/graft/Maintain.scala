package graft

import org.apache.spark.sql.SparkSession
import graft.store.IcebergLikeTable

/** Maintenance entry point for spark-submit (tools/submit.sh): runs the
  * out-of-band table operations a production deployment schedules between
  * micro-batches — deferred compaction, deep-clean vacuum, bucket-count
  * evolution, column drops — plus read-only introspection. Usage:
  *
  *   graft.Maintain <tableRoot> compact
  *   graft.Maintain <tableRoot> optimize <col>[,<col2>]
  *   graft.Maintain <tableRoot> vacuum
  *   graft.Maintain <tableRoot> rebucket <n>
  *   graft.Maintain <tableRoot> drop-column <name>
  *   graft.Maintain <tableRoot> purge-deletes <beforeBatchId>
  *   graft.Maintain <tableRoot> versions | stats | schema
  *
  * All mutations are single-writer atomic manifest commits (safe to
  * interleave with a running stream's merges — see IcebergLikeTable).
  */
object Maintain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Maintain <tableRoot> <op> [arg]")
    val (root, op) = (args(0), args(1))
    if (op == "rebucket" || op == "drop-column" || op == "purge-deletes" ||
        op == "optimize")
      require(args.length >= 3, s"usage: graft.Maintain <tableRoot> $op <arg>")
    // spark-submit provides spark.master; direct runs fall back to local
    val builder = SparkSession.builder()
      .appName(s"graft-maintain-$op")
      .config("spark.sql.session.timeZone", "UTC")
    implicit val spark: SparkSession =
      (if (sys.props.contains("spark.master")) builder
       else builder.master("local[4]")).getOrCreate()
    // The table CONTRACT (key column, stats column, bucket count,
    // append-only flag) comes from the manifest via open() — a rewrite op
    // (compact / optimize / rebucket / purge-deletes) run with mismatched
    // defaults would resolve last-writer-wins by the wrong key or strip
    // per-file range stats; the manifest is the source of truth and the
    // commit path rejects contradicting writers. GRAFT_BLOOM_NDV must
    // still match the owning pipeline's keyBloomNdv for bloom-enabled
    // tables: the bloom choice is writer-side by design (like parquet's
    // own option), so running a rewrite without it silently strips the
    // key blooms the lookup path relies on.
    val bloomNdv = sys.env.get("GRAFT_BLOOM_NDV").map(_.toLong)
    val t = IcebergLikeTable.open(root,
      inlineCompaction = false, keyBloomNdv = bloomNdv)
    op match {
      case "compact" =>
        println(s"compacted=${t.compact()}")
      case "optimize" =>
        // full clustered rewrite: 1 col = linear sort, 2 = z-order
        println(s"optimized=${t.optimize(args(2).split(',').toSeq)}")
      case "vacuum" =>
        // out-of-band deep clean: grace-shield files younger than 15 min
        // (an in-flight micro-batch's uncommitted deltas) — see
        // IcebergLikeTable.vacuum
        t.vacuum(graceMs = sys.env.getOrElse("GRAFT_VACUUM_GRACE_MS",
          "900000").toLong)
        println(s"dataFilesOnDisk=${t.dataFilesOnDisk()}")
      case "rebucket" =>
        t.rebucket(args(2).toInt); println(s"buckets=${t.currentBuckets()}")
      case "drop-column" =>
        t.dropColumn(args(2)); println(s"schema=${t.schema().fieldNames.mkString(",")}")
      case "purge-deletes" =>
        // delete-marker retention: markers with seq <= the floor age out;
        // CDC consumers checkpointed before the floor may miss those
        // deletes (same window contract as delta retention / vacuum)
        t.purgeDeletes(args(2).toLong)
        println(s"lastBatchId=${t.readManifest().lastBatchId}")
      case "versions" =>
        println(t.manifestVersions().mkString(","))
      case "stats" =>
        val (b, d) = t.fileStats()
        println(s"baseFiles=$b deltaFiles=$d buckets=${t.currentBuckets()} " +
          s"lastBatchId=${t.readManifest().lastBatchId}")
      case "schema" =>
        println(t.schema().treeString)
      case other =>
        throw new IllegalArgumentException(s"unknown op '$other'")
    }
    spark.stop()
  }
}
