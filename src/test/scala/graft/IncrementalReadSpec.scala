package graft

import org.apache.spark.sql.functions._
import graft.store.IcebergLikeTable

/** readChangesSince: exact upsert change feed with file-level skipping,
  * stable across compaction (preserved per-row __seq) and rebucket.
  */
class IncrementalReadSpec extends SparkSpec {
  import spark.implicits._

  private def snap(pairs: (String, Int)*) =
    pairs.toDF("conv_id", "turn_count")

  private def mk(maxDeltas: Int = 8): IcebergLikeTable = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    new IcebergLikeTable(tmpDir("graft-cdc"), numBuckets = 4,
      maxDeltasPerBucket = maxDeltas,
      emptySchema = org.apache.spark.sql.types.StructType.fromDDL(
        "conv_id string, turn_count int"))
  }

  private def changes(t: IcebergLikeTable, since: Long): Map[String, Int] =
    t.readChangesSince(since).as[(String, Int)].collect().toMap

  test("changes since v = keys updated after v, at their CURRENT state") {
    val t = mk()
    t.merge(snap("a" -> 1, "b" -> 1, "c" -> 1), "conv_id", 0L)
    t.merge(snap("b" -> 2), "conv_id", 1L)
    t.merge(snap("b" -> 3, "d" -> 1), "conv_id", 2L)
    assert(changes(t, -1L) == Map("a" -> 1, "b" -> 3, "c" -> 1, "d" -> 1))
    assert(changes(t, 0L) == Map("b" -> 3, "d" -> 1)) // b at CURRENT state, once
    assert(changes(t, 1L) == Map("b" -> 3, "d" -> 1))
    assert(changes(t, 2L) == Map.empty)
  }

  test("compaction does not fabricate changes (preserved per-row __seq)") {
    val t = mk(maxDeltas = 2) // compact aggressively
    t.merge(snap((0 until 40).map(i => s"k$i" -> 1): _*), "conv_id", 0L)
    (1 to 6).foreach(b => t.merge(snap("k1" -> b.toInt), "conv_id", b.toLong))
    // k1's bucket has been compacted multiple times; every other key's
    // row was rewritten into new base files — but their seq is preserved
    assert(changes(t, 0L) == Map("k1" -> 6))
    assert(changes(t, 5L) == Map("k1" -> 6))
    assert(changes(t, 6L) == Map.empty)
  }

  test("rebucket changes layout, not the change feed") {
    val t = mk()
    t.merge(snap("a" -> 1, "b" -> 1), "conv_id", 0L)
    t.merge(snap("b" -> 2), "conv_id", 1L)
    t.rebucket(16)
    assert(changes(t, 1L) == Map.empty) // no phantom changes from the rewrite
    assert(changes(t, 0L) == Map("b" -> 2))
    assert(changes(t, -1L) == Map("a" -> 1, "b" -> 2))
  }

  test("readChangesBetween: historical range at as-of state; expired range fails") {
    val t = mk()
    t.merge(snap("a" -> 1, "b" -> 1), "conv_id", 0L)
    t.merge(snap("b" -> 2, "c" -> 1), "conv_id", 1L)
    t.merge(snap("b" -> 3), "conv_id", 2L)
    def between(lo: Long, hi: Long) =
      t.readChangesBetween(lo, hi).as[(String, Int)].collect().toMap
    // range (0, 1]: b at its AS-OF-v1 state (2, not the current 3), plus c
    assert(between(0L, 1L) == Map("b" -> 2, "c" -> 1))
    assert(between(1L, 2L) == Map("b" -> 3))
    assert(between(-1L, 2L) == Map("a" -> 1, "b" -> 3, "c" -> 1))
    // retention (2 manifests): v0 expired → range ending there fails loudly
    assert(intercept[IllegalArgumentException](between(-1L, 0L))
      .getMessage.contains("retained"))
  }

  test("a downstream replica stays exact syncing from the change feed alone") {
    // the consumer pattern readChangesSince exists for: a derived table
    // refreshed per sync with I/O = changes since its last sync, never a
    // source scan — including syncs that coalesce several source commits
    val src = mk()
    val dst = mk()
    var synced = -1L
    def sync(): Unit = {
      val v = src.readManifest().lastBatchId
      if (v > synced) {
        dst.merge(src.readChangesSince(synced), "conv_id", v)
        synced = v
      }
    }
    src.merge(snap("a" -> 1, "b" -> 1), "conv_id", 0L); sync()
    src.merge(snap("b" -> 2, "c" -> 1), "conv_id", 1L)
    src.merge(snap("a" -> 3), "conv_id", 2L); sync() // coalesced 1+2
    src.merge(snap("d" -> 1), "conv_id", 3L); sync()
    assert(dst.read().as[(String, Int)].collect().toMap ==
      src.read().as[(String, Int)].collect().toMap)
    assert(dst.read().as[(String, Int)].collect().toMap ==
      Map("a" -> 3, "b" -> 2, "c" -> 1, "d" -> 1))
  }

  test("snapshot isolation: a pre-commit reader still collects after commit+GC (retention window)") {
    // read() pins the manifest's file list at plan time; retainManifests
    // (default 2) keeps the previous version's files through the next
    // commit's GC, so a reader one version behind never hits a deleted
    // file — the Iceberg snapshot-isolation contract our GC must honor.
    val t = mk(maxDeltas = 1) // the next merge compacts + GCs aggressively
    t.merge(snap((0 until 20).map(i => s"k$i" -> 1): _*), "conv_id", 0L)
    val pinned = t.read() // manifest resolved NOW: v0's file list, lazy scan
    t.merge(snap("k1" -> 99), "conv_id", 1L) // compaction rewrites, GC runs
    // the pinned reader must still collect v0's content — its files are
    // protected because the retained v0 manifest references them
    assert(pinned.as[(String, Int)].collect().toMap ==
      (0 until 20).map(i => s"k$i" -> 1).toMap)
    // and a fresh read sees v1
    assert(t.read().as[(String, Int)].collect().toMap ==
      ((0 until 20).map(i => s"k$i" -> 1).toMap + ("k1" -> 99)))
  }

  test("reads only files written after the since version (file skipping)") {
    val t = mk()
    t.merge(snap((0 until 30).map(i => s"k$i" -> 1): _*), "conv_id", 0L)
    t.merge(snap("k1" -> 2), "conv_id", 1L)
    val all = t.readChangesSince(-1L).inputFiles.length
    val inc = t.readChangesSince(0L).inputFiles.length
    assert(inc < all, s"expected file skipping: $inc vs $all")
    // no compaction has run: the incremental read touches ONLY batch-1 deltas
    assert(t.readChangesSince(0L).inputFiles.forall(_.contains("delta-v1")))
  }
}
