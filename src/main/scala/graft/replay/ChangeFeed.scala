package graft.replay

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import graft.store.IcebergLikeTable

/** Checkpointed follower of a table's change feed — the consumer runtime
  * for [[IcebergLikeTable.readChangesSince]]:
  *
  *   ChangeFeed.follow(src, ckptFile) { (changes, upToVersion) => ... }
  *
  * Each poll processes `readChangesSince(lastSynced)` (changed keys at
  * their current state — consecutive source commits coalesce, which is
  * the scale property: a consumer that fell behind processes each key
  * ONCE) and then advances the checkpoint to the version it saw, via
  * temp-file + atomic rename. Ordering is znap's data-before-offset
  * (reference: pipeline/PipelineBuilder.scala:106-111): a crash between
  * processing and the checkpoint write re-delivers the same range, so
  * the processor must be idempotent per (key, version) — an
  * [[IcebergLikeTable.merge]] keyed by the source version is exactly
  * that, making the end-to-end pipeline exactly-once
  * (ChangeFeedSpec proves it by crashing the processor mid-range).
  *
  * Retention contract: each poll reads through the CURRENT version's
  * retained manifest (pinning the range against commits landing
  * mid-poll), so a single poll must finish within the retention window —
  * but the follower's LAG is unbounded: however far behind the
  * checkpoint is, the next poll coalesces everything since it in one
  * pass (changes-since needs only the newest manifest, never the old
  * ones).
  */
object ChangeFeed {

  /** The checkpointed position, or -1 (from the beginning). */
  def synced(ckpt: String): Long = {
    val p = Paths.get(ckpt)
    if (Files.exists(p)) Files.readString(p).trim.toLong else -1L
  }

  /** One poll: process new changes if any, advance the checkpoint.
    * Returns the version processed up to, or None if already current.
    * `process` receives the coalesced changes and the version they
    * represent; it MUST complete before the checkpoint advances.
    */
  def poll(src: IcebergLikeTable, ckpt: String,
      includeDeletes: Boolean = false)(
      process: (DataFrame, Long) => Unit): Option[Long] = {
    val last = synced(ckpt)
    val current = src.readManifest().lastBatchId
    if (current <= last) None
    else {
      // changesBetween pins the range to `current`'s RETAINED manifest:
      // a commit landing mid-poll can neither relabel the batch (rows
      // stay ≤ current) nor GC its files while the version is retained —
      // so a poll must complete within the retention window
      // (retainManifests source commits), the same contract time travel
      // has.
      process(src.readChangesBetween(last, current, includeDeletes), current)
      writeCheckpoint(Paths.get(ckpt), current) // offset AFTER data
      Some(current)
    }
  }

  /** Poll until caught up (Trigger.AvailableNow analog). Returns the
    * number of non-empty syncs performed.
    */
  def catchUp(src: IcebergLikeTable, ckpt: String,
      includeDeletes: Boolean = false)(
      process: (DataFrame, Long) => Unit): Int = {
    var n = 0
    while (poll(src, ckpt, includeDeletes)(process).isDefined) n += 1
    n
  }

  /** The common consumer: maintain `dst` as an exact replica of `src`
    * via the change feed — the merge is keyed by the source version, so
    * re-delivery after a crash is absorbed by merge's idempotency.
    * Polls WITH delete markers: a key deleted at the source merges its
    * marker into `dst`, so the replica hides it too — an upsert-only
    * poll would leave deleted keys in the replica forever.
    */
  def syncTo(src: IcebergLikeTable, dst: IcebergLikeTable, ckpt: String): Int =
    catchUp(src, ckpt, includeDeletes = true) { (changes, v) =>
      dst.merge(changes, dst.keyCol, v)
    }

  private def writeCheckpoint(p: Path, v: Long): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.createDirectories(p.toAbsolutePath.getParent)
    Files.writeString(tmp, v.toString)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
