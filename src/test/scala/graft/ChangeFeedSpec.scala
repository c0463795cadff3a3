package graft

import graft.replay.ChangeFeed
import graft.store.IcebergLikeTable

/** Checkpointed change-feed follower: coalesced catch-up, crash between
  * process and checkpoint re-delivers but the keyed merge absorbs it
  * (exactly-once end-to-end), and a fresh follower bootstraps from -1.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private def snap(pairs: (String, Int)*) = pairs.toDF("conv_id", "n")
  private def mk(tag: String) = new IcebergLikeTable(tmpDir(tag) + "/t", 4,
    emptySchema = org.apache.spark.sql.types.StructType.fromDDL(
      "conv_id string, n int"))
  private def content(t: IcebergLikeTable) =
    t.read().as[(String, Int)].collect().toMap

  test("follower replicates exactly, coalescing multi-commit lag") {
    val src = mk("cfsrc"); val dst = mk("cfdst")
    val ckpt = tmpDir("cfckpt") + "/pos"
    src.merge(snap("a" -> 1, "b" -> 1), "conv_id", 0L)
    assert(ChangeFeed.syncTo(src, dst, ckpt) == 1)
    src.merge(snap("b" -> 2), "conv_id", 1L)
    src.merge(snap("c" -> 1), "conv_id", 2L)
    assert(ChangeFeed.syncTo(src, dst, ckpt) == 1) // one coalesced sync
    assert(ChangeFeed.syncTo(src, dst, ckpt) == 0) // caught up: no-op
    assert(content(dst) == content(src))
    assert(ChangeFeed.synced(ckpt) == 2L)
  }

  test("crash between process and checkpoint: re-delivery absorbed (exactly-once)") {
    val src = mk("cfsrc2"); val dst = mk("cfdst2")
    val ckpt = tmpDir("cfckpt2") + "/pos"
    src.merge(snap("a" -> 1), "conv_id", 0L)
    ChangeFeed.syncTo(src, dst, ckpt)
    src.merge(snap("a" -> 2, "b" -> 1), "conv_id", 1L)

    // the processor merges into dst, then "crashes" before the
    // checkpoint write — data landed, offset did not (znap's
    // data-before-offset ordering)
    intercept[RuntimeException] {
      ChangeFeed.poll(src, ckpt) { (changes, v) =>
        dst.merge(changes, "conv_id", v)
        throw new RuntimeException("crash before checkpoint")
      }
    }
    assert(ChangeFeed.synced(ckpt) == 0L) // offset unmoved
    // restart: the same range re-delivers; merge(batchId=1) is a
    // duplicate delivery for dst and is skipped — state stays exact
    assert(ChangeFeed.syncTo(src, dst, ckpt) == 1)
    assert(content(dst) == Map("a" -> 2, "b" -> 1))
    assert(ChangeFeed.synced(ckpt) == 1L)
  }
}
