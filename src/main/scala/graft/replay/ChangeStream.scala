package graft.replay

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
import graft.store.IcebergLikeTable

/** `readStream`-able change feed of an [[IcebergLikeTable]] — the
  * CONTINUOUS form of [[ChangeFeed]]'s poll-and-merge follower: a
  * Structured Streaming file source over the table's delta directories.
  *
  * Why this is sound: every commit appends its upsert set as
  * `data/delta-v<batchId>/…` parquet, one row per key per commit, each
  * row stamped `__seq = batchId` — so the delta directories ARE the
  * upsert change log, already durable, already ordered by `__seq`, with
  * no extra write amplification. The file source discovers new
  * `delta-v*` directories as commits land and its checkpoint makes
  * delivery exactly-once per FILE; [[resolved]] + a `__seq`-aware MERGE
  * make the downstream exactly-once per KEY (znap's signalling loop —
  * reference pipeline/PipelineBuilder.scala:219-246 — upgraded from
  * notify-then-refetch to direct change shipping).
  *
  * Contracts (documented, test-pinned):
  *  - A micro-batch may carry several commits (or a commit split across
  *    batches — files are the unit): consumers resolve per batch with
  *    [[resolved]] (last-writer-wins on `__seq`) and MERGE keyed by the
  *    SINK batch id; re-delivery after a crash is absorbed by merge's
  *    idempotency exactly like [[ChangeFeed]].
  *  - Data-before-commit ordering means a delta written by a merge that
  *    then LOSES the commit CAS can be observed before its writer
  *    retries; the retry overwrites the same directory with the same
  *    batch id, and per-key `__seq` resolution supersedes any phantom.
  *  - Retention: compaction folds delta chains into bases and GC deletes
  *    them; a consumer must stay within the delta retention window.
  *    Pair long-lag consumers with deferred compaction + graced vacuum
  *    (the Maintain CLI contract) — the same window the poll-based
  *    [[ChangeFeed]] documents.
  */
object ChangeStream {

  /** The raw change stream: one row per (key, commit), `__seq` = the
    * commit batch id, current committed schema (older files read evolved
    * columns as null) plus the `__del` delete marker (null/false =
    * upsert; true = the key was deleted by that commit — consumers that
    * MERGE the resolved batch into another table apply the delete for
    * free, since the marker row merges as a marker).
    * `maxFilesPerTrigger` bounds micro-batch size.
    */
  def changes(table: IcebergLikeTable, maxFilesPerTrigger: Int = 32)(
      implicit spark: SparkSession): DataFrame = {
    val withSeq = StructType(table.schema().fields ++ Seq(
      StructField("__seq", LongType),
      StructField(IcebergLikeTable.DeleteCol, BooleanType)))
    spark.readStream
      .schema(withSeq)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      // the writer's __bucket=N dirs are physical layout, not data:
      // recursive lookup skips partition inference (which would otherwise
      // demand one basePath across the per-commit delta-v* roots)
      .option("recursiveFileLookup", "true")
      .parquet(s"${table.root}/data/delta-v*")
  }

  /** Per-batch last-writer-wins resolution: at most one row per key (the
    * greatest `__seq`) — the shape [[IcebergLikeTable.merge]] requires.
    * Uses the native latest_by (ObjectHashAggregate, map-side combine).
    */
  def resolved(batch: DataFrame, keyCol: String): DataFrame = {
    val payload = batch.columns.filter(_ != keyCol)
    batch.groupBy(col(keyCol))
      .agg(graft.functions.GraftFunctions.latest_by(
        struct(payload.map(col): _*), col("__seq")).as("__r"))
      .select(col(keyCol) +: payload.map(c => col(s"__r.$c").as(c)): _*)
      .drop("__seq")
  }

  /** Continuous replica: stream `src`'s change feed into `dst` with an
    * exactly-once MERGE sink (checkpointed file-source offsets + merges
    * keyed by sink batch id). `availableNow = true` drains what exists
    * and stops (the catch-up form); `false` keeps following.
    */
  def replicate(src: IcebergLikeTable, dst: IcebergLikeTable, ckpt: String,
      availableNow: Boolean = true, maxFilesPerTrigger: Int = 32)(
      implicit spark: SparkSession): StreamingQuery = {
    val writer = changes(src, maxFilesPerTrigger).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        // persist before the emptiness probe — see MergeSink.apply: the
        // probe otherwise re-runs the change-resolution once for the
        // probe and once for the merge
        val up = resolved(df, dst.keyCol)
        up.persist()
        try {
          if (!up.isEmpty) { dst.merge(up, dst.keyCol, batchId); () }
        } finally { up.unpersist(); () }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
