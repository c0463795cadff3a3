package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via Spark bucketing — the shuffle-elimination story
  * for repeated large-table joins at 100 TB (SURVEY.md §2.2 joins row;
  * task brief: "repartition/bucketing for co-located joins").
  *
  * Two tables written with `bucketBy(B, key)` + `sortBy(key)` share a
  * partitioning: a join on the bucket key is planned as a SortMergeJoin
  * with NO Exchange on either side — each task reads matching buckets
  * directly. At 10^12 turns this converts every snapshot⋈lineage-style
  * join from a full shuffle of both sides into a local merge.
  *
  * The reference has no join at all (its lookup is a point get); this is
  * engine surface the task brief adds.
  */
object BucketedTables {

  /** Persist `df` as a bucketed managed table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * exchanges (asserted in PlanSpec).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
