package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — match point rows to interval rows
  * with lo ≤ pt < hi — without the BroadcastNestedLoopJoin a plain
  * inequality join degrades to (quadratic work, single-threaded build
  * side; the classic Spark range-join trap).
  *
  * Binning: intervals explode to one row per covered bin of width
  * `binWidth` (`sequence(floor(lo/w), floor((hi-1)/w))`), points key to
  * their single bin, and the match becomes an EQUI-join on (bin ∪
  * extraKeys) + an exact residual filter. A point lives in exactly one
  * bin, so every qualifying (point, interval) pair surfaces exactly once
  * — no post-dedup. Cost: shuffle of points + exploded intervals on the
  * bin key, i.e. O(points + intervals · bins-per-interval) — pick
  * `binWidth` near the typical interval length so the blow-up factor
  * stays ~1-2×. Degenerate long intervals multiply the explode; at 100 TB
  * the guard is the same bucket-stats monitoring as LSH ([[graft.dedup.Dedup.bucketStats]]
  * pattern): alert on max((hi-lo)/binWidth) rather than silently paying.
  */
object RangeJoin {

  /** All (point, interval) matches with lo ≤ pt < hi (half-open), both
    * sides' columns preserved. `ptCol`/`loCol`/`hiCol` must be integral
    * (epoch micros, offsets...); `extraKeys` adds equi-key columns that
    * must exist on both sides (e.g. a tenant id) and tightens the join.
    * Empty/negative intervals (hi ≤ lo) match nothing, by definition of
    * the half-open containment.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long, extraKeys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val w = lit(binWidth)
    // A degenerate interval (hi-lo >> binWidth) explodes to that many
    // rows — fail LOUDLY instead of letting one bad interval OOM an
    // executor at scale (tune binWidth or split such intervals). The
    // guard is woven into the sequence's upper bound so column pruning
    // cannot eliminate it.
    val loBin = floor(col(loCol) / w).cast("long")
    val hiBin = floor((col(hiCol) - 1) / w).cast("long")
    val guardedHi = when(hiBin - loBin >= lit(maxBinsPerInterval),
      raise_error(concat(lit(s"range join: interval spans >= " +
        s"$maxBinsPerInterval bins of width $binWidth at "),
        col(loCol).cast("string"))).cast("long"))
      .otherwise(hiBin)
    val binned = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("__bin", explode(sequence(loBin, guardedHi)))
    val keyed = points.withColumn("__bin", floor(col(ptCol) / w).cast("long"))
    keyed.join(binned, Seq("__bin") ++ extraKeys)
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }
}
