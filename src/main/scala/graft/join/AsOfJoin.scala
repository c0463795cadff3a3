package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — for each left row, the single most
  * recent right row with the same key and right ts ≤ left ts. The
  * workhorse of temporal analytics (attribute a click to the last view;
  * join an event to the snapshot state that was current when it
  * happened) that plain equi-joins can't express without an
  * O(pairs-per-key) range join + per-pair max.
  *
  * Spark-first formulation — union + keyed window, ONE shuffle:
  * tag both sides, union, then `last(payload, ignoreNulls) OVER
  * (PARTITION BY key ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT)`
  * carries each right payload forward to every later left row. The plan
  * is a single hash-partition exchange on the key + one
  * sort-within-partitions — exactly a sort-merge join's cost, with no
  * per-key driver loop and no range-join blowup. Right rows sort BEFORE
  * left rows at equal ts (side 0 < 1), making the match inclusive.
  *
  * Skew note: one window partition per key serializes a hot key's
  * timeline on one task — inherent to the semantics (a running "latest
  * state" is a sequential scan per key). At 100 TB the guard is the same
  * as for the snapshot fold: keys are hash-spread across the cluster and
  * a single conversation/user timeline fits a task by construction.
  *
  * `rightCols` must not collide with left column names; the right ts is
  * exposed as `matchedTsAs` when non-empty (null ⟺ no match).
  */
object AsOfJoin {

  /** `tolerance`: maximum staleness — a right row older than
    * `leftTs - tolerance` does not match (its payload nulls out), the
    * pandas merge_asof semantic. Expressed as an interval-typed Column
    * (e.g. `expr("INTERVAL 1 HOUR")`); applied as a residual condition
    * after the carry-forward window, so the plan is unchanged.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      matchedTsAs: String = "", tolerance: Option[Column] = None): DataFrame = {
    val needTs = matchedTsAs.nonEmpty || tolerance.nonEmpty
    val tsName = if (matchedTsAs.nonEmpty) matchedTsAs else "__match_ts"
    val payload = if (needTs) rightCols :+ tsName else rightCols
    val leftKeep = left.columns.toSeq
    val taggedL = left
      .withColumns(payload.map(c => c -> lit(null)).toMap)
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val taggedR = right
      .select(keys.map(col) ++ rightCols.map(col) :+ col(rightTs).as("__ts"): _*)
      .withColumns(
        (leftKeep.filterNot(keys.contains).map(c => c -> lit(null)) ++
          (if (needTs) Seq(tsName -> col("__ts")) else Nil)).toMap)
      .withColumn("__side", lit(0))
    val cols = keys ++ leftKeep.filterNot(keys.contains) ++ payload ++
      Seq("__ts", "__side")
    val unioned = taggedL.select(cols.map(col): _*)
      .unionByName(taggedR.select(cols.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    val lefts = filled.filter(col("__side") === 1)
    // Staleness residual: a match older than leftTs - tolerance nulls out
    val bounded = tolerance match {
      case None => lefts
      case Some(tol) =>
        val fresh = col(tsName) >= col(leftTs) - tol
        payload.foldLeft(lefts)((df, c) =>
          df.withColumn(c, when(fresh, col(c))))
    }
    val outCols = leftKeep ++
      (if (matchedTsAs.isEmpty) rightCols else rightCols :+ matchedTsAs)
    bounded.select(outCols.map(col): _*)
  }
}
