package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Morton (Z-order) interleave of two
  * 31-bit-scaled longs — the clustering key behind
  * [[graft.store.IcebergLikeTable.optimize]]'s two-column mode (the
  * OPTIMIZE ZORDER BY analog; Iceberg's sort-order z-transform).
  *
  * Inputs MUST already be scaled to [0, 2^31): bit j of `left` lands at
  * output bit 2j and of `right` at 2j+1, so the result is a 62-bit
  * non-negative long whose SIGNED ordering equals the unsigned Morton
  * ordering (a full 32+32 interleave would set the sign bit and invert
  * the sort for the upper half of either dimension). Rows sorted by this
  * value cluster locally in BOTH dimensions, so parquet row-group
  * min/max stay tight on both source columns and range predicates on
  * EITHER column skip row groups.
  *
  * One fused codegen call (a static interleave), no boxing, no UDF.
  */
case class ZOrderBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint inputs (pre-scaled to [0, 2^31)), " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderBits.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  // a single static call — nothing to freshName, two instances in one
  // generated function cannot collide
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrderBits.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderBits {
  /** Spread the low 31 bits of `x` to even bit positions (0, 2, …, 60). */
  def spread(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton-interleave the low 31 bits of `a` (even positions) and `b`
    * (odd positions). Always ≥ 0.
    */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
