package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving double→long encoding: `sortable_bits(x) < sortable_bits(y)`
  * iff `x` sorts before `y` under Spark's double ordering (−∞ < … < +∞ <
  * NaN, matching `java.lang.Double.compare`). The IEEE-754 trick in its
  * SIGNED-comparison form: non-negative doubles keep their raw bits
  * (already ascending positive longs); negative doubles flip every bit
  * EXCEPT the sign (`bits ^ ((bits >> 63) & Long.MaxValue)`), which
  * reverses their order while keeping them below zero. NaN's canonical
  * bit pattern (0x7ff8…) lands above +∞, exactly where Spark's ordering
  * puts it.
  *
  * Why it exists: it lets the integral-ordered [[LatestBy]] serve
  * double-scored argmax reductions — e.g. the ANN/k-means centroid
  * assignment (`latest_by(payload, sortable_bits(cos), -cluster)`), which
  * as `max_by(struct, struct(cos, -cluster))` planned SortAggregate over
  * the N×C scored rows (a per-partition sort of the largest intermediate
  * in the ANN pipeline).
  */
case class SortableDoubleBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sortable_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    bits ^ ((bits >> 63) & java.lang.Long.MAX_VALUE)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d =>
      s"""(java.lang.Double.doubleToLongBits($d) ^
         | ((java.lang.Double.doubleToLongBits($d) >> 63) & Long.MAX_VALUE))"""
        .stripMargin.replace("\n", ""))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortableDoubleBits {
  def sortable_bits(c: Column): Column =
    Shim.column(SortableDoubleBits(Shim.expression(c)))
}
