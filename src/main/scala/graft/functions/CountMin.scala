package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import scala.util.hashing.MurmurHash3

/** Count-Min sketch as a typed, MERGEABLE Aggregator — the
  * heavy-hitter/frequency sketch a 100-TB pipeline uses where exact
  * per-key counts would shuffle the key universe: state is a d×w long
  * matrix (80 KB here), update increments one cell per row, merge is
  * elementwise addition — so Spark runs it as a partial aggregate
  * (map-side combine; only sketch matrices cross the wire) and the same
  * object drops into streaming state.
  *
  * Guarantees (Cormode & Muthukrishnan 2005): estimate(x) ≥ true(x)
  * always (deterministic — counters only over-count on collisions), and
  * estimate(x) ≤ true(x) + (e/w)·N with probability 1 − e^−d per query.
  * Hashes are seeded MurmurHash3 — deterministic across JVMs/replays.
  */
object CountMin {

  final val Depth = 5
  final val Width = 2000

  /** ε of the default geometry: estimate ≤ true + eps·N w.h.p. */
  final val Eps: Double = math.E / Width

  private def cell(row: Int, key: String): Int =
    row * Width + math.floorMod(MurmurHash3.stringHash(key, row), Width)

  private[graft] class SketchAgg
      extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](Depth * Width)
    def reduce(b: Array[Long], key: String): Array[Long] = {
      var i = 0
      while (i < Depth) { b(cell(i, key)) += 1L; i += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Aggregate column building the sketch from a string key column. */
  def sketch(key: Column): Column =
    org.apache.spark.sql.functions.udaf(new SketchAgg).apply(key)

  /** Min-over-rows probe shared by [[CmsEstimate]]'s interpreted eval and
    * its generated code (a static forwarder makes it callable from Janino
    * as `graft.functions.CountMin.probe`). Reads the d probed cells
    * straight out of Catalyst's [[ArrayData]] — the sketch never converts
    * to a boxed Scala collection. The key hash MUST stay
    * `MurmurHash3.stringHash` on the JVM String to match [[SketchAgg]]'s
    * build-side [[cell]].
    */
  def probe(sk: ArrayData, key: UTF8String): Long = {
    // geometry guard BEFORE the loop (one branch-predictable check):
    // cms_estimate is SQL-registered for arbitrary input and
    // UnsafeArrayData.getLong does NO bounds checking — a user-supplied
    // sketch shorter than Depth×Width would silently read out-of-bounds
    // memory and return garbage
    if (sk.numElements() != Depth * Width)
      throw new IllegalArgumentException(
        s"cms_estimate: sketch has ${sk.numElements()} cells, " +
          s"expected ${Depth * Width} (depth=$Depth width=$Width)")
    val s = key.toString
    var best = Long.MaxValue
    var i = 0
    while (i < Depth) {
      val v = sk.getLong(cell(i, s)); if (v < best) best = v; i += 1
    }
    best
  }

  /** Point estimate of a key's count from a built sketch column — a
    * native codegen'd Expression, not a UDF: the r4 UDF form took
    * `Seq[Long]`, so every probed row boxed the whole d×w matrix
    * (10,000 cells) before touching Depth cells — O(d·w) per row
    * instead of O(d), and a codegen boundary in the hot filter of
    * [[graft.queries.RelationalQueries.heavyHitters]]'s pass 2
    * (measured: heavy_hitters 14.9 s at sf0.1 with 0.13 MB shuffle —
    * pure probe CPU).
    */
  def estimate(sk: Column, key: Column): Column =
    Shim.column(CmsEstimate(Shim.expression(sk), Shim.expression(key)))
}

/** `cms_estimate(sketch, key)`: min over the sketch's d seeded-hash cells
  * for `key` — the Count-Min point query as a whole-stage-codegen
  * expression (SURVEY.md §7.4 preference (b); locals hygiene and probe
  * delegation follow [[CosineSim]]).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint> sketch, string key), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CountMin.probe(a.asInstanceOf[ArrayData], b.asInstanceOf[UTF8String])

  // one static call — the generated function stays tiny and the probe
  // loop JITs once for every operator that embeds this expression
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, key) =>
      s"${ev.value} = graft.functions.CountMin.probe($sk, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
