package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float-array
  * embeddings, computed in double with sequential accumulation (bit-equal
  * to the zip_with/aggregate formulation and to the DuckDB oracle).
  *
  * Why a custom Expression (SURVEY.md §7.4, preference order (b)): the
  * higher-order-function chain (zip_with → aggregate × 3) materializes an
  * intermediate array per row-pair and evaluates lambdas interpreted;
  * this expression is one fused loop with full whole-stage codegen — the
  * hot path of brute-force ANN over 10^8+ vectors.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // both inputs must be array<float>: getFloat on any other element type
  // would silently return garbage scores
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> inputs, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  // every local is ctx.freshName'd: two instances of this expression in
  // ONE generated function (e.g. `cosine_sim(a,b) > t AND cosine_sim(a,c)
  // > t` in a single predicate) would otherwise redeclare the same Java
  // locals — Janino rejects the class and Spark silently falls back to
  // interpreted eval for the whole operator
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val n = ctx.freshName("csN"); val dot = ctx.freshName("csDot")
      val nx = ctx.freshName("csNx"); val ny = ctx.freshName("csNy")
      val i = ctx.freshName("csI")
      val xv = ctx.freshName("csXv"); val yv = ctx.freshName("csYv")
      s"""
         |int $n = java.lang.Math.min($arr1.numElements(), $arr2.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $arr1.getFloat($i);
         |  double $yv = (double) $arr2.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the engine's native functions. */
object GraftFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    Shim.column(CosineSim(Shim.expression(a), Shim.expression(b)))

  def band_sig(c: Column, bands: Int, planesPerBand: Int): Column =
    BandSig(c, bands, planesPerBand)

  /** Native bounded per-key top-k (functions/BoundedTopK.scala):
    * `df.groupBy(key).agg(bounded_topk(8, $"turn_idx", struct(...)))`.
    */
  def bounded_topk(k: Int, ord: Column, payload: Column): Column =
    Shim.column(BoundedTopK(k, Shim.expression(ord), Shim.expression(payload))
      .toAggregateExpression())

  /** Native last-writer-wins (functions/LatestBy.scala): the payload
    * struct of the row with the greatest (ord1, ord2) — ObjectHashAggregate
    * where `max_by(struct, struct)` plans SortAggregate.
    */
  def latest_by(payload: Column, ord1: Column, ord2: Column): Column =
    Shim.column(LatestBy(Shim.expression(payload), Shim.expression(ord1),
      Shim.expression(ord2)).toAggregateExpression())

  def latest_by(payload: Column, ord: Column): Column =
    latest_by(payload, ord, org.apache.spark.sql.functions.lit(0L))

  /** Morton interleave of two 31-bit-scaled longs (functions/ZOrderBits
    * .scala) — the z-order clustering key for two-column OPTIMIZE.
    */
  def zorder_bits(a: Column, b: Column): Column =
    Shim.column(ZOrderBits(Shim.expression(a), Shim.expression(b)))

  private[functions] def cosineSimBuilder(
      args: Seq[Expression]): Expression = {
    require(args.length == 2, s"cosine_sim takes 2 arguments, got ${args.length}")
    CosineSim(args(0), args(1))
  }

  private[functions] def bandSigBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"band_sig takes (embedding, bands, planesPerBand), got ${args.length} args")
    def intArg(e: Expression, what: String): Int = e.eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"band_sig $what must be an integer literal, got $other")
    }
    BandSig(args(0), intArg(args(1), "bands"), intArg(args(2), "planesPerBand"))
  }

  private[functions] def latestByBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2 || args.length == 3,
      s"latest_by takes (payload, ord1[, ord2]), got ${args.length} args")
    val ord2 = if (args.length == 3) args(2)
      else org.apache.spark.sql.catalyst.expressions.Literal(0L)
    LatestBy(args(0), args(1), ord2)
  }

  private[functions] def boundedTopKBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      s"bounded_topk takes (k, ord, payload), got ${args.length} args")
    val k = args(0).eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"bounded_topk k must be an integer literal, got $other")
    }
    // bare AggregateFunction: the analyzer wraps it in AggregateExpression
    BoundedTopK(k, args(1), args(2))
  }

  private[functions] def zorderBitsBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"zorder_bits takes 2 arguments, got ${args.length}")
    ZOrderBits(args(0), args(1))
  }

  private[functions] def cmsEstimateBuilder(args: Seq[Expression]): Expression = {
    require(args.length == 2,
      s"cms_estimate takes (sketch, key), got ${args.length} args")
    CmsEstimate(args(0), args(1))
  }

  /** Make the native functions reachable from SQL text on an existing
    * session: `SELECT cosine_sim(embedding, q_emb)`,
    * `SELECT band_sig(embedding, 4, 4)`,
    * `SELECT bounded_topk(3, turn_idx, struct(role, text)) ... GROUP BY conv_id`.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    Shim.registerFunction(spark, "cosine_sim", cosineSimBuilder)
    Shim.registerFunction(spark, "band_sig", bandSigBuilder)
    Shim.registerFunction(spark, "bounded_topk", boundedTopKBuilder)
    Shim.registerFunction(spark, "latest_by", latestByBuilder)
    Shim.registerFunction(spark, "zorder_bits", zorderBitsBuilder)
    Shim.registerFunction(spark, "cms_estimate", cmsEstimateBuilder)
  }
}

/** Session-extension registration (`spark.sql.extensions=
  * graft.functions.GraftExtensions`) — the SparkSessionExtensions route
  * for sessions the caller doesn't construct imperatively.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      GraftFunctions.cosineSimBuilder))
    ext.injectFunction((FunctionIdentifier("band_sig"),
      new ExpressionInfo(classOf[BandSig].getName, "band_sig"),
      GraftFunctions.bandSigBuilder))
    ext.injectFunction((FunctionIdentifier("bounded_topk"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "bounded_topk"),
      GraftFunctions.boundedTopKBuilder))
    ext.injectFunction((FunctionIdentifier("latest_by"),
      new ExpressionInfo(classOf[LatestBy].getName, "latest_by"),
      GraftFunctions.latestByBuilder))
    ext.injectFunction((FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      GraftFunctions.cmsEstimateBuilder))
    // storage-aware point-lookup rewrite for GraftScan leaves (plans/GraftScan.scala)
    ext.injectOptimizerRule(_ => graft.plans.GraftBucketPrune)
  }
}
