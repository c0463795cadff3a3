package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH band signatures of a float-array embedding:
  * `bands` longs, each packing `planesPerBand` sign bits of hyperplane dot
  * products (multi-band OR-amplification: two vectors are ANN candidates
  * if ANY band matches — the same banding trick as MinHash LSH, without it
  * a single signature's recall decays exponentially with plane count).
  *
  * Why a native Expression (SURVEY.md §7.4 preference (b)): the column-API
  * formulation unrolls dim × planes expression nodes (element_at × lit ×
  * sum per plane) — at dim=768 that explodes analysis and codegen. This is
  * ONE node evaluating a fused loop, codegen'd.
  *
  * Determinism/oracle parity: hyperplane p, dim i is the pure LCG
  * [[graft.ann.Ann.planeVal]] — identical on every executor, and
  * printable as exact double literals into the DuckDB oracle SQL, whose
  * `list_dot_product(CAST(emb AS DOUBLE[]), [...])` accumulates
  * left-to-right in double exactly like the loop below.
  */
case class BandSig(child: Expression, bands: Int, planesPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_sig"

  // reject array<double>/array<string> at analysis time — getFloat on a
  // non-float array would silently produce garbage signatures
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.simpleString}")
  }

  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  /** Plane matrix for a given dimensionality, cached per executor. */
  def planesFor(dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(dim, d =>
      Array.tabulate(bands * planesPerBand, d.intValue())((p, i) =>
        graft.ann.Ann.planeVal(p, i)))

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val planes = planesFor(n)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var p = 0
      while (p < planesPerBand) {
        val pl = planes(b * planesPerBand + p)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += x.getFloat(i).toDouble * pl(i); i += 1 }
        if (dot >= 0.0) sig |= (1L << p)
        p += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  // all locals freshName'd — two instances in one generated function must
  // not redeclare the same Java locals (see CosineSim.doGenCode's note)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("bandSig", this, classOf[BandSig].getName)
      val n = ctx.freshName("bsN"); val planes = ctx.freshName("bsPlanes")
      val out = ctx.freshName("bsOut"); val b = ctx.freshName("bsB")
      val sig = ctx.freshName("bsSig"); val p = ctx.freshName("bsP")
      val pl = ctx.freshName("bsPl"); val dot = ctx.freshName("bsDot")
      val i = ctx.freshName("bsI")
      s"""
         |int $n = $arr.numElements();
         |double[][] $planes = $ref.planesFor($n);
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $planesPerBand; $p++) {
         |    double[] $pl = $planes[$b * $planesPerBand + $p];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) $dot += ((double) $arr.getFloat($i)) * $pl[$i];
         |    if ($dot >= 0.0) $sig |= (1L << $p);
         |  }
         |  $out[$b] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandSig {
  def apply(c: Column, bands: Int, planesPerBand: Int): Column =
    Shim.column(BandSig(Shim.expression(c), bands, planesPerBand))
}
