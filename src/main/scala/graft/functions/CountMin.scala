package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf
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

  /** Point estimate of a key's count from a built sketch column. */
  val estimate = udf { (sk: Seq[Long], key: String) =>
    var best = Long.MaxValue
    var i = 0
    while (i < Depth) {
      val v = sk(cell(i, key)); if (v < best) best = v; i += 1
    }
    best
  }
}
