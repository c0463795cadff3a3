package graft

import org.apache.spark.sql.functions._
import graft.functions.SortableDoubleBits.sortable_bits

/** Order-preservation of the double→long bits encoding, including the
  * special values (±0, ±∞, NaN, subnormals) — the property that lets
  * latest_by serve double-scored argmax with Spark-identical ordering.
  */
class SortableDoubleBitsSpec extends SparkSpec {
  import spark.implicits._

  test("encoding preserves Spark's double ordering over special values") {
    val vals = Seq(Double.NegativeInfinity, -1e300, -1.5, -Double.MinPositiveValue,
      -0.0, 0.0, Double.MinPositiveValue, 1.5, 1e300,
      Double.PositiveInfinity, Double.NaN)
    val df = vals.toDF("d")
      .select($"d", sortable_bits($"d").as("bits"))
    // Spark's sort on the double column and on the encoded column must
    // produce the same sequence
    val byDouble = df.orderBy($"d", $"bits").select($"bits").as[Long].collect().toSeq
    val byBits = df.orderBy($"bits").select($"bits").as[Long].collect().toSeq
    assert(byDouble === byBits)
    assert(byBits.sorted === byBits)
    // strict monotonicity except the -0.0/0.0 pair (equal under Spark's
    // double ordering is not required — only order preservation)
    val pairs = df.collect().map(r => r.getDouble(0) -> r.getLong(1))
    val nanEnc = pairs.collectFirst { case (d, b) if d.isNaN => b }.get
    val enc = pairs.filterNot(_._1.isNaN).toMap
    assert(nanEnc > enc(Double.PositiveInfinity),
      "NaN must sort above +Infinity (Spark ordering)")
    assert(enc(Double.NegativeInfinity) < enc(-1e300))
    assert(enc(-0.0) <= enc(0.0) && enc(-1.5) < enc(-0.0) &&
      enc(0.0) < enc(1.5))
  }

  test("argmax via latest_by(sortable_bits) equals max_by on doubles") {
    import graft.functions.GraftFunctions.latest_by
    val rows = (0 until 2000).map(i =>
      (s"k${i % 37}", math.sin(i * 1.7) * math.pow(10, i % 7), i.toLong))
    val df = rows.toDF("k", "score", "id").repartition(8)
    val got = df.groupBy($"k")
      .agg(latest_by(struct($"id"), sortable_bits($"score"), $"id")
        .getField("id").as("id"))
      .as[(String, Long)].collect().toMap
    val want = df.groupBy($"k")
      .agg(max_by($"id", struct($"score", $"id")).as("id"))
      .as[(String, Long)].collect().toMap
    assert(got === want)
  }
}
