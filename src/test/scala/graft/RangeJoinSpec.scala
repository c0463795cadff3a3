package graft

import org.apache.spark.sql.functions._
import graft.join.RangeJoin

/** Binned range join vs driver brute force, the exactly-once pair
  * guarantee across bin-spanning intervals, half-open boundary semantics,
  * and the no-product-plan assertion.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches brute force; bin-spanning intervals emit each pair once") {
    val rnd = new scala.util.Random(11)
    val points = (0 until 400).map(i => (i.toLong, rnd.nextInt(10000).toLong))
    val ivals = (0 until 120).map { i =>
      val lo = rnd.nextInt(10000).toLong
      // lengths from sub-bin to many-bin (bin width 100): 1..2500
      (1000L + i, lo, lo + 1 + rnd.nextInt(2500))
    }
    val got = RangeJoin.pointInInterval(
      points.toDF("p_id", "pt"), "pt",
      ivals.toDF("i_id", "lo", "hi"), "lo", "hi", binWidth = 100L)
      .select($"p_id", $"i_id").as[(Long, Long)].collect()
    val expected = for {
      (pid, pt) <- points; (iid, lo, hi) <- ivals
      if pt >= lo && pt < hi
    } yield (pid, iid)
    assert(got.length === got.distinct.length, "duplicate pairs emitted")
    assert(got.toSet === expected.toSet)
    assert(expected.nonEmpty)
  }

  test("half-open boundaries: lo matches, hi does not; empty interval never") {
    val points = Seq((1L, 100L), (2L, 199L), (3L, 200L)).toDF("p_id", "pt")
    val ivals = Seq((10L, 100L, 200L), (11L, 150L, 150L)).toDF("i_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "pt", ivals, "lo", "hi", 64L)
      .select($"p_id", $"i_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L)))
  }

  test("extraKeys tighten the match to same-key pairs") {
    val points = Seq((1L, 5L, "a"), (2L, 5L, "b")).toDF("p_id", "pt", "k")
    val ivals = Seq((10L, 0L, 10L, "a")).toDF("i_id", "lo", "hi", "k")
    val got = RangeJoin.pointInInterval(points, "pt", ivals, "lo", "hi", 4L,
      extraKeys = Seq("k")).select($"p_id").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("degenerate long interval fails loudly, not quadratically") {
    val points = Seq((1L, 5L)).toDF("p_id", "pt")
    val ivals = Seq((10L, 0L, 10000L)).toDF("i_id", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", ivals, "lo", "hi",
        binWidth = 10L, maxBinsPerInterval = 100L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("interval spans")), s"wrong error: $ex")
  }

  test("plan is an equi-join on the bin key, not a nested-loop product") {
    val points = (0 until 100).map(i => (i.toLong, i.toLong * 7)).toDF("p_id", "pt")
    val ivals = (0 until 50).map(i => (i.toLong, i * 10L, i * 10L + 25)).toDF("i_id", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "pt", ivals, "lo", "hi", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join degraded to a product plan:\n$plan")
  }
}
