package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.join.AsOfJoin

/** As-of join vs a driver-side brute force (per left row: max-ts right row
  * with key match and ts ≤ left ts), plus the edge semantics: inclusive
  * match at equal ts, null payload when no prior right row exists.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("matches driver brute force on a deterministic random input") {
    val rnd = new scala.util.Random(7)
    val lefts = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(20).toLong, ts(rnd.nextInt(1000).toLong)))
    val rights = (0 until 200).map(i =>
      (1000L + i, rnd.nextInt(20).toLong, ts(rnd.nextInt(1000).toLong), i * 1.5))
      // one right row per (key, ts): drop ts collisions deterministically
      .groupBy(r => (r._2, r._3)).map(_._2.maxBy(_._1)).toSeq
    val left = lefts.toDF("l_id", "k", "ts")
    val right = rights.toDF("r_id", "k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts",
      Seq("r_id", "v"), matchedTsAs = "r_ts")
      .select($"l_id", $"r_id", $"v", $"r_ts")
      .as[(Long, Option[Long], Option[Double], Option[Timestamp])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    lefts.foreach { case (lid, k, lts) =>
      val want = rights.filter(r => r._2 == k && !r._3.after(lts))
        .sortBy(_._3.getTime).lastOption
      val expect = (want.map(_._1), want.map(_._4), want.map(_._3))
      assert(got(lid) === expect, s"left $lid key $k ts $lts")
    }
  }

  test("equal timestamps match inclusively; missing prior rows give null") {
    val left = Seq((1L, 1L, ts(100)), (2L, 1L, ts(50)), (3L, 2L, ts(100)))
      .toDF("l_id", "k", "ts")
    val right = Seq((10L, 1L, ts(100))).toDF("r_id", "k", "ts")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("r_id"))
      .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("tolerance nulls out matches staler than the bound") {
    val left = Seq((1L, 1L, ts(100)), (2L, 1L, ts(500))).toDF("l_id", "k", "ts")
    val right = Seq((10L, 1L, ts(90))).toDF("r_id", "k", "ts")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("r_id"),
      tolerance = Some(expr("INTERVAL 60 SECONDS")))
      .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toMap
    // l=1 at t=100: view at t=90 is 10s old -> within 60s; l=2 at t=500:
    // 410s stale -> nulled
    assert(got === Map(1L -> Some(10L), 2L -> None))
  }

  test("plan has exactly one exchange (sort-merge shape, no range blowup)") {
    val left = (0 until 100).map(i => (i.toLong, i % 5L, ts(i))).toDF("l_id", "k", "ts")
    val right = (0 until 50).map(i => (i + 500L, i % 5L, ts(i * 2))).toDF("r_id", "k", "ts")
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("r_id"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 keyed exchange, got $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of join fell back to a product plan:\n$plan")
  }
}
