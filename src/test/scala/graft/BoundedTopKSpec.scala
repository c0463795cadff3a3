package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Native bounded_topk TypedImperativeAggregate: window equivalence,
  * partition invariance (exercises serialize/merge across the exchange),
  * null handling, SQL registration, and the ObjectHashAggregate plan.
  */
class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, keys: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    spark.createDataFrame(
      (0 until n).map(_ => (s"c${rnd.nextInt(keys)}", rnd.nextInt(1000000), s"t${rnd.nextInt(99)}"))
        .distinctBy(r => (r._1, r._2)))
      .toDF("conv_id", "turn_idx", "text")
  }

  private def viaNative(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("conv_id"))
      .agg(GraftFunctions.bounded_topk(k, col("turn_idx"),
        struct(col("turn_idx"), col("text"))).as("topk"))
      .select(col("conv_id"), explode(col("topk")).as("t"))
      .select(col("conv_id"), col("t.turn_idx"), col("t.text"))
      .as[(String, Int, String)].collect().toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rn", row_number().over(
        Window.partitionBy("conv_id").orderBy(col("turn_idx").desc)))
      .filter(col("rn") <= k).select(col("conv_id"), col("turn_idx"), col("text"))
      .as[(String, Int, String)].collect().toSet
  }

  test("equals the window formulation across k and partitioning") {
    val df = corpus(3000, 37, seed = 11)
    Seq(1, 4, 16).foreach { k =>
      assert(viaNative(df, k) == viaWindow(df, k), s"k=$k")
      assert(viaNative(df.repartition(17), k) == viaNative(df.repartition(1), k),
        s"partition invariance k=$k")
    }
  }

  test("output is ordered descending within each key") {
    val df = corpus(1000, 5, seed = 3)
    val rows = df.groupBy(col("conv_id"))
      .agg(GraftFunctions.bounded_topk(5, col("turn_idx"),
        struct(col("turn_idx"))).as("topk"))
      .select(col("topk.turn_idx").as("idxs"))
      .as[Seq[Int]].collect()
    rows.foreach(s => assert(s == s.sorted.reverse && s.size == 5))
  }

  test("null ordering keys are ignored; fewer than k rows returns them all") {
    val df = Seq(("a", Some(3), "x"), ("a", None, "dropped"), ("a", Some(9), "y"))
      .toDF("conv_id", "turn_idx", "text")
    assert(viaNative(df, 5) == Set(("a", 9, "y"), ("a", 3, "x")))
  }

  test("reachable from SQL text after registration") {
    graft.functions.GraftFunctions.registerAll(spark)
    corpus(500, 7, seed = 5).createOrReplaceTempView("btk_in")
    val got = spark.sql(
      """SELECT conv_id, t.turn_idx, t.text FROM (
           SELECT conv_id, bounded_topk(2, turn_idx, struct(turn_idx, text)) AS topk
           FROM btk_in GROUP BY conv_id) LATERAL VIEW explode(topk) AS t""")
      .as[(String, Int, String)].collect().toSet
    assert(got == viaWindow(spark.table("btk_in"), 2))
  }

  test("plans as ObjectHashAggregate partial+final, no Window sort") {
    val df = corpus(200, 4, seed = 9)
    val plan = df.groupBy(col("conv_id"))
      .agg(GraftFunctions.bounded_topk(3, col("turn_idx"),
        struct(col("turn_idx"))).as("topk"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_bounded_topk"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
