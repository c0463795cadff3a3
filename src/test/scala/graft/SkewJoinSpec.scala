package graft

import org.apache.spark.sql.functions._
import graft.skew.Salting

/** Join-side skew, both remedies (north rule: "salting for hot
  * conversations and AQE skew-join handling"): AQE must actually SPLIT a
  * skewed sort-merge-join partition at runtime (plan-asserted on the
  * final adaptive plan), and the manual salted join — for the cases AQE
  * can't re-plan, like streaming micro-batches — must reproduce the
  * unsalted join's exact multiset of rows.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot key's sort-merge-join partition (skew=true)") {
    // incompressible per-row payloads — a constant pad compresses to
    // ~nothing in the shuffle and the hot partition never crosses the
    // byte threshold AQE measures
    val rnd = new scala.util.Random(5)
    def pad() = rnd.alphanumeric.take(80).mkString
    // one hot key carrying ~100x the bytes of every other key
    val left = ((1 to 10000).map(i => ("hot", i, pad())) ++
      (1 to 100).flatMap(k => (1 to 10).map(i => (s"k$k", i, pad()))))
      .toDF("k", "i", "pad")
    val right = (Seq("hot") ++ (1 to 100).map(k => s"k$k"))
      .flatMap(k => (1 to 20).map(j => (k, j))).toDF("k", "j")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k") {
      val joined = left.join(right, "k")
      // collect() executes THIS dataset's own QueryExecution — count()
      // or foreach would plan a separate/RDD-path execution and leave
      // this adaptive plan un-finalized
      assert(joined.collect().length === 10000 * 20 + 100 * 10 * 20)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"plan not executed:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join as skew-handled:\n$plan")
    }
  }

  test("salted join reproduces the unsalted join's multiset exactly") {
    val rnd = new scala.util.Random(3)
    val skewed = (1 to 5000).map(i =>
      (if (i % 3 == 0) "hot" else s"k${rnd.nextInt(40)}", i.toLong))
      .toDF("k", "row_id")
    // dim with DUPLICATE keys too — each dup must still match every probe row
    val dim = ((1 to 40).map(k => (s"k$k", k.toLong)) ++
      Seq(("hot", 100L), ("hot", 101L), ("only_dim", 7L))).toDF("k", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"row_id", $"v").as[(String, Long, Long)]
        .collect().sorted.toSeq
    val plain = canon(skewed.join(dim, Seq("k")))
    val salted = canon(Salting.saltedJoin(skewed, dim, Seq("k"),
      saltCols = Seq("row_id"), salts = 8))
    assert(salted === plain)
    assert(plain.nonEmpty)
    // left-outer form keeps unmatched probe rows as well
    val plainL = skewed.join(dim, Seq("k"), "left").count()
    val saltedL = Salting.saltedJoin(skewed, dim, Seq("k"),
      Seq("row_id"), 8, "left").count()
    assert(saltedL === plainL)
  }
}
