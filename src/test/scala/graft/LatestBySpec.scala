package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.latest_by

/** Native latest_by aggregate (functions/LatestBy.scala): last-writer-wins
  * semantics vs max_by ground truth, null handling, partial-merge
  * correctness across a real shuffle, ObjectHashAggregate plan shape, and
  * SQL registration.
  */
class LatestBySpec extends SparkSpec {
  import spark.implicits._

  test("latest_by(payload, ord) equals max_by on unique ords, across partitions") {
    val rows = (0 until 5000).map(i => (s"k${i % 97}", i.toLong, s"v$i"))
    val df = spark.createDataset(rows).toDF("k", "seq", "v").repartition(16)
    val got = df.groupBy($"k")
      .agg(latest_by(struct($"v", $"seq"), $"seq").as("r"))
      .select($"k", $"r.v", $"r.seq")
      .as[(String, String, Long)].collect().toSet
    val want = df.groupBy($"k")
      .agg(max_by(struct($"v", $"seq"), $"seq").as("r"))
      .select($"k", $"r.v", $"r.seq")
      .as[(String, String, Long)].collect().toSet
    assert(got === want)
    assert(got.size === 97)
  }

  test("two-level ordering: ord2 breaks ord1 ties deterministically") {
    val df = Seq(
      ("a", 1, 10L, "old"), ("a", 2, 5L, "tie-lo"), ("a", 2, 9L, "tie-hi"),
      ("b", 7, 1L, "only")).toDF("k", "idx", "ts", "v").repartition(8)
    val got = df.groupBy($"k")
      .agg(latest_by(struct($"v"), $"idx", $"ts").getField("v").as("v"))
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "tie-hi", "b" -> "only"))
  }

  test("null ordering rows are ignored; all-null group yields null") {
    val df = Seq(
      ("a", Some(1L), "live"), ("a", None, "ignored"),
      ("b", None, "ignored")).toDF("k", "seq", "v")
    val got = df.groupBy($"k")
      .agg(latest_by(struct($"v"), $"seq").as("r"))
      .select($"k", $"r.v".as("v")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got === Map("a" -> Some("live"), "b" -> None))
  }

  test("plans ObjectHashAggregate with a partial stage — never SortAggregate") {
    val df = Seq(("a", 1L, "x")).toDF("k", "seq", "v")
      .groupBy($"k").agg(latest_by(struct($"v"), $"seq").as("r"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$p")
    assert(!p.contains("SortAggregate"), s"SortAggregate crept back in:\n$p")
    assert(p.toLowerCase.contains("partial_latest_by"), s"no partial stage:\n$p")
  }

  test("registered in SQL: latest_by(payload, ord1, ord2) from query text") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq(("a", 1, 10L, "u"), ("a", 2, 20L, "w")).toDF("k", "idx", "ts", "v")
      .createOrReplaceTempView("lb_in")
    val got = spark.sql(
      """SELECT k, latest_by(struct(v), idx, ts).v AS v
         FROM lb_in GROUP BY k""").as[(String, String)].collect().toMap
    assert(got === Map("a" -> "w"))
  }

  test("type checks: non-integral ordering and non-struct payload are rejected") {
    val df = Seq(("a", 1.5, "v")).toDF("k", "d", "v")
    val e1 = intercept[Exception] {
      df.groupBy($"k").agg(latest_by(struct($"v"), $"d")).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("latest_by"))
    val e2 = intercept[Exception] {
      df.groupBy($"k").agg(latest_by($"v", lit(1L))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("latest_by"))
  }
}
