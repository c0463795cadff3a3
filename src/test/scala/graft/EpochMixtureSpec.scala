package graft

import org.apache.spark.sql.functions._

import graft.queries.CurationQueries

/** Round-5 curation-operator invariants beyond the DuckDB hash oracle:
  * exact per-shard position sequences, retry determinism, the temperature
  * law (rarest source survives whole, commoner sources thinner), and the
  * schema-evolution read contract.
  */
class EpochMixtureSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("epoch_shuffle is a permutation: pos is exactly 1..n per shard, total = corpus") {
    val out = CurationQueries.epochShuffle(spark, dir).cache()
    try {
      val total = graft.queries.Tables.documents(spark, dir).count()
      assert(out.count() === total)
      assert(out.select("doc_id").distinct().count() === total)
      // per shard: count == max(pos) and distinct pos == count → 1..n dense
      val bad = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
          countDistinct(col("pos")).as("nd"))
        .where(col("n") =!= col("mx") || col("n") =!= col("nd"))
      assert(bad.count() === 0, "a shard's pos sequence is not dense 1..n")
      // deterministic: a re-run (fresh plan) is row-identical
      val rerun = CurationQueries.epochShuffle(spark, dir)
      assert(out.except(rerun).isEmpty && rerun.except(out).isEmpty)
    } finally { out.unpersist(); () }
  }

  test("mixture_sample: rarest source kept whole, others thinned toward n^tau") {
    val docs = graft.queries.Tables.documents(spark, dir)
    val before = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = CurationQueries.mixtureSample(spark, dir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = before.values.min
    val rare = before.minBy(_._2)._1
    assert(after(rare) === before(rare), "rarest source must survive whole")
    before.foreach { case (src, n) =>
      val expected = n * math.sqrt(nMin.toDouble / n) // n^tau law, tau=0.5
      val kept = after.getOrElse(src, 0L).toDouble
      assert(kept <= n, s"$src grew")
      // md5 buckets are uniform enough for ±20% at these counts
      assert(math.abs(kept - expected) <= math.max(0.2 * expected, 8.0),
        s"$src kept $kept, expected ~$expected of $n")
    }
  }

  test("mixture_sample never drops a source entirely (quantization floor)") {
    // extreme skew: a 1-doc source against a large one would quantize the
    // big source's keep-bucket count to 0 without the floor
    import spark.implicits._
    val skewed = (1 to 100000).map(i => (i.toLong, "big")) :+ (0L, "rare")
    val df = skewed.toDF("doc_id", "source")
    val kept = graft.queries.CurationQueries.mixtureSampleOver(df)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("rare") === 1L)
    assert(kept.getOrElse("big", 0L) >= 1L,
      "dominant source must keep at least the quantization floor")
  }

  test("store_schema_evolve: evolved column null-filled for v1 files, dropped column gone") {
    val out = graft.queries.StreamQueries.storeSchemaEvolve(spark, dir).cache()
    try {
      assert(!out.columns.contains("tmp_flag"), "dropped column must not resurface")
      assert(out.where(col("evt_key").cast("long") % 2 === 0 &&
        col("score").isNotNull).count() === 0, "v1 rows must read score as null")
      assert(out.where(col("evt_key").cast("long") % 2 === 1 &&
        col("score").isNull).count() === 0, "v2 rows must carry score")
    } finally { out.unpersist(); () }
  }
}
