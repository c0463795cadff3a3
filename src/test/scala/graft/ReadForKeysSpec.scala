package graft

import org.apache.spark.sql.functions._
import graft.store.IcebergLikeTable

/** readForKeys: bucket-pruned batch-get — resolution restricted to the
  * touched buckets is exact, untouched buckets' files are not scanned,
  * and the driver only ever materializes bucket ids.
  */
class ReadForKeysSpec extends SparkSpec {
  import spark.implicits._

  private def snap(pairs: (String, Int)*) =
    pairs.toDF("conv_id", "turn_count")

  private def mk(buckets: Int = 8): IcebergLikeTable = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    new IcebergLikeTable(tmpDir("graft-rfk"), numBuckets = buckets,
      emptySchema = org.apache.spark.sql.types.StructType.fromDDL(
        "conv_id string, turn_count int"))
  }

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
    df.select("conv_id", "turn_count").as[(String, Int)].collect().toMap

  test("pruned read resolves exactly like a full read, with deltas present") {
    val t = mk()
    t.merge(snap((0 until 64).map(i => s"k$i" -> 1): _*), "conv_id", 0L)
    t.merge(snap("k3" -> 7, "k11" -> 9), "conv_id", 1L) // unresolved deltas
    val keys = Seq("k3", "k11", "k40").toDF("conv_id")
    val got = asMap(t.readForKeys(keys)
      .join(keys, Seq("conv_id"), "left_semi"))
    val full = asMap(t.read().filter(col("conv_id").isin("k3", "k11", "k40")))
    assert(got == full)
    assert(got == Map("k3" -> 7, "k11" -> 9, "k40" -> 1))
  }

  test("untouched buckets are not scanned (inputFiles subset)") {
    val t = mk(buckets = 16)
    t.merge(snap((0 until 64).map(i => s"k$i" -> 1): _*), "conv_id", 0L)
    val one = t.readForKeys(Seq("k3").toDF("conv_id"))
    assert(one.inputFiles.nonEmpty)
    assert(one.inputFiles.length < t.read().inputFiles.length)
    // superset-by-bucket contract: every returned key is from ONE bucket
    assert(one.select(t.bucketOf("conv_id")).distinct().count() == 1)
  }

  test("empty keys / empty table read are schema-stable and empty") {
    val t = mk()
    assert(t.readForKeys(Seq.empty[String].toDF("conv_id")).count() == 0)
    t.merge(snap("a" -> 1), "conv_id", 0L)
    assert(asMap(t.readForKeys(Seq.empty[String].toDF("conv_id"))) == Map.empty)
  }
}
