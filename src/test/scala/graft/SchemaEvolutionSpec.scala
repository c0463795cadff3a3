package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.store.IcebergLikeTable

/** Additive schema evolution in the merge-on-read store (Iceberg
  * add-column semantics, schema tracked in the manifest): later batches
  * introduce columns, readers see the union with nulls for pre-evolution
  * rows, time travel restores the schema each version HAD, type changes
  * are rejected, and compaction carries the evolved schema through.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private val baseSchema = StructType(Seq(
    StructField("conv_id", StringType), StructField("v", LongType)))

  test("added column: union schema, nulls for old rows, schema time travel") {
    val t = new IcebergLikeTable(tmpDir("evo") + "/t", numBuckets = 4,
      emptySchema = baseSchema)
    assert(t.merge(Seq(("a", 1L), ("b", 1L)).toDF("conv_id", "v"),
      "conv_id", 0L))
    assert(t.merge(Seq(("b", 2L, 0.9), ("c", 2L, 0.5))
      .toDF("conv_id", "v", "quality"), "conv_id", 1L))

    assert(t.schema().fieldNames.toSeq === Seq("conv_id", "v", "quality"))
    val got = t.read().select($"conv_id", $"v", $"quality")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // per-row last-writer-wins: a's latest row predates the column
    assert(got === Map("a" -> ((1L, None)), "b" -> ((2L, Some(0.9))),
      "c" -> ((2L, Some(0.5)))))

    // the v0 version reads back with the schema it was committed under
    assert(t.readAsOf(0L).columns.toSeq === Seq("conv_id", "v"))
    assert(t.readAsOf(1L).columns.toSeq === Seq("conv_id", "v", "quality"))
    // point lookup sees the evolved schema too
    assert(t.lookup("conv_id", "a").columns.contains("quality"))
  }

  test("rebucket: content identical, lookups and later merges use the new count") {
    val dir = tmpDir("rebucket") + "/t"
    val t = new IcebergLikeTable(dir, numBuckets = 2, emptySchema = baseSchema)
    val keys = (0 until 40).map(i => s"conv-$i")
    assert(t.merge(keys.map(k => (k, 1L)).toDF("conv_id", "v"), "conv_id", 0L))
    val before = t.read().as[(String, Long)].collect().sorted.toSeq

    t.rebucket(16)
    assert(t.currentBuckets() === 16)
    assert(t.read().as[(String, Long)].collect().sorted.toSeq === before)
    // a READER process still constructed with the old numBuckets prunes
    // via the committed count, not its constructor arg
    val stale = new IcebergLikeTable(dir, numBuckets = 2, emptySchema = baseSchema)
    keys.take(8).foreach { k =>
      assert(stale.lookup("conv_id", k).as[(String, Long)].collect().toSeq
        === Seq((k, 1L)), s"stale-handle lookup broken for $k")
    }
    // merges after the rebucket land in 16-bucket layout and stay readable
    assert(stale.merge(keys.map(k => (k, 2L)).toDF("conv_id", "v"), "conv_id", 1L))
    assert(t.read().as[(String, Long)].collect().forall(_._2 == 2L))
    keys.take(4).foreach { k =>
      assert(t.lookup("conv_id", k).as[(String, Long)].collect().toSeq
        === Seq((k, 2L)))
    }
  }

  test("column drop: metadata-only, time travel restores, re-add rejected") {
    val t = new IcebergLikeTable(tmpDir("evodrop") + "/t", numBuckets = 4,
      emptySchema = baseSchema)
    assert(t.merge(Seq(("a", 1L, 0.9), ("b", 1L, 0.5))
      .toDF("conv_id", "v", "quality"), "conv_id", 0L))
    val preDrop = t.readManifest().lastBatchId

    t.dropColumn("quality")
    assert(t.schema().fieldNames.toSeq === Seq("conv_id", "v"))
    assert(!t.read().columns.contains("quality"))
    assert(!t.lookup("conv_id", "a").columns.contains("quality"))

    // time travel to the pre-drop version restores column AND values
    val old = t.readAsOf(preDrop)
    assert(old.columns.contains("quality"))
    assert(old.where($"conv_id" === "a").select($"quality")
      .as[Double].head() === 0.9)

    // later merges work without the column; re-adding the name is loud
    assert(t.merge(Seq(("c", 3L)).toDF("conv_id", "v"), "conv_id", 1L))
    assert(t.read().count() === 3)
    val ex = intercept[IllegalArgumentException] {
      t.merge(Seq(("d", 4L, 0.1)).toDF("conv_id", "v", "quality"),
        "conv_id", 2L)
    }
    assert(ex.getMessage.contains("was dropped"))
    // key column is not droppable
    assert(intercept[IllegalArgumentException](t.dropColumn("conv_id"))
      .getMessage.contains("key column"))
  }

  test("repeated rebucket cycles never overwrite live data (same version, same count)") {
    val t = new IcebergLikeTable(tmpDir("rebucketcycle") + "/t", numBuckets = 4,
      emptySchema = baseSchema)
    val content = (0 until 30).map(i => (s"k$i", i.toLong))
    assert(t.merge(content.toDF("conv_id", "v"), "conv_id", 0L))
    def check(): Unit =
      assert(t.read().as[(String, Long)].collect().toMap == content.toMap)
    t.rebucket(16); check()
    t.rebucket(16); check() // clean-base same-count: no-op, must not self-overwrite
    t.rebucket(8); check()
    // same lastBatchId, same count as the FIRST rebucket: the naive dir
    // name collides with a retained version's files — must pick a fresh one
    t.rebucket(16); check()
    assert(t.currentBuckets() == 16)
    // lookups still prune correctly with the final committed count
    assert(t.lookup("conv_id", "k7").as[(String, Long)].collect().toSeq ==
      Seq(("k7", 7L)))
  }

  test("drop survives later same-version maintenance: history keeps the pre-drop schema") {
    val t = new IcebergLikeTable(tmpDir("evodrop2") + "/t", numBuckets = 2,
      maxDeltasPerBucket = 1, emptySchema = baseSchema)
    assert(t.merge(Seq(("a", 1L, 0.9), ("b", 1L, 0.5))
      .toDF("conv_id", "v", "quality"), "conv_id", 0L))
    val preDrop = t.readManifest().lastBatchId
    t.dropColumn("quality")
    // maintenance at the SAME lastBatchId rewrites the version's file
    // layout — the retained history entry must keep the pre-drop schema
    t.rebucket(4)
    t.vacuum()
    val old = t.readAsOf(preDrop)
    assert(old.columns.contains("quality"),
      "pre-drop history lost its schema after same-version maintenance")
    assert(!t.read().columns.contains("quality"))
  }

  test("type change is rejected loudly") {
    val t = new IcebergLikeTable(tmpDir("evo-rej") + "/t", numBuckets = 2,
      emptySchema = baseSchema)
    assert(t.merge(Seq(("a", 1L)).toDF("conv_id", "v"), "conv_id", 0L))
    val ex = intercept[IllegalArgumentException] {
      t.merge(Seq(("a", "not-a-long")).toDF("conv_id", "v"), "conv_id", 1L)
    }
    assert(ex.getMessage.contains("type change"))
  }

  test("compaction across an evolution boundary preserves evolved values") {
    val t = new IcebergLikeTable(tmpDir("evo-compact") + "/t", numBuckets = 2,
      maxDeltasPerBucket = 2, emptySchema = baseSchema)
    assert(t.merge(Seq(("a", 0L), ("b", 0L)).toDF("conv_id", "v"), "conv_id", 0L))
    (1 to 5).foreach { b =>
      assert(t.merge(Seq(("a", b.toLong, s"tag$b"), ("b", b.toLong, s"tag$b"))
        .toDF("conv_id", "v", "tag"), "conv_id", b.toLong))
    }
    val (_, deltas) = t.fileStats()
    assert(deltas <= 2 * (t.maxDeltasPerBucket - 1), "compaction never ran")
    val got = t.read().select($"conv_id", $"v", $"tag")
      .as[(String, Long, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("a" -> ((5L, Some("tag5"))), "b" -> ((5L, Some("tag5")))))
  }
}
