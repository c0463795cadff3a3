package graft

import scala.util.Random
import graft.store.IcebergLikeTable

/** Model-based fuzz of the store: random interleavings of merge /
  * compact / vacuum / rebucket checked after EVERY op against an
  * in-memory model — current state, point lookups, change feed, and
  * retained time travel all stay exact under any maintenance schedule.
  * Deterministic seeds; both inline- and deferred-compaction tables.
  */
class StoreModelSpec extends SparkSpec {
  import spark.implicits._

  private val keys = (0 until 20).map(i => f"k$i%02d")

  test("random op sequences: store == model at every step") {
    Seq(7, 19, 42).foreach(run)
  }

  private def run(seed: Int): Unit = {
    val rnd = new Random(seed)
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val t = new IcebergLikeTable(tmpDir(s"model$seed"),
      numBuckets = 2 + rnd.nextInt(6),
      maxDeltasPerBucket = 1 + rnd.nextInt(3),
      retainManifests = 2,
      inlineCompaction = rnd.nextBoolean(),
      emptySchema = org.apache.spark.sql.types.StructType.fromDDL(
        "conv_id string, n int"))

    var model = Map.empty[String, Int]
    var changedAt = Map.empty[String, Long]
    var history = Map.empty[Long, Map[String, Int]]
    var version = -1L

    def read(): Map[String, Int] =
      t.read().as[(String, Int)].collect().toMap
    def changes(since: Long): Map[String, Int] =
      t.readChangesSince(since).as[(String, Int)].collect().toMap
    def asOf(v: Long): Map[String, Int] =
      t.readAsOf(v).as[(String, Int)].collect().toMap
    def lookup(k: String): Option[Int] =
      t.lookup("conv_id", k).as[(String, Int)].collect().headOption.map(_._2)

    (0 until 10).foreach { step =>
      val op = rnd.nextInt(10)
      if (op >= 3 || version < 0) { // merge (maintenance only post-first-merge)
        val ks = rnd.shuffle(keys).take(1 + rnd.nextInt(6))
        val vals = ks.map(k => k -> rnd.nextInt(1000))
        version += 1
        assert(t.merge(vals.toDF("conv_id", "n"), "conv_id", version))
        model = model ++ vals
        vals.foreach { case (k, _) => changedAt += k -> version }
        history += version -> model
      } else if (op == 0) t.compact()
      else if (op == 1) t.vacuum()
      else t.rebucket(1 + rnd.nextInt(12))

      assert(read() == model, s"seed=$seed step=$step read")
      val since = rnd.nextInt(version.toInt + 2) - 1L
      assert(changes(since) ==
        model.filter { case (k, _) => changedAt.getOrElse(k, -2L) > since },
        s"seed=$seed step=$step changesSince($since)")
      val k = keys(rnd.nextInt(keys.size))
      assert(lookup(k) == model.get(k), s"seed=$seed step=$step lookup($k)")
      t.manifestVersions().foreach { v =>
        assert(asOf(v) == history(v), s"seed=$seed step=$step asOf($v)")
      }
    }
  }
}
