package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin

/** Count-Min sketch: the deterministic lower bound (estimate ≥ exact,
  * always), the ε·N upper bound on this corpus, and merge correctness —
  * the sketch matrix must be bit-identical no matter how the input is
  * partitioned (elementwise-sum merge is what makes it partial-agg and
  * streaming-state safe).
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val keys = (1 to 5000).map(i => s"key${i % 37}")

  test("estimate >= exact always, and <= exact + eps*N here") {
    val df = keys.toDF("k")
    val sk = df.agg(CountMin.sketch($"k").as("sk"), count(lit(1)).as("n"))
    val got = df.groupBy($"k").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .withColumn("est", CountMin.estimate($"sk", $"k"))
      .select($"k", $"exact", $"est", $"n")
      .as[(String, Long, Long, Long)].collect()
    assert(got.length === 37)
    got.foreach { case (k, exact, est, n) =>
      assert(est >= exact, s"$k: CMS under-counted ($est < $exact)")
      assert(est <= exact + math.ceil(CountMin.Eps * n).toLong,
        s"$k: est $est exceeds exact $exact + eps*N")
    }
  }

  test("STREAMING sketch equals the batch matrix (update-mode agg state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val q = mem.toDF().toDF("k")
      .agg(CountMin.sketch(col("k")).as("sk"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    // three micro-batches — the streaming agg must carry sketch state
    keys.grouped(2000).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("cms_stream").as[Seq[Long]].head()
    val batch = keys.toDF("k").agg(CountMin.sketch($"k")).as[Seq[Long]].head()
    assert(streamed === batch)
  }

  test("sketch matrix is invariant to input partitioning") {
    val one = keys.toDF("k").repartition(1)
      .agg(CountMin.sketch($"k")).as[Seq[Long]].head()
    val many = keys.toDF("k").repartition(8)
      .agg(CountMin.sketch($"k")).as[Seq[Long]].head()
    assert(one === many)
    assert(one.sum === 5000L * CountMin.Depth)
  }
}
