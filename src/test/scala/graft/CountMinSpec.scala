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

  test("cms_stream_hh: file-stream-built sketch yields the batch heavy-hitter rows") {
    val dir = "/root/testdata/sf0.001"
    val stream = graft.queries.StreamQueries.cmsStreamHh(spark, dir)
    val batch = graft.queries.RelationalQueries.heavyHitters(spark, dir)
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty,
      "streaming-sketch heavy hitters must equal the batch two-pass rows")
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

  test("native cms_estimate: codegen == interpreted, and never under-counts") {
    // sketch built OUTSIDE the factory-mode override (the aggregate's
    // codegen is not under test), then probed under both modes — the
    // CODEGEN_ONLY leg makes a silent interpreted fallback (the bug class
    // FunctionRegistrationSpec pins for CosineSim/BandSig) a failure, and
    // two instances in one projection exercise locals hygiene.
    val skArr = keys.toDF("k").agg(CountMin.sketch($"k")).as[Seq[Long]].head()
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    def run(): Map[String, (Long, Long)] =
      keys.distinct.toDF("k")
        .crossJoin(broadcast(Seq(Tuple1(skArr)).toDF("sk")))
        .select($"k",
          CountMin.estimate($"sk", $"k").as("est"),
          CountMin.estimate($"sk", concat($"k", lit("@missing"))).as("est2"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val (gen, interp) = try {
      spark.conf.set(key, "CODEGEN_ONLY")
      val g = run()
      spark.conf.set(key, "NO_CODEGEN")
      (g, run())
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    assert(gen === interp)
    assert(gen.size === 37)
    exact.foreach { case (k, n) =>
      assert(gen(k)._1 >= n, s"$k: cms_estimate under-counted")
    }
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
