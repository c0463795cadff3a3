package graft.ann

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic spherical k-means (Lloyd's) for IVF centroid training —
  * the refinement [[Ann.ivfTopK]]'s scaladoc defers to ("a production
  * index would k-means them"). Everything heavy is distributed:
  *
  *  - assignment reuses [[Ann.assignToCentroids]] (broadcast centroids,
  *    fused cosine, map-side-combined argmax — no embedding shuffle);
  *  - centroid re-estimation is a posexplode + (cluster, dim) hash
  *    aggregation — the k×dim result (tiny) is the ONLY thing collected.
  *
  * Determinism, so results are independent of partitioning and cluster
  * size: init = the k smallest vec_ids' embeddings; spherical update =
  * per-dimension mean, L2-normalized, then QUANTIZED to 1e-6 — the
  * order-dependent 1e-15 float noise of a distributed sum can therefore
  * never flip an assignment (same trick as the engine's other
  * float-exact oracles). Empty clusters keep their previous centroid.
  */
object KMeans {

  /** Train k centroids with `iters` Lloyd iterations; returns
    * (cluster, c_emb) ready for [[Ann.ivfTopKWith]].
    */
  def fit(emb: DataFrame, k: Int, iters: Int)(
      implicit spark: SparkSession): DataFrame = {
    // one materialization for init + every Lloyd pass (the loop would
    // otherwise rescan the source per iteration)
    val cached = emb.persist()
    try {
      // init: the k SMALLEST vec_ids (distributed TakeOrdered — correct
      // for any id space, not just dense-from-0), renumbered 0..k-1
      var cents: Map[Int, Array[Float]] = cached
        .select(col("vec_id"), col("embedding"))
        .orderBy(col("vec_id")).limit(k)
        .collect().zipWithIndex
        .map { case (r, i) => i -> normQuant(r.getSeq[Float](1).toArray) }
        .toMap
      require(cents.size == k, s"need at least $k vectors to train $k centroids")
      (0 until iters).foreach { _ =>
        val assigned = Ann.assignToCentroids(cached, centsDf(cents))
        // SPHERICAL update: sum of UNIT members (raw sums would let a
        // large-norm outlier drag the centroid and break the inertia
        // monotonicity the spec asserts), then normalize + quantize
        val sums = assigned
          .withColumn("__nrm", Ann.normD(col("embedding")))
          // zero-norm members contribute nothing (v/0 is Infinity in Spark
          // double division, which would poison every dimension of the
          // cluster's centroid with Inf/NaN) — mirrors quantizeInt8's
          // scale > 0 guard
          .filter(col("__nrm") > 0d)
          .select(col("cluster"), col("__nrm"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("cluster"), col("pos"))
          .agg(sum(col("v").cast("double") / col("__nrm")).as("s"))
          .collect()
        val byCluster = sums.groupBy(_.getInt(0))
        cents = cents.map { case (c, old) =>
          c -> byCluster.get(c).map { rows =>
            val dim = rows.map(_.getInt(1)).max + 1
            val unitSum = new Array[Float](dim)
            rows.foreach(r => unitSum(r.getInt(1)) = r.getDouble(2).toFloat)
            normQuant(unitSum)
          }.getOrElse(old) // empty cluster: keep the previous centroid
        }
      }
      centsDf(cents)
    } finally cached.unpersist()
  }

  /** IVF query over Lloyd-trained centroids (vs [[Ann.ivfTopK]]'s
    * deterministic first-C index).
    */
  def trainedIvfTopK(emb: DataFrame, queryId: Long, k: Int,
      numCentroids: Int = 16, iters: Int = 3, nProbe: Int = 4)(
      implicit spark: SparkSession): DataFrame =
    Ann.ivfTopKWith(emb, queryId, k, fit(emb, numCentroids, iters), nProbe)

  /** Mean inertia (1 − cosine to the assigned centroid) — the clustering
    * quality metric the Lloyd iterations must not worsen.
    */
  def inertia(emb: DataFrame, cents: DataFrame): Double = {
    import graft.functions.GraftFunctions.cosine_sim
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        cosine_sim(col("embedding"), col("c_emb")).as("ccos"))
      .groupBy(col("vec_id")).agg(max(col("ccos")).as("best"))
      .agg(avg(lit(1.0) - col("best"))).head().getDouble(0)
  }

  /** Spherical normalize + 1e-6 quantize (see class doc). */
  private def normQuant(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0.0) v
    else v.map(x => (math.rint(x / n * 1e6) / 1e6).toFloat)
  }

  private def centsDf(cents: Map[Int, Array[Float]])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    cents.toSeq.sortBy(_._1)
      .map { case (c, v) => (c, v.toSeq) }
      .toDF("cluster", "c_emb")
      .select(col("cluster"), col("c_emb").cast("array<float>").as("c_emb"))
  }
}
