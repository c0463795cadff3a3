package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, KMeans}
import graft.queries.Tables

/** Deterministic spherical k-means for IVF training: Lloyd monotonicity
  * (inertia never worsens vs the coarse first-C init), determinism and
  * partition invariance (the quantized-update guarantee), argmax
  * assignment validity, and trained-IVF recall measured against brute
  * force.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.embeddings(spark, dir)

  private def centArrays(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[Float]] =
    df.select(col("cluster"), col("c_emb")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap

  test("Lloyd iterations never worsen inertia vs the coarse init") {
    val coarse = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cluster"),
        col("embedding").as("c_emb"))
    val i0 = KMeans.inertia(emb, coarse)
    val i3 = KMeans.inertia(emb, KMeans.fit(emb, k = 16, iters = 3))
    assert(i3 <= i0 + 1e-9, s"inertia worsened: $i0 -> $i3")
    assert(i3 < i0, "three iterations should actually improve this corpus")
  }

  test("fit is deterministic and partition-invariant") {
    val a = centArrays(KMeans.fit(emb, 8, 2))
    val b = centArrays(KMeans.fit(emb.repartition(7), 8, 2))
    val c = centArrays(KMeans.fit(emb.repartition(1), 8, 2))
    assert(a == b && b == c)
  }

  test("every vector is assigned to its argmax-cosine centroid") {
    val cents = KMeans.fit(emb, 8, 2)
    val cmap = centArrays(cents)
    val assigned = Ann.assignToCentroids(emb, cents)
      .select(col("vec_id"), col("cluster"), col("embedding"))
      .collect()
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      val d = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
      d / (math.sqrt(x.map(v => v.toDouble * v).sum) *
        math.sqrt(y.map(v => v.toDouble * v).sum))
    }
    assigned.take(50).foreach { r =>
      val e = r.getSeq[Float](2)
      val best = cmap.minBy { case (c, ce) => (-cos(e, ce), c) }._1
      assert(r.getInt(1) == best, s"vec ${r.getLong(0)}")
    }
  }

  test("a zero-norm embedding cannot poison centroids (no Inf/NaN)") {
    // v/0 is Infinity under Spark double division — unguarded, one zero
    // vector turns its cluster's centroid (and all downstream
    // assignments) into NaN. The fit must simply ignore such members.
    val withZero = emb.limit(64).select(col("vec_id"),
      when(col("vec_id") === 5L,
        expr("transform(embedding, x -> cast(0.0 as float))"))
        .otherwise(col("embedding")).as("embedding"))
    val cents = centArrays(KMeans.fit(withZero, 4, 2))
    assert(cents.values.flatten.forall(v => !v.isNaN && !v.isInfinite),
      s"poisoned centroids: $cents")
    val clean = centArrays(KMeans.fit(
      withZero.filter(col("vec_id") =!= 5L), 4, 2))
    assert(cents.keySet === clean.keySet)
  }

  test("trained IVF: full probe == brute force; partial probe recall reported") {
    val q = 42L
    val brute = Ann.bruteForceTopK(emb, q, 10)
      .select("vec_id").as[Long].collect().toSet
    val full = KMeans.trainedIvfTopK(emb, q, 10,
      numCentroids = 8, iters = 2, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(full == brute, "probing every trained list must equal brute force")
    val partial = KMeans.trainedIvfTopK(emb, q, 10,
      numCentroids = 8, iters = 2, nProbe = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(partial.size == 10, "partial probe must still fill k results")
    val recall = partial.intersect(brute).size / 10.0
    info(f"trained-IVF recall@10 (nProbe=3/8): $recall%.2f")
    assert(recall >= 0.5, "partial probe should recover at least half on this corpus")
  }
}
