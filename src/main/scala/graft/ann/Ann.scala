package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline. All
  *   arithmetic in double (float inputs cast element-wise) with left-to-right
  *   accumulation so the DuckDB oracle reproduces bits exactly.
  * - [[lshTopK]]: random-hyperplane LSH — the scale path. Bucket signature =
  *   sign bits against `nPlanes` seeded deterministic hyperplanes; candidates
  *   are rescored exactly within matching buckets. At 100 TB the bucket join
  *   replaces the O(N) scan per query with an O(N/2^planes) bucket.
  */
object Ann {

  /** dot(a, b) in double, sequential accumulation (oracle-reproducible). */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Distributed top-k: `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject — each partition keeps its local k, only k rows
    * per partition ever merge — then the rank is derived by a window over
    * the tiny k-row result. (The naive `row_number().over(Window.orderBy)`
    * on the scored set shuffles EVERY row to one task; at 10^8 vectors the
    * scoring parallelizes and then serializes on one core.)
    */
  private def rankedTopK(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(col("cos").desc, col("vec_id").asc).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id").asc)).cast("long"))
      .select(col("vec_id"), col("rk"), col("cos"))

  /** Exact top-k by cosine against the embedding of `queryId`.
    * The single query row is broadcast — no shuffle of the big side.
    */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val scored = emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dotD(col("embedding"), col("q_emb")) /
          (normD(col("embedding")) * normD(col("q_emb")))).as("cos"))
    rankedTopK(scored, k)
  }

  /** Exact top-k via the native CosineSim expression (fused codegen loop —
    * the fast path; bit-identical scores to [[bruteForceTopK]]).
    */
  def bruteForceTopKExpr(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val scored = emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.functions.GraftFunctions.cosine_sim(col("embedding"), col("q_emb")).as("cos"))
    rankedTopK(scored, k)
  }

  /** Deterministic hyperplanes: plane p, dim i → a fixed LCG-derived value
    * in [-1, 1). Pure function — identical on every executor, no broadcast
    * of state needed.
    */
  def planeVal(p: Int, i: Int): Double = {
    var x = p.toLong * 1000003L + i.toLong * 7919L + 12345L
    x = x * 6364136223846793005L + 1442695040888963407L
    x = x * 6364136223846793005L + 1442695040888963407L
    (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** LSH signature column: nPlanes sign bits packed into a long. */
  def signature(emb: Column, dim: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val dot = (0 until dim).map { i =>
        element_at(emb, i + 1).cast("double") * lit(planeVal(p, i))
      }.reduce(_ + _)
      when(dot >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed ANN: same output shape as brute force, approximate recall.
    * Candidates = vectors sharing the query's bucket; exact rescoring inside.
    */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, dim: Int, nPlanes: Int): DataFrame = {
    val sig = emb.select(col("vec_id"), col("embedding"),
      signature(col("embedding"), dim, nPlanes).as("bucket"))
    val q = sig.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
    val scored = sig.filter(col("vec_id") =!= queryId)
      .join(broadcast(q), col("bucket") === col("q_bucket"))
      .select(col("vec_id"),
        (dotD(col("embedding"), col("q_emb")) /
          (normD(col("embedding")) * normD(col("q_emb")))).as("cos"))
    rankedTopK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs within an id range: exact
    * pairwise scoring (bounded candidate set; the LSH bucket join is the
    * 100-TB candidate generator).
    */
  def nearDupPairs(emb: DataFrame, maxId: Long, minCos: Double): DataFrame = {
    val e = emb.filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"),
        normD(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dotD(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"))
  }
}
