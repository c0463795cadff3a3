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
    * of state needed; printable as exact literals into the DuckDB oracle.
    */
  def planeVal(p: Int, i: Int): Double = {
    var x = p.toLong * 1000003L + i.toLong * 7919L + 12345L
    x = x * 6364136223846793005L + 1442695040888963407L
    x = x * 6364136223846793005L + 1442695040888963407L
    (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** Multi-band LSH-bucketed ANN: candidates = vectors sharing ANY band
    * signature with the query (OR-amplification — a single fixed bucket's
    * recall decays as (1-θ/π)^planes; banding restores it like MinHash
    * banding does), then exact cosine rescoring and distributed top-k.
    *
    * Scale shape: signatures are one narrow codegen'd pass
    * ([[graft.functions.BandSig]] — no dim×planes expression blowup at
    * dim=768); the (band, bucket) join against the broadcast query prunes
    * candidates to O(N / 2^planesPerBand) per band; the big side never
    * shuffles (broadcast join + TakeOrderedAndProject).
    */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int,
      bands: Int = 4, planesPerBand: Int = 4): DataFrame = {
    import graft.functions.BandSig
    val sig = emb.select(col("vec_id"), col("embedding"),
      posexplode(BandSig(col("embedding"), bands, planesPerBand))
        .as(Seq("band", "bucket")))
    val q = sig.filter(col("vec_id") === queryId)
      .select(col("band").as("q_band"), col("bucket").as("q_bucket"))
    val cands = sig.filter(col("vec_id") =!= queryId)
      .join(broadcast(q),
        col("band") === col("q_band") && col("bucket") === col("q_bucket"))
      .select(col("vec_id"), col("embedding"))
      .dropDuplicates("vec_id")
    val qe = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val scored = cands.crossJoin(broadcast(qe))
      .select(col("vec_id"),
        graft.functions.GraftFunctions.cosine_sim(col("embedding"), col("q_emb")).as("cos"))
    rankedTopK(scored, k)
  }

  /** DuckDB oracle for [[lshTopK]], generated with the exact hyperplane
    * literals (dim must be known statically; the driver tables carry
    * dim=64 at every sf). `list_dot_product` accumulates left-to-right in
    * double — bit-identical to BandSig's loop — so bucket membership and
    * rescored cosines reproduce exactly.
    */
  def lshTopKSql(queryId: Long, k: Int, dim: Int,
      bands: Int, planesPerBand: Int): String = {
    def planeList(p: Int): String =
      (0 until dim).map(i => planeVal(p, i).toString).mkString("[", ",", "]")
    def bandExpr(b: Int): String =
      (0 until planesPerBand).map { p =>
        s"(CASE WHEN list_dot_product(emb, ${planeList(b * planesPerBand + p)}) >= 0 " +
          s"THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
    val bandCols = (0 until bands).map(b => s"${bandExpr(b)} AS b$b").mkString(", ")
    val anyBand = (0 until bands).map(b => s"sg.b$b = qs.b$b").mkString(" OR ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       q AS (SELECT emb AS qe FROM e WHERE vec_id = $queryId),
       sg AS (SELECT vec_id, emb, $bandCols FROM e),
       qs AS (SELECT * FROM sg WHERE vec_id = $queryId),
       cand AS (SELECT sg.vec_id, sg.emb FROM sg, qs
                WHERE sg.vec_id <> $queryId AND ($anyBand)),
       scored AS (SELECT vec_id,
                    list_dot_product(emb, qe) /
                      (sqrt(list_dot_product(emb, emb)) *
                       sqrt(list_dot_product(qe, qe))) AS cos
                  FROM cand, q)
       SELECT vec_id, rk, cos FROM (
         SELECT vec_id, cos,
           row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rk
         FROM scored)
       WHERE rk <= $k"""
  }

  /** IVF (inverted-file) ANN — the second scale path next to LSH: assign
    * every vector to its nearest of C coarse centroids (the inverted
    * lists), probe only the nProbe centroids nearest the query, rescore
    * exactly inside the probed lists.
    *
    * Centroids here are the first C corpus vectors — deterministic, so
    * the DuckDB oracle reproduces the index bit-for-bit. A production
    * index would k-means them; the IVF *structure* (assignment, inverted
    * lists, probe set, rescoring) is identical and is what this operator
    * exercises.
    *
    * Scale shape: assignment is one narrow stage (N×C fused cosine_sim
    * rows, map-side-combined argmax — no shuffle of embeddings beyond the
    * per-vector reduction); at rest the lists would be written bucketed by
    * cluster so a query scans nProbe/C of the data. The query side is all
    * broadcast joins; top-k is TakeOrderedAndProject.
    */
  /** Inverted-list assignment: argmax cosine over the (small, broadcast)
    * centroid set, ties → the smallest cluster id (max_by on
    * (cos, -cluster)). One narrow stage + per-vector reduction; shared by
    * [[ivfTopK]] and [[KMeans]]'s Lloyd iterations.
    */
  def assignToCentroids(emb: DataFrame, cents: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.cosine_sim
    import graft.functions.SortableDoubleBits.sortable_bits
    emb
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cluster"),
        cosine_sim(col("embedding"), col("c_emb")).as("ccos"))
      .groupBy(col("vec_id"))
      // argmax over a DOUBLE score via the order-preserving bits encoding:
      // latest_by keeps the reduction in ObjectHashAggregate (compiled
      // update path) where max_by(struct, struct(double, int)) planned
      // SortAggregate over ALL N×C scored rows — the largest intermediate
      // in the ANN pipeline. Tie semantics identical: greater cos wins,
      // equal cos → smaller cluster id (−cluster as ord2), NaN above +∞
      // exactly like Spark's double ordering.
      .agg(graft.functions.GraftFunctions.latest_by(
        struct(col("cluster"), col("embedding")),
        sortable_bits(col("ccos")), -col("cluster").cast("long")).as("best"))
      .select(col("vec_id"), col("best.cluster").as("cluster"),
        col("best.embedding").as("embedding"))
  }

  def ivfTopK(emb: DataFrame, queryId: Long, k: Int,
      numCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = emb.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cluster"), col("embedding").as("c_emb"))
    ivfTopKWith(emb, queryId, k, cents, nProbe)
  }

  /** IVF query against an arbitrary centroid set — [[ivfTopK]] passes the
    * deterministic first-C centroids (oracle-reproducible);
    * [[KMeans.trainedIvfTopK]] passes Lloyd-refined ones.
    */
  def ivfTopKWith(emb: DataFrame, queryId: Long, k: Int,
      cents: DataFrame, nProbe: Int): DataFrame = {
    import graft.functions.GraftFunctions.cosine_sim
    val assigned = assignToCentroids(emb, cents)
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    // probe set: the nProbe centroids nearest the query
    val probed = cents.crossJoin(broadcast(q))
      .select(col("cluster"), cosine_sim(col("c_emb"), col("q_emb")).as("qcos"))
      .orderBy(col("qcos").desc, col("cluster").asc)
      .limit(nProbe)
      .select(col("cluster"))
    val scored = assigned
      .join(broadcast(probed), "cluster")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosine_sim(col("embedding"), col("q_emb")).as("cos"))
    rankedTopK(scored, k)
  }

  /** DuckDB oracle for [[ivfTopK]] — same deterministic index. */
  def ivfTopKSql(queryId: Long, k: Int, numCentroids: Int, nProbe: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       c AS (SELECT vec_id AS cluster, emb AS cemb FROM e WHERE vec_id < $numCentroids),
       q AS (SELECT emb AS qe FROM e WHERE vec_id = $queryId),
       asg AS (SELECT vec_id, cluster, emb FROM (
                 SELECT e.vec_id, c.cluster, e.emb,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_dot_product(e.emb, c.cemb) /
                       (sqrt(list_dot_product(e.emb, e.emb)) *
                        sqrt(list_dot_product(c.cemb, c.cemb))) DESC,
                     c.cluster ASC) AS rn
                 FROM e, c) WHERE rn = 1),
       probed AS (SELECT cluster FROM (
                    SELECT c.cluster,
                      row_number() OVER (ORDER BY
                        list_dot_product(c.cemb, q.qe) /
                          (sqrt(list_dot_product(c.cemb, c.cemb)) *
                           sqrt(list_dot_product(q.qe, q.qe))) DESC,
                        c.cluster ASC) AS rn
                    FROM c, q) WHERE rn <= $nProbe),
       scored AS (SELECT a.vec_id,
                    list_dot_product(a.emb, q.qe) /
                      (sqrt(list_dot_product(a.emb, a.emb)) *
                       sqrt(list_dot_product(q.qe, q.qe))) AS cos
                  FROM asg a JOIN probed p ON a.cluster = p.cluster, q
                  WHERE a.vec_id <> $queryId)
       SELECT vec_id, rk, cos FROM (
         SELECT vec_id, cos,
           row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rk
         FROM scored)
       WHERE rk <= $k"""

  /** Int8 embedding quantization (vector compression for storage/serving):
    * per-vector absmax scale, q = floor(x/scale·127) — 4× smaller at rest.
    * Entirely narrow (array_max/transform/posexplode per row, NO shuffle);
    * all math in doubles so the DuckDB oracle reproduces it bit-exactly
    * (same determinism recipe as the cosine oracles). Zero vectors are
    * excluded on both sides (scale 0 has no quantization).
    */
  def quantizeInt8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("scale", array_max(transform(col("emb"), x => abs(x))))
      .filter(col("scale") > 0d)
      .select(col("vec_id"), col("scale"),
        posexplode(col("emb")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("scale"), col("pos").cast("long").as("pos"),
        floor(col("v") / col("scale") * 127d).as("q"))

  val quantizeInt8Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings),
       s AS (SELECT vec_id, emb,
                    list_max(list_transform(emb, x -> abs(x))) AS scale
             FROM e)
       SELECT vec_id, scale,
              CAST(generate_subscripts(emb, 1) - 1 AS BIGINT) AS pos,
              CAST(floor(unnest(emb) / scale * 127) AS BIGINT) AS q
       FROM s WHERE scale > 0"""

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

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): cluster the
    * embedding space coarsely, then mark within-cluster cosine near-dups,
    * keeping each near-dup pair's lower vec_id. Output: one row per
    * vector with its cluster and `is_dup` (true = a smaller-id vector in
    * the same cluster sits within `minCos`).
    *
    * Scale shape — the whole point of the cluster stage: pair candidates
    * are generated per cluster (one equi-join keyed on cluster id), so
    * the quadratic term is Σ|cluster|² ≈ N²/C, not N²; the centroid set
    * is tiny and broadcast (assignment is one narrow pass, argmax via
    * latest_by — see [[assignToCentroids]]); nothing else shuffles more
    * than one row per vector. A production run k-means-trains the
    * centroids ([[KMeans.fit]]) and caps cluster sizes; the deterministic
    * first-C centroids keep the oracle literal-free and the structure
    * identical.
    */
  def semanticDedup(emb: DataFrame, numCentroids: Int = 16,
      minCos: Double = 0.4): DataFrame = {
    import graft.functions.GraftFunctions.cosine_sim
    val cents = emb.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cluster"), col("embedding").as("c_emb"))
    val asg = assignToCentroids(emb, cents)
    val a = asg.select(col("cluster"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val b = asg.select(col("cluster"), col("vec_id").as("vb"),
      col("embedding").as("eb"))
    val dropped = a.join(b, Seq("cluster")).filter(col("va") < col("vb"))
      .filter(cosine_sim(col("ea"), col("eb")) >= minCos)
      .select(col("vb").as("vec_id")).distinct()
    asg.select(col("vec_id"), col("cluster"))
      .join(dropped.withColumn("__d", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("__d"), lit(false)).as("is_dup"))
  }

  /** DuckDB oracle for [[semanticDedup]] — same deterministic index,
    * double math end to end (the [[ivfTopKSql]] assignment CTE).
    */
  def semanticDedupSql(numCentroids: Int, minCos: Double): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       c AS (SELECT vec_id AS cluster, emb AS cemb FROM e WHERE vec_id < $numCentroids),
       asg AS (SELECT vec_id, cluster, emb FROM (
                 SELECT e.vec_id, c.cluster, e.emb,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_dot_product(e.emb, c.cemb) /
                       (sqrt(list_dot_product(e.emb, e.emb)) *
                        sqrt(list_dot_product(c.cemb, c.cemb))) DESC,
                     c.cluster ASC) AS rn
                 FROM e, c) WHERE rn = 1),
       dropped AS (
         SELECT DISTINCT b.vec_id
         FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         WHERE list_dot_product(a.emb, b.emb) /
                 (sqrt(list_dot_product(a.emb, a.emb)) *
                  sqrt(list_dot_product(b.emb, b.emb))) >= $minCos)
       SELECT g.vec_id, g.cluster, d.vec_id IS NOT NULL AS is_dup
       FROM asg g LEFT JOIN dropped d ON g.vec_id = d.vec_id"""
}
