package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over a candidate-pair edge list —
  * the clustering stage that turns near-dup PAIRS into duplicate CLASSES
  * (pick one representative per class to keep; drop the rest).
  *
  * This is the piece the hot-bucket guard leans on: star emission
  * ([[Dedup]] object doc) preserves connectivity but not the explicit
  * pair set, so recovering full duplicate classes requires a
  * connected-components pass. It must itself be distributed — at 100 TB
  * the candidate graph has billions of edges, and a driver-side
  * union-find is exactly the collect()-bottleneck this engine avoids.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) expressed in
  * DataFrame ops:
  *   - large-star: per node u, attach every LARGER neighbor to
  *     m(u) = min(N(u) ∪ {u});
  *   - small-star: per node u (edges oriented large→small), attach every
  *     smaller neighbor and u itself to m(u).
  * Both rounds strictly reduce the potential function of the paper and
  * converge in O(log² n) rounds to a star forest rooted at each
  * component's minimum id. Per round: one groupBy(u) (map-side partial
  * min) plus one same-key join — the aggregate output is one row per
  * node and arrives already hash-partitioned on the join key, so no
  * extra exchange on the joined side. No driver-side data ever; the
  * fixpoint check is a 2-value aggregate (count + order-insensitive
  * hash-sum), not a collect of edges.
  *
  * Lineage is truncated each round via localCheckpoint — an iterative
  * plan otherwise doubles in depth per round and Catalyst analysis blows
  * up around round ~15. (On a multi-executor cluster prefer reliable
  * `checkpoint()` with a checkpoint dir: localCheckpoint blocks die with
  * an executor; same API, drop-in.)
  */
object ConnectedComponents {

  /** (count, order-insensitive hash) fingerprint of the edge set — equal
    * fingerprints across a round ⟺ converged (collision odds ~2^-64).
    * XOR-combined: edges are distinct by construction, so XOR is a valid
    * commutative set hash (and, unlike sum, cannot overflow under ANSI).
    */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Large-star: emit (v, m(u)) for every neighbor v > u. Output edges
    * are always oriented (larger, smaller).
    *
    * Cost shape: m(u) comes from `min OVER (PARTITION BY u)` — ONE
    * exchange + sort of the symmetrized edges, no join. (The textbook
    * groupBy+self-join formulation costs 2 exchanges + an SMJ with two
    * more sorts per star; switching to windows + deferring dedup to one
    * round-end pass cut the measured round time by ~45%.) Duplicates are
    * not removed here — output ≤ |e| rows, deduped once per round.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val w = Window.partitionBy("u")
    sym.withColumn("m", least(min(col("v")).over(w), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: per node u of the (larger→smaller)-oriented graph,
    * attach u and all its smaller neighbors to m(u) = min neighbor.
    * One window pass; both outputs — (v,m) per edge and (u,m) per row —
    * emitted from a single explode so the windowed frame is computed
    * once. Output ≤ 2|e| rows incl. duplicates (see [[largeStar]]).
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("u")
    e.withColumn("m", min(col("v")).over(w))
      .select(explode(when(col("v") =!= col("m"),
        array(struct(col("v").as("u"), col("m").as("v")),
          struct(col("u").as("u"), col("m").as("v"))))
        .otherwise(array(struct(col("u").as("u"), col("m").as("v")))))
        .as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
  }

  /** Hash-aggregate large-star: same output as [[largeStar]], no sort.
    * m(u) via groupBy(u).min — but over an EXPLICIT repartition(u), so
    * the aggregate's exchange and the join's are the SAME physical node
    * (ReusedExchange: the symmetrized edges cross the wire once) and the
    * min-join is a ShuffledHashJoin on co-partitioned inputs (build side
    * = one row per node). Rationale: the window form's per-round cost is
    * a full sort of 2|e| rows per star — a bandwidth-bound chained-sort
    * pipeline (BENCH.md round-3 cc analysis); this trades the sorts for
    * one hash-agg + one hash-build of |nodes| rows. (The round-3
    * "groupBy+self-join 45% slower" finding was the TEXTBOOK form — two
    * independent exchanges + sort-merge join with two more sorts; the
    * exchange-reuse + SHJ form measures differently, see BENCH.md r5.)
    */
  private[graft] def largeStarHash(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u"))
    val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
    sym.join(mins.hint("shuffle_hash"), "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
  }

  /** Hash-aggregate small-star: same output as [[smallStar]] (single
    * explode emitting both (v,m) and (u,m)), same exchange-reuse + SHJ
    * shape as [[largeStarHash]].
    */
  private def smallStarHash(e: DataFrame): DataFrame = {
    val part = e.repartition(col("u"))
    val mins = part.groupBy("u").agg(min(col("v")).as("m"))
    part.join(mins.hint("shuffle_hash"), "u")
      .select(explode(when(col("v") =!= col("m"),
        array(struct(col("v").as("u"), col("m").as("v")),
          struct(col("u").as("u"), col("m").as("v"))))
        .otherwise(array(struct(col("u").as("u"), col("m").as("v")))))
        .as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
  }

  /** Component assignment for every node of the pair list: one row
    * (node, component) per distinct node, component = min node id of its
    * connected component. `useHashAgg` selects the sort-free star
    * formulation ([[largeStarHash]]) — semantics identical, cost shape
    * differs (see BENCH.md cc rows for the measured comparison).
    */
  def components(pairs: DataFrame, src: String, dst: String,
      maxIter: Int = 50, verbose: Boolean = false,
      useHashAgg: Boolean = false): DataFrame = {
    var e = pairs
      .select(greatest(col(src), col(dst)).cast("long").as("u"),
        least(col(src), col(dst)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var sig = fingerprint(e)
    var it = 0
    var converged = e.isEmpty
    while (!converged && it < maxIter) {
      val t0 = System.nanoTime()
      val next = (if (useHashAgg) smallStarHash(largeStarHash(e))
        else smallStar(largeStar(e)))
        .dropDuplicates("u", "v").localCheckpoint(true)
      val nsig = fingerprint(next)
      if (verbose) System.err.println(f"[cc] round $it edges=${nsig._1} " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      converged = nsig == sig
      sig = nsig
      e = next
      it += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // Star forest: edges are (member → root); roots appear only on the
    // v side. Singleton inputs were dropped by the self-loop filter and
    // are restored by callers via [[clusters]].
    e.select(col("u").as("node"), col("v").as("component"))
      .union(e.select(col("v").as("node"), col("v").as("component")).distinct())
  }

  /** (id, cluster_id) for EVERY row of `ids` — nodes with no candidate
    * pair cluster as themselves. `cluster_id` = min doc id of the
    * duplicate class, the canonical keep-one-representative choice.
    */
  def clusters(ids: DataFrame, idCol: String, pairs: DataFrame,
      src: String, dst: String): DataFrame = {
    val asg = components(pairs, src, dst)
    ids.select(col(idCol).cast("long").as(idCol))
      .join(asg.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
  }
}
