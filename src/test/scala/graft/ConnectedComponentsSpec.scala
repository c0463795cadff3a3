package graft

import org.apache.spark.sql.functions._
import graft.dedup.{ConnectedComponents, Dedup}

/** Connected components (large-star/small-star) — verified against a
  * driver-side union-find on deterministic random graphs, on adversarial
  * shapes (long path: the worst case plain label propagation needs O(n)
  * rounds for), and end-to-end through the hot-bucket guard: star pairs
  * from a degenerate corpus must still recover the full duplicate class.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def run(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ids = (0L until n.toLong).toDF("id")
    val pairs = edges.toDF("src", "dst")
    ConnectedComponents.clusters(ids, "id", pairs, "src", "dst")
      .as[(Long, Long)].collect().toMap
  }

  test("small known graph: chains, a clique, singletons") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 5L), (7L, 7L))
    assert(run(9, edges) === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("long path converges (multi-round) to a single component") {
    val n = 120
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
    val got = run(n, edges)
    assert(got.values.toSet === Set(0L))
  }

  test("matches driver union-find on a deterministic random graph") {
    val rnd = new scala.util.Random(42)
    val n = 500
    val edges = Seq.fill(400)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    assert(run(n, edges) === unionFind(n, edges))
  }

  test("empty pair list: every node is its own cluster") {
    assert(run(5, Seq.empty) === (0L until 5L).map(i => i -> i).toMap)
  }

  test("hash-agg star formulation ≡ window formulation ≡ union-find") {
    val rnd = new scala.util.Random(7)
    val n = 800
    // mixed shape: random edges + a long path segment (multi-round) so
    // both formulations exercise several alternating-star rounds
    val edges = Seq.fill(500)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)) ++
      (600 until 780).map(i => (i.toLong, i.toLong + 1))
    val pairs = edges.toDF("src", "dst")
    val want = unionFind(n, edges).toSeq
      .filter { case (k, v) => k != v || edges.exists(e => e._1 == k || e._2 == k) }
    def asg(useHash: Boolean) =
      ConnectedComponents.components(pairs, "src", "dst", useHashAgg = useHash)
        .as[(Long, Long)].collect().toMap
    val win = asg(useHash = false)
    val hsh = asg(useHash = true)
    assert(hsh === win, "formulations disagree")
    want.foreach { case (k, v) =>
      if (win.contains(k)) assert(win(k) === v, s"node $k: ${win(k)} != $v")
    }
    // the hash form's per-round plan is the intended shape: a
    // ShuffledHashJoin (no sort-merge), with the symmetrized-edge
    // exchange REUSED between the aggregate and the join probe
    val plan = pairs
      .select(greatest(col("src"), col("dst")).cast("long").as("u"),
        least(col("src"), col("dst")).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // plan-shape check with AQE off: exchange reuse is applied by the
    // STATIC ReuseExchange rule there (AQE does the same at runtime via
    // stage reuse, but only the static form is assertable pre-execution)
    val phys = {
      val k = "spark.sql.adaptive.enabled"
      val old = spark.conf.get(k)
      spark.conf.set(k, "false")
      try ConnectedComponents.largeStarHash(plan)
        .queryExecution.executedPlan.toString
      finally spark.conf.set(k, old)
    }
    assert(phys.contains("ShuffledHashJoin"), s"expected SHJ:\n$phys")
    assert(!phys.contains("SortMergeJoin"), s"unexpected SMJ:\n$phys")
    assert(phys.contains("ReusedExchange"), s"exchange not reused:\n$phys")
  }

  test("star pairs from a hot LSH bucket recover the full duplicate class") {
    // 300 identical docs blow past maxBucket=50 → the guard emits star
    // pairs only; connectivity through the representative must still put
    // the whole class in ONE cluster, plus distinct docs stay singletons.
    val dup = (0L until 300L).map(i => (i, "the same boilerplate text repeated " +
      "across many documents with identical content every time"))
    val uniq = (300L until 310L).map(i =>
      (i, s"completely unique document number $i with words w${i}a w${i}b w${i}c " +
        s"x${i} y${i} z${i} q${i} r${i} s${i} t${i}"))
    val docs = (dup ++ uniq).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
      numHashes = 32, rowsPerBand = 4, maxBucket = 50)
    val nPairs = cands.count()
    assert(nPairs < 300L * 299 / 4,
      s"guard did not engage: $nPairs pairs is near-quadratic")
    val got = ConnectedComponents.clusters(docs.select("doc_id"), "doc_id",
      cands, "doc_a", "doc_b").as[(Long, Long)].collect().toMap
    (0L until 300L).foreach(i => assert(got(i) === 0L, s"doc $i not in class 0"))
    (300L until 310L).foreach(i => assert(got(i) === i, s"unique doc $i merged"))
  }
}
