package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.functions.GraftFunctions
import graft.queries.{RelationalQueries, Tables}

/** Similarity-search correctness: the native CosineSim expression is
  * bit-identical to the higher-order-function formulation; LSH candidates
  * are a subset re-ranked exactly; approx_count_distinct error is bounded.
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("CosineSim expression == zip_with/aggregate formulation, bit-exact") {
    val e = Tables.embeddings(spark, dir).limit(200)
    val self = e.select($"vec_id", $"embedding".as("a"), $"embedding".as("b"))
    val both = self.select(
      $"vec_id",
      GraftFunctions.cosine_sim($"a", $"b").as("expr_cos"),
      (Ann.dotD($"a", $"b") / (Ann.normD($"a") * Ann.normD($"b"))).as("hof_cos"))
    val diffs = both.filter($"expr_cos" =!= $"hof_cos").count()
    assert(diffs === 0L)
    // and against a rotated pairing (a_i vs a_{i+1}) for non-trivial pairs
    val shifted = e.withColumn("vec_id", $"vec_id" - 1)
      .withColumnRenamed("embedding", "b_emb")
    val pairs = e.join(shifted, "vec_id")
      .select(GraftFunctions.cosine_sim($"embedding", $"b_emb").as("ec"),
        (Ann.dotD($"embedding", $"b_emb") /
          (Ann.normD($"embedding") * Ann.normD($"b_emb"))).as("hc"))
    assert(pairs.filter($"ec" =!= $"hc").count() === 0L)
  }

  test("expression top-k equals HOF top-k") {
    val e = Tables.embeddings(spark, dir)
    val a = Ann.bruteForceTopK(e, 0L, 10).select($"vec_id", $"rk").collect().toSet
    val b = Ann.bruteForceTopKExpr(e, 0L, 10).select($"vec_id", $"rk").collect().toSet
    assert(a === b)
  }

  test("LSH top-k results are true neighbors (subset of brute-force order)") {
    val e = Tables.embeddings(spark, dir)
    val exact = Ann.bruteForceTopK(e, 0L, 1000)
      .select($"vec_id", $"cos").as[(Long, Double)].collect().toMap
    val lsh = Ann.lshTopK(e, 0L, 10)
      .select($"vec_id", $"cos").as[(Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (id, cos) =>
      assert(exact.contains(id) && math.abs(exact(id) - cos) === 0.0,
        s"LSH score for $id diverges from exact")
    }
  }

  test("multi-band OR-amplification dominates single-band recall") {
    // Uniformly random embeddings have no true near neighbors, so absolute
    // recall is capped by geometry (P(candidate) = 1-(1-(1-θ/π)^r)^b with
    // θ≈60°); the DETERMINISTIC property is dominance: a multi-band
    // candidate set is a superset of its first band's, and exact rescoring
    // means every true-top-10 member among candidates reaches the output.
    def recall(bands: Int): Double = {
      val e = Tables.embeddings(spark, dir)
      val exactTop = Ann.bruteForceTopK(e, 0L, 10)
        .select($"vec_id").as[Long].collect().toSet
      val lshTop = Ann.lshTopK(e, 0L, 10, bands = bands, planesPerBand = 4)
        .select($"vec_id").as[Long].collect().toSet
      (exactTop & lshTop).size.toDouble / exactTop.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    assert(r4 >= r1, s"banding lost recall: 1 band=$r1, 4 bands=$r4")
    assert(r4 >= 0.3, s"multi-band recall collapsed: $r4")
  }

  test("BandSig expression matches a per-plane column-API recomputation") {
    import graft.functions.BandSig
    val e = Tables.embeddings(spark, dir).limit(50)
    // recompute band 0's bucket with plain column ops (the formulation the
    // expression replaces) and compare
    val naive = (0 until 4).map { p =>
      val dot = (0 until 64).map { i =>
        element_at($"embedding", i + 1).cast("double") * lit(Ann.planeVal(p, i))
      }.reduce(_ + _)
      when(dot >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val both = e.select(
      element_at(BandSig($"embedding", 4, 4), 1).as("expr_b0"),
      naive.as("naive_b0"))
    assert(both.filter($"expr_b0" =!= $"naive_b0").count() === 0L)
  }

  test("IVF: probing all lists equals brute force; partial probes are true neighbors") {
    val e = Tables.embeddings(spark, dir)
    val exactTop = Ann.bruteForceTopK(e, 0L, 10)
      .select($"vec_id", $"cos").as[(Long, Double)].collect()
    // nProbe = numCentroids → every inverted list scanned → exact result
    val full = Ann.ivfTopK(e, 0L, 10, numCentroids = 16, nProbe = 16)
      .select($"vec_id", $"cos").as[(Long, Double)].collect()
    assert(full.toSeq === exactTop.toSeq)
    // partial probe: every returned neighbor is real with its exact score
    val exactAll = Ann.bruteForceTopK(e, 0L, 1000)
      .select($"vec_id", $"cos").as[(Long, Double)].collect().toMap
    val part = Ann.ivfTopK(e, 0L, 10, numCentroids = 16, nProbe = 4)
      .select($"vec_id", $"cos").as[(Long, Double)].collect()
    assert(part.nonEmpty)
    part.foreach { case (id, cos) =>
      assert(exactAll.contains(id) && exactAll(id) === cos,
        s"IVF score for $id diverges from exact")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val rows = RelationalQueries.approxDistinctFull(spark, dir)
      .select($"approx_users", $"exact_users").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"HLL error too large: $approx vs $exact")
    }
    // the oracled projection must report the bound as met
    val bad = RelationalQueries.approxDistinct(spark, dir)
      .filter(!$"within_5pct").count()
    assert(bad === 0L)
  }
}
