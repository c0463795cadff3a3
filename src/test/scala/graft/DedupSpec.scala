package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.queries.Tables

/** Property tests for the dedup primitives (the 100-TB dedup correctness
  * backstop): banded-LSH completeness, MinHash estimator accuracy against
  * exact Jaccard, and the SimHash chunk-join pigeonhole guarantee — each
  * verified by brute-force recomputation in plain Scala over the driver's
  * deterministic sf0.001 corpus.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)

  private val wordPat = "[a-z0-9]+".r
  private def shingleSet(text: String): Set[String] = {
    val w = wordPat.findAllIn(text.toLowerCase).toArray
    if (w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  test("banded LSH emits EXACTLY the pairs agreeing on >=1 full band") {
    val numHashes = 32; val rowsPerBand = 4
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes)
      .as[(Long, Seq[Long])].collect().toMap
    // brute-force ground truth over collected signatures
    def bandKeys(sig: Seq[Long]): Seq[Seq[Long]] =
      sig.grouped(rowsPerBand).toSeq
    val expected = (for {
      (a, sa) <- sigs.toSeq
      (b, sb) <- sigs.toSeq
      if a < b
      if bandKeys(sa).zip(bandKeys(sb)).exists { case (x, y) => x == y }
    } yield (a, b)).toSet
    val got = Dedup.minhashCandidates(docs, "doc_id", "text", numHashes, rowsPerBand)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(got === expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(expected.nonEmpty, "corpus has no LSH collisions — test is vacuous")
  }

  test("est_jaccard tracks exact Jaccard on candidate pairs") {
    val texts = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
      numHashes = 64, rowsPerBand = 4)
      .select($"doc_a", $"doc_b", $"est_jaccard").as[(Long, Long, Double)].collect()
    assert(cands.nonEmpty)
    cands.foreach { case (a, b, est) =>
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      val exact =
        if (sa.isEmpty && sb.isEmpty) 1.0
        else (sa & sb).size.toDouble / (sa | sb).size
      // 64 hashes → std ≈ sqrt(j(1-j)/64) ≤ 0.0625; 4 sigma + slack
      assert(math.abs(est - exact) <= 0.3,
        s"pair ($a,$b): est=$est exact=$exact")
    }
  }

  test("simhash chunk join finds ALL pairs with hamming <= 3 (pigeonhole), md5 + xxhash variants") {
    def check(sig: Map[Long, Long], got: Set[(Long, Long, Long)], bits: Int): Unit = {
      val expected = (for {
        (a, ha) <- sig.toSeq
        (b, hb) <- sig.toSeq
        if a < b
        h = java.lang.Long.bitCount(ha ^ hb)
        if h <= 3
      } yield (a, b, h.toLong)).toSet
      assert(got === expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
    // md5-based 60-bit (the oracled variant)
    val md5Sig = Dedup.simhashMd5(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val md5Got = Dedup.simhashCandidatesOracle(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    check(md5Sig, md5Got, 60)
    // production xxhash64-based 64-bit
    val xxSig = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val xxGot = Dedup.simhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    check(xxSig, xxGot, 64)
    assert(md5Got.nonEmpty || xxGot.nonEmpty,
      "no near-dup pairs at hamming<=3 — corpus check is vacuous")
  }

  test("hot-bucket guard: degenerate corpus emits O(n) star pairs, not O(n^2), connectivity preserved") {
    // 1200 identical short docs: every band hashes every doc into ONE
    // bucket. Unguarded, the self-join emits 719,400 pairs; the guard
    // caps it at n-1 star pairs to the representative (doc 0), which
    // keeps the duplicate class connected.
    val n = 1200
    val degenerate = spark.range(n).select($"id".as("doc_id"),
      lit("all work and no play makes a dull boilerplate document").as("text"))
    val mh = Dedup.minhashCandidates(degenerate, "doc_id", "text",
      numHashes = 16, rowsPerBand = 4, maxBucket = 100)
      .select($"doc_a", $"doc_b", $"est_jaccard")
      .as[(Long, Long, Double)].collect()
    assert(mh.length === n - 1, "star emission should yield exactly n-1 pairs")
    assert(mh.forall(_._1 === 0L), "every pair anchors at the representative")
    assert(mh.map(_._2).toSet === (1L until n).toSet, "every member reached")
    assert(mh.forall(_._3 === 1.0), "identical docs estimate jaccard 1.0")
    val sh = Dedup.simhashCandidates(degenerate, "doc_id", "text",
      maxHamming = 3, maxBucket = 100)
      .as[(Long, Long, Long)].collect()
    assert(sh.length === n - 1 && sh.forall(p => p._1 === 0L && p._3 === 0L))
    // monitoring surface: the stats frame exposes the degenerate bucket
    val maxBucketSize = Dedup.bucketStats(degenerate, "doc_id", "text",
      numHashes = 16, rowsPerBand = 4)
      .select($"n").as[Long].first()
    assert(maxBucketSize === n.toLong)
  }

  test("guard is inert on healthy buckets: tiny cap over the real corpus equals star-only where hot, all-pairs elsewhere") {
    // With the cap far above any bucket size, guarded == historical
    // all-pairs output (the oracle premise); DedupSpec's exactness test
    // above already pins that. Here: a cap of 1 forces EVERY multi-doc
    // bucket to star mode, and the result must still be a subset of the
    // unguarded pair set that touches the same doc population.
    val full = Dedup.minhashCandidates(docs, "doc_id", "text", 32, 4)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val starred = Dedup.minhashCandidates(docs, "doc_id", "text", 32, 4,
      maxBucket = 1)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(starred.subsetOf(full))
    val fullDocs = full.flatMap(p => Set(p._1, p._2))
    val starDocs = starred.flatMap(p => Set(p._1, p._2))
    assert(starDocs === fullDocs, "star mode must not drop documents from the candidate population")
  }

  test("minhash LSH at verification params recalls every exact-Jaccard>=0.5 pair (the dedup_minhash oracle premise)") {
    val texts = docs.filter($"doc_id" < 300)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val truePairs = (for {
      (a, ta) <- texts.toSeq
      (b, tb) <- texts.toSeq
      if a < b
      sa = shingleSet(ta); sb = shingleSet(tb)
      if sa.nonEmpty || sb.nonEmpty
      j = if ((sa | sb).isEmpty) 0.0 else (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.5
    } yield (a, b)).toSet
    val cands = Dedup.minhashCandidates(docs.filter($"doc_id" < 300),
      "doc_id", "text", numHashes = 64, rowsPerBand = 2)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(truePairs.nonEmpty, "no true near-dup pairs — premise is vacuous")
    assert((truePairs -- cands).isEmpty,
      s"LSH missed true pairs: ${(truePairs -- cands).take(5)}")
  }
}
