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
