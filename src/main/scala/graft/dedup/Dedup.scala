package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for training-data pipelines: MinHash+LSH and
  * SimHash over word shingles. Both are shuffle-frugal at scale:
  * signatures are computed per-row (narrow, codegen'd), and the only
  * shuffle is the band-bucket / simhash-chunk groupBy whose cardinality is
  * O(#buckets), not O(#pairs).
  */
object Dedup {

  private val wordPat = "[a-z0-9]+"

  /** 3-word shingle array (distinct) of a text column. */
  def shingleArr(textCol: Column): Column = {
    val w = regexp_extract_all(lower(textCol), lit(wordPat), lit(0))
    array_distinct(
      when(size(w) >= 3,
        transform(sequence(lit(0), size(w) - 3), i =>
          concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2),
            element_at(w, i + 3))))
        .otherwise(array().cast("array<string>")))
  }

  /** MinHash signatures: shingles are exploded once, then ONE hash-agg per
    * doc computes all `numHashes` min-of-salted-hash columns — every
    * expression stays inside whole-stage codegen and the signature is
    * materialized by the groupBy exchange, never recomputed downstream.
    * (A nested transform/array_min formulation was 100x slower: Catalyst
    * inlined the full signature expression into every consumer and
    * evaluated it interpreted.)
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(shingleArr(col(textCol))).as("sh"))
    val aggs = (0 until numHashes).map { i =>
      min(xxhash64(concat(lit(i.toString), col("sh")))).as(s"h$i")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Candidate pairs via banded LSH over the MinHash signature.
    * Docs agreeing on all rows of any band collide. Returns
    * (doc_a, doc_b, est_jaccard), est_jaccard = fraction of matching
    * minhash components.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    val nBands = numHashes / rowsPerBand
    val sig = minhashSignatures(docs, idCol, textCol, numHashes)
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until nBands).map(b =>
        xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)
            .cast("array<string>")))): _*))
        .as(Seq("band", "bucket")))
    val pairs = banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    pairs.select(col("doc_a"), col("doc_b"),
      (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
        (x === y).cast("int")), v => v === 1)).cast("double") /
        lit(numHashes.toDouble)).as("est_jaccard"))
  }

  /** 64-bit SimHash: per token-hash bit, vote +count/-count; sign → bit.
    * Expressed as 64 conditional sums over exploded tokens — one narrow
    * explode + one groupBy(doc) with partial aggregation.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(regexp_extract_all(lower(col(textCol)), lit(wordPat), lit(0)))
        .as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val votes = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0L, 1L).otherwise(-1L))
        .as(s"v$b")
    }
    val voted = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val bits = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }
    voted.select(col("doc_id"), bits.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup candidates: split the 64-bit hash into 4 16-bit
    * chunks; pairs agreeing on ≥1 chunk are candidates (covers all pairs
    * with hamming distance ≤ 3 by pigeonhole), then exact hamming filter.
    */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val chunked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "ckey")))
    val hamming = {
      val x = col("a.simhash").bitwiseXOR(col("b.simhash"))
      bit_count(x)
    }
    chunked.as("a").join(chunked.as("b"),
      col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }
}
