package graft

import graft.text.Bpe

/** BPE training pinned against hand-computed merge sequences (no SQL
  * oracle can express the iterative merge loop, so the spec carries the
  * full contract): pair counting weighted by word frequency, max-count /
  * lexicographic tie-break selection, left-to-right non-overlapping
  * application, greedy lowest-rank encode ≡ training tokenization.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed merge sequence: counts weighted by frequency") {
    // "aaab"×3, "ab"×2 → (a,a)=6 beats (a,b)=5; then (a,b)=5; then (aa,ab)=3
    val freq = Seq(("aaab", 3L), ("ab", 2L)).toDF("word", "n")
    val merges = Bpe.train(freq, 10)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    // loop stops when no pairs remain (both words fully merged after 4)
    assert(Bpe.train(freq, 10).size < 10)
  }

  test("tie-break is lexicographic; merges never cross word boundaries") {
    val freq = Seq(("cd", 1L), ("ab", 1L)).toDF("word", "n")
    assert(Bpe.train(freq, 1) === Seq(("a", "b")))
    // "d a" across the words never forms a pair: 2 merges exhaust both words
    assert(Bpe.train(freq, 5) === Seq(("a", "b"), ("c", "d")))
  }

  test("within-word application is left-to-right non-overlapping") {
    assert(Bpe.applyMerge(List("a", "a", "a"), ("a", "a")) === List("aa", "a"))
    assert(Bpe.applyMerge(List("a", "a", "a", "a"), ("a", "a")) ===
      List("aa", "aa"))
  }

  test("greedy lowest-rank encode reproduces training tokenization") {
    val freq = Seq(("aaab", 3L), ("ab", 2L)).toDF("word", "n")
    val merges = Bpe.train(freq, 3)
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encodeWord("aaab", ranks) === List("aaab"))
    assert(Bpe.encodeWord("ab", ranks) === List("ab"))
    // unseen word: merges apply where possible, rest stays char-level
    assert(Bpe.encodeWord("aabc", ranks) === List("aa", "b", "c"))
  }

  test("corpus pass + train is deterministic and encode is distributed") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val wc = Bpe.wordCounts(docs).cache()
    try {
      val m1 = Bpe.train(wc, 20)
      val m2 = Bpe.train(wc.repartition(7), 20) // partitioning-invariant
      assert(m1 === m2 && m1.size === 20)
      implicit val s: org.apache.spark.sql.SparkSession = spark
      val enc = Bpe.encode(docs.limit(50), m1)
      val rows = enc.select("bpe_tokens").as[Seq[String]].collect()
      assert(rows.nonEmpty && rows.forall(_.nonEmpty))
      // round trip: concatenated tokens reproduce the regex words
      val back = enc.selectExpr(
        "concat_ws('', bpe_tokens) AS joined",
        s"concat_ws('', regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS words")
      assert(back.where("joined <> words").count() === 0)
    } finally { wc.unpersist(); () }
  }
}
