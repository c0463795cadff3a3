package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING, Spark-first.
  *
  * The architecture mirrors how real BPE trainers work (Sennrich et al.
  * 2016): the corpus-scale work is ONE distributed pass building the
  * word-frequency table; the merge loop then runs over that compact model
  * (distinct words, not corpus tokens — bounded by vocabulary, ~10⁵ rows
  * for a 100 TB crawl), because every pair count is derivable from word
  * counts alone. Putting the loop on the driver is therefore not a
  * shortcut but the right altitude: iterating k merges as k Spark jobs
  * would pay k scheduler barriers to update a table that fits in L2.
  *
  * Merge semantics (pinned by BpeSpec against a step-by-step sequential
  * reference): candidate pairs are adjacent token pairs within words
  * (never across word boundaries), weighted by word frequency; each round
  * merges the globally most frequent pair (ties → lexicographically
  * smallest pair — deterministic across runs and partitionings); pair
  * occurrences within a word merge left-to-right non-overlapping
  * ("aaa" + merge (a,a) → ["aa", "a"]).
  *
  * Encoding applies the learned ranks greedily — repeatedly merging the
  * present pair with the LOWEST rank — per row against the broadcast
  * merge table: embarrassingly parallel, no shuffle.
  */
object Bpe {

  private val wordPat = "[a-z0-9]+"

  /** The one corpus-scale pass: distributed word-frequency table.
    * (lower + regex tokenize + explode + hash agg — one shuffle keyed on
    * the word, map-side combined.)
    */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(expr(
        s"regexp_extract_all(lower($textCol), '$wordPat', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** One merge step over the in-memory model: returns the chosen pair and
    * the rewritten model, or None when no pair remains. Exposed for the
    * spec's step-equivalence pinning.
    */
  private[graft] def mergeOnce(model: Seq[(List[String], Long)])
      : Option[((String, String), Seq[(List[String], Long)])] = {
    val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
    model.foreach { case (toks, n) =>
      toks.lazyZip(toks.tail).foreach { (a, b) =>
        val p = (a, b); pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
      }
    }
    if (pairCounts.isEmpty) None
    else {
      val best = pairCounts.toSeq
        .minBy { case ((a, b), n) => (-n, a, b) }._1
      Some((best, model.map { case (toks, n) => (applyMerge(toks, best), n) }))
    }
  }

  /** Left-to-right non-overlapping merge of one pair within a token list. */
  private[graft] def applyMerge(toks: List[String],
      pair: (String, String)): List[String] = toks match {
    case a :: b :: rest if (a, b) == pair =>
      (a + b) :: applyMerge(rest, pair)
    case a :: rest => a :: applyMerge(rest, pair)
    case Nil => Nil
  }

  /** Learn `numMerges` merges from a word-frequency table. The input is
    * the compact model (distinct words), so `collect()` here is the
    * documented contract — vocabulary-, not corpus-sized; the heavy pass
    * stays in [[wordCounts]].
    */
  def train(wordFreq: DataFrame, numMerges: Int): Seq[(String, String)] = {
    var model: Seq[(List[String], Long)] = wordFreq
      .select(col("word"), col("n").cast("long"))
      .collect()
      .map(r => (r.getString(0).split("").toList, r.getLong(1))).toSeq
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      mergeOnce(model) match {
        case Some((pair, next)) => merges += pair; model = next; i += 1
        case None => done = true
      }
    }
    merges.result()
  }

  /** Greedy lowest-rank-first encode of one word (the standard BPE
    * inference rule; with ranks from [[train]] it reproduces training
    * tokenization on seen words).
    */
  private[graft] def encodeWord(word: String,
      ranks: Map[(String, String), Int]): List[String] = {
    var toks = word.split("").toList
    var continue = toks.lengthCompare(1) > 0
    while (continue) {
      val present = toks.lazyZip(toks.tail)
        .map((a, b) => (a, b)).filter(ranks.contains)
      if (present.isEmpty) continue = false
      else toks = applyMerge(toks, present.minBy(ranks))
    }
    toks
  }

  /** Tokenize a corpus with a trained merge table: broadcast ranks, one
    * narrow pass, no shuffle. The per-row kernel is a Scala closure over
    * `mapPartitions`-style codegen boundaries (same justification as the
    * gzip codec: the kernel itself is the operator; everything around it
    * stays columnar).
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text")(implicit spark: SparkSession): DataFrame = {
    val ranks = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    val enc = udf { (text: String) =>
      "[a-z0-9]+".r.findAllIn(Option(text).getOrElse("").toLowerCase)
        .flatMap(w => encodeWord(w, ranks.value)).toSeq
    }
    docs.withColumn("bpe_tokens", enc(col(textCol)))
  }
}
