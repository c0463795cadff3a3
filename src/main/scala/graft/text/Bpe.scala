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

  /** Left-to-right non-overlapping merge of one pair within a token list.
    * Iterative, not recursive: a pathological multi-100k-char word must
    * not blow the stack — this runs on the driver during train() AND
    * inside executor tasks during encode().
    */
  private[graft] def applyMerge(toks: List[String],
      pair: (String, String)): List[String] = {
    val out = List.newBuilder[String]
    var rest = toks
    while (rest.nonEmpty) rest match {
      case a :: b :: tl if (a, b) == pair => out += (a + b); rest = tl
      case a :: tl => out += a; rest = tl
      case Nil => ()
    }
    out.result()
  }

  /** Learn `numMerges` merges from a word-frequency table.
    *
    * Boundedness (the 100 TB contract): a web-scale crawl has 10⁸-10⁹
    * DISTINCT regex tokens (numbers, hashes, typos), so collecting the
    * raw distinct-word table is a driver OOM at design scale. The model
    * is therefore bounded BEFORE the collect: a `minCount` frequency
    * floor (hapax noise carries no merge signal — the standard BPE
    * trainer pre-filter) and a deterministic top-`maxWords` cap by
    * (count DESC, word ASC) — a distributed TakeOrdered, so only the
    * capped model crosses the wire. Defaults keep every fixture corpus
    * intact (BpeSpec pins the learned merges unchanged); the collected
    * size is logged so an operator can see how close the cap is.
    *
    * The merge loop maintains pair counts INCREMENTALLY: one full count
    * at init, then each merge rewrites only the words containing the
    * chosen pair (tracked by a pair → word-index occurrence map) and
    * patches their pair-count deltas — O(affected words) per merge
    * instead of the earlier full O(model × word-length) recount
    * ([[mergeOnce]] keeps the from-scratch form as the spec's reference).
    * Selection stays (count DESC, pair ASC), deterministic.
    */
  def train(wordFreq: DataFrame, numMerges: Int,
      minCount: Long = 1L, maxWords: Int = 1 << 20): Seq[(String, String)] = {
    val bounded = wordFreq
      .select(col("word"), col("n").cast("long"))
      .filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("word").asc).limit(maxWords)
    val model: Array[(List[String], Long)] = bounded.collect()
      .map(r => (r.getString(0).split("").toList, r.getLong(1)))
    System.err.println(
      s"[bpe] collected model: ${model.length} distinct words " +
        s"(minCount=$minCount, cap=$maxWords)")

    val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
    val occurs =
      scala.collection.mutable.Map[(String, String), scala.collection.mutable.Set[Int]]()
    def patch(idx: Int, toks: List[String], n: Long, sign: Long): Unit =
      toks.lazyZip(toks.tail).foreach { (a, b) =>
        val p = (a, b)
        val c = pairCounts.getOrElse(p, 0L) + sign * n
        if (c == 0L) pairCounts.remove(p) else pairCounts(p) = c
        if (sign > 0L)
          occurs.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += idx
      }
    model.zipWithIndex.foreach { case ((t, n), i) => patch(i, t, n, 1L) }

    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < numMerges && pairCounts.nonEmpty) {
      // unique minimum: the comparison key embeds the pair itself
      val best = pairCounts.iterator
        .minBy { case ((a, b), n) => (-n, a, b) }._1
      merges += best
      // occurs is a SUPERSET hint (stale after earlier rewrites) — the
      // adjacency re-check below keeps the count patches exact
      occurs.remove(best).getOrElse(scala.collection.mutable.Set.empty[Int])
        .foreach { idx =>
          val (toks, n) = model(idx)
          val hasPair = toks.lazyZip(toks.tail).exists((a, b) => (a, b) == best)
          if (hasPair) {
            patch(idx, toks, n, -1L)
            val next = applyMerge(toks, best)
            model(idx) = (next, n)
            patch(idx, next, n, 1L)
          }
        }
      i += 1
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
