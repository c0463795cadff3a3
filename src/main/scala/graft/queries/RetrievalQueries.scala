package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-retrieval surface over the documents table: a sharded inverted
  * index and BM25 ranked retrieval — the lexical counterpart of the ANN
  * stack (ann/Ann.scala) for training-data curation (e.g. "find every
  * document about X" before a targeted decontamination or sampling pass).
  *
  * Scale notes (100 TB):
  *  - the index build is explode → one hash aggregation; posting lists
  *    are SHARDED by doc_id so a stop-word's postings split across S
  *    rows instead of one unbounded reducer row (the classic "the"
  *    problem) — shard fan-in is a second, cheap agg at query time;
  *  - BM25 is ONE tokenized scan: per-doc query-term counts are narrow
  *    `size(filter(…))` projections, the corpus stats (n, avgdl, every
  *    term's df) are a single broadcast scalar aggregate, and the score
  *    is an explicit term-sorted fold — the only shuffle is the stats
  *    row, the only wide op TakeOrderedAndProject (never a global sort,
  *    never O(corpus tokens) movement).
  *
  * Float discipline (oracle-exactness): every division appears exactly
  * once per factor with the same nesting as the DuckDB SQL, and the
  * per-term contributions are summed by an ORDER-DEFINED left fold over
  * the term-sorted array (`aggregate`), not a nondeterministic SUM — the
  * one remaining engine difference (libm `ln` ulps) is absorbed by
  * round(·, 6), verified stable at sf0.001 / sf0.01 / sf0.1.
  */
object RetrievalQueries {

  private val wordPat = "[a-z0-9]+"
  private val Shards = 4

  private def docWords(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      expr(s"regexp_extract_all(lower(text), '$wordPat', 0)").as("w"))

  /** Sharded inverted index: (term, shard) → sorted distinct postings +
    * per-shard doc frequency. One explode + one hash agg; the postings
    * string is the deterministic textual form both engines hash alike.
    */
  def invertedIndex(s: SparkSession, d: String): DataFrame =
    docWords(s, d)
      .select(explode(col("w")).as("term"), col("doc_id"))
      .select(col("term"), pmod(col("doc_id"), lit(Shards)).cast("int").as("shard"),
        col("doc_id"))
      .groupBy(col("term"), col("shard"))
      // ONE collect_set buffer per group; postings string and df both
      // derive from it (a separate countDistinct would add an Expand)
      .agg(sort_array(collect_set(col("doc_id"))).as("p"))
      .select(col("term"), col("shard"),
        concat_ws(",", transform(col("p"), _.cast("string"))).as("postings"),
        size(col("p")).cast("long").as("df_shard"))

  val invertedIndexSql: String =
    s"""SELECT term, CAST(doc_id % $Shards AS INTEGER) AS shard,
              array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings,
              count(DISTINCT doc_id) AS df_shard
       FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$wordPat')) AS term
             FROM documents)
       GROUP BY 1, 2"""

  /** BM25 (k1 = 1.2, b = 0.75) top-10 for a fixed 3-term query. */
  def bm25TopK(s: SparkSession, d: String): DataFrame = {
    // SORTED so the explicit score fold matches the oracle's
    // list(c ORDER BY term); adding an absent term contributes +0.0,
    // which is an IEEE no-op on the (positive) running sum
    val terms = Seq("window", "shuffle", "join").sorted
    val k = 10
    // ONE tokenized scan: per-doc length + per-query-term counts are all
    // narrow projections — the branching dl/tf/idf formulation re-scanned
    // and re-tokenized the corpus 4×. tf = size(w) − size(array_remove(w,
    // t)): same count as the earlier size(filter(w, x === t)), but
    // array_remove is a codegen'd collection expression where the filter
    // HOF evaluated its lambda INTERPRETED once per token (guide §1.2
    // per-task work; same fix class as functions/Shingles).
    // The per-doc proxy (doc_id, dl, tf×3 — ~40 bytes/doc) is pinned so
    // the stats aggregate and the scoring pass read ONE tokenized scan
    // instead of re-tokenizing the corpus for each side of the crossJoin
    // (guide §8: decide with small rows — regexp_extract_all runs once,
    // both consumers read the tiny proxy; PlanPin doc for lifecycle)
    val perDoc = PlanPin.pinned(docWords(s, d).select(
      col("doc_id") +: size(col("w")).as("dl") +:
        terms.map(t => (size(col("w")) - size(array_remove(col("w"), t)))
          .cast("double").as(s"tf_$t")): _*), "bm25:")
    // n, avgdl, AND every term's doc frequency in one scalar aggregate
    val statCols = count(lit(1)).as("n") +:
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
      terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    def contrib(t: String): Column = {
      val idf = log(lit(1.0) +
        (col("n") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
      when(col(s"tf_$t") > 0,
        idf * ((col(s"tf_$t") * lit(2.2)) /
          (col(s"tf_$t") + lit(1.2) *
            (lit(0.25) + (lit(0.75) * col("dl")) / col("avgdl")))))
        .otherwise(lit(0.0))
    }
    perDoc.crossJoin(broadcast(stats))
      .filter(terms.map(t => col(s"tf_$t") > 0).reduce(_ || _))
      .select(col("doc_id"),
        round(terms.foldLeft(lit(0.0))((acc, t) => acc + contrib(t)), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }

  val bm25TopKSql: String =
    s"""WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '$wordPat') AS w
                  FROM documents),
       dl AS (SELECT doc_id, len(w) AS dl FROM d),
       stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                 FROM dl),
       t AS (SELECT doc_id, unnest(w) AS term FROM d),
       tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM t
              WHERE term IN ('window', 'shuffle', 'join') GROUP BY 1, 2),
       idf AS (SELECT term,
                      ln(1.0 + (stats.n - count(*) + 0.5) / (count(*) + 0.5)) AS idf
               FROM tf, stats GROUP BY term, stats.n),
       contrib AS (
         SELECT tf.doc_id, tf.term,
                idf.idf * ((tf.tf * 2.2) /
                  (tf.tf + 1.2 * (0.25 + (0.75 * dl.dl) / stats.avgdl))) AS c
         FROM tf JOIN idf USING (term) JOIN dl USING (doc_id), stats)
       SELECT doc_id,
              round(list_reduce(list_prepend(0.0, list(c ORDER BY term)),
                (a, b) -> a + b), 6) AS score
       FROM contrib GROUP BY doc_id
       ORDER BY score DESC, doc_id LIMIT 10"""

  /** Unigram-LM quality score (the CCNet-style perplexity filter, unigram
    * form): train p(w) = (count(w)+1)/(total+|V|) on the corpus itself
    * (Laplace smoothing), score each document by its mean negative
    * log-likelihood — high = unusual/garbled text for this corpus, low =
    * fluent. At 100 TB: one explode + hash agg builds the LM, the vocab
    * BROADCASTS, and the one doc-keyed shuffle carries DISTINCT
    * (doc, term) pairs (tf pre-aggregated map-side), never per-token rows.
    *
    * Float discipline: Σ tf·lnp via the order-defined fold over
    * term-sorted pairs; Σ tf is a sum of integer-valued doubles (exact in
    * any order); ONE division; round(6) — same contract as [[bm25TopK]].
    */
  def lmQuality(s: SparkSession, d: String): DataFrame = {
    val docs = docWords(s, d).filter(size(col("w")) > 0)
    val terms = docs.select(col("doc_id"), explode(col("w")).as("term"))
    // NOT pinned (tried in r6, reverted): the doc-term tf frame is far
    // larger than the vocab aggregate's map-side partials, so pinning tf
    // to save the second explode cost MORE than it saved (1.07 → 1.76 s
    // at sf0.1) — the two explodes each feed partial-agg'd aggregates
    // whose shuffled rows are vocabulary-sized, which is the cheap shape.
    val vocab = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
    val stats = vocab.agg(sum(col("c")).as("total"), count(lit(1)).as("v"))
    val lm = vocab.crossJoin(broadcast(stats))
      .select(col("term"),
        log((col("c") + lit(1)).cast("double") /
          (col("total") + col("v")).cast("double")).as("lnp"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    tf.join(broadcast(lm), "term")
      .groupBy(col("doc_id"))
      .agg(
        round(-aggregate(
          transform(array_sort(collect_list(
            struct(col("term"), (col("tf") * col("lnp")).as("x")))),
            x => x.getField("x")),
          lit(0.0), (a, x) => a + x) / sum(col("tf")), 6).as("mean_nll"),
        sum(col("tf")).cast("long").as("n_words"))
  }

  val lmQualitySql: String =
    s"""WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '$wordPat') AS w
                  FROM documents),
       t AS (SELECT doc_id, unnest(w) AS term FROM d WHERE len(w) > 0),
       vocab AS (SELECT term, count(*) AS c FROM t GROUP BY term),
       stats AS (SELECT sum(c) AS total, count(*) AS v FROM vocab),
       lm AS (SELECT term,
                     ln(CAST(c + 1 AS DOUBLE) / CAST(total + v AS DOUBLE)) AS lnp
              FROM vocab, stats),
       tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
              FROM t GROUP BY 1, 2)
       SELECT doc_id,
              round(-list_reduce(list_prepend(0.0,
                  list(tf * lnp ORDER BY term)), (a, b) -> a + b)
                / sum(tf), 6) AS mean_nll,
              CAST(sum(tf) AS BIGINT) AS n_words
       FROM tf JOIN lm USING (term)
       GROUP BY doc_id"""
}
