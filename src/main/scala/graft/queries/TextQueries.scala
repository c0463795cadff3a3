package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines over the
  * `documents` table: exact dedup, quality scoring, token counting,
  * language-ID heuristic, document fingerprinting. All narrow (no shuffle
  * except the dedup groupBy) and whole-stage-codegen'd — per-row cost only,
  * so they scale linearly to 100 TB.
  */
object TextQueries {

  private val wordPat = "[a-z0-9]+"

  /** Exact dedup: hash-groupBy on content digest; keeps the smallest doc_id
    * per duplicate class. One shuffle keyed on the digest.
    */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  val dedupExactSql: String =
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
       count(*) AS dup_count
       FROM documents GROUP BY 1"""

  /** Quality scoring: token count (regex word matches — whitespace-shape
    * independent), char length, mean token length, stopword ratio.
    */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit(wordPat), lit(0))
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_m"),
      size(regexp_extract_all(lower(col("text")),
        lit("\\b(the|a|of|and|is|to|in)\\b"), lit(0))).cast("long").as("stop_hits"))
      .withColumn("mean_tok_len",
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(col("n_chars_m").cast("double") / col("n_tokens").cast("double")))
  }

  val textQualitySql: String =
    """SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
       length(text) AS n_chars_m,
       len(regexp_extract_all(lower(text), '\b(the|a|of|and|is|to|in)\b')) AS stop_hits,
       CAST(length(text) AS DOUBLE) /
         CAST(nullif(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 0) AS DOUBLE)
         AS mean_tok_len
       FROM documents"""

  /** Language-ID heuristic: per-language stopword hit counts, argmax with a
    * deterministic priority order. (n-gram heuristic class; SURVEY task
    * brief "text analysis".)
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    def hits(pat: String) =
      size(regexp_extract_all(lower(col("text")), lit(pat), lit(0))).cast("long")
    Tables.documents(s, d).select(
      col("doc_id"),
      hits("\\b(the|a|of|and|is)\\b").as("en_hits"),
      hits("\\b(el|la|de|que|y)\\b").as("es_hits"),
      hits("\\b(der|die|das|und|ist)\\b").as("de_hits"))
      .withColumn("predicted_lang",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits"), "en")
          .when(col("es_hits") >= col("de_hits"), "es")
          .otherwise("de"))
  }

  val langIdSql: String =
    """SELECT doc_id,
       len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b')) AS en_hits,
       len(regexp_extract_all(lower(text), '\b(el|la|de|que|y)\b')) AS es_hits,
       len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) AS de_hits,
       CASE
         WHEN len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b'))
              >= len(regexp_extract_all(lower(text), '\b(el|la|de|que|y)\b'))
          AND len(regexp_extract_all(lower(text), '\b(the|a|of|and|is)\b'))
              >= len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b'))
           THEN 'en'
         WHEN len(regexp_extract_all(lower(text), '\b(el|la|de|que|y)\b'))
              >= len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b'))
           THEN 'es'
         ELSE 'de' END AS predicted_lang
       FROM documents"""

  /** Token counting (task brief: "whitespace + a BPE-ish regex"): the
    * GPT-2-style pre-tokenizer shape — contractions, space-prefixed
    * letter/digit runs, punctuation runs, whitespace runs — restricted to
    * ASCII classes so Java regex and RE2 agree; plus the plain whitespace
    * split count. Narrow, codegen'd, scale-linear.
    */
  def tokenCounts(s: SparkSession, d: String): DataFrame = {
    // explicit whitespace class, NOT \s: Java \s matches vertical tab
    // \x0B but RE2/DuckDB \s does not — a VT-bearing document would
    // diverge engine-vs-oracle
    val ws = " \\t\\n\\r\\f"
    val bpePat = s"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9$ws]+|[$ws]+"
    Tables.documents(s, d).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(bpePat), lit(0)))
        .cast("long").as("n_bpe_tokens"),
      when(length(trim(col("text"))) === 0, lit(0L))
        .otherwise(size(split(trim(col("text")), s"[$ws]+")).cast("long"))
        .as("n_ws_tokens"))
  }

  val tokenCountsSql: String =
    """SELECT doc_id,
       len(regexp_extract_all(text,
         '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f]+|[ \t\n\r\f]+'))
         AS n_bpe_tokens,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '[ \t\n\r\f]+')) END AS n_ws_tokens
       FROM documents"""

  /** Document fingerprint: digest of whitespace/punctuation-normalized
    * lowercase text — near-dup-stable canonical form.
    */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
        .cast("binary")).as("fp"))

  val fingerprintSql: String =
    """SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
       FROM documents"""

  /** Exact n-gram (3-word-shingle) Jaccard similarity for candidate pairs in
    * a bounded id range. Shingle set built per row (narrow), then a
    * shingle-keyed self-join — the standard pair-generation shape. The
    * PRODUCTION form is [[ngramJaccardLsh]]: no id bound, pair generation
    * through banded MinHash LSH, exact verification on candidates only —
    * this bounded all-pairs form exists as the oracle-shaped exhibit.
    */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 300)
      .select(col("doc_id"),
        array_distinct(shingles(lower(col("text")))).as("sh"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("sh"))
    val pairs = ex.as("a").join(ex.as("b"),
      col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .filter(col("inter") * 2 >= col("n_a") + col("n_b") - col("inter"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"))
  }

  /** Unbounded n-gram Jaccard near-dup pairs: pair GENERATION through the
    * banded MinHash LSH ([[graft.dedup.Dedup.minhashCandidates]] — no id
    * bound, no all-pairs stage anywhere), exact shingle-Jaccard
    * VERIFICATION on the candidates only. The oracle is the all-pairs
    * exact-Jaccard SQL over the FULL table, so the hash compare
    * machine-checks LSH recall = 1.0 on every fixture, not just
    * precision. 16 bands of 2 minhash rows: P(miss) at the fixture's
    * minimum qualifying similarity (J = 0.8) is (1−0.8²)¹⁶ ≈ 1e-7, and
    * the fixture gap (no pairs with 1/3 ≤ J < 0.8) keeps the threshold
    * filter decisive. Scale shape: signatures/banding are narrow +
    * one O(#buckets) shuffle; verification joins the BOUNDED candidate
    * set against per-doc shingle arrays (two key shuffles of candidate
    * cardinality, never corpus²).
    */
  def ngramJaccardLsh(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val cands = graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text",
      numHashes = 32, rowsPerBand = 2).select("doc_a", "doc_b")
    val sh = docs.select(col("doc_id"),
      array_distinct(shingles(lower(col("text")))).as("sh"))
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
        size(col("sh_a")).cast("long").as("n_a"),
        size(col("sh_b")).cast("long").as("n_b"))
      .filter(col("inter") * 2 >= col("n_a") + col("n_b") - col("inter"))
  }

  /** ngramJaccardSql with NO id bound — the all-pairs truth the LSH-routed
    * form must reproduce exactly.
    */
  val ngramJaccardLshSql: String =
    """WITH docs AS (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
         FROM documents),
       shl AS (
         SELECT doc_id,
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            for i in generate_series(1, len(w) - 2)] AS shs
         FROM docs WHERE len(w) >= 3),
       sh AS (SELECT DISTINCT doc_id, unnest(shs) AS sh FROM shl),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT doc_a, doc_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b
       FROM pairs
       JOIN sizes sa ON sa.doc_id = doc_a
       JOIN sizes sb ON sb.doc_id = doc_b
       WHERE inter * 2 >= sa.n_sh + sb.n_sh - inter"""

  /** Deterministic stratified sample — balanced per-stratum selection for
    * training-data curation: within each stratum (lang), rank docs by
    * md5(doc_id) (a uniform, engine-reproducible pseudo-random order; a
    * seeded Bernoulli sample would be engine-private) and keep the first
    * k. One shuffle on the stratum key; the per-stratum sort streams —
    * at 100 TB replace row_number with a per-key TakeOrdered if strata
    * are huge and k tiny.
    */
  def stratifiedSample(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
  }

  val stratifiedSampleSql: String =
    """SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn FROM (
         SELECT doc_id, lang, row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         FROM documents)
       WHERE rn <= 20"""

  /** Per-source quota (the "domain cap" of web-corpus curation): keep at
    * most k docs per source, chosen by the deterministic md5 rank — no
    * single domain can dominate the training mix, and the selection is
    * reproducible across runs and cluster sizes. Same shape as
    * [[stratifiedSample]] with the source column as the stratum.
    */
  def sourceCap(s: SparkSession, d: String, k: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("source"))
  }

  val sourceCapSql: String =
    """SELECT doc_id, source FROM (
         SELECT doc_id, source, row_number() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         FROM documents)
       WHERE rn <= 50"""

  /** PII-shaped redaction (curation scrub): emails and long digit runs
    * replaced with typed placeholder tokens. Pure per-row projection
    * (codegen regexp_replace, no shuffle); patterns restricted to
    * character classes Java regex and RE2 interpret identically, so the
    * DuckDB oracle applies the SAME patterns.
    */
  def redactPii(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
          "[0-9]{9,}", "<NUM>").as("text_redacted"))

  val redactPiiSql: String =
    """SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
         '[0-9]{9,}', '<NUM>', 'g') AS text_redacted
       FROM documents"""

  /** Keyword extraction, tf-idf-shaped but integer-ranked (high term
    * frequency, rare document frequency) so the oracle is float-free:
    * top-3 terms (length ≥ 4) per doc by (tf DESC, df ASC, term ASC),
    * with tf and df exposed. Shape: one explode + two hash aggs + a
    * broadcast-sized term-df join + per-doc top-k window — df cardinality
    * is vocabulary-sized, so the join side is compact even at 100 TB.
    */
  def topTerms(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d).select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit(wordPat), lit(0)))
        .as("term"))
      .filter(length(col("term")) >= 4)
    // tf feeds BOTH the df aggregate and the probe join — pinned so the
    // tokenize + explode + count pass runs once (PlanPin doc)
    val tf = PlanPin.pinned(toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")), "topTerms:")
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(broadcast(df), "term")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("rk").cast("long").as("rk"))
  }

  val topTermsSql: String =
    """WITH toks AS (
         SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
         FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf
              FROM toks WHERE length(term) >= 4 GROUP BY 1, 2),
       df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
       SELECT doc_id, term, tf, df, CAST(rk AS BIGINT) AS rk FROM (
         SELECT tf.doc_id, tf.term, tf.tf, df.df, row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rk
         FROM tf JOIN df USING (term))
       WHERE rk <= 3"""

  /** Repetition ratio — the boilerplate/spam signal: share of the doc's
    * 3-word shingles taken by its single most-repeated shingle (1.0 = the
    * doc is one phrase looping). Narrow explode + two hash aggs; docs
    * with < 3 words score 0 over 0 shingles.
    */
  def repetitionRatio(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d).select(col("doc_id"),
      explode(shingles(lower(col("text")))).as("sh"))
    val per = sh.groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_sh"), max(col("c")).as("max_sh"))
    Tables.documents(s, d).select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"),
        coalesce(col("max_sh"), lit(0L)).as("max_sh"),
        when(coalesce(col("n_sh"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("max_sh").cast("double") / col("n_sh").cast("double"))
          .as("rep_ratio"))
  }

  val repetitionRatioSql: String =
    """WITH docs AS (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
         FROM documents),
       shl AS (
         SELECT doc_id,
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            for i in generate_series(1, len(w) - 2)] AS shs
         FROM docs WHERE len(w) >= 3),
       sh AS (SELECT doc_id, unnest(shs) AS sh FROM shl),
       per AS (SELECT doc_id, sh, count(*) AS c FROM sh GROUP BY 1, 2),
       agg AS (SELECT doc_id, sum(c) AS n_sh, max(c) AS max_sh
               FROM per GROUP BY 1)
       SELECT d.doc_id,
         CAST(coalesce(a.n_sh, 0) AS BIGINT) AS n_sh,
         CAST(coalesce(a.max_sh, 0) AS BIGINT) AS max_sh,
         CASE WHEN coalesce(a.n_sh, 0) = 0 THEN 0.0
              ELSE CAST(a.max_sh AS DOUBLE) / CAST(a.n_sh AS DOUBLE)
         END AS rep_ratio
       FROM documents d LEFT JOIN agg a USING (doc_id)"""

  /** 3-word shingles of a tokenized column, as an array column (native
    * k-gram expression — the interpreted HOF transform cost ~26 µs per
    * shingle; see [[graft.functions.Shingles]]).
    */
  private def shingles(textCol: org.apache.spark.sql.Column) = {
    val w = regexp_extract_all(textCol, lit(wordPat), lit(0))
    graft.functions.Shingles.word_shingles(w, 3)
  }

  /** Shingle → duplicate-shingle hits: (doc_id, pos) of every k-token
    * shingle that also occurs in at least one OTHER document. The
    * duplicate test is `min(doc_id) < max(doc_id)` per shingle — exact
    * for "≥2 distinct docs" with a plain partial-agg'd hash aggregate,
    * no count-distinct expansion. `hashKeys=true` — now the DEFAULT the
    * declared rows ship (guide §2.3 shuffle fewer bytes: the output
    * carries no shingle text, so hashing the key column is invisible to
    * the result) — shuffles 8-byte xxhash64 keys instead of the shingle
    * strings; the oracle recomputes from the string form and DupSpanSpec
    * pins both forms identical.
    */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr(s"regexp_extract_all(lower(text), '$wordPat', 0)").as("w"))

  private def shingleHits(docs: DataFrame, k: Int,
      hashKeys: Boolean): DataFrame = {
    // posexplode of the native k-gram array: pos is 0-based, the span
    // algebra below is 1-based (slice() convention), hence the +1.
    // The hit set is `sh ⋉ dup(sh)` — TWO consumers of the exploded
    // shingle stream (the dup aggregate and the join probe), both keyed
    // on sh: repartition by sh ONCE into a pinned cache and both read it
    // exchange-free (PlanPin doc; the unpinned plan re-ran the tokenize +
    // explode pass per consumer). The cached rows are (doc_id, pos,
    // 8-byte hash) — the positional proxy of guide §8, never the text.
    val sh = PlanPin.pinned(docs.filter(size(col("w")) >= k)
      .select(col("doc_id"), posexplode(
        graft.functions.Shingles.word_shingles(col("w"), k)).as(Seq("p", "shs")))
      .select(col("doc_id"), (col("p") + 1).cast("long").as("pos"),
        (if (hashKeys) xxhash64(col("shs")) else col("shs")).as("sh"))
      .repartition(col("sh")), "shingleHits:")
    val dup = sh.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") < col("mx")).select("sh")
    sh.join(dup, Seq("sh")).select("doc_id", "pos")
  }

  /** Cross-document duplicate SPANS — exact substring dedup in the style
    * of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better"): token spans ≥ k that occur verbatim in more than
    * one document, as (doc_id, island, span_start, span_end) in 1-based
    * token positions. Suffix arrays are the single-machine tool; the
    * distributed form is shingle-keyed: any shared span of length ≥ k
    * is a run of shared k-shingles, so duplicate-shingle hits merged
    * into maximal islands (gaps-and-islands over a per-doc window,
    * running max of span end) recover exactly the shared spans. Cost
    * shape at 100 TB: one explode (|tokens| rows), one hash agg + one
    * join both keyed on the shingle (8-byte hashed in the scale form),
    * one per-doc window over hit positions only (hits ≪ tokens on a
    * healthy corpus). Document-internal repeats are NOT flagged (the
    * min<max test is cross-doc, matching the dedup use case).
    */
  def dupSpans(s: SparkSession, d: String,
      hashKeys: Boolean = true): DataFrame =
    dupSpansOver(Tables.documents(s, d), 8, hashKeys)

  /** [[dupSpans]] over any (doc_id, text) frame — the composable form. */
  def dupSpansOver(rawDocs: DataFrame, k: Int = 8,
      hashKeys: Boolean = false): DataFrame = {
    val hits = shingleHits(tokenized(rawDocs), k, hashKeys)
    val wprev = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wrun = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hits
      .withColumn("b", when(col("pos") <=
          coalesce(max(col("pos") + lit(k - 1)).over(wprev), lit(-1L)), 0L)
        .otherwise(1L))
      .withColumn("island", sum(col("b")).over(wrun))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"),
        count(lit(1)).as("n_shingles"))
  }

  private val dupSpansCtes: String =
    """WITH docs AS (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
         FROM documents),
       shl AS (
         SELECT doc_id,
           [struct_pack(pos := i, sh := array_to_string(w[i:i+7], ' '))
            for i in generate_series(1, len(w) - 7)] AS shs
         FROM docs WHERE len(w) >= 8),
       sh AS (SELECT doc_id, unnest(shs, recursive := true) FROM shl),
       dup AS (SELECT sh FROM sh GROUP BY sh HAVING min(doc_id) < max(doc_id)),
       hits AS (SELECT s.doc_id, s.pos FROM sh s JOIN dup d ON s.sh = d.sh),
       brk AS (
         SELECT doc_id, pos,
           CASE WHEN pos <= coalesce(max(pos + 7) OVER
             (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
           THEN 0 ELSE 1 END AS b
         FROM hits),
       isl AS (
         SELECT doc_id, pos,
           sum(b) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         FROM brk)"""

  val dupSpansSql: String = dupSpansCtes +
    """
       SELECT doc_id, CAST(island AS BIGINT) AS island,
         min(pos) AS span_start, max(pos) + 7 AS span_end,
         count(*) AS n_shingles
       FROM isl GROUP BY doc_id, island"""

  /** Duplicate-span REMOVAL: every token inside a cross-document
    * duplicate span is dropped from every document (the simplification
    * of Lee et al.'s remove-all-but-one that keeps the operator a pure
    * function of the span set), and the survivors re-join to
    * `clean_text`. Documents left with zero tokens disappear — the
    * boilerplate-only-doc outcome. The span list per doc is tiny
    * (collect_list of merged islands), so the strip itself is a narrow
    * nested-lambda projection: tokens-with-index `transform`, span
    * containment `exists`, `array_join` — no explode, no second pass
    * over the corpus.
    */
  def stripSpans(s: SparkSession, d: String): DataFrame =
    stripSpansOver(Tables.documents(s, d), 8)

  /** [[stripSpans]] over any (doc_id, text) frame. */
  def stripSpansOver(rawDocs: DataFrame, k: Int = 8,
      hashKeys: Boolean = true): DataFrame = {
    val docs = tokenized(rawDocs)
    val spans = dupSpansOver(rawDocs, k, hashKeys).groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    val noSpans = array().cast("array<struct<span_start:bigint,span_end:bigint>>")
    val inSpan = (e: Column) => exists(col("spans"),
      sp => e.getField("i") >= sp.getField("span_start") &&
        e.getField("i") <= sp.getField("span_end"))
    docs.join(spans, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"), noSpans))
      .select(col("doc_id"), filter(
        transform(col("w"), (t, i) =>
          struct((i + 1).cast("long").as("i"), t.as("t"))),
        e => !inSpan(e)).as("kept"))
      .filter(size(col("kept")) > 0)
      .select(col("doc_id"),
        array_join(transform(col("kept"), e => e.getField("t")), " ")
          .as("clean_text"))
  }

  val stripSpansSql: String = dupSpansCtes +
    """,
       spans AS (
         SELECT doc_id, min(pos) AS lo, max(pos) + 7 AS hi
         FROM isl GROUP BY doc_id, island),
       toks AS (
         SELECT doc_id, unnest([struct_pack(i := i, t := w[i])
           for i in generate_series(1, len(w))], recursive := true)
         FROM docs)
       SELECT tk.doc_id, string_agg(tk.t, ' ' ORDER BY tk.i) AS clean_text
       FROM toks tk
       WHERE NOT EXISTS (SELECT 1 FROM spans s
                         WHERE s.doc_id = tk.doc_id
                           AND tk.i BETWEEN s.lo AND s.hi)
       GROUP BY 1"""

  /** Test-set DECONTAMINATION — the eval-leakage gate every training-data
    * pipeline runs before a corpus ships: flag training documents sharing
    * any verbatim k-token shingle (k = 8, the dup-span threshold) with a
    * held-out benchmark set. Benchmark membership is content-derived
    * (first md5 nibble = '0', ~1/16 of docs) so the rule is deterministic
    * and oracle-reproducible. Scale shape: the benchmark shingle set is
    * eval-corpus-sized — tiny next to 100 TB of training data — so it
    * BROADCASTS and the training side never shuffles: one narrow shingle
    * explode, a broadcast left-semi probe, one partial-agg'd count per
    * doc. Contaminated-shingle counts are per-distinct-shingle (a doc
    * repeating one leaked phrase counts it once).
    */
  def decontaminate(s: SparkSession, d: String): DataFrame =
    decontaminateOver(Tables.documents(s, d))

  /** [[decontaminate]] over any (doc_id, text) frame. `benchNibbles`
    * deepens the content-derived membership rule (1 nibble ⇒ ~1/16 of
    * docs are benchmark, n nibbles ⇒ 16^-n) — at corpus scale the
    * benchmark must stay eval-sized for the broadcast design to hold.
    */
  def decontaminateOver(rawDocs: DataFrame, k: Int = 8,
      benchNibbles: Int = 1): DataFrame = {
    val docs = rawDocs.select(col("doc_id"),
      expr(s"regexp_extract_all(lower(text), '$wordPat', 0)").as("w"),
      (substring(md5(col("text").cast("binary")), 1, benchNibbles)
        === "0" * benchNibbles).as("is_bench"))
    def sh(df: DataFrame) = df.filter(size(col("w")) >= k)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.Shingles.word_shingles(col("w"), k))).as("sh"))
    val bench = sh(docs.filter(col("is_bench"))).select("sh").distinct()
    val hits = sh(docs.filter(!col("is_bench")))
      .join(broadcast(bench), Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contam"))
    docs.filter(!col("is_bench")).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_contam"), lit(0L)).as("n_contam"),
        (coalesce(col("n_contam"), lit(0L)) > 0).as("is_contam"))
  }

  // tokenized() strips punctuation, so re-tokenizing from raw text in the
  // oracle matches; docs with < 8 tokens shingle to nothing on both sides
  val decontaminateSql: String =
    """WITH docs AS (
         SELECT doc_id, substr(md5(text), 1, 1) = '0' AS is_bench,
                regexp_extract_all(lower(text), '[a-z0-9]+') AS w
         FROM documents),
       shl AS (
         SELECT doc_id, is_bench,
           list_distinct([array_to_string(w[i:i+7], ' ')
                          for i in generate_series(1, len(w) - 7)]) AS shs
         FROM docs WHERE len(w) >= 8),
       sh AS (SELECT doc_id, is_bench, unnest(shs) AS sh FROM shl),
       bench AS (SELECT DISTINCT sh FROM sh WHERE is_bench),
       hits AS (
         SELECT c.doc_id, count(*) AS n
         FROM sh c JOIN bench b USING (sh) WHERE NOT c.is_bench GROUP BY 1)
       SELECT d.doc_id,
         CAST(coalesce(h.n, 0) AS BIGINT) AS n_contam,
         coalesce(h.n, 0) > 0 AS is_contam
       FROM docs d LEFT JOIN hits h USING (doc_id)
       WHERE NOT d.is_bench"""

  /** Overlapping CHUNKING — the RAG / embedding-prep operator: split each
    * document's token stream into windows of `win` tokens advancing by
    * `stride` (overlap = win − stride keeps context across boundaries).
    * Chunk i covers tokens [i·stride+1, i·stride+win]; the final chunk is
    * short rather than padded; empty docs emit nothing. Entirely narrow —
    * one lambda-built array + posexplode per row, no shuffle, no join —
    * so it runs at scan speed on 100 TB.
    */
  def chunkOverlap(s: SparkSession, d: String,
      win: Int = 64, stride: Int = 48): DataFrame =
    chunkOverlapOver(Tables.documents(s, d), win, stride)

  /** [[chunkOverlap]] over any (doc_id, text) frame. */
  def chunkOverlapOver(rawDocs: DataFrame,
      win: Int = 64, stride: Int = 48): DataFrame = {
    require(win > 0 && stride > 0 && stride <= win,
      s"need 0 < stride <= win, got win=$win stride=$stride")
    val docs = tokenized(rawDocs)
    val n = size(col("w"))
    // 1 + ceil(max(0, n - win) / stride), integer-exact in double.
    // Empty docs are filtered OUT first, not special-cased to 0 chunks:
    // Spark's sequence(0, n-1) DESCENDS for n = 0 (sequence(0,-1) =
    // [0,-1]) and would emit two phantom empty chunks.
    val nChunks = lit(1) + floor((greatest(n - lit(win), lit(0)) +
      lit(stride - 1)).cast("double") / lit(stride)).cast("int")
    docs.filter(n > 0)
      .select(col("doc_id"), col("w"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(col("w"), i * stride + 1, lit(win)))).as(Seq("ci", "toks")))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_idx"),
        size(col("toks")).cast("long").as("n_chunk_toks"),
        array_join(col("toks"), " ").as("chunk_text"))
  }

  val chunkOverlapSql: String =
    """WITH docs AS (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
         FROM documents),
       nc AS (
         SELECT doc_id, w,
           CASE WHEN len(w) = 0 THEN 0
                ELSE 1 + (greatest(len(w) - 64, 0) + 47) // 48 END AS n_chunks
         FROM docs),
       ch AS (
         SELECT doc_id, w, unnest(generate_series(0, n_chunks - 1)) AS ci
         FROM nc WHERE n_chunks > 0)
       SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
         CAST(len(w[ci*48+1 : ci*48+64]) AS BIGINT) AS n_chunk_toks,
         array_to_string(w[ci*48+1 : ci*48+64], ' ') AS chunk_text
       FROM ch"""

  /** Vocabulary build + token-id ENCODING — the two-phase tokenize step of
    * a training pipeline: (1) global top-`vocabSize` terms by (count DESC,
    * term ASC), id = dense rank from 1; (2) each document's first
    * `maxLen` tokens encoded to ids, out-of-vocabulary → 0. The vocabulary
    * is vocabulary-sized however big the corpus, so phase 2 is a BROADCAST
    * left join against a narrow posexplode — the corpus never shuffles;
    * phase 1 is one partial-agg'd term count + a driver-bounded top-V
    * (TakeOrderedAndProject, vocabSize rows cross the wire).
    */
  def vocabEncode(s: SparkSession, d: String,
      vocabSize: Int = 256, maxLen: Int = 32): DataFrame =
    vocabEncodeOver(Tables.documents(s, d), vocabSize, maxLen)

  /** [[vocabEncode]] over any (doc_id, text) frame. */
  def vocabEncodeOver(rawDocs: DataFrame,
      vocabSize: Int = 256, maxLen: Int = 32): DataFrame = {
    val docs = tokenized(rawDocs)
    val vocab = docs.select(explode(col("w")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(vocabSize)
      .withColumn("token_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("term").asc)).cast("long"))
      .select(col("term"), col("token_id"))
    docs.select(col("doc_id"),
        posexplode(slice(col("w"), 1, maxLen)).as(Seq("p", "term")))
      .join(broadcast(vocab), Seq("term"), "left")
      .select(col("doc_id"), (col("p") + 1).cast("long").as("pos"),
        col("term"), coalesce(col("token_id"), lit(0L)).as("token_id"))
  }

  val vocabEncodeSql: String =
    """WITH docs AS (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
         FROM documents),
       tok AS (SELECT unnest(w) AS term FROM docs),
       vocab AS (
         SELECT term, CAST(row_number() OVER (ORDER BY cnt DESC, term ASC)
                AS BIGINT) AS token_id
         FROM (SELECT term, count(*) AS cnt FROM tok GROUP BY 1)
         QUALIFY token_id <= 256),
       enc AS (
         SELECT doc_id, unnest([struct_pack(pos := i, term := w[i])
           for i in generate_series(1, least(len(w), 32))],
           recursive := true)
         FROM docs)
       SELECT e.doc_id, CAST(e.pos AS BIGINT) AS pos, e.term,
              coalesce(v.token_id, 0) AS token_id
       FROM enc e LEFT JOIN vocab v USING (term)"""

  /** Higher-order array functions — the array half of the scalar-fn
    * surface (SURVEY §2.2): tokenize once, then `filter` / `transform` /
    * `slice` / `aggregate` / `exists` over the token array. All five are
    * codegen'd lambda expressions evaluated per row with NO explode — a
    * pure narrow projection (no shuffle, no row multiplication), where
    * the explode+groupBy formulation of the same answers would shuffle
    * |tokens| rows per document.
    */
  def hofFns(s: SparkSession, d: String): DataFrame = {
    val toks = filter(split(col("text"), " ", -1), t => length(t) > 0)
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).cast("long").as("n_toks"),
      size(filter(toks, t => length(t) > 4)).cast("long").as("n_long"),
      array_join(transform(slice(toks, 1, 3), t => upper(t)), "|")
        .as("head3_up"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .as("tok_chars"),
      exists(toks, t => t === "the").as("has_the"))
  }

  val hofFnsSql: String =
    """WITH t AS (SELECT doc_id,
         list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
       FROM documents)
       SELECT doc_id,
         len(toks) AS n_toks,
         len(list_filter(toks, x -> length(x) > 4)) AS n_long,
         array_to_string(list_transform(toks[1:3], x -> upper(x)), '|')
           AS head3_up,
         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
           AS BIGINT) AS tok_chars,
         list_contains(toks, 'the') AS has_the
       FROM t"""

  val ngramJaccardSql: String =
    """WITH docs AS (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
         FROM documents WHERE doc_id < 300),
       shl AS (
         SELECT doc_id,
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            for i in generate_series(1, len(w) - 2)] AS shs
         FROM docs WHERE len(w) >= 3),
       sh AS (SELECT DISTINCT doc_id, unnest(shs) AS sh FROM shl),
       sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT doc_a, doc_b, inter, sa.n_sh AS n_a, sb.n_sh AS n_b
       FROM pairs
       JOIN sizes sa ON sa.doc_id = doc_a
       JOIN sizes sb ON sb.doc_id = doc_b
       WHERE inter * 2 >= sa.n_sh + sb.n_sh - inter"""
}
