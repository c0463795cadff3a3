package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs AFTER filtering
  * and dedup, when the surviving corpus is ordered and mixed for the
  * trainer. Both are deterministic functions of the data (md5-keyed, no
  * rand()) so every run — and the DuckDB oracle — produces the identical
  * sample/permutation, which is what makes a 100 TB data build auditable
  * and resumable.
  */
object CurationQueries {

  /** Deterministic epoch shuffle: a pseudo-random global permutation of
    * the corpus, materialized as (shard, pos) — the write layout a trainer
    * streams shard-by-shard. The permutation key is md5(doc_id, epoch
    * salt): changing the salt is a fresh epoch order, and no `rand()`
    * means re-runs and failure-retried partitions produce the SAME order
    * (non-deterministic shuffles break Spark task retry semantics — a
    * recomputed partition would sample differently).
    *
    * Scale shape: ONE hash exchange on the shard prefix + an in-shard
    * sort — exactly the physical work `write.partitionBy(shard)` needs
    * anyway, so ordering the corpus costs nothing beyond the shard write
    * itself. 256 shards here; at 100 TB widen the prefix (4 hex chars =
    * 64 Ki shards) so each shard stays executor-memory-sized.
    */
  def epochShuffle(s: SparkSession, d: String): DataFrame = {
    val keyed = Tables.documents(s, d).select(
      col("doc_id"),
      md5(concat(col("doc_id").cast("string"), lit(":epoch1"))).as("ord_key"))
    val shard = substring(col("ord_key"), 1, 2)
    keyed
      .withColumn("shard", shard)
      .withColumn("pos", row_number()
        .over(Window.partitionBy(shard).orderBy(col("ord_key"), col("doc_id")))
        .cast("long"))
      .select("doc_id", "shard", "pos")
  }

  val epochShuffleSql: String =
    """WITH k AS (SELECT doc_id,
                    md5(CAST(doc_id AS VARCHAR) || ':epoch1') AS ord_key
                  FROM documents)
       SELECT doc_id, substr(ord_key, 1, 2) AS shard,
              row_number() OVER (PARTITION BY substr(ord_key, 1, 2)
                                 ORDER BY ord_key, doc_id) AS pos
       FROM k"""

  /** Temperature-based source mixing (the multi-source sampling step of
    * every corpus build): downsample each source so the surviving mixture
    * is proportional to n_i^τ (τ = 0.5 — upweights rare sources; the
    * rarest source survives whole, commoner sources keep
    * (n_min/n_i)^(1-τ) of their docs). Acceptance is md5-bucketed
    * (4096 buckets, lexical hex compare — hex strings sort like their
    * values), so the sample is a deterministic per-doc predicate, not a
    * rand() draw: reproducible across runs, retries, and engines.
    *
    * Scale shape: the per-source rate table is a tiny aggregate
    * (|sources| rows) broadcast onto the corpus — the corpus itself
    * never shuffles; the filter is one codegen'd predicate per row.
    */
  def mixtureSample(s: SparkSession, d: String): DataFrame =
    mixtureSampleOver(Tables.documents(s, d))

  /** [[mixtureSample]] over an arbitrary (doc_id, source) frame. The
    * keep-bucket count is floored at 1: without it, a source more than
    * 4096² ≈ 16.8M× larger than the rarest quantizes to k = 0 and the
    * DOMINANT source vanishes from the mixture — at extreme skew the
    * floor deviates from the pure n^τ law (keeps 1/4096 instead of ~0)
    * but never silently deletes a source.
    */
  def mixtureSampleOver(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val nMin = counts.agg(min(col("n")).as("n_min"))
    val rates = counts.crossJoin(broadcast(nMin)).select(
      col("source"),
      greatest(lit(1L), floor(lit(4096) * sqrt(col("n_min").cast("double") /
        col("n").cast("double")))).as("k"))
    docs.join(broadcast(rates), Seq("source"))
      .where(col("k") >= 4096 ||
        substring(md5(concat(col("doc_id").cast("string"), lit(":mix"))), 1, 3) <
          lpad(lower(hex(least(col("k"), lit(4095L)))), 3, "0"))
      .select(col("doc_id"), col("source"))
  }

  val mixtureSampleSql: String =
    """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
       m AS (SELECT min(n) AS n_min FROM c),
       r AS (SELECT source,
               greatest(1, floor(4096 * sqrt(CAST(m.n_min AS DOUBLE) / CAST(c.n AS DOUBLE)))) AS k
             FROM c, m)
       SELECT d.doc_id, d.source
       FROM documents d JOIN r ON d.source = r.source
       WHERE r.k >= 4096
          OR substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 3) <
             lpad(lower(to_hex(CAST(least(r.k, 4095) AS BIGINT))), 3, '0')"""
}
