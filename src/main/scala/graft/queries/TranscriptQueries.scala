package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transcript → training-sample construction (task brief §2.3: the ops a
  * large-scale training-data pipeline needs on top of the reference's
  * surface). Both run on the events-as-turns mapping used by the s1
  * pipeline, so their oracles share its fixture semantics.
  */
object TranscriptQueries {

  /** Assemble each conversation into ONE ordered training document:
    * collect_list(struct(turn_idx, text)) → array_sort → join. Single
    * conv_id-keyed shuffle with map-side partial collect; per-group state
    * is bounded by conversation length (the hot-conversation bound is the
    * documented cost of sample assembly — a 20k-turn transcript IS a
    * 20k-element array wherever it is assembled). array_sort on the
    * struct orders by turn_idx (first field), so assembly order is total
    * and deterministic.
    */
  def assembleConvs(s: SparkSession, d: String): DataFrame =
    StreamQueries.eventsAsTurns(s, d)
      .groupBy(col("conv_id"))
      .agg(
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("turn_idx"), col("text")))),
            x => x.getField("text"))).as("doc"),
        count(lit(1)).as("n_turns"))
      .select(col("conv_id"), col("doc"), col("n_turns"),
        length(col("doc")).cast("long").as("n_chars"))

  val assembleConvsSql: String =
    """SELECT CAST(user_id AS VARCHAR) AS conv_id,
       string_agg(props, chr(10) ORDER BY event_id) AS doc,
       count(*) AS n_turns,
       length(string_agg(props, chr(10) ORDER BY event_id)) AS n_chars
       FROM events GROUP BY user_id"""

  /** Skew path for assembly: a hot conversation (20k+ turns) makes the
    * single-phase collect_list one reducer's problem. Two-phase salted
    * form: phase 1 collects per (conv_id, salt) — a hot conversation's
    * turns spread over `salts` reducers with 1/salts of the state each —
    * phase 2 merges the ≤`salts` partial arrays per conversation and
    * sorts once. The FINAL document is still one object (inherent to the
    * op); what salting bounds is per-reducer collect state and shuffle
    * skew, mirroring skew/Salting's aggregation argument. Output is
    * byte-identical to [[assembleConvs]] (array_sort over the flattened
    * parts restores total turn order) — TranscriptSpec proves it on a
    * hot-conversation corpus.
    */
  def assembleConvsSalted(turns: DataFrame, salts: Int): DataFrame =
    turns
      .withColumn("__salt", pmod(hash(col("turn_idx")), lit(salts)))
      .groupBy(col("conv_id"), col("__salt"))
      .agg(collect_list(struct(col("turn_idx"), col("text"))).as("part"))
      .groupBy(col("conv_id"))
      .agg(
        concat_ws("\n",
          transform(array_sort(flatten(collect_list(col("part")))),
            x => x.getField("text"))).as("doc"),
        sum(size(col("part"))).as("n_turns"))
      .select(col("conv_id"), col("doc"), col("n_turns"),
        length(col("doc")).cast("long").as("n_chars"))

  /** Sliding context windows (next-turn-prediction samples): every turn
    * paired with the concatenation of its previous k−1 turns — ONE keyed
    * window pass with a bounded ROWS frame, so per-row state is O(k)
    * regardless of conversation length (contrast with assembling whole
    * conversations). The unit-separator join makes the value a plain
    * string both engines hash identically.
    */
  def contextWindows(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(-(k - 1), 0)
    StreamQueries.eventsAsTurns(s, d)
      .select(col("conv_id"), col("turn_idx").cast("long").as("turn_idx"),
        concat_ws("\u001f", collect_list(col("text")).over(w)).as("context"))
  }

  val contextWindowsSql: String =
    """SELECT CAST(user_id AS VARCHAR) AS conv_id, event_id AS turn_idx,
       string_agg(props, chr(31)) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS context
       FROM events"""

  /** Deterministic train/val/test split: assignment from the first two
    * hex chars of md5(doc_id) against fixed thresholds (≈90/5/5) — pure
    * per-row projection (no shuffle), reproducible across runs, engines,
    * and cluster sizes, and independent of row order (the property a
    * random() split lacks). Same recipe as the stratified sampler's
    * md5 ranking.
    */
  def datasetSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 2).as("h"))
      .select(col("doc_id"),
        when(col("h") < "e6", "train")
          .when(col("h") < "f3", "val")
          .otherwise("test").as("split"))

  val datasetSplitSql: String =
    """SELECT doc_id,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
            ELSE 'test' END AS split
       FROM documents"""

  /** Sequence packing (pretraining concat-and-chunk): documents are
    * concatenated into per-shard token streams and cut into fixed-budget
    * chunks — each doc gets (shard, stream offset, chunk id). Sharding
    * (`doc_id mod nShards`) is what makes this scale: the
    * running-offset window sorts WITHIN a shard, never globally, exactly
    * how production packing shards the corpus; determinism comes from the
    * (doc_id) order within each shard. Chunk id =
    * floor(exclusive-prefix-sum / budget): documents may straddle a chunk
    * boundary — the concat-and-chunk convention (the consumer masks
    * attention at document boundaries), not a bin-packing approximation.
    */
  def packChunks(s: SparkSession, d: String,
      nShards: Int = 8, budget: Long = 4096L): DataFrame =
    packOver(Tables.documents(s, d), nShards, budget)

  /** Packing over any (doc_id, n_chars)-bearing frame — composable with
    * upstream dedup/quality filters (the corpus_build exhibit).
    */
  def packOver(docs: DataFrame,
      nShards: Int = 8, budget: Long = 4096L): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
    docs
      // doc_id mod (not Murmur3): engine-neutral so the oracle computes
      // the same shards; ids are dense so the spread is as uniform
      .select(col("doc_id"), col("n_chars"),
        pmod(col("doc_id"), lit(nShards)).as("shard"))
      .withColumn("stream_off",
        coalesce(sum(col("n_chars")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("shard").cast("int").as("shard"),
        col("stream_off"),
        floor(col("stream_off") / budget).as("chunk_id"))
  }

  /** Oracle SQL parameterized like the query (a hardcoded-constant val
    * would silently go stale against non-default packChunks calls).
    */
  def packChunksSql(nShards: Int = 8, budget: Long = 4096L): String =
    s"""WITH s AS (
         SELECT doc_id, n_chars,
                CAST(((doc_id % $nShards) + $nShards) % $nShards AS INT) AS shard
         FROM documents)
       SELECT doc_id, shard,
         CAST(COALESCE(sum(n_chars) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS stream_off,
         CAST(floor(COALESCE(sum(n_chars) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / $budget) AS BIGINT)
           AS chunk_id
       FROM s"""

  /** Per-turn sessionization (gaps-and-islands): label every turn with
    * its conversation-local session ordinal — a new session starts after
    * a ≥30-minute silence. This is the SEGMENTATION form of the session
    * window (w3 aggregates per session; training pipelines need the
    * per-turn label to split transcripts into samples). One keyed window
    * partition pass computes both the lag-gap flag and its running sum —
    * single shuffle, per-conv sort, no self-join.
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    StreamQueries.eventsAsTurns(s, d)
      // microsecond gap math: fixture timestamps carry fractional seconds,
      // and a whole-second cast disagrees with the oracle's epoch() near
      // the 1800s boundary (diverges at sf0.1) — compare in micros on
      // BOTH sides
      .withColumn("new_session",
        when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
          >= 1800L * 1000000L || lag(col("ts"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("conv_id"), col("turn_idx").cast("long").as("turn_idx"),
        col("session_id"))
  }

  val sessionizeSql: String =
    """WITH t AS (SELECT CAST(user_id AS VARCHAR) AS conv_id,
                         event_id AS turn_idx, ts FROM events),
       flagged AS (
         SELECT conv_id, turn_idx, ts,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  OR lag(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
         FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx))
       SELECT conv_id, turn_idx,
         CAST(sum(new_session) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       FROM flagged"""

  /** Adjacent-turn pair extraction (prompt/response mining): every turn
    * paired with its predecessor in the same conversation where the role
    * CHANGES — the (context, reply) unit a dialogue-training pipeline
    * samples. One keyed window (single shuffle + per-conv sort), no
    * self-join.
    */
  def pairExtract(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    StreamQueries.eventsAsTurns(s, d)
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("prev_text", lag(col("text"), 1).over(w))
      .where(col("prev_role").isNotNull && col("prev_role") =!= col("role"))
      .select(col("conv_id"), col("turn_idx").cast("long").as("turn_idx"),
        col("prev_role"), col("role"), col("prev_text"), col("text"))
  }

  val pairExtractSql: String =
    """SELECT conv_id, turn_idx, prev_role, role, prev_text, text FROM (
         SELECT CAST(user_id AS VARCHAR) AS conv_id, event_id AS turn_idx,
                event_type AS role, props AS text,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_role,
                lag(props) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_text
         FROM events)
       WHERE prev_role IS NOT NULL AND prev_role <> role"""
}
