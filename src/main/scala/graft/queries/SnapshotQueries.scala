package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** znap's core dataflow operators (SURVEY.md §2.1) expressed over the
  * driver's `events` table, where `user_id` plays the conv_id / snapshot-key
  * role and `(ts, event_id)` is the per-key total order (znap: per-partition
  * offset order, reference pipeline/PipelineBuilder.scala:106-111).
  *
  * Every query here is a single declarative plan: filters/projections reach
  * the parquet scan (PushedFilters / ReadSchema), the snapshot "fold" is one
  * hash aggregation with map-side partial combine — the shape that scales to
  * 10^12 rows on a real cluster (one shuffle on the snapshot key, nothing on
  * the driver).
  */
object SnapshotQueries {

  /** A1 — last-writer-wins snapshot: latest event per key.
    * One ObjectHashAggregate with the native
    * `latest_by(struct(...), ts, event_id)` (functions/LatestBy.scala —
    * the max_by(struct, struct) form planned SortAggregate); partial
    * aggregation runs before the shuffle, so per-key data crossing
    * the wire is O(distinct keys), not O(rows)
    * (reference semantics: DynamoDBEventsWriter.scala:36-47).
    */
  def a1SnapshotLatest(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).groupBy(col("user_id")).agg(
      graft.functions.GraftFunctions.latest_by(
        struct(col("event_id"), col("event_type"), col("value"), col("ts")),
        col("ts"), col("event_id")).as("last"))
      .select(
        col("user_id"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        col("last.value").as("last_value"),
        unix_micros(col("last.ts")).as("last_ts_us"))

  val a1SnapshotLatestSql: String =
    """SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       value AS last_value,
       epoch_us(ts) AS last_ts_us
       FROM (SELECT *, row_number() OVER
               (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1"""

  /** A1 full fold — latest state plus counters (our ConvSnapshot shape:
    * FIXTURES.md §2). Decimal-exact sum cast to double for oracle parity.
    */
  def a1SnapshotFold(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).groupBy(col("user_id")).agg(
      graft.functions.GraftFunctions.latest_by(
        struct(col("event_id"), col("event_type")),
        col("ts"), col("event_id")).as("last"),
      count(lit(1)).as("event_count"),
      min(unix_micros(col("ts"))).as("first_ts_us"),
      max(unix_micros(col("ts"))).as("last_ts_us"),
      sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(
        col("user_id"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_event_type"),
        col("event_count"), col("first_ts_us"), col("last_ts_us"),
        col("value_sum"))

  val a1SnapshotFoldSql: String =
    """WITH ranked AS (
         SELECT *, row_number() OVER
           (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         FROM events),
       agg AS (
         SELECT user_id, count(*) AS event_count,
                min(epoch_us(ts)) AS first_ts_us,
                max(epoch_us(ts)) AS last_ts_us,
                CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
         FROM events GROUP BY user_id)
       SELECT a.user_id, r.event_id AS last_event_id,
              r.event_type AS last_event_type,
              a.event_count, a.first_ts_us, a.last_ts_us, a.value_sum
       FROM agg a JOIN ranked r ON a.user_id = r.user_id AND r.rn = 1"""

  /** F1 — per-target predicate filter (set membership + range), pushed into
    * the parquet scan by Catalyst (reference: PipelineBuilder.scala:186-198,
    * single-field `isin` filter).
    */
  def f1Filter(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type").isin("signup", "purchase") && col("value") >= 100.0)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  val f1FilterSql: String =
    """SELECT event_id, user_id, event_type, value FROM events
       WHERE event_type IN ('signup','purchase') AND value >= 100.0"""

  /** P1 — key extraction by JSON path (reference: utils/Json.scala:49-53
    * folds a field path into the JSON body; here `props` is the JSON-carrying
    * column).
    */
  def p1KeyExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("prop_k"))

  val p1KeyExtractSql: String =
    """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
       FROM events"""

  /** S2 — JSON decode (reference line framing + Jackson parse,
    * NakadiPublisher.scala:175-186): `from_json` with an explicit schema —
    * schema-on-read for the JSON-carrying column.
    */
  def s2JsonDecode(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))).getField("k").as("decoded_k"))

  val s2JsonDecodeSql: String =
    """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS decoded_k
       FROM events"""

  /** Q1 — snapshot point lookup (reference: restapi/RestApi.scala:95-119 →
    * consistent getItem). Partition-pruned scan + the same latest-per-key agg
    * restricted to one key.
    */
  def q1PointLookup(s: SparkSession, d: String): DataFrame =
    a1SnapshotLatest(s, d).filter(col("user_id") === 7L)

  val q1PointLookupSql: String =
    """SELECT user_id, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value,
       epoch_us(ts) AS last_ts_us
       FROM (SELECT *, row_number() OVER
               (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             FROM events WHERE user_id = 7) WHERE rn = 1"""

  /** D1 — dump: full key-set scan with projection pushdown (reference:
    * service/SnapshotService.scala:90-99 requests only the key attribute;
    * here Catalyst column pruning reads a single parquet column).
    */
  def d1DumpKeys(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("user_id").as("conv_key")).distinct()

  val d1DumpKeysSql: String =
    "SELECT DISTINCT user_id AS conv_key FROM events"

  /** Replay-to-timestamp — snapshot state "as of T" (znap's point-in-time is
    * offset-based; ours is event-time, SURVEY.md §2.2 window-functions row).
    */
  def replayToTs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("ts") <= lit("2024-01-15 00:00:00").cast("timestamp"))
      .groupBy(col("user_id")).agg(
        graft.functions.GraftFunctions.latest_by(struct(col("event_id")),
          col("ts"), col("event_id")).getField("event_id").as("last_event_id"),
        count(lit(1)).as("event_count"))

  val replayToTsSql: String =
    """WITH f AS (SELECT * FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'),
       r AS (SELECT user_id, event_id, row_number() OVER
               (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM f),
       n AS (SELECT user_id, count(*) AS event_count FROM f GROUP BY user_id)
       SELECT n.user_id, r.event_id AS last_event_id, n.event_count
       FROM n JOIN r ON n.user_id = r.user_id AND r.rn = 1"""

  /** G2 — signalling side-output: per changed key, a deterministic payload in
    * each publish mode (reference: PipelineBuilder.scala:219-246, publish
    * types keys-only / events; SnapshotPipeline.scala:51-56). Payload built
    * with engine-neutral string ops so the oracle can replicate it.
    */
  def g2Signals(s: SparkSession, d: String): DataFrame =
    a1SnapshotLatest(s, d).select(
      col("user_id").as("conv_key"),
      lit("events").as("publish_type"),
      concat_ws(":", col("last_event_type"), col("last_event_id").cast("string"))
        .as("payload"))

  val g2SignalsSql: String =
    """SELECT user_id AS conv_key, 'events' AS publish_type,
       event_type || ':' || CAST(event_id AS VARCHAR) AS payload
       FROM (SELECT *, row_number() OVER
               (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1"""

  /** G1 — multi-target fan-out: one source drives N filtered targets
    * (reference: PipelineBuilder.scala:154-184). Expressed as one scan
    * feeding two per-target snapshot folds, unioned with a target tag; Spark
    * reuses the scan via plan-level reuse/caching — no second read at scale.
    */
  def g1Fanout(s: SparkSession, d: String): DataFrame = {
    val src = Tables.events(s, d)
    def target(tag: String, types: Seq[String]): DataFrame =
      src.filter(col("event_type").isin(types: _*))
        .groupBy(col("user_id")).agg(
          graft.functions.GraftFunctions.latest_by(struct(col("event_id")),
            col("ts"), col("event_id")).getField("event_id").as("last_event_id"),
          count(lit(1)).as("n"))
        .select(lit(tag).as("target"), col("user_id"), col("last_event_id"), col("n"))
    target("commerce", Seq("purchase", "refund"))
      .unionByName(target("auth", Seq("signup", "login")))
  }

  val g1FanoutSql: String =
    """WITH c AS (SELECT * FROM events WHERE event_type IN ('purchase','refund')),
       cr AS (SELECT user_id, event_id, row_number() OVER
                (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM c),
       cn AS (SELECT user_id, count(*) AS n FROM c GROUP BY user_id),
       a AS (SELECT * FROM events WHERE event_type IN ('signup','login')),
       ar AS (SELECT user_id, event_id, row_number() OVER
                (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM a),
       an AS (SELECT user_id, count(*) AS n FROM a GROUP BY user_id)
       SELECT 'commerce' AS target, cn.user_id, cr.event_id AS last_event_id, cn.n
       FROM cn JOIN cr ON cn.user_id = cr.user_id AND cr.rn = 1
       UNION ALL
       SELECT 'auth' AS target, an.user_id, ar.event_id AS last_event_id, an.n
       FROM an JOIN ar ON an.user_id = ar.user_id AND ar.rn = 1"""
}
