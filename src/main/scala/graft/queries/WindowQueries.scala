package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregates (SURVEY.md §2.2 "streaming: windows" —
  * NEW per north rule; the reference has no time windows, its point-in-time
  * is offset-based). These run identically in batch and as streaming
  * `groupBy(window(...))` aggregations (WindowedAggs reuses the same
  * builders); the batch form is what the DuckDB oracle checks.
  *
  * Window starts are emitted as epoch seconds (BIGINT) so oracle comparison
  * is timezone- and format-proof.
  */
object WindowQueries {

  /** Tumbling 5-minute window: turn-rate + distinct-key cardinality. */
  def w1Tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .select(unix_seconds(col("window.start")).as("window_start_s"),
        col("n_events"), col("n_users"))

  val w1TumblingSql: String =
    """SELECT CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS window_start_s,
       count(*) AS n_events, count(DISTINCT user_id) AS n_users
       FROM events GROUP BY 1"""

  /** Sliding window 10 min / slide 5 min: each event lands in 2 windows.
    * Spark assigns an event at time t to starts {floor(t/s)*s - k*s}
    * for k in [0, w/s) with start > t - w.
    */
  def w2Sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_seconds(col("window.start")).as("window_start_s"), col("n_events"))

  val w2SlidingSql: String =
    """SELECT window_start_s, count(*) AS n_events FROM (
         SELECT unnest([CAST(floor(epoch(ts)/300)*300 AS BIGINT),
                        CAST(floor(epoch(ts)/300)*300 - 300 AS BIGINT)])
                AS window_start_s
         FROM events) GROUP BY 1"""

  /** Session window, 30-minute gap, per key (north rule: session windows
    * gap on ts). Spark semantics: session end = last event ts + gap; two
    * events merge iff ts2 - ts1 < gap. Oracle replicates via
    * gaps-and-islands.
    */
  def w3Session(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))

  val w3SessionSql: String =
    """WITH flagged AS (
         SELECT user_id, ts,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
         FROM events),
       sessions AS (
         SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM flagged)
       SELECT user_id,
         epoch_us(min(ts)) AS session_start_us,
         epoch_us(max(ts) + INTERVAL '30 minutes') AS session_end_us,
         count(*) AS n_events
       FROM sessions GROUP BY user_id, session_id"""

  /** Windowed tool-usage aggregate (FIXTURES.md §5): hourly × event_type
    * counts and exact value sums.
    */
  def w4ToolUsage(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(unix_seconds(col("hour_ts")).as("hour_s"), col("event_type"),
        col("n"), col("value_sum"))

  val w4ToolUsageSql: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_s,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       FROM events GROUP BY 1, 2"""
}
