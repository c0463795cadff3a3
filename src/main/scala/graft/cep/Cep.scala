package graft.cep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch CEP: sequence-pattern detection over keyed, time-ordered event
  * streams — the MATCH_RECOGNIZE / Flink-CEP surface re-expressed as
  * Catalyst window functions (the reference's signalling consumers do
  * this imperatively per shard; reference pipeline/PipelineBuilder.scala:219-246
  * is the hook where such detectors attach).
  *
  * Two contiguity modes, each mapped to the plan shape that scales:
  *
  *  - STRICT ([[matchStrict]]): steps must be adjacent in the per-key
  *    (ts, idx) order. One window pass — step predicates are evaluated
  *    once per row as booleans and the BOOLEANS are led, so a k-step
  *    pattern is k-1 `lead`s over a single sort, whole-stage-codegen'd,
  *    one shuffle on the key, no self-joins. All match anchors are
  *    emitted (all-matches / no after-match skip), which is what makes
  *    the streaming NFA ([[CepStream]]) bit-equal.
  *
  *  - RELAXED ([[funnel]]): classic followed-by funnel — the FIRST
  *    completion of each step after the previous one, within a horizon
  *    anchored at step 1. Chained conditional window-mins over the same
  *    unordered key partition: k windows but ONE Exchange (all share the
  *    key partitioning; Catalyst stacks the Window execs without
  *    re-shuffling), no joins, no explode.
  *
  * State bound at 100 TB: strict is O(pattern length) per row in one
  * sort; funnel is O(1) per row per step. Neither materializes per-key
  * event lists, so a 20k-turn hot conversation costs its sort share and
  * nothing more (contrast TranscriptQueries.assembleConvs, where the
  * whole-document output IS the op).
  */
object Cep {

  /** One pattern step: a name (for documentation / output labelling) and
    * a row predicate evaluated against the event frame's columns.
    */
  final case class Step(name: String, pred: Column)

  /** Strict-contiguity matches of `steps` within each `key` group in
    * (`ts`, `idx`) order. Emits one row per match anchor with the matched
    * ids, anchor timestamp, and last-step timestamp (both in micros).
    *
    * `withinUs`: event-time span bound — a match must satisfy
    * last.ts − first.ts ≤ withinUs (inclusive, mirroring the streaming
    * finalization rule in [[CepStream]]).
    *
    * Output: key, ids: array<long> (one per step, in step order),
    * start_ts_us, end_ts_us.
    */
  def matchStrict(df: DataFrame, key: Column, ts: Column, idx: Column,
      steps: Seq[Step], withinUs: Long): DataFrame = {
    require(steps.nonEmpty, "pattern needs at least one step")
    val w = Window.partitionBy(key).orderBy(ts, idx)
    val k = steps.size
    // evaluate each predicate once per row; lead the boolean j rows for
    // step j (a predicate can't be evaluated "at" the lead row, but its
    // value can be led — same trick keeps arbitrary predicates codegen'd)
    val withPreds = steps.zipWithIndex.foldLeft(
      df.withColumn("__ts_us", unix_micros(ts))) {
      case (d, (st, j)) => d.withColumn(s"__p$j", st.pred)
    }
    def at(j: Int, c: Column): Column = if (j == 0) c else lead(c, j).over(w)
    val stepOk = (0 until k).map(j => at(j, col(s"__p$j")) === lit(true))
    val spanOk = at(k - 1, col("__ts_us")) - col("__ts_us") <= lit(withinUs)
    val ids = array((0 until k).map(j => at(j, idx.cast("long"))): _*)
    withPreds
      .select(key.as("key"), col("__ts_us"),
        (stepOk :+ spanOk).reduce(_ && _).as("__hit"),
        ids.as("ids"),
        at(k - 1, col("__ts_us")).as("end_ts_us"))
      .filter(col("__hit"))
      .select(col("key"), col("ids"),
        col("__ts_us").as("start_ts_us"), col("end_ts_us"))
  }

  /** Quantified strict pattern `first middle+ last` ("A B+ C"): anchored
    * at a `first` event, a maximal run (≥1) of contiguous `middle` events
    * follows, and the FIRST non-`middle` event after the anchor must
    * satisfy `last`, within the horizon. Possessive/maximal-middle
    * semantics — assumes `middle` and `last` are disjoint (e.g. distinct
    * event types): the SQL-expressible contract, and what makes the
    * streaming NFA's verdict identical ([[CepStream.matchesQuant]]).
    *
    * Shape: row_number + ONE conditional forward-min window (first
    * non-middle position after each row) + one key-equi self-join on the
    * resolved position — never a variable-length explode; O(1)/row state.
    *
    * Output: key, e1 (anchor idx), e_end (last idx), n_mid (run length),
    * start_ts_us, end_ts_us.
    */
  def matchOneOrMore(df: DataFrame, key: Column, ts: Column, idx: Column,
      first: Step, middle: Step, last: Step, withinUs: Long): DataFrame = {
    val w = Window.partitionBy("__key").orderBy(col("__ts_us"), col("__idx"))
    val base = df.select(key.as("__key"), unix_micros(ts).as("__ts_us"),
        idx.cast("long").as("__idx"), first.pred.as("__pf"),
        middle.pred.as("__pm"), last.pred.as("__pl"))
      .withColumn("__pos", row_number().over(w))
    val wf = Window.partitionBy("__key").orderBy(col("__pos"))
      .rowsBetween(1, Window.unboundedFollowing)
    val p = base.withColumn("__nxt",
      min(when(!col("__pm"), col("__pos"))).over(wf))
    val q = p.select(col("__key").as("__k2"), col("__pos").as("__pos2"),
      col("__pl").as("__pl2"), col("__idx").as("__idx2"),
      col("__ts_us").as("__ts2"))
    p.filter(col("__pf"))
      .join(q, col("__key") === col("__k2") && col("__nxt") === col("__pos2"))
      .filter(col("__pl2") && col("__pos2") > col("__pos") + 1 &&
        col("__ts2") - col("__ts_us") <= lit(withinUs))
      .select(col("__key").as("key"), col("__idx").as("e1"),
        col("__idx2").as("e_end"),
        (col("__pos2") - col("__pos") - 1).as("n_mid"),
        col("__ts_us").as("start_ts_us"), col("__ts2").as("end_ts_us"))
  }

  /** Relaxed followed-by funnel: for each key, t(0) = first event-time
    * where step 0 holds; t(j) = first event-time where step j holds
    * STRICTLY after t(j−1) and within `within` (an INTERVAL literal
    * string, e.g. "3 days") of t(0). Emits one row per key with every
    * step's completion time (micros, null when never completed) and the
    * completed depth — the standard conversion-funnel contract.
    */
  def funnel(df: DataFrame, key: Column, ts: Column,
      steps: Seq[Step], within: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(key)
    val horizon = col("__t0") + expr(s"INTERVAL $within")
    val staged = steps.zipWithIndex.foldLeft(df) { case (d, (st, j)) =>
      val cond =
        if (j == 0) st.pred
        else st.pred && ts > col(s"__t${j - 1}") && ts <= horizon
      d.withColumn(s"__t$j", min(when(cond, ts)).over(w))
    }
    val k = steps.size
    // deepest completed step wins: fold ascending so the j=k test ends up
    // outermost in the nested CASE
    val depth = (1 to k).foldLeft(lit(0)) { (acc, j) =>
      when(col(s"t${j}_us").isNotNull, lit(j)).otherwise(acc)
    }
    staged
      .groupBy(key.as("key"))
      .agg(min(col("__t0")).as("__a0"),
        (1 until k).map(j => min(col(s"__t$j")).as(s"__a$j")): _*)
      .select(col("key") +:
        (0 until k).map(j => unix_micros(col(s"__a$j")).as(s"t${j + 1}_us")): _*)
      .withColumn("depth", depth)
  }
}
