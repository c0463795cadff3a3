package graft.cep

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event entering the streaming matcher. `mask` carries every step
  * predicate pre-evaluated as a bit (bit j = step j holds) — predicates
  * are evaluated ONCE, in Catalyst, before the stateful operator, so the
  * NFA is pattern-generic and its state rows stay fixed-width.
  *
  * `ts` is the watermarked event-time column: Spark attaches the
  * watermark to an attribute, so it must SURVIVE the projection into the
  * stateful operator (projecting it away raises "Event-time timeout not
  * supported without watermark"). The NFA itself works in exact micros
  * (`tsUs`, from `unix_micros` — Timestamp.getTime would truncate to ms).
  */
final case class CepEvent(convId: String, idx: Long, tsUs: Long, mask: Int,
    ts: java.sql.Timestamp = null)

/** One emitted match: the matched event ids in step order plus the
  * anchor / last-step event times.
  */
final case class CepMatch(convId: String, ids: Seq[Long],
    startTsUs: Long, endTsUs: Long)

final case class CepState(buf: Seq[CepEvent])

/** One quantified-pattern match ([[CepStream.matchesQuant]]): anchor,
  * last-step event, and the middle run's length.
  */
final case class CepQuantMatch(convId: String, e1: Long, eEnd: Long,
    nMid: Long, startTsUs: Long, endTsUs: Long)

/** Streaming CEP: the strict-contiguity matcher of [[Cep.matchStrict]]
  * as a watermark-driven `flatMapGroupsWithState` NFA — the north-rule
  * CEP surface (pattern over a live transcript/event stream, exactly-once,
  * resumable) that batch window functions can't provide.
  *
  * Finalization rule (what makes streaming ≡ batch): a match is anchored
  * at its step-1 event; every participating event has
  * ts ≤ anchor.ts + within. Once the watermark passes anchor.ts + within,
  * no event that could join or REORDER the anchor's neighbourhood can
  * still arrive, so matches anchored below `wm − within` are emitted and
  * their anchors evicted in the same pass. Buffered state per key is
  * therefore bounded by the event rate × `within` horizon — never by
  * stream length (the 10^12-turn requirement).
  *
  * Emission is append-mode and deterministic: each anchor is inspected
  * exactly once (the pass in which it crosses the boundary), so re-runs
  * from a checkpoint re-emit nothing (state-store versioning replays the
  * pass transactionally).
  */
object CepStream {

  /** Pure per-key transition: merge `fresh` into `buf`, emit every match
    * whose anchor is final at watermark `wmUs`, evict what can no longer
    * participate. Returns (matches, kept buffer). Kept separate from the
    * Spark wiring so the boundary conditions are unit-testable without a
    * streaming harness.
    */
  def emitAndEvict(buf: Seq[CepEvent], fresh: Seq[CepEvent], wmUs: Long,
      numSteps: Int, withinUs: Long): (Seq[CepMatch], Seq[CepEvent]) = {
    val all = (buf ++ fresh).sortBy(e => (e.tsUs, e.idx)).toVector
    // anchors strictly below the boundary are final: any event with
    // ts ≤ anchor.ts + within < wm has already arrived (watermark
    // guarantees no future rows below wm)
    val bound = wmUs - withinUs
    val matches = Vector.newBuilder[CepMatch]
    var i = 0
    while (i < all.length && all(i).tsUs < bound) {
      if ((all(i).mask & 1) != 0 && i + numSteps <= all.length) {
        var ok = true
        var j = 1
        while (ok && j < numSteps) {
          ok = (all(i + j).mask & (1 << j)) != 0
          j += 1
        }
        if (ok && all(i + numSteps - 1).tsUs - all(i).tsUs <= withinUs)
          matches += CepMatch(all(i).convId,
            (0 until numSteps).map(j => all(i + j).idx),
            all(i).tsUs, all(i + numSteps - 1).tsUs)
      }
      i += 1
    }
    // events below the boundary can anchor nothing new (just inspected)
    // and can't succeed a live anchor either: pending anchors have
    // ts ≥ bound and successors never precede their anchor
    (matches.result(), all.drop(i))
  }

  /** Quantified-pattern transition (`first middle+ last`, bit 0/1/2,
    * maximal-middle semantics, middle/last disjoint — see
    * [[Cep.matchOneOrMore]]). Same finalization rule as [[emitAndEvict]]:
    * any match satisfying the span bound lies wholly inside the anchor's
    * horizon, where every event has provably arrived; a first-non-middle
    * event BEYOND the horizon fails the span check in the final data
    * too, so verdicts agree with the batch form even while later events
    * are still missing.
    */
  def emitAndEvictQuant(buf: Seq[CepEvent], fresh: Seq[CepEvent], wmUs: Long,
      withinUs: Long): (Seq[CepQuantMatch], Seq[CepEvent]) = {
    val all = (buf ++ fresh).sortBy(e => (e.tsUs, e.idx)).toVector
    val bound = wmUs - withinUs
    val matches = Vector.newBuilder[CepQuantMatch]
    var i = 0
    while (i < all.length && all(i).tsUs < bound) {
      if ((all(i).mask & 1) != 0) {
        var p = i + 1
        while (p < all.length && (all(p).mask & 2) != 0) p += 1
        if (p > i + 1 && p < all.length && (all(p).mask & 4) != 0 &&
            all(p).tsUs - all(i).tsUs <= withinUs)
          matches += CepQuantMatch(all(i).convId, all(i).idx, all(p).idx,
            (p - i - 1).toLong, all(i).tsUs, all(p).tsUs)
      }
      i += 1
    }
    (matches.result(), all.drop(i))
  }

  /** Wire the quantified NFA over a watermarked stream (same contract as
    * [[matches]]).
    */
  def matchesQuant(events: Dataset[CepEvent], withinUs: Long)(
      implicit s: SparkSession): Dataset[CepQuantMatch] = {
    import s.implicits._
    events.groupByKey(_.convId)
      .flatMapGroupsWithState[CepState, CepQuantMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[CepEvent], state: GroupState[CepState]) =>
          val buf = state.getOption.map(_.buf).getOrElse(Seq.empty)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (out, kept) = emitAndEvictQuant(buf, it.toSeq, wmUs, withinUs)
          if (kept.isEmpty) state.remove()
          else {
            state.update(CepState(kept))
            val flushAtMs = (kept.map(_.tsUs).min + withinUs) / 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(flushAtMs, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  /** Wire the NFA over a watermarked event stream. `events` must already
    * carry `withWatermark` on the column `tsUs` derives from; matches
    * flush as the watermark passes each anchor's horizon.
    */
  def matches(events: Dataset[CepEvent], numSteps: Int, withinUs: Long)(
      implicit s: SparkSession): Dataset[CepMatch] = {
    import s.implicits._
    events.groupByKey(_.convId)
      .flatMapGroupsWithState[CepState, CepMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[CepEvent], state: GroupState[CepState]) =>
          val buf = state.getOption.map(_.buf).getOrElse(Seq.empty)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (out, kept) =
            emitAndEvict(buf, it.toSeq, wmUs, numSteps, withinUs)
          if (kept.isEmpty) state.remove()
          else {
            state.update(CepState(kept))
            // re-invoke when the earliest kept anchor's horizon passes;
            // must be strictly above the current watermark
            val flushAtMs = (kept.map(_.tsUs).min + withinUs) / 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(flushAtMs, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }
}
