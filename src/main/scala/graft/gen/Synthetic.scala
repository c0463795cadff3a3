package graft.gen

import java.sql.Timestamp
import scala.util.Random
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Turn

/** Deterministic synthetic transcript generator (FIXTURES.md §1).
  *
  * Replaces the reference's external Nakadi stream
  * (reference: source/nakadi/NakadiPublisher.scala:42-82) with a seeded,
  * reproducible source: same (seed, params) => byte-identical Dataset.
  *
  * Distributed by construction: `spark.range(numConvs)` partitions the
  * conversation-id space, each task generates its own conversations from a
  * per-conversation PRNG — no driver-side materialization, so the generator
  * itself scales to 10^12 turns on a real cluster (generation cost is
  * embarrassingly parallel; nothing is collected).
  *
  * Conversation sizes are Zipf-skewed: a configurable set of "hot"
  * conversations gets `hotSize` turns (10^3..10^4) to exercise salting and
  * AQE skew handling (SURVEY.md §7.5 item 3); the long tail follows
  * ~1/rank^0.7.
  */
object Synthetic {
  val BaseEpochMs: Long = 1704067200000L // 2024-01-01T00:00:00Z

  final case class Params(
      numConvs: Long = 1000L,
      avgTurns: Int = 20,
      hotConvs: Int = 2,
      hotSize: Int = 2000,
      /** fraction of turns whose ts is pulled far backwards (late data) */
      lateFraction: Double = 0.0,
      seed: Long = 42L)

  private val roles = Array("user", "assistant", "system", "tool")
  private val tools =
    Array("search", "calculator", "browser", "python", "sql", "editor")
  private val vocab: Array[String] = Array(
    "the", "a", "of", "and", "is", "stream", "snapshot", "replay", "turn",
    "state", "offset", "partition", "key", "value", "fold", "window",
    "watermark", "join", "merge", "commit", "batch", "query", "plan",
    "shuffle", "skew", "salt", "lineage", "metric", "checkpoint", "agent",
    "tool", "call", "result", "answer", "question", "context", "token")

  /** Deterministic number of turns for conversation `c`. */
  def convSize(c: Long, p: Params): Int =
    if (c < p.hotConvs) p.hotSize
    else {
      val rank = (c % 997) + 1
      math.max(1, math.round(p.avgTurns * 3.0 / math.pow(rank.toDouble, 0.7)).toInt)
    }

  /** Exact mean turns per tail conversation (the size function cycles with
    * period 997), used to calibrate numConvs for a target total.
    */
  def meanTailTurns(p: Params): Double =
    (1 to 997).map(r =>
      math.max(1, math.round(p.avgTurns * 3.0 / math.pow(r.toDouble, 0.7)).toInt)
    ).sum / 997.0

  /** Params sized so the generated total is ≈ `targetTurns`, with a
    * realistic ~28-turn mean conversation length.
    */
  def paramsForTurns(targetTurns: Long, seed: Long = 42L,
      avgTurns: Int = 300): Params = {
    val base = Params(seed = seed, avgTurns = avgTurns)
    val hotTotal = base.hotConvs.toLong * base.hotSize
    val mean = meanTailTurns(base)
    base.copy(numConvs =
      math.max(1L, ((targetTurns - hotTotal).max(0L) / mean).toLong))
  }

  /** All turns of conversation `c` — pure function of (c, params). */
  def genConv(c: Long, p: Params): Seq[Turn] = {
    val rng = new Random(p.seed * 1000003L + c * 7919L)
    val n = convSize(c, p)
    val convId = f"conv-$c%012d"
    val startMs = BaseEpochMs + (c % 86400L) * 1000L
    var ts = startMs
    (0 until n).map { i =>
      ts += 500L + rng.nextInt(30000) // strictly increasing within conv
      val role = roles(if (i % 2 == 0) 0 else if (rng.nextInt(10) == 0) 3 else 1)
      val tool =
        if (role == "tool" || (role == "assistant" && rng.nextInt(4) == 0))
          tools(rng.nextInt(tools.length))
        else ""
      val nWords = 3 + rng.nextInt(20)
      val text = Seq.fill(nWords)(vocab(rng.nextInt(vocab.length))).mkString(" ")
      val effTs =
        if (p.lateFraction > 0 && rng.nextDouble() < p.lateFraction)
          ts - 3600000L // one hour late
        else ts
      Turn(convId, i, role, text, tool, new Timestamp(effTs))
    }
  }

  /** Distributed generation: one task per slice of the conv-id space. */
  def turns(spark: SparkSession, p: Params, slices: Int = 32): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0L, p.numConvs, 1L, slices).flatMap(c => genConv(c, p))
  }
}
