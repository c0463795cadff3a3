package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.model.Turn

/** Per-key top-k as a bounded-buffer typed Aggregator — "the latest k
  * turns of every conversation", i.e. the context-window query an agent
  * runtime asks of a 10^12-turn transcript table.
  *
  * Scale rationale (SURVEY.md §2.3): the textbook formulation —
  * `row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC) <= k`
  * — shuffles EVERY row to its key's reducer and sorts whole partitions
  * before discarding all but k per key. This Aggregator is mergeable, so
  * Catalyst plans it as ObjectHashAggregate with a map-side partial pass:
  * what crosses the one shuffle is at most k rows per key per input
  * partition, a ~(rows/key)/k reduction for long conversations, and no
  * partition-wide sort anywhere. The buffer is a size-bounded descending
  * list — O(k) state per key regardless of conversation length.
  *
  * znap has no per-key top-k (its snapshot keeps only the latest event =
  * the k=1 special case, reference:
  * persistence/dynamo/DynamoDBEventsWriter.scala:36-47); this is the
  * generalization a transcript store actually serves.
  */
object TopKPerKey {

  /** One retained turn; `text` rides along to keep the measured shuffle
    * shape honest (the caller wants the content, not just the index).
    */
  final case class TurnAt(turn_idx: Int, role: String, text: String)

  /** Mergeable bounded buffer: `items` sorted by turn_idx descending,
    * size ≤ k (turn_idx is unique per conversation, so the ordering is
    * total and the result deterministic).
    */
  final case class TopBuf(items: List[TurnAt])

  /** Product wrapper so the output has a straightforward Encoder. */
  final case class TopK(items: Seq[TurnAt])

  final class LatestK(k: Int) extends Aggregator[Turn, TopBuf, TopK] {
    require(k > 0, "k must be positive")
    override def zero: TopBuf = TopBuf(Nil)
    override def reduce(b: TopBuf, t: Turn): TopBuf =
      // full buffer + older than the current minimum → no-op (the hot
      // path for long conversations: no allocation, no sort)
      if (b.items.lengthCompare(k) >= 0 && t.turn_idx <= b.items.last.turn_idx) b
      else TopBuf((TurnAt(t.turn_idx, t.role, t.text) :: b.items)
        .sortBy(x => -x.turn_idx).take(k))
    override def merge(a: TopBuf, b: TopBuf): TopBuf =
      TopBuf((a.items ++ b.items).sortBy(x => -x.turn_idx).take(k))
    override def finish(b: TopBuf): TopK = TopK(b.items)
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
  }
}
