package graft

import java.sql.Timestamp
import scala.util.Random
import graft.gen.Synthetic
import graft.model.Turn
import graft.snapshot.SnapshotFold
import graft.skew.Salting

/** Fold determinism (SURVEY.md §5 items 1 and 3): the snapshot is a pure
  * function of the turn SET — invariant under arrival order and batch
  * slicing — and all three fold implementations agree.
  * Property-style: many fixed-seed random permutations/slicings.
  */
class SnapshotFoldSpec extends SparkSpec {

  private val params = Synthetic.Params(numConvs = 40, avgTurns = 10,
    hotConvs = 2, hotSize = 200, seed = 7L)
  private def allTurns: Seq[Turn] =
    (0L until params.numConvs).flatMap(c => Synthetic.genConv(c, params))

  test("fold is invariant under permutation of arrivals") {
    val turns = Synthetic.genConv(3L, params)
    val base = SnapshotFold.fold(None, turns.iterator)
    (1 to 50).foreach { seed =>
      val shuffled = new Random(seed).shuffle(turns)
      assert(SnapshotFold.fold(None, shuffled.iterator) === base)
    }
  }

  test("fold is invariant under batch slicing") {
    val turns = Synthetic.genConv(1L, params) // hot conv, 200 turns
    val whole = SnapshotFold.fold(None, turns.iterator)
    (1 to 50).foreach { seed =>
      val rng = new Random(seed)
      val cuts = List.fill(3)(rng.nextInt(turns.length + 1))
      val points = (0 :: turns.length :: cuts).distinct.sorted
      val slices = points.zip(points.tail).map { case (a, b) => turns.slice(a, b) }
      val incremental = slices.foldLeft(Option.empty[graft.model.ConvSnapshot]) {
        (st, slice) => SnapshotFold.fold(st, slice.iterator)
      }
      assert(incremental === whole)
    }
  }

  test("typed Aggregator == DataFrame max_by form == salted two-phase form, ALL ConvSnapshot fields incl. tool_counts") {
    import spark.implicits._
    val ds = spark.createDataset(allTurns)
    val typed = SnapshotFold.typedSnapshots(ds)
      .collect().map(s => s.conv_id -> s).toMap
    val untyped = SnapshotFold.batchSnapshots(ds.toDF(), includeToolCounts = true)
      .as[BatchSnap].collect().map(s => s.conv_id -> s).toMap
    val salted = Salting.saltedBatchSnapshots(ds.toDF(), includeToolCounts = true)
      .as[BatchSnap].collect().map(s => s.conv_id -> s).toMap
    assert(typed.keySet === untyped.keySet)
    assert(untyped === salted)
    typed.foreach { case (k, t) =>
      val u = untyped(k)
      assert((t.last_turn_idx, t.last_role, t.last_tool, t.last_text,
        t.turn_count, t.tool_counts, t.first_ts, t.last_ts) ===
        (u.last_turn_idx, u.last_role, u.last_tool, u.last_text,
          u.turn_count, u.tool_counts, u.first_ts, u.last_ts))
    }
    // the histogram is non-trivial on this corpus (not vacuously equal)
    assert(typed.values.exists(_.tool_counts.nonEmpty))
    // the flag off keeps the single-shuffle schema (no histogram column)
    assert(!SnapshotFold.batchSnapshots(ds.toDF()).columns.contains("tool_counts"))
  }

  test("tool_counts sums to the number of tool-bearing turns") {
    val turns = Synthetic.genConv(0L, params)
    val snap = SnapshotFold.fold(None, turns.iterator).get
    assert(snap.tool_counts.values.sum === turns.count(_.tool.nonEmpty))
    assert(snap.turn_count === turns.length)
  }

  test("generator is deterministic and Zipf-skewed") {
    assert(Synthetic.genConv(5L, params) === Synthetic.genConv(5L, params))
    assert(Synthetic.convSize(0L, params) === params.hotSize)
    val tailSizes = (10L until 40L).map(Synthetic.convSize(_, params))
    assert(tailSizes.max < params.hotSize)
  }
}

final case class BatchSnap(conv_id: String, last_turn_idx: Int,
    last_role: String, last_tool: String, last_text: String,
    turn_count: Long, tool_counts: Map[String, Long],
    first_ts: Timestamp, last_ts: Timestamp)
