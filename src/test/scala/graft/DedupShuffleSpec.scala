package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Shuffle-volume evidence for the hot-bucket guard's healthy path
  * (round-4 fix): with zero hot buckets, the star side — including the
  * representative-payload `reps` dedup — must process zero rows, so the
  * pipeline's total shuffle record count stays within the budget of the
  * signature agg + stats agg + small self-join. The round-3 form
  * dropDuplicates'd ALL banded rows for `reps`, adding one full
  * signature-set shuffle that this test's bound does not admit.
  */
class DedupShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def shuffleRecordsOf(body: => Unit): Long = {
    val recs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.sql.graftshim.Shim.waitListenerBus(spark.sparkContext)
      recs.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("healthy path (no hot buckets) shuffles no star-side rows") {
    val n = 400
    // all-distinct docs: no bucket collisions at sane signatures
    val docs = spark.range(n).select($"id".as("doc_id"),
      concat(lit("unique document body number "), $"id",
        lit(" with distinct trailing words "), $"id" * 7, lit(" "), $"id" * 13)
        .as("text"))
    val numHashes = 16; val rowsPerBand = 4
    val nBands = numHashes / rowsPerBand
    val banded = n.toLong * nBands // one row per (doc, band)

    val recs = shuffleRecordsOf {
      Dedup.minhashCandidates(docs, "doc_id", "text",
        numHashes = numHashes, rowsPerBand = rowsPerBand).count()
    }
    // Budget: shingle-explode agg (≤ distinct shingles + partials),
    // hotStats partials (tiny), banded self-join (≤ 2 × banded rows),
    // pair dedup (≈ 0 pairs here) — measures ~2.0 × banded on this
    // corpus. The old full-input `reps` dedup added a further `banded`
    // records (→ ~3.0 ×), which this bound excludes.
    val budget = (banded * 2.7).toLong
    assert(recs > 0, "listener saw no shuffles — measurement broken")
    assert(recs < budget,
      s"healthy-path shuffle records $recs exceed budget $budget " +
        s"(banded=$banded) — did the star side regress to a full-input shuffle?")
    info(s"healthy-path shuffle records: $recs (banded rows: $banded, budget: $budget)")
  }
}
