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
    // Budget: the r6 guarded-pairs plan repartitions the banded rows by
    // (band, bucket) ONCE into a pinned cache that the stats aggregation
    // and both self-join sides consume exchange-free, so the pipeline's
    // shuffle is ~1.0 × banded + signature-agg partials + pair dedup
    // (measures ~1.03 × banded here). 2.0 × admits partial-agg noise but
    // excludes BOTH regressions this spec guards: a star side gone
    // full-input (old round-3 reps dedup) and a self-join that stopped
    // sharing the banded exchange (each ≥ +1.0 × banded).
    val budget = (banded * 2.0).toLong
    assert(recs > 0, "listener saw no shuffles — measurement broken")
    assert(recs < budget,
      s"healthy-path shuffle records $recs exceed budget $budget " +
        s"(banded=$banded) — did the star side regress to a full-input shuffle?")
    info(s"healthy-path shuffle records: $recs (banded rows: $banded, budget: $budget)")
  }
}
