package graft

import graft.queries.TextQueries

/** Cross-document duplicate-span detection/removal (dup_spans /
  * strip_spans): island merging, hash-vs-string key equivalence, and the
  * strip semantics the oracle can't isolate (multi-island docs,
  * fully-duplicated docs vanishing).
  */
class DupSpanSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private val run1 = (1 to 10).map(i => s"alpha$i").mkString(" ")
  private val run2 = (1 to 10).map(i => s"beta$i").mkString(" ")

  test("shared runs merge into maximal islands, one per disjoint span") {
    val d = docs(
      0L -> s"$run1 unique zero text in doc aaa bbb ccc ddd eee $run2",
      1L -> s"$run2 other words here that differ fff ggg hhh iii jjj $run1")
    val spans = TextQueries.dupSpansOver(d, k = 4)
      .orderBy("doc_id", "island")
      .select("doc_id", "span_start", "span_end", "n_shingles")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // both docs: a 10-token run at [1,10] and another at [21,30]; a
    // 10-token run yields 7 4-shingles; boundary shingles differ across
    // docs so islands never bleed into the unique middles
    assert(spans.toSeq === Seq(
      (0L, 1L, 10L, 7L), (0L, 21L, 30L, 7L),
      (1L, 1L, 10L, 7L), (1L, 21L, 30L, 7L)))
  }

  test("hashed shingle keys produce identical spans to string keys") {
    val dir = "/root/testdata/sf0.001"
    val str = TextQueries.dupSpans(spark, dir, hashKeys = false)
      .collect().map(_.toSeq).toSet
    val hsh = TextQueries.dupSpans(spark, dir, hashKeys = true)
      .collect().map(_.toSeq).toSet
    assert(str.nonEmpty, "fixture corpus should contain duplicate spans")
    assert(str === hsh)
  }

  test("strip removes spans everywhere; fully-duplicated docs vanish") {
    val d = docs(
      0L -> run1,
      1L -> run1,
      2L -> s"prefix words only here $run1 tail words after end")
    val out = TextQueries.stripSpansOver(d, k = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq(
      (2L, "prefix words only here tail words after end")))
  }

  test("document-internal repeats alone are not flagged") {
    val d = docs(
      0L -> s"$run1 middle filler words go here now $run1",
      1L -> "completely different content with no overlap at all today")
    assert(TextQueries.dupSpansOver(d, k = 4).isEmpty)
  }
}
