package graft

import org.apache.spark.sql.functions._
import graft.queries.TranscriptQueries

/** Training-sample construction: salted two-phase assembly equals the
  * single-phase form byte-for-byte on a hot-conversation corpus, and
  * pair extraction matches a brute-force reconstruction.
  */
class TranscriptSpec extends SparkSpec {
  import spark.implicits._

  private def turnsDf(rows: Seq[(String, Int, String, String)]) =
    rows.toDF("conv_id", "turn_idx", "role", "text")

  test("salted assembly == single-phase assembly, hot conversation included") {
    val rnd = new scala.util.Random(23)
    val hot = (0 until 20000).map(i => ("hot", i, "user", s"t$i-${rnd.nextInt(9)}"))
    val cold = (0 until 50).flatMap(c =>
      (0 until rnd.nextInt(20) + 1).map(i => (s"c$c", i, "user", s"x$i")))
    val turns = turnsDf(rnd.shuffle(hot ++ cold)).repartition(13)

    def direct = turns.groupBy(col("conv_id")).agg(
      concat_ws("\n", transform(
        array_sort(collect_list(struct(col("turn_idx"), col("text")))),
        x => x.getField("text"))).as("doc"),
      count(lit(1)).as("n_turns"))
      .select(col("conv_id"), col("doc"), col("n_turns"),
        length(col("doc")).cast("long").as("n_chars"))

    val a = direct.as[(String, String, Long, Long)].collect().toSet
    val b = TranscriptQueries.assembleConvsSalted(turns, salts = 16)
      .as[(String, String, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.exists { case (c, doc, n, _) => c == "hot" && n == 20000 &&
      doc.startsWith("t0-") && doc.endsWith("-" + hot.last._4.split("-")(1)) })
  }

  test("salted phase 1 spreads a hot conversation over the salt space") {
    val hot = (0 until 5000).map(i => ("hot", i, "user", s"t$i"))
    val phase1 = turnsDf(hot)
      .withColumn("__salt", pmod(hash(col("turn_idx")), lit(8)))
      .groupBy(col("conv_id"), col("__salt")).count()
    val counts = phase1.select("count").as[Long].collect()
    assert(counts.length == 8, "hot conversation must occupy every salt")
    assert(counts.max < 5000, "no single reducer holds the whole conversation")
  }
}
