package graft

import org.apache.spark.sql.functions._
import graft.queries.{Tables, TextQueries}
import graft.ann.Ann

/** Curation-stage operators added for the training-data pipeline surface:
  * test-set decontamination, overlapping chunking, vocab build + token-id
  * encoding, and SemDeDup-style semantic dedup — the semantics the
  * DuckDB oracle can't isolate (controlled leaks, boundary chunk math,
  * OOV handling, cluster-blindness).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  /** A text whose md5 first nibble is '0' (benchmark member) — mined by
    * salting, so the test controls benchmark membership without touching
    * the content-derived rule itself.
    */
  private def mineBenchText(base: String): String =
    Iterator.from(0).map(i => s"$base salt$i").find { t =>
      val b = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))(0)
      (b & 0xf0) == 0
    }.get

  private def mineNonBenchText(base: String): String =
    Iterator.from(0).map(i => s"$base pad$i").find { t =>
      val b = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))(0)
      (b & 0xf0) != 0
    }.get

  test("decontam flags exactly the docs sharing an 8-gram with a benchmark doc") {
    val leak = (1 to 8).map(i => s"leakword$i").mkString(" ")
    val bench = mineBenchText(s"benchmark question text $leak")
    val dirty = mineNonBenchText(s"training doc containing $leak verbatim")
    val clean = mineNonBenchText("an unrelated training document with no overlap at all")
    val out = TextQueries.decontaminateOver(docs(0L -> bench, 1L -> dirty, 2L -> clean))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // benchmark doc itself is excluded from the output
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._3, "doc sharing the 8-gram must be flagged")
    assert(byId(1L)._2 >= 1L)
    assert(!byId(2L)._3 && byId(2L)._2 === 0L)
  }

  test("decontam counts distinct contaminated shingles once per doc") {
    val leak = (1 to 8).map(i => s"dupleak$i").mkString(" ")
    val bench = mineBenchText(s"the benchmark carries $leak once")
    // the corpus doc repeats the leaked phrase — the shared 8-gram set is
    // still the phrase's shingles, counted per DISTINCT shingle
    val dirty = mineNonBenchText(s"$leak and then again $leak")
    val once = mineNonBenchText(s"$leak only a single time here")
    val out = TextQueries.decontaminateOver(docs(0L -> bench, 1L -> dirty, 2L -> once))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === out(2L),
      "repeating a leaked phrase must not inflate the distinct-shingle count")
  }

  test("chunk_overlap: boundary chunk math and full token coverage") {
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    val d = docs(0L -> "", 1L -> mk(1), 63L -> mk(63), 64L -> mk(64),
      65L -> mk(65), 112L -> mk(112), 113L -> mk(113), 200L -> mk(200))
    val out = TextQueries.chunkOverlapOver(d, win = 64, stride = 48)
      .select("doc_id", "chunk_idx", "n_chunk_toks", "chunk_text").collect()
    val byDoc = out.groupBy(_.getLong(0))
    // empty doc emits nothing
    assert(!byDoc.contains(0L))
    // n_chunks = 1 + ceil(max(0, n-64)/48)
    val expectChunks = Map(1L -> 1, 63L -> 1, 64L -> 1, 65L -> 2,
      112L -> 2, 113L -> 3, 200L -> 4)
    expectChunks.foreach { case (n, c) =>
      assert(byDoc(n).length === c, s"doc of $n tokens should emit $c chunks")
    }
    // every token position appears in ≥1 chunk; chunk i starts at i*48+1
    byDoc.foreach { case (n, rows) =>
      val covered = rows.flatMap { r =>
        val start = r.getLong(1).toInt * 48 + 1
        (start until start + r.getLong(2).toInt)
      }.toSet
      assert(covered === (1 to n.toInt).toSet, s"doc $n: coverage gap")
    }
    // last chunk of the 113-token doc is short: 113 - 2*48 = 17 tokens
    assert(byDoc(113L).maxBy(_.getLong(1)).getLong(2) === 17L)
  }

  test("vocab_encode: frequency-ranked ids, OOV -> 0, maxLen truncation") {
    // counts: "aa"×5, "bb"×3, "cc"×3, "zz"×1 — vocabSize=3 keeps aa,bb,cc
    // (tie bb/cc broken by term asc), zz is OOV
    val d = docs(
      0L -> "aa aa aa bb bb cc",
      1L -> "aa aa bb cc cc zz")
    val out = TextQueries.vocabEncodeOver(d, vocabSize = 3, maxLen = 4)
      .orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // maxLen=4 keeps only the first 4 tokens of each doc
    assert(out.count(_._1 == 0L) === 4 && out.count(_._1 == 1L) === 4)
    val ids = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(ids((0L, 1L)) === ("aa", 1L))
    assert(ids((0L, 4L)) === ("bb", 2L))
    assert(ids((1L, 4L)) === ("cc", 3L))
    // doc 1 truncated before zz — re-encode with maxLen=6 to see the OOV
    val oov = TextQueries.vocabEncodeOver(d, vocabSize = 3, maxLen = 6)
      .filter($"term" === "zz").select("token_id").collect()
    assert(oov.map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("semantic_dedup marks same-cluster near-dups only, keeps the min id") {
    // clusters are the first-C vectors; C=2 here. v0/v1 orthogonal axes.
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val emb = Seq(
      (0L, v(1, 0)), (1L, v(0, 1)),        // centroids
      (10L, v(0.9, 0.1)), (11L, v(0.92, 0.08)), // near-dups in cluster 0
      (20L, v(0.1, 0.9))                   // alone in cluster 1
    ).toDF("vec_id", "embedding")
    // minCos 0.999: only the (10, 11) pair clears it (cos ≈ 0.9997); the
    // centroid vectors — data points themselves — sit at cos ≈ 0.994-0.996
    // from their members and must NOT pair
    val out = Ann.semanticDedup(emb, numCentroids = 2, minCos = 0.999)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(10L)._1 === 0L && out(11L)._1 === 0L && out(20L)._1 === 1L)
    assert(!out(10L)._2, "lower id of a near-dup pair is kept")
    assert(out(11L)._2, "higher id of a near-dup pair is dropped")
    assert(out.filter(_._2._2).keySet === Set(11L))
  }

  test("semantic_dedup on the fixture == brute-force within-cluster pairs") {
    val emb = Tables.embeddings(spark, dir)
    val out = Ann.semanticDedup(emb, numCentroids = 16, minCos = 0.4)
    // brute force: pair (a,b) same cluster, a<b, cos>=0.4 ⇒ b dropped
    val asg = Ann.assignToCentroids(emb,
      emb.filter($"vec_id" < 16)
        .select($"vec_id".as("cluster"), $"embedding".as("c_emb")))
      .select($"vec_id", $"cluster", $"embedding")
    val a = asg.select($"cluster", $"vec_id".as("va"), $"embedding".as("ea"))
    val b = asg.select($"cluster", $"vec_id".as("vb"), $"embedding".as("eb"))
    val expectDropped = a.join(b, Seq("cluster"))
      .filter($"va" < $"vb" &&
        (Ann.dotD($"ea", $"eb") / (Ann.normD($"ea") * Ann.normD($"eb"))) >= 0.4)
      .select($"vb").distinct().as[Long].collect().toSet
    val gotDropped = out.filter($"is_dup").select($"vec_id").as[Long].collect().toSet
    assert(gotDropped === expectDropped)
    assert(out.count() === emb.count(), "one row per vector")
  }
}
