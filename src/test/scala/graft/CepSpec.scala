package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.cep.{Cep, CepEvent, CepStream}

/** CEP semantics: strict-contiguity matching, funnel completion, and the
  * streaming NFA's finalization/eviction rule — streaming must equal the
  * batch window form on the same input, across micro-batch splits.
  */
class CepSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1700000000000000L // µs
  private val H = 3600L * 1000000    // 1 hour in µs
  private def ts(us: Long) = new Timestamp(us / 1000)

  private val steps = Seq(
    Cep.Step("a", col("typ") === "a"),
    Cep.Step("b", col("typ") === "b"),
    Cep.Step("c", col("typ") === "c"))

  private def frame(rows: (String, Long, String, Long)*) =
    rows.toSeq.toDF("conv", "idx", "typ", "us")
      .select(col("conv"), col("idx"), col("typ"),
        timestamp_micros(col("us")).as("ts"))

  private def strict(df: org.apache.spark.sql.DataFrame, withinUs: Long) =
    Cep.matchStrict(df, col("conv"), col("ts"), col("idx"), steps, withinUs)
      .select(col("key"), col("ids"))
      .as[(String, Seq[Long])].collect().toSet

  test("matchStrict finds adjacent sequences within the span, all anchors") {
    val df = frame(
      ("A", 0, "a", T0), ("A", 1, "b", T0 + H), ("A", 2, "c", T0 + 2 * H),
      ("A", 3, "a", T0 + 3 * H), ("A", 4, "b", T0 + 4 * H), ("A", 5, "c", T0 + 5 * H),
      // B: right types, too slow
      ("B", 0, "a", T0), ("B", 1, "b", T0 + H), ("B", 2, "c", T0 + 80 * H),
      // C: broken contiguity (a a b c — anchor 0 fails, anchor 1 matches)
      ("C", 0, "a", T0), ("C", 1, "a", T0 + H), ("C", 2, "b", T0 + 2 * H),
      ("C", 3, "c", T0 + 3 * H))
    assert(strict(df, 72 * H) === Set(
      ("A", Seq(0L, 1L, 2L)), ("A", Seq(3L, 4L, 5L)), ("C", Seq(1L, 2L, 3L))))
  }

  test("matchStrict span bound is inclusive and ties order by idx") {
    val df = frame(
      ("A", 0, "a", T0), ("A", 1, "b", T0 + H), ("A", 2, "c", T0 + 2 * H),
      // tie on ts: idx breaks the order, so b(10) precedes c(11)
      ("D", 9, "a", T0), ("D", 10, "b", T0 + H), ("D", 11, "c", T0 + H))
    assert(strict(df, 2 * H) === Set(
      ("A", Seq(0L, 1L, 2L)), ("D", Seq(9L, 10L, 11L))))
    assert(strict(df, 2 * H - 1) === Set(("D", Seq(9L, 10L, 11L))))
  }

  test("funnel: first completion per step, horizon anchored at step 1") {
    val df = frame(
      // full conversion; second b inside window must NOT displace first
      ("A", 0, "a", T0), ("A", 1, "b", T0 + H), ("A", 2, "b", T0 + 2 * H),
      ("A", 3, "c", T0 + 3 * H),
      // b before a doesn't count; later b does
      ("B", 0, "b", T0), ("B", 1, "a", T0 + H), ("B", 2, "b", T0 + 2 * H),
      // c outside the horizon → depth 2
      ("C", 0, "a", T0), ("C", 1, "b", T0 + H), ("C", 2, "c", T0 + 100 * H),
      // no a at all → depth 0
      ("E", 0, "b", T0), ("E", 1, "c", T0 + H))
    val got = Cep.funnel(df, col("conv"), col("ts"), steps, within = "4 hours")
      .select(col("key"), col("t1_us"), col("t2_us"), col("t3_us"), col("depth"))
      .as[(String, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("A") === ("A", Some(T0), Some(T0 + H), Some(T0 + 3 * H), 3))
    assert(got("B") === ("B", Some(T0 + H), Some(T0 + 2 * H), None, 2))
    assert(got("C") === ("C", Some(T0), Some(T0 + H), None, 2))
    assert(got("E") === ("E", None, None, None, 0))
  }

  test("matchOneOrMore: maximal middle run, first non-middle must be last") {
    val df = frame(
      // a b b c: one match, run length 2
      ("A", 0, "a", T0), ("A", 1, "b", T0 + H), ("A", 2, "b", T0 + 2 * H),
      ("A", 3, "c", T0 + 3 * H),
      // a b x c: first non-b is x — NO match (possessive, no skipping)
      ("B", 0, "a", T0), ("B", 1, "b", T0 + H), ("B", 2, "x", T0 + 2 * H),
      ("B", 3, "c", T0 + 3 * H),
      // a c: zero middles — no match (+ requires >= 1)
      ("C", 0, "a", T0), ("C", 1, "c", T0 + H),
      // a b c, but c outside the horizon
      ("D", 0, "a", T0), ("D", 1, "b", T0 + H), ("D", 2, "c", T0 + 90 * H))
    val got = Cep.matchOneOrMore(df, col("conv"), col("ts"), col("idx"),
        Cep.Step("a", col("typ") === "a"), Cep.Step("b", col("typ") === "b"),
        Cep.Step("c", col("typ") === "c"), withinUs = 72 * H)
      .select(col("key"), col("e1"), col("e_end"), col("n_mid"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("A", 0L, 3L, 2L)))
  }

  test("emitAndEvictQuant: incremental passes equal one big pass") {
    val cycle = Seq(1, 2, 2, 4, 0, 2, 4, 1, 0, 2) // a b b c x b c a x b
    val all = (0 until 40).map { i =>
      ev("A", i.toLong, T0 + i * H, cycle(i % 10))
    }
    val within = 10 * H
    val (oneShot, _) =
      CepStream.emitAndEvictQuant(Nil, all, Long.MaxValue / 2, within)
    var buf: Seq[CepEvent] = Nil
    var got = Vector.empty[graft.cep.CepQuantMatch]
    all.grouped(9).foreach { chunk =>
      val wm = chunk.map(_.tsUs).max - 60L * 1000000
      val (m, k) = CepStream.emitAndEvictQuant(buf, chunk, wm, within)
      got ++= m; buf = k
    }
    val (tail, _) =
      CepStream.emitAndEvictQuant(buf, Nil, Long.MaxValue / 2, within)
    got ++= tail
    assert(oneShot.nonEmpty)
    assert(got.sortBy(_.startTsUs) === oneShot.sortBy(_.startTsUs))
  }

  test("quantified streaming NFA equals the batch join form") {
    // every conv reads the same cyclic type sequence at offset c, so each
    // contains a-b-b-c and a-b-c runs while chunk boundaries cut them at
    // different places per conv
    val cyc = Seq("a", "b", "b", "c", "x", "a", "b", "c", "b", "x")
    val rows = for {
      c <- 0 until 5
      i <- 0 until 50
    } yield (s"q$c", (c * 1000 + i).toLong, cyc((i + c) % 10),
      T0 + (i * 2L + c) * H)
    val df = frame(rows: _*)
    val within = 12 * H
    val expect = Cep.matchOneOrMore(df, col("conv"), col("ts"), col("idx"),
        Cep.Step("a", col("typ") === "a"), Cep.Step("b", col("typ") === "b"),
        Cep.Step("c", col("typ") === "c"), within)
      .select(col("key"), col("e1"), col("e_end"), col("n_mid"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(expect.nonEmpty)

    val mask = Seq("a", "b", "c").zipWithIndex.map { case (t, j) =>
      when(col("typ") === t, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    implicit val s = spark
    val input = MemoryStream[(String, Long, String, Long)](spark)
    val events = input.toDS().toDF("conv", "idx", "typ", "us")
      .select(col("conv"), col("idx"), col("typ"),
        timestamp_micros(col("us")).as("ts"))
      .select(col("conv").as("convId"), col("idx"),
        unix_micros(col("ts")).as("tsUs"), mask.as("mask"), col("ts"))
      .withWatermark("ts", "1 minute")
      .as[CepEvent]
    val q = CepStream.matchesQuant(events, within).writeStream
      .outputMode("append").format("memory").queryName("cepq_out").start()
    rows.sortBy(_._4).grouped(41).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    input.addData(Seq(("zz", 999999L, "x", T0 + 10000 * H)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cepq_out")
      .select(col("convId"), col("e1"), col("eEnd"), col("nMid"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === expect)
  }

  test("transformWithState NFA equals the batch window form (RocksDB)") {
    // reuse the strict corpus shape; uneven chunks leave pending anchors
    // whose flush must come from registered event-time timers
    val cyc = Seq("a", "b", "c", "x", "a", "b", "b", "c", "x", "b")
    val rows = for {
      c <- 0 until 4
      i <- 0 until 40
    } yield (s"t$c", (c * 1000 + i).toLong, cyc((i + c) % 10),
      T0 + (i * 2L + c) * H)
    val df = frame(rows: _*)
    val within = 8 * H
    val expect = Cep.matchStrict(df, col("conv"), col("ts"), col("idx"),
        steps, within)
      .select(col("key"), col("ids")).as[(String, Seq[Long])].collect().toSet
    assert(expect.nonEmpty)
    val mask = steps.zipWithIndex.map { case (st, j) =>
      when(st.pred, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    implicit val s = spark
    graft.snapshot.SnapshotTws.withRocksDb(spark) {
      val input = MemoryStream[(String, Long, String, Long)](spark)
      val events = input.toDS().toDF("conv", "idx", "typ", "us")
        .select(col("conv"), col("idx"), col("typ"),
          timestamp_micros(col("us")).as("ts"))
        .select(col("conv").as("convId"), col("idx"),
          unix_micros(col("ts")).as("tsUs"), mask.as("mask"), col("ts"))
        .withWatermark("ts", "1 minute")
        .as[CepEvent]
      val q = graft.cep.CepTws.matches(events, 3, within).writeStream
        .outputMode("append").format("memory").queryName("ceptws_out").start()
      rows.sortBy(_._4).grouped(37).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      input.addData(Seq(("zz", 999999L, "x", T0 + 10000 * H)))
      q.processAllAvailable()
      q.stop()
    }
    val got = spark.table("ceptws_out")
      .select(col("convId"), col("ids"))
      .as[(String, Seq[Long])].collect().toSet
    assert(got === expect)
  }

  test("FunnelTws.advance: event-time-ordered fold, horizon at t1") {
    import graft.cep.FunnelTws.advance
    val within = 4 * H
    def e(idx: Long, us: Long, m: Int) = ev("A", idx, us, m)
    // a at t0, b at t0+1h, c at t0+3h → full depth
    assert(advance(Nil, Seq(e(0, T0, 1), e(1, T0 + H, 2), e(2, T0 + 3 * H, 4)),
      3, within) === Seq(T0, T0 + H, T0 + 3 * H))
    // c before b contributes nothing; later c does
    assert(advance(Nil, Seq(e(0, T0, 1), e(1, T0 + H, 4), e(2, T0 + 2 * H, 2),
      e(3, T0 + 3 * H, 4)), 3, within) === Seq(T0, T0 + 2 * H, T0 + 3 * H))
    // step outside the t1 horizon never completes
    assert(advance(Nil, Seq(e(0, T0, 1), e(1, T0 + H, 2), e(2, T0 + 9 * H, 4)),
      3, within) === Seq(T0, T0 + H))
    // resumes from prior state across passes
    val st1 = advance(Nil, Seq(e(0, T0, 1)), 3, within)
    assert(advance(st1, Seq(e(1, T0 + H, 2)), 3, within) === Seq(T0, T0 + H))
  }

  test("streaming funnel equals the batch funnel across shuffled batches") {
    // intra-batch disorder exercises the buffer+sort: watermark only
    // advances at batch boundaries, so within a chunk any order is legal
    val cyc = Seq("a", "x", "b", "c", "b", "a", "c", "x", "b", "c")
    val rows = for {
      c <- 0 until 5
      i <- 0 until 40
    } yield (s"f$c", (c * 1000 + i).toLong, cyc((i + c) % 10),
      T0 + (i * 2L + c) * H)
    val df = frame(rows: _*)
    val within = 30 * H
    val expect = Cep.funnel(df, col("conv"), col("ts"), steps, "30 hours")
      .select(col("key"), col("t1_us"), col("t2_us"), col("t3_us"), col("depth"))
      .as[(String, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> r).toMap
    val mask = steps.zipWithIndex.map { case (st, j) =>
      when(st.pred, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    implicit val s = spark
    graft.snapshot.SnapshotTws.withRocksDb(spark) {
      val input = MemoryStream[(String, Long, String, Long)](spark)
      val events = input.toDS().toDF("conv", "idx", "typ", "us")
        .select(col("conv"), col("idx"), col("typ"),
          timestamp_micros(col("us")).as("ts"))
        .select(col("conv").as("convId"), col("idx"),
          unix_micros(col("ts")).as("tsUs"), mask.as("mask"), col("ts"))
        .withWatermark("ts", "1 minute")
        .as[CepEvent]
      val q = graft.cep.FunnelTws.updates(events, 3, within).writeStream
        .outputMode("update").format("memory").queryName("funnel_out").start()
      val rnd = new scala.util.Random(7)
      rows.sortBy(_._4).grouped(43).foreach { b =>
        input.addData(rnd.shuffle(b)); q.processAllAvailable()
      }
      input.addData(Seq(("zz", 999999L, "x", T0 + 100000 * H)))
      q.processAllAvailable()
      q.stop()
    }
    // depth is monotone per key and rows emit only on change: the
    // max-depth row is each key's final state
    val got = spark.table("funnel_out")
      .as[graft.cep.FunnelRow].collect()
      .groupBy(_.convId).map { case (k, rs) => k -> rs.maxBy(_.depth) }
    (0 until 5).map(c => s"f$c").foreach { k =>
      val (_, e1, e2, e3, d) = expect(k)
      val g = got(k)
      assert(g.depth === d, s"key $k depth")
      assert(g.ts === Seq(e1, e2, e3).flatten, s"key $k times")
    }
  }

  // ---- the pure NFA transition ----------------------------------------

  private def ev(conv: String, idx: Long, us: Long, mask: Int) =
    CepEvent(conv, idx, us, mask)

  test("emitAndEvict: anchors finalize strictly below wm - within") {
    val buf = Seq(ev("A", 0, T0, 1), ev("A", 1, T0 + H, 2), ev("A", 2, T0 + 2 * H, 4))
    val within = 3 * H
    // wm exactly at anchor horizon: anchor NOT final yet (strict <)
    val (m0, k0) = CepStream.emitAndEvict(buf, Nil, T0 + within, 3, within)
    assert(m0.isEmpty && k0 === buf.sortBy(e => (e.tsUs, e.idx)))
    // one µs past: emitted, anchor evicted, successors kept
    val (m1, k1) = CepStream.emitAndEvict(buf, Nil, T0 + within + 1, 3, within)
    assert(m1.map(_.ids) === Seq(Seq(0L, 1L, 2L)))
    assert(k1.map(_.idx) === Seq(1L, 2L))
  }

  test("emitAndEvict: incremental passes equal one big pass") {
    val all = (0 until 30).map { i =>
      ev("A", i.toLong, T0 + i * H, 1 << (i % 3))
    }
    val within = 5 * H
    val (oneShot, _) =
      CepStream.emitAndEvict(Nil, all, Long.MaxValue / 2, 3, within)
    // feed in three chunks with the watermark trailing the data
    var buf: Seq[CepEvent] = Nil
    var got = Vector.empty[graft.cep.CepMatch]
    all.grouped(10).zipWithIndex.foreach { case (chunk, i) =>
      val wm = chunk.map(_.tsUs).max - 60L * 1000000
      val (m, k) = CepStream.emitAndEvict(buf, chunk, wm, 3, within)
      got ++= m; buf = k
    }
    val (tail, _) = CepStream.emitAndEvict(buf, Nil, Long.MaxValue / 2, 3, within)
    got ++= tail
    assert(got.sortBy(_.startTsUs) === oneShot.sortBy(_.startTsUs))
  }

  // ---- streaming ≡ batch ----------------------------------------------

  test("streaming NFA equals the batch window form across batch splits") {
    // deterministic pseudo-random corpus: 6 convs × 60 events, typ cycles
    // with a conv-dependent stride so some convs match often, some never
    val rows = for {
      c <- 0 until 6
      i <- 0 until 60
    } yield {
      val h = (c * 131 + i * 31) % 7
      val typ = if (h < 2) "a" else if (h < 4) "b" else if (h < 6) "c" else "x"
      (s"c$c", (c * 1000 + i).toLong, typ, T0 + (i * 2L + c) * H)
    }
    val df = frame(rows: _*)
    val within = 8 * H
    val expect = Cep.matchStrict(df, col("conv"), col("ts"), col("idx"),
        steps, within)
      .select(col("key"), col("ids"), col("start_ts_us"))
      .as[(String, Seq[Long], Long)].collect().toSet

    val mask = steps.zipWithIndex.map { case (st, j) =>
      when(st.pred, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    implicit val s = spark
    val input = MemoryStream[(String, Long, String, Long)](spark)
    val events = input.toDS().toDF("conv", "idx", "typ", "us")
      .select(col("conv"), col("idx"), col("typ"),
        timestamp_micros(col("us")).as("ts"))
      .select(col("conv").as("convId"), col("idx"),
        unix_micros(col("ts")).as("tsUs"), mask.as("mask"), col("ts"))
      .withWatermark("ts", "1 minute")
      .as[CepEvent]
    val q = CepStream.matches(events, 3, within).writeStream
      .outputMode("append").format("memory").queryName("cep_out").start()
    // time-ordered arrival in 7 uneven chunks (watermark advances between)
    rows.sortBy(_._4).grouped(53).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    // far-future sentinel flushes every pending anchor
    input.addData(Seq(("zz", 999999L, "x", T0 + 10000 * H)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cep_out")
      .select(col("convId"), col("ids"), col("startTsUs"))
      .as[(String, Seq[Long], Long)].collect().toSet
    assert(got === expect)
  }
}
