package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ClosedSession, Event, StreamDoc, Streams}

/** Drives the Structured Streaming operators through real micro-batches
  * via MemoryStream (SURVEY.md §2.9: windows, watermark, custom state).
  */
class StreamsSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val H = 3600000000000L // 1 h in ns

  private def ev(id: Long, ts: Long, user: Long, typ: String): Event =
    Event(id, ts, user, typ, 1.0)

  test("tumbling window counts aggregate per event-time hour") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.tumblingCounts(in.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(Event(1, 10, 1, "click", 1.5),
        Event(2, 20, 1, "click", 0.25),
        Event(3, H + 10, 2, "view", 1.5))
      q.processAllAvailable()
      // total_value gated here (exact: 1.5+0.25 and 1.5 are binary64-
      // representable, and the replay oracle st_window_replay only
      // covers the count channel)
      val rows = spark.table("tumbling")
        .selectExpr("unix_timestamp(window.start) AS ws", "event_type",
          "n", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3)))
        .toSet
      assert(rows == Set((0L, "click", 2L, 1.75), (3600L, "view", 1L, 1.5)))
    } finally q.stop()
  }

  test("sessionize emits a closed session once the gap elapses") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // T well past epoch: an event-time-0 row ties the initial
      // watermark and the stateful operator's late filter drops it
      val T = 100 * H
      // batch 1: two events 10 min apart -> buffered (the deferred
      // machine folds only below the watermark), nothing out
      in.addData(ev(1, T, 7, "click"), ev(2, T + 600000000000L, 7, "click"))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0)
      // batch 2: event 2 h later raises the watermark past the first
      // session's gap deadline; the post-advance no-data batch fires
      // the drain timeout, folds the first two events, and closes the
      // session by inactivity
      in.addData(ev(3, T + 2 * H, 7, "click"))
      q.processAllAvailable()
      val out = spark.table("sessions").as[ClosedSession].collect().toSeq
      assert(out == Seq(
        ClosedSession(7, T, T + 600000000000L, 2, 600000000000L)), out)
      // batch 3: a DIFFERENT user far in the future drains user 7's
      // T+2h straggler, whose single-event session closes by the
      // long-passed gap deadline — no user-7 event needed
      in.addData(ev(4, T + 10 * H, 9, "click"))
      q.processAllAvailable()
      val out2 = spark.table("sessions").as[ClosedSession].collect().toSet
      assert(out2.contains(ClosedSession(7, T + 2 * H, T + 2 * H, 1, 0)), out2)
    } finally q.stop()
  }

  test("sessionize folds out-of-order arrivals by event time " +
       "(a late-delivered earlier event extends the span backward)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      val T = 100 * H
      val M20 = 1200000000000L // 20 min in ns, inside the 30-min delay
      // the LATER event arrives first; the earlier one is delivered 20
      // minutes out of order (above the watermark, so not dropped)
      in.addData(ev(2, T + M20, 7, "click"))
      q.processAllAvailable()
      in.addData(ev(1, T, 7, "click"))
      q.processAllAvailable()
      // a far-future event advances the watermark; the post-advance
      // no-data batch fires user 7's drain timeout
      in.addData(ev(3, T + 10 * H, 9, "click"))
      q.processAllAvailable()
      // ONE session spanning both events, start at the EARLIER ts —
      // the fold-on-arrival machine would have dragged the session end
      // backward to T and reported a zero-length tail instead
      val out = spark.table("sessions_ooo").as[ClosedSession].collect()
        .filter(_.user_id == 7L).toSeq
      assert(out == Seq(ClosedSession(7, T, T + M20, 2, M20)), out)
    } finally q.stop()
  }

  test("batch analog agrees: tumbling query over the events fixture") {
    val df = graft.operators.EventWindows
      .queries("st_tumbling_1h")(spark, "/root/testdata/sf0.001")
    val total = df.selectExpr("sum(n)").collect()(0).getLong(0)
    val events = Engine.table(spark, "/root/testdata/sf0.001", "events")
    assert(total == events.count())
  }

  test("file-source stream processes the events table as micro-batches") {
    val src = Files.createTempDirectory("graft-stream").toString
    Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(src, "events.parquet"))
    val q = Streams.tumblingCounts(Streams.eventFileStream(spark, src))
      .writeStream.format("memory").queryName("filestream")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val total = spark.table("filestream")
        .selectExpr("sum(n)").collect()(0).getLong(0)
      val expected =
        Engine.table(spark, "/root/testdata/sf0.001", "events").count()
      assert(total == expected)
    } finally q.stop()
  }

  test("dedupStream drops re-delivered ids within the watermark horizon") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      // timestamps well past epoch: rows at event-time 0 tie the
      // initial watermark and are dropped as late before any dedup
      in.addData(ev(1, 100 * H + 10, 1, "click"),
        ev(2, 100 * H + 20, 1, "click"))
      q.processAllAvailable()
      // an at-least-once source re-delivers event 1 (same id) plus a
      // genuinely new event in the same horizon
      in.addData(ev(1, 100 * H + 10, 1, "click"),
        ev(3, 100 * H + 30, 2, "view"))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dedupStream output is independent of micro-batch boundaries") {
    // The st_dedup_replay oracle pins ONE batch layout; this locks the
    // determinism argument it relies on — a re-delivered row is dropped
    // either as a state duplicate or, once its state expired, as a late
    // row — by replaying the same at-least-once feed under different
    // boundaries and asserting identical output sets.
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val T = 100 * H
    // 12 events at 1-h spacing (horizon is 30 min): re-delivering batch
    // k-1 into batch k makes BOTH drop branches fire — the predecessor
    // batch's last row (1 h behind the new max) still holds live state
    // (expiry ts+30min is ahead of the watermark max-30min) and drops
    // as a duplicate, while its earlier rows sit below the watermark,
    // their state already expired, and drop as late
    val originals = (1L to 12L).map(i => ev(i, T + i * H,
      i % 3, if (i % 2 == 0) "click" else "view"))
    def run(feed: Seq[Seq[Event]], sink: String): Set[Long] = {
      val in = MemoryStream[Event]
      val q = Streams.dedupStream(in.toDF())
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      try {
        feed.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()
      spark.table(sink).select("event_id")
        .collect().map(_.getLong(0)).toSet
    }
    // layout A: one batch, duplicates interleaved in-batch
    val a = run(Seq(originals.flatMap(e => Seq(e, e))), "dedup_bi_a")
    // layout B: four batches, each re-delivering its predecessor
    val batches = originals.grouped(3).toIndexedSeq
    val b = run(batches.zipWithIndex.map { case (bt, i) =>
      (if (i == 0) IndexedSeq.empty[Event] else batches(i - 1)) ++ bt
    }, "dedup_bi_b")
    assert(a == (1L to 12L).toSet)
    assert(b == a)
  }

  test("funnelStream advances steps in order and only forward in time") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.funnelStream(in.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 completes the funnel; user 2's purchase precedes the
      // click IN EVENT TIME (no step 3 — the machine folds by event
      // time, not arrival); a second view for user 1 must not re-emit
      in.addData(
        ev(1, 1000000000L, 1, "view"), ev(2, 2000000000L, 1, "click"),
        ev(3, 3000000000L, 1, "purchase"), ev(4, 4000000000L, 1, "view"),
        ev(5, 1000000000L, 2, "purchase"), ev(6, 2000000000L, 2, "view"),
        ev(7, 3000000000L, 2, "click"))
      q.processAllAvailable()
      // the machine defers until the watermark passes: flush with a
      // far-future non-step sentinel (advances the clock, no state),
      // then one more batch at the same ts to fire the drain timeouts
      in.addData(ev(-1, 4000000000L + 3 * H, -1, "view"))
      q.processAllAvailable()
      in.addData(ev(-2, 4000000000L + 3 * H, -1, "view"))
      q.processAllAvailable()
      val out = spark.table("funnel")
        .selectExpr("user_id", "step", "at_us").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(out == Set(
        (1L, 1, 1000000L), (1L, 2, 2000000L), (1L, 3, 3000000L),
        (2L, 1, 2000000L), (2L, 2, 3000000L)), out)
    } finally q.stop()
  }

  test("funnelStream folds out-of-order arrivals by event time " +
       "(click delivered before its view still advances)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.funnelStream(in.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("funnel_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      // the purchase and click ARRIVE in separate earlier batches than
      // the view, all within the watermark delay; the fold-on-arrival
      // design would advance nothing, the deferred machine must emit
      // the full 3-step funnel
      in.addData(ev(3, 3000000000L, 1, "purchase"))
      q.processAllAvailable()
      in.addData(ev(2, 2000000000L, 1, "click"))
      q.processAllAvailable()
      in.addData(ev(1, 1000000000L, 1, "view"))
      q.processAllAvailable()
      in.addData(ev(-1, 3000000000L + 3 * H, -1, "view"))
      q.processAllAvailable()
      in.addData(ev(-2, 3000000000L + 3 * H, -1, "view"))
      q.processAllAvailable()
      val out = spark.table("funnel_ooo")
        .selectExpr("user_id", "step", "at_us").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(out == Set(
        (1L, 1, 1000000L), (1L, 2, 2000000L), (1L, 3, 3000000L)), out)
    } finally q.stop()
  }

  test("funnelStream over the fixture reproduces the batch st_funnel counts") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.EventWindows.queries("st_funnel")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val in = MemoryStream[Event]
    val q = Streams.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("funnel_fx")
      .outputMode(OutputMode.Append()).start()
    try {
      // feed the whole fixture in one batch (the deferred machine
      // folds by event time, so feed order is immaterial), then flush
      // the buffered tail with the sentinel + fire-timeouts idiom
      val evs = Engine.table(spark, dir, "events")
        .selectExpr("event_id", "ts", "user_id", "event_type", "value")
        .as[Event].collect()
      in.addData(evs.toIndexedSeq)
      q.processAllAvailable()
      val flushTs = evs.map(_.ts).max + 2 * 86400000000000L
      in.addData(ev(-1, flushTs, -1, "view"))
      q.processAllAvailable()
      in.addData(ev(-2, flushTs, -1, "view"))
      q.processAllAvailable()
      val counts = spark.table("funnel_fx").groupBy("step").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(counts.getOrElse(1, 0L) == batch("step1_view"))
      assert(counts.getOrElse(2, 0L) == batch("step2_click"))
      assert(counts.getOrElse(3, 0L) == batch("step3_purchase"))
    } finally q.stop()
  }

  test("funnelStream drops an idle user's state after the TTL; " +
       "resurfacing restarts the funnel") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val D = 86400000000000L // 1 day in ns
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get.stateOperators(0).numRowsTotal
    val in = MemoryStream[Event]
    val q = Streams.funnelStream(in.toDS(), delay = "1 hour",
        idleTtlDays = 2L)
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 reaches step 2 on day 0, then goes idle (the advances
      // stay buffered until the watermark passes them)
      in.addData(ev(1, H, 1, "view"), ev(2, 2 * H, 1, "click"))
      q.processAllAvailable()
      assert(stateRows(q) == 1L)
      // offsets are a full millisecond: the step guards compare at
      // MICRO granularity (strict '>'), so a nanosecond-scale offset
      // would collapse to the same microsecond and advance nothing
      val M = 1000000L // 1 ms in ns
      // user 2's day-10 traffic pushes the watermark ~8 days past user
      // 1's idle-TTL boundary (day 2); the NEXT batch fires user 1's
      // timeout, which first drains the buffered steps 1+2 (emission
      // is never lost to expiry) and then removes the lapsed state ->
      // only user 2's state remains
      in.addData(ev(3, 10 * D, 2, "view"))
      q.processAllAvailable()
      in.addData(ev(4, 10 * D + M, 2, "click"))
      q.processAllAvailable()
      assert(stateRows(q) == 1L)
      val mid = spark.table("funnel_ttl")
        .selectExpr("user_id", "step", "at_us").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(mid == Set((1L, 1, H / 1000), (1L, 2, 2 * H / 1000)), mid)
      // user 1 resurfaces on day 11: with the old state expired, the
      // purchase finds no step-2 history and emits NOTHING (were the
      // state alive, it would advance to step 3); the later view then
      // restarts the funnel and re-emits step 1 — the documented
      // bounded-state approximation. Flush with the sentinel idiom.
      in.addData(ev(5, 11 * D, 1, "purchase"), ev(6, 11 * D + M, 1, "view"))
      q.processAllAvailable()
      in.addData(ev(-1, 14 * D, -1, "view"))
      q.processAllAvailable()
      in.addData(ev(-2, 14 * D, -1, "view"))
      q.processAllAvailable()
      val out = spark.table("funnel_ttl")
        .selectExpr("user_id", "step", "at_us").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(out == Set(
        (1L, 1, H / 1000), (1L, 2, 2 * H / 1000),
        (2L, 1, 10 * D / 1000), (2L, 2, (10 * D + M) / 1000),
        (1L, 1, (11 * D + M) / 1000)), out)
      // every REAL user has been flushed AND lapsed by day 14 - only
      // the sentinel user's own state remains (its far-future view is
      // never passed by the watermark, so it never emits)
      assert(stateRows(q) == 1L)
    } finally q.stop()
  }

  test("attributeStream joins purchases to clicks within the hour window") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Streams.attributeStream(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      // T well past epoch: initial-watermark ties at t=0 would drop rows
      val T = 100 * H
      // user 1: click, purchase 10 min later -> attributed;
      // user 2: purchase 2 h after the click -> outside the window;
      // user 3: purchase 5 min BEFORE any click -> never attributed
      clicks.addData(ev(1, T, 1, "click"), ev(2, T, 2, "click"),
        ev(3, T + 600000000000L, 3, "click"))
      purchases.addData(ev(11, T + 600000000000L, 1, "purchase"),
        ev(12, T + 2 * H, 2, "purchase"),
        ev(13, T + 300000000000L, 3, "purchase"))
      q.processAllAvailable()
      // advance both watermarks so all joinable pairs flush
      clicks.addData(ev(4, T + 10 * H, 9, "click"))
      purchases.addData(ev(14, T + 10 * H, 9, "purchase"))
      q.processAllAvailable()
      val out = spark.table("attrib")
        .selectExpr("user_id", "click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((1L, 1L, 11L), (9L, 4L, 14L)), out)
    } finally q.stop()
  }

  test("attributeStream's match set is independent of delivery order " +
       "within the watermark slack") {
    // The stream-stream range join is order-independent BY CONSTRUCTION
    // (each side buffers until the watermark passes the last possible
    // match) — this locks that claim the same way the dedupStream
    // boundary-independence test locks its oracle's assumption, so the
    // attribution replay gate needs no _ooo twin.
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val T = 100 * H
    // 3-min spacing keeps even a fully reversed 6-user span (18 min)
    // inside the 30-min watermark delay, so nothing is late-dropped
    val M3 = 180000000000L // 3 min in ns
    // 6 users: clicks at T + u*3min, purchases 3 min after each click
    // (all attributable)
    val clicks0 = (1L to 6L).map(u => ev(u, T + u * M3, u, "click"))
    val purch0 = (1L to 6L).map(u =>
      ev(10 + u, T + u * M3 + M3, u, "purchase"))
    def run(cs: Seq[Event], ps: Seq[Event], sink: String): Set[Any] = {
      val clicks = MemoryStream[Event]
      val purchases = MemoryStream[Event]
      val q = Streams.attributeStream(clicks.toDF(), purchases.toDF())
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append()).start()
      try {
        // two-batch lockstep feed; each side's second batch is the
        // first side's stragglers, so both sides see disorder
        val (c1, c2) = cs.splitAt(cs.size / 2)
        val (p1, p2) = ps.splitAt(ps.size / 2)
        clicks.addData(c1); purchases.addData(p1)
        q.processAllAvailable()
        clicks.addData(c2); purchases.addData(p2)
        q.processAllAvailable()
        clicks.addData(ev(99, T + 20 * H, 9, "click"))
        purchases.addData(ev(98, T + 20 * H + 1, 9, "purchase"))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(sink).filter("user_id < 9")
        .selectExpr("user_id", "click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)): Any).toSet
    }
    val inOrder = run(clicks0, purch0, "attrib_oi_a")
    // reversed within the slack: every batch delivers later-ts rows
    // before earlier ones
    val reversed = run(clicks0.reverse, purch0.reverse, "attrib_oi_b")
    assert(inOrder ==
      (1L to 6L).map(u => (u, u, 10 + u): Any).toSet, inOrder)
    assert(reversed == inOrder, reversed)
  }

  test("watermark drops events later than 30 minutes behind max time") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // Append mode: windows only emit once the watermark passes their end,
    // and late events beyond the watermark never resurrect them.
    val q = Streams.tumblingCounts(in.toDF())
      .writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, 10, 1, "click"), ev(2, 20, 1, "click"))
      q.processAllAvailable()
      // advance event time far past hour 0 + watermark
      in.addData(ev(3, 3 * H, 1, "view"))
      q.processAllAvailable()
      // hour-0 window is finalized with 2 events
      val closed = spark.table("late")
        .selectExpr("unix_timestamp(window.start) AS ws", "n").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(closed.get(0L).contains(2L))
      // a straggler for hour 0 arrives after the watermark -> dropped,
      // the finalized count never changes
      in.addData(ev(4, 30, 1, "click"))
      q.processAllAvailable()
      val after = spark.table("late")
        .selectExpr("unix_timestamp(window.start) AS ws", "n").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(after.get(0L).contains(2L))
    } finally q.stop()
  }

  test("retentionStream emits one hit per (user, day-offset), capped at 7") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val D = 86400000000000L // 1 day in ns
    val in = MemoryStream[Event]
    val q = Streams.retentionStream(in.toDS())
      .writeStream.format("memory").queryName("retention")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: active day 10 (cohort), twice on day 11 (one hit), day
      // 13; user 2: single day
      in.addData(ev(1, 10 * D + 5, 1, "view"), ev(2, 11 * D + 1, 1, "click"),
        ev(3, 11 * D + 2, 1, "view"), ev(4, 13 * D, 1, "view"),
        ev(5, 10 * D, 2, "view"))
      q.processAllAvailable()
      // next batch: the watermark (day-13 max minus 24 h = day 12)
      // late-drops the day-11 re-delivery before the operator sees it
      // (in-window re-activity dedup by mask is covered by the
      // finalized-branch case below); day 18 is offset 8 -> beyond the
      // cap, no hit
      in.addData(ev(6, 11 * D + 9, 1, "view"), ev(7, 18 * D, 1, "view"))
      q.processAllAvailable()
      val out = spark.table("retention")
        .selectExpr("user_id", "cohort_day", "day_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((1L, 10L, 0L), (1L, 10L, 1L), (1L, 10L, 3L),
        (2L, 10L, 0L)), out)
    } finally q.stop()
  }

  test("retentionStream metrics split disorder at the watermark cliff: " +
       "re-bases on the accumulator, drops on the listener") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val D = 86400000000000L // 1 day in ns
    val metrics = Streams.retentionMetrics(spark)
    // registerDropped both builds and registers (ADVICE r15: a
    // forgotten addListener left lateDropped silently 0)
    val listener = metrics.registerDropped(spark, "retention_obs")
    val in = MemoryStream[Event]
    val q = Streams.retentionStream(in.toDS(), metrics = Some(metrics))
      .writeStream.format("memory").queryName("retention_obs")
      .outputMode(OutputMode.Append()).start()
    try {
      // in-order feed: neither channel moves
      in.addData(ev(1, 10 * D, 1, "view"), ev(2, 10 * D + 5, 1, "view"))
      q.processAllAvailable()
      assert(metrics.rebases.value == 0L && metrics.lateDropped == 0L)
      // an earlier day within the 24 h delay (watermark is at day 9's
      // start; an hour in, since exactly-on-watermark rows are late-
      // dropped): delivered, re-bases the provisional cohort 10 -> 9,
      // counted exactly once
      in.addData(ev(3, 9 * D + H, 1, "view"))
      q.processAllAvailable()
      assert(metrics.rebases.value == 1L)
      // beyond the delay: day 5 is under the day-29 watermark, dropped
      // BEFORE the operator — invisible to the accumulator, surfaced
      // by the listener's numRowsDroppedByWatermark channel
      in.addData(ev(4, 30 * D, 2, "view"))
      q.processAllAvailable()
      in.addData(ev(5, 5 * D, 3, "view"))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 30000 // listener is async
      while (metrics.lateDropped == 0L &&
             System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(metrics.lateDropped >= 1L)
      assert(metrics.rebases.value == 1L) // the dropped row never re-based
    } finally { q.stop(); spark.streams.removeListener(listener) }
  }

  test("retentionStream over the fixture reproduces batch st_retention") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = graft.operators.EventWindows.queries("st_retention")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val in = MemoryStream[Event]
    // delay = the replay study horizon, exactly like the driver gate:
    // big enough that no cohort's state expires before the fixture
    // drains, small enough that the end-of-feed watermark finalizes
    // every cohort (see StreamReplay.RetentionReplayDelay)
    val q = Streams.retentionStream(in.toDS(), delay = "25 days")
      .writeStream.format("memory").queryName("retention_fx")
      .outputMode(OutputMode.Append()).start()
    try {
      val evs = Engine.table(spark, dir, "events")
        .selectExpr("event_id", "ts", "user_id", "event_type", "value")
        .as[Event].collect().sortBy(e => (e.ts, e.event_id))
      in.addData(evs.toIndexedSeq)
      q.processAllAvailable()
      // sentinel at the same max ts: one more micro-batch so every
      // user's finalization timeout fires against the end-of-feed
      // watermark (the sentinel itself stays pending, emits nothing)
      in.addData(ev(-1, evs.map(_.ts).max, -1, "view"))
      q.processAllAvailable()
      val counts = spark.table("retention_fx")
        .groupBy("cohort_day", "day_offset").count().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(counts == batch)
    } finally q.stop()
  }

  test("retentionStream drops a user's state once the retention window " +
       "lapses the watermark; resurfacing re-cohorts") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val D = 86400000000000L // 1 day in ns
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get.stateOperators(0).numRowsTotal
    val in = MemoryStream[Event]
    val q = Streams.retentionStream(in.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("retention_ttl")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: days 0 and 1 (an hour in — an event AT micro-epoch 0
      // sits exactly on the initial watermark and the late-row
      // predicate drops it; see nearDupStream's one-tick note). Cohort
      // day 0 is final from the initial watermark (0 >= day-0 start),
      // so both hits emit immediately
      in.addData(ev(1, H, 1, "view"), ev(2, D + H, 1, "view"))
      q.processAllAvailable()
      assert(stateRows(q) == 1L)
      // user 2 appears on day 20, pushing the watermark ~12 days past
      // user 1's window-lapse boundary (day 8); a following batch
      // fires user 1's expiry timeout -> only user 2's state remains
      in.addData(ev(3, 20 * D, 2, "view"))
      q.processAllAvailable()
      in.addData(ev(4, 20 * D + 10, 2, "view"))
      q.processAllAvailable()
      assert(stateRows(q) == 1L)
      // user 1 resurfaces on day 21: with the cohort-0 state expired
      // this is indistinguishable from a new user and REcohorts at day
      // 21 (the documented bounded-state approximation) — were the old
      // state still alive, day 21 would be offset 21 > 7 and emit
      // nothing. The day-23 traffic then finalizes both cohorts.
      in.addData(ev(5, 21 * D, 1, "view"), ev(6, 23 * D, 2, "view"))
      q.processAllAvailable()
      in.addData(ev(7, 23 * D + 10, 2, "view"))
      q.processAllAvailable()
      val out = spark.table("retention_ttl")
        .selectExpr("user_id", "cohort_day", "day_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((1L, 0L, 0L), (1L, 0L, 1L), (1L, 21L, 0L),
        (2L, 20L, 0L), (2L, 20L, 3L)), out)
      // post-finalization live path: user 1 is FINALIZED at cohort 21
      // now (the timeout fired once the watermark passed day 21), so a
      // fresh in-window day at/above the watermark (~day 23 - 1 h)
      // emits immediately through the per-event branch — the
      // steady-state production path, not the backlog flush — and the
      // same-day re-delivery dedups against the mask
      in.addData(ev(8, 23 * D + 20, 1, "view"), ev(9, 23 * D + 30, 1, "view"))
      q.processAllAvailable()
      val after = spark.table("retention_ttl")
        .selectExpr("user_id", "cohort_day", "day_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(after == out + ((1L, 21L, 2L)), after)
    } finally q.stop()
  }

  test("nearDupStream flags banded collisions against the bucket owner") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val other = "spark shuffles partition data across executors by key"
    val in = MemoryStream[StreamDoc]
    val q = Streams.nearDupStream(in.toDF())
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: owner + an identical doc (collides in all 4 bands) + an
      // unrelated doc (its own buckets, no collision)
      in.addData(StreamDoc(1, 100 * H, dup), StreamDoc(2, 100 * H + 10, dup),
        StreamDoc(3, 100 * H + 20, other))
      q.processAllAvailable()
      // batch 2: a later re-arrival also matches the STANDING owner
      in.addData(StreamDoc(4, 100 * H + 30, dup))
      q.processAllAvailable()
      // flush: the deferred fold emits once the watermark passes; the
      // far-future sentinel reuses the dup text so its band rows
      // advance the clock, lands in lapsed buckets, and emits nothing
      val flushTs = 100 * H + 3 * 1800L * 1000000000L
      in.addData(StreamDoc(-1, flushTs, dup))
      q.processAllAvailable()
      in.addData(StreamDoc(-2, flushTs, dup))
      q.processAllAvailable()
      val m = spark.table("neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(m.forall { case (d, o, _) => (d == 2L || d == 4L) && o == 1L },
        m.toSeq)
      assert(m.filter(_._1 == 2L).map(_._3).sorted.toSeq == Seq(0, 1, 2, 3),
        m.toSeq)
      assert(m.filter(_._1 == 4L).map(_._3).sorted.toSeq == Seq(0, 1, 2, 3),
        m.toSeq)
      assert(!m.exists(_._1 == 3L), m.toSeq)
    } finally q.stop()
  }

  test("nearDupStream evicts a lapsed owner after a quiet gap") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val horizonNs = 60L * 1000000000L // 60 s of bucket inactivity
    val t0 = 1000L * 1000000000L
    val in = MemoryStream[StreamDoc]
    val q = Streams.nearDupStream(in.toDF(), horizonNs)
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(StreamDoc(1, t0, dup))
      q.processAllAvailable()
      // 120 s later: the bucket lapsed, so doc 2 RE-OWNS it (no match)
      in.addData(StreamDoc(2, t0 + 2 * horizonNs, dup))
      q.processAllAvailable()
      // 10 s after that: doc 3 matches the NEW owner, never doc 1
      in.addData(StreamDoc(3, t0 + 2 * horizonNs + 10L * 1000000000L, dup))
      q.processAllAvailable()
      // flush the deferred fold (sentinel's own buckets lapse-re-own)
      val flushTs = t0 + 2 * horizonNs + 10L * 1000000000L + 3 * horizonNs
      in.addData(StreamDoc(-1, flushTs, dup))
      q.processAllAvailable()
      in.addData(StreamDoc(-2, flushTs, dup))
      q.processAllAvailable()
      val m = spark.table("neardup_evict").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!m.exists(_._1 == 2L), m.toString)
      assert(m.contains((3L, 2L)), m.toString)
      assert(!m.contains((3L, 1L)), m.toString)
    } finally q.stop()
  }

  test("nearDupStream crowns the event-time-earliest collider as owner " +
       "even when it arrives later") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val horizonNs = 60L * 1000000000L
    val t0 = 1000L * 1000000000L
    val in = MemoryStream[StreamDoc]
    val q = Streams.nearDupStream(in.toDF(), horizonNs)
      .writeStream.format("memory").queryName("neardup_ooo")
      .outputMode(OutputMode.Append()).start()
    try {
      // doc 2 (later event time) ARRIVES first; doc 1 (earlier) is
      // delivered out of order, inside the horizon-sized watermark
      // delay. The fold-on-arrival machine would crown doc 2; the
      // deferred fold must crown doc 1 and match doc 2 against it.
      in.addData(StreamDoc(2, t0 + 10L * 1000000000L, dup))
      q.processAllAvailable()
      in.addData(StreamDoc(1, t0, dup))
      q.processAllAvailable()
      val flushTs = t0 + 10L * 1000000000L + 3 * horizonNs
      in.addData(StreamDoc(-1, flushTs, dup))
      q.processAllAvailable()
      in.addData(StreamDoc(-2, flushTs, dup))
      q.processAllAvailable()
      val m = spark.table("neardup_ooo").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(m == Set((2L, 1L)), m.toString)
    } finally q.stop()
  }

  test("mm ingest projects the payload away before the stateful dedup") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[graft.streaming.StreamMedia]
    val df = Streams.mmIngestStream(in.toDF())
    // the scale claim, pinned structurally: the binary payload column
    // must not be in scope below the stateful operator — only (digest,
    // metadata) rows reach the shuffle and the state store
    val fmg = df.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical
          .FlatMapGroupsWithState => f
    }
    assert(fmg.nonEmpty)
    fmg.foreach { f =>
      assert(!f.child.output.exists(_.name == "payload"),
        f.child.output.map(_.name))
    }
  }
}
