package graft

import org.apache.spark.sql.functions._

import graft.engine.{EventOps, IngestOps, StreamOps, Tables}

/** Batch==stream equivalence for the windowed event aggregations
  * (SURVEY §7.5: streaming state has no DuckDB oracle; validated by
  * running the identical aggregation in both modes). */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling window equals batch tumbling window") {
    val q = StreamOps.streamingTumbling(spark, sf, "stream_tumbling")
    try {
      q.processAllAvailable()
    } finally q.stop()
    // append mode only emits windows closed by the watermark; compare
    // on the emitted subset.
    val streamed = spark.table("stream_tumbling")
      .orderBy(col("win_start"), col("event_type"))
      .collect()
    assert(streamed.nonEmpty, "watermark should close most 10-minute windows")
    val batchAll = StreamOps.tumbling(Tables.events(spark, sf))
    val batchMap = batchAll.collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    streamed.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(2))
      val expected = batchMap(key)
      assert((r.getLong(3), r.getDouble(4)) == expected, s"window $key differs")
    }
  }

  test("streamed ingest (Trigger.AvailableNow) lands exactly the batch loop's rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_ingstream_").toString
    val orders = Tables.orders(spark, sf)
    val streamed = IngestOps.ingestStream(spark, orders, base)
    val batch = IngestOps.ingestBatch(spark, orders, s"$base/batch_out")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
    val s1 = key(streamed)
    assert(s1.nonEmpty && s1 == key(batch),
      "the streaming and batch ingest paths must land identical data")
    // re-running with no new pages staged is a no-op: the checkpointed
    // file log skips every already-processed landing file
    val again = IngestOps.ingestStream(spark, orders, base)
    assert(key(again) == s1, "AvailableNow re-run must not duplicate rows")
  }

  test("streaming keyed MV maintenance converges to the batch aggregate via per-batch upserts") {
    import graft.engine.Exact.decSum
    val base = java.nio.file.Files.createTempDirectory("graft_mvstream_").toString
    val orders = Tables.orders(spark, sf)
    IngestOps.stageFixture(spark, orders, s"$base/landing")
    val mv = IngestOps.runMvMaintain(spark, s"$base/landing", s"$base/mv", s"$base/ckpt")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("o_orderpriority"), col("total_price"), col("n_orders"))
      .orderBy(col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val direct = orders.filter(col("o_orderkey") <= 6000)
      .groupBy(col("o_orderpriority"))
      .agg(decSum(col("o_totalprice")).as("total_price"), count(lit(1)).as("n_orders"))
    assert(key(mv) == key(direct),
      "after draining the zone, the streamed MV must equal the batch aggregate")
    // no new pages staged → AvailableNow finds nothing → MV untouched
    val again = IngestOps.runMvMaintain(spark, s"$base/landing", s"$base/mv", s"$base/ckpt")
    assert(key(again) == key(direct))
  }

  test("streaming session window equals batch session window on the emitted subset") {
    val q = StreamOps.streamingSessions(spark, sf, "stream_sessions")
    try {
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_sessions").collect()
    assert(streamed.nonEmpty, "watermark should close most 5-minute-gap sessions")
    val batchMap = StreamOps.sessions(Tables.events(spark, sf)).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)) ->
                (r.getLong(3), r.getDouble(4)))
      .toMap
    streamed.foreach { r =>
      val key = (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))
      val expected = batchMap.get(key)
      assert(expected.contains((r.getLong(3), r.getDouble(4))),
        s"session $key differs: streamed (${r.getLong(3)}, ${r.getDouble(4)}) vs batch $expected")
    }
  }

  test("watermark drops data later than the delay; on-time windows are unaffected") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val agg = input.toDF().toDF("sec", "k")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("k"), col("n"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("wm_drop").start()
    try {
      // batch 1: two on-time events in window [0,10) + one at 30min
      // that advances the watermark to 20min, closing [0,10)
      input.addData((60L, "a"), (120L, "a"), (1800L, "b"))
      q.processAllAvailable()
      // batch 2: a LATE event for [0,10) — event time 2min is behind
      // the 20min watermark, so it must be dropped, not re-aggregated
      input.addData((120L, "a"))
      q.processAllAvailable()
      // batch 3: advance the watermark past window [30,40) to flush it
      input.addData((3600L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("wm_drop").collect()
      .map(r => (r.getTimestamp(0).toInstant.getEpochSecond, r.getString(1)) -> r.getLong(2))
      .toMap
    assert(rows((0L, "a")) == 2L,
      s"late event must not change the closed window: $rows")
    assert(rows.get((1800L, "b")).contains(1L), s"on-time window missing: $rows")
  }

  test("streaming dedup drops ids re-delivered within the watermark horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val deduped = StreamOps.streamingDedup(
      input.toDF().toDF("event_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))),
      Seq("event_id"))
    val q = deduped.select(col("event_id")).writeStream
      .outputMode("append").format("memory").queryName("dedup_stream").start()
    try {
      input.addData((1L, 60L), (2L, 70L), (3L, 80L))
      q.processAllAvailable()
      // id 2 re-delivered in a later batch, still within the horizon
      input.addData((2L, 90L), (4L, 100L))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L), s"re-delivered id must be dropped once: $ids")
  }

  test("mapGroupsWithState running totals match the batch aggregate over the same data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Double)]
    val q = StreamOps.runningUserTotals(input.toDS())
      .toDF("user_id", "n", "sum_value")
      .writeStream.outputMode("update").format("memory")
      .queryName("running_totals").start()
    val batch1 = Seq((1L, 2.0), (1L, 3.0), (2L, 5.0))
    val batch2 = Seq((1L, 4.0), (3L, 7.0))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // update mode emits one row per touched user per batch; the LAST
    // emission per user is the running total — compare against the
    // batch group-by over everything fed
    val last = spark.table("running_totals").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).maxBy(_._1) }
    val expected = (batch1 ++ batch2).groupBy(_._1)
      .map { case (u, rows) => u -> (rows.size.toLong, rows.map(_._2).sum) }
    assert(last == expected, s"state totals $last != batch $expected")
  }

  test("flatMapGroupsWithState emits one alert per threshold crossing, none otherwise") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Double)]
    val q = StreamOps.thresholdAlerts(input.toDS(), threshold = 10.0)
      .toDF("user_id", "level", "total")
      .writeStream.outputMode("append").format("memory")
      .queryName("alerts").start()
    try {
      // user 1 reaches 8 (no alert), then 23 (crosses 10 and 20:
      // two alerts); user 2 reaches 9.5 (no alert)
      input.addData((1L, 8.0), (2L, 9.5))
      q.processAllAvailable()
      input.addData((1L, 15.0))
      q.processAllAvailable()
    } finally q.stop()
    val alerts = spark.table("alerts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(alerts == Set((1L, 1L), (1L, 2L)), s"got $alerts")
  }

  test("streaming last-touch attribution equals the batch window form across a batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val minUs = 60L * 1000000L
    // (user, event_id, ts_us, type); the marketing→purchase edge
    // crosses the micro-batch boundary for user 1
    val batch1 = Seq((1L, 1L, 0 * minUs, "view"), (1L, 2L, 5 * minUs, "purchase"),
      (2L, 5L, 1 * minUs, "purchase"))
    val batch2 = Seq((1L, 3L, 10 * minUs, "click"), (1L, 4L, 30 * minUs, "purchase"))
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = StreamOps.streamingLastTouch(input.toDS())
      .toDF("user_id", "purchase_id", "attr_event_id", "gap_us", "attr_type")
      .writeStream.outputMode("append").format("memory")
      .queryName("last_touch").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("last_touch").collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    val batch = EventOps.lastTouchAttribution(
        (batch1 ++ batch2).toDF("user_id", "event_id", "us", "event_type")
          .select(col("user_id"), col("event_id"),
            timestamp_micros(col("us")).as("ts"), col("event_type")))
      .collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3), if (r.isNullAt(5)) -1L else r.getLong(5)))
      .toMap
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed(4L) == ((3L, 20 * minUs)), "cross-batch state must carry the click")
  }

  test("streaming transitions equal the batch lead window across a batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val minUs = 60L * 1000000L
    // user 1's view->click edge crosses the batch boundary
    val batch1 = Seq((1L, 1L, 0 * minUs, "view"), (2L, 4L, 1 * minUs, "view"))
    val batch2 = Seq((1L, 2L, 10 * minUs, "click"), (1L, 3L, 20 * minUs, "purchase"),
      (2L, 5L, 2 * minUs, "view"))
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = StreamOps.streamingTransitions(input.toDS())
      .toDF("prev_type", "next_type", "user_id", "event_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("transitions").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("transitions")
      .groupBy(col("prev_type"), col("next_type")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = EventOps.eventTransitions(
        (batch1 ++ batch2).toDF("user_id", "event_id", "us", "event_type")
          .select(col("user_id"), col("event_id"),
            timestamp_micros(col("us")).as("ts"), col("event_type")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed(("view", "click")) == 1L, "cross-batch edge must carry")
  }

  test("streaming admission equals the batch gate across a split; budget exhausts mid-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // source A: docs of 4 tokens each, budget 10 -> docs 1,2 admit
    // (cum 4, 8), doc 5 (cum 12) rejects IN BATCH 2 — the exhaustion
    // crosses the boundary; source B budget 0 -> reject-by-default
    def text(n: Int) = ("tok " * n).trim
    val batch1 = Seq(("A", 1L, text(4)), ("A", 2L, text(4)), ("B", 3L, text(2)))
    val batch2 = Seq(("A", 5L, text(4)), ("B", 6L, text(1)))
    val alloc = Map("A" -> 10L)
    def toks(s: String) = s.split(" ").count(_.nonEmpty).toLong
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamOps.streamingAdmission(input.toDS(), alloc)
      .toDF("source", "doc_id", "n_toks", "cum_tokens", "admitted")
      .writeStream.outputMode("append").format("memory")
      .queryName("admission").start()
    try {
      input.addData(batch1.map { case (s, id, t) => (s, id, toks(t)) }: _*)
      q.processAllAvailable()
      input.addData(batch2.map { case (s, id, t) => (s, id, toks(t)) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("admission").collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(streamed(1L) == ((4L, true)) && streamed(2L) == ((8L, true)))
    assert(streamed(5L) == ((12L, false)), "exhaustion must carry across the batch boundary")
    assert(streamed(3L) == ((2L, false)) && streamed(6L) == ((3L, false)),
      "unknown source rejects by default")
    // stream ≡ the batch gate over the same fed corpus and allocations:
    // batch cumsum per source in doc_id order against the same budgets
    val docs = (batch1 ++ batch2)
      .map { case (s, id, t) => (id, t, "en", s) }
      .toDF("doc_id", "text", "lang", "source")
    val batchGate = graft.engine.CorpusOps.budgetAdmission(docs, totalBudget = 10L)
    // budgetAdmission derives ITS allocations from the water-fill; for
    // the equivalence check use the same per-source budgets via the
    // cumsum directly
    val batchCum = batchGate.collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(batchCum == streamed.view.mapValues(_._1).toMap,
      "running counts must agree between stream and batch")
  }

  test("streaming lateness rollup equals the batch audit across a batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max => smax, sum => ssum, timestamp_micros, when => swhen, lit => slit, count => scount}
    val minUs = 60L * 1000000L
    // arrival order 1..6; event 3 lands 15 min behind the running max
    // (> the 10 min bound -> late), and event 6 lands 11 min behind a
    // max that CARRIED across the batch boundary
    val batch1 = Seq((1L, 1L, 10 * minUs, "A"), (2L, 2L, 20 * minUs, "B"),
      (3L, 3L, 5 * minUs, "A"))
    val batch2 = Seq((4L, 4L, 30 * minUs, "B"), (5L, 5L, 29 * minUs, "A"),
      (6L, 6L, 19 * minUs, "B"))
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = StreamOps.streamingLateness(input.toDS())
      .toDF("event_type", "event_id", "disorder_us")
      .writeStream.outputMode("append").format("memory")
      .queryName("lateness").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("lateness")
      .groupBy(col("event_type"))
      .agg(scount(slit(1)).cast("long").as("n_events"),
        ssum(swhen(col("disorder_us") > 600000000L, 1L).otherwise(0L)).as("n_late"),
        smax(col("disorder_us")).as("max_disorder_us"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = EventOps.latenessAudit(
        (batch1 ++ batch2).toDF("user_id", "event_id", "us", "event_type")
          .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
            col("user_id"), col("event_type")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed("A") == ((3L, 1L, 15L * minUs)), "the 15-min late event flags")
    assert(streamed("B") == ((3L, 1L, 11L * minUs)),
      "the cross-batch carried max must score event 6's 11-min disorder")
    // the live sink also feeds the watermark-advice percentile pass:
    // sink-rollup advice must equal the batch advice over the same feed
    val sinkAdvice = EventOps.watermarkAdviceFromDisorder(
        spark.table("lateness").select(col("event_type"), col("disorder_us")))
      .collect().map(_.toString).toSeq
    val batchAdvice = EventOps.watermarkAdvice(
        (batch1 ++ batch2).toDF("user_id", "event_id", "us", "event_type")
          .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
            col("user_id"), col("event_type")))
      .collect().map(_.toString).toSeq
    assert(sinkAdvice == batchAdvice, s"sink $sinkAdvice != batch $batchAdvice")
  }

  test("streaming spikes equal the batch detector on closed days across a batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val dayUs = 86400000000L
    def ev(id: Long, day: Long, i: Long, typ: String) =
      (1L, id, day * dayUs + i * 1000000L, typ)
    // type A: 2, 2, then a 10-event spike day, then day 3 opens (and
    // stays open — unreported); day 1 SPANS the batch boundary.
    // type B: cold-start day 0 (3 events, unflagged), day 1 opens.
    val batch1 = Seq(ev(1, 0, 1, "A"), ev(2, 0, 2, "A"), ev(3, 1, 1, "A"),
      ev(20, 0, 1, "B"), ev(21, 0, 2, "B"), ev(22, 0, 3, "B"))
    val batch2 = Seq(ev(4, 1, 2, "A")) ++
      (5L to 14L).map(i => ev(i, 2, i - 4, "A")) ++
      Seq(ev(15, 3, 1, "A"), ev(23, 1, 1, "B"))
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = StreamOps.streamingSpikes(input.toDS())
      .toDF("event_type", "d", "n", "trailing_n", "trailing_days", "spike")
      .writeStream.outputMode("append").format("memory")
      .queryName("spikes").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("spikes").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val batchAll = EventOps.dailySpikes(
        (batch1 ++ batch2).toDF("user_id", "event_id", "us", "event_type")
          .select(col("user_id"), col("event_id"),
            timestamp_micros(col("us")).as("ts"), col("event_type")))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // stream emits exactly the CLOSED days = batch minus each type's
    // still-open max day
    val lastDay = batchAll.keys.groupBy(_._1).map { case (t, ks) => t -> ks.map(_._2).max }
    val closed = batchAll.filter { case ((t, d), _) => d < lastDay(t) }
    assert(streamed == closed, s"stream $streamed != batch-closed $closed")
    // the planted spike day flags, with the exact trailing accounting
    assert(streamed(("A", 2L)) == ((10L, 4L, 2L, true)))
    assert(streamed(("B", 0L)) == ((3L, 0L, 0L, false)), "cold start never flags")
  }

  test("streaming funnel first-reach counts equal the batch funnel across a batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct, timestamp_micros}
    val minUs = 60L * 1000000L
    // user 1 converts across the batch boundary (view in batch 1,
    // click+purchase in batch 2); user 2's early purchase must not
    // count; user 3 never views
    val batch1 = Seq((1L, 1L, 0 * minUs, "view"),
      (2L, 4L, 1 * minUs, "purchase"), (2L, 5L, 2 * minUs, "view"),
      (3L, 7L, 1 * minUs, "click"))
    val batch2 = Seq((1L, 2L, 10 * minUs, "click"), (1L, 3L, 30 * minUs, "purchase"),
      (2L, 6L, 3 * minUs, "click"), (3L, 8L, 2 * minUs, "purchase"))
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = StreamOps.streamingFunnel(input.toDS())
      .toDF("user_id", "stage", "event_id", "ts_us")
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_reach").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val reach = spark.table("funnel_reach")
    // a user first-reaches each stage at most once, in stage order
    val perUser = reach.collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(perUser.distinct.length == perUser.length, "one first-reach per (user, stage)")
    val streamed = reach.groupBy(col("stage"))
      .agg(countDistinct(col("user_id")).as("n_users")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batch = EventOps.funnel(
        (batch1 ++ batch2).toDF("user_id", "event_id", "us", "event_type")
          .select(col("user_id"), col("event_id"),
            timestamp_micros(col("us")).as("ts"), col("event_type")))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(streamed.getOrElse(1, 0L) == batch("view"), s"stream $streamed batch $batch")
    assert(streamed.getOrElse(2, 0L) == batch("click"), s"stream $streamed batch $batch")
    assert(streamed.getOrElse(3, 0L) == batch("purchase"), s"stream $streamed batch $batch")
    // the cross-batch conversion and the ignored early purchase
    assert(streamed == Map(1 -> 2L, 2 -> 2L, 3 -> 1L), s"got $streamed")
  }

  test("event-time timeout sessionization equals batch sessionize; the watermark closes sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val real = Seq(
      (1L, 1L, t("2026-01-01 10:00:00")), (1L, 2L, t("2026-01-01 10:10:00")),
      (1L, 3L, t("2026-01-01 10:20:00")), (1L, 4L, t("2026-01-01 10:51:00")),
      (2L, 5L, t("2026-01-01 09:00:00")), (2L, 6L, t("2026-01-01 09:30:00")))
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = StreamOps.streamingSessionize(input.toDS().toDF("user_id", "event_id", "ts"))
      .toDF("user_id", "session_id", "n_events", "start_us", "duration_us")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_state").start()
    try {
      input.addData(real.take(3) ++ real.drop(4): _*) // both users' opening events
      q.processAllAvailable()
      input.addData(real(3)) // the >30min jump closes user 1's first session inline
      q.processAllAvailable()
      // two sentinel batches: the first raises max event time, the
      // second runs with the advanced watermark so timeouts fire —
      // no real user ever sends another event, yet their sessions close
      input.addData((99L, 100L, t("2026-01-01 13:00:00")))
      q.processAllAvailable()
      input.addData((99L, 101L, t("2026-01-01 13:00:01")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sessions_state").collect()
      .filter(_.getLong(0) != 99L)
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val batch = graft.engine.EventOps.sessionize(
      real.toDF("user_id", "event_id", "ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), unixMicros(r.getTimestamp(3)), r.getLong(5))).toMap
    assert(got == batch, s"stream $got != batch $batch")
    // every emission is unique: timeout + inline close never double-emit
    assert(spark.table("sessions_state").count() ==
      spark.table("sessions_state").distinct().count())
  }

  test("streaming conversation packing equals the batch manifest on every finalized session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{StreamOps, TemporalOps}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // seqLen = 4 so user 1's second conversation SPLITS across a
    // sequence boundary (cum_before 3, n 3 -> start_seq 0, end_seq 1)
    val real = Seq(
      (1L, 1L, t("2026-01-01 10:00:00")), (1L, 2L, t("2026-01-01 10:01:00")),
      (1L, 3L, t("2026-01-01 10:02:00")),
      (1L, 4L, t("2026-01-01 10:20:00")), (1L, 5L, t("2026-01-01 10:21:00")),
      (1L, 6L, t("2026-01-01 10:22:00")),
      (1L, 7L, t("2026-01-01 11:00:00")), (1L, 8L, t("2026-01-01 11:01:00")),
      (2L, 9L, t("2026-01-01 09:00:00")), (2L, 10L, t("2026-01-01 09:01:00")),
      (2L, 11L, t("2026-01-01 09:30:00")))
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = StreamOps.streamingSessionPack(
        input.toDS().toDF("user_id", "event_id", "ts"), seqLen = 4)
      .toDF("user_id", "session_id", "n_events", "start_seq", "end_seq",
        "tok_offset")
      .writeStream.outputMode("append").format("memory")
      .queryName("session_pack").start()
    try {
      val (b1, b2) = real.partition(_._3.before(t("2026-01-01 10:21:30")))
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      // sentinel pair: raise max event time, then run with the
      // advanced watermark so the final open sessions time out
      input.addData((99L, 100L, t("2026-01-01 13:00:00")))
      q.processAllAvailable()
      input.addData((99L, 101L, t("2026-01-01 13:00:01")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("session_pack").collect()
      .filter(_.getLong(0) != 99L)
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val batch = TemporalOps.sessionPackManifest(
        real.toDF("user_id", "event_id", "ts"), seqLen = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == batch, s"stream $got != batch $batch")
    // the boundary split is real: one emitted conversation spans two
    // training sequences
    assert(got.values.exists(v => v._2 < v._3),
      "fixture must exercise a cross-sequence split")
    // exact-once: inline close + timeout never double-emit
    assert(spark.table("session_pack").count() ==
      spark.table("session_pack").distinct().count())
  }

  test("streaming pack folds late out-of-order events into closed-but-unwatermarked conversations") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{StreamOps, TemporalOps}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // ADVICE r15 fixture: batch 1 gap-jumps past user 1's first
    // conversation (10:08 − 10:01 = 7 min ≥ 5) — the old inline-close
    // form would have EMITTED it then and misfiled the late 10:03
    // arrival into the newer session. The 10:03/10:04 events in batch
    // 2 are within the 10-minute watermark delay (wm after batch 1 =
    // 9:58): 10:03 must fold into user 1's closed-but-unwatermarked
    // first conversation; user 2's 10:04 must MERGE its two buffered
    // singleton sessions into one 3-event conversation.
    val real = Seq(
      (1L, 1L, t("2026-01-01 10:00:00")), (1L, 2L, t("2026-01-01 10:01:00")),
      (1L, 3L, t("2026-01-01 10:08:00")),
      (2L, 4L, t("2026-01-01 10:00:00")), (2L, 5L, t("2026-01-01 10:08:00")),
      (1L, 6L, t("2026-01-01 10:03:00")), (2L, 7L, t("2026-01-01 10:04:00")))
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = StreamOps.streamingSessionPack(
        input.toDS().toDF("user_id", "event_id", "ts"), seqLen = 4)
      .toDF("user_id", "session_id", "n_events", "start_seq", "end_seq",
        "tok_offset")
      .writeStream.outputMode("append").format("memory")
      .queryName("session_pack_late").start()
    try {
      input.addData(real.take(5): _*)
      q.processAllAvailable()
      input.addData(real.drop(5): _*) // the late arrivals
      q.processAllAvailable()
      input.addData((99L, 100L, t("2026-01-01 13:00:00")))
      q.processAllAvailable()
      input.addData((99L, 101L, t("2026-01-01 13:00:01")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("session_pack_late").collect()
      .filter(_.getLong(0) != 99L)
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val batch = TemporalOps.sessionPackManifest(
        real.toDF("user_id", "event_id", "ts"), seqLen = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == batch, s"stream $got != batch $batch")
    // the fixture bites: user 1 conv 1 absorbed the late event (n=3)
    // and user 2's two singletons merged into one conversation
    assert(got((1L, 1L))._1 == 3L, s"late event must fold into conv 1: $got")
    assert(got((2L, 1L))._1 == 3L && !got.contains((2L, 2L)),
      s"bridging late event must merge user 2's sessions: $got")
    assert(spark.table("session_pack_late").count() ==
      spark.table("session_pack_late").distinct().count())
  }

  test("streaming sessionize folds late out-of-order events under the watermark buffer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // Same shape as the pack late-data fixture but on the q33 law
    // (split strictly > gap) with gap 5: the 10:03 late arrival lands
    // in user 1's gap-jumped first session; 10:04 bridges user 2's.
    val real = Seq(
      (1L, 1L, t("2026-01-01 10:00:00")), (1L, 2L, t("2026-01-01 10:01:00")),
      (1L, 3L, t("2026-01-01 10:08:00")),
      (2L, 4L, t("2026-01-01 10:00:00")), (2L, 5L, t("2026-01-01 10:08:00")),
      (1L, 6L, t("2026-01-01 10:03:00")), (2L, 7L, t("2026-01-01 10:04:00")))
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = StreamOps.streamingSessionize(
        input.toDS().toDF("user_id", "event_id", "ts"), gapMinutes = 5)
      .toDF("user_id", "session_id", "n_events", "start_us", "duration_us")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_late").start()
    try {
      input.addData(real.take(5): _*)
      q.processAllAvailable()
      input.addData(real.drop(5): _*)
      q.processAllAvailable()
      input.addData((99L, 100L, t("2026-01-01 13:00:00")))
      q.processAllAvailable()
      input.addData((99L, 101L, t("2026-01-01 13:00:01")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sessions_late").collect()
      .filter(_.getLong(0) != 99L)
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val batch = graft.engine.EventOps.sessionize(
        real.toDF("user_id", "event_id", "ts"), gapMinutes = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), unixMicros(r.getTimestamp(3)), r.getLong(5))).toMap
    assert(got == batch, s"stream $got != batch $batch")
    // the law divergence is visible on the SAME fixture: q33 joins the
    // exactly-5-minute jump (> splits), so user 1 is ONE 4-event
    // session here while the pack family (≥ splits) made it 3 + 1
    assert(got((1L, 1L))._1 == 4L && got((2L, 1L))._1 == 3L,
      s"late arrivals must fold into the buffered sessions: $got")
  }

  private def unixMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  test("watermarked stream-stream interval join matches the batch interval join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val impIn = MemoryStream[(Long, Long, Long)] // (user, imp_id, sec)
    val clkIn = MemoryStream[(Long, Long, Long)] // (user, click_id, sec)
    def shape(df: org.apache.spark.sql.DataFrame, u: String, id: String, ts: String) =
      df.toDF(u, id, "sec").withColumn(ts, timestamp_seconds(col("sec"))).drop("sec")
    val joined = StreamOps.impressionClickJoin(
      shape(impIn.toDF(), "imp_user", "imp_id", "imp_ts"),
      shape(clkIn.toDF(), "click_user", "click_id", "click_ts"))
    val q = joined.select(col("imp_id"), col("click_id")).writeStream
      .outputMode("append").format("memory").queryName("attrib").start()
    // user 1: click 300s after impression (inside 10min); a second
    // click at 3000s (outside); user 2: click before any impression
    val imps = Seq((1L, 100L, 60L), (2L, 200L, 500L))
    val clicks = Seq((1L, 900L, 360L), (1L, 901L, 3060L), (2L, 902L, 400L))
    try {
      impIn.addData(imps: _*)
      q.processAllAvailable()
      clkIn.addData(clicks: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("attrib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (u, i, it) <- imps; (cu, c, ct) <- clicks
      if u == cu && ct >= it && ct <= it + 600
    } yield (i, c)).toSet
    assert(streamed == expected, s"streamed $streamed != batch $expected")
    assert(expected == Set((100L, 900L)), "fixture sanity: exactly one attributed click")
  }

  test("stream-static enrichment join matches the batch join per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = StreamOps.enrich(input.toDF().toDF("user_id", "value"), dim, Seq("user_id"))
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    try {
      input.addData((1L, 5.0), (2L, 7.0), (3L, 9.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enriched").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    // inner join: user 3 has no dim row and is dropped; tiers resolve
    assert(rows == Set((1L, 5.0, "gold"), (2L, 7.0, "basic")))
  }

  test("session windows never overlap per user and respect the gap") {
    val sessions = StreamOps.sessions(Tables.events(spark, sf)).collect()
    sessions.groupBy(_.getLong(2)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getTimestamp(0).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next session starts at or after previous end (gap >= 5 min)
          assert(!b.getTimestamp(0).before(a.getTimestamp(1)))
        case _ =>
      }
    }
  }

  test("streaming near-dedup verdicts equal q109 across a micro-batch boundary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, sf)
    // stored corpus sketches (the SketchShared shape) for history,
    // new docs arriving as a stream split across TWO micro-batches —
    // each doc's verdict depends only on (doc, store), so the split
    // point must not matter
    val storedSigs = graft.engine.DedupOps
      .minhashSignatures(docs.filter(col("doc_id") < 450)).localCheckpoint(false)
    val newDocs = docs.filter(col("doc_id") >= 450)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    val (feed1, feed2) = newDocs.splitAt(newDocs.length / 2)
    val out = java.nio.file.Files.createTempDirectory("graft_snd_out_").toString + "/v"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_snd_ckpt_").toString
    val input = MemoryStream[(Long, String, String, String)]
    val q = StreamOps.streamingNearDedup(
      input.toDS().toDF("doc_id", "text", "lang", "source"), storedSigs, out, ckpt)
    try {
      input.addData(feed1.toSeq: _*)
      q.processAllAvailable()
      input.addData(feed2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val batch = graft.engine.DedupOps.incrementalNearDedup(docs, splitId = 450).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(streamed.length == batch.length && streamed.toSeq == batch.toSeq,
      s"streaming near-dedup diverged from q109 (${streamed.length} vs ${batch.length} rows)")
    assert(streamed.exists(!_._3), "fixture must contain at least one dropped near-dup")
  }

  test("streaming IVF assignment equals the batch assignment across a micro-batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{SimilarityOps, StreamOps, Tables}
    val emb = Tables.embeddings(spark, sf)
    val index = SimilarityOps.ivfIndexFor(emb, tag = sf)
    val feed = emb.filter(col("vec_id") % 5 === 2)
      .select(col("vec_id") + lit(3000000L), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (f1, f2) = feed.splitAt(feed.length / 2)
    val out = java.nio.file.Files.createTempDirectory("graft_siv_out_").toString + "/a"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_siv_ckpt_").toString
    val input = MemoryStream[(Long, Array[Float])]
    val builds0 = SimilarityOps.indexBuilds
    val q = StreamOps.streamingIvfAssign(
      input.toDS().toDF("vec_id", "embedding"), index, out, ckpt)
    try {
      input.addData(f1.toSeq: _*)
      q.processAllAvailable()
      input.addData(f2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(SimilarityOps.indexBuilds == builds0, "streaming assignment must never re-fit")
    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val batch = SimilarityOps.ivfIncrementalAssign(index,
        emb.filter(col("vec_id") % 5 === 2)
          .select((col("vec_id") + lit(3000000L)).as("vec_id"), col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(streamed == batch,
      s"streamed assignments diverged (${streamed.length} vs ${batch.length} rows)")
    assert(streamed.nonEmpty)
  }

  test("streaming IVF maintenance equals q235 batch report; far-cluster batch flags in-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{SimilarityOps, StreamOps, Tables}
    val emb = Tables.embeddings(spark, sf)
    val index = SimilarityOps.ivfIndexFor(emb, tag = sf)
    // tick 1: ordinary vectors (shifted copies of stored ones); tick 2:
    // a planted far cluster — one far-away point repeated, so every row
    // argmins into the SAME list and pushes it past 2× its fair share
    val f1 = emb.filter(col("vec_id") % 5 === 1)
      .select(col("vec_id") + lit(4000000L), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val far = Array.fill(dim)(100.0f)
    // 150 rows: the landing list ends > 2× its fair share of the
    // ~500-vector stored corpus, so the integer gate fires
    val f2 = (0 until 150).map(i => (4100000L + i, far.map(x => x + i * 1e-4f)))
    val out = java.nio.file.Files.createTempDirectory("graft_sim_out_").toString + "/m"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sim_ckpt_").toString
    val input = MemoryStream[(Long, Array[Float])]
    val builds0 = SimilarityOps.indexBuilds
    val q = StreamOps.streamingIvfMaintain(
      input.toDS().toDF("vec_id", "embedding"), index, out, ckpt)
    def report() = graft.engine.TickCommit.readLatest(spark, out, "report")
      .get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).sortBy(_._1).toSeq
    try {
      input.addData(f1.toSeq: _*)
      q.processAllAvailable()
      val mid = report()
      assert(!mid.exists(_._6),
        s"ordinary tick must not flag imbalance: $mid")
      input.addData(f2: _*)
      q.processAllAvailable()
      val fin = report()
      assert(fin.exists(_._6), s"far-cluster tick must flag in-stream: $fin")
      val allRows = (f1 ++ f2).toSeq.toDF("vec_id", "embedding")
      val batch = SimilarityOps.ivfIncrementalAppend(index, allRows).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getBoolean(5))).sortBy(_._1).toSeq
      assert(fin == batch,
        s"streamed report diverged from the one-shot q235 report")
      // every streamed assignment row matches the batch assign too
      val streamedAssign = spark.read.parquet(s"$out/assign").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
      val batchAssign = SimilarityOps.ivfIncrementalAssign(index, allRows)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
      assert(streamedAssign == batchAssign)
    } finally q.stop()
    assert(SimilarityOps.indexBuilds == builds0,
      "streaming maintenance must never re-fit the quantizer")
  }

  test("streaming IVF rebalance: flood flags and splits at its arrival tick, repair carries forward") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{SimilarityOps, StreamOps, Tables}
    val emb = Tables.embeddings(spark, sf)
    val index = SimilarityOps.ivfIndexFor(emb, tag = sf)
    val nStored = emb.count()
    // tick 0: ordinary vectors — no list crosses the gate, ZERO fits;
    // tick 1: the q259-style jittered far-cluster flood — its landing
    // list crosses the gate AT THE TICK and is split there; tick 2:
    // one more ordinary row proves the REPAIRED index is what later
    // ticks run against (the split children are regular lists now)
    val f0 = emb.filter(col("vec_id") % 5 === 1)
      .select(col("vec_id") + lit(5000000L), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    // 150 evenly-jittered rows: the landing list crosses the gate at
    // its arrival tick; the flood CHILD of that split is still over
    // the gate, so the NEXT tick's applier splits it again — the
    // convergence loop running live, tick by tick — and the halved
    // grandchildren (~75 each) finally clear it.
    val f1 = (0 until 150).map(i =>
      (5100000L + i, Array.tabulate(dim)(d => 100.0f + (i * dim + d) * 1e-4f)))
    def oneRow(v: Long, id: Long) = emb.filter(col("vec_id") === v)
      .select(col("vec_id") + lit(id), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val f2 = oneRow(0, 5200000L)
    val f3 = oneRow(1, 5300000L)
    val out = java.nio.file.Files.createTempDirectory("graft_srb_out_").toString + "/rb"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_srb_ckpt_").toString
    val input = MemoryStream[(Long, Array[Float])]
    val (builds0, fits0) = (SimilarityOps.indexBuilds, SimilarityOps.rebFits)
    val q = StreamOps.streamingIvfRebalance(
      input.toDS().toDF("vec_id", "embedding"), index, out, ckpt)
    def report(tick: Long) = spark.read.parquet(s"$out/report")
      .filter(col("tick") === tick).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getBoolean(5)))
      .sortBy(_._1).toSeq
    try {
      input.addData(f0.toSeq: _*)
      q.processAllAvailable()
      assert(SimilarityOps.rebFits == fits0,
        "an ordinary tick must fit NOTHING (zero re-fits of unflagged lists)")
      assert(report(0).forall(!_._3), "ordinary tick: no splits")
      assert(report(0).map(_._4).sum == nStored + f0.length,
        "tick-0 conservation: stored + tick members")
      input.addData(f1: _*)
      q.processAllAvailable()
      val fitsFlood = SimilarityOps.rebFits - fits0
      assert(fitsFlood == 1, s"exactly the flooded list re-fits, got $fitsFlood")
      val rep1 = report(1)
      val splits = rep1.filter(_._3)
      assert(splits.nonEmpty, "the flood tick must split its landing list IN-STREAM")
      assert(splits.map(_._2).distinct.size == 1, "one parent list split")
      assert(rep1.map(_._4).sum == nStored + f0.length + f1.length,
        "tick-1 conservation: nothing lost through the split")
      // the flood lobe separated from the stored members but is still
      // over the gate — the report says so honestly at its tick
      val stillFlagged = splits.filter(_._5)
      assert(stillFlagged.size == 1 && stillFlagged.head._4 >= f1.length,
        s"the flood child stays flagged after round 1: $splits")
      // the splits sink records the event at the tick it happened
      def events() = spark.read.parquet(s"$out/splits")
        .select(col("parent_list_id"), col("child_list_id"),
          col("tick").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val ev1 = events()
      assert(ev1.nonEmpty && ev1.forall(_._3 == 1L),
        s"split events land tick-stamped at the flood tick: ${ev1.toSeq}")
      assert(ev1.map(_._1).toSet == splits.map(_._2).toSet,
        "event parents match the report's split parents")
      assert(ev1.map(_._2).toSet == splits.map(_._1).toSet,
        "event children match the report's split children")
      // untouched lists carry exactly their batch-chain populations:
      // stream ≡ the q259 applier applied tick-by-tick on the same
      // prefix (fitted-child counts certified structurally above; the
      // k=2 fit itself is seeded but partitioning-sensitive, so
      // count-equality is asserted on the fit-independent rows)
      val chain1 = SimilarityOps.ivfRebalanceApply(index,
        f0.toSeq.toDF("vec_id", "embedding"))
      val chain2 = SimilarityOps.ivfRebalanceApply(chain1.updated,
        f1.toDF("vec_id", "embedding"))
      val chainUntouched = chain2.report.filter(!col("split")).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      val streamUntouched = rep1.filter(!_._3).map(t => t._1 -> t._4).toMap
      assert(streamUntouched == chainUntouched,
        "stream ≡ batch applier chain on every fit-independent row")
      // the chain comparison above itself paid one fit (chain2's
      // flood split) — snapshot before counting the stream's own
      val fitsAfterChain = SimilarityOps.rebFits
      // tick 2: LIVE CONVERGENCE — the carried repair flags the
      // still-over-full flood child and splits IT (and only it)
      input.addData(f2: _*)
      q.processAllAvailable()
      assert(SimilarityOps.rebFits - fitsAfterChain == 1,
        "round 2 fits exactly the still-flagged flood child")
      val rep2 = report(2)
      val splits2 = rep2.filter(_._3)
      assert(splits2.map(_._2).toSet == Set(stillFlagged.head._1),
        s"tick 2 splits exactly tick 1's flagged child: $splits2")
      assert(splits2.forall(!_._5),
        "the halved grandchildren clear the gate — convergence reached live")
      assert(rep2.map(_._1).toSet == (rep1.map(_._1).toSet -- Set(
          stillFlagged.head._1)) ++ splits2.map(_._1).toSet,
        "tick 2 runs against the tick-1 repaired list set")
      assert(rep2.map(_._4).sum == nStored + f0.length + f1.length + 1,
        "tick-2 conservation over the carried repaired index")
      val ev2 = events().filter(_._3 == 2L)
      assert(ev2.map(_._1).toSet == Set(stillFlagged.head._1),
        "the round-2 split event is tick-stamped at ITS tick")
      // tick 3: genuinely ordinary — the converged index carries
      input.addData(f3: _*)
      q.processAllAvailable()
      assert(SimilarityOps.rebFits - fitsAfterChain == 1,
        "no fits after convergence")
      val rep3 = report(3)
      assert(rep3.forall(!_._3), "no further splits on the converged index")
      assert(rep3.map(_._1).toSet == rep2.map(_._1).toSet,
        "the converged list set carries forward")
      assert(rep3.map(_._4).sum == nStored + f0.length + f1.length + 2,
        "tick-3 conservation")
      // restart contract (ADVICE r15): the per-tick index snapshot on
      // disk equals the carried index — a restart rebuilds from it
      val snapAssign = graft.engine.TickCommit
        .readLatest(spark, out, "index_assign").get
        .groupBy(col("list_id")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(snapAssign == rep3.map(t => t._1 -> t._4).toMap,
        "the index_assign snapshot must mirror the carried per-list populations")
      assert(graft.engine.TickCommit.readLatest(spark, out, "index_centers")
          .get.count() == rep3.size,
        "the index_centers snapshot carries one row per live list")
    } finally q.stop()
    assert(SimilarityOps.indexBuilds == builds0,
      "the coarse quantizer is never re-fit in-stream")
  }

  test("streaming IVF-PQ code maintenance equals the q256 batch report across a micro-batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{SimilarityOps, StreamOps, Tables}
    val emb = Tables.embeddings(spark, sf)
    val index = SimilarityOps.ivfIndexFor(emb, tag = sf)
    val cb = SimilarityOps.ivfPqCodebookFor(index, tag = sf)
    val storedCodes = SimilarityOps.ivfPqCodesFor(index, tag = sf)
    // the exact q256 batch, split across two ticks
    val batch = emb.filter(col("vec_id") % 7 === 3)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        org.apache.spark.sql.functions.reverse(col("embedding")).as("embedding"))
    val feed = batch.as[(Long, Array[Float])].collect().sortBy(_._1)
    val (f1, f2) = feed.splitAt(feed.length / 2)
    val out = java.nio.file.Files.createTempDirectory("graft_spq_out_").toString + "/pq"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_spq_ckpt_").toString
    val input = MemoryStream[(Long, Array[Float])]
    val (ib0, pb0) = (SimilarityOps.indexBuilds, SimilarityOps.pqBuilds)
    val q = StreamOps.streamingIvfPqCodeMaintain(
      input.toDS().toDF("vec_id", "embedding"), index, cb, storedCodes, out, ckpt)
    try {
      input.addData(f1.toSeq: _*)
      q.processAllAvailable()
      input.addData(f2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(SimilarityOps.indexBuilds == ib0 && SimilarityOps.pqBuilds == pb0,
      "streaming code maintenance must never re-fit either quantizer")
    def proj(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val streamed = proj(graft.engine.TickCommit.readLatest(spark, out, "report")
      .get.collect())
    val oneShot = proj(SimilarityOps.ivfPqCodeMaintain(storedCodes,
      SimilarityOps.ivfPqIncrementalCodes(index, cb, batch)).collect())
    assert(streamed == oneShot,
      s"streamed cell report diverged from the one-shot q256 report " +
        s"(${streamed.size} vs ${oneShot.size} cells)")
    assert(streamed.values.exists(_._2 > 0L), "some cell must carry new codes")
    // every appended code row matches the batch incremental encode
    def codesProj(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val streamedCodes = codesProj(spark.read.parquet(s"$out/codes"))
    val batchCodes = codesProj(
      SimilarityOps.ivfPqIncrementalCodes(index, cb, batch))
    assert(streamedCodes == batchCodes,
      s"streamed code rows diverged (${streamedCodes.size} vs ${batchCodes.size})")
  }

  test("streaming CDC vector-store maintenance: deletes merge, adds split, index carries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{SimilarityOps, StreamOps, Tables}
    val emb = Tables.embeddings(spark, sf)
    val index = SimilarityOps.ivfIndexFor(emb, tag = sf)
    val nStored = emb.count()
    val counts0 = index.assigned
      .groupBy(col("list_id").cast("long").as("l")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dim = emb.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    // tick 0: ordinary adds (the NATURAL index is skewed — a 1-member
    // list exists at sf0.001 — so tick 0 may legitimately merge
    // naturally-underfull lists; assertions below replay the gate from
    // the report instead of assuming a no-op); tick 1: a deletion
    // flood gutting ONE near-fair-share list to ~1/14 (CDC deletes —
    // the merge gate must catch IT at that tick); tick 2: a 150-row
    // far-cluster addition flood (the split gate fires at its tick)
    val f0 = emb.filter(col("vec_id") % 5 === 1)
      .select(col("vec_id") + lit(6000000L), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map(t => (t._1, t._2, "add"))
    val (targetList, _) = counts0.minBy { case (_, c) => math.abs(c - nStored / 16) }
    // gut the list COMPLETELY of its own members and their tick-0
    // copies — whatever remains is a handful of strays absorbed from
    // tick-0 merges, safely under the low-water gate
    val origVictims = index.assigned
      .filter(col("list_id").cast("long") === targetList)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    val victims = origVictims ++
      origVictims.filter(_ % 5 == 1).map(_ + 6000000L)
    val f1 = victims.map(id => (id, Array.empty[Float], "del"))
    val f2 = (0 until 150).map(i =>
      (6100000L + i, Array.tabulate(dim)(d => 100.0f + (i * dim + d) * 1e-4f), "add"))
    val out = java.nio.file.Files.createTempDirectory("graft_cdc_out_").toString + "/cdc"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ckpt_").toString
    val input = MemoryStream[(Long, Array[Float], String)]
    val (builds0, fits0) = (SimilarityOps.indexBuilds, SimilarityOps.rebFits)
    // carry the COMPRESSED serving artifact too (q288 live): the
    // persisted codes table rides the CDC stream and must stay
    // exactly consistent with the tick's centroid set
    val cdcCb = SimilarityOps.ivfPqCodebookFor(index, tag = sf)
    val codes0 = SimilarityOps.ivfPqCodesFor(index, tag = sf)
    val q = StreamOps.streamingIvfCdc(
      input.toDS().toDF("vec_id", "embedding", "op"), index, out, ckpt,
      codes = Some(codes0), cb = Some(cdcCb))
    // the carried codes snapshot must equal a from-scratch encode of
    // the carried index (same codebook) — checked from the SINKS, the
    // restart-authoritative state
    def codesMatchIndex(at: String): Unit = {
      val asg = graft.engine.TickCommit
        .readLatest(spark, out, "index_assign").get.localCheckpoint(false)
      val ctr = graft.engine.TickCommit
        .readLatest(spark, out, "index_centers").get.localCheckpoint(false)
      val curIdx = SimilarityOps.IvfIndex(asg, ctr, ctr.count().toInt)
      val scratch = SimilarityOps.pqEncodeWithList(cdcCb,
        SimilarityOps.residualFrame(curIdx))
      def keyC(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5)))).toMap
      assert(keyC(graft.engine.TickCommit.readLatest(spark, out, "codes").get)
          == keyC(scratch),
        s"$at: carried codes must equal a from-scratch encode of the carried index")
    }
    def report(tick: Long) = spark.read.parquet(s"$out/report")
      .filter(col("tick") === tick).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(4)))
      .sortBy(_._1).toSeq
    def ticks(tick: Long) = spark.read.parquet(s"$out/ticks")
      .filter(col("tick") === tick).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    // every tick's report must be SELF-CONSISTENT with the gate it
    // claims to have applied: merged rows are exactly those whose
    // pre-merge population sits under total/(nLists·factor)
    def gateConsistent(rep: Seq[(Long, Boolean, Long, Long)]): Unit = {
      val total = rep.map(_._3).sum
      val nLists = rep.length.toLong
      rep.foreach { case (l, merged, nb, _) =>
        assert(merged == (nb * nLists * 4 < total),
          s"list $l: merged=$merged contradicts the gate (n=$nb, total=$total, lists=$nLists)")
      }
      assert(rep.map(_._4).sum == total, "merge conserves members")
    }
    try {
      input.addData(f0.toSeq: _*)
      q.processAllAvailable()
      assert(SimilarityOps.rebFits == fits0,
        "ordinary adds: zero fits (merges are fit-free)")
      val t0 = ticks(0)
      assert(t0._1 == f0.length && t0._2 == 0L && t0._3 == 0L,
        "ordinary tick: adds counted, no deletes, no splits")
      gateConsistent(report(0))
      assert(report(0).map(_._4).sum == nStored + f0.length,
        "tick-0 conservation")
      input.addData(f1.toSeq: _*)
      q.processAllAvailable()
      val t1 = ticks(1)
      assert(t1._2 == victims.length, "every CDC delete lands")
      val rep1 = report(1)
      gateConsistent(rep1)
      assert(rep1.filter(_._2).map(_._1).contains(targetList),
        s"the gutted list $targetList merges AT its deletion tick: $rep1")
      assert(rep1.map(_._4).sum == nStored + f0.length - victims.length,
        "tick-1 conservation: deletes leave, survivors absorb the rest")
      codesMatchIndex("after the deletion/merge tick")
      assert(graft.engine.TickCommit.readLatest(spark, out, "codes").get
          .join(victims.toSeq.toDF("vec_id"), Seq("vec_id"), "left_semi")
          .count() == 0L,
        "deleted vectors' code rows must be gone at their tick")
      input.addData(f2.toSeq: _*)
      q.processAllAvailable()
      val t2 = ticks(2)
      assert(SimilarityOps.rebFits - fits0 >= 1 && t2._3 >= 1,
        "the addition flood splits its landing list at its tick")
      val rep2 = report(2)
      gateConsistent(rep2)
      assert(rep2.map(_._4).sum ==
        nStored + f0.length - victims.length + f2.length,
        "tick-2 conservation over the carried, maintained index")
      codesMatchIndex("after the split tick")
      // the compressed read path serves from the carried codes at the
      // split tick — the q282 point, live
      val asg2 = graft.engine.TickCommit
        .readLatest(spark, out, "index_assign").get.localCheckpoint(false)
      val ctr2 = graft.engine.TickCommit
        .readLatest(spark, out, "index_centers").get.localCheckpoint(false)
      val idx2 = SimilarityOps.IvfIndex(asg2, ctr2, ctr2.count().toInt)
      assert(SimilarityOps.ivfPqRecall(idx2, cdcCb,
          Tables.embeddings(spark, sf),
          graft.engine.TickCommit.readLatest(spark, out, "codes").get,
          nQueries = 2, k = 5,
          nProbe = 4).count() > 0L,
        "the compressed serving path answers from the repaired codes")
    } finally q.stop()
    assert(SimilarityOps.indexBuilds == builds0,
      "the coarse quantizer is never re-fit by CDC maintenance")
  }

  test("streaming takedown: ticked purges equal the one-shot purge; re-removal is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{StreamOps, Tables}
    import graft.queries.{RetrievalShared, SketchShared}
    val postings = RetrievalShared.postings(spark, sf).localCheckpoint(false)
    val doclens = RetrievalShared.docLengths(spark, sf).localCheckpoint(false)
    val sketches = SketchShared.sketches(spark, sf).localCheckpoint(false)
    val out = java.nio.file.Files.createTempDirectory("graft_std_out_").toString + "/td"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_std_ckpt_").toString
    val input = MemoryStream[Long]
    val q = StreamOps.streamingTakedown(
      input.toDS().toDF("doc_id"), postings, doclens, sketches, out, ckpt)
    try {
      input.addData(3L, 20L)
      q.processAllAvailable()
      // tick 2 re-submits an already-purged id alongside a new one —
      // the ledger must count only live rows (honest no-op)
      input.addData(3L, 41L)
      q.processAllAvailable()
    } finally q.stop()
    val ledger = spark.read.parquet(s"$out/ledger").collect()
      .map(r => (r.getInt(3).toLong, r.getString(0)) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val rmAll = Seq(3L, 20L, 41L).toDF("doc_id")
    def oneShot(store: org.apache.spark.sql.DataFrame) =
      store.join(rmAll, Seq("doc_id"), "left_anti")
    // final snapshots ≡ the one-shot purge over everything streamed
    def tdSnap(p: String) = graft.engine.TickCommit.readLatest(spark, out, p).get
    assert(tdSnap("doclens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      oneShot(doclens).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      "streamed doc-length store ≡ one-shot purge")
    assert(tdSnap("postings").count() == oneShot(postings).count())
    assert(tdSnap("sketches").count() == oneShot(sketches).count())
    // ledger reconciliation: per-tick removals sum to the one-shot
    // delta, and the re-submitted id contributed NOTHING at tick 1
    def dlRows(id: Long) = doclens.filter(col("doc_id") === id).count()
    assert(ledger((0L, "doc_lengths"))._1 == dlRows(3L) + dlRows(20L))
    assert(ledger((1L, "doc_lengths"))._1 == dlRows(41L),
      "re-removing doc 3 must be a no-op in the ledger")
    assert(ledger((1L, "doc_lengths"))._2 == oneShot(doclens).count(),
      "ledger n_after tracks the carried store")
    val pRm = postings.join(rmAll, Seq("doc_id"), "left_semi").count()
    assert(ledger((0L, "postings"))._1 + ledger((1L, "postings"))._1 == pRm,
      "ticked postings removals sum to the one-shot delta")
  }

  test("streaming store takedown: LM/card/sig folds equal the one-shot q273 algebra over the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{CorpusOps, SimilarityOps, StreamOps, Tables, TextOps}
    val docs = Tables.documents(spark, sf).localCheckpoint(false)
    val emb = Tables.embeddings(spark, sf)
    val lm0raw = TextOps.lmModel(docs)
    val lm0 = TextOps.LmModel(lm0raw.bigrams.localCheckpoint(false),
      lm0raw.contexts.localCheckpoint(false),
      lm0raw.vocab.localCheckpoint(false))
    val card0 = CorpusOps.corpusCardState(docs).localCheckpoint(false)
    val fp0 = docs.select(col("doc_id"), md5(col("text")).as("fp_md5"))
      .localCheckpoint(false)
    val sigs0 = SimilarityOps.binarySignatures(emb)
      .select(col("vec_id"), col("sig")).localCheckpoint(false)
    val out = java.nio.file.Files.createTempDirectory("graft_sts_out_").toString + "/td"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sts_ckpt_").toString
    val input = MemoryStream[Long]
    val q = StreamOps.streamingTakedownStores(
      input.toDS().toDF("doc_id"), docs, lm0, card0, fp0, sigs0, out, ckpt)
    try {
      input.addData(3L, 20L)
      q.processAllAvailable()
      input.addData(3L, 41L) // re-submission + a new id
      q.processAllAvailable()
    } finally q.stop()
    val rmAll = Seq(3L, 20L, 41L).toDF("doc_id").localCheckpoint(false)
    // authoritative state = the latest COMMITTED atomic snapshot
    import graft.engine.TickCommit
    def committed(p: String) = TickCommit.readLatest(spark, out, p).get
    assert(TickCommit.latestTick(spark, out).contains(1L),
      "both ticks must have sealed atomic snapshots")
    // LM: final snapshots ≡ one-shot subtract over the union ≡ retrain
    val oneLm = TextOps.lmModelSubtract(lm0,
      docs.join(rmAll, Seq("doc_id"), "left_semi"))
    assert(committed("lm_bigrams").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ==
      oneLm.bigrams.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      "ticked LM bigram decrements ≡ one-shot subtract")
    assert(committed("lm_contexts").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      oneLm.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(committed("lm_vocab").collect()
        .map(_.getString(0)).toSet ==
      oneLm.vocab.collect().map(_.getString(0)).toSet)
    // card state ≡ one-shot fold-out over the union
    def cardMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(cardMap(committed("card_state")) ==
      cardMap(CorpusOps.corpusCardTakedownState(card0, fp0, docs, rmAll)),
      "ticked card fold-outs ≡ one-shot fold-out")
    // signature store ≡ one anti-join
    assert(committed("sigs").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      sigs0.join(rmAll.select(col("doc_id").as("vec_id")),
          Seq("vec_id"), "left_anti").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    // ledger: every probe clean on every tick (the Bloom row honestly
    // never is); the re-submitted id contributed nothing at tick 2
    val ledger = spark.read.parquet(s"$out/ledger").collect()
      .map(r => (r.getInt(5), r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    ledger.foreach { case ((tick, a), (_, _, _, clean)) =>
      if (a == "bloom_rebuild")
        assert(!clean, s"the Bloom row must keep flagging rebuild (tick $tick)")
      else assert(clean, s"$a must be clean at tick $tick")
    }
    val sigRows1 = ledger((1, "binary_sigs"))
    assert(sigRows1._3 == sigs0.join(Seq(41L).toDF("vec_id"), "vec_id").count(),
      "tick 2 must fold out ONLY the new id (re-submission is a no-op)")
    // the cumulative queue snapshot holds the union
    assert(committed("removed").collect()
      .map(_.getLong(0)).toSet == Set(3L, 20L, 41L))
    // flag → applier closure: the q283 rebuild over the final queue
    // flips the Bloom row the monitor kept honestly flagging
    val rebuilt = TextOps.bloomRebuildApply(docs,
        committed("removed")).collect()
      .map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(rebuilt("bloom_rebuild"), "the rebuild must flip the flag clean")
  }

  test("streaming store takedown: a tick crashed mid-write is invisible and its replay re-applies the corrections") {
    // The ADVICE r16 high scenario. Under the old queue-first layout
    // a crash between the queue write and the store writes left a
    // queue that already held the crashed tick's ids next to stores
    // that never received the corrections; the replayed tick then
    // derived an EMPTY effective set and the LM/card decrements were
    // lost forever. With atomic tick commits the aborted tick has no
    // _COMMITTED marker, so the restart resolves to the last sealed
    // tick — whose queue does NOT hold the crashed ids — and the
    // replay re-applies the corrections.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{CorpusOps, SimilarityOps, StreamOps, Tables, TextOps, TickCommit}
    val docs = Tables.documents(spark, sf).localCheckpoint(false)
    val emb = Tables.embeddings(spark, sf)
    val lm0raw = TextOps.lmModel(docs)
    val lm0 = TextOps.LmModel(lm0raw.bigrams.localCheckpoint(false),
      lm0raw.contexts.localCheckpoint(false),
      lm0raw.vocab.localCheckpoint(false))
    val card0 = CorpusOps.corpusCardState(docs).localCheckpoint(false)
    val fp0 = docs.select(col("doc_id"), md5(col("text")).as("fp_md5"))
      .localCheckpoint(false)
    val sigs0 = SimilarityOps.binarySignatures(emb)
      .select(col("vec_id"), col("sig")).localCheckpoint(false)
    val out = java.nio.file.Files.createTempDirectory("graft_stc_out_").toString + "/td"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stc_ckpt_").toString
    val input = MemoryStream[Long]
    val q = StreamOps.streamingTakedownStores(
      input.toDS().toDF("doc_id"), docs, lm0, card0, fp0, sigs0, out, ckpt)
    try {
      input.addData(3L, 20L)
      q.processAllAvailable()
    } finally q.stop()
    // simulate the crash at tick 1: the cumulative queue staged AHEAD
    // of the stores (the worst-case write the old design made
    // visible), ids 41 included — but the tick never seals
    TickCommit.stage(spark, out, 1L,
      Seq("removed" -> Seq(3L, 20L, 41L).toDF("doc_id")))
    assert(TickCommit.latestTick(spark, out).contains(0L),
      "an unsealed tick must be invisible")
    assert(TickCommit.readLatest(spark, out, "removed").get.collect()
      .map(_.getLong(0)).toSet == Set(3L, 20L),
      "the restart queue must NOT contain the crashed tick's id")
    // restart: reconstruct the monitor from the committed snapshot
    // alone and replay the crashed tick's batch
    def committed(p: String) =
      TickCommit.readLatest(spark, out, p).get.localCheckpoint(false)
    val out2 = java.nio.file.Files.createTempDirectory("graft_stc_out2_").toString + "/td"
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_stc_ckpt2_").toString
    val input2 = MemoryStream[Long]
    val q2 = StreamOps.streamingTakedownStores(
      input2.toDS().toDF("doc_id"), docs,
      TextOps.LmModel(committed("lm_bigrams"), committed("lm_contexts"),
        committed("lm_vocab")),
      committed("card_state"), committed("fps"), committed("sigs"),
      out2, ckpt2, storedRemoved = Some(committed("removed")))
    try {
      input2.addData(41L) // the crashed tick, re-delivered
      q2.processAllAvailable()
    } finally q2.stop()
    // the replay must have applied the corrections: final LM ≡ the
    // one-shot subtract over the FULL union, and the replayed tick's
    // ledger shows a non-zero delta (not the empty-set no-op the old
    // layout produced)
    val rmAll = Seq(3L, 20L, 41L).toDF("doc_id").localCheckpoint(false)
    val oneLm = TextOps.lmModelSubtract(lm0,
      docs.join(rmAll, Seq("doc_id"), "left_semi"))
    assert(TickCommit.readLatest(spark, out2, "lm_bigrams").get.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ==
      oneLm.bigrams.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      "replayed corrections must land — LM ≡ one-shot subtract over the union")
    assert(TickCommit.readLatest(spark, out2, "sigs").get
      .join(Seq(41L).toDF("vec_id"), Seq("vec_id"), "left_semi").count() == 0L,
      "the crashed id's signature must be gone after the replay")
    val replayLedger = spark.read.parquet(s"$out2/ledger").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(replayLedger("binary_sigs") == 1L,
      "the replayed tick must record a real delta, not an empty no-op")
  }

  test("streaming user takedown: every carried store equals a rebuild over events minus the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{EventOps, StreamOps, Tables, TemporalOps}
    val ev = Tables.events(spark, sf).localCheckpoint(false)
    val mani0 = TemporalOps.sessionPackManifest(ev).localCheckpoint(false)
    val sess0 = EventOps.sessionize(ev).localCheckpoint(false)
    val fun0 = EventOps.funnel(ev).localCheckpoint(false)
    val ret0 = EventOps.retentionCohorts(ev).localCheckpoint(false)
    val trans0 = EventOps.eventTransitions(ev).localCheckpoint(false)
    val attr0 = EventOps.lastTouchAttribution(ev).localCheckpoint(false)
    val rmUsers = ev.filter(pmod(col("user_id"), lit(5)) === 2)
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).sorted
    assert(rmUsers.length >= 2, s"fixture needs >= 2 removable users: ${rmUsers.toSeq}")
    val (t1, t2) = rmUsers.splitAt(1)
    val out = java.nio.file.Files.createTempDirectory("graft_sut_out_").toString + "/utd"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sut_ckpt_").toString
    val input = MemoryStream[Long]
    val q = StreamOps.streamingUserTakedown(
      input.toDS().toDF("user_id"), ev, mani0, sess0, fun0, ret0, trans0,
      attr0, out, ckpt)
    try {
      input.addData(t1.toSeq: _*)
      q.processAllAvailable()
      input.addData((t2 :+ t1.head).toSeq: _*) // re-submission + new users
      q.processAllAvailable()
    } finally q.stop()
    val kept = ev.join(rmUsers.toSeq.toDF("user_id"), Seq("user_id"), "left_anti")
      .localCheckpoint(false)
    def snap(p: String) = graft.engine.TickCommit.readLatest(spark, out, p).get
    // conversation manifest: per-user independence makes the ticked
    // purge THE rebuild over the kept events
    def maniKey(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_seq"), col("end_seq"), col("tok_offset")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(maniKey(snap("manifest")) ==
      maniKey(TemporalOps.sessionPackManifest(kept)),
      "ticked manifest purge ≡ rebuild over kept events")
    // sessions store
    def sessKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(5)))
      .toMap
    assert(sessKey(snap("sessions")) == sessKey(EventOps.sessionize(kept)))
    // attribution rows
    def attrKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(1) -> ((Option(r.get(3)), Option(r.get(4))))).toMap
    assert(attrKey(snap("attribution")) ==
      attrKey(EventOps.lastTouchAttribution(kept)))
    // funnel stage counts ≡ rebuild's
    assert(snap("funnel").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      EventOps.funnel(kept).collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap,
      "ticked funnel decrements ≡ rebuild stage counts")
    // retention cells ≡ rebuild's (zero cells dropped on both sides)
    def retKey(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cohort_week").cast("string"), col("week_offset"),
        col("n_active")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(retKey(snap("retention")) == retKey(EventOps.retentionCohorts(kept)))
    // transition matrix ≡ rebuild's
    def trKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(trKey(snap("transitions")) == trKey(EventOps.eventTransitions(kept)
      .select(col("event_type"), col("next_type"), col("n_transitions"))))
    // ledger: clean everywhere; the queue holds the union
    val ledger = spark.read.parquet(s"$out/ledger").collect()
      .map(r => (r.getInt(5), r.getString(0)) -> r.getBoolean(4)).toMap
    assert(ledger.values.forall(identity), s"all ticks clean: $ledger")
    assert(snap("removed").collect()
      .map(_.getLong(0)).toSet == rmUsers.toSet)
  }

  test("streaming user quarantine: restore is an exact inverse; final stores ≡ rebuild over events minus held") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{EventOps, StreamOps, Tables, TemporalOps, TickCommit}
    val ev = Tables.events(spark, sf).localCheckpoint(false)
    val mani0 = TemporalOps.sessionPackManifest(ev).localCheckpoint(false)
    val sess0 = EventOps.sessionize(ev).localCheckpoint(false)
    val fun0 = EventOps.funnel(ev).localCheckpoint(false)
    val ret0 = EventOps.retentionCohorts(ev).localCheckpoint(false)
    val trans0 = EventOps.eventTransitions(ev).localCheckpoint(false)
    val attr0 = EventOps.lastTouchAttribution(ev).localCheckpoint(false)
    val users = ev.filter(pmod(col("user_id"), lit(5)) === 2)
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).sorted
    assert(users.length >= 2, s"fixture needs >= 2 holdable users: ${users.toSeq}")
    val (a, b) = users.splitAt(users.length / 2)
    val out = java.nio.file.Files.createTempDirectory("graft_suq_out_").toString + "/uq"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_suq_ckpt_").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingUserQuarantine(
      input.toDS().toDF("user_id", "op"), ev, mani0, sess0, fun0, ret0,
      trans0, attr0, out, ckpt)
    try {
      // tick 0: hold everyone; tick 1: restore the a-half, plus two
      // honest no-ops (re-quarantine an already-held user, restore a
      // user nobody holds)
      input.addData(users.map(u => (u, "quarantine")).toSeq: _*)
      q.processAllAvailable()
      input.addData((a.map(u => (u, "restore")) :+
        ((b.head, "quarantine")) :+ ((999999999L, "restore"))).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val kept = ev.join(b.toSeq.toDF("user_id"), Seq("user_id"), "left_anti")
      .localCheckpoint(false)
    def snap(p: String) = TickCommit.readLatest(spark, out, p).get
    // restored users' rows came back byte-identical (boundaries
    // included): the whole store equals a rebuild over events-minus-b
    def maniKey(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("session_id"), col("n_events"),
        col("start_seq"), col("end_seq"), col("tok_offset")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(maniKey(snap("manifest")) ==
      maniKey(TemporalOps.sessionPackManifest(kept)),
      "quarantine→restore manifest ≡ rebuild over events minus held")
    def sessKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(5)))
      .toMap
    assert(sessKey(snap("sessions")) == sessKey(EventOps.sessionize(kept)))
    def attrKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(1) -> ((Option(r.get(3)), Option(r.get(4))))).toMap
    assert(attrKey(snap("attribution")) ==
      attrKey(EventOps.lastTouchAttribution(kept)))
    assert(snap("funnel").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      EventOps.funnel(kept).collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap,
      "decrement→re-increment funnel ≡ rebuild stage counts")
    def retKey(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cohort_week").cast("string"), col("week_offset"),
        col("n_active")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(retKey(snap("retention")) == retKey(EventOps.retentionCohorts(kept)),
      "dropped cells resurrect on restore; held users' cells stay out")
    def trKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(trKey(snap("transitions")) == trKey(EventOps.eventTransitions(kept)
      .select(col("event_type"), col("next_type"), col("n_transitions"))))
    // the hold set and the stash carry exactly the still-held users
    assert(snap("held").collect().map(_.getLong(0)).toSet == b.toSet)
    assert(snap("stash").count() ==
      ev.join(b.toSeq.toDF("user_id"), Seq("user_id"), "left_semi").count(),
      "the stash retains exactly the held users' raw events")
    // ledger tick 1: the no-ops contributed nothing
    val led1 = spark.read.parquet(s"$out/ledger")
      .filter(col("tick") === 1).collect()
    assert(led1.forall(_.getBoolean(5)), "tick-1 rows clean")
    assert(led1.forall(r => r.getLong(3) == 0L && r.getLong(4) == a.length.toLong),
      s"tick 1: zero effective quarantines (re-submission no-op), ${a.length} restores")
  }

  test("streaming entity takedown equals the one-shot q276 re-close over the union") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{DedupOps, StreamOps, Tables}
    val part = Tables.part(spark, sf).localCheckpoint(false)
    val stored = DedupOps.entityGroups(part).localCheckpoint(false)
    val rmKeys = part.filter(pmod(col("p_partkey"), lit(17)) === 4)
      .select(col("p_partkey")).collect().map(_.getLong(0)).sorted
    assert(rmKeys.length >= 2, "fixture needs at least two removal keys")
    val (t1, t2) = rmKeys.splitAt(rmKeys.length / 2)
    val out = java.nio.file.Files.createTempDirectory("graft_set_out_").toString + "/etd"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_set_ckpt_").toString
    val input = MemoryStream[Long]
    val q = StreamOps.streamingEntityTakedown(
      input.toDS().toDF("p_partkey"), part, stored, out, ckpt)
    try {
      input.addData(t1.toSeq: _*)
      q.processAllAvailable()
      input.addData((t2 :+ t1.head).toSeq: _*) // re-submission + new keys
      q.processAllAvailable()
    } finally q.stop()
    val union = rmKeys.toSeq.toDF("p_partkey")
    def aliasMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val oneShot = DedupOps.entityTakedown(part, union, stored)
      .select(col("p_partkey"), col("entity_id"), col("n_members"),
        col("canonical_name"))
    def snapE(p: String) = graft.engine.TickCommit.readLatest(spark, out, p).get
    assert(aliasMap(snapE("aliases")) == aliasMap(oneShot),
      "ticked re-closes must equal the one-shot q276 over the union")
    // ledger: clean at every tick; conservation of the store rows
    val ledger = spark.read.parquet(s"$out/ledger").collect()
      .map(r => r.getInt(5) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(ledger.values.forall(_._4), s"no removed key may survive: $ledger")
    assert(ledger(0)._1 == stored.count() && ledger(1)._2 == oneShot.count(),
      "ledger endpoints must track the carried store")
    assert(snapE("removed").collect()
      .map(_.getLong(0)).toSet == rmKeys.toSet)
  }

  test("streaming serving monitor: every tick certifies zero leakage; final listings equal the one-shot cert") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{CorpusOps, SimilarityOps, StreamOps, Tables}
    import graft.queries.RetrievalShared
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf).localCheckpoint(false)
    val postings = RetrievalShared.postings(spark, sf).localCheckpoint(false)
    val doclens = RetrievalShared.docLengths(spark, sf).localCheckpoint(false)
    val idx = SimilarityOps.ivfIndexFor(emb, tag = sf)
    val cb = SimilarityOps.pqCodebookFor(emb, tag = sf)
    val sigs = SimilarityOps.binarySigsFor(emb, tag = sf).localCheckpoint(false)
    val rmIds = docs.filter(pmod(col("doc_id"), lit(17)) === 6)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val (t1, t2) = rmIds.splitAt(rmIds.length / 2)
    val out = java.nio.file.Files.createTempDirectory("graft_ssm_out_").toString + "/serve"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssm_ckpt_").toString
    val input = MemoryStream[Long]
    val ivfPqCb = SimilarityOps.ivfPqCodebookFor(idx, tag = sf)
    val ivfPqCodes = SimilarityOps.ivfPqCodesFor(idx, tag = sf)
      .localCheckpoint(false)
    val q = StreamOps.streamingTakedownServe(input.toDS().toDF("doc_id"),
      postings, doclens, emb, idx, cb, sigs, ivfPqCodes, ivfPqCb, out, ckpt)
    try {
      input.addData(t1.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    // RESTART: a brand-new monitor reconstructed from the on-disk
    // snapshots alone (in-JVM state discarded) — the five stores AND
    // the cumulative removal queue reload; tick 2 then re-submits an
    // already-purged PRE-RESTART id, which must stay an honest no-op
    // certified against the full queue
    def snap1(p: String) = graft.engine.TickCommit.readLatest(spark, out, p)
      .get.localCheckpoint(false)
    val out2 = java.nio.file.Files.createTempDirectory("graft_ssm_out2_").toString + "/serve"
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_ssm_ckpt2_").toString
    val input2 = MemoryStream[Long]
    val q2 = StreamOps.streamingTakedownServe(input2.toDS().toDF("doc_id"),
      snap1("postings"), snap1("doclens"), snap1("vectors"),
      SimilarityOps.IvfIndex(snap1("assign"), idx.centers, idx.nLists),
      cb, snap1("sigs"), snap1("codes"), ivfPqCb, out2, ckpt2,
      storedRemoved = Some(snap1("removed")))
    try {
      input2.addData((t2 :+ t1.head).toSeq: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    def certOf(dir: String) = spark.read.parquet(s"$dir/cert").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val cert1 = certOf(out)
    val cert = certOf(out2)
    assert(cert1.size == 6 && cert.size == 6,
      s"six surfaces per run: ${cert1.keySet} / ${cert.keySet}")
    // the standing invariant: zero leakage at EVERY tick, before and
    // after the restart, vs the cumulative removal set
    (cert1 ++ cert).foreach { case (s, (_, leaked, clean)) =>
      assert(leaked == 0L && clean, s"surface $s leaked")
    }
    // final per-surface slot counts equal the one-shot q277 post side
    val oneShot = CorpusOps.takedownServingCert(
        rmIds.toSeq.toDF("doc_id"), postings, doclens, emb, idx, cb, sigs)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    oneShot.foreach { case (s, (slotsPost, _)) =>
      assert(cert(s)._1 == slotsPost,
        s"$s final slots: streamed ${cert(s)._1} vs one-shot $slotsPost")
    }
    // the fixture bites: removed ids held pre-purge slots somewhere
    assert(oneShot.values.map(_._2).sum > 0,
      "removal must intersect some pre-purge listing")
    // the compressed path's final slots equal ITS one-shot cert
    val oneShotPq = CorpusOps.takedownServingCertIvfPq(
        rmIds.toSeq.toDF("doc_id"), emb, idx, ivfPqCb, ivfPqCodes)
      .collect().head
    assert(cert("ivfpq_adc")._1 == oneShotPq.getLong(2),
      "ivfpq final slots must equal the one-shot q282 post side")
    // stream ≡ batch at the LISTING level — ACROSS the restart: the
    // listings recomputed from the post-restart snapshots equal the
    // listings over the one-shot purged stores, row set for row set
    val rmAll = rmIds.toSeq.toDF("doc_id").localCheckpoint(false)
    val rmVec = rmAll.select(col("doc_id").as("vec_id"))
    def snap(p: String) = graft.engine.TickCommit.readLatest(spark, out2, p).get
    val fromSnaps = CorpusOps.servingListings(
        snap("postings"), snap("doclens"), snap("vectors"),
        SimilarityOps.IvfIndex(snap("assign"), idx.centers, idx.nLists),
        cb, snap("sigs")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val oneShotListings = CorpusOps.servingListings(
        postings.join(rmAll, Seq("doc_id"), "left_anti"),
        doclens.join(rmAll, Seq("doc_id"), "left_anti"),
        emb.join(rmVec, Seq("vec_id"), "left_anti"),
        SimilarityOps.IvfIndex(
          idx.assigned.join(rmVec, Seq("vec_id"), "left_anti"),
          idx.centers, idx.nLists),
        cb, sigs.join(rmVec, Seq("vec_id"), "left_anti")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromSnaps == oneShotListings,
      "snapshot listings must equal the one-shot purge listings")
    // the cumulative removal queue is itself durable state: the
    // post-restart snapshot must hold the FULL union (pre-restart ids
    // included), so the next restart keeps certifying all of them
    assert(graft.engine.TickCommit.readLatest(spark, out2, "removed").get
        .collect().map(_.getLong(0)).toSet == rmIds.toSet,
      "removed-queue snapshot must hold the cumulative union across the restart")
  }

  test("streaming mix monitor flags a flooding source at its arrival tick") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{CorpusOps, StreamOps, Tables, TickCommit}
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val target = CorpusOps.temperatureMixWeights(docs).localCheckpoint(true)
    // b1: a balanced slice; b2: a flood of src0 tokens — src0's
    // realized share must cross its designed share + 5% only at tick 1
    val b1 = docs.limit(40).as[(Long, String, String, String)].collect()
      .map(r => (r._1 + 9990000L, r._2, r._4)).toSeq
    val flood = (0 until 25).map(i =>
      (9995000L + i, ("flood " * 40).trim, "src0"))
    val out = java.nio.file.Files.createTempDirectory("graft_smx_out_").toString + "/mx"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_smx_ckpt_").toString
    val input = MemoryStream[(Long, String, String)]
    val q = StreamOps.streamingMixMonitor(
      input.toDS().toDF("doc_id", "text", "source"), target, out, ckpt)
    def report() = TickCommit.readLatest(spark, out, "report").get.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      val t0 = report()
      assert(!t0("src0")._5, s"balanced tick must not flag src0: ${t0("src0")}")
      input.addData(flood: _*)
      q.processAllAvailable()
      val t1 = report()
      assert(t1("src0")._5 && t1("src0")._4 > t1("src0")._2,
        s"the flood must flag src0 AT its tick: ${t1("src0")}")
      // a source the launch design never listed must SURFACE with
      // target share 0 and flag — not silently vanish from the report
      // while deflating everyone else's denominator (the left-join bug)
      val rogue = (0 until 20).map(i =>
        (9998000L + i, ("rogue " * 40).trim, "crawl_v2"))
      input.addData(rogue: _*)
      q.processAllAvailable()
      val t2 = report()
      assert(t2.contains("crawl_v2") && t2("crawl_v2")._2 == 0L &&
        t2("crawl_v2")._5,
        s"an undesigned source must appear with target 0 and flag: $t2")
      // stream ≡ batch: the final report equals the same arithmetic
      // computed one-shot over everything streamed
      val streamed = (b1 ++ flood ++ rogue).toDF("doc_id", "text", "source")
      val masses = streamed
        .select(col("source"), size(expr(
          "regexp_extract_all(text, '[A-Za-z0-9_]+', 0)")).cast("long").as("n"))
        .groupBy(col("source")).agg(sum(col("n")).as("m")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val totR = masses.values.sum
      val w = target.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      val totW = w.values.sum
      t2.foreach { case (src, (realized, tgtPpm, realPpm, drift, _)) =>
        assert(realized == masses.getOrElse(src, 0L), s"$src realized mass")
        assert(tgtPpm == (w.getOrElse(src, 0L) * 1000000L) / totW, s"$src target ppm")
        assert(realPpm == (masses.getOrElse(src, 0L) * 1000000L) / totR,
          s"$src realized ppm")
        assert(drift == realPpm - tgtPpm, s"$src drift")
      }
    } finally q.stop()
  }

  test("streaming referential audit accumulates the q306 ledger and quarantines orphans") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{StreamOps, Tables, TickCommit}
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .as[(Long, Long, Long)].collect().sorted.take(60)
    val (c1, c2) = li.splitAt(30)
    val (okOrd, okPart, okSupp) = c1.head
    // one orphan per edge, each otherwise-valid
    val bad = Seq((9999991L, okPart, okSupp), (okOrd, 9999992L, okSupp),
      (okOrd, okPart, 9999993L))
    val out = java.nio.file.Files.createTempDirectory("graft_sra_out_").toString + "/ra"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sra_ckpt_").toString
    val input = MemoryStream[(Long, Long, Long)]
    val q = StreamOps.streamingReferentialAudit(
      input.toDS().toDF("l_orderkey", "l_partkey", "l_suppkey"),
      Tables.orders(spark, sf), Tables.part(spark, sf),
      Tables.supplier(spark, sf), out, ckpt)
    def ledger() = TickCommit.readLatest(spark, out, "ledger").get.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    try {
      input.addData(c1.toSeq: _*)
      q.processAllAvailable()
      val t0 = ledger()
      assert(t0.values.forall { case (n, v, ok) => n == 30L && v == 0L && ok },
        s"clean tick: $t0")
      input.addData((c2 ++ bad).toSeq: _*)
      q.processAllAvailable()
      val t1 = ledger()
      assert(t1.values.forall { case (n, v, ok) => n == 63L && v == 1L && !ok },
        s"the broken export must flag at its tick: $t1")
    } finally q.stop()
    // the quarantine isolates exactly the orphan rows, per edge
    val qn = spark.read.option("basePath", s"$out/quarantine")
      .parquet(s"$out/quarantine/edge=l_orderkey")
      .select(col("l_orderkey")).collect().map(_.getLong(0)).toSeq
    assert(qn == Seq(9999991L), s"orderkey quarantine: $qn")
    val qp = spark.read.parquet(s"$out/quarantine/edge=l_partkey")
      .select(col("l_partkey")).collect().map(_.getLong(0)).toSeq
    assert(qp == Seq(9999992L), s"partkey quarantine: $qp")
  }

  test("streaming loader progress equals the one-shot accounting at every high-water") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{CorpusOps, StreamOps, Tables, TickCommit}
    val docs = Tables.documents(spark, sf)
    val L = 16
    // (shard, source, n_toks, cum)
    val manifest = CorpusOps.epochPackManifest(docs, budgetMult = 2L,
        nShards = 2, seqLen = L).collect()
      .map(r => (r.getLong(0), r.getString(4), r.getLong(5), r.getLong(6)))
    val totals = manifest.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    def oneShot(hw: Map[Long, Long]): Map[String, Long] =
      manifest.groupBy(_._2).view.mapValues(_.map { case (shard, _, n, cum) =>
        val s = hw.getOrElse(shard, 0L)
        math.max(0L, math.min(cum, s * L) - (cum - n))
      }.sum).toMap
    val out = java.nio.file.Files.createTempDirectory("graft_slp_out_").toString + "/lp"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_slp_ckpt_").toString
    val input = MemoryStream[(Long, Long)]
    val q = StreamOps.streamingLoaderProgress(
      input.toDS().toDF("shard", "step"), docs, out, ckpt,
      budgetMult = 2L, nShards = 2, seqLen = L)
    def report(path: String) = TickCommit.readLatest(spark, path, "report").get
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    try {
      // tick 1: duplicates and out-of-order completions fold via max
      input.addData((0L, 0L), (0L, 2L), (0L, 1L), (1L, 0L), (0L, 2L))
      q.processAllAvailable()
      val t1 = report(out)
      val exp1 = oneShot(Map(0L -> 3L, 1L -> 1L))
      t1.foreach { case (src, (tot, consumed, ppm, done)) =>
        assert(tot == totals(src) && consumed == exp1(src), s"$src tick1: $t1 vs $exp1")
        assert(ppm == consumed * 1000000L / tot && done == (consumed == tot))
      }
      // tick 2: a stale report for shard 0 is a no-op; shard 1 advances
      input.addData((0L, 1L), (1L, 4L), (1L, 2L))
      q.processAllAvailable()
      val t2 = report(out)
      val exp2 = oneShot(Map(0L -> 3L, 1L -> 5L))
      t2.foreach { case (src, (_, consumed, _, _)) =>
        assert(consumed == exp2(src), s"$src tick2: $t2 vs $exp2") }
      assert(TickCommit.readLatest(spark, out, "hw").get.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(0L -> 3L, 1L -> 5L),
        "high-water snapshot")
    } finally q.stop()
    // restart with a fresh checkpoint: seed a fresh outPath from the
    // committed snapshots (the seal guard's prescribed recipe), then
    // drive every shard to completion — progress must carry over
    val out2 = java.nio.file.Files.createTempDirectory("graft_slp_out2_").toString + "/lp"
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_slp_ckpt2_").toString
    TickCommit.resumeInto(spark, out, out2)
    val input2 = MemoryStream[(Long, Long)]
    val q2 = StreamOps.streamingLoaderProgress(
      input2.toDS().toDF("shard", "step"), docs, out2, ckpt2,
      budgetMult = 2L, nShards = 2, seqLen = L)
    try {
      input2.addData((0L, 10000L), (1L, 10000L))
      q2.processAllAvailable()
      val t3 = report(out2)
      t3.foreach { case (src, (tot, consumed, ppm, done)) =>
        assert(consumed == tot && ppm == 1000000L && done,
          s"$src must finish consumed after the restart tick: $t3") }
    } finally q2.stop()
  }

  test("a fresh checkpoint against a live outPath fails loudly instead of skipping colliding ticks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{StreamOps, Tables}
    val docs = Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft_bind_out_").toString + "/lp"
    val ckptA = java.nio.file.Files.createTempDirectory("graft_bind_ckA_").toString
    val ckptB = java.nio.file.Files.createTempDirectory("graft_bind_ckB_").toString
    val inA = MemoryStream[(Long, Long)]
    val qA = StreamOps.streamingLoaderProgress(
      inA.toDS().toDF("shard", "step"), docs, out, ckptA,
      budgetMult = 2L, nShards = 2, seqLen = 16)
    try { inA.addData((0L, 0L)); qA.processAllAvailable() } finally qA.stop()
    // the misconfiguration the seal guard can't see: batch ids restart
    // at 0 and collide with the committed tick — without the binding
    // the first new batch would be silently skipped as a replay
    val inB = MemoryStream[(Long, Long)]
    val qB = StreamOps.streamingLoaderProgress(
      inB.toDS().toDF("shard", "step"), docs, out, ckptB,
      budgetMult = 2L, nShards = 2, seqLen = 16)
    try {
      inB.addData((1L, 3L))
      val e = intercept[Exception] { qB.processAllAvailable() }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("bound to checkpoint")),
        s"expected the binding error, got: ${chain(e)}")
    } finally qB.stop()
  }

  test("streaming entity resolution equals one-shot incremental across a bridging boundary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{DedupOps, StreamOps, Tables}
    val part = Tables.part(spark, sf)
    val storedDim = part.select(col("p_partkey"), col("p_name"), col("p_brand"))
      .localCheckpoint(false)
    val storedAliases = DedupOps.entityGroups(part).localCheckpoint(false)
    val anchor = storedDim.orderBy(col("p_partkey")).limit(1).collect()(0)
    val (k0, n0, br0) = (anchor.getLong(0), anchor.getString(1), anchor.getString(2))
    // b1: one record extending k0's stored group, one half of a bridge
    // pair; b2: the OTHER half (edit distance 1 from the b1 record —
    // neither is near any stored name) plus an unrelated singleton.
    // The b2 record can only group with the b1 record through the
    // UPDATED store — the cross-micro-batch case under test.
    val b1 = Seq((9000001L, n0 + "x", br0), (9000003L, "bridgename one", br0))
    val b2 = Seq((9000004L, "bridgename onex", br0), (9000005L, "solo unmatched", br0))
    val out = java.nio.file.Files.createTempDirectory("graft_ser_out_").toString + "/er"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ser_ckpt_").toString
    val input = MemoryStream[(Long, String, String)]
    val q = StreamOps.streamingEntityResolution(
      input.toDS().toDF("p_partkey", "p_name", "p_brand"),
      storedAliases, storedDim, out, ckpt)
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    def proj(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val streamedStore = proj(graft.engine.TickCommit.readLatest(spark, out, "store").get
      .select(col("p_partkey"), col("entity_id"), col("n_members"), col("canonical_name"))
      .collect())
    val oneShot = proj(DedupOps.incrementalEntityGroups(
        storedAliases, storedDim, (b1 ++ b2).toDF("p_partkey", "p_name", "p_brand"))
      .select(col("p_partkey"), col("entity_id"), col("n_members"), col("canonical_name"))
      .collect())
    assert(streamedStore == oneShot,
      s"final store diverged from one-shot (${streamedStore.size} vs ${oneShot.size} rows)")
    // the planted cases actually exercised their paths
    assert(streamedStore(9000001L)._1 == storedAliases
      .filter(col("p_partkey") === k0).collect()(0).getLong(1),
      "extension record adopts the stored group's entity")
    assert(streamedStore(9000004L)._1 == 9000003L && streamedStore(9000004L)._2 == 2L,
      "bridge closes across the micro-batch boundary through the updated store")
    assert(streamedStore(9000005L)._1 == 9000005L && streamedStore(9000005L)._2 == 1L)
    // per-round verdicts: the bridge half arrived before its partner
    // and was NEW then; its partner's round groups them
    val verdicts = spark.read.parquet(s"$out/verdicts").collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(verdicts(9000003L) == "new" && verdicts(9000005L) == "new")
  }

  test("streaming corpus card equals the one-shot rebuild across a cross-batch dup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{CorpusOps, DedupOps, Tables}
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val copied = docs.orderBy(col("doc_id")).limit(1).collect()(0)
    // b1: an exact copy of a stored doc + a fresh text; b2: a copy of
    // b1's FRESH text — a duplicate only countable through the grown
    // fingerprint store (the cross-micro-batch case under test)
    val b1 = Seq(
      (8000001L, copied.getString(1), copied.getString(2), copied.getString(3)),
      (8000002L, "fresh streamed content", "en", "src0"))
    val b2 = Seq(
      (8000003L, "fresh streamed content", "en", "src0"),
      (8000004L, "another new stream doc", "de", "src1"))
    val out = java.nio.file.Files.createTempDirectory("graft_scc_out_").toString + "/cc"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_scc_ckpt_").toString
    val input = MemoryStream[(Long, String, String, String)]
    val q = graft.engine.StreamOps.streamingCorpusCard(
      input.toDS().toDF("doc_id", "text", "lang", "source"),
      CorpusOps.corpusCardState(docs), DedupOps.fingerprintStore(docs), out, ckpt)
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    def proj(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    val streamed = proj(graft.engine.TickCommit.readLatest(spark, out, "card").get
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        col("avg_quality_ppm"), col("n_exact_dups"), col("dup_rate")).collect())
    val rebuilt = proj(CorpusOps.corpusCard(docs.unionByName(
        (b1 ++ b2).toDF("doc_id", "text", "lang", "source"))).collect())
    assert(streamed == rebuilt,
      s"streamed card diverged (${streamed.size} vs ${rebuilt.size} groups)")
    // both planted dups actually counted: vs the base corpus the
    // copied doc's group and the fresh pair's group each gained one
    val base = proj(CorpusOps.corpusCard(docs).collect())
    val copyKey = (copied.getString(2), copied.getString(3))
    assert(streamed(copyKey)._4 == base(copyKey)._4 + 1L,
      "stored-text copy counted through the fingerprint store")
    assert(streamed(("en", "src0"))._4 ==
      base.getOrElse(("en", "src0"), (0L, 0L, 0L, 0L, 0.0))._4 +
        (if (copyKey == ("en", "src0")) 2L else 1L),
      "cross-batch dup counted through the GROWN fingerprint store")
  }

  test("streaming ingest tick drops copies and near-dups of earlier keepers through the grown stores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{CorpusOps, DedupOps, StreamOps, Tables}
    val docs = Tables.documents(spark, sf)
    val k = "the quick brown fox jumps over the lazy dog while seventeen " +
      "wandering minstrels play quiet evening songs near the river"
    val b1 = Seq(
      (9300001L, k),
      (9300002L, "completely different second document with many varied " +
        "interesting words about mountains and weather patterns"))
    val b2 = Seq(
      (9300003L, k),            // exact copy of b1's keeper → exact stage
      (9300004L, k + " tail"),  // near-dup of b1's keeper → sketch stage
      (9300005L, "yet another entirely distinct text mentioning oceans " +
        "satellites and ancient library archives"))
    val out = java.nio.file.Files.createTempDirectory("graft_sit_out_").toString + "/it"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sit_ckpt_").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingIngestTick(
      input.toDS().toDF("doc_id", "text"),
      DedupOps.fingerprintStore(docs), DedupOps.minhashSignatures(docs),
      out, ckpt)
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val f = spark.read.parquet(s"$out/funnel")
      .select(col("tick").cast("long").as("tick"), col("stage"),
        col("n_docs"), col("n_dropped")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(f((0L, 0L)) == ((2L, 0L)) && f((0L, 3L)) == ((2L, 0L)),
      s"tick 0 admits both fresh docs: $f")
    assert(f((1L, 0L)) == ((3L, 0L)))
    assert(f((1L, 1L)) == ((2L, 1L)),
      s"the copy of tick 0's keeper must drop at the EXACT stage: $f")
    assert(f((1L, 3L)) == ((1L, 1L)),
      s"the near-dup of tick 0's keeper must drop at the SKETCH stage: $f")
    // stores grew by exactly the three admitted docs
    val baseFps = DedupOps.fingerprintStore(docs).count()
    assert(graft.engine.TickCommit.readLatest(spark, out, "fps").get.count() ==
      baseFps + 3)
    assert(graft.engine.TickCommit.readLatest(spark, out, "sigs").get.count() ==
      DedupOps.minhashSignatures(docs).count() + 3)
    // and the per-tick reports equal the batch API run sequentially
    val fps1 = DedupOps.fingerprintStore(docs)
      .unionByName(DedupOps.fingerprintStore(b1.toDF("doc_id", "text")))
      .groupBy(col("fp_md5")).agg(min(col("keeper_id")).as("keeper_id"))
    val sigs1 = DedupOps.minhashSignatures(docs)
      .unionByName(DedupOps.minhashSignatures(b1.toDF("doc_id", "text")))
    val expected2 = CorpusOps.ingestFunnel(fps1, sigs1,
        b2.toDF("doc_id", "text"), DedupOps.minhashSignatures(b2.toDF("doc_id", "text")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    (0L to 3L).foreach(st => assert(f((1L, st)) == expected2(st),
      s"tick 1 stage $st diverged from the batch API: ${f((1L, st))} vs ${expected2(st)}"))
  }

  test("ingest tick restart: a query rebuilt from the snapshots continues the same stores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{DedupOps, StreamOps, Tables}
    val docs = Tables.documents(spark, sf)
    val k = "a perfectly ordinary keeper document about winter gardening " +
      "techniques and greenhouse ventilation schedules for cold climates"
    val out = java.nio.file.Files.createTempDirectory("graft_rst_out_").toString + "/it"
    val ck1 = java.nio.file.Files.createTempDirectory("graft_rst_ck1_").toString
    val ck2 = java.nio.file.Files.createTempDirectory("graft_rst_ck2_").toString
    val in1 = MemoryStream[(Long, String)]
    val q1 = StreamOps.streamingIngestTick(in1.toDS().toDF("doc_id", "text"),
      DedupOps.fingerprintStore(docs), DedupOps.minhashSignatures(docs), out, ck1)
    try { in1.addData((9400001L, k)); q1.processAllAvailable() } finally q1.stop()
    // RESTART: a brand-new query reconstructed from the durable
    // snapshots — the in-JVM vars are gone with q1
    val fps = graft.engine.TickCommit.readLatest(spark, out, "fps")
      .get.localCheckpoint(true)
    val sigs = graft.engine.TickCommit.readLatest(spark, out, "sigs")
      .get.localCheckpoint(true)
    // a fresh checkpoint restarts tick numbering at 0, and the funnel
    // sink is tick-partitioned-overwrite (replay-idempotent) — so a
    // LOGICALLY new query takes a new sink root; only the durable
    // stores carry over (resuming the SAME checkpoint would instead
    // continue the tick numbering into the same root)
    val out2 = java.nio.file.Files.createTempDirectory("graft_rst_out2_")
      .toString + "/it"
    val in2 = MemoryStream[(Long, String)]
    val q2 = StreamOps.streamingIngestTick(in2.toDS().toDF("doc_id", "text"),
      fps, sigs, out2, ck2)
    try {
      in2.addData((9400002L, k + " extras"), (9400003L, k))
      q2.processAllAvailable()
    } finally q2.stop()
    // the pre-restart keeper still guards: its exact copy drops at the
    // exact stage, its near-dup at the sketch stage — across the restart
    def rowsOf(root: String) = spark.read.parquet(s"$root/funnel")
      .select(col("stage"), col("n_docs"), col("n_dropped")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rowsOf(out).contains((3L, 1L, 0L)),
      s"pre-restart tick admits its keeper end-to-end: ${rowsOf(out)}")
    assert(rowsOf(out2).contains((0L, 2L, 0L)) &&
      rowsOf(out2).contains((1L, 1L, 1L)),
      s"post-restart: the reloaded fp store drops the exact copy: ${rowsOf(out2)}")
    assert(rowsOf(out2).contains((3L, 0L, 1L)),
      s"post-restart: the reloaded sketch store drops the near-dup: ${rowsOf(out2)}")
    assert(graft.engine.TickCommit.readLatest(spark, out2, "fps").get.count() ==
      fps.count(),
      "no new fingerprints: both post-restart docs were rejected")
  }

  test("streaming licensed ingest tick: deny-source docs never grow the stores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{CorpusOps, DedupOps, StreamOps, Tables}
    val docs = Tables.documents(spark, sf)
    // src0 → cc-by/allow; src2 → proprietary/deny (trailing-digit rule)
    val dim = CorpusOps.sourceLicenseDim(
        docs.select(col("source"))
          .unionByName(Seq("src0", "src2").toDF("source")))
      .localCheckpoint(true)
    val k = "the licensed keeper document describes permissive reuse terms " +
      "and long form attribution requirements for derivative corpora"
    val denyText = "a proprietary body of text that must never seed the stores " +
      "even though its content is perfectly ordinary prose about harbors"
    val b1 = Seq((9500001L, k, "src0"), (9500002L, denyText, "src2"))
    val b2 = Seq(
      (9500003L, k, "src0"),           // exact copy of the allowed keeper → exact stage
      (9500004L, k + " tail", "src0"), // near-dup of the allowed keeper → sketch stage
      (9500005L, denyText, "src0"))    // copy of the DENIED doc from an allowed source:
                                       // admissible ONLY if the deny doc never grew the store
    val out = java.nio.file.Files.createTempDirectory("graft_slt_out_").toString + "/lt"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_slt_ckpt_").toString
    val input = MemoryStream[(Long, String, String)]
    val q = StreamOps.streamingLicensedIngestTick(
      input.toDS().toDF("doc_id", "text", "source"),
      DedupOps.fingerprintStore(docs), DedupOps.minhashSignatures(docs),
      dim, out, ckpt)
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val f = spark.read.parquet(s"$out/funnel")
      .select(col("tick").cast("long").as("tick"), col("stage"),
        col("n_docs"), col("n_dropped")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(f((0L, 0L)) == ((2L, 0L)) && f((0L, 3L)) == ((2L, 0L)),
      s"tick 0: both docs survive to near-dup: $f")
    assert(f((0L, 4L)) == ((1L, 1L)),
      s"tick 0: the deny-source doc must drop at the LICENSE stage: $f")
    assert(f((1L, 1L)) == ((2L, 1L)),
      s"tick 1: the copy of the admitted keeper drops at the EXACT stage: $f")
    assert(f((1L, 3L)) == ((1L, 1L)),
      s"tick 1: the near-dup of the admitted keeper drops at the SKETCH stage: $f")
    assert(f((1L, 4L)) == ((1L, 0L)),
      s"tick 1: the allowed-source copy of the DENIED text is admitted — " +
        s"the deny doc never seeded the store: $f")
    // stores grew by exactly the two admitted docs (tick 0 keeper +
    // tick 1 deny-text copy), never by any rejected doc
    assert(graft.engine.TickCommit.readLatest(spark, out, "fps").get.count() ==
      DedupOps.fingerprintStore(docs).count() + 2)
    assert(graft.engine.TickCommit.readLatest(spark, out, "sigs").get.count() ==
      DedupOps.minhashSignatures(docs).count() + 2)
    // per-tick reports equal the batch API run sequentially
    val fps1 = DedupOps.fingerprintStore(docs)
      .unionByName(DedupOps.fingerprintStore(
        Seq((9500001L, k)).toDF("doc_id", "text")))
      .groupBy(col("fp_md5")).agg(min(col("keeper_id")).as("keeper_id"))
    val sigs1 = DedupOps.minhashSignatures(docs)
      .unionByName(DedupOps.minhashSignatures(
        Seq((9500001L, k)).toDF("doc_id", "text")))
    val expected2 = CorpusOps.licensedIngestFunnel(fps1, sigs1,
        b2.toDF("doc_id", "text", "source"),
        DedupOps.minhashSignatures(b2.toDF("doc_id", "text", "source")), dim)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    (0L to 4L).foreach(st => assert(f((1L, st)) == expected2(st),
      s"tick 1 stage $st diverged from the batch API: ${f((1L, st))} vs ${expected2(st)}"))
  }

  test("ingest tick crash-after-seal: the replayed committed tick is skipped, not falsified") {
    // The ADVICE r17 replay window: a crash AFTER TickCommit.seal but
    // BEFORE Spark writes its commit log re-delivers the tick, and a
    // restart loads the POST-tick stores via readLatest — so without
    // the isCommitted guard the replayed funnel would drop every doc
    // at the exact stage (they're already fingerprinted) and
    // OVERWRITE the tick's honest ledger row with all-dropped rows.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{DedupOps, StreamOps, Tables, TickCommit}
    val docs = Tables.documents(spark, sf)
    val b = Seq(
      (9600001L, "an admitted replay-window document about tidal energy " +
        "turbines and their seasonal maintenance routines"),
      (9600002L, "a second admitted document describing alpine railway " +
        "snow clearance procedures in considerable detail"))
    val out = java.nio.file.Files.createTempDirectory("graft_rpl_out_").toString + "/it"
    val ck1 = java.nio.file.Files.createTempDirectory("graft_rpl_ck1_").toString
    val in1 = MemoryStream[(Long, String)]
    val q1 = StreamOps.streamingIngestTick(in1.toDS().toDF("doc_id", "text"),
      DedupOps.fingerprintStore(docs), DedupOps.minhashSignatures(docs), out, ck1)
    try { in1.addData(b: _*); q1.processAllAvailable() } finally q1.stop()
    assert(TickCommit.isCommitted(spark, out, 0L), "tick 0 sealed")
    val fpsN = TickCommit.readLatest(spark, out, "fps").get.count()
    // the replay, simulated FAITHFULLY: the crash landed after seal()
    // but before Spark's commit-log write — erase the batch's commit
    // record and restart from the SAME checkpoint (TickCommit.bind
    // rejects a fresh one); recovery re-delivers tick 0, the sink's
    // state reconstructed from readLatest
    assert(new java.io.File(s"$ck1/commits/0").delete(), "commit record erased")
    new java.io.File(s"$ck1/commits/.0.crc").delete() // local-FS checksum shadow
    val q2 = StreamOps.streamingIngestTick(in1.toDS().toDF("doc_id", "text"),
      TickCommit.readLatest(spark, out, "fps").get,
      TickCommit.readLatest(spark, out, "sigs").get, out, ck1)
    try { q2.processAllAvailable() } finally q2.stop()
    // guarded: the funnel ledger still shows the docs ADMITTED (the
    // unguarded replay would rewrite stage 1 as (2 docs, 2 dropped))
    val f = spark.read.parquet(s"$out/funnel")
      .select(col("tick").cast("long"), col("stage"), col("n_docs"),
        col("n_dropped")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(f((0L, 1L)) == ((2L, 0L)),
      s"the committed tick's ledger must survive the replay untouched: $f")
    assert(f((0L, 3L)) == ((2L, 0L)), s"both docs still admitted: $f")
    assert(TickCommit.readLatest(spark, out, "fps").get.count() == fpsN,
      "the replayed tick must not grow the stores")
  }

  test("IVF rebalance crash-after-seal: the replayed committed tick must not double-append") {
    // Same ADVICE r17 window for the index sinks: readLatest hands the
    // restart the POST-tick index, so an unguarded replay re-appends
    // the batch's assignments (duplicate vec_ids, double-counted lists).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{SimilarityOps, StreamOps, Tables, TickCommit}
    val emb = Tables.embeddings(spark, sf)
    val index = SimilarityOps.ivfIndexFor(emb, tag = sf)
    val feed = emb.filter(col("vec_id") % 11 === 4)
      .select(col("vec_id") + lit(9700000L), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val out = java.nio.file.Files.createTempDirectory("graft_rrb_out_").toString + "/rb"
    val ck1 = java.nio.file.Files.createTempDirectory("graft_rrb_ck1_").toString
    val in1 = MemoryStream[(Long, Array[Float])]
    val q1 = StreamOps.streamingIvfRebalance(
      in1.toDS().toDF("vec_id", "embedding"), index, out, ck1)
    try { in1.addData(feed.toSeq: _*); q1.processAllAvailable() } finally q1.stop()
    val n1 = TickCommit.readLatest(spark, out, "index_assign").get.count()
    assert(n1 == emb.count() + feed.length, "tick 0 appended the batch once")
    // the crash window, simulated faithfully: erase the commit-log
    // record and restart from the SAME checkpoint with the POST-tick
    // index readLatest hands a recovery — tick 0 re-delivers
    val restored = SimilarityOps.IvfIndex(
      TickCommit.readLatest(spark, out, "index_assign").get.localCheckpoint(false),
      TickCommit.readLatest(spark, out, "index_centers").get.localCheckpoint(false),
      index.nLists)
    assert(new java.io.File(s"$ck1/commits/0").delete(), "commit record erased")
    new java.io.File(s"$ck1/commits/.0.crc").delete() // local-FS checksum shadow
    val q2 = StreamOps.streamingIvfRebalance(
      in1.toDS().toDF("vec_id", "embedding"), restored, out, ck1)
    try { q2.processAllAvailable() } finally q2.stop()
    val after = TickCommit.readLatest(spark, out, "index_assign").get
    assert(after.count() == n1,
      "the guarded replay must leave the committed index untouched")
    assert(after.select(col("vec_id")).distinct().count() == n1,
      "no duplicate vec_ids after the replay")
  }

  test("IVF maintenance self-resumes from its committed counts snapshot") {
    // same-outPath restart: tick 0 re-delivered is skipped by the
    // replay guard (assign partition and report untouched), and the
    // NEXT tick folds into the counts loaded from the committed
    // snapshot — so the standing report stays cumulative across the
    // restart without any constructor seam.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{SimilarityOps, StreamOps, Tables, TickCommit}
    val emb = Tables.embeddings(spark, sf)
    val index = SimilarityOps.ivfIndexFor(emb, tag = sf)
    def feed(m: Int, base: Long) = emb.filter(col("vec_id") % 13 === m)
      .select(col("vec_id") + lit(base), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val (fA, fC) = (feed(1, 7000000L), feed(3, 7200000L))
    val out = java.nio.file.Files.createTempDirectory("graft_srm_out_").toString + "/m"
    val ck1 = java.nio.file.Files.createTempDirectory("graft_srm_ck1_").toString
    val in1 = MemoryStream[(Long, Array[Float])]
    val q1 = StreamOps.streamingIvfMaintain(
      in1.toDS().toDF("vec_id", "embedding"), index, out, ck1)
    try { in1.addData(fA.toSeq: _*); q1.processAllAvailable() } finally q1.stop()
    // restart after the crash window: erase the commit record and
    // resume the SAME checkpoint — tick 0 re-delivers (skipped by the
    // guard), tick 1 folds into the counts loaded from the committed
    // snapshot
    assert(new java.io.File(s"$ck1/commits/0").delete(), "commit record erased")
    new java.io.File(s"$ck1/commits/.0.crc").delete() // local-FS checksum shadow
    val q2 = StreamOps.streamingIvfMaintain(
      in1.toDS().toDF("vec_id", "embedding"), index, out, ck1)
    try {
      q2.processAllAvailable()   // the replayed tick 0
      in1.addData(fC.toSeq: _*)  // tick 1: genuinely new
      q2.processAllAvailable()
    } finally q2.stop()
    def proj(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).sortBy(_._1).toSeq
    val streamed = proj(TickCommit.readLatest(spark, out, "report").get.collect())
    val oneShot = proj(SimilarityOps.ivfIncrementalAppend(index,
      (fA ++ fC).toSeq.toDF("vec_id", "embedding")).collect())
    assert(streamed == oneShot,
      "post-restart report must be cumulative over tick 0 + the new tick, " +
        "with the replayed tick folded exactly once")
    val assigned = spark.read.parquet(s"$out/assign").count()
    assert(assigned == fA.length + fC.length,
      "the replayed tick's assign partition is untouched, the new tick appends")
  }

  test("TickCommit refuses to seal backwards against a later committed tick") {
    // The ADVICE r17 fresh-checkpoint hazard: batch ids restart at 0,
    // so sealing tick 0 under an outPath whose tick 5 is committed
    // would leave tick 5 permanently authoritative (readLatest max)
    // while the new run believes it is making progress.
    import spark.implicits._
    import graft.engine.TickCommit
    val out = java.nio.file.Files.createTempDirectory("graft_bwd_out_").toString + "/tc"
    TickCommit.stage(spark, out, 5L, Seq("t" -> Seq(1L).toDF("x")))
    TickCommit.seal(spark, out, 5L)
    TickCommit.stage(spark, out, 0L, Seq("t" -> Seq(2L).toDF("x")))
    val e = intercept[IllegalStateException] { TickCommit.seal(spark, out, 0L) }
    assert(e.getMessage.contains("refusing to seal"), e.getMessage)
    assert(TickCommit.latestTick(spark, out).contains(5L),
      "the old run's committed tick stays authoritative")
    assert(TickCommit.readLatest(spark, out, "t").get.head().getLong(0) == 1L,
      "readLatest still serves the committed snapshot")
    // re-sealing the SAME tick (a legitimate replay shape) still works
    TickCommit.seal(spark, out, 5L)
    assert(TickCommit.latestTick(spark, out).contains(5L))
  }

  test("resumeInto seeds a fresh outPath whose new run continues the carried stores") {
    // the remedy the backwards-seal error prescribes, mechanized: copy
    // the old run's authoritative snapshot into a fresh outPath sealed
    // at tick -1, so the restarted query's tick 0 seals above it and
    // readLatest serves the seed before the first new tick lands.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{DedupOps, StreamOps, Tables, TickCommit}
    val docs = Tables.documents(spark, sf)
    val k = "a resumable keeper document cataloguing lighthouse lens " +
      "maintenance intervals and coastal fog signal schedules"
    val out1 = java.nio.file.Files.createTempDirectory("graft_rsm_out1_").toString + "/it"
    val ck1 = java.nio.file.Files.createTempDirectory("graft_rsm_ck1_").toString
    val in1 = MemoryStream[(Long, String)]
    val q1 = StreamOps.streamingIngestTick(in1.toDS().toDF("doc_id", "text"),
      DedupOps.fingerprintStore(docs), DedupOps.minhashSignatures(docs), out1, ck1)
    try { in1.addData((9800001L, k)); q1.processAllAvailable() } finally q1.stop()
    val out2 = java.nio.file.Files.createTempDirectory("graft_rsm_out2_").toString + "/it"
    assert(TickCommit.resumeInto(spark, out1, out2) == 0L,
      "the seed reports which tick it carried")
    assert(TickCommit.latestTick(spark, out2).contains(-1L))
    assert(TickCommit.readLatest(spark, out2, "fps").get.count() ==
      TickCommit.readLatest(spark, out1, "fps").get.count(),
      "the seed serves the carried store before any new tick")
    // a brand-new query against the seeded path: the old keeper still
    // guards (its copy drops at the exact stage), and tick 0 seals
    // cleanly above the tick=-1 seed
    val ck2 = java.nio.file.Files.createTempDirectory("graft_rsm_ck2_").toString
    val in2 = MemoryStream[(Long, String)]
    val q2 = StreamOps.streamingIngestTick(in2.toDS().toDF("doc_id", "text"),
      TickCommit.readLatest(spark, out2, "fps").get,
      TickCommit.readLatest(spark, out2, "sigs").get, out2, ck2)
    try { in2.addData((9800002L, k)); q2.processAllAvailable() } finally q2.stop()
    assert(TickCommit.latestTick(spark, out2).contains(0L),
      "the resumed run's tick 0 is now authoritative")
    val f = spark.read.parquet(s"$out2/funnel")
      .select(col("stage"), col("n_docs"), col("n_dropped")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(f.contains((1L, 0L, 1L)),
      s"the pre-resume keeper drops its copy at the exact stage: $f")
    // seeding into a path with committed ticks >= 0 refuses
    val e = intercept[IllegalStateException] {
      TickCommit.resumeInto(spark, out1, out2)
    }
    assert(e.getMessage.contains("refusing to seed"), e.getMessage)
  }

  test("streaming cross-modal gate equals the q261 batch accounting across a micro-batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{MultimodalOps, StreamOps, Tables}
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    // the pinned q261 mismatch pair lands on the SECOND tick, so the
    // drop branch crosses the micro-batch boundary
    val planted = Seq(
      (9800001L, "short caption only", "srcA"),
      (9800002L, "a proper caption describing a sunset over mountains " + "x" * 200,
        "srcA"))
    val (f1, f2) = docs.splitAt(docs.length / 2)
    val out = java.nio.file.Files.createTempDirectory("graft_scm_out_").toString + "/cm"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_scm_ckpt_").toString
    val input = MemoryStream[(Long, String, String)]
    val q = StreamOps.streamingCrossModalGate(
      input.toDS().toDF("doc_id", "text", "source"), out, ckpt)
    try {
      input.addData(f1.toSeq: _*)
      q.processAllAvailable()
      input.addData(f2.toSeq ++ planted: _*)
      q.processAllAvailable()
    } finally q.stop()
    def proj(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val streamed = proj(
      graft.engine.TickCommit.readLatest(spark, out, "accounting").get
      .select(col("source"), col("n_docs"), col("n_aligned"), col("n_dropped"))
      .collect())
    val batch = proj(MultimodalOps.crossModalAlignmentGate(
        (docs.toSeq ++ planted).toDF("doc_id", "text", "source")).collect())
    assert(streamed == batch,
      s"streamed accounting diverged from the one-shot q261 rollup " +
        s"(${streamed.size} vs ${batch.size} sources)")
    // the pinned pair exercised both branches in-stream
    val verdicts = spark.read.parquet(s"$out/verdicts").collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Boolean]("aligned")).toMap
    assert(verdicts(9800001L) && !verdicts(9800002L),
      "pinned aligned/mismatched pair must verdict in-stream")
    assert(streamed.values.forall(v => v._1 == v._2 + v._3), "conservation per source")
  }

  test("streaming semantic dedup flags a copy of an earlier batch's keeper through the grown index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{SimilarityOps, StreamOps, Tables}
    val emb = Tables.embeddings(spark, sf)
    def vecOf(id: Long): Array[Float] = emb.filter(col("vec_id") === id)
      .collect()(0).getSeq[Float](1).toArray
    val novelA = vecOf(3L).reverse   // novel vs the corpus (low cosine)
    val novelB = vecOf(10L).reverse  // novel vs corpus AND vs novelA
    // b1: one novel keeper + one copy of a STORED vector; b2: a copy
    // of b1's keeper — a dup only through the grown index — + a novel
    val b1 = Seq((9200001L, novelA), (9200002L, vecOf(5L)))
    val b2 = Seq((9200003L, novelA), (9200004L, novelB))
    val out = java.nio.file.Files.createTempDirectory("graft_ssd_out_").toString + "/sd"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssd_ckpt_").toString
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamOps.streamingSemanticDedup(
      input.toDS().toDF("vec_id", "embedding"),
      SimilarityOps.ivfIndexFor(emb, tag = sf), out, ckpt)
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val v = spark.read.parquet(s"$out/verdicts").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(4),
        Option(r.get(2)).map(_ => r.getLong(2))))).toMap
    assert(!v(9200001L)._1, s"novel keeper must pass: ${v(9200001L)}")
    assert(v(9200002L) == ((true, Some(5L))),
      s"stored copy must flag dup to its original: ${v(9200002L)}")
    assert(v(9200003L) == ((true, Some(9200001L))),
      s"cross-batch copy must flag dup to the earlier KEEPER: ${v(9200003L)}")
    assert(!v(9200004L)._1, s"second novel must pass: ${v(9200004L)}")
    // index grew by exactly the two keepers; dups never entered
    val assignedIds = graft.engine.TickCommit.readLatest(spark, out, "assign")
      .get.collect().map(_.getLong(0)).toSet
    assert(assignedIds.contains(9200001L) && assignedIds.contains(9200004L))
    assert(!assignedIds.contains(9200002L) && !assignedIds.contains(9200003L))
    assert(assignedIds.size == emb.count().toInt + 2)
  }

  test("streaming importance resampling adapts the pool and matches the sequential batch API") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{StreamOps, TextOps}
    // frozen target domain (12-word vocabulary keeps the Laplace
    // floor low enough that off-domain ratios stay under the cap);
    // the streamed phrase is vocabulary-disjoint from both seeds
    val targetModel = TextOps.lmModel((0L until 10L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text"))
    val pool0Docs = (100L until 110L)
      .map(i => (i, "plain older filler text")).toDF("doc_id", "text")
    val pool0 = TextOps.lmModel(pool0Docs)
    val b1 = Seq((9200001L, "zulu yankee xray whisky"))
    val b2 = Seq((9200002L, "zulu yankee xray whisky"))
    val out = java.nio.file.Files.createTempDirectory("graft_sir_out_").toString + "/ir"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sir_ckpt_").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingImportanceResample(
      input.toDS().toDF("doc_id", "text"), targetModel, pool0, out, ckpt)
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // sequential batch reference: merge first, then verdicts
    val m1 = TextOps.lmModelMerge(pool0, b1.toDF("doc_id", "text"))
    val m2 = TextOps.lmModelMerge(m1, b2.toDF("doc_id", "text"))
    val expected =
      TextOps.importanceVerdicts(targetModel, m1, b1.toDF("doc_id", "text")).collect() ++
      TextOps.importanceVerdicts(targetModel, m2, b2.toDF("doc_id", "text")).collect()
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val got = key(spark.read.parquet(s"$out/verdicts").collect())
    assert(got == key(expected), s"streamed verdicts diverged: $got")
    // adaptation is live: identical off-domain text weighs LESS once
    // its phrasing has accumulated in the carried pool
    assert(got(9200002L)._2 < got(9200001L)._2, s"pool adaptation: $got")
    assert(got.values.forall(_._2 < 1000000L), "off-domain ratios stay under the cap")
    // final pool snapshot ≡ full retrain over everything ever pooled
    val retrain = TextOps.lmModel(
      pool0Docs.unionByName((b1 ++ b2).toDF("doc_id", "text")))
    def biSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(biSet(graft.engine.TickCommit.readLatest(spark, out, "pool_bigrams").get)
        == biSet(retrain.bigrams),
      "final pool snapshot must equal the full retrain")
  }

  test("streaming LM maintenance tracks the sequential merge across a novel-phrase boundary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{StreamOps, Tables, TextOps}
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    // b1 introduces a novel phrase; b2 REUSES it — its bigrams are
    // seen only through the state b1 folded in (the cross-boundary
    // case), and must score by b1-era counts + 1
    val b1 = Seq((9100001L, "zzqp alpha beta"), (9100002L, "plain older text"))
    val b2 = Seq((9100003L, "zzqp alpha beta"))
    val out = java.nio.file.Files.createTempDirectory("graft_slm_out_").toString + "/lm"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_slm_ckpt_").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingLmMaintain(
      input.toDS().toDF("doc_id", "text"), TextOps.lmModel(docs), out, ckpt)
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // expected: the batch API's sequential merge, scored per arrival
    val m1 = TextOps.lmModelMerge(TextOps.lmModel(docs), b1.toDF("doc_id", "text"))
    val m2 = TextOps.lmModelMerge(m1, b2.toDF("doc_id", "text"))
    val expected =
      TextOps.lmScoreWith(m1, b1.toDF("doc_id", "text")).collect() ++
      TextOps.lmScoreWith(m2, b2.toDF("doc_id", "text")).collect()
    val got = spark.read.parquet(s"$out/scores").collect()
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(key(got) == key(expected), s"streamed scores diverged: ${key(got)}")
    // the reuse actually bridged: b2's doc scores strictly higher than
    // b1's identical text did (its bigrams now carry b1's counts)
    assert(key(got)(9100003L)._2 > key(got)(9100001L)._2,
      "cross-batch phrase reuse must score as seen")
    // final snapshot ≡ full retrain over everything ever streamed
    val retrain = TextOps.lmModel(
      docs.unionByName((b1 ++ b2).toDF("doc_id", "text")))
    def biSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(biSet(graft.engine.TickCommit.readLatest(spark, out, "bigrams").get)
        == biSet(retrain.bigrams),
      "final bigram snapshot must equal the full retrain")
    assert(graft.engine.TickCommit.readLatest(spark, out, "vocab").get
        .collect().map(_.getString(0)).toSet ==
      retrain.vocab.collect().map(_.getString(0)).toSet)
  }

  test("LM maintenance crash-after-seal: the replayed committed tick must not re-merge") {
    // the merge is NOT idempotent: a replay against the post-tick
    // model a restart loads via readLatest would double-count every
    // bigram of the batch — the r18 guard skips the committed tick.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.engine.{StreamOps, Tables, TextOps, TickCommit}
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val b = Seq((9900001L, "qqzv gamma delta epsilon"))
    val out = java.nio.file.Files.createTempDirectory("graft_rlm_out_").toString + "/lm"
    val ck1 = java.nio.file.Files.createTempDirectory("graft_rlm_ck1_").toString
    val in1 = MemoryStream[(Long, String)]
    val q1 = StreamOps.streamingLmMaintain(
      in1.toDS().toDF("doc_id", "text"), TextOps.lmModel(docs), out, ck1)
    try { in1.addData(b: _*); q1.processAllAvailable() } finally q1.stop()
    def bigrams() = TickCommit.readLatest(spark, out, "bigrams").get.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val once = bigrams()
    assert(once(("qqzv", "gamma")) == 1L, s"merged once: ${once.size} bigrams")
    // replay the committed tick: erase the commit record and restart
    // the SAME checkpoint with the post-tick model readLatest hands a
    // recovery — tick 0 re-delivers the same batch
    assert(new java.io.File(s"$ck1/commits/0").delete(), "commit record erased")
    new java.io.File(s"$ck1/commits/.0.crc").delete() // local-FS checksum shadow
    val q2 = StreamOps.streamingLmMaintain(
      in1.toDS().toDF("doc_id", "text"),
      TextOps.LmModel(TickCommit.readLatest(spark, out, "bigrams").get,
        TickCommit.readLatest(spark, out, "contexts").get,
        TickCommit.readLatest(spark, out, "vocab").get), out, ck1)
    try { q2.processAllAvailable() } finally q2.stop()
    assert(bigrams() == once,
      "the guarded replay must not double-merge the batch's counts")
  }

  test("streaming gate verdicts equal the batch gate across a micro-batch boundary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, sf)
    val feed = docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    val (feed1, feed2) = feed.splitAt(feed.length / 2)
    val out = java.nio.file.Files.createTempDirectory("graft_sg_out_").toString + "/v"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sg_ckpt_").toString
    val input = MemoryStream[(Long, String, String, String)]
    val q = StreamOps.streamingGate(
      input.toDS().toDF("doc_id", "text", "lang", "source"), out, ckpt)
    try {
      input.addData(feed1.toSeq: _*)
      q.processAllAvailable()
      input.addData(feed2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(5), r.getBoolean(6))).sortBy(_._1)
    val batch = graft.engine.TextOps.repetitionRuleFilter(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(5), r.getBoolean(6))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      s"streaming gate diverged from the batch gate (${streamed.length} vs ${batch.length})")
    // the sink supports the q116 rollup: recompute accounting from it
    val sinkAcct = spark.read.parquet(out).groupBy(col("verdict")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchAcct = graft.engine.TextOps.gateAccounting(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sinkAcct == batchAcct)
  }

  test("streaming sequence packing equals the batch form over the same fed docs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // real per-doc token counts, fed across batches in doc_id order
    // (the stream-order contract): the per-lang cumsum state must
    // carry across the batch boundary for spans to stay aligned
    val toks = graft.engine.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        size(expr(s"regexp_extract_all(text, '${graft.engine.TextOps.pieceRe}', 0)")).cast("long"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    val (feed1, feed2) = toks.splitAt(toks.length / 2)
    val input = MemoryStream[(String, Long, Long)]
    val q = StreamOps.packSequencesStream(input.toDS())
      .toDF("lang", "doc_id", "n_tokens", "start_seq", "end_seq", "tok_offset", "n_seqs")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_pack").start()
    try {
      input.addData(feed1.toSeq: _*)
      q.processAllAvailable()
      input.addData(feed2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_pack").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(t => (t._1, t._2))
    val batch = graft.engine.CorpusOps.packSequences(
        graft.engine.Tables.documents(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(t => (t._1, t._2))
    assert(streamed.toSeq == batch.toSeq,
      s"streaming packing diverged from batch (${streamed.length} vs ${batch.length} rows)")
  }
}
