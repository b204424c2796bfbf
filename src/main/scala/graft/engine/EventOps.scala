package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream: ordered funnels
  * and retention cohorts — the product-analytics pair every event
  * warehouse serves (cf. reference `app/stream_processing.py`-style
  * event rollups; the reference aggregates per event type, these two
  * add ORDER between types and RECURRENCE over weeks).
  *
  * Both are expressed as one keyed shuffle on `user_id` plus ordered
  * in-partition work — the canonical Spark shape for per-entity
  * sequence analysis: no self-joins on the event table, no driver
  * loops, and the per-user frame is bounded by that user's events.
  */
object EventOps {

  /** Ordered conversion funnel view → click → purchase: a user
    * converts stage k only with an event AT OR AFTER their stage-k−1
    * conversion (the strict product-funnel semantics — a purchase
    * before ever viewing does not count). One pass: a per-user
    * running flag per stage (max-over-prefix window; stage k's flag
    * conditions on stage k−1's flag at the same row), then a per-user
    * max and one tiny 3-row rollup. ROWS frames with an (ts,
    * event_id) tiebreak make prefix membership deterministic — the
    * oracle replays the identical window chain.
    *
    * Scale: ONE shuffle on user_id shared by all three window layers
    * (same partitioning, one sort), then a user-count-sized
    * aggregate. Never joins events to events. */
  def funnel(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("s1", max(when(col("event_type") === "view", 1).otherwise(0)).over(w))
      .withColumn("s2", max(when(col("event_type") === "click" && col("s1") === 1, 1)
        .otherwise(0)).over(w))
      .withColumn("s3", max(when(col("event_type") === "purchase" && col("s2") === 1, 1)
        .otherwise(0)).over(w))
    val perUser = flagged.groupBy(col("user_id"))
      .agg(max(col("s1")).as("r1"), max(col("s2")).as("r2"), max(col("s3")).as("r3"))
    val one = perUser.agg(
      count(lit(1)).cast("long").as("total"),
      sum(col("r1")).cast("long").as("n1"),
      sum(col("r2")).cast("long").as("n2"),
      sum(col("r3")).cast("long").as("n3"))
    one.select(expr(
        "stack(3, 1L, 'view', n1, total, " +
        "2L, 'click', n2, n1, " +
        "3L, 'purchase', n3, n2) AS (stage_idx, stage, n_users, prev)"),
        col("total"))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        (col("n_users").cast("double") / col("total")).as("frac_of_total"),
        (col("n_users").cast("double") / nullif(col("prev"), lit(0L)))
          .as("frac_of_prev"))
      .orderBy(col("stage_idx"))
  }

  /** Weekly retention cohorts: cohort = ISO week of a user's FIRST
    * event; a user counts as retained at offset k if they have any
    * event in cohort week + k. Classic triangle matrix, here as rows
    * (cohort_week, week_offset, n_active, retention).
    *
    * Scale: first-seen is a per-user min (one shuffle on user_id);
    * the activity set is DISTINCT (user, week) — bounded by users ×
    * observed weeks, orders of magnitude under the event count — and
    * its join back to first-seen co-partitions on user_id. The final
    * rollup is cohort-×-offset sized (tiny). Integer week arithmetic
    * throughout; the only division is retention, exact BIGINT ÷
    * BIGINT per row. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    val active = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val joined = active.join(firstSeen, "user_id")
      .select(col("user_id"), col("cohort_week"),
        expr("CAST(datediff(wk, cohort_week) DIV 7 AS BIGINT)").as("week_offset"))
    val sizes = firstSeen.groupBy(col("cohort_week"))
      .agg(count(lit(1)).cast("long").as("cohort_size"))
    joined
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).cast("long").as("n_active"))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        (col("n_active").cast("double") / col("cohort_size")).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Last-touch attribution: every purchase credits the same user's
    * most recent PRIOR marketing event (view or click) — the
    * conversion-credit assignment behind ROI rollups. The carrier is
    * `last(col, ignoreNulls).over(strictly-preceding rows)` on
    * conditionally-nulled columns — the running "latest marketing
    * event so far" — so no event-to-event self-join exists; purchases
    * with no prior marketing stay NULL-attributed (reported, not
    * dropped).
    *
    * Scale: ONE shuffle on user_id, one sorted window pass shared by
    * the three carrier columns, then a purchases-only filter. */
  def lastTouchAttribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val mkt = col("event_type") === "view" || col("event_type") === "click"
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("attr_event_id",
        last(when(mkt, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("attr_type",
        last(when(mkt, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("attr_us",
        last(when(mkt, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"),
        col("attr_event_id"), col("attr_type"),
        (col("ts_us") - col("attr_us")).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** Per-user activity coverage: each event opens a [ts, ts+padSec)
    * activity interval; overlapping/touching intervals merge
    * (gaps-and-islands with a RUNNING-MAX end, which handles
    * intervals that nest — a plain lag compare does not), and the
    * report is per-user merged-interval count and total covered
    * microseconds — the "union of intervals" measure (uptime,
    * screen-on time, labeling effort) a plain SUM double-counts.
    *
    * Scale: ONE shuffle on user_id; both window layers reuse the
    * sort; the rollup is island-keyed. All-integer µs arithmetic. */
  def intervalCoverage(events: DataFrame, padSec: Int = 300): DataFrame = {
    val padUs = padSec * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("start_us"), col("event_id"))
    val runMaxEnd = max(col("end_us"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("start_us"),
        (unix_micros(col("ts")) + padUs).as("end_us"))
      .withColumn("new_island",
        (runMaxEnd.isNull || col("start_us") > runMaxEnd).cast("long"))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("start_us")).as("s"), max(col("end_us")).as("e"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_intervals"),
           sum(col("e") - col("s")).cast("long").as("covered_us"),
           min(col("s")).as("first_start_us"),
           max(col("e")).as("last_end_us"))
      .orderBy(col("user_id"))
  }

  /** Rolling active-user counts — daily actives and the trailing
    * 7-day distinct actives per day (the DAU/WAU pair). The rolling
    * distinct is NOT a window aggregate (COUNT(DISTINCT) over a
    * sliding frame re-scans the frame per row and most engines
    * refuse it); instead each (user, day) activity row is EXPLODED to
    * the 7 future days it covers and the count is one keyed
    * distinct-rollup per day — linear in activity × 7, one shuffle,
    * map-side partial on (day, user).
    *
    * Only days with their own activity are reported (dau > 0 rows —
    * the grid-densified variant composes with q178's gap filler). */
  def rollingActiveUsers(events: DataFrame): DataFrame = {
    val active = events
      .select(col("ts").cast("date").as("d"), col("user_id")).distinct()
      .localCheckpoint(false) // dau rollup + coverage explode read it
    val dau = active.groupBy(col("d"))
      .agg(countDistinct(col("user_id")).cast("long").as("dau"))
    val wau = active
      .select(explode(expr("sequence(0, 6)")).as("off"), col("d"), col("user_id"))
      .select(date_add(col("d"), col("off")).as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).cast("long").as("wau7"))
    dau.join(wau, dau("d") === wau("day"))
      .select(col("d"), col("dau"), col("wau7"))
      .orderBy(col("d"))
  }

  /** Attribution-window sensitivity — how many conversions each
    * candidate look-back window would credit: the last-touch gaps
    * ([[lastTouchAttribution]]) rolled up against a literal ladder of
    * windows (5 min / 30 min / 60 min / 24 h). The marketing question
    * this answers — "does our 30-minute window under-credit?" — is a
    * one-scan report here because the gap is computed once and each
    * window is just a predicate over it (windows × purchases explode,
    * window-count bounded).
    *
    * Integer µs comparisons throughout; rates are one division per
    * output row. */
  def attributionWindows(events: DataFrame): DataFrame = {
    val winUs = Seq(300L, 1800L, 3600L, 86400L).map(_ * 1000000L) // seconds → µs
    val winArr = winUs.mkString("array(", "L, ", "L)")
    val gaps = lastTouchAttribution(events)
      .select(col("purchase_id"), col("gap_us"))
      .localCheckpoint(false) // totals + per-window rollup
    val total = gaps.agg(count(lit(1)).cast("long").as("n_purchases"))
    gaps
      .crossJoin(broadcast(total))
      .select(col("purchase_id"), col("gap_us"), col("n_purchases"),
        explode(expr(winArr)).as("window_us"))
      .groupBy(col("window_us"), col("n_purchases"))
      .agg(count(when(col("gap_us").isNotNull &&
        col("gap_us") <= col("window_us"), 1)).cast("long").as("n_credited"))
      .select(col("window_us"), col("n_purchases"), col("n_credited"),
        (col("n_credited").cast("double") / col("n_purchases"))
          .as("credit_rate"))
      .orderBy(col("window_us"))
  }

  /** SCD2-style state history — the slowly-changing-dimension build
    * every CDC/warehouse pipeline runs: per user, consecutive runs of
    * the same `event_type` compress into one versioned validity row
    * (version, state, valid_from, valid_to, n_events, last_seen),
    * with `valid_to` = the next run's `valid_from` (half-open
    * intervals, NULL ⇒ current). Change-points are a lag compare,
    * the version is the running count of change-points, the interval
    * close is a lead over the compressed runs — three window layers,
    * the first two sharing one (user_id) sort.
    *
    * Scale: ONE shuffle on user_id for the run detection (both
    * windows reuse the sort), a (user, version)-keyed rollup, then a
    * second per-user window over the COMPRESSED rows — bounded by
    * state changes, not events. No event-to-event self-join. */
  def scd2History(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val runs = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
             lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version",
        sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val hist = runs.groupBy(col("user_id"), col("version"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_events"),
           min(col("ts")).as("valid_from"),
           max(col("ts")).as("last_seen"))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("version"))
    hist
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
      .select(col("user_id"), col("version"), col("event_type"),
        col("n_events"), col("valid_from"), col("valid_to"),
        col("last_seen"), col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Batch sessionization — the gaps-and-islands assignment that
    * turns a raw event log into per-user sessions: a new session
    * starts at a user's first event or after a gap > `gapMinutes`;
    * the session id is the user-anchored running count of those
    * starts. Emits one row per session with its event count, bounds
    * and exact microsecond duration (integer end − start — no fp
    * anywhere in the chain).
    *
    * This is the SESSION-ID complement of the session-WINDOW
    * aggregate (q33/StreamOps.session): the window form fuses
    * per-key aggregation into the state machine; this form keeps the
    * assignment, so downstream queries can join events back to their
    * session. Same scale shape as [[funnel]]: ONE shuffle on
    * user_id, two window layers over the same sort, then a
    * session-count-sized rollup. (ts, event_id) tiebreak pins order
    * for simultaneous events. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        (col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs).cast("long"))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Linear multi-touch attribution — every marketing event within
    * the lookback window shares a purchase's credit equally (the
    * fairness complement of [[lastTouchAttribution]]'s winner-takes-
    * all): share = 10⁶ DIV n ppm per touch, and the LAST touch
    * absorbs the floor-division remainder so every purchase's credit
    * sums to exactly 10⁶ — conservation is an invariant, not a
    * rounding hope. The purchase×touch pair frame is a per-user
    * range join (co-partitioned on user, window-bounded fanout),
    * never an event×event cross. */
  def linearAttribution(events: DataFrame, lookbackDays: Int = 7): DataFrame = {
    val lookUs = lookbackDays * 86400L * 1000000L
    val base = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), col("event_type"))
      .localCheckpoint(false) // both sides of the per-user range join
    val mkt = base.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("us").as("touch_us"), col("event_type").as("touch_type"))
    val pur = base.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("us").as("p_us"))
    val j = pur.join(mkt, Seq("user_id"))
      .filter(col("touch_us") < col("p_us") && col("touch_us") >= col("p_us") - lookUs)
    val wN = Window.partitionBy(col("purchase_id"))
    val wR = Window.partitionBy(col("purchase_id"))
      .orderBy(col("touch_us").desc, col("touch_id").desc)
    j.withColumn("n_touches", count(lit(1)).over(wN).cast("long"))
      .withColumn("rk", row_number().over(wR).cast("long"))
      .withColumn("share_ppm", when(col("rk") === 1,
          lit(1000000L) - (col("n_touches") - 1) * expr("1000000 DIV n_touches"))
        .otherwise(expr("1000000 DIV n_touches")))
      .select(col("user_id"), col("purchase_id"), col("touch_id"),
        col("touch_type"), col("n_touches"), col("share_ppm"))
      .orderBy(col("purchase_id"), col("touch_id"))
  }

  /** Per-type daily-volume TREND slope — ordinary least squares over
    * (day index, daily count) evaluated entirely in integers: with
    * x = epoch day and y = count, slope = (n·Σxy − Σx·Σy) /
    * (n·Σx² − (Σx)²), emitted ppm-scaled through one DECIMAL floor
    * division — no fp accumulation anywhere, so "is this event type
    * growing?" answers bit-identically on any engine. One
    * (type, day) rollup then a type-sized aggregate; epoch-day x
    * keeps Σx² within DECIMAL(38) for decades of data. */
  def trendSlopes(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        expr("CAST(unix_micros(CAST(CAST(ts AS DATE) AS TIMESTAMP)) DIV 86400000000 AS LONG)").as("x"))
      .agg(count(lit(1)).as("y"))
    daily
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"),
           sum(col("x").cast("decimal(38,0)")).as("sx"),
           sum(col("y").cast("decimal(38,0)")).as("sy"),
           sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
           sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
      .withColumn("slope_ppm", // single-day series: undefined slope -> null
        expr("(CAST(n_days AS DECIMAL(38,0)) * sxy - sx * sy) * 1000000 " +
             "DIV NULLIF(CAST(n_days AS DECIMAL(38,0)) * sxx - sx * sx, 0)"))
      .select(col("event_type"), col("n_days"), col("sy").cast("long").as("n_events"),
        col("slope_ppm"))
      .orderBy(col("event_type"))
  }

  /** Watermark-setting lateness audit — the out-of-order profile you
    * pick `withWatermark` bounds FROM: per event, disorder = how far
    * behind the max event-time of all strictly-earlier arrivals
    * (arrival order = the monotone ingest id) its own timestamp is;
    * the per-type rollup reports late counts beyond the candidate
    * bound and the worst disorder seen. The prefix running max is
    * computed SUB-SHARDED at TWO levels (the q148 pattern, recursed):
    * a per-shard running max in parallel; a per-super-shard exclusive
    * running max over shard maxima (also parallel, partitioned by
    * super-shard); and one exclusive prefix max over the super-shard
    * maxima — the ONLY single-task frame, n/(shardSize·superSize)
    * rows (~2.4e5 at 10^12 events with the defaults), vs n/256 with
    * one level. Same values as one global ordered window; the combine
    * uses COALESCE(·, own ts) so the first event ever scores disorder
    * 0 with no sentinel arithmetic, and `greatest` skips nulls, so
    * first-shard-in-super / first-super rows need no sentinels
    * either. The base↔prevMax join is a plain co-keyed join (NOT a
    * forced broadcast — the shard-maxima frame is n/shardSize rows,
    * which at 10^12 events would be a 4e9-row broadcast); AQE
    * broadcasts it when it is actually small. */
  // `superSize` sits AFTER `lateUs` so a positional caller from the
  // pre-superSize signature (events, shardSize, lateUs) keeps its
  // meaning — inserting it mid-list would silently rebind that third
  // argument to superSize and change the late threshold.
  def latenessAudit(events: DataFrame, shardSize: Long = 256,
                    lateUs: Long = 600000000L, superSize: Long = 4096): DataFrame =
    disorderPerEvent(events, shardSize, superSize)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_events"),
           sum(when(col("disorder_us") > lateUs, 1L).otherwise(0L)).as("n_late"),
           max(col("disorder_us")).cast("long").as("max_disorder_us"))
      .orderBy(col("event_type"))

  /** Per-event disorder — [[latenessAudit]]'s two-level sub-sharded
    * prefix running max exposed as a row-level frame (event_id,
    * event_type, disorder_us), so the audit rollup and the
    * [[watermarkAdvice]] percentile pass share one machinery. */
  def disorderPerEvent(events: DataFrame, shardSize: Long = 256,
                       superSize: Long = 4096): DataFrame = {
    val base = events
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("shard", expr(s"event_id DIV $shardSize"))
      .localCheckpoint(false) // per-shard pass + the shard-maxima frame
    val wIn = Window.partitionBy(col("shard")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardMax = base.groupBy(col("shard")).agg(max(col("us")).as("m"))
      .withColumn("sup", expr(s"shard DIV $superSize"))
      .localCheckpoint(false) // within-super pass + the super-maxima frame
    val wInSup = Window.partitionBy(col("sup")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPrevSup = Window.orderBy(col("sup"))
      .rowsBetween(Window.unboundedPreceding, -1) // super-count-sized frame
    val prevSup = shardMax.groupBy(col("sup")).agg(max(col("m")).as("sm"))
      .withColumn("prev_sup", max(col("sm")).over(wPrevSup))
      .select(col("sup"), col("prev_sup"))
    val prevMax = shardMax
      .withColumn("run_sup", max(col("m")).over(wInSup))
      .join(broadcast(prevSup), "sup") // super-count rows: genuinely tiny
      .withColumn("prev_max", greatest(col("run_sup"), col("prev_sup")))
      .select(col("shard"), col("prev_max"))
    base
      .withColumn("run_in", max(col("us")).over(wIn))
      .join(prevMax, "shard")
      .withColumn("disorder_us",
        greatest(greatest(coalesce(col("run_in"), col("us")),
          coalesce(col("prev_max"), col("us"))) - col("us"), lit(0L)))
      .select(col("event_id"), col("event_type"), col("disorder_us"))
  }

  /** Watermark ADVICE — the number `withWatermark` should actually
    * be set to, derived from data instead of guessed: per event type,
    * the EXACT p50/p95/p99 lower order statistics of the per-event
    * disorder (pN = smallest d with count(disorder ≤ d) ≥ ⌈N·n/100⌉,
    * pure integers — 100·cum ≥ N·n avoids ever materializing the
    * ceiling) plus the max, and the ppm share of events a p99 bound
    * would cover. A watermark at p99_us loses at most 1% of events
    * to lateness; the gap between p99 and max is the tail you either
    * absorb with state retention or consciously drop.
    *
    * Cost shape: the percentile pass runs on per-(type, disorder)
    * VALUE counts — the cumulative window is distinct-value-sized
    * per type (in-order streams collapse to disorder 0), never
    * event-sized; the disorder frame itself reuses the audit's
    * sub-sharded machinery. */
  def watermarkAdvice(events: DataFrame, shardSize: Long = 256,
                      superSize: Long = 4096): DataFrame =
    watermarkAdviceFromDisorder(disorderPerEvent(events, shardSize, superSize))

  /** [[watermarkAdvice]] over a PREBUILT (event_type, disorder_us)
    * frame — e.g. the [[StreamOps.streamingLateness]] sink, so the
    * live tracker and the batch advice share one percentile pass
    * (sink-rollup ≡ batch asserted in StreamingSpec). */
  def watermarkAdviceFromDisorder(d: DataFrame): DataFrame = {
    val vc = d.groupBy(col("event_type"), col("disorder_us"))
      .agg(count(lit(1)).cast("long").as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("disorder_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // totals carry ALIASED columns (fresh attribute ids): both join
    // sides share the vc lineage, and over a streaming-sink relation
    // the analyzer cannot dedup identical references itself
    val tot = vc.groupBy(col("event_type")).agg(sum(col("c")).cast("long").as("n"))
      .select(col("event_type").as("tot_type"), col("n"))
    val cum = vc
      .withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(tot), col("event_type") === col("tot_type"))
      .drop("tot_type")
      .localCheckpoint(false) // percentile agg + the coverage self-join
    def pN(n: Int) = min(when(col("cum") * 100 >= lit(n.toLong) * col("n"),
      col("disorder_us"))).cast("long")
    // the coverage lookup aliases every column — fresh attribute ids,
    // so the self-join resolves even over a streaming-sink lineage
    val cov = cum.select(col("event_type").as("cov_type"),
      col("disorder_us").as("p99d"), col("cum").as("p99cum"), col("n").as("cov_n"))
    cum.groupBy(col("event_type"))
      .agg(min(col("n")).as("n_events"),
           pN(50).as("p50_disorder_us"),
           pN(95).as("p95_disorder_us"),
           pN(99).as("p99_disorder_us"),
           max(col("disorder_us")).cast("long").as("max_disorder_us"))
      .join(broadcast(cov),
        col("event_type") === col("cov_type") &&
          col("p99_disorder_us") === col("p99d"))
      .withColumn("covered_ppm", expr("(p99cum * 1000000) DIV cov_n"))
      .select(col("event_type"), col("n_events"),
        col("p50_disorder_us"), col("p95_disorder_us"), col("p99_disorder_us"),
        col("max_disorder_us"), col("covered_ppm"))
      .orderBy(col("event_type"))
  }

  /** Theil–Sen robust trend — the median of all pairwise daily-count
    * slopes per type, the outlier-immune complement of [[trendSlopes]]
    * (one spike day drags OLS; it is one vote among C(n,2) here).
    * Slopes are ppm integers computed as sign · (|Δy|·10⁶ DIV Δx) —
    * magnitude division on nonnegative integers, THEN the sign, so
    * truncation direction agrees on every engine (floor vs
    * trunc-toward-zero only diverge on negatives); the median is the
    * exact lower order statistic by rank. The pair frame is per-type
    * C(days,2) — days-bounded, never event-bounded — so the self-join
    * and rank sort are dimension-scale work at any corpus size. */
  def theilSenSlopes(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        expr("CAST(unix_micros(CAST(CAST(ts AS DATE) AS TIMESTAMP)) DIV 86400000000 AS LONG)").as("x"))
      .agg(count(lit(1)).as("y"))
      .localCheckpoint(false) // both sides of the pair join
    val pairs = daily.select(col("event_type"), col("x").as("xa"), col("y").as("ya"))
      .join(daily.select(col("event_type"), col("x").as("xb"), col("y").as("yb")),
        "event_type")
      .filter(col("xa") < col("xb"))
      .withColumn("s_ppm", expr(
        "CASE WHEN yb - ya >= 0 THEN ((yb - ya) * 1000000) DIV (xb - xa) " +
          "ELSE -(((ya - yb) * 1000000) DIV (xb - xa)) END"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("s_ppm"))
    val counts = pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_pairs"))
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(counts), "event_type")
      .filter(col("rn") === expr("(n_pairs + 1) DIV 2"))
      .select(col("event_type"), col("n_pairs"), col("s_ppm").as("theilsen_ppm"))
      .orderBy(col("event_type"))
  }

  /** Daily volume spike detector — the ops-monitoring rollup that
    * watches a pipeline's own event stream: per (event_type, day),
    * today's count against the trailing `window`-day sum (current day
    * excluded), flagged when n · trailing_days > factor · Σtrailing
    * (i.e. today exceeds factor × the trailing daily mean) — the
    * comparison is INTEGER cross-multiplication, so no average is
    * ever materialized in floating point and the flag cannot flip at
    * the boundary (the q162 principle applied to time series). Days
    * with no trailing history (cold start) are reported unflagged
    * with trailing_days = 0. One (type, day) rollup — type-
    * cardinality-bounded — then a per-type ROWS frame over the tiny
    * daily table. */
  def dailySpikes(events: DataFrame, window: Int = 7, factor: Int = 2): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(-window, -1)
    daily
      .withColumn("trailing_n", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("trailing_days", count(col("n")).over(w).cast("long"))
      .withColumn("spike",
        col("trailing_days") > 0 &&
          col("n") * col("trailing_days") > col("trailing_n") * factor)
      .select(col("event_type"), col("d"), col("n").cast("long").as("n"),
        col("trailing_n").cast("long").as("trailing_n"), col("trailing_days"),
        col("spike"))
      .orderBy(col("event_type"), col("d"))
  }

  /** First-order next-event transition matrix — the user-journey
    * Markov table ("what follows a view?") behind funnel design and
    * anomaly detection (a transition whose share shifts between
    * releases is a regression signal; pair with the q191 TV gate to
    * alert on it). Each user's event sequence contributes its
    * adjacent pairs via one `lead` over the SAME (user, ts, event_id)
    * sort every event operator here shares — one user-keyed shuffle,
    * never an event×event join; the matrix is |types|² rows, so the
    * totals join is dimension-scale. Probabilities are floor-divided
    * ppm integers — bit-identical on any engine, no fp accumulation. */
  /** USER-LEVEL takedown over the event-derived stores (q284, r16 —
    * VERDICT r15 missing #2): "delete user X" is the GDPR request
    * shape, and the engine persists USER-derived artifacts the
    * doc/vector-keyed takedown family (q268-q283) never reaches. One
    * conservation-checked ledger + post-purge cert across all of
    * them, each corrected by the mechanism its structure allows:
    *   - user-PARTITIONED stores — the q280 conversation manifest,
    *     q161 sessions, q172 attribution rows — purge by anti-join:
    *     per-user independence means dropping a user's rows IS the
    *     rebuild (packing offsets, session ordinals and attribution
    *     never cross users). Totals row + one affected-keys row per
    *     removed user (the q268 listing shape); clean = a semi-probe
    *     proving no removed user survives the purge.
    *   - user-DECOMPOSABLE aggregates — funnel stage counts (q146),
    *     retention cells and cohort sizes (q147), the transition
    *     matrix (q199) — DECREMENT by the removed users' own
    *     contributions, computed from their events alone (reach
    *     flags, activity cells and edges are all within-user, so
    *     kept users' contributions cannot change): the lmModelSubtract
    *     algebra applied to behavioral rollups. clean = no count goes
    *     negative and stages stay monotone.
    * The oracle recomputes EVERY section from raw events and
    * events-minus-users, so a hash match proves both store freshness
    * (the before column) and decrement ≡ rebuild (the after column).
    *
    * Cohort sizes fold out of the stored retention relation itself:
    * a user is always active at their own cohort week, so the
    * offset-0 cell IS the cohort size — no side-channel store needed.
    *
    * Scale: the removal set broadcasts; corrections are
    * removal-bounded (windows over removed users' events only); the
    * stores contribute anti/semi probes plus dimension-sized reads;
    * the only full event passes are the distinct-user anchor and the
    * removed-slice semi-join — the two passes a post-purge cert owes
    * (the q277 posture). Declarative end-to-end: no driver-side
    * action anywhere. */
  def userTakedown(events: DataFrame, removal: DataFrame,
                   manifest: DataFrame, sessions: DataFrame,
                   funnelStore: DataFrame, retentionStore: DataFrame,
                   transitionStore: DataFrame,
                   attributionStore: DataFrame): DataFrame = {
    val rmU = broadcast(removal.select(col("user_id")).distinct()
      .localCheckpoint(false)) // every section probes it
    val rmEvents = events.join(rmU, Seq("user_id"), "left_semi")
      .localCheckpoint(false) // funnel flags + retention cells + edges
    def section(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("artifact"), col("key").cast("string").as("key"),
        col("n_before").cast("long").as("n_before"),
        col("n_after").cast("long").as("n_after"),
        (col("n_before") - col("n_after")).cast("long").as("n_removed"),
        col("clean"))
    // anchor: distinct users before/after (the q268 removal row) —
    // ONE distinct shuffle + a broadcast membership flag instead of
    // two cross-joined countDistinct subtrees (and deliberately NOT
    // two conditional countDistincts in one agg: multiple distinct
    // aggregates plan an Expand that doubles the shuffled rows — the
    // q305 NDV lesson). A removed user always has events, so the
    // flagged distinct-user frame carries both counts exactly.
    val usersRow = events.select(col("user_id")).distinct()
      .join(rmU.withColumn("__rm", lit(1)), Seq("user_id"), "left_outer")
      .select(explode(when(col("__rm") === 1, array(lit("b"), lit("m")))
        .otherwise(array(lit("b")))).as("side"))
      .agg(count(when(col("side") === "b", lit(1))).as("n_before"),
           count(when(col("side") === "m", lit(1))).as("n_rm"))
      .select(lit("all").as("key"), col("n_before"),
        (col("n_before") - col("n_rm")).as("n_after"), lit(true).as("clean"))
    // user-partitioned stores: totals + per-removed-user listing.
    // The totals clean flag is a CONSERVATION recount, not a
    // semi-probe over the purge's own lineage (which is true by
    // construction and certifies nothing — ADVICE r16): the purge
    // delta (anti-join path) must equal an independent semi-join
    // recount of the removed users' rows on the pre-purge store.
    def userKeyed(store: DataFrame): DataFrame = {
      // one tag-union aggregate for the three totals (the q290 r18
      // collapse); the anti/semi split is preserved exactly by
      // tagging each row with the sides it lands on
      val purged = store.join(rmU, Seq("user_id"), "left_anti")
      val semi = store.join(rmU, Seq("user_id"), "left_semi")
      val totals = store.select(lit("b").as("side"))
        .unionByName(purged.select(lit("a").as("side")))
        .unionByName(semi.select(lit("m").as("side")))
        .agg(count(when(col("side") === "b", lit(1))).as("n_before"),
             count(when(col("side") === "a", lit(1))).as("n_after"),
             count(when(col("side") === "m", lit(1))).as("n_rm"))
        .select(lit("rows").as("key"), col("n_before"), col("n_after"),
          (col("n_before") - col("n_after") === col("n_rm")).as("clean"))
      val perUser = semi
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_before"))
        .select(col("user_id").cast("string").as("key"), col("n_before"),
          lit(0L).as("n_after"), lit(true).as("clean"))
      totals.unionByName(perUser)
    }
    // funnel: stage decrements from the removed users' OWN reach flags
    val rmReach = removedReach(rmEvents)
    val funnelRows = funnelStore.select(col("stage"), col("n_users"))
      .crossJoin(broadcast(rmReach))
      .select(col("stage").as("key"), col("n_users").as("n_before"),
        (col("n_users") - when(col("stage") === "view", col("d1"))
          .when(col("stage") === "click", col("d2"))
          .otherwise(col("d3"))).as("n_after"))
      .withColumn("clean", col("n_after") >= 0 && col("n_after") <= col("n_before"))
    // retention: cell + cohort-size decrements from removed activity
    val rmFirst = rmEvents.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
      .localCheckpoint(false) // cells + sizes
    val rmCells = removedRetentionCells(rmEvents, rmFirst)
    val retRows = retentionStore
      .select(col("cohort_week"), col("week_offset"), col("n_active"))
      .join(broadcast(rmCells), Seq("cohort_week", "week_offset"), "left_outer")
      .select(concat(col("cohort_week").cast("string"), lit(":"),
          col("week_offset")).as("key"),
        col("n_active").as("n_before"),
        (col("n_active") - coalesce(col("d"), lit(0L))).as("n_after"))
      .withColumn("clean", col("n_after") >= 0)
    // cohort sizes: the offset-0 cell IS the size (first week ⇒ active)
    val rmSizes = rmFirst.groupBy(col("cohort_week")).agg(count(lit(1)).as("d"))
    val sizeRows = retentionStore.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active"))
      .join(broadcast(rmSizes), Seq("cohort_week"), "left_outer")
      .select(col("cohort_week").cast("string").as("key"),
        col("n_active").as("n_before"),
        (col("n_active") - coalesce(col("d"), lit(0L))).as("n_after"))
      .withColumn("clean", col("n_after") >= 0)
    // transitions: edge decrements (edges are within-user)
    val rmEdges = removedEdges(rmEvents)
    val transRows = transitionStore
      .select(col("event_type"), col("next_type"), col("n_transitions"))
      .join(broadcast(rmEdges), Seq("event_type", "next_type"), "left_outer")
      .select(concat(col("event_type"), lit(":"), col("next_type")).as("key"),
        col("n_transitions").as("n_before"),
        (col("n_transitions") - coalesce(col("d"), lit(0L))).as("n_after"))
      .withColumn("clean", col("n_after") >= 0)
    section("users", usersRow)
      .unionByName(section("manifest", userKeyed(manifest)))
      .unionByName(section("sessions", userKeyed(sessions)))
      .unionByName(section("attribution", userKeyed(attributionStore)))
      .unionByName(section("funnel", funnelRows))
      .unionByName(section("retention", retRows))
      .unionByName(section("retention_size", sizeRows))
      .unionByName(section("transitions", transRows))
      .orderBy(col("artifact"), col("key"))
  }

  /** AGE-BASED RETENTION SWEEP (q286, r16) — the TIME-keyed
    * complement to the id-keyed takedown family: a data-retention
    * policy ("drop everything older than the horizon") expires every
    * event with ts < cutoff and corrects the event-derived stores.
    * Unlike q284's user deletion, age expiry is NOT a per-user drop,
    * so each store corrects by the mechanism its order-sensitivity
    * allows:
    *   - VERBATIM — untouched users (no expired events) pass through
    *     every store unchanged. (In a long-lived system the touched
    *     set is the long-tenured users; new users ride this path.)
    *   - RE-DERIVE, touched-bounded — session ordinals, packing
    *     offsets, funnel reach and cohort assignment all depend on a
    *     user's FIRST events, which expiry removes: the q280
    *     manifest, q161 sessions and q172 attribution rebuild from
    *     the touched users' KEPT events only (the q281 touched-user
    *     machinery on the time axis); funnel stages and retention
    *     cells correct as stored − touched-old-contribution +
    *     touched-new-contribution, both contributions computed from
    *     touched users' events alone. Cohort MIGRATION is handled
    *     honestly: a touched user's cohort moves to their first kept
    *     week, which can create cells the store never had.
    *   - DECREMENT — the transition matrix: expiry removes a strict
    *     per-user (ts, event_id)-prefix, so no NEW adjacency can
    *     appear and the corrected counts are stored − edges WITHIN
    *     the expired slice − the one (last-expired → first-kept)
    *     BOUNDARY edge per user with both; pure removal-bounded
    *     probes, no rebuild.
    * Conservation identities ride as clean flags: every kept event
    * lands in exactly one manifest/session row (token mass ≡ kept
    * count), every kept purchase gets an attribution row, corrected
    * edges total kept_events − users_with_kept, funnel/retention
    * counts stay in [0, before]. The oracle recomputes every section
    * from events-at-or-after-cutoff, so a hash match proves the
    * verbatim/decrement/re-derive classification ≡ a full rebuild.
    *
    * Scale: the expired slice and the touched users' kept events
    * bound all window work; untouched users never rescan; the only
    * full-event passes are one count/distinct anchor aggregate and
    * the slice filters themselves. Declarative end-to-end. */
  def retentionSweep(events: DataFrame, cutoff: String,
                     manifest: DataFrame, sessions: DataFrame,
                     funnelStore: DataFrame, retentionStore: DataFrame,
                     transitionStore: DataFrame,
                     attributionStore: DataFrame): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val expired = events.filter(col("ts") < cut)
      .localCheckpoint(false) // edges + boundary + reach + cells + aggs
    val touched = broadcast(expired.select(col("user_id")).distinct()
      .localCheckpoint(false)) // every store probes it
    val keptTouched = events.filter(col("ts") >= cut)
      .join(touched, Seq("user_id"), "left_semi")
      .localCheckpoint(false) // re-derives + new contributions
    val touchedFull = expired.unionByName(keptTouched)
      .localCheckpoint(false) // old reach + old cells
    val eAgg = events.agg(count(lit(1)).as("ne"),
        countDistinct(col("user_id")).as("nu"))
      .localCheckpoint(false) // anchor + conservation identities
    val xAgg = expired.agg(count(lit(1)).as("nx"),
        countDistinct(col("user_id")).as("nt"),
        coalesce(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)), lit(0L)).as("xp"))
      .localCheckpoint(false)
    val kAgg = keptTouched.agg(countDistinct(col("user_id")).as("ntk"))
      .localCheckpoint(false)
    def section(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("artifact"), col("key").cast("string").as("key"),
        col("n_before").cast("long").as("n_before"),
        col("n_after").cast("long").as("n_after"),
        (col("n_before") - col("n_after")).cast("long").as("n_removed"),
        col("clean"))
    val base = eAgg.crossJoin(xAgg).crossJoin(kAgg).localCheckpoint(false)
    val eventsRow = base.select(lit("all").as("key"),
      col("ne").as("n_before"), (col("ne") - col("nx")).as("n_after"),
      lit(true).as("clean"))
    val usersRows = base.select(explode(array(
        struct(lit("all").as("key"), col("nu").as("n_before"),
          (col("nu") - col("nt") + col("ntk")).as("n_after")),
        struct(lit("touched").as("key"), col("nt").as("n_before"),
          col("ntk").as("n_after")))).as("s"))
      .select(col("s.key").as("key"), col("s.n_before").as("n_before"),
        col("s.n_after").as("n_after"), lit(true).as("clean"))
    // user-partitioned row stores: untouched verbatim + touched
    // re-derived, with the token-mass conservation identity as clean
    // one tag-union aggregate instead of three cross-joined single-row
    // aggregates (the q290 r18 collapse — counts/masses are exact
    // integer sums, so regrouping is value-identical)
    def rowStore(store: DataFrame, rederived: DataFrame,
                 massCol: Option[String]): DataFrame = {
      val untouched = store.join(touched, Seq("user_id"), "left_anti")
      def tag(df: DataFrame, s: String) = df.select(lit(s).as("side"),
        massCol.map(col(_).cast("long")).getOrElse(lit(0L)).as("m"))
      tag(store, "b").unionByName(tag(untouched, "u"))
        .unionByName(tag(rederived, "d"))
        .agg(
          count(when(col("side") === "b", lit(1))).as("n_before"),
          count(when(col("side") === "u", lit(1))).as("n_unt"),
          count(when(col("side") === "d", lit(1))).as("n_red"),
          coalesce(sum(when(col("side") === "u", col("m"))), lit(0L)).as("m_unt"),
          coalesce(sum(when(col("side") === "d", col("m"))), lit(0L)).as("m_red"))
        .crossJoin(base)
        .select(lit("rows").as("key"), col("n_before"),
          (col("n_unt") + col("n_red")).as("n_after"),
          (massCol.map(_ => col("m_unt") + col("m_red") === col("ne") - col("nx"))
            .getOrElse(lit(true))).as("clean"))
    }
    val maniRederived = TemporalOps.sessionPackManifest(keptTouched)
      .localCheckpoint(false) // rows + mass + per-user listing
    val sessRederived = sessionize(keptTouched)
    val attrRederived = lastTouchAttribution(keptTouched)
    val maniRow = rowStore(manifest, maniRederived, Some("n_events"))
    val sessRow = rowStore(sessions, sessRederived, Some("n_events"))
    // attribution clean: corrected rows ≡ kept purchases (untouched
    // users' purchases are all kept; touched re-derive covers theirs)
    val attrRow = attributionStore.select(lit("b").as("side"))
      .unionByName(attributionStore.join(touched, Seq("user_id"), "left_anti")
        .select(lit("u").as("side")))
      .unionByName(attrRederived.select(lit("d").as("side")))
      .agg(count(when(col("side") === "b", lit(1))).as("n_before"),
           count(when(col("side") === "u", lit(1))).as("n_unt"),
           count(when(col("side") === "d", lit(1))).as("n_red"))
      .crossJoin(base)
      .select(lit("rows").as("key"), col("n_before"),
        (col("n_unt") + col("n_red")).as("n_after"),
        (col("n_unt") + col("n_red") === col("n_before") - col("xp"))
          .as("clean"))
    // per-touched-user manifest listing: stored rows vs re-derived
    val maniTouched = manifest.join(touched, Seq("user_id"), "left_semi")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_before"))
      .join(maniRederived.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_after")),
        Seq("user_id"), "left_outer")
      .na.fill(0L, Seq("n_after"))
      .select(col("user_id").cast("string").as("key"), col("n_before"),
        col("n_after"), lit(true).as("clean"))
    // funnel: stored − touched-old-reach + touched-new-reach
    val oldReach = removedReach(touchedFull)
      .select(col("d1").as("o1"), col("d2").as("o2"), col("d3").as("o3"))
    val newReach = removedReach(keptTouched)
    val funnelRows = funnelStore.select(col("stage"), col("n_users"))
      .crossJoin(broadcast(oldReach)).crossJoin(broadcast(newReach))
      .select(col("stage").as("key"), col("n_users").as("n_before"),
        (col("n_users") - when(col("stage") === "view", col("o1") - col("d1"))
          .when(col("stage") === "click", col("o2") - col("d2"))
          .otherwise(col("o3") - col("d3"))).as("n_after"))
      .withColumn("clean", col("n_after") >= 0 && col("n_after") <= col("n_before"))
    // retention cells: stored − old contributions + new contributions;
    // a migrated cohort can CREATE cells (full outer on the key)
    val oldFirst = touchedFull.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
      .localCheckpoint(false)
    val newFirst = keptTouched.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
      .localCheckpoint(false)
    val cellDelta = removedRetentionCells(touchedFull, oldFirst)
      .join(removedRetentionCells(keptTouched, newFirst)
          .withColumnRenamed("d", "a"),
        Seq("cohort_week", "week_offset"), "full_outer")
      .na.fill(0L, Seq("d", "a"))
    val retRows = retentionStore
      .select(col("cohort_week"), col("week_offset"), col("n_active"))
      .join(broadcast(cellDelta), Seq("cohort_week", "week_offset"),
        "full_outer")
      .na.fill(0L, Seq("n_active", "d", "a"))
      .select(concat(col("cohort_week").cast("string"), lit(":"),
          col("week_offset")).as("key"),
        col("n_active").as("n_before"),
        (col("n_active") - col("d") + col("a")).as("n_after"))
      .filter(col("n_before") > 0 || col("n_after") > 0)
      .withColumn("clean", col("n_after") >= 0)
    val sizeDelta = oldFirst.groupBy(col("cohort_week")).agg(count(lit(1)).as("d"))
      .join(newFirst.groupBy(col("cohort_week")).agg(count(lit(1)).as("a")),
        Seq("cohort_week"), "full_outer")
      .na.fill(0L, Seq("d", "a"))
    val sizeRows = retentionStore.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active"))
      .join(broadcast(sizeDelta), Seq("cohort_week"), "full_outer")
      .na.fill(0L, Seq("n_active", "d", "a"))
      .select(col("cohort_week").cast("string").as("key"),
        col("n_active").as("n_before"),
        (col("n_active") - col("d") + col("a")).as("n_after"))
      .filter(col("n_before") > 0 || col("n_after") > 0)
      .withColumn("clean", col("n_after") >= 0)
    // transitions: pure decrement — expiry is a strict per-user
    // prefix, so corrected = stored − within-expired − boundary edges
    val within = removedEdges(expired)
    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val wAsc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val boundary = expired
      .withColumn("rn", row_number().over(wDesc)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"))
      .join(keptTouched
          .withColumn("rn", row_number().over(wAsc)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("next_type")),
        "user_id")
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("b"))
    val transCorrected = transitionStore
      .select(col("event_type"), col("next_type"), col("n_transitions"))
      .join(broadcast(within), Seq("event_type", "next_type"), "left_outer")
      .join(broadcast(boundary), Seq("event_type", "next_type"), "left_outer")
      .na.fill(0L, Seq("d", "b"))
      .select(col("event_type"), col("next_type"),
        col("n_transitions").as("n_before"),
        (col("n_transitions") - col("d") - col("b")).as("n_after"))
      .localCheckpoint(false) // per-edge rows + the conservation total
    val transRows = transCorrected
      .select(concat(col("event_type"), lit(":"), col("next_type")).as("key"),
        col("n_before"), col("n_after"))
      .withColumn("clean", col("n_after") >= 0)
    // Σ corrected edges ≡ kept_events − users_with_kept
    val transTotal = transCorrected
      .agg(coalesce(sum(col("n_before")), lit(0L)).as("n_before"),
           coalesce(sum(col("n_after")), lit(0L)).as("n_after"))
      .crossJoin(base)
      .select(lit("all").as("key"), col("n_before"), col("n_after"),
        (col("n_after") ===
          (col("ne") - col("nx")) - (col("nu") - col("nt") + col("ntk")))
          .as("clean"))
    section("events", eventsRow)
      .unionByName(section("users", usersRows))
      .unionByName(section("manifest", maniRow))
      .unionByName(section("manifest_touched", maniTouched))
      .unionByName(section("sessions", sessRow))
      .unionByName(section("attribution", attrRow))
      .unionByName(section("funnel", funnelRows))
      .unionByName(section("retention", retRows))
      .unionByName(section("retention_size", sizeRows))
      .unionByName(section("transitions", transRows))
      .unionByName(section("transitions_total", transTotal))
      .orderBy(col("artifact"), col("key"))
  }

  /** USER-LEVEL QUARANTINE ROUND-TRIP (q290, r17 — VERDICT r16
    * missing #3): [[graft.engine.CorpusOps.quarantineRoundTrip]]'s
    * soft-delete/restore certification for the q284 event-store
    * family — a legal hold that retains ONLY the user's raw events
    * while every derived store hard-purges, then proves the restore
    * loses nothing.
    *
    * Quarantine: the removed users' events are the single retained
    * artifact. Purge = exactly the q284 corrections: user-partitioned
    * stores (the q280 conversation manifest, q161 sessions, q172
    * attribution) anti-join — per-user independence makes the purge
    * THE rebuild; user-decomposable aggregates (funnel stages,
    * retention cells, the transition matrix) DECREMENT by the
    * quarantined users' own contributions ([[removedReach]] /
    * [[removedRetentionCells]] / [[removedEdges]]), zero cells
    * dropping as a rebuild would. Restore = the same algebra run
    * backwards, from the quarantined events alone: the partitioned
    * stores re-derive their users' rows through the engine's own
    * builders (per-user windows mean the re-derived rows land
    * byte-identical — conversation boundaries, packing offsets and
    * session ordinals included) and union back; the aggregates
    * RE-INCREMENT by the identical d-frames, resurrecting dropped
    * cells via a full-outer fold.
    *
    * One ledger row per store: (artifact, key, n_before, n_purged,
    * n_restored, clean) — counts are row counts for partitioned
    * stores and value masses (Σ n_users / Σ n_active /
    * Σ n_transitions) for the decrement stores, and clean is the
    * q287 identity proof: the restored store is ROW-IDENTICAL to the
    * original (equal counts AND equal order-insensitive Σ xxhash64
    * multiset commitments — two map-only scans, never a store×store
    * compare). The decrement stores certify on their carried
    * (key, count) projection — the exact relation the q284 streaming
    * twins persist.
    *
    * Scale: the removal set broadcasts; purges are anti-joins;
    * re-derivations and d-frames are quarantine-bounded window work;
    * the identity probes are commitment aggregates. Declarative
    * end-to-end. */
  def userQuarantineRoundTrip(events: DataFrame, removal: DataFrame,
                              manifest: DataFrame, sessions: DataFrame,
                              funnelStore: DataFrame,
                              retentionStore: DataFrame,
                              transitionStore: DataFrame,
                              attributionStore: DataFrame): DataFrame = {
    val rmU = broadcast(removal.select(col("user_id")).distinct()
      .localCheckpoint(false)) // every purge + the quarantine slice
    // the QUARANTINE: only these raw events are retained
    val qEvents = events.join(rmU, Seq("user_id"), "left_semi")
      .localCheckpoint(false) // re-derivations + all three d-frames
    // ONE tag-union aggregate per artifact (r18 optimization, guide
    // §2.3/§2.4): the previous shape cross-joined FIVE single-row
    // aggregates (two commitments + three masses), so every input's
    // lineage — including the expensive per-user window re-derivations
    // on the restore side — planned and ran multiple times (Spark has
    // no cross-subtree CSE beyond exchange reuse; Profile r18 measured
    // 110 jobs / 34-42 s summed task time for q290). Each distinct
    // input now enters ONCE, tagged with the ledger side(s) it belongs
    // to ('b'efore / 'p'urged / 'r'estored — a purged frame that is
    // also the restore's base explodes into both tags), and one global
    // aggregate computes every count, mass and commitment hash with
    // conditional sums. Values are bit-identical: the commitment is a
    // commutative decimal SUM of row hashes and the masses are exact
    // integer sums, so regrouping cannot change them.
    def row(artifact: String, mass: Option[String],
            parts: Seq[(DataFrame, Seq[String])]): DataFrame = {
      val tagged = parts.map { case (df, sides) =>
        df.select(
          xxhash64(df.columns.map(col(_)): _*).cast("decimal(38,0)").as("h"),
          (mass match {
            case Some(c) => col(c).cast("long")
            case None => lit(1L)
          }).as("m"),
          explode(array(sides.map(lit(_)): _*)).as("side"))
      }.reduce(_ unionByName _)
      def onSide(s: String, c: Column) = when(col("side") === s, c)
      tagged.agg(
          coalesce(sum(onSide("b", col("m"))), lit(0L)).cast("long").as("n_before"),
          coalesce(sum(onSide("p", col("m"))), lit(0L)).cast("long").as("n_purged"),
          coalesce(sum(onSide("r", col("m"))), lit(0L)).cast("long").as("n_restored"),
          count(onSide("b", lit(1))).cast("long").as("n_rows_b"),
          count(onSide("r", lit(1))).cast("long").as("n_rows_r"),
          coalesce(sum(onSide("b", col("h"))),
            lit(0).cast("decimal(38,0)")).as("h_before"),
          coalesce(sum(onSide("r", col("h"))),
            lit(0).cast("decimal(38,0)")).as("h_restored"))
        .select(lit(artifact).as("artifact"), lit("all").as("key"),
          col("n_before"), col("n_purged"), col("n_restored"),
          (col("h_restored") === col("h_before") &&
            col("n_rows_r") === col("n_rows_b")).as("clean"))
    }
    // user-partitioned stores: purge anti-joins; restore re-derives
    // the quarantined users' rows through the engine's own builder
    // and unions back (per-user windows ⇒ byte-identical rows). The
    // purged frame carries both the 'p' tag and (as the restore's
    // verbatim half) the 'r' tag.
    def partitioned(name: String, store: DataFrame,
                    rederived: DataFrame): DataFrame = {
      val cols = store.columns.map(col(_))
      val purged = store.join(rmU, Seq("user_id"), "left_anti")
        .select(cols: _*)
      row(name, None, Seq(
        (store, Seq("b")),
        (purged, Seq("p", "r")),
        (rederived.select(cols: _*), Seq("r"))))
    }
    // users anchor: the distinct-user relation itself round-trips
    val usersAll = events.select(col("user_id")).distinct()
      .localCheckpoint(false) // commitment + purge + restore
    val usersKept = usersAll.join(rmU, Seq("user_id"), "left_anti")
    val usersRow = row("users", None, Seq(
      (usersAll, Seq("b")),
      (usersKept, Seq("p", "r")),
      (qEvents.select(col("user_id")).distinct(), Seq("r"))))
    // funnel: decrement by the quarantined users' reach, re-increment
    // by the SAME frame — merge ≡ the q284 decrement run backwards
    val reach = broadcast(removedReach(qEvents)
      .localCheckpoint(false)) // purge + restore
    val fp = funnelStore.select(col("stage"),
      col("n_users").cast("long").as("n_users"))
    def funnelShift(df: DataFrame, sign: Int) = df.crossJoin(reach)
      .select(col("stage"),
        (col("n_users") + lit(sign.toLong) *
          when(col("stage") === "view", col("d1"))
            .when(col("stage") === "click", col("d2"))
            .otherwise(col("d3"))).cast("long").as("n_users"))
    // funPurged's lineage is one broadcast crossJoin over the store —
    // cheap to re-derive for the restore side, no checkpoint needed
    val funPurged = funnelShift(fp, -1)
    val funnelRow = row("funnel", Some("n_users"), Seq(
      (fp, Seq("b")),
      (funPurged, Seq("p")),
      (funnelShift(funPurged, 1), Seq("r"))))
    // retention: cells decrement (zero cells DROP, the rebuild
    // semantic); restore folds the same d-frame back full-outer so
    // dropped cells resurrect
    val rmFirst = qEvents.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    val dCells = broadcast(removedRetentionCells(qEvents, rmFirst)
      .localCheckpoint(false)) // purge + restore
    val rp = retentionStore.select(col("cohort_week"), col("week_offset"),
      col("n_active").cast("long").as("n_active"))
    val retPurged = rp.join(dCells, Seq("cohort_week", "week_offset"),
        "left_outer")
      .select(col("cohort_week"), col("week_offset"),
        (col("n_active") - coalesce(col("d"), lit(0L))).cast("long")
          .as("n_active"))
      .filter(col("n_active") > 0)
    val retRestored = retPurged
      .join(dCells, Seq("cohort_week", "week_offset"), "full_outer")
      .select(col("cohort_week"), col("week_offset"),
        (coalesce(col("n_active"), lit(0L)) + coalesce(col("d"), lit(0L)))
          .cast("long").as("n_active"))
    val retRow = row("retention", Some("n_active"), Seq(
      (rp, Seq("b")),
      (retPurged, Seq("p")),
      (retRestored, Seq("r"))))
    // transitions: the same decrement/fold-back pattern on edges
    val dEdges = broadcast(removedEdges(qEvents)
      .localCheckpoint(false)) // purge + restore
    val tp = transitionStore.select(col("event_type"), col("next_type"),
      col("n_transitions").cast("long").as("n_transitions"))
    val transPurged = tp.join(dEdges, Seq("event_type", "next_type"),
        "left_outer")
      .select(col("event_type"), col("next_type"),
        (col("n_transitions") - coalesce(col("d"), lit(0L))).cast("long")
          .as("n_transitions"))
      .filter(col("n_transitions") > 0)
    val transRestored = transPurged
      .join(dEdges, Seq("event_type", "next_type"), "full_outer")
      .select(col("event_type"), col("next_type"),
        (coalesce(col("n_transitions"), lit(0L)) + coalesce(col("d"), lit(0L)))
          .cast("long").as("n_transitions"))
    val transRow = row("transitions", Some("n_transitions"), Seq(
      (tp, Seq("b")),
      (transPurged, Seq("p")),
      (transRestored, Seq("r"))))
    usersRow
      .unionByName(partitioned("manifest", manifest,
        TemporalOps.sessionPackManifest(qEvents)))
      .unionByName(partitioned("sessions", sessions, sessionize(qEvents)))
      .unionByName(partitioned("attribution", attributionStore,
        lastTouchAttribution(qEvents)))
      .unionByName(funnelRow)
      .unionByName(retRow)
      .unionByName(transRow)
      .orderBy(col("artifact"), col("key"))
  }

  /** The removed users' own funnel-reach counts (one row: d1/d2/d3) —
    * reach flags are within-user, so kept users' flags cannot change
    * and the stored stage counts decrement by exactly these. Shared
    * by [[userTakedown]] and the streaming twin. */
  private[engine] def removedReach(rmEvents: DataFrame): DataFrame = {
    val wU = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rmEvents
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("s1", max(when(col("event_type") === "view", 1).otherwise(0)).over(wU))
      .withColumn("s2", max(when(col("event_type") === "click" && col("s1") === 1, 1)
        .otherwise(0)).over(wU))
      .withColumn("s3", max(when(col("event_type") === "purchase" && col("s2") === 1, 1)
        .otherwise(0)).over(wU))
      .groupBy(col("user_id"))
      .agg(max(col("s1")).as("r1"), max(col("s2")).as("r2"), max(col("s3")).as("r3"))
      .agg(coalesce(sum(col("r1")), lit(0L)).as("d1"),
           coalesce(sum(col("r2")), lit(0L)).as("d2"),
           coalesce(sum(col("r3")), lit(0L)).as("d3"))
  }

  /** The removed users' (cohort_week, week_offset) activity-cell
    * counts — a user's cohort derives from their OWN min(ts), so the
    * removal slice alone determines every decrement. */
  private[engine] def removedRetentionCells(rmEvents: DataFrame,
                                            rmFirst: DataFrame): DataFrame =
    rmEvents
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
      .join(rmFirst, "user_id")
      .select(col("cohort_week"),
        expr("CAST(datediff(wk, cohort_week) DIV 7 AS BIGINT)").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("d"))

  /** The removed users' transition-edge counts — adjacent pairs never
    * cross users, so the matrix decrements by exactly these. */
  private[engine] def removedEdges(rmEvents: DataFrame): DataFrame = {
    val wL = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    rmEvents
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(wL))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("d"))
  }

  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).cast("long").as("n_transitions"))
    val totals = pairs.groupBy(col("event_type"))
      .agg(sum(col("n_transitions")).cast("long").as("n_from"))
    pairs.join(broadcast(totals), "event_type")
      .withColumn("p_ppm", expr("(n_transitions * 1000000) DIV n_from"))
      .select(col("event_type"), col("next_type"), col("n_transitions"),
        col("n_from"), col("p_ppm"))
      .orderBy(col("event_type"), col("next_type"))
  }
}
