package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Exact._

/** Scalar-function surface (SURVEY §2.7: F1-F7) exercised as queries. */
object ScalarOps {

  /** Date-part extraction + formatting roundtrip (F1/F2 — reference:
    * app/spark_cassandra_groupby_month.py:25, app/ml_app.py:561-576).
    * year/month as BIGINT; the min formatted date proves the
    * format/parse path (to_date of the formatted string). */
  def dateParts(orders: DataFrame): DataFrame =
    orders
      .withColumn("o_year", asLong(year(col("o_orderdate"))))
      .withColumn("o_month", asLong(month(col("o_orderdate"))))
      .groupBy(col("o_year"), col("o_month"))
      .agg(count(lit(1)).as("n_orders"),
           min(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("first_day"),
           min(to_date(date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd"))
             .as("first_date"))
      .orderBy(col("o_year"), col("o_month"))

  /** Null-on-failure casts (F3 — reference: app/ml_app.py:479-485,
    * `float(x)` with ValueError -> None). Non-ANSI cast semantics:
    * '1-URGENT' prefix digit parses, a status letter does not. */
  def tryCasts(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      substring(col("o_orderpriority"), 1, 1).cast("long").as("prio_num"),
      col("o_orderstatus").cast("double").as("status_num"))
      .orderBy(col("o_orderkey"))

  /** JSON extraction over `events.props` (north-star extension; the
    * reference's JSON handling is driver-side dict access,
    * app/ml_app.py:449-452). Both paths shown: path-expression
    * `get_json_object` and schema-projected `from_json` — the latter
    * is the 100 TB choice (single parse, pruned struct). */
  def jsonExtract(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k_get"),
      // parse k as STRING then cast — mirrors the oracle's
      // json_extract_string + TRY_CAST, so a quoted numeric like
      // {"k":"12"} yields 12 on both sides (a LongType schema would
      // parse it to NULL in Spark but 12 in the oracle)
      from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType))))
        .getField("k").cast("long").as("k_struct"))
      .orderBy(col("event_id"))

  /** Display number formatting (F8 — reference:
    * templates/dashboard.html:80-92 `formatNumberWithSuffix`:
    * toFixed(2) + " Trillion|Billion|Million|Thousand"). Re-expressed
    * engine-side so the serving layer never re-formats in JS. One
    * deliberate divergence: the reference's else-branch returns raw
    * `num.toString`; we pin two decimals there too so the output is
    * byte-stable across engines (double-to-string formatting is not).
    *
    * The two-decimal value is computed in pure BIGINT from exact
    * cents: d2 = round_half_up(cents / divD) = (2·cents + divD) div
    * (2·divD) hundredths-of-display-units, then rendered as
    * `d2 div 100 "." lpad(d2 % 100)` — no ROUND over DOUBLE anywhere
    * (that path is rounding-path-dependent across engines; integer
    * arithmetic is not). The branch predicates compare the raw
    * double aggregates, identical on both sides. The avg divisor
    * folds the count in: round(avg_cents/divD) =
    * (2·cents + n·divD) div (2·n·divD). */
  def displayFormat(orders: DataFrame): DataFrame = {
    def d2Total(divD: Long) = s"(2*ct + $divD) div ${2 * divD}"
    def d2Avg(divD: Long) = s"(2*ct + n*$divD) div (2*n*$divD)"
    def render(d2: String, suffix: String) =
      s"concat(CAST(($d2) div 100 AS STRING), '.', " +
        s"lpad(CAST(($d2) % 100 AS STRING), 2, '0')$suffix)"
    def fmt(c: String, d2: Long => String) =
      s"""CASE WHEN $c >= 1.0e12 THEN ${render(d2(1000000000000L), ", ' Trillion'")}
         |     WHEN $c >= 1.0e9  THEN ${render(d2(1000000000L), ", ' Billion'")}
         |     WHEN $c >= 1.0e6  THEN ${render(d2(1000000L), ", ' Million'")}
         |     WHEN $c >= 1.0e3  THEN ${render(d2(1000L), ", ' Thousand'")}
         |     ELSE ${render(d2(1L), "")} END""".stripMargin
    orders
      .groupBy(col("o_orderpriority"))
      .agg(decSum(col("o_totalprice")).as("total_price"),
           decAvg(col("o_totalprice")).as("avg_price"),
           count(lit(1)).cast("long").as("n"))
      .withColumn("ct", round(col("total_price") * 100).cast("long"))
      .select(col("o_orderpriority"), col("total_price"),
              expr(fmt("total_price", d2Total)).as("display_total"),
              expr(fmt("avg_price", d2Avg)).as("display_avg"))
      .orderBy(col("o_orderpriority"))
  }

  /** Observed metrics — audit counts collected DURING a query via
    * `Dataset.observe`, not with a second scan: the reference's
    * download-history bookkeeping (number_of_rows,
    * app/ml_app.py:542-551) costs it an extra count() job per ingest;
    * `observe` attaches accumulator-backed aggregates to the running
    * plan, so the audit row is free. The observed values equal what a
    * direct aggregate computes — which is exactly what the oracle
    * checks. */
  def observedStats(spark: SparkSession, sfDir: String): DataFrame = {
    // Spark 4.1 landmine: SparkSession.observationManager is a
    // NON-transient lazy val, so the first observe() on a session
    // initializes it and every later closure that transitively
    // captures that session (ML training summaries hold one) dies
    // with NotSerializableException. Observe on an ISOLATED child
    // session — same SparkContext, separate session instance — so the
    // primary session's field stays uninitialized.
    val s2 = spark.newSession()
    import s2.implicits._
    val obs = new org.apache.spark.sql.Observation()
    val observed = Tables.orders(s2, sfDir).observe(obs,
      count(lit(1)).as("n_rows"),
      decSum(col("o_totalprice")).as("total_price"))
    observed.write.format("noop").mode("overwrite").save() // one pass, no result copy
    val row = obs.get
    Seq((row("n_rows").asInstanceOf[Long], row("total_price").asInstanceOf[Double]))
      .toDF("n_rows", "total_price")
  }

  /** Distributed unique row ids: `monotonically_increasing_id` assigns
    * collision-free 64-bit ids with NO shuffle and no coordination
    * (partition index in the high bits, per-partition counter low) —
    * the id-assignment primitive for corpus building. Ids depend on
    * partitioning, so the query emits the INVARIANTS (total rows,
    * distinct ids, min id) — uniqueness at any parallelism is the
    * point, and the oracle states it as count(*) = count(distinct). */
  def distributedIds(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderkey"), monotonically_increasing_id().as("row_id"))
      .agg(count(lit(1)).as("n_rows"),
           countDistinct(col("row_id")).as("n_distinct_ids"),
           min(col("row_id")).as("min_id"))

  /** Per-group quantiles through the GK sketch (grouped form of q19):
    * `percentile_approx` with accuracy high enough that the rank
    * window inside every group collapses below one rank — each
    * group's answer is its exact order statistic at ⌈p·n_g⌉, which is
    * the oracle's grouped quantile_disc (relative error 1/accuracy =
    * 1e-5 < 1/(2·n_g) for groups under 50k rows — conformance
    * setting; production uses the default accuracy). */
  def groupedQuantiles(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile_approx(o_totalprice, 0.5, 100000)").as("p50"),
        expr("percentile_approx(o_totalprice, 0.9, 100000)").as("p90"))
      .orderBy(col("o_orderpriority"))

  /** JSON serialize→parse round trip: struct → `to_json` →
    * `from_json(schema)` → fields. [[jsonExtract]] proves the parse
    * direction over stored JSON; this proves the EMIT direction (the
    * engine handing JSON to a downstream queue/API) is lossless —
    * the oracle compares the round-tripped fields against the source
    * columns directly, so any formatting drift (doubles most of all)
    * would hash-mismatch. Per-row codegen'd Jackson work, no
    * shuffle. */
  def jsonRoundTrip(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("p", StringType), StructField("t", DoubleType)))
    orders
      .select(col("o_orderkey"),
        to_json(struct(col("o_orderpriority").as("p"),
                       col("o_totalprice").as("t"))).as("js"))
      .select(col("o_orderkey"), from_json(col("js"), schema).as("o"))
      .select(col("o_orderkey"),
        col("o.p").as("o_orderpriority"), col("o.t").as("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Ingest-audit row (F6/F7 — reference: download_history insert,
    * app/ml_app.py:542-551): uuid + timestamps + row count. uuid() and
    * current_timestamp() are nondeterministic by design — no oracle;
    * the driver records a rows-only check. */
  def auditRow(spark: SparkSession, ingested: DataFrame): DataFrame = {
    val n = ingested.count()
    spark.range(1).select(
      expr("uuid()").as("download_id"),
      current_timestamp().as("start_time"),
      current_timestamp().as("end_time"),
      lit(n).as("number_of_rows"))
  }
}
