package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Exact._

/** Window (analytic) functions — SURVEY §2.8. Absent in the reference;
  * included as the idiomatic Spark generalization of its
  * top-k-within-grouping pattern. All window orderings carry a unique
  * tiebreaker so results are total-ordered and oracle-comparable.
  *
  * Scale note: a window over `partitionBy(k)` is one shuffle on k, the
  * same exchange an aggregation would pay; an ORDER BY window without
  * PARTITION BY serializes onto one reducer, so it is only ever applied
  * to bounded post-aggregate series (e.g. a per-month rollup whose
  * cardinality is fixed by the calendar, not the data volume).
  */
object WindowOps {

  /** row_number + rank per group, keeping top-n — the distributed form
    * of "top recipients per agency". */
  def topPerGroup(customer: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", asLong(row_number().over(w)))
      .withColumn("rnk", asLong(rank().over(w)))
      .filter(col("rn") <= n)
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** Running total per customer over order time. The running sum
    * accumulates in DECIMAL so each prefix is exact (fp running sums
    * are order-defined but still drift across engines at the ulp). */
  def runningTotal(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running_total",
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w).cast("double"))
      .withColumn("order_seq", asLong(row_number().over(
        Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey")))))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  /** lag/lead analytics: month-over-month delta of an aggregate —
    * the reference's by-month dashboard series (app/ml_app.py:131-138)
    * upgraded with a derivative. */
  def monthDelta(orders: DataFrame): DataFrame = {
    val monthly = orders
      .withColumn("o_month", asLong(month(col("o_orderdate"))))
      .withColumn("o_year", asLong(year(col("o_orderdate"))))
      .groupBy(col("o_year"), col("o_month"))
      .agg(decSum(col("o_totalprice")).as("total_price"))
    val w = Window.orderBy(col("o_year"), col("o_month"))
    monthly
      .withColumn("prev_total", lag(col("total_price"), 1).over(w))
      .withColumn("delta", col("total_price") - col("prev_total"))
      .orderBy(col("o_year"), col("o_month"))
  }

  /** Distribution-position windows — percent_rank and cume_dist per
    * group (where does this order sit inside its priority class?),
    * completing the ranking family beside rank/row_number/ntile. One
    * exchange on the partition key; the unique tiebreaker keeps the
    * positions total-ordered and oracle-comparable. */
  def distributionPosition(orders: DataFrame, perGroup: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= perGroup)
      .select(col("o_orderpriority"), col("o_orderkey"), col("pr"), col("cd"), col("rn"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Trailing time-RANGE aggregate — the frame kind the ROWS-based
    * family (q29 running totals) cannot express: for every event,
    * the count and exact-decimal sum of the same user's events in
    * the trailing `windowMinutes` of EVENT TIME, however many rows
    * that is. `rangeBetween` over epoch microseconds gives the
    * physical-value frame ((t − 60min, t], inclusive of same-instant
    * peers — RANGE frames include ties, which is the correct
    * semantics for simultaneous events and is what the oracle
    * replays). One shuffle on user_id, then a per-partition ordered
    * scan with a sliding frame — linear work per partition, no
    * events×events self-join, no per-row re-aggregation. */
  def trailingTimeAgg(events: DataFrame, windowMinutes: Int = 60): DataFrame = {
    val windowUs = windowMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-(windowUs - 1), 0)
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("n_trailing", count(lit(1)).over(w).cast("long"))
      .withColumn("sum_trailing",
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("n_trailing"), col("sum_trailing"))
      .orderBy(col("event_id"))
  }
}
