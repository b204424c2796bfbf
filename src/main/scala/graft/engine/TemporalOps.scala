package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the DataFrame API lacks as primitives,
  * re-expressed the scalable Spark way (north-star custom-operator
  * example: as-of join).
  *
  * The as-of join ("for each left row, the most recent right row at or
  * before its time") is implemented by composition, not by a custom
  * physical operator: tag and UNION the two inputs into one keyed
  * stream, sort within each key partition by time, and carry the right
  * side's attributes forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding window. That is ONE shuffle on the key and a
  * per-partition sort — no range cross-product, no per-key driver
  * loop — exactly the plan a purpose-built as-of operator would want
  * at 100 TB. Skew behaves like any keyed window (salt hot keys).
  */
object TemporalOps {

  /** As-of enrich events with the issuing user's most recent order at
    * or before the event time. Right rows are first deduplicated to
    * one per (customer, date) — max order key wins, its price via
    * max_by — which both pins the tie-break deterministically and
    * matches the oracle's ASOF semantics (one candidate per time
    * point). Events with no prior order keep nulls (left semantics). */
  def asofLatestOrder(events: DataFrame, orders: DataFrame): DataFrame = {
    val od = orders
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
           expr("max_by(o_totalprice, o_orderkey)").as("o_totalprice"))
    val right = od.select(
      col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("t"),
      lit(0).as("is_event"),
      lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
      col("o_orderkey"), col("o_totalprice"))
    val left = events.select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("is_event"),
      col("event_id"), col("value"),
      lit(null).cast("long").as("o_orderkey"), lit(null).cast("double").as("o_totalprice"))
    // order rows sort before events at the same instant (is_event 0<1),
    // so an order dated exactly at the event time is visible to it
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_event"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    right.unionByName(left)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_totalprice", last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("value"),
              col("asof_orderkey"), col("asof_totalprice"))
      .orderBy(col("event_id"))
  }
}
