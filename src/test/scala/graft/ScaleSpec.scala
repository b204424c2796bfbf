package graft

import org.apache.spark.sql.functions._

import graft.engine.{PartitionedTables, Tables}
import graft.engine.Exact._

/** Scale-path evidence tests: the partitioned storage layer and the
  * runtime pruning it unlocks (SURVEY §2.1 S1 100 TB column; VERDICT
  * r3 missing item 4). */
class ScaleSpec extends SparkSpec {

  test("partitioned layout round-trips orders exactly") {
    val part = PartitionedTables.ordersByMonth(spark, sf)
    val raw = Tables.orders(spark, sf)
    assert(part.count() == raw.count())
    // partition column equals the derived month for every row
    assert(part.filter(col("o_month") =!= month(col("o_orderdate"))).count() == 0)
  }

  test("partitioned layout resolves through the session catalog via spark.read.table") {
    val name = PartitionedTables.registerCatalog(spark, sf)
    val viaTable = spark.read.table(name)
    assert(viaTable.count() == Tables.orders(spark, sf).count())
    // the partition column survives catalog resolution and still
    // prunes statically: a single-month read scans one partition
    val one = viaTable.filter(col("o_month") === 3)
    val planned = one.queryExecution.executedPlan.toString
    assert(planned.contains("PartitionFilters") && planned.contains("o_month"),
      s"expected a partition filter on o_month in:\n$planned")
    assert(one.count() ==
      Tables.orders(spark, sf).filter(month(col("o_orderdate")) === 3).count())
  }

  test("bucketed orders-customer join plans with no join-side shuffle, matches raw join") {
    val (ot, ct) = PartitionedTables.ensureBucketed(spark, sf)
    val o = spark.read.table(ot)
    val c = spark.read.table(ct)
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides are pre-distributed by the bucketing — a hash exchange
    // under the join would mean the layout was ignored
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")
    val ro = Tables.orders(spark, sf)
    val rc = Tables.customer(spark, sf)
    assert(joined.count() == ro.join(rc, ro("o_custkey") === rc("c_custkey")).count())
    // and the full rollup matches the plain-table computation
    val got = PartitionedTables.bucketedJoinRollup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = ro
      .join(rc, ro("o_custkey") === rc("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(decSum(col("o_totalprice")).as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == direct)
  }

  test("quarter rollup over partitioned fact: DPP in the plan, result matches raw table") {
    val df = PartitionedTables.quarterRollup(spark, sf, quarter = 1)
    val got = df.collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = Tables.orders(spark, sf)
      .filter(month(col("o_orderdate")).isin(1, 2, 3))
      .groupBy(month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(decSum(col("o_totalprice")).as("total_price"), count(lit(1)).as("n_orders"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == direct, s"partitioned result diverges: $got vs $direct")
    // The month predicate never appears in the query over the fact —
    // it must reach the partitioned scan as a DynamicPruningExpression
    // built from the filtered dim at runtime.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning in the physical plan:\n$plan")
  }
}
