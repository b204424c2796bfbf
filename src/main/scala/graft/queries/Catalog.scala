package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine._
import graft.engine.Exact._

/** One named query per implemented operator (SURVEY.md §2 checklist +
  * north-star extensions). Each spec pairs the Spark-first
  * implementation with equivalent ANSI SQL for the DuckDB oracle;
  * `oracle = None` marks operators that are not SQL-expressible
  * (sketches, seeded sampling, ML) — those get rows-only checks plus
  * ScalaTest coverage.
  *
  * Determinism contract (SURVEY §5.2): every query ends in an ORDER BY
  * over a unique key; fp-order-sensitive aggregates go through
  * [[graft.engine.Exact]]; derived integers are BIGINT on both sides.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {

  private def t(name: String)(implicit s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, name)

  def specs: Seq[QuerySpec] = relational

  // ---------------------------------------------------------------- //
  // §2.1-2.7 reference-parity relational operators
  // ---------------------------------------------------------------- //
  private def relational: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q01_flagship_geo_rollup",
      (s, dir) => RelationalOps.geoRollup(
        Tables.lineitem(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir)),
      Some(s"""SELECT s_name, n_name, ${decSumSql("l_extendedprice")} AS total_amount,
              |       COUNT(*) AS n_items
              |FROM lineitem
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation   ON s_nationkey = n_nationkey
              |GROUP BY s_name, n_name
              |ORDER BY s_name""".stripMargin)),

    QuerySpec(
      "q02_two_key_rollup",
      (s, dir) => RelationalOps.twoKeyRollup(Tables.lineitem(s, dir)),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       ${decSumSql("l_quantity")} AS sum_qty,
              |       ${decSumSql("l_extendedprice")} AS sum_price,
              |       COUNT(*) AS n_rows
              |FROM lineitem
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QuerySpec(
      "q03_month_rollup",
      (s, dir) => RelationalOps.monthRollup(Tables.orders(s, dir)),
      Some(s"""SELECT o_orderpriority, CAST(month(o_orderdate) AS BIGINT) AS o_month,
              |       ${decSumSql("o_totalprice")} AS total_price,
              |       COUNT(*) AS n_orders
              |FROM orders
              |GROUP BY o_orderpriority, o_month
              |ORDER BY o_orderpriority, o_month""".stripMargin)),

    QuerySpec(
      "q04_filter_project",
      (s, dir) => RelationalOps.filterProject(Tables.lineitem(s, dir)),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
             |FROM lineitem
             |WHERE l_extendedprice > 30000 AND l_discount > 0.02
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QuerySpec(
      "q05_dropna_rollup",
      (s, dir) => RelationalOps.dropRequired(
        Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")),
      Some("""SELECT l_returnflag, COUNT(*) AS n_rows
             |FROM lineitem
             |WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
             |  AND l_returnflag IS NOT NULL AND l_shipdate IS NOT NULL
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    QuerySpec(
      "q06_conditional_label",
      (s, dir) => RelationalOps.conditionalLabel(Tables.orders(s, dir), 100000.0),
      Some(s"""SELECT CASE WHEN o_totalprice > 100000 THEN 1.0 ELSE 0.0 END AS label,
              |       COUNT(*) AS n_rows,
              |       ${decSumSql("o_totalprice")} AS sum_price
              |FROM orders
              |GROUP BY label
              |ORDER BY label""".stripMargin)),

    QuerySpec(
      "q07_topk",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        RelationalOps.topK(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
          col("o_totalprice"), col("o_orderkey"), 15)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 15""".stripMargin)),

    QuerySpec(
      "q08_global_sort",
      (s, dir) => RelationalOps.globalSortByTotal(Tables.orders(s, dir)),
      Some(s"""SELECT o_custkey, ${decSumSql("o_totalprice")} AS total_price,
              |       COUNT(*) AS n_orders
              |FROM orders
              |GROUP BY o_custkey
              |ORDER BY total_price DESC, o_custkey""".stripMargin)),

    QuerySpec(
      "q09_join_inner",
      (s, dir) => RelationalOps.innerJoin(Tables.orders(s, dir), Tables.customer(s, dir)),
      Some("""SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_totalprice > 400000
             |ORDER BY o_orderkey""".stripMargin)),

    QuerySpec(
      "q44_salted_rollup",
      (s, dir) => RelationalOps.saltedRollup(Tables.lineitem(s, dir), 16),
      Some(s"""SELECT l_returnflag, ${decSumSql("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
              |FROM lineitem
              |GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)),

    QuerySpec(
      "q45_copartition_join",
      (s, dir) => RelationalOps.coPartitionedJoin(Tables.orders(s, dir), Tables.customer(s, dir), 32),
      Some(s"""SELECT c_mktsegment, ${decSumSql("o_totalprice")} AS total_price,
              |       COUNT(*) AS n_orders
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment
              |ORDER BY c_mktsegment""".stripMargin))
  )
}
