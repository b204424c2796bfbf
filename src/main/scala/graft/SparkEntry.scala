package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{RelationalOps, Tables}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine proper lives in `graft.engine.*` (operators) and
  * `graft.queries.Catalog` (named query + oracle pairs); this object is
  * the thin facade the driver calls.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.3 slice 0): dim ⋈ fact → rollup, the
    * re-expression of the reference's award-amount aggregator
    * (reference: app/spark_cassandra_etl_award_amount_aggregator.py:82-84)
    * on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    RelationalOps.geoRollup(
      Tables.lineitem(spark, dir), Tables.supplier(spark, dir), Tables.nation(spark, dir))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.specs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (non-SQL-expressible ops)
    * get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Catalog.specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
