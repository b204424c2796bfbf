package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Determinism helpers for oracle-comparable results.
  *
  * Floating-point SUM/AVG depend on accumulation order, which differs
  * between Spark (partial + final hash aggregate over shuffled
  * partitions) and any single-node oracle. To make aggregate results
  * bit-reproducible regardless of partitioning — on 32 local threads or
  * 1000 executors — monetary aggregates accumulate in exact DECIMAL and
  * only the final value is cast back to DOUBLE. The oracle SQL applies
  * the identical transformation, so both engines produce the same
  * 64-bit value.
  */
object Exact {

  /** Exact order-independent sum: cast to DECIMAL(18,scale), sum
    * exactly, cast the total back to double. */
  def decSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Order-independent mean built from the exact sum. */
  def decAvg(c: Column, scale: Int = 4): Column =
    decSum(c, scale) / count(c).cast(DoubleType)

  /** Widen any integral column to BIGINT so Spark IntegerType and
    * oracle-side INTEGER/BIGINT hash identically. */
  def asLong(c: Column): Column = c.cast(LongType)

  /** SQL fragment mirroring [[decSum]] for the DuckDB oracle. */
  def decSumSql(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  def decAvgSql(expr: String, scale: Int = 4): String =
    s"(${decSumSql(expr, scale)} / COUNT($expr))"
}
