package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry: name -> parquet path under a scale-factor directory.
  *
  * Mirrors the reference's fixed catalog of Cassandra tables
  * (reference: cql/setup_usaspending.cql:2-71) re-expressed as columnar
  * Parquet relations read through Spark's vectorized reader. At cluster
  * scale the same names resolve through a real catalog
  * (`spark.read.table`) over partitioned Parquet; locally they are
  * single files under the scale-factor test directories.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** The events parquet carries TIMESTAMP(NANOS) which Spark's reader
    * rejects; with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * all engine sessions) it surfaces as LongType nanos, converted here
    * to a proper TimestampType by flooring to micros — the same
    * truncation DuckDB applies reading the same file. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    val raw = load(spark, sfDir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
