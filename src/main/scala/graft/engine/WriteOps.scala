package graft.engine

import org.apache.spark.sql.DataFrame

/** Materialized-view rebuild writes (SURVEY §2.1 S2) — the reference's
  * keyed aggregate-table maintenance (reference:
  * app/spark_cassandra_groupby.py:74-82 writes each rollup into its
  * own Cassandra table with mode("append")), re-expressed the
  * Spark-native way: Overwrite + partitionBy parquet, so the rebuilt
  * view is atomic-per-run and partition-pruned on its lead key when
  * served. At 100 TB the same call writes through a catalog table
  * (`saveAsTable`) with dynamic partition overwrite; locally it is a
  * path write.
  */
object WriteOps {

  /** Rebuild a materialized aggregate at `path`, partitioned by its
    * serving keys, and hand back the re-read view (partition-
    * discovering reader — proves the landed layout round-trips). */
  def rebuild(df: DataFrame, path: String, partitionKeys: Seq[String]): DataFrame = {
    val writer = df.write.mode("overwrite")
    (if (partitionKeys.nonEmpty) writer.partitionBy(partitionKeys: _*) else writer)
      .parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
