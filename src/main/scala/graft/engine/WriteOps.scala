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

  /** INCREMENTAL keyed refresh: overwrite ONLY the partitions present
    * in `slice`, leaving every other partition's files untouched — the
    * parquet analogue of the reference's per-key upsert into a keyed
    * aggregate table (reference: app/spark_cassandra_groupby.py:74-82,
    * mode("append") into a Cassandra table whose primary key makes the
    * append an upsert). Spark-native form: `partitionOverwriteMode=
    * dynamic` scopes mode("overwrite") to the partitions the incoming
    * frame actually contains. At 100 TB a one-key refresh rewrites one
    * directory, not the view (untouched partition files are asserted
    * byte-identical in IngestWriteSpec). The session-level conf is set
    * per-write via the DataFrameWriter option, so concurrent full
    * rebuilds keep their whole-view overwrite semantics. */
  /** Small-file compaction — the maintenance pass every append-heavy
    * sink needs (the streaming/batched ingest paths land one file per
    * flush/micro-batch; a year of that is millions of KB-files whose
    * open/footer cost dominates scans). Rewrites the layout into
    * ⌈bytes/target⌉ files at `path + "_compacted"` and returns that
    * path; the caller swaps directories atomically at its own commit
    * point. Data is proven byte-equal by IngestWriteSpec. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): String = {
    def walkBytes(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walkBytes).sum).getOrElse(0L)
      else if (f.getName.startsWith("_") || f.getName.startsWith(".")) 0L
      else f.length()
    val totalBytes = walkBytes(new java.io.File(path))
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val out = path + "_compacted"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(out)
    out
  }

  /** [[compact]] for a PARTITIONED layout, swapped in place: rewrites
    * the layout so each partition directory holds a single file (every
    * key hashes to exactly one of the ⌈bytes/target⌉ write tasks), then
    * replaces `path` with the compacted copy. The in-place swap is the
    * local-FS form of the maintenance commit; at cluster scale the same
    * rewrite lands next to the live layout and the catalog's table
    * location is swapped atomically. Partitions individually larger
    * than `targetFileBytes` would need an intra-key split (salt or
    * `maxRecordsPerFile`) — not the ingest-sink shape this serves,
    * where the problem is many SMALL files per key. */
  def compactPartitionedInPlace(spark: org.apache.spark.sql.SparkSession, path: String,
                                partitionKeys: Seq[String],
                                targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.spark.sql.functions.col
    def walkBytes(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walkBytes).sum).getOrElse(0L)
      else if (f.getName.startsWith("_") || f.getName.startsWith(".")) 0L
      else f.length()
    val nFiles = math.max(1,
      math.ceil(walkBytes(new java.io.File(path)).toDouble / targetFileBytes).toInt)
    val tmp = path + "_compacting"
    spark.read.parquet(path)
      .repartition(nFiles, partitionKeys.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionKeys: _*).parquet(tmp)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(path))
    if (!new java.io.File(tmp).renameTo(new java.io.File(path)))
      throw new java.io.IOException(s"compaction swap failed for $path")
  }

  def refreshPartitions(slice: DataFrame, path: String, partitionKeys: Seq[String]): DataFrame = {
    require(partitionKeys.nonEmpty, "incremental refresh needs partition keys")
    slice.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionKeys: _*)
      .parquet(path)
    slice.sparkSession.read.parquet(path)
  }
}
