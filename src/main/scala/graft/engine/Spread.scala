package graft.engine

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive read-side parallelism (optimization guide §2.5,
  * "input skew: one huge unsplittable file ... repartition immediately
  * after the read").
  *
  * The local test tables are single-file, single-row-group parquet, so
  * a scan plans as ONE partition and every downstream map stage — the
  * shingle/gram explosions, per-row hashing — runs serially no matter
  * how many cores the session has (Profile r18: q186 wall ≈ summed
  * task time, 1 task per stage). At cluster scale the same reads
  * arrive in hundreds of splits and need nothing.
  *
  * [[byKey]] bridges the two regimes: hash-repartition to the
  * session's default parallelism ONLY when the frame's entire file
  * footprint is smaller than one scan split per core — then the extra
  * shuffle is at most `cores × maxPartitionBytes` and trivially cheap,
  * and on any healthy cluster layout (many files / large files) the
  * helper is a no-op. The decision reads only source-file METADATA
  * (`inputFiles` + driver-side size lookup): nothing is planned or
  * executed, so it is safe on composed frames under AQE (inspecting
  * `df.rdd` would finalize and EXECUTE upstream stages at plan-build
  * time). Hash (not round-robin) keeps row→partition deterministic
  * under task retries (guide §2.5 on SPARK-38388) and skips
  * round-robin's sort-before-repartition pass. Keys must be
  * high-cardinality enough to spread (doc ids, order keys).
  *
  * Per-task overhead is real (~5-10 ms locally): apply only where the
  * per-row work is the op's measured CPU center (gram/shingle
  * explosions), not to plain column scans — spreading the exact-rank
  * family's cents projections measured SLOWER (r18 Profile).
  */
object Spread {
  def byKey(df: DataFrame, key: Column*): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val p = sc.defaultParallelism
    val maxSplit = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val files = df.inputFiles
    lazy val bytes = {
      val conf = sc.hadoopConfiguration
      files.map { f =>
        try {
          val path = new org.apache.hadoop.fs.Path(f)
          path.getFileSystem(conf).getFileStatus(path).getLen
        } catch { case _: Throwable => Long.MaxValue / 4096 }
      }.sum
    }
    if (files.nonEmpty && files.length < p && bytes < p.toLong * maxSplit)
      df.repartition(p, key: _*)
    else df
  }
}
