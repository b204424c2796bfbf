package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batched ingest pipeline (SURVEY §2.1 S3/S4) — the re-expression of
  * the reference's `POST /fetch_data` loop (reference:
  * app/ml_app.py:406-531): a paginated remote source consumed page by
  * page on the driver (pagination on `hasNext`, :451-452,520), rows
  * accumulated into bounded batches (2000-row buffer, :406-408,512-519),
  * transient failures retried with a capped attempt count (:522-531),
  * and each batch BULK-written — replacing the reference's
  * row-at-a-time CQL inserts (:488-508) with a partitioned columnar
  * append.
  *
  * The page source here is a deterministic local fixture standing in
  * for the REST API (the sandbox has no egress); the loop shape is the
  * production shape. Memory is bounded: the driver only ever holds one
  * batch (< batchSize + pageSize rows). At cluster scale the same sink
  * path is reached by a Structured Streaming custom source with
  * Trigger.AvailableNow; the batch loop below is the reference-parity
  * batch form.
  */
object IngestOps {

  /** One ingest record — the 4-column analog of the reference's
    * 13-field award record (SURVEY §2.1 S3). */
  final case class OrderRec(o_orderkey: Long, o_custkey: Long,
                            o_orderpriority: String, o_totalprice: Double)

  /** A page-oriented source: fetchPage(i) returns rows, throws a
    * transient error, or returns None past the end (the
    * `page_metadata.hasNext` analog). */
  trait PagedSource { def fetchPage(page: Int): Option[Seq[OrderRec]] }

  /** Fixture source paging over a bounded, deterministic row slice,
    * with one injected transient failure on the first access to
    * `failPage` to exercise the retry path (the analog of the
    * reference's ConnectionError/Timeout handler, app/ml_app.py:522-531). */
  final class FixtureSource(rows: IndexedSeq[OrderRec], pageSize: Int,
                            failPage: Int = 1) extends PagedSource {
    private var failedOnce = false
    override def fetchPage(page: Int): Option[Seq[OrderRec]] = {
      if (page == failPage && !failedOnce) {
        failedOnce = true
        throw new java.io.IOException("transient: connection reset (fixture)")
      }
      val from = page.toLong * pageSize
      if (from >= rows.length) None
      else Some(rows.slice(from.toInt, math.min(from + pageSize, rows.length).toInt))
    }
  }

  /** Capped retry around one page fetch (reference retries the request
    * up to max_retries before giving up, app/ml_app.py:522-531). */
  def fetchWithRetry(src: PagedSource, page: Int, maxRetries: Int = 3): Option[Seq[OrderRec]] = {
    var attempt = 0
    var out: Option[Seq[OrderRec]] = None
    var done = false
    while (!done) {
      try { out = src.fetchPage(page); done = true }
      catch {
        case e: java.io.IOException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
    out
  }

  /** Run the ingest loop: page → batch buffer → bulk partitioned
    * parquet write (first batch Overwrite for idempotent re-runs, then
    * Append — the reference's mode("append") aggregate-table pattern,
    * app/spark_cassandra_groupby.py:75-82). Returns rows landed. */
  def runIngest(spark: SparkSession, src: PagedSource, outPath: String,
                batchSize: Int = 2000, partitionKey: String = "o_orderpriority"): Long = {
    import spark.implicits._
    var page = 0
    var buf = Vector.empty[OrderRec]
    var total = 0L
    var firstFlush = true
    def flush(): Unit = if (buf.nonEmpty) {
      val mode = if (firstFlush) "overwrite" else "append"
      firstFlush = false
      buf.toDS().toDF()
        .write.mode(mode).partitionBy(partitionKey).parquet(outPath)
      total += buf.size
      buf = Vector.empty
    }
    var more = true
    while (more) {
      fetchWithRetry(src, page) match {
        case Some(rows) =>
          buf ++= rows
          if (buf.size >= batchSize) flush()
          page += 1
        case None => more = false
      }
    }
    flush()
    total
  }

  /** End-to-end ingest query: a bounded deterministic orders slice
    * (constant row count at every scale factor — the fixture stands in
    * for a remote API, not for the fact table) paged through the loop,
    * landed as partitioned parquet, read back through the
    * partition-discovering reader. Oracle: the same slice selected
    * directly from the source table. */
  def ingestBatch(spark: SparkSession, orders: DataFrame, outPath: String,
                  maxKey: Long = 6000L, pageSize: Int = 500, batchSize: Int = 2000): DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rows = orders.filter(col("o_orderkey") <= maxKey)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .as[OrderRec].collect().toIndexedSeq // bounded by maxKey, ~1.5k rows at any sf
    runIngest(spark, new FixtureSource(rows, pageSize), outPath, batchSize)
    spark.read.parquet(outPath)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }
}
