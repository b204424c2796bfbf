package graft

import org.apache.spark.sql.functions._

import graft.engine.{StreamOps, Tables}

/** Batch==stream equivalence for the windowed event aggregations
  * (SURVEY §7.5: streaming state has no DuckDB oracle; validated by
  * running the identical aggregation in both modes). */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling window equals batch tumbling window") {
    val q = StreamOps.streamingTumbling(spark, sf, "stream_tumbling")
    try {
      q.processAllAvailable()
    } finally q.stop()
    // append mode only emits windows closed by the watermark; compare
    // on the emitted subset.
    val streamed = spark.table("stream_tumbling")
      .orderBy(col("win_start"), col("event_type"))
      .collect()
    assert(streamed.nonEmpty, "watermark should close most 10-minute windows")
    val batchAll = StreamOps.tumbling(Tables.events(spark, sf))
    val batchMap = batchAll.collect()
      .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    streamed.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(2))
      val expected = batchMap(key)
      assert((r.getLong(3), r.getDouble(4)) == expected, s"window $key differs")
    }
  }

  test("session windows never overlap per user and respect the gap") {
    val sessions = StreamOps.sessions(Tables.events(spark, sf)).collect()
    sessions.groupBy(_.getLong(2)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getTimestamp(0).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next session starts at or after previous end (gap >= 5 min)
          assert(!b.getTimestamp(0).before(a.getTimestamp(1)))
        case _ =>
      }
    }
  }
}
