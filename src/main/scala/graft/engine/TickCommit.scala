package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic, tick-versioned snapshot commits for the streaming sinks
  * that apply NON-IDEMPOTENT corrections (LM count subtraction, card
  * fold-out, funnel/retention/transition decrements, alias re-close).
  *
  * The problem this solves (ADVICE r16, high): those sinks used to
  * write the cumulative removal queue FIRST and the store snapshots
  * after it — an ordering that is only safe for pure anti-join
  * maintenance. If a crash landed between the queue write and the
  * store writes, a restart would reload a queue that already contains
  * the crashed tick's ids next to stores that never received the
  * corrections; the replayed tick then derives an EMPTY effective set
  * (ids already queued) and the corrections are silently lost
  * forever. Reversing the order instead would double-apply the
  * decrements on replay — neither ordering of independent writes can
  * be correct, so the tick has to become atomic.
  *
  * Contract: every frame a tick produces (stores + cumulative queue)
  * writes under `outPath/snap/tick=N/<name>`, and a `_COMMITTED`
  * marker file is created LAST. The authoritative state is the
  * largest tick whose marker exists; a snapshot directory without the
  * marker is an aborted tick and is invisible to every reader. The
  * crash matrix collapses to two cases:
  *   - crash BEFORE the marker: the restart loads tick M (the last
  *     committed one), whose queue does NOT contain tick N's ids, so
  *     the replayed tick re-derives the same non-empty effective set
  *     and re-applies the corrections — the staged leftovers are
  *     overwritten frame by frame and the marker finally seals them;
  *   - crash AFTER the marker: [[isCommitted]] tells the replayed
  *     foreachBatch to skip the whole tick body (corrections, ledger
  *     and snapshots are all already durable), so nothing
  *     double-applies and the tick's ledger rows — written before the
  *     marker, re-derived deterministically on an aborted replay —
  *     are never overwritten with zero-delta rows (ADVICE r16, low).
  *
  * [[stage]] and [[seal]] are split so a clean probe can re-read the
  * PERSISTED bytes between them (the q270 recount posture — a probe
  * over the in-memory purge lineage is true by construction and
  * certifies nothing; ADVICE r16, low).
  *
  * Scale: one tiny marker file per tick on top of the snapshot writes
  * the sink already pays; [[seal]] prunes every older snapshot
  * directory, so disk holds at most the committed tick plus the one
  * being staged. The marker create and directory listing are pure
  * filesystem metadata operations.
  */
object TickCommit {
  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Snapshot directory for one tick. */
  def snapDir(outPath: String, tick: Long): String =
    s"$outPath/snap/tick=$tick"

  private def marker(outPath: String, tick: Long): Path =
    new Path(snapDir(outPath, tick), "_COMMITTED")

  /** True iff tick N sealed — the replayed-tick skip guard. */
  def isCommitted(spark: SparkSession, outPath: String, tick: Long): Boolean = {
    val m = marker(outPath, tick)
    fsOf(spark, m).exists(m)
  }

  /** Bind an outPath to the checkpoint directory that numbers its
    * ticks — called ONCE at sink construction. Closes the hole the
    * backwards-seal guard cannot see: a fresh-checkpoint restart
    * whose batch ids collide with the old run's high-water tick is
    * silently SKIPPED by [[isCommitted]] (the batch's data is lost
    * with no error) and its next tick seals cleanly above, so the
    * misconfiguration never surfaces. Recording the checkpoint dir in
    * a `run_binding` file turns that into a loud construction-time
    * error: same checkpoint → resume as normal; different checkpoint
    * over live committed ticks (≥ 0) → throw with the
    * [[resumeInto]] remedy; different checkpoint over only a seed
    * tick (−1, what resumeInto plants) → rebind to the new run. */
  def bind(spark: SparkSession, outPath: String, checkpointDir: String): Unit = {
    val p = new Path(s"$outPath/run_binding")
    val fs = fsOf(spark, p)
    def write(): Unit = {
      val out = fs.create(p, true)
      out.write(checkpointDir.getBytes("UTF-8")); out.close()
    }
    if (!fs.exists(p)) write()
    else {
      val in = fs.open(p)
      val bound = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (bound != checkpointDir) {
        if (latestTick(spark, outPath).exists(_ >= 0L))
          throw new IllegalStateException(
            s"TickCommit: $outPath is bound to checkpoint '$bound' but this " +
            s"sink was constructed with checkpoint '$checkpointDir'. A fresh " +
            "checkpoint restarts tick numbering at 0 — ticks colliding with " +
            "the old run's are silently skipped as replays (data loss). " +
            "Resume the original checkpoint, or seed a fresh outPath via " +
            "TickCommit.resumeInto.")
        write() // only a resumeInto seed (tick −1) committed: adopt the new run
      }
    }
  }

  /** Write the tick's frames under its snapshot directory — NO marker
    * yet, so a crash mid-stage leaves the tick invisible. */
  def stage(spark: SparkSession, outPath: String, tick: Long,
            frames: Seq[(String, DataFrame)]): Unit = {
    val dir = snapDir(outPath, tick)
    frames.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name")
    }
  }

  /** Create the marker (the commit point), then prune every older
    * snapshot directory — committed predecessors and aborted stage
    * leftovers alike are dead once tick N is durable.
    *
    * Refuses to seal BACKWARDS (ADVICE r17): [[latestTick]] takes the
    * max and prune is strictly-below, so tick ids must grow
    * monotonically for the outPath's lifetime. Restarting a query
    * with a FRESH checkpoint directory (batch ids restart at 0)
    * against an existing outPath would otherwise leave the old run's
    * higher tick permanently authoritative — readLatest keeps serving
    * the stale snapshot while new seals never prune it. The throw
    * turns that silent stale-serve into a loud misconfiguration
    * error: resume the original checkpoint, or take a fresh outPath. */
  def seal(spark: SparkSession, outPath: String, tick: Long): Unit = {
    latestTick(spark, outPath).filter(_ > tick).foreach { latest =>
      throw new IllegalStateException(
        s"TickCommit: refusing to seal tick=$tick under $outPath — " +
        s"tick=$latest is already committed. A fresh checkpoint dir " +
        "restarts tick numbering at 0 and must not interleave with an " +
        "old run's ticks: resume the original checkpoint, or point the " +
        "restarted query at a fresh outPath (seeding it from " +
        "readLatest of the old one).")
    }
    val m = marker(outPath, tick)
    fsOf(spark, m).create(m, true).close()
    val root = new Path(s"$outPath/snap")
    val f = fsOf(spark, root)
    if (f.exists(root)) f.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("tick=") && n.stripPrefix("tick=").toLong < tick)
        f.delete(st.getPath, true)
    }
  }

  /** A frame from the staged (not yet sealed) tick, re-read from the
    * persisted bytes — what the clean probes certify against. */
  def readStaged(spark: SparkSession, outPath: String, tick: Long,
                 name: String): DataFrame =
    spark.read.parquet(s"${snapDir(outPath, tick)}/$name")

  /** Largest committed tick, if any — aborted stages are skipped. */
  def latestTick(spark: SparkSession, outPath: String): Option[Long] = {
    val root = new Path(s"$outPath/snap")
    val f = fsOf(spark, root)
    if (!f.exists(root)) None
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("tick=") => s.stripPrefix("tick=").toLong }
      .filter(t => isCommitted(spark, outPath, t))
      .sorted.lastOption
  }

  /** One store from the latest COMMITTED snapshot — the restart
    * loader every caller of the non-idempotent sinks must use. */
  def readLatest(spark: SparkSession, outPath: String,
                 name: String): Option[DataFrame] =
    latestTick(spark, outPath)
      .map(t => spark.read.parquet(s"${snapDir(outPath, t)}/$name"))

  /** Seed a FRESH outPath from another run's latest committed
    * snapshot — the remedy [[seal]]'s backwards-refusal prescribes,
    * mechanized: a query restarted with a fresh checkpoint (batch ids
    * back at 0) takes a new outPath, and this copies every frame of
    * `fromOut`'s authoritative tick there, sealed at tick -1, so
    * (a) [[readLatest]] on the new path serves the carried state
    * immediately, before the first new tick lands, and (b) the new
    * run's tick 0 seals strictly above the seed. Refuses a target
    * that already has committed ticks ≥ 0 (seeding into a LIVE run is
    * the same interleaving hazard the seal guard closes). Returns the
    * tick the seed was taken from. Cost: one read+write per frame of
    * one snapshot — the same bytes a tick write pays. */
  def resumeInto(spark: SparkSession, fromOut: String, toOut: String): Long = {
    val t = latestTick(spark, fromOut).getOrElse(throw new IllegalStateException(
      s"TickCommit: nothing to resume — no committed tick under $fromOut"))
    latestTick(spark, toOut).filter(_ >= 0L).foreach { busy =>
      throw new IllegalStateException(
        s"TickCommit: refusing to seed $toOut — tick=$busy is already " +
        "committed there; resume targets must be fresh outPaths.")
    }
    val dir = new Path(snapDir(fromOut, t))
    val fs = fsOf(spark, dir)
    val frames = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_ != "_COMMITTED")
    stage(spark, toOut, -1L, frames.map(n =>
      n -> spark.read.parquet(s"${snapDir(fromOut, t)}/$n")))
    seal(spark, toOut, -1L)
    t
  }
}
