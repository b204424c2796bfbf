package graft.engine

/** Run-scoped scratch directories. Paths are pid-tagged by their
  * callers so concurrent runs never collide; registering them here
  * deletes them at JVM exit so repeated runs do not accumulate copies
  * of ingest output, model artifacts, and warehouse tables in the tmp
  * dir. Deletion is best-effort (exit path). */
object Scratch {
  private val registered = scala.collection.mutable.LinkedHashSet.empty[String]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      // snapshot under the same lock dir() uses — iterating the live
      // set while a query thread registers would abort cleanup with a
      // ConcurrentModificationException
      Scratch.synchronized(registered.toList).foreach { p =>
        try delete(new java.io.File(p)) catch { case _: Throwable => }
      }))

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
    f.delete()
    ()
  }

  /** Register a scratch path for deletion at JVM exit; returns it. */
  def dir(path: String): String = synchronized {
    hookInstalled
    registered += path
    path
  }
}
