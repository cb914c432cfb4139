package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** The single-writer contract for this library's bare-directory tables
  * (round-6 verdict #6).
  *
  * Every in-place table mutation here — [[DailyTable]]'s dynamic
  * partition overwrite, [[Compact]]'s staged swap,
  * [[graft.streaming.StreamCdc.mergeInto]]'s staged-manifest merge —
  * assumes it is the ONLY writer of its directory while it runs. The
  * reference has the same assumption (its BigQuery procedures are
  * serialized by the event pipeline, SURVEY.md §2 bug list); at
  * many-job scale the real answer is a table format with snapshot
  * commits, and [[Versioned]] is the in-repo miniature of that for
  * readers needing a hard old-or-new guarantee.
  *
  * [[withLock]] enforces the contract mechanically: an atomic
  * exclusive-create of a lock file (atomic on local and HDFS
  * semantics — create fails if the file exists), held for the
  * duration of the mutation. A second writer gets a
  * [[ConcurrentWriteException]] immediately instead of silently
  * interleaving. The lock protects WRITERS from each other only;
  * readers are never blocked (same as the underlying formats).
  *
  * The lock file is a dot-prefixed SIBLING of the table directory
  * (`.<name>._writer.lock`), not a file inside it: DailyTable's
  * bootstrap is a static overwrite that deletes the root's contents,
  * and Compact renames the whole directory away mid-swap — an in-root
  * lock would be destroyed while held, silently re-admitting a second
  * writer exactly during the windows the lock exists to protect.
  *
  * Crash caveat: a writer that dies without reaching the finally block
  * leaves the lock behind; the lock content (pid@host, wall-clock) is
  * there so an operator can attribute and remove it. No TTL-based
  * auto-takeover — guessing liveness from timestamps is how two
  * writers end up live at once.
  */
object SingleWriter {

  final class ConcurrentWriteException(msg: String)
    extends IllegalStateException(msg)

  /** The lock path guarding `tableDir` (no parent ⇒ in-root fallback,
    * only reachable for a filesystem root).
    */
  def lockFor(tableDir: Path): Path =
    Option(tableDir.getParent)
      .map(new Path(_, s".${tableDir.getName}._writer.lock"))
      .getOrElse(new Path(tableDir, "._writer.lock"))

  /** Run `body` holding the exclusive writer lock of `tableDir`. */
  def withLock[A](fs: FileSystem, tableDir: Path)(body: => A): A = {
    val lock = lockFor(tableDir)
    Option(lock.getParent).foreach(fs.mkdirs)
    val out =
      try fs.create(lock, /* overwrite = */ false)
      catch {
        case e: java.io.IOException =>
          throw new ConcurrentWriteException(
            s"$tableDir is locked by another writer ($lock exists — " +
            "concurrent mutation, or a crashed writer whose lock must " +
            s"be removed by an operator): ${e.getMessage}")
      }
    // From here the lock file EXISTS — every exit path must delete it,
    // including a failed metadata write (a leaked lock blocks all
    // future writers until an operator intervenes).
    try {
      try out.write(
        s"${ProcessHandle.current.pid}@${java.net.InetAddress.getLocalHost.getHostName} ${java.time.Instant.now}"
          .getBytes("UTF-8"))
      finally out.close()
      body
    } finally fs.delete(lock, false)
  }
}
