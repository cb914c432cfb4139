package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-pointer table layout — the minimum commit protocol that
  * gives READERS an old-or-new guarantee over bare parquet directories
  * (round-6 verdict #6: "ideally a staged-manifest commit so readers
  * never observe a half-swapped partition").
  *
  * Layout under `root`:
  * {{{
  *   v=00000001/...parquet     // immutable snapshot directories
  *   v=00000002/...parquet
  *   _commit_00000001          // marker: v=1 is committed
  *   _commit_00000002          // marker: v=2 is committed
  * }}}
  *
  * [[publish]] writes the new snapshot to a fresh `v=N` directory
  * (never touching any committed one), then COMMITS by CREATING the
  * `_commit_N` marker file — one atomic file creation; the committed
  * version is the HIGHEST marker present. There is never a moment
  * with no committed pointer: old markers are removed only after the
  * new one exists, and a crash between those steps leaves two markers
  * of which the newer simply wins (delete-then-rename pointer schemes
  * have the inverse window — no pointer at all — after which a naive
  * next publish would restart numbering and delete committed data).
  * A reader resolving before the marker lands reads the complete old
  * snapshot; after, the complete new one; a partially-written
  * directory is never reachable because unmarked `v=` dirs are
  * invisible to [[read]]. This is the directory-layout miniature of
  * what Iceberg/Delta do with manifest files — same guarantee, one
  * table, no format dependency.
  *
  * Retention: the previous snapshot is kept (an in-flight reader that
  * resolved the old pointer may still be scanning it); older ones are
  * deleted on the next publish. A reader more than one publish behind
  * can hit deleted files — bound reader latency or raise the retained
  * count at real scale.
  *
  * Writers serialize through [[SingleWriter.withLock]]; readers never
  * take the lock.
  */
object Versioned {

  private val Marker = "_commit_"

  private def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest commit marker = the committed version. */
  private def currentVersion(fs: FileSystem, root: Path): Option[Long] =
    if (!fs.exists(root)) None
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(Marker))
      .flatMap(n => scala.util.Try(n.stripPrefix(Marker).toLong).toOption)
      .maxOption

  private def versionDir(root: Path, v: Long): Path =
    new Path(root, f"v=$v%08d")

  /** Write + mark + retire-older, under the writer lock (the shared
    * commit body of [[publish]] and [[publishIf]]).
    */
  private def commitLocked(fs: FileSystem, rootP: Path, df: DataFrame,
      prev: Option[Long]): Long = {
    val next = prev.getOrElse(0L) + 1L
    val dir = versionDir(rootP, next)
    fs.delete(dir, true) // debris from a crashed pre-commit attempt
    df.write.parquet(dir.toString)
    // COMMIT POINT: one atomic marker creation — from here readers
    // resolve v=next
    fs.create(new Path(rootP, f"$Marker$next%08d"), true).close()
    // keep prev (+ its marker) for in-flight readers; drop older
    fs.listStatus(rootP).map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        val v =
          if (n.startsWith("v=")) scala.util.Try(n.stripPrefix("v=").toLong).toOption
          else if (n.startsWith(Marker)) scala.util.Try(n.stripPrefix(Marker).toLong).toOption
          else None
        v.map(_ -> p)
      }
      .filter { case (v, _) => v < next && !prev.contains(v) }
      .foreach { case (_, p) => fs.delete(p, true) }
    next
  }

  /** Commit `df` as the next snapshot of `root`; returns the committed
    * version number.
    */
  def publish(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    SingleWriter.withLock(fs, rootP) {
      commitLocked(fs, rootP, df, currentVersion(fs, rootP))
    }
  }

  /** Optimistic commit (compare-and-swap over the marker pointer):
    * publish `df` as the next snapshot ONLY if the committed version is
    * still `expected` once the writer lock is held. Returns the new
    * version, or None if another writer committed in between — the
    * caller re-reads the table and recomputes. This is what makes
    * DERIVED rewrites safe ([[Compact.compactVersioned]]): the rewrite
    * was computed FROM snapshot `expected`, so blindly committing it
    * over a newer snapshot would silently roll that snapshot back.
    * The check happens before any data is written, so a lost race
    * costs nothing.
    */
  def publishIf(df: DataFrame, root: String, expected: Long): Option[Long] = {
    val spark = df.sparkSession
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    SingleWriter.withLock(fs, rootP) {
      val prev = currentVersion(fs, rootP)
      if (!prev.contains(expected)) None
      else Some(commitLocked(fs, rootP, df, prev))
    }
  }

  /** The committed version, if any (readers and derived-rewrite
    * writers resolve through this; [[versionPath]] names its data).
    */
  def current(spark: SparkSession, root: String): Option[Long] =
    currentVersion(fsOf(spark, new Path(root)), new Path(root))

  /** Data directory of a specific committed version. */
  def versionPath(root: String, v: Long): String =
    versionDir(new Path(root), v).toString

  /** Read the committed snapshot (the highest marker's directory). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val v = currentVersion(fs, rootP).getOrElse(
      throw new java.io.FileNotFoundException(s"no committed snapshot at $root"))
    spark.read.parquet(versionDir(rootP, v).toString)
  }
}
