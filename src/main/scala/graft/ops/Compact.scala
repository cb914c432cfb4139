package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the operational counterpart of the
  * streaming ingest path (streaming/Ingest): a micro-batch file sink
  * writes one-file-per-trigger (the reference writes one GCS blob per
  * hour, Load-Data-From-API/main.py:145-152), so a long-running landing
  * or raw table accumulates thousands of tiny parquet files, and at
  * cluster scale every query then pays one task + one open per file
  * while the scheduler chokes on listing. Periodic compaction rewrites
  * a directory into ~`targetRowsPerFile`-sized files.
  *
  * Mechanics: read → `repartition(ceil(rows/target))` (round-robin —
  * balanced output sizes, no skew inherited from input layout) → write
  * to a staging dir next to the target → swap via two renames. The
  * swap is NOT transactional (two renames, not one atomic commit):
  * concurrent readers can hit the gap, which is why production tables
  * at scale sit behind a table format with snapshot commits; this
  * operator is for the bare-directory layout the harness uses, and the
  * staging write at least guarantees the data is fully materialized
  * and validated before the old files are touched — a failure before
  * the swap leaves the source untouched. For tables that need the
  * old-or-new reader guarantee DURING compaction, use
  * [[compactVersioned]], which commits the rewrite through
  * [[Versioned]]'s atomic snapshot pointer instead of the rename swap.
  */
object Compact {

  /** @return (files before, files after, rows) */
  def compact(
      spark: SparkSession, dir: String,
      targetRowsPerFile: Long): (Int, Int, Long) = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new Path(dir)
    val fs = target.getFileSystem(hconf)

    def parquetFiles(p: Path): Int =
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))

    // Single-writer contract ([[SingleWriter]]): two concurrent
    // compactions of one directory would race the rename swap. Crash
    // recovery below also runs UNDER the lock — it is itself a
    // mutation. (A writer that crashed mid-run leaves its lock behind,
    // per the SingleWriter crash caveat; the operator removes the
    // stale lock, and the next compact() then self-repairs.)
    SingleWriter.withLock(fs, target) {
      // Crash recovery BEFORE anything else: a writer that died
      // between the two swap renames leaves the target renamed away to
      // `_compact_retired` (the documented non-transactional gap). The
      // retired directory is the complete pre-compaction table — roll
      // it back and proceed; nothing was lost, only the swap was. A
      // death before the swap (staging dir present, target intact)
      // needs no handling here: the staging delete below discards it.
      val retiredAtStart = new Path(target.getParent, target.getName + "_compact_retired")
      if (!fs.exists(target) && fs.exists(retiredAtStart)) {
        if (!fs.rename(retiredAtStart, target))
          throw new IllegalStateException(
            s"could not roll back crashed swap from $retiredAtStart")
      }

      // compact() rewrites ONE leaf data directory. Pointed at a
      // partitioned table root, listStatus sees only subdirectories
      // (before=0) and the rewrite would materialize the partition
      // columns into data files, destroying the dt=/month_part= layout —
      // so reject roots outright; callers compact each leaf partition.
      require(fs.listStatus(target).forall(_.isFile),
        s"$dir contains subdirectories (partitioned table root?) — " +
          "compact each leaf partition directory instead")

      val before = parquetFiles(target)
      val df = spark.read.parquet(dir)
      val rows = df.count()
      val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile)

      val staging = new Path(target.getParent, target.getName + "_compact_staging")
      fs.delete(staging, true)
      df.repartition(nFiles.toInt).write.parquet(staging.toString)

      // validate the rewrite before touching the source
      val rewritten = spark.read.parquet(staging.toString).count()
      require(rewritten == rows,
        s"compaction row mismatch: $rows read, $rewritten rewritten")

      val retired = new Path(target.getParent, target.getName + "_compact_retired")
      fs.delete(retired, true)
      if (!fs.rename(target, retired))
        throw new IllegalStateException(s"could not retire $target")
      if (!fs.rename(staging, target)) {
        fs.rename(retired, target) // roll back
        throw new IllegalStateException(s"could not promote $staging")
      }
      fs.delete(retired, true)
      (before, parquetFiles(target), rows)
    }
  }

  /** TRANSACTIONAL compaction for [[Versioned]] snapshot-pointer tables
    * — the upgrade path [[compact]]'s header documents. The committed
    * snapshot is read, rewritten into ~`targetRowsPerFile`-sized files,
    * and committed as the NEXT snapshot through [[Versioned.publishIf]]
    * (compare-and-swap on the version the rewrite was computed from).
    * The commit is Versioned's single atomic marker creation, so a
    * concurrent reader resolves either the complete old snapshot or the
    * complete new one — never [[compact]]'s mid-swap gap — and the old
    * snapshot stays on disk for in-flight readers per Versioned
    * retention. A writer that lands a new snapshot while the rewrite
    * runs wins the CAS; the compaction re-reads and retries (bounded),
    * so it can never roll back data it didn't compact.
    *
    * @return (files before, files after, rows) of the compacted snapshot
    */
  def compactVersioned(
      spark: SparkSession, root: String, targetRowsPerFile: Long,
      maxAttempts: Int = 3): (Int, Int, Long) = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    require(maxAttempts > 0, "maxAttempts must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(hconf)
    def parquetFiles(p: String): Int =
      fs.listStatus(new Path(p)).count(_.getPath.getName.endsWith(".parquet"))

    var attempt = 0
    while (true) {
      attempt += 1
      val v0 = Versioned.current(spark, root).getOrElse(
        throw new java.io.FileNotFoundException(
          s"no committed snapshot at $root"))
      val dir0 = Versioned.versionPath(root, v0)
      // The read runs OUTSIDE the writer lock: if two writers commit
      // between Versioned.current above and the scan below, retention
      // may have deleted dir0 already. That race is semantically a
      // lost CAS (the snapshot we planned to compact is gone because a
      // newer one superseded it), so a vanished-snapshot read failure
      // takes the same bounded re-read-and-retry path as publishIf
      // returning None — only genuine exhaustion surfaces as an error.
      val readOk =
        try {
          val df = spark.read.parquet(dir0)
          val rows = df.count()
          val before = parquetFiles(dir0)
          val nFiles =
            math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile)
          Some((df, rows, before, nFiles))
        } catch {
          case _: java.io.FileNotFoundException => None
          // Only the PATH-VANISHED analysis failure is the CAS race;
          // any other AnalysisException (corrupt footer, unreadable
          // schema) is a real error and must surface on first
          // occurrence, not masquerade as a concurrent-writer loss
          // after maxAttempts identical retries.
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition == "PATH_NOT_FOUND" || {
                var c: Throwable = e.getCause
                var fnf = false
                while (c != null && !fnf) {
                  fnf = c.isInstanceOf[java.io.FileNotFoundException]
                  c = c.getCause
                }
                fnf
              } => None
        }
      readOk match {
        case Some((df, rows, before, nFiles)) =>
          Versioned.publishIf(df.repartition(nFiles.toInt), root, v0) match {
            case Some(v1) =>
              return (before, parquetFiles(Versioned.versionPath(root, v1)),
                rows)
            case None if attempt < maxAttempts => () // lost the CAS; recompute
            case None =>
              throw new SingleWriter.ConcurrentWriteException(
                s"$root moved past v=$v0 on every one of $maxAttempts " +
                  "compaction attempts — a faster writer keeps winning the CAS")
          }
        case None if attempt < maxAttempts => () // snapshot vanished mid-read
        case None =>
          throw new SingleWriter.ConcurrentWriteException(
            s"$root's snapshot v=$v0 vanished under the reader on every " +
              s"one of $maxAttempts compaction attempts — concurrent " +
              "writers plus retention keep outrunning the rewrite")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
