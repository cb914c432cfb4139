package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.DataFrame

/** K1 of SURVEY.md §2b: the hourly JSON landing blob — CF#1 serializes
  * the cleaned record to a file and uploads it to the landing bucket
  * (/root/reference/Load-Data-From-API/main.py:145-152,181-190), which
  * is what triggers the load path.
  *
  * The reference writes ONE tiny blob per fetch (a single cleaned row),
  * so this is deliberately a driver-side write of a driver-sized batch —
  * there is nothing to distribute. Bulk data lands through
  * [[graft.streaming.Ingest]]'s file stream, which treats each blob as
  * one micro-batch input, no matter which producer wrote it.
  *
  * File name mirrors the reference pattern
  * `hourly-weather-data-json-<yyyymmdd>-<time>.json` (main.py:184) with
  * a colon-free time part — Hadoop `Path` rejects `:` in file names, so
  * the engine's contract is `yyyyMMdd-HHmmss`.
  */
object Landing {
  private val fmt =
    DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss").withZone(ZoneOffset.UTC)

  def blobName(utcMillis: Long): String =
    s"hourly-weather-data-json-${fmt.format(Instant.ofEpochMilli(utcMillis))}.json"

  /** Serialize a (small) cleaned batch as one NDJSON landing blob;
    * returns the file written. `toJSON` preserves the nested structure
    * exactly as `spark.read.schema(raw).json` re-reads it.
    */
  def land(cleaned: DataFrame, landingDir: String, utcMillis: Long): Path = {
    val lines = cleaned.toJSON.collect() // one row per fetch — driver-sized
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    val target = dir.resolve(blobName(utcMillis))
    Files.write(target, String.join("\n", lines: _*).getBytes("UTF-8"))
    target
  }
}
