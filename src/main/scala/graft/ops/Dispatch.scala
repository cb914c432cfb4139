package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P3 + P4 + P13 of SURVEY.md §2c: the reference's file-event routing.
  *
  * On each GCS file event the reference (Load-gcs-to-bq/main.py:38-47,65-70)
  *  1. strips the timestamp infix `-json-\d{8}-\d{2}:\d{2}:\d{2}` from the
  *     file name (P3, pattern at main.py:39),
  *  2. takes the path stem and looks it up in a literal stem→table map
  *     (P4, main.py:15-17) — `hourly-weather-data` → `weather-data-hourly`,
  *  3. silently skips files whose stem has no mapping (main.py:70 guard).
  *
  * Command-triggered functions additionally gate on payload equality
  * (P13): `"collect-weather-data"` (Load-Data-From-API/main.py:168) /
  * `"cleanup-older-data"` (Cleanup-job/main.py:41-42).
  *
  * All pure column expressions — `when` chains compile to codegen'd CASE,
  * the lookup "join" is a constant-folded broadcast of a literal map, so
  * at any scale this is a narrow map stage with zero shuffle.
  */
object Dispatch {

  /** Stem → target table (Load-gcs-to-bq/main.py:15-17). */
  val TableMap: Map[String, String] =
    Map("hourly-weather-data" -> "weather-data-hourly")

  /** Timestamp infix stripped from landed file names (main.py:39). */
  val TimestampInfix = "-json-\\d{8}-\\d{2}:\\d{2}:\\d{2}"

  /** P3: `hourly-weather-data-json-20220830-14:30:00.json` →
    * `hourly-weather-data` (regex strip, then drop the extension = the
    * `pathlib.Path(...).stem` of main.py:66).
    */
  def cleanedStem(fileName: Column): Column =
    regexp_replace(
      regexp_replace(fileName, TimestampInfix, ""), "\\.[A-Za-z0-9]+$", "")

  /** P4: stem → table name, NULL when unmapped. */
  def targetTable(stem: Column): Column =
    TableMap.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(stem === lit(k), lit(v)).otherwise(acc)
    }

  /** P3+P4 composed over a frame of file events; unmapped files are
    * silently dropped (the main.py:70 skip).
    */
  def dispatch(files: DataFrame, fileNameCol: String): DataFrame = {
    val stem = cleanedStem(col(fileNameCol))
    files
      .withColumn("stem", stem)
      .withColumn("target_table", targetTable(stem))
      .filter(col("target_table").isNotNull)
  }

  /** P13: keep only rows whose decoded command payload matches. The
    * payload arrives base64-encoded (P6, main.py:166).
    */
  def commandGate(commands: DataFrame, payloadB64Col: String, expected: String): DataFrame =
    commands.filter(
      unbase64(col(payloadB64Col)).cast("string") === lit(expected))
}
