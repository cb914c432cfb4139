package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format parity: the same frame must survive a write→read
  * round-trip through every columnar/text format Spark ships in this
  * image (parquet, ORC, CSV, JSON — spark-avro is not on the
  * classpath). Text formats get the schema passed explicitly on read:
  * schema inference is banned everywhere in this engine (SURVEY §1),
  * and for CSV/JSON it is also what makes the round-trip lossless
  * (doubles print shortest-repr and reparse exactly; timestamps carry
  * the session-UTC format).
  */
class FormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val sample: DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select(
      col("l_orderkey"), col("l_linenumber"),    // int64
      col("l_returnflag"),                       // string
      col("l_quantity"), col("l_extendedprice"), // double
      col("l_shipdate"))                         // timestamp
    .limit(500)
    .cache()

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  private def tmp(fmt: String): String =
    Files.createTempDirectory(s"graft-fmt-$fmt").resolve("data").toString

  test("parquet round-trip") {
    val dir = tmp("parquet")
    sample.write.mode(SaveMode.Overwrite).parquet(dir)
    assertSameRows(sample, spark.read.parquet(dir))
  }

  test("orc round-trip") {
    val dir = tmp("orc")
    sample.write.mode(SaveMode.Overwrite).orc(dir)
    assertSameRows(sample, spark.read.orc(dir))
  }

  test("csv round-trip with explicit schema") {
    val dir = tmp("csv")
    sample.write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)
    assertSameRows(sample,
      spark.read.schema(sample.schema).option("header", "true").csv(dir))
  }

  test("json round-trip with explicit schema") {
    val dir = tmp("json")
    sample.write.mode(SaveMode.Overwrite).json(dir)
    assertSameRows(sample, spark.read.schema(sample.schema).json(dir))
  }

  test("partitioned parquet write prunes on the partition key") {
    val dir = tmp("part")
    sample.withColumn("rf", col("l_returnflag"))
      .write.mode(SaveMode.Overwrite).partitionBy("rf").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("rf") === "A")
    val files = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .flatMap(_.files.map(_.getPath.toString))
      }).flatten
    assert(files.nonEmpty && files.forall(_.contains("rf=A")),
      s"scan should touch only rf=A partition dirs, got: $files")
  }
}
