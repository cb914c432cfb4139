package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BloomPrune

class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fact = (1L to 2000L)
    .map(k => (k, k % 97))
    .toDF("row_id", "fk")
  private lazy val dim = Seq(3L, 11L, 42L)
    .map(k => (k, s"dim_$k"))
    .toDF("dk", "dname")

  test("pruned join is row-identical to the plain join") {
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("row_id", "dname").orderBy("row_id").collect().toSeq
    val pruned = BloomPrune.prunedJoin(fact, dim, "fk", "dk",
        expectedItems = 100L, fpp = 0.01)
      .select("row_id", "dname").orderBy("row_id").collect().toSeq
    assert(pruned === plain)
    assert(plain.nonEmpty)
  }

  test("the filter actually prunes non-matching fact rows") {
    val bytes = BloomPrune.keyFilterBytes(dim, "dk", 100L, 0.01)
    val kept = BloomPrune.pruned(fact, "fk", bytes).count()
    val matching = fact.join(dim, col("fk") === col("dk")).count()
    // everything that joins must survive the probe (no false negatives)
    assert(kept >= matching)
    // and the 1% fpp sketch must reject the overwhelming majority of
    // the 94 non-matching key values
    assert(kept < fact.count() / 10)
  }

  test("null keys do not crash the probe and never join") {
    val withNulls = fact.withColumn("fk",
      when(col("row_id") % 5 === 0, lit(null).cast("long")).otherwise(col("fk")))
    val plain = withNulls.join(dim, col("fk") === col("dk")).count()
    val pruned = BloomPrune.prunedJoin(withNulls, dim, "fk", "dk", 100L, 0.01).count()
    assert(pruned === plain)
  }
}
