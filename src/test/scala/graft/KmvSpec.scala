package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Kmv

class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("non-full sketch counts exactly (estimate = buffer size)") {
    val k = 64
    val df = (1 to 40).map(i => s"tok$i")
      // duplicates must collapse: feed every token 3 times
      .flatMap(t => Seq(t, t, t)).toDF("token")
      .withColumn("h", Kmv.hash8($"token"))
      .agg(Kmv.kmv(k)($"h").as("sk"))
      .select(size($"sk").as("n"), Kmv.estimate($"sk", k).as("est"))
    val row = df.head()
    assert(row.getInt(0) === 40)
    assert(row.getDouble(1) === 40.0)
  }

  test("full sketch estimates within 2/sqrt(k) relative error") {
    val k = 64
    val n = 5000
    val row = (1 to n).map(i => s"item-$i").toDF("token")
      .withColumn("h", Kmv.hash8($"token"))
      .agg(Kmv.kmv(k)($"h").as("sk"))
      .select(size($"sk").as("sz"), Kmv.estimate($"sk", k).as("est"))
      .head()
    assert(row.getInt(0) === k, "full sketch keeps exactly k minima")
    val est = row.getDouble(1)
    assert(math.abs(est - n) / n < 2.0 / math.sqrt(k.toDouble),
      s"estimate $est too far from $n")
  }

  test("sketch is merge-invariant: estimate independent of partitioning") {
    val k = 16
    val tokens = (1 to 1000).map(i => s"m$i")
    def est(parts: Int): Double = tokens.toDF("token")
      .repartition(parts)
      .withColumn("h", Kmv.hash8($"token"))
      .agg(Kmv.kmv(k)($"h").as("sk"))
      .select(Kmv.estimate($"sk", k)).as[Double].head()
    assert(est(1) === est(7))
  }

  test("buffer stays sorted, distinct and bounded under adversarial order") {
    val agg = new Kmv.KmvAggregator(4)
    // descending insert order with duplicates — worst case for insertion
    val buf = Seq("ff", "aa", "aa", "0a", "ee", "0a", "01", "02", "03")
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf === Seq("01", "02", "03", "0a"))
    val merged = agg.merge(buf, Seq("00", "02", "zz"))
    assert(merged === Seq("00", "01", "02", "03"))
  }
}
