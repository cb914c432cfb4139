package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Text}

/** Incremental LSH index maintenance: probing a persisted band index
  * with a new batch finds exactly the pairs the full recompute finds
  * among pairs touching the batch — without recomputing the corpus.
  */
class IncrementalLshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shingled(df: DataFrame): DataFrame = df
    .withColumn("t", Text.tokens(col("text")))
    .filter(size(col("t")) >= 3)
    .select(col("id"), Text.wordShingles(col("t")).as("s"))

  // base corpus: repeated-phrase docs; batch: truncations + one novel doc
  private lazy val corpus = (1L to 30L)
    .map(i => (i, s"alpha beta gamma delta epsilon zeta token$i theta iota kappa"))
    .toDF("id", "text")
  private lazy val batch = (1L to 30L).filter(_ % 2 == 0)
    .map(i => (i + 100L, s"alpha beta gamma delta epsilon zeta token$i theta iota"))
    .toDF("id", "text")
    .union(Seq((999L, "utterly different words nothing shared here at all"))
      .toDF("id", "text"))

  test("index probe + in-batch pairs == full recompute on batch-touching pairs") {
    val index = Dedup.bandIndex(shingled(corpus), "id", "s")
    val inc = Dedup.incrementalPairs(index, shingled(batch), "id", "s",
        threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

    val full = Dedup.nearDupPairs(
        shingled(corpus.union(batch)), "id", "s", threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val touching = full.filter { case (a, b) => a > 100L || b > 100L }

    assert(inc === touching)
    // the planted truncation pairs are found (each batch doc matches
    // its source), the novel doc matches nothing
    assert((1L to 30L).filter(_ % 2 == 0).forall(i => inc.contains((i, i + 100L))))
    assert(inc.forall { case (a, b) => a != 999L && b != 999L })
  }

  test("a parquet-persisted index probes identically, no corpus recompute") {
    // materialize the index (what production does between batches),
    // read it back cold, and probe — the corpus text is never
    // re-tokenized because the probe only sees the stored frame
    val dir = java.nio.file.Files.createTempDirectory("lshidx").resolve("idx")
    Dedup.bandIndex(shingled(corpus), "id", "s").write.parquet(dir.toString)
    val stored = spark.read.parquet(dir.toString)
    val viaStored = Dedup.incrementalPairs(stored, shingled(batch), "id", "s")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val viaLive = Dedup.incrementalPairs(
        Dedup.bandIndex(shingled(corpus), "id", "s"),
        shingled(batch), "id", "s")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(viaStored === viaLive)
    // pairs are (least, greatest): an index-internal pair would have
    // its GREATEST id below the batch id range — none may exist
    assert(!viaStored.exists { case (_, b) => b < 100L },
      "no index-internal pair may be emitted")
  }
}
