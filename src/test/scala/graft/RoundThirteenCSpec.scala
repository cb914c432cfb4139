package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Text}

/** The sorted-long merge-count intersect (11th native expression) —
  * fixtures for the two-pointer arithmetic and a corpus-wide pin that
  * hashed-sorted verification counts EQUAL the string-set counts it
  * replaced in x67's verify loop.
  */
class RoundThirteenCSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sorted-long merge count: hand fixtures incl. duplicates and empties") {
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L), 2L),
      (Seq(1L, 1L, 2L, 2L), Seq(1L, 2L, 2L), 2L), // dups count once
      (Seq.empty[Long], Seq(1L, 2L), 0L),
      (Seq(-5L, 0L, 7L), Seq(-5L, 7L, 9L), 2L), // negatives ordered
      (Seq(1L, 2L, 3L), Seq(4L, 5L), 0L),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L))
    rows.zipWithIndex.foreach { case ((a, b, expect), i) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(Dedup.sortedIntersectSize(col("a"), col("b")))
        .as[Long].head()
      assert(got === expect, s"fixture $i")
    }
    // null array propagates null
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(Dedup.sortedIntersectSize(col("a"), col("b")).as("v"))
      .select(col("v").isNull).as[Boolean].head()
    assert(n)
  }

  test("hashed-sorted counts == string-set counts on every x67 corpus pair") {
    // the exact corpus x67 verifies: documents + 3-token truncations
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val toks0 = Text.tokens(col("text"))
    val mutated = docs.select((col("doc_id") + 10000).as("doc_id"),
      array_join(slice(toks0, lit(1), greatest(size(toks0) - 3, lit(0))), " ")
        .as("text"))
    val sh = docs.select(col("doc_id"), col("text")).unionByName(mutated)
      .withColumn("t", Text.tokens(col("text")))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
      .withColumn("hs", Dedup.sortedHashedShingles(col("s")))
    // all (doc, its truncation) pairs + a band of unrelated pairs
    val pairs = sh.as("a").join(sh.as("b"),
        col("b.doc_id") === col("a.doc_id") + 10000 ||
          (col("a.doc_id") < 50 && col("b.doc_id") > col("a.doc_id") &&
            col("b.doc_id") < 50))
      .select(
        Dedup.intersectSize(col("a.s"), col("b.s")).as("str_n"),
        Dedup.sortedIntersectSize(col("a.hs"), col("b.hs")).as("hash_n"))
    val bad = pairs.filter(col("str_n") =!= col("hash_n")).count()
    val total = pairs.count()
    assert(total > 400)
    assert(bad === 0L, s"$bad of $total pairs disagree")
  }
}
