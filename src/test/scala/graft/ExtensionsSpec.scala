package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Text}

/** SQL function surface: graft's native expressions registered through
  * [[GraftExtensions]] (builder-time, via TestSpark's withExtensions)
  * and [[org.apache.spark.sql.GraftFunctions]] (post-hoc) must resolve
  * from SQL text and agree with the Column-API formulations.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine_similarity resolves from SQL and matches known values") {
    val r = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS same,
        |  cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS orth,
        |  cosine_similarity(array(1.0D, 0.0D), array(-2.0D, 0.0D)) AS anti
        |""".stripMargin).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.0)
    assert(r.getDouble(2) === -1.0)
  }

  test("squared_distance and dot_product resolve from SQL, known values") {
    val r = spark.sql(
      """SELECT
        |  squared_distance(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d2,
        |  dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dp,
        |  squared_distance(array(1.0D), array(1.0D, 2.0D)) AS mismatch
        |""".stripMargin).head()
    assert(r.getDouble(0) === 25.0) // 3^2 + 4^2
    assert(r.getDouble(1) === 32.0) // 4 + 10 + 18
    assert(r.isNullAt(2))
  }

  test("word_shingles and minhash_signature from SQL match the Column API") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow")
    ).toDF("id", "text")
    docs.createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT id,
        |  minhash_signature(word_shingles(split(text, '\\s+'), 3), 12) AS sig
        |FROM ext_docs ORDER BY id""".stripMargin)
    val viaApi = docs
      .select(col("id"),
        Dedup.minhashSignature(
          Text.wordShingles(split(col("text"), "\\s+")), 12).as("sig"))
      .orderBy(col("id"))
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
  }

  test("DESCRIBE FUNCTION knows the injected functions") {
    val desc = spark.sql("DESCRIBE FUNCTION cosine_similarity")
      .as[String].collect().mkString("\n")
    assert(desc.contains("cosine_similarity"))
  }

  test("sized arguments reject non-literal values") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('a'), CAST(rand() * 4 AS INT))")
        .collect()
    }
    assert(e.getMessage.contains("INT literal"))
  }

  test("ensureRegistered is idempotent and covers bare sessions") {
    // the shared session already has the functions via withExtensions;
    // a second ensureRegistered must not throw or double-register
    org.apache.spark.sql.GraftFunctions.ensureRegistered(spark)
    org.apache.spark.sql.GraftFunctions.ensureRegistered(spark)
    assert(spark.sql("SELECT cosine_similarity(array(3.0D), array(2.0D))")
      .head().getDouble(0) === 1.0)
  }
}
