package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.ContentChunks

/** Round-11 second wave: content-defined chunking — the properties the
  * oracle can't state (reassembly identity, insertion robustness).
  */
class RoundElevenBSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("cdc: native rolling boundaries == HOF polynomial re-fold") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val diff = docs
      .withColumn("nat", ContentChunks.boundaries(col("text"), 8))
      .withColumn("hof", ContentChunks.boundariesHof(col("text"), 8))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(diff === 0,
      "single-pass rolling hash must produce the identical boundary set")
  }

  test("cdc: chunks reassemble to the exact original text") {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val bad = docs
      .withColumn("rebuilt", concat_ws("", ContentChunks.chunks(col("text"), 8)))
      .filter(col("rebuilt") =!= col("text") && length(col("text")) > 0)
      .count()
    assert(bad === 0, "concatenated chunks must equal the document")
  }

  test("cdc: boundaries are local — an inserted preamble only moves " +
      "the head chunks") {
    val docs = Tables(spark, dir, "documents")
      .filter(col("n_chars") >= 200).limit(20)
      .select(col("doc_id"), col("text"))
    val orig = docs.select(col("doc_id"),
      explode(ContentChunks.chunks(col("text"), 8)).as("c"))
      .select(col("doc_id"), md5(col("c")).as("h"))
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val shifted = docs.select(col("doc_id"),
      concat(lit("INSERTED PREAMBLE "), col("text")).as("text"))
      .select(col("doc_id"), explode(ContentChunks.chunks(col("text"), 8)).as("c"))
      .select(col("doc_id"), md5(col("c")).as("h"))
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    // every chunk strictly after the first boundary past the edit is
    // identical; only the head region (a couple of chunks) can differ
    orig.foreach { case (id, hs) =>
      val surv = (hs intersect shifted(id)).size
      assert(surv >= hs.size - 2,
        s"doc $id: only $surv of ${hs.size} chunks survived an 18-char " +
          "preamble — boundaries are not content-local")
      assert(hs.size >= 2, s"doc $id produced ${hs.size} chunks")
    }
  }

  test("x90: planted preamble copies share their tails with the originals") {
    val out = ExtQueriesAccess.run(spark, dir, "x90_cdc_chunks")
      .as[(Long, Long, Long)].collect()
    val planted = out.filter(_._1 >= 30000)
    assert(planted.nonEmpty)
    // across the planted copies, nearly all chunks dedup against the
    // original doc's tail (only the head region is new)
    val total = planted.map(_._2).sum.toDouble
    val shared = planted.map(_._3).sum.toDouble
    assert(shared / total > 0.5,
      f"planted copies share only ${shared / total}%.2f of their chunks")
  }

  // --- x91: distributed AUC -------------------------------------------

  import graft.ext.Auc

  test("auc: hand-computed fixture with ties; perfect and inverted ends") {
    def run(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Double) =
      Auc.auc(rows.toDF("s", "pos"), col("s"), col("pos"))
        .as[(Long, Long, Long, Double)].head()
    // pos scores {3, 5, 5}, neg {1, 5}: pairwise doubled wins
    // 2+0+2+1+2+1 = 8 of 2·3·2 = 12 -> AUC = 0.666667
    val (np, nn, u2, auc) = run(Seq(
      (3L, true), (5L, true), (5L, true), (1L, false), (5L, false)))
    assert((np, nn, u2) === ((3L, 2L, 8L)))
    assert(auc === 0.666667)
    // separable: every positive above every negative
    assert(run(Seq((10L, true), (11L, true), (1L, false)))._4 === 1.0)
    // inverted: every positive below every negative
    assert(run(Seq((1L, true), (2L, true), (9L, false)))._4 === 0.0)
    // all-tied scores: AUC = 0.5 exactly
    assert(run(Seq((7L, true), (7L, false), (7L, false)))._4 === 0.5)
  }

  test("auc: bucketed rank equals a driver-side exact recompute on data") {
    val base = Tables(spark, dir, "embeddings")
      .select(floor(graft.ext.Similarity.norm2(
        graft.ext.Similarity.toDoubleArray(col("embedding"))) * 1e6 + 0.5)
        .cast("long").as("s"),
        (col("label") % 2 === 0).as("pos"))
    val (np, nn, u2, auc) = Auc.auc(base, col("s"), col("pos"))
      .as[(Long, Long, Long, Double)].head()
    val rows = base.as[(Long, Boolean)].collect()
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val exact2U = pos.map(p =>
      2L * neg.count(_ < p) + neg.count(_ == p).toLong).sum
    assert((np.toInt, nn.toInt) === ((pos.length, neg.length)))
    assert(u2 === exact2U)
    assert(auc ===
      BigDecimal(exact2U.toDouble / (2.0 * pos.length * neg.length))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
