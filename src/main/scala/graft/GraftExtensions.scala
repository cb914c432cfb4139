package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{ArrayIntersectSize, CosineSimilarity, DotProduct, MinHashSignature, SquaredDistance, UnicodeNormalize, WordShingles}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Session extension registering graft's native expressions as SQL
  * functions, so the engine's extension surface is reachable from the
  * SQL API (`spark.sql("SELECT cosine_similarity(a, b) ...")`) exactly
  * like a built-in — resolution, `DESCRIBE FUNCTION`, and codegen all
  * go through the standard FunctionRegistry path.
  *
  * Wire-up options (both supported):
  *  - at session build time: `.withExtensions(new GraftExtensions)` or
  *    `.config("spark.sql.extensions", "graft.GraftExtensions")`;
  *  - on an existing session (e.g. one handed to a query closure by a
  *    harness): `org.apache.spark.sql.GraftFunctions.ensureRegistered`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // engine-level optimization: expensive self-joins get shuffle-merge
    // on both sides so ReuseExchange computes the shared pipeline once
    ext.injectOptimizerRule(_ => graft.plans.PreferMergeForSelfJoins)
  }
}

object GraftExtensions {

  /** Sized arguments (number of hashes, shingle width) must be integer
    * literals — they shape the expression tree itself, mirroring how
    * built-ins like `approx_count_distinct` take a foldable precision.
    */
  private def intArg(args: Seq[Expression], pos: Int, fn: String): Int =
    args(pos) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an INT literal, got $other")
    }

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    require(args.length == n, s"$fn takes exactly $n arguments, got ${args.length}")

  private def strArg(args: Seq[Expression], pos: Int, fn: String): String =
    args(pos) match {
      case Literal(v: UTF8String, StringType) => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a STRING literal, got $other")
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("cosine_similarity"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity",
          "cosine_similarity(a, b) - cosine similarity of two array<double> vectors"),
        args => { arity(args, 2, "cosine_similarity")
          CosineSimilarity(args.head, args(1)) }),
      (FunctionIdentifier("minhash_signature"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature",
          "minhash_signature(shingles, numHashes) - md5-chunk MinHash signature " +
            "of a string-array shingle set; numHashes must be an INT literal " +
            "multiple of 4"),
        args => { arity(args, 2, "minhash_signature")
          MinHashSignature(args.head, intArg(args, 1, "minhash_signature")) }),
      (FunctionIdentifier("word_shingles"),
        new ExpressionInfo(classOf[WordShingles].getName, "word_shingles",
          "word_shingles(tokens, n) - distinct space-joined word n-grams; " +
            "n must be an INT literal"),
        args => { arity(args, 2, "word_shingles")
          WordShingles(args.head, intArg(args, 1, "word_shingles")) }),
      (FunctionIdentifier("squared_distance"),
        new ExpressionInfo(classOf[SquaredDistance].getName, "squared_distance",
          "squared_distance(a, b) - squared L2 distance of two array<double> vectors"),
        args => { arity(args, 2, "squared_distance")
          SquaredDistance(args.head, args(1)) }),
      (FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product",
          "dot_product(a, b) - dot product of two array<double> vectors"),
        args => { arity(args, 2, "dot_product")
          DotProduct(args.head, args(1)) }),
      (FunctionIdentifier("array_intersect_size"),
        new ExpressionInfo(classOf[ArrayIntersectSize].getName,
          "array_intersect_size",
          "array_intersect_size(a, b) - size(array_intersect(a, b)) " +
            "over array<string> without materializing the intersection"),
        args => { arity(args, 2, "array_intersect_size")
          ArrayIntersectSize(args.head, args(1)) }),
      (FunctionIdentifier("unicode_normalize"),
        new ExpressionInfo(classOf[UnicodeNormalize].getName,
          "unicode_normalize",
          "unicode_normalize(s, form) - Unicode-normalize a string; form " +
            "must be a STRING literal in {'NFC','NFD','NFKC','NFKD'}"),
        args => { arity(args, 2, "unicode_normalize")
          UnicodeNormalize(args.head, strArg(args, 1, "unicode_normalize")) }),
    )
}
