package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Text

/** Stage attribution for x67 PPJoin on a scaled corpus — which stage
  * carries the super-linear term SCALE-SF10 measured (k=10 22 s →
  * k=40 ~226-367 s for exactly-linear output rows).
  * `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.X67Probe"`.
  */
object X67Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfk40")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"X67 $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables(spark, sfDir, "documents")
    val toks0 = Text.tokens(col("text"))
    val mutated = docs.select(
      (col("doc_id") + 10000).as("doc_id"),
      array_join(slice(toks0, lit(1), greatest(size(toks0) - 3, lit(0))), " ")
        .as("text"))
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(mutated)
      .repartition(spark.sparkContext.defaultParallelism)
    val sh = timed("sh materialize") {
      val d = corpus.withColumn("t", Text.tokens(col("text")))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), Text.wordShingles(col("t")).as("s"))
        .withColumn("n", size(col("s")).cast("long"))
        .localCheckpoint()
      println(s"X67 sh rows=${d.count()}")
      d
    }
    val ex = sh.select(col("doc_id"), col("n"), explode(col("s")).as("token"))
    val freq = timed("freq agg") {
      val f = ex.groupBy(col("token")).agg(count(lit(1)).as("df"))
        .localCheckpoint()
      println(s"X67 vocab=${f.count()}")
      f
    }
    val wD = Window.partitionBy(col("doc_id"))
    val prefix = timed("ordered+prefix mat") {
      val p = ex.join(freq, "token")
        .withColumn("ord", row_number().over(
          wD.orderBy(col("df"), col("token"))).cast("long"))
        .filter(col("ord") <= col("n") - expr("(3*n + 4) div 5") + 1L)
        .select(col("doc_id"), col("token"), col("n"))
        .localCheckpoint()
      println(s"X67 prefix rows=${p.count()}")
      p
    }
    val cand = timed("cand join+distinct") {
      val c = prefix.as("a").join(prefix.as("b"),
          col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
        .filter(least(col("a.n"), col("b.n")) * 5
          >= greatest(col("a.n"), col("b.n")) * 3)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n").as("na"), col("b.n").as("nb"))
      val preD = c.count()
      println(s"X67 cand pre-distinct=$preD")
      val d = c.distinct().localCheckpoint()
      println(s"X67 cand distinct=${d.count()}")
      d
    }
    timed("verify joins") {
      val out = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
        .withColumn("inter", graft.ext.Dedup.intersectSize(col("sa"), col("sb")))
        .filter(col("inter") * 5 >= (col("na") + col("nb") - col("inter")) * 3)
      println(s"X67 out=${out.count()}")
    }
    spark.stop()
  }
}
