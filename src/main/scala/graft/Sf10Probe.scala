package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Text

/** SCALE-SF10 probe (round-12 verdict task 3): time the heaviest
  * banded-shape registry queries at ~sf10 of the DOCUMENT corpus —
  * converting the 100×-scale claim from curve extrapolation at 4–16×
  * into a measurement an order of magnitude further out.
  *
  * `sbt "runMain graft.Sf10Probe [k1,k2,...] [outBase]"` (default
  * 10,40,100 → ~sf1/sf4/sf10 doc corpora under /tmp/sfk<k>). Scales
  * ONLY documents + embeddings (the tables the five shapes read) with
  * MakeSf's content-growth recipes — per-copy token suffixes keep
  * shingle sets disjoint across copies (vocabulary grows, near-dup
  * structure scales k×, never k²), per-(vec,dim,copy) hash
  * perturbations keep ANN candidates linear — but lands them as a
  * PARTITIONED parquet directory (many part files), because MakeSf's
  * one-file-per-table driver layout serializes its final write through
  * coalesce(1) and is explicitly capped at k=16. Spark reads the
  * directory through the same Tables() path; queries run unmodified.
  *
  * Measured shapes: x02 banded MinHash, x12 blocked n-gram Jaccard,
  * x23 LSH→connected components, x67 PPJoin, x58 SemDeDup
  * (cells∝corpus), x122 split-strategy comparator. Engine-only (the
  * DuckDB leg at this scale is optional per the task) — the claim
  * under test is the ENGINE's time ~ corpus + output.
  */
object Sf10Probe {
  private val Shift = 10000000L

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.getOrElse("10,40,100")
      .split(",").map(_.toInt).toSeq
    val outBase = args.lift(1).getOrElse("/tmp")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      // many small part files instead of MakeSf's 4 MB row groups —
      // same splittability story, no coalesce(1) bottleneck
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = new Path(outBase).getFileSystem(
      spark.sparkContext.hadoopConfiguration)

    def gen(k: Int): String = {
      val dir = s"$outBase/sfk$k"
      val done = new Path(s"$dir/_probe_ready_$k")
      if (fs.exists(done)) { println(s"SF10 gen k=$k: cached"); return dir }
      val docs = Tables(spark, src, "documents")
      val embs = Tables(spark, src, "embeddings")
      def copies(base: DataFrame)(f: (DataFrame, Int) => DataFrame) =
        (0 until k).map(c => f(base, c)).reduce(_ unionByName _)
      val t0 = System.nanoTime()
      copies(docs) { (df, c) =>
        val b = df.withColumn("doc_id", col("doc_id") + c * Shift)
        if (c == 0) b
        else b.withColumn("text", array_join(
            transform(Text.tokens(col("text")),
              t => concat(t, lit(s"_c$c"))), " "))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }.repartition(4 * cpus.toInt)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      copies(embs) { (df, c) =>
        val b = df.withColumn("vec_id", col("vec_id") + c * Shift)
        if (c == 0) b
        else b.withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            x + ((pmod(xxhash64(col("vec_id"), i, lit(c)), lit(2001L))
              - 1000L).cast("float") * lit(1e-4f))))
      }.repartition(2 * cpus.toInt)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      fs.create(done).close()
      println(f"SF10 gen k=$k: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      dir
    }

    // SPARK_GRAFT_PROBE_SHAPES narrows the run — probe hygiene
    // (round-13 #7): one JVM per (shape, k) cell when re-running a
    // single cell, so a prior shape's GC/shuffle debris can't bleed
    // into the timed body the way the run-4 x02 k=40 outlier did
    val allShapes = Seq("x02_minhash_pairs", "x12_ngram_jaccard_blocked",
      "x23_dedup_clusters", "x67_prefix_filter_join", "x58_semdedup",
      "x122_split_leakage")
    val shapes = sys.env.get("SPARK_GRAFT_PROBE_SHAPES")
      .map(_.split(",").toSeq).getOrElse(allShapes)
    ks.foreach { k =>
      val dir = gen(k)
      // Scale shuffle parallelism WITH the data, the way a sized
      // cluster would: the first k=40 run held 32 partitions while the
      // corpus grew 40× over the bench baseline, and the two
      // array-carrying shuffles in x67 went from in-memory to spill —
      // 10× wall for 4× data with EXACTLY linear output rows. Fixed
      // partition counts are a single-machine artifact, not a plan
      // property; per-partition data must stay roughly constant as the
      // corpus grows, so partitions ∝ corpus — routed through the
      // Sizing deploy recipe (round-14 #6). Amplification 16, not the
      // row default 4: these shapes explode shingle/band intermediates
      // an order of magnitude past their parquet input.
      val parts = graft.ops.Sizing.configure(spark, Seq(dir),
        amplification = 16.0)
      println(s"PROBE k=$k shuffle.partitions=$parts")
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      shapes.foreach { name =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(name)(spark, dir)
          df.queryExecution.toRdd
            .foreachPartition(it => while (it.hasNext) it.next())
          (System.nanoTime() - t0) / 1e9
        }
        // output size rides the same run's plan once more (cheap
        // relative to the measured body, and rows are part of the
        // linearity claim: time ~ corpus + OUTPUT)
        val rows = SparkEntry.queries(name)(spark, dir).count()
        println(f"SF10 $name%-28s k=$k%3d docs=$nDocs%8d " +
          f"min=${times.min}%8.2fs rows=$rows%9d")
        // shuffle files live until their ShuffleDependency is GC'd;
        // a 64g heap barely collects, so files from every prior shape
        // accumulate — the first k=100 attempt filled the DISK with
        // dead shuffle data mid-x23. Prompt the ContextCleaner
        // between shapes.
        System.gc()
      }
    }
    spark.stop()
  }
}
