package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: SparkEntry.entry must
  * return rows on sf0.001.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // split multi-row-group files into ~4 MB input partitions: the
      // driver layout is one parquet FILE per table, and a 100 MB
      // single file would otherwise scan on one core (production data
      // arrives as many files; MakeSf writes 4 MB row groups so sf1
      // scans parallelize the way a real table's file count would)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
