package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q01_pricing_summary", "w01_daily_rollup_full", "x02_minhash_pairs", "x03_cosine_topk")) {
      println(s"==== $name ====")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      plan.split("\n").filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Scan parquet") || l.contains("Exchange") ||
        l.contains("WholeStageCodegen") || l.contains("Join") || l.contains("Aggregate"))
        .take(25).foreach(l => println(l.take(220)))
    }
    spark.stop()
  }
}
