package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: one summary line per registered query — exchange
  * count, join strategies, aggregate kinds, cartesian/sort-agg warnings —
  * so a scale smell (unbroadcast dim, SortAggregate, accidental
  * cartesian) is visible at a glance. Run ad hoc:
  * `sbt "runMain graft.PlanAudit [sfDir]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions).master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
        val p = df.queryExecution.executedPlan.toString
        def n(s: String) = s.r.findAllIn(p).size
        val flags = Seq(
          if (n("CartesianProduct") > 0) "CARTESIAN!" else "",
          if (n("SortAggregate") > 0) "SORT-AGG!" else "",
          if (n("BroadcastNestedLoopJoin") > 0) "BNLJ!" else "")
          .filter(_.nonEmpty).mkString(" ")
        // codegen stages appear as "*(n) Op" in the string form; count
        // distinct stage ids, not node mentions
        val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSet.size
        println(f"AUDIT $name%-28s exch=${n("Exchange ")}%2d bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} reuse=${n("ReusedExchange")} hashagg=${n("HashAggregate")} wsc=$wsc%2d $flags")
      } catch { case e: Throwable =>
        println(s"AUDIT $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
