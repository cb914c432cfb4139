package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the scale properties the operators
  * were designed around must stay visible in the plan, not just in the
  * commit history. Queries are EXECUTED first — under AQE the final
  * join strategies and exchange reuse only exist in the adaptive plan,
  * so asserting on the un-executed plan checks nothing.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    df.queryExecution.executedPlan.toString
  }

  test("q01: the date predicate reaches the parquet scan as a pushed filter") {
    val s = finalPlan("q01_pricing_summary")
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      "filter must push to the reader for row-group skipping")
  }

  test("w01: the daily rollup aggregates with hash, never sort") {
    val s = finalPlan("w01_daily_rollup_full")
    assert(!s.contains("SortAggregate"),
      "string-buffer aggregates would force SortAggregate (full sort per partition)")
    assert(s.contains("HashAggregate"))
  }

  test("q02: dimension sides of the star join are broadcast") {
    val s = finalPlan("q02_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 3,
      "customer/nation/region must broadcast, not shuffle")
  }

  test("x02: the LSH self-join reuses one exchange (single pipeline pass)") {
    val s = finalPlan("x02_minhash_pairs")
    assert(s.contains("ReusedExchange"),
      "both join sides must share the tokenize→shingle→signature shuffle")
  }

  test("q21: the Bloom probe filters the fact side below the join") {
    val s = finalPlan("q21_bloom_pruned_join")
    val probeAt = s.indexOf("bloom_might_contain")
    val joinAt = s.indexOf("Join")
    assert(probeAt >= 0, "the Bloom probe must appear in the physical plan")
    assert(joinAt >= 0 && probeAt > joinAt,
      "probe must sit in the join's input subtree (below it in the plan tree)")
  }

  test("x16: IVF search joins on the cell id, never a cartesian corpus scan") {
    val s = finalPlan("x16_ann_kmeans")
    assert(!s.contains("CartesianProduct"),
      "candidates must come from the cell equi-join, not an all-pairs product")
  }

  test("w04/x08: the input range sort is the ONLY sort in the plan") {
    // guards the Sorted.byKey contract: a reintroduced output orderBy
    // would add a second Sort whose range sampler re-runs the pipeline
    for (q <- Seq("w04_clean_project", "x08_simhash")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val sorts = df.queryExecution.optimizedPlan.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s
      }
      assert(sorts.size == 1, s"$q: expected one sort, got ${sorts.size}")
    }
  }

  test("q24: the as-of join is one window pass — no join operator at all") {
    val s = finalPlan("q24_asof_attribution")
    assert(!s.contains("Join"),
      "the union+window formulation must not degrade to an inequality join")
    assert(s.contains("Window"),
      "the carried-forward payload must come from a window operator")
  }

  test("w02: incremental rollup scopes the scan with a dt data filter") {
    val s = finalPlan("w02_daily_rollup_incremental")
    // on the dt-partitioned raw store this same predicate becomes a
    // partition filter (asserted in IngestSpec); on the flat test table
    // it must at least reach the scan as a data filter
    assert(s.contains("PushedFilters") && s.contains("1995-06-17"))
  }
}
