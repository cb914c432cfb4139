package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{AsOfJoin, Bucketed, Cdc}

/** Generic relational capability surface (SURVEY.md §2d "not present"
  * list, §2e joins, §2f windows/sorts/limits/set-ops) demonstrated over
  * the TPC-H-ish test tables, each with a DuckDB oracle.
  *
  * Scale posture, per query: dimension sides of joins are explicitly
  * `broadcast()`; aggregations are single hash-aggregates with map-side
  * partials; sorts ride on already-reduced outputs; no driver-side
  * collection anywhere.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Exact (order-independent) rounded sum. A large-magnitude double sum
    * depends on accumulation order — at sf0.1 a billion-scale revenue
    * sum differs by ~1e-6 between Spark's 32 partial sums and DuckDB's
    * sequential sum, enough to flip `round(..., 2)` at a boundary. Money
    * sums therefore accumulate in DECIMAL (exact, order-independent)
    * and only then round.
    */
  private def sumExact(c: Column, digits: Int): Column =
    round(sum(c.cast("decimal(38,8)")).cast("double"), digits)

  /** NTZ-safe epoch extraction. The test parquet's `ts` arrives as
    * TIMESTAMP_NTZ (parquet `timestamp[us]` without isAdjustedToUTC),
    * which `unix_millis`/`unix_micros` reject outright. Casting to
    * TIMESTAMP first is a no-op for tz-aware input and interprets NTZ
    * wall-clock in the session zone (pinned to UTC by every entry
    * point), which is exactly DuckDB's `epoch_ms` semantics on naive
    * timestamps — so the oracle values agree either way the driver
    * writes the column.
    */
  private[queries] def epochMs(c: Column): Column =
    unix_millis(c.cast("timestamp"))
  private[queries] def epochUs(c: Column): Column =
    unix_micros(c.cast("timestamp"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2d A1-A6 analogue + COUNT/SUM/COUNT DISTINCT (the "not present"
    // aggregates): TPC-H Q1-shaped pricing summary.
    // Filter on the raw timestamp column (not a function of it) so the
    // predicate pushes to the parquet reader as a row-group min/max skip
    // — `to_date(l_shipdate) <= d` cannot push down (VERDICT.md #6).
    "q01_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-09-03 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumExact(col("l_quantity"), 2).as("sum_qty"),
          sumExact(col("l_extendedprice"), 2).as("sum_base_price"),
          sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"),
          countDistinct(col("l_orderkey")).as("distinct_orders"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // §2e: multi-way join, dimensions broadcast (region/nation/customer
    // are tiny at any SF relative to the fact side).
    "q02_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // q02's zero-exchange deployment twin (round-12 verdict task 1):
    // same query, same oracle, but the two fact tables come from the
    // SHARED bucketed layout (one layout per (table, orderkey) serves
    // the whole join workload — q28 uses the same one), so the
    // lineitem ⋈ orders join plans with NO exchange and NO sort on
    // either side; the dims stay broadcast and the only shuffle left is
    // the 125-group final aggregate. This is the production shape: the
    // nightly layout write amortizes the fact-fact exchange that
    // dominates q02's cost (sf1: the exchange IS ~2 s of q02's 2.1 s).
    // RoundThirteenSpec asserts the plan (≤1 exchange, SMJ, no sort
    // above the scans).
    "q02b_revenue_bucketed" -> ((s, dir) => {
      val li = Bucketed.table(s,
        Bucketed.nameFor(dir, "lineitem", "l_orderkey", 32),
        t(s, dir, "lineitem"), "l_orderkey", buckets = 32)
      val ord = Bucketed.table(s,
        Bucketed.nameFor(dir, "orders", "o_orderkey", 32),
        t(s, dir, "orders"), "o_orderkey", buckets = 32)
      li.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .hint("merge")
        .join(ord.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // §2e left_semi (EXISTS)
    "q03_semi_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))),

    // §2e left_anti (NOT EXISTS)
    "q04_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))),

    // §2f windows: per-group top-k via row_number (deterministic
    // tie-break on c_custkey).
    "q05_topk_per_segment" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    // §2f global top-k: order + limit with total tie-break.
    "q06_topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // §2f set operations: INTERSECT / EXCEPT summarized into one frame.
    "q07_set_ops" -> ((s, dir) => {
      val s1 = s
      import s1.implicits._
      val custKeys = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val ordKeys = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val inter = custKeys.intersect(ordKeys).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect"))
      val exc = custKeys.except(ordKeys).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except"))
      inter.unionByName(exc).select(col("op"), col("n")).orderBy(col("op"))
    }),

    // §2f windows: running sum / lag / rank over an event-time ordering.
    "q08_running_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_total"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          rank().over(w).cast("long").as("rnk"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // §2c P7: JSON parse over the events stream table.
    "q09_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // §2c P9/P10 date parts + bucketing on the events table.
    "q10_monthly_events" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(to_date(date_trunc("month", col("ts"))).as("mon"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumExact(col("value"), 2).as("total_value"))
        .orderBy(col("mon"), col("event_type"))),

    // §2f pivot: monthly event counts widened to one column per event
    // type. The value list is EXPLICIT — with an inferred list Spark
    // runs a distinct-scan job and the output schema depends on data,
    // both wrong at scale and for the oracle (which mirrors the pivot
    // as CASE aggregates over the same fixed columns).
    "q22_pivot_events" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(to_date(date_trunc("month", col("ts"))).as("mon"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("mon"))),

    // §2d grouping sets: ROLLUP with explicit NULLS FIRST ordering.
    "q11_rollup_status" -> ((s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumExact(col("o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    // §2d HAVING + scalar subquery threshold (self-scaling across SFs).
    "q12_having_above_avg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val grouped = li.groupBy(col("l_suppkey"))
        .agg(sumExact(col("l_quantity"), 2).as("supp_qty"), count(lit(1)).as("n_items"))
      val thr = li.agg((sum(col("l_quantity")) / countDistinct(col("l_suppkey"))).as("thr"))
      grouped.crossJoin(broadcast(thr))
        .filter(col("supp_qty") > col("thr"))
        .select(col("l_suppkey"), col("supp_qty"), col("n_items"))
        .orderBy(col("l_suppkey"))
    }),

    // §2d scalar subquery in a row filter.
    "q13_above_avg_parts" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val avgPrice = p.agg(avg(col("p_retailprice")).as("avg_price"))
      p.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("avg_price"))
        .select(col("p_partkey"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    }),

    // §2d distribution stats: EXACT grouped percentiles (p50/p90/p99 of
    // order value per priority) via explicit rank positions — one
    // shuffle on the group key, rows sorted within their group's window
    // partition. Deterministic cross-engine because the position is an
    // integer (floor((n-1)·p)+1 over a (price, key)-tiebroken order),
    // unlike interpolating quantiles whose float blends differ by ulps.
    // Exact per-group sort is the bounded-group-count shape; for
    // unbounded/skewed cardinalities the sketch path
    // (approx_percentile, a partial-aggregable KLL) replaces it.
    "q23_percentile_stats" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wc = Window.partitionBy(col("o_orderpriority"))
      def atP(p: Double) = round(
        max(when(col("rn") === floor((col("n") - 1) * p) + 1,
          col("o_totalprice"))), 2)
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wc))
        .groupBy(col("o_orderpriority"))
        .agg(max(col("n")).as("n_orders"),
          atP(0.5).as("p50"), atP(0.9).as("p90"), atP(0.99).as("p99"))
        .orderBy(col("o_orderpriority"))
    }),

    // As-of join (ops/AsOfJoin): click→purchase attribution — every
    // purchase gets the user's most recent click at-or-before it. The
    // union+window formulation: ONE hash shuffle of both sides on
    // user_id, a per-partition sort, no inequality join (which Catalyst
    // can only nested-loop within key groups, O(n²) on a hot user).
    "q24_asof_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      AsOfJoin.asOf(purchases, clicks, key = "user_id", time = "ts",
          tiebreak = "event_id", payload = Seq("event_id", "ts", "value"))
        .select(col("user_id"), col("event_id"), col("ts").as("purchase_ts"),
          col("asof_event_id").as("click_id"), col("asof_ts").as("click_ts"),
          round(col("value") - col("asof_value"), 2).as("uplift"))
        .orderBy(col("event_id"))
    }),

    // §2c P5/P11 + string surface: concat, substring, case, upper, length.
    "q14_string_projection" -> ((s, dir) =>
      Sorted.byKey(t(s, dir, "part"), col("p_partkey"))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_name"), 1, 12).as("name_prefix"),
          length(col("p_name")).cast("long").as("name_len"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          when(col("p_size") >= 30, lit("large"))
            .when(col("p_size") >= 10, lit("medium"))
            .otherwise(lit("small")).as("size_class"))),

    // §2c P3: the reference's filename-cleanup regex transplanted
    // (strip `-json-\d{8}-\d{2}:\d{2}:\d{2}`, then take the stem).
    // Output order comes from pre-sorting the input on the carried key
    // ([[Sorted.byKey]]): the regex projection is row-wise
    // (order-preserving), so sorting first keeps the heavy regex work
    // out of the range-partitioner's sampling pass and spreads it over
    // all range partitions.
    "q15_regexp_cleanup" -> ((s, dir) =>
      Sorted.byKey(t(s, dir, "orders"), col("o_orderkey"))
        .select(col("o_orderkey"),
          concat(lit("hourly-weather-data-json-19950617-12:34:56_"),
            col("o_orderpriority")).as("fname"))
        .select(
          col("o_orderkey"),
          regexp_replace(col("fname"),
            "-json-\\d{8}-\\d{2}:\\d{2}:\\d{2}", "").as("cleaned"),
          regexp_extract(col("fname"), "^([a-z]+)-", 1).as("stem"))),

    // §2c P6: base64 encode/decode round-trip.
    "q16_base64_roundtrip" -> ((s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          base64(col("p_brand").cast("binary")).as("b64"),
          unbase64(base64(col("p_brand").cast("binary"))).cast("string").as("roundtrip"))
        .orderBy(col("p_partkey"))),

    // DISTINCT projection (§2f "not present" list).
    "q17_distinct_pairs" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))),

    // §2c P7 both halves: to_json (serialize, main.py:197) then parse the
    // envelope back out — values must survive the round trip.
    "q18_json_roundtrip" -> ((s, dir) => {
      val j = to_json(struct(col("event_type"), col("value")))
      // Input pre-sorted on the unique carried key (see q15): the JSON
      // serialize/parse round trip runs once, after the range shuffle.
      Sorted.byKey(t(s, dir, "events"), col("event_id"))
        .select(
          col("event_id"),
          get_json_object(j, "$.event_type").as("rt_type"),
          round(get_json_object(j, "$.value").cast("double"), 4).as("rt_value"))
    }),

    // Salted skew join (scale technique demo under the oracle): the
    // salted plan must be row-identical to the plain join, so the oracle
    // is simply the UNSALTED SQL — DuckDB proves the equivalence.
    "q20_salted_skew_join" -> ((s, dir) =>
      graft.ops.SkewJoin.salted(
        t(s, dir, "lineitem"), t(s, dir, "supplier"),
        "l_suppkey", "s_suppkey", salts = 8)
        .groupBy(col("s_name"))
        .agg(
          sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("s_name"))),

    // Bloom-filter join pruning (scale technique demo under the
    // oracle): the fact side is pre-filtered by a broadcast Bloom
    // filter of the dimension's keys before it ever shuffles; false
    // positives die in the join, so the oracle is simply the UNPRUNED
    // SQL — DuckDB proves row-identity for any fpp.
    "q21_bloom_pruned_join" -> ((s, dir) => {
      val dim = t(s, dir, "supplier")
        .filter(col("s_nationkey") === 3)
        .select(col("s_suppkey"), col("s_name"))
      graft.ops.BloomPrune.prunedJoin(
        t(s, dir, "lineitem"), dim, "l_suppkey", "s_suppkey",
        expectedItems = 10000L, fpp = 0.01)
        .groupBy(col("s_name"))
        .agg(
          sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("s_name"))
    }),

    // Interval/range join (ops/RangeJoin): campaign windows (every
    // 97th event opens a 2-hour window) matched to every event inside
    // them. The bucketed replicate-and-refine equi-join replaces the
    // BroadcastNestedLoopJoin a bare inequality predicate would plan —
    // the oracle is the plain inequality join, proving row-identity.
    "q25_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val iv = ev.filter(col("event_id") % 97 === 0)
        .select(col("event_id").as("interval_id"),
          epochMs(col("ts")).as("lo"),
          (epochMs(col("ts")) + 7200000L).as("hi"))
      // Spread the probe side before the fan-out join: the events scan
      // yields few input partitions locally (single-file layout), and
      // every matched row (~29 per event at sf1 — 28.7M total) plus
      // the partial aggregate would otherwise pile onto those few
      // cores. One narrow 3-column shuffle of the probe buys 32-way
      // parallelism for the ~30x bigger join output; at production
      // scale the file count makes this a no-op to delete.
      val pr = ev.select(col("user_id"), epochMs(col("ts")).as("pt"),
        col("value"))
        .repartition(s.sparkContext.defaultParallelism)
      // Two-level aggregate instead of count+countDistinct+sum in one:
      // a MIXED distinct/non-distinct aggregate plans an Expand that
      // multiplies every matched row ×3 before the shuffle (measured
      // 50 s isolated at sf1, where the join emits 28.7M matches —
      // 86M expanded rows). Pre-grouping on (interval, user) is
      // map-side partial-aggregatable, so the shuffle carries unique
      // pairs; the rollup then reads counts off the pair table. Same
      // values exactly: DECIMAL sums are associative, n_events is the
      // pair-count sum, n_users the pair count.
      graft.ops.RangeJoin.byBucket(pr, "pt", iv, "lo", "hi",
          bucketWidth = 3600000L)
        .groupBy(col("interval_id"), col("user_id"))
        .agg(count(lit(1)).as("c"),
          sum(col("value").cast("decimal(38,8)")).as("v"))
        .groupBy(col("interval_id"))
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_users"),
          round(sum(col("v")).cast("double"), 2).as("total_value"))
        .orderBy(col("interval_id"))
    }),

    // §2c P3+P4+P13: filename cleanup → stem → table dispatch with the
    // reference's silent skip of unmapped stems (Load-gcs-to-bq/main.py:70).
    "q19_dispatch" -> ((s, dir) => {
      val files = Sorted.byKey(t(s, dir, "orders"), col("o_orderkey"))
        .select(
        col("o_orderkey"),
        concat(
          when(col("o_orderkey") % 3 === 1, lit("unknown-export"))
            .otherwise(lit("hourly-weather-data")),
          lit("-json-19950617-12:34:56.json")).as("file_name"))
      graft.ops.Dispatch.dispatch(files, "file_name")
        .select(col("o_orderkey"), col("stem"), col("target_table"))
        .orderBy(col("o_orderkey"))
    }),

    // §2g beyond the reference: slowly-changing-dimension (type 2)
    // construction from a change log — each user's event stream becomes
    // versioned validity intervals (valid_from, valid_to, is_current),
    // the point-in-time dimension table a warehouse maintains next to
    // its facts. ONE window keyed on the entity: lead() supplies the
    // closing timestamp, so the table shuffles once on user_id — the
    // classic "self-join to the next change" formulation costs a second
    // shuffle and magnifies hot-entity skew.
    "q26_scd2_versions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .select(col("user_id"), col("version"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("version"))
    }),

    // CDC apply (ops/Cdc): collapse a change log into current state —
    // the general row-level form of the reference's one-day upsert
    // (update sql:2-36). The log is derived deterministically from
    // lineitem (linenumber = change sequence; every 11th (key+seq) is a
    // delete). ONE window shuffle on the key; see Cdc.applyLatest for
    // why the join/groupBy formulations lose at scale.
    "q27_cdc_apply" -> ((s, dir) => {
      val log = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        when(pmod(col("l_orderkey") + col("l_linenumber"), lit(11)) === 0, lit("D"))
          .when(col("l_linenumber") === 1, lit("I"))
          .otherwise(lit("U")).as("op"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // the price tiebreak makes the change order total (Cdc contract)
      Cdc.applyLatest(log, "l_orderkey",
          Seq(col("l_linenumber"), col("l_extendedprice")), "op")
        .select(col("l_orderkey"), col("op").as("last_op"),
          round(col("l_extendedprice"), 2).as("last_price"), col("n_changes"))
        .orderBy(col("l_orderkey"))
    }),

    // Co-located bucketed join (ops/Bucketed): both fact tables are
    // materialized once with bucketBy(8, key).sortBy(key), so the
    // repeated fact-fact join plans with NO exchange and NO sort on
    // either side (BucketedJoinSpec asserts the plan). The oracle joins
    // the raw tables — results must be layout-invariant.
    // The layout carries ALL columns (shared with q02b — one bucketed
    // layout per (table, key) serves the whole join workload); the scan
    // prunes to the columns each query touches, so the per-query read
    // cost is unchanged while the layout write is amortized across
    // every orderkey join.
    "q28_bucketed_join" -> ((s, dir) => {
      val li = Bucketed.table(s,
        Bucketed.nameFor(dir, "lineitem", "l_orderkey", 32),
        t(s, dir, "lineitem"), "l_orderkey", buckets = 32)
      val ord = Bucketed.table(s,
        Bucketed.nameFor(dir, "orders", "o_orderkey", 32),
        t(s, dir, "orders"), "o_orderkey", buckets = 32)
      li.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .hint("merge")
        .join(ord.select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sumExact(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
            .as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // Funnel analysis over the event stream: per user, the first view,
    // the first click AFTER that view, the first purchase AFTER that
    // click — the ordered-step conversion measurement every product
    // analytics stack runs. Three aggregates + two joins, ALL keyed on
    // user_id. This shape deliberately trades 3 scans for TINY
    // exchanges: each stage's partial aggregation collapses to ~users
    // rows per partition before its shuffle, so the network cost is
    // O(users), not O(events). The tempting single-shuffle alternative
    // (three chained whole-partition window minima) moves EVERY event
    // row through one full-table exchange and measured 2.5× slower at
    // sf0.1 (1.18s vs 0.46s) — scans are cheap columnar reads; shuffles
    // are the scarce resource. A hot user stays one partition's
    // bounded problem either way.
    "q29_funnel_stages" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def stage(typ: String) = ev
        .filter(col("event_type") === typ)
        .select(col("user_id"), col("ts"))
      val v = stage("view").groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_view"))
      val c = stage("click").join(v, "user_id")
        .filter(col("ts") > col("first_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_click"))
      val p = stage("purchase").join(c, "user_id")
        .filter(col("ts") > col("first_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_purchase"))
      v.join(c.select(col("user_id"), col("first_click")), Seq("user_id"), "left")
        .join(p.select(col("user_id"), col("first_purchase")), Seq("user_id"), "left")
        .select(col("user_id"), col("first_view"), col("first_click"),
          col("first_purchase"),
          (lit(1L) + when(col("first_click").isNotNull, 1L).otherwise(0L)
            + when(col("first_purchase").isNotNull, 1L).otherwise(0L))
            .as("stage_reached"))
        .orderBy(col("user_id"))
    }),

    // Gaps-and-islands: per user, streaks of consecutive active days
    // (distinct activity dates grouped by the date-minus-row_number
    // anchor). One window + one aggregate, both keyed on user_id; the
    // distinct shrinks the stream to ≤ users × days rows first.
    "q30_activity_streaks" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        .withColumn("anchor", date_sub(col("d"), row_number().over(w)))
        .groupBy(col("user_id"), col("anchor"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(sum(col("len")).as("active_days"),
          count(lit(1)).as("n_streaks"),
          max(col("len")).as("longest_streak"))
        .orderBy(col("user_id"))
    }),

    // Event-time RANGE frame (q08 is its ROWS counterpart): per user,
    // the count and sum of events in the trailing hour of EVENT TIME —
    // frame membership follows the timestamp spacing, not row
    // positions, which is the correct trailing-window semantic for
    // irregular streams. Money rides as integer cents so the frame sum
    // is order-independent cross-engine. One window shuffle on
    // user_id; frame evaluation is a per-partition sliding pointer.
    "q31_trailing_hour" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
        .rangeBetween(-3599999999L, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("es"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("trailing_n", count(lit(1)).over(w))
        .withColumn("trailing_cents", sum(col("cents")).over(w))
        .select(col("event_id"), col("user_id"), col("trailing_n"),
          col("trailing_cents"))
        .orderBy(col("event_id"))
    }),

    // §2d grouping sets, CUBE form (q11 is ROLLUP): every subset of the
    // grouping keys in one pass — Catalyst's Expand feeds a single hash
    // aggregate, so the cost is (#grouping sets)× the input rows through
    // ONE shuffle, not one job per breakdown. grouping_id() separates
    // "NULL because aggregated away" from a genuine NULL key.
    "q32_cube_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sumExact(col("l_quantity"), 2).as("qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // Time-series gap fill + LOCF: the daily-per-group series is joined
    // against the full (group × day) spine so missing days materialize,
    // zero-filled for additive measures and last-observation-carried-
    // forward for level measures. Gaps are planted deterministically
    // ((day-of-month + type length) % 7 drops that day's rows). The
    // spine is a broadcast cross of two BOUNDED distincts (groups ×
    // days); the LOCF window shuffles once on the group.
    "q33_gap_fill" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val daily = ev
        .filter(pmod(dayofmonth(col("day")) + length(col("event_type")), lit(7)) =!= 0)
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).as("day_cents"))
      val spine = ev.select(col("event_type")).distinct()
        .crossJoin(ev.select(col("day")).distinct())
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          col("day_cents").isNotNull.as("has_data"),
          coalesce(col("day_cents"), lit(0L)).as("filled_cents"),
          last(col("day_cents"), ignoreNulls = true).over(w).as("locf_cents"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Statistical profiling: Pearson correlation per group from EXACT
    // integer moment sums. The built-in corr() aggregates doubles whose
    // summation order differs across engines/partitionings; here every
    // moment (Σx, Σy, Σxy, Σx², Σy²) accumulates exactly — longs where
    // they fit, DECIMAL(38,0) for Σy² (≈7e19 at sf0.1 overflows a
    // long; DuckDB's HUGEINT sums match it bit-exactly) — and only the
    // final closed form runs in (identically-ordered) double
    // arithmetic. One hash aggregate, map-side combined; the moments
    // also merge across shards by addition, so this is the
    // distributed-safe correlation shape at any scale.
    "q34_exact_corr" -> ((s, dir) => {
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      def d(c: Column) = c.cast("double")
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y").cast(d38) * col("y").cast(d38)).as("syy"))
        .select(col("l_returnflag"), col("n").as("n_items"),
          round(
            (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
              sqrt((d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
                (d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))),
            6).as("corr_qty_price"))
        .orderBy(col("l_returnflag"))
    }),

    // TPC-H Q21's double-correlated-subquery shape (suppliers who were
    // the SOLE problem supplier on a multi-supplier order; "problem" =
    // returned lineitem, this schema's analogue of receipt>commit).
    // The literal formulation — EXISTS(other supplier) AND NOT
    // EXISTS(other problem supplier) — re-joins lineitem twice, i.e.
    // three scans + two extra shuffles of the fact table, and the
    // classic engine-killer is the NOT EXISTS anti join over a hot
    // order. Spark-first reformulation: ONE per-order aggregate
    // (distinct suppliers, distinct problem suppliers) broadcastable
    // back onto the flagged rows — a flagged lineitem qualifies iff
    // its order has >1 supplier and exactly 1 problem supplier (which
    // must then be this one). One pass over lineitem, one small join;
    // the DuckDB ORACLE runs the literal EXISTS/NOT-EXISTS text, so
    // the two formulations cross-check each other row for row.
    //
    // Round-11: the per-order distinct counts moved from two
    // countDistincts — whose Expand doubled the 6M-row stream before
    // its shuffle — to a two-level (order, supplier) → order
    // aggregate; and since n_problem_supps == 1 pins the problem
    // supplier uniquely, the per-order aggregate carries its id and
    // flagged-line count along, so the second lineitem scan and the
    // fact-sized re-join are gone entirely: ONE pass over lineitem,
    // two keyed aggregates, then order-key and supplier joins on the
    // already-small qualifying set.
    "q35_sole_problem_supplier" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val isR = when(col("l_returnflag") === "R", 1L).otherwise(0L)
      val pairAgg = l.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(isR).as("is_problem"), sum(isR).as("problem_lines"))
      val perOrder = pairAgg.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supps"),
          sum(col("is_problem")).as("n_problem_supps"),
          max(when(col("is_problem") === 1, col("l_suppkey")))
            .as("problem_supp"),
          sum(col("problem_lines")).as("n_problem_lines"))
      val fOrders = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      perOrder
        .filter(col("n_supps") > 1 && col("n_problem_supps") === 1)
        .join(fOrders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("problem_supp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("n_problem_lines")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // Interval × interval OVERLAP join — the range×range case q25's
    // point-in-interval join doesn't cover (which sessions ran while
    // which campaign was live). A theta join with no equality
    // predicate is a nested loop; RangeJoin.overlapByBucket turns it
    // into a bucket-id equi-join with both sides replicated to the
    // buckets they span, each overlapping pair emitted exactly once
    // in the first shared bucket (no post-join dedup shuffle). The
    // oracle runs the literal theta-join text as the cross-check.
    "q37_interval_overlap" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val sessions = ev.filter(col("event_id") % 53 === 0)
        .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
          epochMs(col("ts")).as("s_lo"),
          (epochMs(col("ts")) + 1800000L).as("s_hi"))
      val campaigns = ev.filter(col("event_id") % 97 === 0)
        .select(col("event_id").as("c_id"),
          epochMs(col("ts")).as("c_lo"),
          (epochMs(col("ts")) + 7200000L).as("c_hi"))
      graft.ops.RangeJoin.overlapByBucket(sessions, "s_lo", "s_hi",
          campaigns, "c_lo", "c_hi", bucketWidth = 3600000L)
        .groupBy(col("c_id"))
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("s_user")).as("n_users"))
        .orderBy(col("c_id"))
    }),

    // TPC-H Q22's shape (high-balance customers in target nations with
    // no RECENT orders — the "global sales opportunity" report): a
    // scalar subquery threshold + an anti join. Spark-first: the
    // positive-balance average is a 1-row broadcast (computed in exact
    // DECIMAL then rounded, so the threshold compare is bit-stable
    // cross-engine), the inactivity test a broadcast-able LEFT ANTI on
    // o_custkey over the date-filtered orders (the filter pushes into
    // the scan, shrinking the anti side before any shuffle), never a
    // correlated per-row probe. The oracle runs the literal
    // scalar-subquery + NOT EXISTS text as the cross-check.
    "q36_high_balance_inactive" -> ((s, dir) => {
      val nations = Seq("NATION_1", "NATION_3", "NATION_7", "NATION_13",
        "NATION_17", "NATION_19", "NATION_23")
      val target = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name").isin(nations: _*))),
          col("c_nationkey") === col("n_nationkey"))
      val thr = target.filter(col("c_acctbal") > 0)
        .agg(round(sum(col("c_acctbal").cast("decimal(38,8)"))
          .cast("double") / count(lit(1)), 6).as("ab"))
      target.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("ab"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= "2000-01-01"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal").cast("decimal(38,8)")).cast("double"),
            2).as("totacctbal"))
        .orderBy(col("n_name"))
    }),

    // TPC-H Q18's shape (large-volume orders): aggregate the fact table
    // FIRST (one partial-aggregated shuffle on l_orderkey), filter to
    // the rare heavy orders, then join the small survivor set back to
    // orders/customer. Spark-first posture: the qty rollup runs before
    // any join so the join inputs are orders-of-magnitude smaller than
    // lineitem — the equivalent IN-subquery form would shuffle the full
    // fact table into the join. Survivors are few (rare tail of the
    // qty distribution), so both joins broadcast the aggregated side
    // under AQE, never reshuffling orders or customer. Quantity sums
    // accumulate in exact DECIMAL (order-independent) before the
    // threshold compare, so the >250 cut is bit-stable cross-engine.
    "q38_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(38,8)")).as("tq"))
        .filter(col("tq") > 250)
        .select(col("l_orderkey"),
          round(col("tq").cast("double"), 2).as("total_qty"))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q8's shape (market share by supplier nation within a
    // region, per order year): two fact-side equi-joins (lineitem ⋈
    // orders on the order key; lineitem ⋈ supplier on the supp key)
    // with every dimension (supplier's nation, region) broadcast and
    // the region filter applied BEFORE the join so non-ASIA suppliers
    // never enter the shuffle. Revenue accumulates in exact DECIMAL;
    // the per-year share divides two exact decimals as ONE double
    // division (correctly rounded — x66's determinism rule), computed
    // via a year-keyed window over the per-(year, nation) aggregate —
    // a frame of |nations| rows per year, never a second fact pass.
    "q39_market_share" -> ((s, dir) => {
      val suppAsia = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("n_name"))
      val byYearNation = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(suppAsia, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"), col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(38,8)")).as("rev"))
      byYearNation
        .withColumn("year_total", sum(col("rev")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("o_year"))))
        .select(col("o_year"), col("n_name"),
          round(col("rev").cast("double"), 2).as("revenue"),
          round(col("rev").cast("double")
            / col("year_total").cast("double"), 4).as("share"))
        .orderBy(col("o_year"), col("n_name"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,8))) AS DOUBLE), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order,
        |  count(DISTINCT l_orderkey) AS distinct_orders
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-03 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,8))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    // identical SQL to q02: the bucketed layout is a physical design
    // choice — results must be layout-invariant
    "q02b_revenue_bucketed" ->
      """SELECT r_name, n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,8))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q03_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q04_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q05_topk_per_segment" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal
        |FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 3
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q06_topk_orders" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q07_set_ops" ->
      """SELECT 'except' AS op, count(*) AS n FROM (
        |  SELECT DISTINCT c_custkey AS k FROM customer
        |  EXCEPT
        |  SELECT DISTINCT o_custkey AS k FROM orders)
        |UNION ALL
        |SELECT 'intersect' AS op, count(*) AS n FROM (
        |  SELECT DISTINCT c_custkey AS k FROM customer
        |  INTERSECT
        |  SELECT DISTINCT o_custkey AS k FROM orders)
        |ORDER BY op""".stripMargin,

    "q08_running_window" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER w, 2) AS running_total,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  rank() OVER w AS rnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q09_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q10_monthly_events" ->
      """SELECT CAST(date_trunc('month', ts) AS DATE) AS mon, event_type,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE), 2) AS total_value
        |FROM events
        |GROUP BY date_trunc('month', ts), event_type
        |ORDER BY mon, event_type""".stripMargin,

    "q11_rollup_status" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q12_having_above_avg" ->
      """SELECT l_suppkey,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE), 2) AS supp_qty,
        |  count(*) AS n_items
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE), 2) >
        |  (SELECT sum(l_quantity) / count(DISTINCT l_suppkey) FROM lineitem)
        |ORDER BY l_suppkey""".stripMargin,

    "q13_above_avg_parts" ->
      """SELECT p_partkey, p_retailprice
        |FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        |ORDER BY p_partkey""".stripMargin,

    "q23_percentile_stats" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice, o_orderkey) AS BIGINT)
        |      AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, max(n) AS n_orders,
        |  round(max(CASE WHEN rn = floor((n - 1) * 0.5) + 1
        |                 THEN o_totalprice END), 2) AS p50,
        |  round(max(CASE WHEN rn = floor((n - 1) * 0.9) + 1
        |                 THEN o_totalprice END), 2) AS p90,
        |  round(max(CASE WHEN rn = floor((n - 1) * 0.99) + 1
        |                 THEN o_totalprice END), 2) AS p99
        |FROM r GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // Mirrors the union+window formulation rather than DuckDB's native
    // ASOF JOIN, whose equal-timestamp tie choice is unspecified; this
    // SQL is deterministic by construction (tb tie-break). The payload
    // rides as ONE struct through a single last_value(IGNORE NULLS),
    // exactly like AsOfJoin.asOf — all attached columns come from the
    // same latest at-or-before click row.
    "q24_asof_attribution" ->
      """WITH u AS (
        |  SELECT user_id, ts, 1 AS side, NULL::BIGINT AS tb, event_id, value,
        |    NULL::STRUCT(event_id BIGINT, ts TIMESTAMP, value DOUBLE) AS p
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, 0, event_id, NULL, NULL,
        |    struct_pack(event_id := event_id, ts := ts, value := value)
        |  FROM events WHERE event_type = 'click'),
        |w AS (
        |  SELECT user_id, ts, side, event_id, value,
        |    last_value(p IGNORE NULLS) OVER win AS carried
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, tb
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, ts AS purchase_ts,
        |  struct_extract(carried, 'event_id') AS click_id,
        |  struct_extract(carried, 'ts') AS click_ts,
        |  round(value - struct_extract(carried, 'value'), 2) AS uplift
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin,

    "q14_string_projection" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_uc,
        |  substr(p_name, 1, 12) AS name_prefix,
        |  length(p_name) AS name_len,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  CASE WHEN p_size >= 30 THEN 'large'
        |       WHEN p_size >= 10 THEN 'medium'
        |       ELSE 'small' END AS size_class
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q15_regexp_cleanup" ->
      """SELECT o_orderkey,
        |  regexp_replace(
        |    concat('hourly-weather-data-json-19950617-12:34:56_', o_orderpriority),
        |    '-json-\d{8}-\d{2}:\d{2}:\d{2}', '') AS cleaned,
        |  regexp_extract(
        |    concat('hourly-weather-data-json-19950617-12:34:56_', o_orderpriority),
        |    '^([a-z]+)-', 1) AS stem
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q16_base64_roundtrip" ->
      """SELECT p_partkey,
        |  to_base64(encode(p_brand)) AS b64,
        |  decode(from_base64(to_base64(encode(p_brand)))) AS roundtrip
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q17_distinct_pairs" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority
        |FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q18_json_roundtrip" ->
      """SELECT event_id,
        |  json_extract_string(j, '$.event_type') AS rt_type,
        |  round(CAST(json_extract(j, '$.value') AS DOUBLE), 4) AS rt_value
        |FROM (
        |  SELECT event_id,
        |    to_json(struct_pack(event_type := event_type, value := value)) AS j
        |  FROM events)
        |ORDER BY event_id""".stripMargin,

    "q20_salted_skew_join" ->
      """SELECT s_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,8))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin,

    "q22_pivot_events" ->
      """SELECT CAST(date_trunc('month', ts) AS DATE) AS mon,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events
        |GROUP BY 1
        |ORDER BY mon""".stripMargin,

    "q21_bloom_pruned_join" ->
      """SELECT s_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,8))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin,

    // Plain inequality join — DuckDB proves the bucketed equi-join
    // produces exactly the theta-join's rows.
    "q25_range_join" ->
      """WITH iv AS (
        |  SELECT event_id AS interval_id,
        |    epoch_ms(ts) AS lo, epoch_ms(ts) + 7200000 AS hi
        |  FROM events WHERE event_id % 97 = 0)
        |SELECT interval_id,
        |  count(*) AS n_events,
        |  count(DISTINCT e.user_id) AS n_users,
        |  round(CAST(sum(CAST(e.value AS DECIMAL(38,8))) AS DOUBLE), 2)
        |    AS total_value
        |FROM iv JOIN events e
        |  ON epoch_ms(e.ts) >= iv.lo AND epoch_ms(e.ts) <= iv.hi
        |GROUP BY interval_id
        |ORDER BY interval_id""".stripMargin,

    "q19_dispatch" ->
      """SELECT o_orderkey, stem,
        |  'weather-data-hourly' AS target_table
        |FROM (
        |  SELECT o_orderkey,
        |    regexp_replace(
        |      regexp_replace(
        |        (CASE WHEN o_orderkey % 3 = 1 THEN 'unknown-export'
        |              ELSE 'hourly-weather-data' END)
        |          || '-json-19950617-12:34:56.json',
        |        '-json-\d{8}-\d{2}:\d{2}:\d{2}', ''),
        |      '\.[A-Za-z0-9]+$', '') AS stem
        |  FROM orders)
        |WHERE stem = 'hourly-weather-data'
        |ORDER BY o_orderkey""".stripMargin,

    "q26_scd2_versions" ->
      """SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  event_type,
        |  ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  (lead(ts) OVER w IS NULL) AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "q27_cdc_apply" ->
      """WITH log AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    CASE WHEN (l_orderkey + l_linenumber) % 11 = 0 THEN 'D'
        |         WHEN l_linenumber = 1 THEN 'I'
        |         ELSE 'U' END AS op
        |  FROM lineitem),
        |ranked AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY l_orderkey
        |                       ORDER BY l_linenumber DESC,
        |                                l_extendedprice DESC) AS rn,
        |    CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_changes
        |  FROM log)
        |SELECT l_orderkey, op AS last_op,
        |  round(l_extendedprice, 2) AS last_price, n_changes
        |FROM ranked
        |WHERE rn = 1 AND op <> 'D'
        |ORDER BY l_orderkey""".stripMargin,

    "q28_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,8))) AS DOUBLE), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q29_funnel_stages" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS first_view
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS first_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.first_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS first_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        |  GROUP BY e.user_id)
        |SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
        |  CAST(1 + (CASE WHEN c.first_click IS NOT NULL THEN 1 ELSE 0 END)
        |    + (CASE WHEN p.first_purchase IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS stage_reached
        |FROM v
        |LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,

    "q30_activity_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |islands AS (
        |  SELECT user_id, d,
        |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
        |             AS INTEGER) AS anchor
        |  FROM d),
        |streaks AS (
        |  SELECT user_id, anchor, count(*) AS len
        |  FROM islands GROUP BY user_id, anchor)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
        |  count(*) AS n_streaks, max(len) AS longest_streak
        |FROM streaks GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q31_trailing_hour" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS trailing_n,
        |  CAST(sum(cents) OVER w AS BIGINT) AS trailing_cents
        |FROM (
        |  SELECT event_id, user_id, epoch_us(ts) AS es,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q32_cube_summary" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE), 2)
        |    AS qty,
        |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q33_gap_fill" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |daily AS (
        |  SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS day_cents
        |  FROM ev
        |  WHERE (dayofmonth(day) + length(event_type)) % 7 <> 0
        |  GROUP BY event_type, day),
        |spine AS (
        |  SELECT t.event_type, d.day
        |  FROM (SELECT DISTINCT event_type FROM ev) t,
        |       (SELECT DISTINCT day FROM ev) d)
        |SELECT s.event_type, s.day,
        |  (day_cents IS NOT NULL) AS has_data,
        |  COALESCE(day_cents, 0) AS filled_cents,
        |  last_value(day_cents IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_cents
        |FROM spine s LEFT JOIN daily USING (event_type, day)
        |ORDER BY s.event_type, s.day""".stripMargin,

    "q34_exact_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |a AS (
        |  SELECT l_returnflag,
        |    count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM m GROUP BY l_returnflag)
        |SELECT l_returnflag, n AS n_items,
        |  round(
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt(
        |        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
        |    6) AS corr_qty_price
        |FROM a
        |ORDER BY l_returnflag""".stripMargin,

    // Deliberately the LITERAL correlated form — a different
    // formulation than the Spark aggregate rewrite, so agreement is a
    // real semantic cross-check, not the same plan twice.
    "q35_sole_problem_supplier" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,

    "q37_interval_overlap" ->
      """WITH s AS (
        |  SELECT event_id AS s_id, user_id AS s_user,
        |    epoch_ms(ts) AS s_lo, epoch_ms(ts) + 1800000 AS s_hi
        |  FROM events WHERE event_id % 53 = 0),
        |c AS (
        |  SELECT event_id AS c_id,
        |    epoch_ms(ts) AS c_lo, epoch_ms(ts) + 7200000 AS c_hi
        |  FROM events WHERE event_id % 97 = 0)
        |SELECT c_id, count(*) AS n_sessions,
        |  count(DISTINCT s_user) AS n_users
        |FROM s JOIN c ON s_lo <= c_hi AND c_lo <= s_hi
        |GROUP BY c_id ORDER BY c_id""".stripMargin,

    "q36_high_balance_inactive" ->
      """SELECT n_name, count(*) AS numcust,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(38,8))) AS DOUBLE), 2)
        |    AS totacctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1', 'NATION_3', 'NATION_7', 'NATION_13',
        |                 'NATION_17', 'NATION_19', 'NATION_23')
        |  AND c_acctbal > (
        |    SELECT round(CAST(sum(CAST(c2.c_acctbal AS DECIMAL(38,8)))
        |                      AS DOUBLE) / count(*), 6)
        |    FROM customer c2 JOIN nation n2 ON c2.c_nationkey = n2.n_nationkey
        |    WHERE n2.n_name IN ('NATION_1', 'NATION_3', 'NATION_7',
        |                        'NATION_13', 'NATION_17', 'NATION_19',
        |                        'NATION_23')
        |      AND c2.c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q38_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    sum(CAST(l_quantity AS DECIMAL(38,8))) AS tq
        |  FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(38,8))) > 250)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(CAST(tq AS DOUBLE), 2) AS total_qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q39_market_share" ->
      """WITH byyn AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, n_name,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount)
        |             AS DECIMAL(38,8))) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY o_year, n_name)
        |SELECT o_year, n_name,
        |  round(CAST(rev AS DOUBLE), 2) AS revenue,
        |  round(CAST(rev AS DOUBLE)
        |        / CAST(sum(rev) OVER (PARTITION BY o_year) AS DOUBLE), 4)
        |    AS share
        |FROM byyn
        |ORDER BY o_year, n_name""".stripMargin,
  )
}
