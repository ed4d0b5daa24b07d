package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY.md §2-D — aggregation operators.
  *
  * All queries end in a total-order sort with rounded doubles so the
  * driver's DuckDB hash-compare is deterministic (SURVEY §7.4).
  *
  * Scale notes: every aggregation here is a hash aggregate with map-side
  * partial aggregation (Spark plans partial+final automatically); no
  * `collect()` anywhere; grouping keys are low-cardinality so the final
  * shuffle is tiny regardless of input scale.
  */
object Aggregates {

  /** Flagship — TPC-H Q1 pricing summary clone.
    * Reference analog: the daily/char rollups the mu-swarm-logger's
    * triplestore consumers run over collected events (SURVEY §0.5).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Exact distinct users per event type (expand + two-phase agg). */
  def countDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** HLL approximate distinct — the 100 TB substitute for exact distinct.
    * Sketches differ across engines, so the enrolled query emits the
    * VERDICT, not the sketch: both approx and exact are computed in one
    * aggregate and the output row says whether the sketch landed within
    * ±5% of exact. The DuckDB twin emits `true` unconditionally, so a
    * hash match certifies the HLL bound cross-engine. */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_approx"),
        countDistinct(col("user_id")).as("n_users_exact"))
      .select(col("event_type"),
        (abs(col("n_approx") - col("n_users_exact"))
          <= col("n_users_exact") * 0.05).as("within_5pct"),
        col("n_users_exact"))
      .orderBy(col("event_type"))

  /** Re-mergeable HLL sketches (round 4) — the 100 TB pre-aggregation
    * pattern `approx_count_distinct` alone cannot show: per-month
    * `hll_sketch_agg` sketches are built once (in a real pipeline:
    * stored in the daily rollup table), then ANY period rollup is a
    * cheap `hll_union_agg` over the tiny sketch rows — no rescan of the
    * raw fact table. Sketch bits differ across engines, so the enrolled
    * row emits the VERDICT: the merged estimate must land within ±5% of
    * exact (lgK=14 ≈ 0.8% standard error). The DuckDB twin emits `true`
    * unconditionally, so a hash match certifies the bound. */
  def hllMergeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val monthly = orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("mon"))
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
    val merged = monthly
      .groupBy(col("o_orderpriority"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("n_approx"),
        count(lit(1)).as("n_months"))
    val exact = orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    merged.join(broadcast(exact), Seq("o_orderpriority"))
      .select(col("o_orderpriority"),
        (abs(col("n_approx") - col("n_exact"))
          <= col("n_exact") * 0.05).as("within_5pct"),
        col("n_months"), col("n_exact"))
      .orderBy(col("o_orderpriority"))
  }

  /** Key-skew diagnostic (round 4): the measurement that decides
    * whether a join/agg key needs salting BEFORE the job burns a day
    * discovering it — per-key counts, then one summary row: key count,
    * total, the heaviest key's share vs uniform (exact integer
    * arithmetic: max_n·n_keys·10⁴ div total — no float aggregation),
    * and the heaviest key itself (min key among ties, deterministic).
    * Two partial-aggregable passes + broadcast of two one-row frames;
    * at 100 TB the per-key count table is the only shuffle and is
    * exactly the aggregation the downstream job would do anyway. */
  def diagSkew(spark: SparkSession, dir: String): DataFrame = {
    val c = events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val s = c.agg(count(lit(1)).as("n_keys"),
      sum(col("n")).as("total"), max(col("n")).as("max_n"))
    c.join(broadcast(s), col("n") === col("max_n"))
      .agg(min(col("user_id")).as("heavy_key"),
        first(col("n_keys")).as("n_keys"),
        first(col("total")).as("total"),
        first(col("max_n")).as("max_n"))
      .select(col("n_keys"), col("total"), col("max_n"),
        expr("max_n * n_keys * 10000L div total").as("skew_x10000"),
        col("heavy_key"))
  }

  /** Exchange-reuse evidence (J107, round 12): a report that reads the
    * SAME per-type aggregate twice — once as the detail rows, once
    * re-aggregated into the global total for the share column — must
    * pay the corpus shuffle ONCE: Spark's exchange/stage reuse matches
    * the two canonically-equal subtrees and the second branch reads
    * the first's shuffle output. At 100 TB this is the difference
    * between one corpus pass and two for every self-referencing
    * report (share-of-total, top-N + rest, week-over-week) — the
    * scaladocs across the engine cite the property; this row PINS it
    * as data: `exchange_reused` is computed from the executed plan
    * (an AQE run reuses the materialized ShuffleQueryStage — the same
    * stage id appears under both branches; a non-AQE run shows
    * ReusedExchange) and the oracle pins `true`. Detection looks at
    * the FINAL adaptive plan only (the initial-plan echo repeats
    * Exchange nodes textually and would false-positive).
    *
    * Exact BIGINT rollup (count, cents, share×10⁴ truncating div). */
  def diagExchangeReuse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perType = events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
    // The total branch consumes BOTH aggregates: a sum(n)-only total
    // lets ColumnPruning narrow its partial aggregate (count without
    // the cents sum), the two subtrees stop being canonically equal,
    // and reuse silently vanishes while results stay right — measured
    // on enrollment; the cents share is also the more useful report.
    val tot = perType.agg(sum(col("n")).as("tot_n"),
      sum(col("cents")).as("tot_c"))
    val agg = perType.crossJoin(broadcast(tot)) // 1-row total
      .select(col("event_type"), col("n"), col("cents"),
        expr("n * 10000 div tot_n").as("share_e4"),
        expr("cents * 10000 div tot_c").as("cents_share_e4"))
      .orderBy(col("event_type"))
    val rows = agg.collect() // per-type census — control-plane sized
    val finalPlan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val stageIds = "ShuffleQueryStage (\\d+)".r
      .findAllMatchIn(finalPlan).map(_.group(1)).toSeq
    val reused = finalPlan.contains("ReusedExchange") ||
      stageIds.distinct.size < stageIds.size
    rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), reused))
      .toDF("event_type", "n", "cents", "share_e4", "cents_share_e4",
        "exchange_reused")
  }

  /** Shuffle-metrics readout (J108, round 12): the engine's own
    * SQLMetrics as queryable data — after running the per-type
    * census, read the aggregate exchange's `shuffleRecordsWritten` /
    * `shuffleBytesWritten` accumulators off the executed plan (walking
    * INTO the AQE query stages) and emit the operational verdicts a
    * 100 TB job owner actually checks: map-side combine WORKED
    * (records shuffled ≤ a small multiple of the group count, never
    * the input count — the partial-agg contract every census row in
    * this engine relies on) and bytes are positive (the metric is
    * real, not defaulted). The observability twin of q_diag_skew:
    * that row measures the DATA's shape, this one the ENGINE's.
    *
    * records_bounded uses n_groups · numMappers read off the exchange
    * itself (each map partition emits at most one partial row per
    * group) — a literal ceiling (32, round 12) went stale the moment a
    * fixture's scan split into more map tasks than the constant. */
  def diagShuffleMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      .orderBy(col("event_type"))
    val rows = agg.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(walk)) ++ (p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => Seq.empty
      })
    val hashShuffles = walk(agg.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if s.outputPartitioning.toString.contains("event_type") => s
    }
    val recs = hashShuffles.headOption
      .map(_.metrics("shuffleRecordsWritten").value).getOrElse(-1L)
    val bytes = hashShuffles.headOption
      .map(_.metrics("shuffleBytesWritten").value).getOrElse(-1L)
    val nGroups = rows.length.toLong
    val nMappers = hashShuffles.headOption
      .map(_.numMappers.toLong).getOrElse(0L)
    val recsBounded =
      recs >= nGroups && nMappers > 0 && recs <= nGroups * nMappers
    rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        recsBounded, bytes > 0L))
      .toDF("event_type", "n_rows", "cents", "combine_worked",
        "bytes_positive")
  }

  /** Observation-API pipeline telemetry (J111, round 12): the
    * `df.observe()` surface — EXACT pre-filter input metrics collected
    * DURING the one pass the query already makes (CollectMetricsExec
    * rides the plan; no second scan, no sampling), read back through
    * `Observation.get` after the action. This is how a 100 TB curation
    * pipeline reports its own selectivity for free: the keep-gate row
    * emits the kept census, and the observed (n_in, cents_in) columns
    * say what it was cut FROM — the number every data-quality
    * dashboard wants and a naive implementation pays a second corpus
    * pass for. Oracle replays both the kept census and the observed
    * totals exactly (they are exact counts, not estimates). */
  def diagObserve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation()
    val agg = events(spark, dir)
      .observe(obs, count(lit(1)).as("n_in"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .as("cents_in"))
      .filter(col("value") >= 1.0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .as("cents_kept"))
      .orderBy(col("event_type"))
    val rows = agg.collect()
    val m = obs.get // blocks until the action above completes
    val nIn = m("n_in").asInstanceOf[Long]
    val cIn = m("cents_in").asInstanceOf[Long]
    rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        nIn, cIn))
      .toDF("event_type", "n_kept", "cents_kept", "n_in", "cents_in")
  }

  /** listagg WITHIN GROUP + mode (J116, round 12): the two Spark-4
    * ordered-aggregate surfaces the suite lacked. `listagg(DISTINCT x,
    * ',') WITHIN GROUP (ORDER BY x)` is the report-friendly string
    * fold — the WITHIN GROUP clause is what makes it deterministic and
    * therefore oracle-comparable (an unordered listagg hash-diverges
    * by partition order; the engine-side discipline this suite's
    * collect_sorted row hand-rolled with array_join(sort_array(...))
    * now has a direct SQL spelling). `mode()` is enrolled on a column
    * whose mode is UNIQUE by construction (l_linenumber = 1 leads
    * every group — TPC-H orders have 1-7 lines, so line 1 always
    * exists; tie-handling differs across engines and would not be a
    * fair pin). Partial-aggregable both: listagg merges sorted lists,
    * mode merges count maps. */
  def aggListaggMode(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("listagg(DISTINCT l_linestatus, ',')" +
          " WITHIN GROUP (ORDER BY l_linestatus)").as("statuses"),
        expr("CAST(mode(l_linenumber) AS BIGINT)").as("mode_line"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** ROLLUP with grouping() indicator columns (cast int for parity). */
  def rollupQty(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** CUBE over (event_type, day). */
  def cubeEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      .cube(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"),
        grouping(col("event_type")).cast("int").as("g_type"),
        grouping(col("day")).cast("int").as("g_day"))
      .orderBy(col("g_type"), col("g_day"),
        col("event_type").asc_nulls_first, col("day").asc_nulls_first)

  /** Explicit GROUPING SETS ((type),(day),()) via SQL. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    events(spark, dir)
      .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      .createOrReplaceTempView("graft_events_gs")
    spark.sql(
      """SELECT event_type, day, count(*) AS n,
        |  CAST(grouping(event_type) AS INT) AS g_type,
        |  CAST(grouping(day) AS INT) AS g_day
        |FROM graft_events_gs
        |GROUP BY GROUPING SETS ((event_type), (day), ())
        |ORDER BY g_type, g_day, event_type ASC NULLS FIRST,
        |  day ASC NULLS FIRST""".stripMargin)
  }

  /** Deterministic collected list: sorted orderkeys per customer,
    * serialized to a CSV string — the driver comparator hashes scalar
    * cells, so the list is emitted as its canonical string form. */
  def collectSorted(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",")
        .as("orderkeys"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"))

  /** Exact median (interpolated) per order priority. */
  def medianPrice(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** HAVING: event types with at least 10 distinct users. */
  def havingDistinct(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .filter(col("n_users") >= 10)
      .orderBy(col("event_type"))

  /** max_by with explicit tie-break: event_type of each user's
    * highest-(value, event_id) event. */
  def minmaxBy(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        max_by(col("event_type"), struct(col("value"), col("event_id")))
          .as("top_type"),
        round(max(col("value")), 2).as("top_value"))
      .orderBy(col("user_id"))

  /** Salted two-phase aggregation — the skew pattern for hot grouping
    * keys at 100 TB: phase 1 aggregates (key, salt) partials so no
    * single reducer owns a hot key; phase 2 combines the ≤SALT partials
    * per key. Result is identical to the direct groupBy (sum/count are
    * associative); only the shuffle distribution changes. */
  def saltedTwoPhase(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n"), round(sum(col("pv")), 2).as("sum_value"))
      .orderBy(col("user_id"))

  /** Bounded-memory exact top-k values per group via the custom
    * TypedImperativeAggregate (graft.functions.TopKDoubles): O(k) state
    * per group instead of collect-the-whole-group, map-side combinable. */
  def topkValues(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.TopKAgg.register(spark)
    // Output serialized as CSV of DECIMAL(18,2) strings: decimal casts
    // render identically in Spark and DuckDB (no float-repr drift), so
    // the driver's hash compare works on the scalar cell.
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("array_join(transform(topk_vals(value, 5)," +
        " x -> cast(round(x, 2) as decimal(18,2))), ',')").as("top_values"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Approximate percentiles (GK sketch) — the 100 TB substitute for the
    * exact sort-based percentile. Verdict-column oracle: the enrolled
    * query computes BOTH the sketch quartiles and the exact interpolated
    * quartiles and emits whether every sketch value is within 5% of
    * exact; the DuckDB twin emits `true`, so a hash match certifies the
    * sketch bound cross-engine. */
  def approxPercentile(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 1000)")
        .as("aq"),
        expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("eq"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        expr("forall(zip_with(aq, eq, (a, e) -> abs(a - e) <= 0.05 * abs(e))," +
          " x -> x)").as("within_5pct"),
        col("n"))
      .orderBy(col("o_orderpriority"))

  /** Stratified sampling by language (seeded, training-data pipeline
    * staple). Sampling RNGs differ across engines, so the enrolled query
    * emits the VERDICT: per-stratum realized rate within 3σ of the
    * target rate (binomial σ = sqrt(p(1-p)/n)). The DuckDB twin emits
    * `true` with the same exact per-stratum totals; a hash match
    * certifies both the totals and the sampler's statistical contract.
    * Seeded determinism itself is ScalaTest-asserted. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rates = Map("en" -> 0.5, "fr" -> 0.2, "es" -> 0.2, "zh" -> 0.1,
      "de" -> 0.1)
    val docs = documents(spark, dir)
    val sampled = docs.stat.sampleBy("lang", rates, 42L)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
    val totals = docs.filter(col("lang").isin(rates.keys.toSeq: _*))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val rateCol = rates.foldLeft(lit(null).cast("double")) {
      case (acc, (k, v)) => when(col("lang") === k, lit(v)).otherwise(acc)
    }
    totals.join(sampled, Seq("lang"), "left")
      .withColumn("n_sampled", coalesce(col("n_sampled"), lit(0L)))
      .withColumn("rate", rateCol)
      .select(col("lang"),
        (abs(col("n_sampled") / col("n_total") - col("rate"))
          <= lit(3.0) * sqrt(col("rate") * (lit(1.0) - col("rate"))
            / col("n_total"))).as("within_3sigma"),
        col("n_total"))
      .orderBy(col("lang"))
  }

  /** Numeric histogram via width_bucket (round 2): fixed-width bucket
    * assignment + per-bucket count/avg — the single-pass histogram shape
    * (7 buckets on an irrational-ish width so 2-decimal data never
    * lands on a boundary; the oracle reproduces Spark's exact
    * floor((v - lo) / ((hi - lo) / n)) + 1 arithmetic IEEE-identically,
    * including the out-of-range clamps to bucket 0 and n+1). */
  def histBucket(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("bucket", expr("width_bucket(value, 0.0, 500.0, 7)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_v"))
      .orderBy(col("bucket"))

  /** Statistical aggregate family (round 2): stddev/variance/corr/covar
    * — all single-pass partial+final hash aggregates (Welford-style
    * merge), no second scan. Skewness/kurtosis are deliberately absent:
    * Spark computes population moments, DuckDB sample-corrected ones, so
    * no cross-engine oracle exists. */
  def statsFamily(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_extendedprice")), 4).as("var_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
          .as("covar_qty_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Conditional / boolean aggregates: count_if + bool_and/bool_or. */
  def condBoolAggs(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("count_if(value > 100)").as("n_big"),
        expr("bool_and(value >= 0)").as("all_nonneg"),
        expr("bool_or(value > 900)").as("any_huge"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Bitwise aggregates over ids (feature-mask folding at scale). */
  def bitwiseAggs(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("bit_and(event_id)").as("band"),
        expr("bit_or(event_id)").as("bor"),
        expr("bit_xor(event_id)").as("bxor"))
      .orderBy(col("event_type"))

  /** Exact central moments per event_type (the skew/kurtosis audit in
    * pure BIGINT): two passes — integer-dollar mean, then Σ(x−μ)²/³/⁴
    * of the centered values — plus the excess-kurtosis-style ratio
    * (m4 div n)·10⁴ div (m2 div n)², whose operands are all
    * nonnegative (engine-agreement zone). m3 is emitted RAW (it is
    * signed; no division touches it — the assortativity discipline).
    *
    * Overflow bound: |x−μ| ≤ 500 dollars ⇒ c⁴ ≤ 6.25·10¹⁰, so Σc⁴
    * stays under 2⁶³ through ~10⁸ rows per type (≈sf20 per type);
    * beyond that the same plan runs on per-partition partial sums with
    * a documented rescale — the salted-two-phase-agg lemma.
    *
    * Shape: one groupBy for μ (|types| rows, broadcast back), one
    * partial-aggregable centered-moment groupBy. Float moments would
    * depend on Spark's aggregation order; integer moments cannot. */
  def momentsAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("event_type"),
      expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 100").as("d"))
    val mu = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("s"))
      .withColumn("mu", expr("s div n"))
      .select(col("event_type"), col("n"), col("mu"))
    ev.join(broadcast(mu), "event_type")
      .withColumn("c", col("d") - col("mu"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("mu")).as("mu_dollars"),
        sum(col("c") * col("c")).as("m2"),
        sum(col("c") * col("c") * col("c")).as("m3"),
        sum(col("c") * col("c") * col("c") * col("c")).as("m4"))
      .withColumn("kurt_e4", expr(
        "(m4 div n) * 10000 div greatest((m2 div n) * (m2 div n), 1)"))
      .orderBy(col("event_type"))
  }

  /** HLL set-ALGEBRA beyond union (round 8): estimate the
    * INTERSECTION of two user cohorts per event_type by
    * inclusion–exclusion over sketches — |A∩B| ≈ est(A) + est(B) −
    * est(A∪B), with A/B = even/odd-epoch-day actives and the union
    * estimated from `hll_union` of the two per-cohort sketches (the
    * sketch-algebra step — NOT a rescan). This is the overlap/audience
    * question (retention, cross-feature reach) that raw
    * approx_count_distinct cannot answer, and the reason rollup tables
    * store sketches rather than numbers.
    *
    * Verdict-row convention (the hll_merge pattern): sketch bits differ
    * across engines, so the enrolled columns are the EXACT census plus
    * a bound check the oracle emits as literal `true` — a hash match
    * certifies |est − exact| ≤ max(5%, 20). Inclusion–exclusion sums
    * three ±0.8% (lgK=14) estimates, so the slack is 5% + a small-count
    * absolute floor.
    *
    * Shape: sketches are one partial-aggregable pass (conditional
    * NULL-masked inputs — agg skips NULLs); the exact side is the
    * two-level (type, user) census. Both are single-shuffle. */
  def hllIntersect(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .withColumn("day", expr("(ts_ns div 1000) div 86400000000"))
      .withColumn("u_even", when(col("day") % 2 === 0, col("user_id")))
      .withColumn("u_odd", when(col("day") % 2 === 1, col("user_id")))
    val sk = ev.groupBy(col("event_type")).agg(
      expr("hll_sketch_estimate(hll_sketch_agg(u_even, 14))").as("est_a"),
      expr("hll_sketch_estimate(hll_sketch_agg(u_odd, 14))").as("est_b"),
      expr("hll_sketch_estimate(hll_union(hll_sketch_agg(u_even, 14)," +
        " hll_sketch_agg(u_odd, 14)))").as("est_u"))
    val ex = ev.groupBy(col("event_type"), col("user_id"))
      .agg(max(when(col("day") % 2 === 0, 1L).otherwise(0L)).as("a"),
        max(when(col("day") % 2 === 1, 1L).otherwise(0L)).as("b"))
      .groupBy(col("event_type"))
      .agg(sum(col("a")).as("n_even_exact"),
        sum(col("b")).as("n_odd_exact"),
        sum(when(col("a") === 1L && col("b") === 1L, 1L).otherwise(0L))
          .as("n_inter_exact"))
    sk.join(broadcast(ex), Seq("event_type"))
      .select(col("event_type"),
        (abs(col("est_a") + col("est_b") - col("est_u")
          - col("n_inter_exact"))
          <= greatest(expr("n_inter_exact div 20"), lit(20L)))
          .as("within_5pct"),
        col("n_even_exact"), col("n_odd_exact"), col("n_inter_exact"))
      .orderBy(col("event_type"))
  }

  /** Weighted percentiles (round 8): the quantity-weighted p25/50/75
    * of the unit price per return flag — "the price a MEDIAN UNIT
    * shipped at", not the median line item (a 50-unit line should
    * count 50×; the unweighted median row already exists as
    * q_agg_median). Exact by the distribution-counting discipline:
    * fold weights per distinct cent value, one running-weight window
    * per group, cut points via integer cross-multiplication
    * (4·cw ≥ tw etc. — no division at all).
    *
    * Shape: value-support fold (partial-aggregable) → one support-
    * sized window per group → 3-cut fold. */
  def weightedPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
          .as("c"),
        expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("w"))
      .groupBy(col("flag"), col("c")).agg(sum(col("w")).as("w"))
    val byFlag = Window.partitionBy(col("flag"))
    g.withColumn("cw", sum(col("w")).over(byFlag.orderBy(col("c"))))
      .withColumn("tw", sum(col("w")).over(byFlag))
      .groupBy(col("flag"))
      .agg(max(col("tw")).as("total_weight"),
        min(when(expr("4 * cw >= tw"), col("c"))).as("wp25_c"),
        min(when(expr("2 * cw >= tw"), col("c"))).as("wp50_c"),
        min(when(expr("4 * cw >= 3 * tw"), col("c"))).as("wp75_c"))
      .orderBy(col("flag"))
  }

  /** Geometric vs arithmetic mean (round 8): per source, the quality
    * score's AM (e4) and log-GM (Σ lnE3(s) div n, e3 log-space — the
    * exact-components discipline: GM itself is irrational, its LOG is
    * a lnE3 sum both engines replay). GM is the right mean for
    * ratio-like scores (one near-zero doc drags GM, barely moves AM —
    * exactly the sensitivity a curation dashboard wants); the AM ≥ GM
    * inequality is pinned in BatchSpec as the cross-check.
    *
    * Shape: score scan → one partial-aggregable per-source fold. */
  def geoMean(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(col("doc_id"), col("source"))
      .join(ModelPrep.qualityLogreg(spark, dir)
        .select(col("doc_id"),
          expr("CAST(floor(score * 10000 + 0.5) AS BIGINT)").as("s")),
        "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(s) div count(1)").as("am_e4"),
        expr("""sum(CAST(floor(ln(s) * 1000 + 0.5) AS BIGINT))
          | div count(1)""".stripMargin).as("log_gm_e3"))
      .orderBy(col("source"))

  /** grouping_id semantics (J65): the CUBE family's missing
    * introspection column — per (returnflag, linestatus) cube cell,
    * the standard bitmask grouping_id (left column = MSB, the SQL
    * convention both engines share) plus the per-column grouping
    * flags, so a consumer can distinguish "NULL because subtotal"
    * from "NULL because the data is NULL" — the question every
    * rollup report hits. Keys are coalesced to 'ALL' sentinels for a
    * deterministic total order.
    *
    * Shape: one cube over two low-cardinality keys — partial-
    * aggregable expansion, 16 result rows. */
  def groupingIdCube(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(grouping_id() AS BIGINT)").as("gid"),
        expr("CAST(grouping(l_returnflag) AS BIGINT)").as("g_flag"),
        expr("CAST(grouping(l_linestatus) AS BIGINT)").as("g_status"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("gid"), col("g_flag"), col("g_status"))
      .orderBy(col("gid"), col("returnflag"), col("linestatus"))

  /** Mergeable-moments proof (J73): per event type, the scaled second
    * central moment n·M2 = n·Σc² − (Σc)² computed along TWO genuinely
    * different paths — a direct whole-group fold, and a two-level
    * fold that first aggregates user-parity CHUNKS and then merges
    * the chunk sums — emitted side by side with the hash-gated
    * equality flag. This is the partial-aggregation contract the
    * whole engine rests on (map-side combine ≡ whole fold), turned
    * into data: in INTEGER arithmetic merge order cannot change the
    * answer, which is exactly why every exactness-critical row in the
    * suite quantizes before folding (floats would not satisfy this
    * row). Products in the DECIMAL(38,0)/HUGEINT lane.
    *
    * Shape: one direct fold + one two-level fold, 5-row join. */
  def momentsMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"),
        expr("CAST(user_id % 2 AS INT)").as("chunk"))
    def nm2 = expr("""CAST(CAST(n AS DECIMAL(38,0)) * ss
      | - CAST(s AS DECIMAL(38,0)) * s AS BIGINT)""".stripMargin)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(expr("c * c")).as("ss"))
      .select(col("event_type"), col("n"), nm2.as("n_m2_direct"))
    val merged = ev.groupBy(col("event_type"), col("chunk"))
      .agg(count(lit(1)).as("cn"), sum(col("c")).as("cs"),
        sum(expr("c * c")).as("css"))
      .groupBy(col("event_type"))
      .agg(sum(col("cn")).as("n"), sum(col("cs")).as("s"),
        sum(col("css")).as("ss"),
        max(when(col("chunk") === 0, col("cn"))).as("na"),
        max(when(col("chunk") === 1, col("cn"))).as("nb"))
      .select(col("event_type"), col("na"), col("nb"),
        nm2.as("n_m2_merged"))
    direct.join(merged, "event_type")
      .select(col("event_type"), col("n"), col("na"), col("nb"),
        col("n_m2_direct"), col("n_m2_merged"),
        (col("n_m2_direct") === col("n_m2_merged")).as("merge_exact"))
      .orderBy(col("event_type"))
  }

  /** Exact 10% trimmed mean per order priority (J80, round 10): drop
    * the k = n div 10 cheapest AND dearest orders, mean the middle —
    * the robust-location companion of q_agg_winsorized (winsorize
    * CLAMPS the tails into the estimate, trim EXCLUDES them; both
    * standard, answering different contamination models — reporting
    * both is how a pipeline localizes whether tails are heavy or
    * merely present). Computed by HISTOGRAM ALGEBRA over the cents
    * value census, never a corpus sort: a value run with cumulative
    * range (cum−cnt, cum] contributes
    * mult = max(min(cum, n−k) − max(cum−cnt, k), 0) copies to the
    * trimmed sum — the winsorized/gini census discipline.
    *
    * Exactness: cents money idiom; both means are nonnegative
    * truncating divs (Spark div ≡ DuckDB //).
    *
    * Shape (100 TB): one partial-aggregable (priority, cents) census;
    * the window rides DISTINCT values per group (domain-bounded, the
    * quartiles_disc discipline); output is |priorities| rows. */
  def trimmedMean(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byP = Window.partitionBy(col("o_orderpriority"))
    val hist = orders(spark, dir)
      .select(col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
          .as("cents"))
      .groupBy(col("o_orderpriority"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    hist
      .withColumn("cum",
        sum(col("cnt")).over(byP.orderBy(col("cents"))))
      .withColumn("n", sum(col("cnt")).over(byP))
      .withColumn("k", expr("n div 10"))
      .withColumn("mult", expr(
        "greatest(least(cum, n - k) - greatest(cum - cnt, k), 0)"))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n"), max(col("k")).as("n_trim"),
        expr("sum(cents * cnt) div max(n)").as("mean_cents"),
        expr("sum(cents * mult) div greatest(max(n) - 2 * max(k), 1)")
          .as("trimmed_mean_cents"))
      .orderBy(col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_trimmed_mean" -> trimmedMean,
    "q_agg_moments_merge" -> momentsMerge,
    "q_agg_grouping_id" -> groupingIdCube,
    "q_agg_geomean" -> geoMean,
    "q_agg_weighted_median" -> weightedPercentiles,
    "q_agg_hll_intersect" -> hllIntersect,
    "q_agg_moments" -> momentsAgg,
    "q_agg_hist_bucket" -> histBucket,
    "q_agg_stats_family" -> statsFamily,
    "q_agg_cond_bool" -> condBoolAggs,
    "q_agg_bitwise" -> bitwiseAggs,
    "q_agg_pricing_summary" -> pricingSummary,
    "q_agg_salted_two_phase" -> saltedTwoPhase,
    "q_agg_topk_values" -> topkValues,
    "q_agg_approx_percentile" -> approxPercentile,
    "q_llm_stratified_sample" -> stratifiedSample,
    "q_agg_count_distinct" -> countDistinctUsers,
    "q_agg_approx_distinct" -> approxDistinctUsers,
    "q_agg_hll_merge" -> hllMergeCustomers,
    "q_diag_skew" -> diagSkew,
    "q_diag_exchange_reuse" -> diagExchangeReuse,
    "q_diag_observe" -> diagObserve,
    "q_agg_listagg_mode" -> aggListaggMode,
    "q_diag_shuffle_metrics" -> diagShuffleMetrics,
    "q_agg_rollup" -> rollupQty,
    "q_agg_cube" -> cubeEvents,
    "q_agg_grouping_sets" -> groupingSets,
    "q_agg_collect_sorted" -> collectSorted,
    "q_agg_median" -> medianPrice,
    "q_agg_having" -> havingDistinct,
    "q_agg_minmax_by" -> minmaxBy,
  )

  val oracle: Map[String, String] = Map(
    "q_agg_trimmed_mean" ->
      """WITH hist AS (SELECT o_orderpriority,
        |   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |   CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |w AS (SELECT o_orderpriority, cents, cnt,
        |   sum(cnt) OVER (PARTITION BY o_orderpriority
        |     ORDER BY cents) AS cum,
        |   sum(cnt) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM hist),
        |m AS (SELECT o_orderpriority, cents, cnt, cum, n, n // 10 AS k
        |  FROM w)
        |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
        | CAST(max(k) AS BIGINT) AS n_trim,
        | CAST(sum(cents * cnt) // max(n) AS BIGINT) AS mean_cents,
        | CAST(sum(cents * greatest(least(cum, n - k)
        |     - greatest(cum - cnt, k), 0))
        |   // greatest(max(n) - 2 * max(k), 1) AS BIGINT)
        |   AS trimmed_mean_cents
        |FROM m GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_agg_moments_merge" ->
      """WITH ev AS (SELECT event_type,
        |   CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
        |   CAST(user_id % 2 AS INT) AS chunk FROM events),
        |direct AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |   CAST(sum(c) AS BIGINT) AS s,
        |   CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM ev GROUP BY 1),
        |d2 AS (SELECT event_type, n,
        |   CAST(CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s
        |     AS BIGINT) AS n_m2_direct FROM direct),
        |ch AS (SELECT event_type, chunk,
        |   CAST(count(*) AS BIGINT) AS cn,
        |   CAST(sum(c) AS BIGINT) AS cs,
        |   CAST(sum(c * c) AS BIGINT) AS css
        |  FROM ev GROUP BY 1, 2),
        |mg AS (SELECT event_type, CAST(sum(cn) AS BIGINT) AS n,
        |   CAST(sum(cs) AS BIGINT) AS s,
        |   CAST(sum(css) AS BIGINT) AS ss,
        |   CAST(max(CASE WHEN chunk = 0 THEN cn END) AS BIGINT)
        |     AS na,
        |   CAST(max(CASE WHEN chunk = 1 THEN cn END) AS BIGINT)
        |     AS nb
        |  FROM ch GROUP BY 1),
        |m2 AS (SELECT event_type, na, nb,
        |   CAST(CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s
        |     AS BIGINT) AS n_m2_merged FROM mg)
        |SELECT d2.event_type, n, na, nb, n_m2_direct, n_m2_merged,
        | n_m2_direct = n_m2_merged AS merge_exact
        |FROM d2 JOIN m2 ON d2.event_type = m2.event_type
        |ORDER BY d2.event_type""".stripMargin,
    "q_agg_grouping_id" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        | CAST(grouping(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,
    "q_agg_geomean" -> {
      s"""WITH ${ModelPrep.scoreCte},
         |s1 AS (SELECT d.source,
         |   CAST(floor(sc0.score * 10000 + 0.5) AS BIGINT) AS s
         |  FROM documents d JOIN sc0 ON sc0.doc_id = d.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(s) // count(*) AS BIGINT) AS am_e4,
         |  CAST(sum(CAST(floor(ln(s) * 1000 + 0.5) AS BIGINT))
         |    // count(*) AS BIGINT) AS log_gm_e3
         |FROM s1 GROUP BY 1 ORDER BY source""".stripMargin
    },
    "q_agg_weighted_median" ->
      """WITH v AS (SELECT l_returnflag AS flag,
        |   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
        |   CAST(floor(l_quantity + 0.5) AS BIGINT) AS w
        |  FROM lineitem),
        |g AS (SELECT flag, c, sum(w) AS w FROM v GROUP BY 1, 2),
        |r AS (SELECT flag, c, w,
        |   sum(w) OVER (PARTITION BY flag ORDER BY c) AS cw,
        |   sum(w) OVER (PARTITION BY flag) AS tw
        |  FROM g)
        |SELECT flag, CAST(max(tw) AS BIGINT) AS total_weight,
        |  CAST(min(CASE WHEN 4 * cw >= tw THEN c END) AS BIGINT)
        |    AS wp25_c,
        |  CAST(min(CASE WHEN 2 * cw >= tw THEN c END) AS BIGINT)
        |    AS wp50_c,
        |  CAST(min(CASE WHEN 4 * cw >= 3 * tw THEN c END) AS BIGINT)
        |    AS wp75_c
        |FROM r GROUP BY flag ORDER BY flag""".stripMargin,
    "q_agg_hll_intersect" ->
      """WITH ev AS (SELECT event_type, user_id,
        |   epoch_us(ts) // 86400000000 AS day FROM events),
        |b AS (SELECT event_type, user_id,
        |   max(CASE WHEN day % 2 = 0 THEN 1 ELSE 0 END) AS a,
        |   max(CASE WHEN day % 2 = 1 THEN 1 ELSE 0 END) AS bb
        |  FROM ev GROUP BY 1, 2)
        |SELECT event_type, true AS within_5pct,
        | CAST(sum(a) AS BIGINT) AS n_even_exact,
        | CAST(sum(bb) AS BIGINT) AS n_odd_exact,
        | CAST(sum(CASE WHEN a = 1 AND bb = 1 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_inter_exact
        |FROM b GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_moments" ->
      """WITH ev AS (SELECT event_type,
        |   CAST(floor(value * 100 + 0.5) AS BIGINT) // 100 AS d
        |  FROM events),
        |mu AS (SELECT event_type, count(*) AS n,
        |   sum(d) // count(*) AS mu
        |  FROM ev GROUP BY event_type),
        |c AS (SELECT ev.event_type, mu.n, mu.mu, ev.d - mu.mu AS c
        |  FROM ev JOIN mu USING (event_type))
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        | CAST(max(mu) AS BIGINT) AS mu_dollars,
        | CAST(sum(c * c) AS BIGINT) AS m2,
        | CAST(sum(c * c * c) AS BIGINT) AS m3,
        | CAST(sum(c * c * c * c) AS BIGINT) AS m4,
        | CAST((CAST(sum(c * c * c * c) AS BIGINT) // max(n)) * 10000
        |   // greatest((CAST(sum(c * c) AS BIGINT) // max(n))
        |     * (CAST(sum(c * c) AS BIGINT) // max(n)), 1) AS BIGINT)
        |   AS kurt_e4
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_hist_bucket" ->
      """SELECT CAST(CASE WHEN value < 0.0 THEN 0
        |   WHEN value >= 500.0 THEN 8
        |   ELSE floor((value - 0.0) / ((500.0 - 0.0) / 7)) + 1 END
        |   AS BIGINT) AS bucket,
        | count(*) AS n, round(avg(value), 4) AS avg_v
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_agg_stats_family" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_extendedprice), 4) AS sd_price,
        | round(var_samp(l_extendedprice), 4) AS var_price,
        | round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 4)
        |   AS covar_qty_price,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_cond_bool" ->
      """SELECT event_type,
        | count(*) FILTER (WHERE value > 100) AS n_big,
        | bool_and(value >= 0) AS all_nonneg,
        | bool_or(value > 900) AS any_huge,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_bitwise" ->
      """SELECT event_type,
        | bit_and(event_id) AS band, bit_or(event_id) AS bor,
        | bit_xor(event_id) AS bxor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_topk_values" ->
      """SELECT event_type,
        | array_to_string(list_transform(list_sort(list(value), 'DESC')[1:5],
        |   x -> CAST(round(x, 2) AS DECIMAL(18,2))), ',') AS top_values,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_approx_distinct" ->
      """SELECT event_type, true AS within_5pct,
        | count(DISTINCT user_id) AS n_users_exact
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_listagg_mode" ->
      """SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
        |    AS statuses,
        |  CAST(mode(l_linenumber) AS BIGINT) AS mode_line,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_diag_observe" ->
      """WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n_in,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS cents_in FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
        | CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |   AS BIGINT) AS cents_kept,
        | tot.n_in, tot.cents_in
        |FROM events CROSS JOIN tot WHERE value >= 1.0
        |GROUP BY event_type, tot.n_in, tot.cents_in
        |ORDER BY event_type""".stripMargin,
    "q_diag_exchange_reuse" ->
      """WITH t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS cents
        | FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot_n,
        |  CAST(sum(cents) AS BIGINT) AS tot_c FROM t)
        |SELECT t.event_type, t.n, t.cents,
        | CAST(t.n * 10000 // tot.tot_n AS BIGINT) AS share_e4,
        | CAST(t.cents * 10000 // tot.tot_c AS BIGINT) AS cents_share_e4,
        | true AS exchange_reused
        |FROM t CROSS JOIN tot ORDER BY t.event_type""".stripMargin,
    "q_diag_shuffle_metrics" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |   AS BIGINT) AS cents,
        | true AS combine_worked, true AS bytes_positive
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_diag_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |s AS (SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS total,
        |       max(n) AS max_n FROM c)
        |SELECT n_keys, total, max_n,
        | CAST(max_n * n_keys * 10000 // total AS BIGINT) AS skew_x10000,
        | (SELECT min(user_id) FROM c WHERE n = (SELECT max_n FROM s))
        |   AS heavy_key
        |FROM s""".stripMargin,
    "q_agg_hll_merge" ->
      """SELECT o_orderpriority, true AS within_5pct,
        | count(DISTINCT date_trunc('month', o_orderdate)) AS n_months,
        | count(DISTINCT o_custkey) AS n_exact
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_agg_approx_percentile" ->
      """SELECT o_orderpriority, true AS within_5pct, count(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_llm_stratified_sample" ->
      """SELECT lang, true AS within_3sigma, count(*) AS n_total
        |FROM documents WHERE lang IN ('de', 'en', 'es', 'fr', 'zh')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_agg_salted_two_phase" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n,
        | CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        | CAST(grouping(l_linestatus) AS INTEGER) AS g_status
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag ASC NULLS FIRST,
        | l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        | count(*) AS n, round(sum(value), 2) AS sum_value,
        | CAST(grouping(event_type) AS INTEGER) AS g_type,
        | CAST(grouping(date_trunc('day', ts)) AS INTEGER) AS g_day
        |FROM events GROUP BY CUBE (event_type, date_trunc('day', ts))
        |ORDER BY g_type, g_day, event_type ASC NULLS FIRST,
        | day ASC NULLS FIRST""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        | count(*) AS n,
        | CAST(grouping(event_type) AS INTEGER) AS g_type,
        | CAST(grouping(date_trunc('day', ts)) AS INTEGER) AS g_day
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
        |ORDER BY g_type, g_day, event_type ASC NULLS FIRST,
        | day ASC NULLS FIRST""".stripMargin,
    "q_agg_collect_sorted" ->
      """SELECT o_custkey,
        | array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_agg_median" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        | count(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_agg_having" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type
        |HAVING count(DISTINCT user_id) >= 10
        |ORDER BY event_type""".stripMargin,
    "q_agg_minmax_by" ->
      """WITH r AS (SELECT user_id, event_type, value,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY value DESC, event_id DESC) AS rn,
        |  max(value) OVER (PARTITION BY user_id) AS mx
        | FROM events)
        |SELECT user_id, event_type AS top_type, round(mx, 2) AS top_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
  )
}
