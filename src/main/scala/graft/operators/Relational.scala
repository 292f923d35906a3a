package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational coverage over the TPC-H-ish tables — scans,
  * projections, filtered aggregation, multi-way joins, top-k, window
  * functions, time-bucketed aggregation, sessionization.
  *
  * Numeric discipline for oracle parity: monetary aggregates are computed in
  * DECIMAL (exact, order-independent) rather than DOUBLE, because a
  * floating-point sum's value depends on reduction order and would
  * hash-mismatch the DuckDB oracle. This is also the right call at 100 TB:
  * decimal sums are deterministic under any shuffle/AQE re-plan.
  */
object Relational {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, sfDir, name)

  /** TPC-H Q1-style pricing summary: filtered scan → grouped aggregation.
    * Catalyst pushes the shipdate filter and prunes columns at the parquet
    * scan; partial aggregation makes the shuffle tiny. */
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame =
    // spreadIfNarrow (r17): the decimal aggregate kernel over 600k rows
    // ran inside the single-row-group scan task (r17 profile: 3 jobs /
    // 5 tasks, 0 shuffle, ~0.7 s warm); no-op at cluster scale.
    // Filter BEFORE the spread (r17 advice #3): parquet pushdown and the
    // exchange's row volume must not depend on Catalyst moving the
    // predicate through RepartitionByExpression.
    graft.sources.Tables.spreadIfNarrow(spark, sfDir, "lineitem",
        t(spark, sfDir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp")),
        col("l_orderkey"))
      .withColumn("qty", col("l_quantity").cast("decimal(18,2)"))
      .withColumn("price", col("l_extendedprice").cast("decimal(18,2)"))
      .withColumn("disc", col("l_discount").cast("decimal(18,2)"))
      .withColumn("tax", col("l_tax").cast("decimal(18,2)"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // exact DECIMAL sums (order-independent), surfaced as DOUBLE so the
        // oracle compare is representation-robust
        sum("qty").cast("double").as("sum_qty"),
        sum("price").cast("double").as("sum_base_price"),
        sum(col("price") * (lit(1) - col("disc")))
          .cast("double").as("sum_disc_price"),
        sum(col("price") * (lit(1) - col("disc")) * (lit(1) + col("tax")))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style: 3-way join (customer ⋈ orders ⋈ lineitem) + grouped
    * revenue + top-10. customer is small → broadcast; lineitem⋈orders is the
    * one real shuffle. Top-k runs on the aggregated (small) side. */
  def q3TopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, sfDir, "orders")
    val li = t(spark, sfDir, "lineitem")
      .withColumn("price", col("l_extendedprice").cast("decimal(18,2)"))
      .withColumn("disc", col("l_discount").cast("decimal(18,2)"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("price") * (lit(1) - col("disc")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Supplier/nation/region rollup: two broadcast joins + aggregation
    * (dimension-table join coverage). */
  def regionRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val sup = t(spark, sfDir, "supplier")
    val nat = t(spark, sfDir, "nation")
    val reg = t(spark, sfDir, "region")
    sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("s_acctbal").cast("decimal(18,2)"))
          .cast("double").as("total_acctbal"))
  }

  /** Tumbling-window (hourly) event aggregation — the batch twin of the
    * Structured Streaming windowed agg in graft.streaming. date_trunc keeps
    * it a plain groupBy (partial-aggregable, no window shuffle). */
  def eventsHourly(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)"))
          .cast("double").as("total_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** Hopping (sliding) window rollup: 1-hour windows every 30 minutes —
    * each event lands in exactly two epoch-aligned windows via the
    * built-in `window()` generator (a narrow 2-row explode fused into the
    * scan, then one partial-aggregable groupBy on (window, type); the
    * oracle twin unnests the same two bucket starts from
    * `time_bucket`). At 100 TB the shuffle carries 2× the group rows of
    * the tumbling query, never 2× the data. */
  def eventsHopping(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)"))
          .cast("double").as("total_value"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sessionization: per-user session boundaries where the gap to the
    * previous event exceeds 30 minutes (lag window + running sum), then
    * per-user session stats. The window shuffles by user_id — the natural
    * key — so it scales horizontally. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val wUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(spark, sfDir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(wUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 30L * 60 * 1000,
          1L).otherwise(0L))
      .withColumn("session_id",
        sum("new_session").over(
          wUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  /** Anti-join coverage: customers with no high-value order (> 400k),
    * counted per market segment. */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
    val ord = t(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Grouping-sets coverage: ROLLUP(region, nation) supplier stats —
    * subtotal rows have NULL group keys on both engines. */
  def supplierRollup(spark: SparkSession, sfDir: String): DataFrame = {
    // expressed via spark.sql: the Dataset rollup-after-join form trips
    // Spark's ambiguous-self-join detector on the Expand-duplicated
    // grouping attributes; the SQL path resolves cleanly and also
    // exercises the spark.sql() surface of the library.
    t(spark, sfDir, "supplier").createOrReplaceTempView("v_supplier")
    t(spark, sfDir, "nation").createOrReplaceTempView("v_nation")
    t(spark, sfDir, "region").createOrReplaceTempView("v_region")
    spark.sql("""
      SELECT r_name, n_name, count(*) AS n_suppliers,
             CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      FROM v_supplier JOIN v_nation ON s_nationkey = n_nationkey
                      JOIN v_region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)""")
  }

  /** Ranking coverage: top-3 orders per priority class by price — WITHOUT
    * a `Window.partitionBy(o_orderpriority)` (5 classes → the whole table
    * funneled into 5 sort tasks at any scale; round-2/3 verdict item).
    * Instead a partial-aggregable bounded top-k aggregate
    * ([[graft.functions.TopK]]): map-side combine caps every task's
    * shuffle contribution at 3 rows per class, then posexplode ranks the
    * ≤15-row result. DESC price is encoded by negating the leading sort
    * field. */
  def orderPriorityRank(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .groupBy("o_orderpriority")
      .agg(graft.functions.TopK.top_k_structs(
        struct((-col("o_totalprice")).as("neg_price"),
          col("o_orderkey").as("o_orderkey")), 3).as("top"))
      .select(col("o_orderpriority"),
        posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rnk"),
        col("s.o_orderkey").as("o_orderkey"),
        (-col("s.neg_price")).cast("double").as("totalprice"))

  /** Set-op coverage: customers who ordered in BOTH 1995 and 1996
    * (INTERSECT = distinct semi-semantics on both engines). */
  def repeatCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = t(spark, sfDir, "orders")
    def custIn(y: Int) =
      ord.filter(year(col("o_orderdate")) === y).select(col("o_custkey"))
    custIn(1995).intersect(custIn(1996))
  }

  /** Exact percentile profile of event values per type (quality-scoring
    * pipelines gate on tail latencies/lengths like this). Spark's exact
    * `percentile` uses linear interpolation — the same definition as the
    * oracle's quantile_cont — and is a partial-aggregable aggregate, so
    * the shuffle carries per-group sketch state, not raw rows. */
  def valuePercentiles(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))

  /** Winsorization quantiles, shared with the oracle SQL. */
  val WinsorLo = 0.01
  val WinsorHi = 0.99

  /** Winsorized event values: per-type p1/p99 bounds (the same exact
    * interpolated percentile aggregate as [[valuePercentiles]])
    * broadcast back onto the stream and values clamped into [lo, hi] —
    * the standard outlier treatment before feature normalization /
    * z-scoring in a training pipeline. Both engines compare against the
    * ROUNDED (1e-6) bounds, so the clip decision never reads an
    * unrounded cross-engine float; the raw values themselves are parquet
    * doubles, bit-identical on both sides.
    *
    * Scale: one partial-aggregable percentile pass (the shuffle carries
    * per-type sketch state, not rows), a type-cardinality bounds table
    * broadcast back, then the clamp runs at scan speed — the events
    * stream is never shuffled. */
  def winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val bounds = ev.groupBy("event_type").agg(
      round(expr(s"percentile(value, $WinsorLo)"), 6).as("lo"),
      round(expr(s"percentile(value, $WinsorHi)"), 6).as("hi"))
    ev.select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("lo"), col("hi"),
        round(least(greatest(col("value"), col("lo")), col("hi")), 6)
          .as("value_wins"),
        (col("value") < col("lo")).as("clip_low"),
        (col("value") > col("hi")).as("clip_high"))
  }

  /** Pivot coverage: hourly event counts spread over event-type columns
    * (the wide layout dashboards read). The pivot values are enumerated,
    * so this is one partial-aggregable groupBy — no second pass to
    * discover the domain. */
  def eventsPivot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .select(col("hour"),
        coalesce(col("click"), lit(0L)).as("n_click"),
        coalesce(col("view"), lit(0L)).as("n_view"),
        coalesce(col("purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("signup"), lit(0L)).as("n_signup"),
        coalesce(col("error"), lit(0L)).as("n_error"))

  /** AS-OF join — an operator Spark lacks natively, composed from existing
    * ops (preference (a) in the build rules): for each purchase, the most
    * recent click at-or-before it by the same user, via a running
    * last-non-null over the (ts, event_id) total order. One shuffle by
    * user_id (the natural key) — the same plan shape an AsOfJoinExec would
    * produce, with no range-join explosion. */
  /** Z-score threshold for [[hourlyAnomalies]] (|z| > 2). */
  val AnomalyZ = 2L

  /** Rate-anomaly detection over the event stream's hourly counts — the
    * monitoring rollup behind every "traffic spike/drop" alert (the
    * numeric sibling of the reference's threshold alerts,
    * `monitor.rs:79-85`): per event type, hours whose count deviates
    * from that type's mean by more than [[AnomalyZ]] population standard
    * deviations.
    *
    * The z-test is evaluated EXACTLY in integers — counts are integers,
    * so with S = Σx, Q = Σx², n = #hours:
    * (x − S/n)² > z²·(nQ − S²)/n²  ⟺  (n·x − S)² > z²·(n·Q − S²),
    * no float mean/variance ever computed for the DECISION (the surfaced
    * z is a rounded display ratio of exact integers). Cross-engine this
    * sidesteps float-aggregation order entirely.
    *
    * Plan: ONE partial-aggregable corpus aggregation (hour counts);
    * the per-type moments are WINDOWS over the aggregated hourly table
    * (hours × types — bounded, never corpus-sized), so the events scan
    * runs once instead of once per consumer (the top_terms lesson). */
  /** The full (event_type × calendar hour) count grid over the corpus's
    * observation window, zero-filled — the anomaly queries grade EVERY
    * hour, so a total outage (zero events — the severest "drop") gets a
    * row and a flag instead of silently producing no row at all. */
  def hourlyGrid(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val cnt = ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val hours = ev.agg(date_trunc("hour", min("ts")).as("h0"),
        date_trunc("hour", max("ts")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("hour"))
    ev.select("event_type").distinct()
      .crossJoin(hours)
      .join(cnt, Seq("event_type", "hour"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
  }

  /** Per-type hourly-count moments (n_hours, S = Σx, Q = Σx²) over the
    * zero-filled grid — the tiny history table the STREAMING anomaly
    * gate broadcasts ([[graft.streaming.PipelineStreams
    * .anomalyGateStream]]); values identical to the windows inside
    * [[hourlyAnomalies]]. S and Q aggregate in DECIMAL: Q sums squares,
    * which overflows Long at ~1e9 events/hour × a month of history. */
  def hourlyMoments(spark: SparkSession, sfDir: String): DataFrame = {
    val xD = col("n_events").cast("decimal(19,0)")
    hourlyGrid(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum(xD).as("s"),
        sum(xD * xD).as("q"))
  }

  /** The integer-exact anomaly flag shared by the batch query and the
    * streaming gate: (n·x − S)² > z²·(nQ − S²), evaluated in DECIMAL —
    * dev² reaches ~1e28 at production rates (1e6 events/hour × 720 h
    * history spiking 10×), far past Long.MaxValue, where a Long form
    * would wrap NEGATIVE and unflag exactly the largest spikes. The
    * DuckDB twin runs the same arithmetic in HUGEINT; both are exact, so
    * the booleans agree. */
  def anomalyFlag(nEvents: Column, nHours: Column, s: Column,
                  q: Column): Column = {
    val x = nEvents.cast("decimal(19,0)")
    val n = nHours.cast("decimal(19,0)")
    val sD = s.cast("decimal(38,0)")
    val qD = q.cast("decimal(38,0)")
    val dev = n * x - sD
    dev * dev > lit(AnomalyZ * AnomalyZ) * (n * qD - sD * sD)
  }

  def hourlyAnomalies(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
    val xD = col("n_events").cast("decimal(19,0)")
    hourlyGrid(spark, sfDir)
      .withColumn("n_hours", count(lit(1)).over(w))
      .withColumn("s", sum(xD).over(w))
      .withColumn("q", sum(xD * xD).over(w))
      .withColumn("dev",
        col("n_hours").cast("decimal(19,0)") * xD - col("s"))
      .withColumn("var_scaled",
        col("n_hours") * col("q") - col("s") * col("s"))
      .withColumn("is_anomaly", anomalyFlag(col("n_events"),
        col("n_hours"), col("s"), col("q")))
      // z = (x − S/n)/σ = dev/√(nQ − S²); display only — the flag above
      // is the exact integer form of the same comparison
      .withColumn("z_score",
        round(col("dev").cast("double") /
          sqrt(when(col("var_scaled") === 0, lit(null))
            .otherwise(col("var_scaled")).cast("double")), 4))
      .select(col("event_type"), date_format(col("hour"), "yyyy-MM-dd HH:mm:ss")
        .as("hour"), col("n_events"), col("is_anomaly"), col("z_score"))
  }

  /** Ordered funnel steps for [[eventFunnel]]. */
  val FunnelSteps: Seq[String] = Seq("signup", "view", "click", "purchase")
  /** Conversion window: every later step must land within this interval
    * of the user's FIRST signup (first-touch attribution — the
    * SQL-replayable funnel semantics; the testdata's users average ~2
    * events/day, so a 3-day window yields a real step-by-step falloff —
    * 150 → 105 → 57 → 21 at sf0.01 — instead of everyone converting
    * eventually). */
  val FunnelWindow = "3 day"
  /** [[FunnelWindow]] in milliseconds — the ONE home of the conversion
    * window for imperative consumers (the streaming funnel state machine
    * and the FunnelSpec replay). */
  val FunnelWindowMs: Long = 3L * 24 * 3600 * 1000

  /** Funnel analysis: how many users complete each PREFIX of
    * signup → view → click → purchase in strict chronological order,
    * every step inside [[FunnelWindow]] of the first signup. The classic
    * product-analytics rollup, here as the sequence-pattern operator the
    * reference's event domain invites.
    *
    * Plan: ONE shuffle — per-user event lists are assembled with a
    * partial-aggregable collect, and the whole strict-order state machine
    * runs inside a single `aggregate()` fold per user (no self-join per
    * step, no window). Per-user groups are user-activity-sized, never
    * corpus-sized. The oracle twin is the equivalent step-chained
    * min-timestamp CTE form; both use strict `>` between steps and `≤`
    * against the window cap, so they agree on edge timestamps. */
  def eventFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = t(spark, sfDir, "events")
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("event_type")).as("e"))
      .groupBy("user_id")
      .agg(array_sort(collect_list(col("e"))).as("evs"))
    val init = struct(lit(0).as("stage"),
      lit(null).cast("timestamp").as("t"),
      lit(null).cast("timestamp").as("t1"))
    val folded = perUser.select(
      aggregate(col("evs"), init, (acc, e) => {
        val step = FunnelSteps.zipWithIndex.map { case (s, i) =>
          val cond =
            if (i == 0) acc("stage") === 0 && e("event_type") === s
            else acc("stage") === i && e("event_type") === s &&
              e("ts") > acc("t") &&
              e("ts") <= acc("t1") + expr(s"INTERVAL $FunnelWindow")
          val anchor = if (i == 0) e("ts") else acc("t1")
          (cond, struct(lit(i + 1).as("stage"), e("ts").as("t"),
            anchor.as("t1")))
        }
        step.foldRight(acc) { case ((cond, nxt), els) =>
          when(cond, nxt).otherwise(els)
        }
      }).getField("stage").as("stage"))
    val stageCounts = folded.groupBy("stage").agg(count(lit(1)).as("n"))
    val steps = {
      import spark.implicits._
      FunnelSteps.zipWithIndex.map { case (s, i) => (i + 1L, s) }
        .toDF("step_idx", "step")
    }
    steps.join(stageCounts, col("stage") >= col("step_idx"), "left")
      .groupBy("step_idx", "step")
      .agg(coalesce(sum("n"), lit(0L)).as("n_users"))
  }

  /** Cohort retention: users grouped by the DAY of their first signup,
    * counted on each subsequent day they produced ANY event — the
    * product-analytics matrix behind every "day-N retention" chart
    * (daily grain because the testdata spans one month).
    *
    * Plan: two user-keyed partial-aggregable aggregations (first-signup,
    * distinct active days) and one user-keyed join; output is
    * (cohorts × days)-sized. */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(date_trunc("day", min(col("ts"))).as("cohort_ts"))
    val active = ev.select(col("user_id"),
      date_trunc("day", col("ts")).as("day_ts")).distinct()
    cohort.join(active, Seq("user_id"))
      .filter(col("day_ts") >= col("cohort_ts"))
      .select(date_format(col("cohort_ts"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day_ts"), col("cohort_ts")).cast("long")
          .as("days_since"))
      .groupBy("cohort_day", "days_since")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Share of rows whose `props` payload is deterministically mangled /
    * emptied by [[jsonPropsRollup]] (mod keys shared with the oracle SQL). */
  val JsonBadMod = 7L
  val JsonEmptyMod = 3L

  /** Semi-structured schema-on-read over the events' JSON `props` column,
    * with corrupt-record accounting — the ingest shape for event payloads
    * that arrive as JSON strings. The synthetic corpus is 100% valid
    * `{"k": N}`, so (like `pii_scrub`'s planted PII) the benched query
    * deterministically mangles ~10% of payloads to `{broken` and empties
    * another ~10% to `{}` IDENTICALLY on both engines, exercising all
    * three parse outcomes: unparseable (captured via the PERMISSIVE
    * corrupt-record column — `from_json` yields a struct of nulls for bad
    * input, so NULL-ness of the struct itself is not the signal),
    * parseable with the key absent, and parseable with a value.
    *
    * Plan: ONE scan — `from_json` with an explicit DDL schema parses each
    * payload once (per-row Jackson work, the honest cost of schema-on-read;
    * project the parsed struct, never re-parse per field) — then one
    * partial-aggregable groupBy on event_type. The distinct-k count is the
    * only expand; all measures are integer-exact. At 100 TB nothing
    * shuffles but the 5-group aggregate. */
  def jsonPropsRollup(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .withColumn("p",
        when(col("event_id") % 10 === JsonBadMod, lit("{broken"))
          .when(col("event_id") % 10 === JsonEmptyMod, lit("{}"))
          .otherwise(col("props")))
      .withColumn("j", from_json(col("p"), "k LONG, _bad STRING",
        Map("columnNameOfCorruptRecord" -> "_bad")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("j._bad")).as("n_bad"),
        count(when(col("j._bad").isNull && col("j.k").isNull, lit(1)))
          .as("n_missing_k"),
        count(col("j.k")).as("n_k"),
        sum(col("j.k")).as("sum_k"),
        min(col("j.k")).as("min_k"),
        max(col("j.k")).as("max_k"),
        countDistinct(col("j.k")).as("n_distinct_k"))

  /** Share of events deterministically treated as the late-arriving
    * delta batch by [[incrementalAgg]] (mod key shared with the oracle). */
  val IncAggLateMod = 7L

  /** Incremental aggregate maintenance — the materialized-view pattern:
    * a stored daily rollup is brought up to date by aggregating ONLY the
    * late-arriving delta batch and merging it in additively (count and
    * DECIMAL sum are both self-mergeable), instead of recomputing the
    * corpus. Here ~10% of events (deterministic event_id mod, identical
    * on both engines) play the delta; the output carries per-group
    * provenance (base/delta event counts) and the merged measures. The
    * maintenance INVARIANT — merged ≡ full recompute — is what the spec
    * pins; the oracle pins the merge arithmetic itself.
    *
    * Scale: the delta aggregation is batch-sized, the merge is one
    * full-outer equi-join on the AGGREGATE key (cardinality = groups,
    * never rows) — at 100 TB the stored rollup is read, not rebuilt,
    * which is the entire point. */
  def incrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .withColumn("day_idx",
        datediff(date_trunc("day", col("ts")),
          lit("2024-01-01").cast("timestamp")).cast("long"))
      .withColumn("is_late", col("event_id") % 10 === IncAggLateMod)
    def roll(df: DataFrame): DataFrame = df
      .groupBy("event_type", "day_idx")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("tot"))
    val base = roll(ev.filter(!col("is_late")))
      .select(col("event_type"), col("day_idx"),
        col("n").as("n_base"), col("tot").as("tot_base"))
    val delta = roll(ev.filter(col("is_late")))
      .select(col("event_type"), col("day_idx"),
        col("n").as("n_delta"), col("tot").as("tot_delta"))
    base.join(delta, Seq("event_type", "day_idx"), "full_outer")
      .select(col("event_type"), col("day_idx"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        (coalesce(col("n_base"), lit(0L)) + coalesce(col("n_delta"), lit(0L)))
          .as("n_events"),
        (coalesce(col("tot_base"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("tot_delta"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("total_value"))
  }

  /** 7-day trailing moving average of daily event value, per type — the
    * RANGE-frame window shape (a trailing frame over an integer DAY key,
    * so calendar gaps contribute nothing, unlike a ROWS frame which
    * would silently reach further back). Sums are exact DECIMAL inside
    * the frame; the average divides two exact quantities and is rounded
    * once for parity.
    *
    * Scale: the window runs over the ALREADY-AGGREGATED (type × day)
    * table — types × days rows regardless of corpus size — after one
    * partial-aggregable daily rollup; the raw stream never meets a
    * window. */
  def movingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = t(spark, sfDir, "events")
      .groupBy(col("event_type"),
        datediff(date_trunc("day", col("ts")),
          lit("2024-01-01").cast("timestamp")).cast("long").as("day_idx"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("day_total_dec"))
    val w = Window.partitionBy("event_type").orderBy("day_idx")
      .rangeBetween(-6, 0)
    daily
      .withColumn("ma7_total", sum(col("day_total_dec")).over(w))
      .withColumn("ma7_days", count(lit(1)).over(w))
      .select(col("event_type"), col("day_idx"), col("n_events"),
        col("day_total_dec").cast("double").as("day_total"),
        round(col("ma7_total").cast("double") / col("ma7_days"), 6)
          .as("ma7"))
  }

  /** Bit budget per dimension of the z-order interleave and the bucket
    * width (in z bits) — shared with the generated oracle SQL. A zbucket
    * fixes the top interleaved bits of both dimensions, so within one
    * bucket each dimension's spread is < 2^(ZBucketShift/2) = 128 by
    * construction — that is the multi-dimensional file-skipping
    * guarantee. */
  val ZBits = 16
  val ZBucketShift = 14

  /** Z-order (Morton-curve) layout planning — the lakehouse answer to
    * "queries filter on user OR on time, but a sort clusters only one":
    * interleaving the bits of (user_id, hour-of-month) gives a single
    * sort key whose ranges bound BOTH dimensions, so per-file min/max
    * stats can skip files for either predicate. The output is exactly
    * the manifest a lake stores per file: zbucket → row count + min/max
    * of each dimension (all integer-exact); at production scale the
    * writer is `repartitionByRange(zbucket)` + write, and this rollup is
    * the pruning index. The z-value itself is a generated chain of
    * codegen'd shift/mask terms — scan speed, no shuffle beyond the
    * bucket rollup.
    *
    * Spec-pinned guarantee: every bucket's user spread and hour spread
    * are < 128, vs global spreads of ~1500 users × 744 hours — the
    * reason a z-layout skips files a single-column sort cannot. */
  /** (u, h, zbucket) columns added to an events frame — the shared
    * Morton-key computation for the planner and the writer. */
  private def withZ(events: DataFrame): DataFrame = {
    // Domain guard (round-7 advice): the interleave consumes only the low
    // ZBits bits of user_id, so an id outside [0, 2^ZBits) would silently
    // alias onto another id's Morton position and void the per-bucket
    // spread bound — fail the job loudly instead of corrupting the layout.
    // (h needs no guard: hour-of-month is ≤ 743 < 2^10 by construction.)
    val uRaw = col("user_id").cast("long")
    val u = when(uRaw >= 0L && uRaw < (1L << ZBits), uRaw)
      .otherwise(raise_error(concat(
        lit(s"zorder: user_id outside [0, 2^$ZBits): "),
        uRaw.cast("string"))))
    val h = ((dayofmonth(col("ts")) - 1) * 24 + hour(col("ts"))).cast("long")
    val z = (0 until ZBits).map { i =>
      shiftleft(shiftright(u, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftright(h, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
    events.withColumn("u", u).withColumn("h", h)
      .withColumn("zbucket", shiftright(z, ZBucketShift))
  }

  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame =
    withZ(t(spark, sfDir, "events"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_events"),
        min("u").as("u_min"), max("u").as("u_max"),
        min("h").as("h_min"), max("h").as("h_max"))

  /** Execute [[zorderLayout]]'s plan: write the events z-clustered with
    * EXACTLY one parquet file per zbucket (hash repartition on the write
    * key, so distinct buckets write in parallel with no small-file
    * spray — the `writeShards` scheme), then read the files back and
    * re-derive the manifest from what is PHYSICALLY on disk
    * (`input_file_name`-grouped min/max) — proving the skip guarantee
    * holds at the file level where a scan planner would use it, not just
    * in the logical plan. */
  def writeZOrdered(spark: SparkSession, sfDir: String,
                    outDir: String): DataFrame = {
    withZ(t(spark, sfDir, "events"))
      .repartition(col("zbucket"))
      .write.mode("overwrite").partitionBy("zbucket").parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_events"),
        min("u").as("u_min"), max("u").as("u_max"),
        min("h").as("h_min"), max("h").as("h_max"))
  }

  def asofClickPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    t(spark, sfDir, "events")
      .withColumn("last_click",
        last(when(col("event_type") === "click",
          struct(col("event_id"), col("ts"), col("value"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("last_click.event_id").as("click_id"),
        (unix_millis(col("ts")) - unix_millis(col("last_click.ts")))
          .as("ms_since_click"),
        col("last_click.value").cast("double").as("click_value"))
  }
}
