package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Temporal operators the reference lacks entirely (SURVEY.md §2.4 —
  * range/as-of joins marked ABSENT; §2.10 — sessionization intent via
  * the unused kafka dep): as-of join, equi+range join, and session
  * windows, all over the events stream table.
  *
  * Scale design (100 TB):
  *  - the as-of join is the union-window formulation: tag both streams,
  *    one shuffle on the key, one sort per partition, then
  *    `last(ignoreNulls)` carries the most recent build-side row
  *    forward. No point-in-time cross product, no per-row probe — this
  *    is how as-of joins stay O(n log n) on a cluster (vs the naive
  *    range-join + argmax which explodes quadratically in hot keys).
  *  - the range join keeps an equality key (user_id) so Catalyst plans
  *    a sort-merge join with the range as a residual predicate — never
  *    a cartesian. Pure-range workloads would add time-bucketing.
  *  - session windows use Spark's native session_window aggregation
  *    (mergeable partial state, streaming-capable).
  */
object Temporal {

  /** As-of join: for every click, the most recent prior-or-equal
    * purchase by the same user (event-time inclusive). */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
      // purchases sort before clicks at identical ts -> inclusive as-of
      .withColumn("tag", when(col("event_type") === "purchase", 0).otherwise(1))
      .withColumn("pe", when(col("tag") === 0, col("event_id")))
      .withColumn("pv", when(col("tag") === 0, col("value")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_purchase_event", last(col("pe"), ignoreNulls = true).over(w))
      .withColumn("last_purchase_value", last(col("pv"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_purchase_event"), col("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** q352 — AS-OF JOIN WITH TOLERANCE: q37 bounded to a 1-hour
    * staleness window (pandas merge_asof's `tolerance`, the form a
    * feature store actually serves): a click only inherits the prior
    * purchase if it happened within the hour — an hours-old match is
    * WORSE than no match for a model, because it asserts a context
    * that no longer holds. Same union-window plan as q37 (one stream,
    * one partitioned window, no join) with the matched timestamp
    * carried so the staleness test is one integer microsecond
    * comparison; stale matches null out and the `fresh` flag makes
    * the dropout auditable. */
  def asofJoinTolerance(spark: SparkSession, dir: String): DataFrame = {
    val T = 3600L * 1000000L
    val ev = events(spark, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("tag", when(col("event_type") === "purchase", 0).otherwise(1))
      .withColumn("pe", when(col("tag") === 0, col("event_id")))
      .withColumn("pv", when(col("tag") === 0, col("value")))
      .withColumn("pt", when(col("tag") === 0, col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("lpe", last(col("pe"), ignoreNulls = true).over(w))
      .withColumn("lpv", last(col("pv"), ignoreNulls = true).over(w))
      .withColumn("lpt", last(col("pt"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .withColumn("age_us",
        expr("unix_micros(cast(ts as timestamp)) - unix_micros(cast(lpt as timestamp))"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("age_us") <= T, col("lpe")).as("purchase_event"),
        when(col("age_us") <= T, col("lpv")).as("purchase_value"),
        coalesce(col("age_us") <= T, lit(false)).as("fresh"))
      .orderBy(col("event_id"))
  }

  /** q354 — PURGED TEMPORAL SPLIT (train/embargo/test): the
    * leakage-safe time split with an EMBARGO gap — train strictly
    * before cutoff−24h, test strictly from the cutoff, the 24 hours
    * between DISCARDED — the financial-ML "purged" split (López de
    * Prado) that q69's hash split cannot express: when labels look
    * 24h into the future (q353), a train event near the cutoff reads
    * test-period outcomes unless the embargo removes it. Cutoff =
    * the q298 midpoint rule (integer micros, engine-identical); one
    * conditional-agg pass; per-split counts, user reach and exact
    * boundary micros as the audit. O(3) output. */
  def temporalSplitEmbargo(spark: SparkSession, dir: String): DataFrame = {
    val E = 24L * 3600 * 1000000L
    val e = events(spark, dir).select(col("event_id"), col("user_id"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
    val b = e.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    e.crossJoin(broadcast(b))
      .withColumn("cut", expr("(lo + hi) div 2"))
      .withColumn("split",
        when(col("us") < col("cut") - E, "1_train")
          .when(col("us") >= col("cut"), "3_test")
          .otherwise("2_embargo"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("us")).as("t_min_us"), max(col("us")).as("t_max_us"))
      .orderBy(col("split"))
  }

  /** q353 — PROPENSITY LABEL GENERATION: for every click, did a
    * purchase by the same user follow within 24 hours, and after how
    * long — the LABEL BUILDER for conversion-propensity training
    * (q240 assembles point-in-time features; this builds the target
    * the model predicts, with the same leakage discipline: only
    * FUTURE purchases count, and the horizon is explicit so labels
    * near the corpus edge are honestly censorable). Forward twin of
    * q37's union-window plan: one stream ordered (ts, tag desc,
    * event_id), the NEXT purchase from a first(ignoreNulls) over the
    * following frame — clicks at the same instant as a purchase do
    * NOT claim it (strictly future). One window, no join; the label
    * is one integer microsecond comparison. */
  def propensityLabels(spark: SparkSession, dir: String): DataFrame = {
    val H = 24L * 3600 * 1000000
    val ev = events(spark, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      // purchases (tag 0) sort BEFORE clicks at equal ts, so a
      // same-instant purchase is OUTSIDE the click's following frame
      // and cannot shadow a genuinely later one — strict-future
      // matching falls out of the order itself
      .withColumn("tag", when(col("event_type") === "purchase", 0).otherwise(1))
      .withColumn("pe", when(col("tag") === 0, col("event_id")))
      .withColumn("pt", when(col("tag") === 0, col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    ev.withColumn("npe", first(col("pe"), ignoreNulls = true).over(w))
      .withColumn("npt", first(col("pt"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .withColumn("gap_us",
        expr("unix_micros(cast(npt as timestamp)) - unix_micros(cast(ts as timestamp))"))
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("gap_us").isNotNull && col("gap_us") > 0L &&
          col("gap_us") <= H).as("converted_24h"),
        when(col("gap_us").isNotNull && col("gap_us") > 0L &&
          col("gap_us") <= H, col("gap_us")).as("time_to_conversion_us"),
        when(col("gap_us").isNotNull && col("gap_us") > 0L &&
          col("gap_us") <= H, col("npe")).as("purchase_event"))
      .orderBy(col("event_id"))
  }

  /** NEAREST-AS-OF JOIN: each purchase matched to its temporally
    * NEAREST error event for the same user — |Δt| minimized over BOTH
    * directions, ties to the earlier side — where plain as-of (q37)
    * only looks backward. The alert-correlation join ("which failure
    * is this conversion closest to?") and the generic
    * nearest-neighbor-in-time enrichment.
    *
    * Same scale shape as q37: the union-window formulation — both
    * sides in ONE stream ordered (ts, tag, event_id), the backward
    * candidate from a last(ignoreNulls) over the preceding frame and
    * the forward candidate from a first(ignoreNulls) over the
    * following frame — so ONE user-key shuffle and ONE sort carry
    * both directions (two frames over the same window ordering);
    * never a per-purchase probe or a time-theta join. The errors-
    * sort-first tag makes a same-microsecond error count as the
    * backward candidate at distance 0 (and win any tie). Signed
    * `delta_us` (negative = error before the purchase) keeps the
    * direction auditable; purchases of users with no errors survive
    * with NULLs. */
  def nearestAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "error", 0).otherwise(1).as("tag"))
      .withColumn("ee", when(col("tag") === 0, col("event_id")))
      .withColumn("ets", when(col("tag") === 0, col("ts")))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val db = expr("timestampdiff(MICROSECOND, p_ts, ts)")
    val df = expr("timestampdiff(MICROSECOND, ts, n_ts)")
    val preferPrev = col("n_ts").isNull ||
      (col("p_ts").isNotNull && db <= df)
    ev.withColumn("p_ts", last(col("ets"), ignoreNulls = true).over(wb))
      .withColumn("p_id", last(col("ee"), ignoreNulls = true).over(wb))
      .withColumn("n_ts", first(col("ets"), ignoreNulls = true).over(wf))
      .withColumn("n_id", first(col("ee"), ignoreNulls = true).over(wf))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"),
        when(col("p_ts").isNull && col("n_ts").isNull,
          lit(null).cast(LongType))
          .when(preferPrev, col("p_id")).otherwise(col("n_id"))
          .as("nearest_error_id"),
        when(col("p_ts").isNull && col("n_ts").isNull,
          lit(null).cast(LongType))
          .when(preferPrev, -db).otherwise(df).as("delta_us"))
      .orderBy(col("event_id"))
  }

  /** BUSINESS-DAY latency histogram: order→ship lag in WEEKDAYS
    * (weekends excluded) — the SLA clock a fulfillment report runs
    * on, where calendar datediff overstates every weekend-spanning
    * lag. No calendar table and no per-day explode: B(d) = weekdays
    * in [1900-01-01, d) has the closed form
    * (dn div 7)·5 + least(dn mod 7, 5) with dn anchored to a MONDAY
    * epoch (1900-01-01), so the latency is B(ship) − B(order) — two
    * codegen'd integer projections per row, exact in both engines
    * (nonnegative dn makes div/mod floor-consistent across Spark and
    * DuckDB; the diff runs on DATE boundaries, the q239
    * cross-engine-safe day semantics). One orderkey equi-join (AQE
    * broadcast-ready when orders is the small side) then a
    * partial-aggregable O(distinct lags) histogram. */
  def businessDayLatency(spark: SparkSession, dir: String): DataFrame = {
    // (dn div 7) is Spark SQL's integral division — exposed via expr;
    // the Column `/` operator would detour through DOUBLE
    def bdays(dn: String): String =
      s"(bigint($dn) div 7) * 5 + least(bigint($dn) % 7, 5)"
    load(spark, dir, "lineitem")
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
      .join(load(spark, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"),
          to_date(col("o_orderdate")).as("ordered")), "l_orderkey")
      .select(
        datediff(col("ship"), to_date(lit("1900-01-01"))).as("d2"),
        datediff(col("ordered"), to_date(lit("1900-01-01"))).as("d1"))
      .select((expr(bdays("d2")) - expr(bdays("d1"))).as("latency_bd"))
      .groupBy(col("latency_bd"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy(col("latency_bd"))
  }

  /** Equi+range join: clicks within the hour following each purchase,
    * per user; purchases with no clicks kept (left join). */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") > col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("p_event_id"), col("user_id"))
      .agg(count(col("c_ts")).as("n_clicks"),
        sum(d2(col("c_value"))).cast(DoubleType).as("sum_click_value"))
      .orderBy(col("p_event_id"))
  }

  /** Session windows: 30-minute-gap sessions per user (native
    * session_window — mergeable, works identically under Structured
    * Streaming with a watermark). */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Full-outer join of two daily aggregates (the one join type the
    * rest of the suite doesn't exercise): click days vs purchase days,
    * missing sides surfaced as zero. */
  def fullOuterDaily(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    def daily(t: String, as: String) = ev.filter(col("event_type") === t)
      .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
      .agg(count(lit(1)).as(as))
    daily("click", "n_clicks")
      .join(daily("purchase", "n_purchases"), Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      .orderBy(col("day"))
  }

  /** Daily revenue pre-aggregate shared by the gap-fill and
    * moving-average queries: the 100 TB trick is that the window work
    * happens AFTER aggregation shrinks the data to O(distinct days). */
  private def dailyRevenue(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast(DateType).as("day"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))

  /** Time-series densification: generate the full day range, left-join
    * the daily aggregate, zero-fill gaps. */
  def gapFillDays(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenue(spark, dir)
    val days = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    days.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy(col("day"))
  }

  /** Trailing 7-day moving aggregate via a RANGE frame over the day
    * index. Unpartitioned window — correct here because the daily
    * pre-aggregate is O(days), tiny at any corpus scale. */
  def movingAverage(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("day_idx")).rangeBetween(-6, 0)
    dailyRevenue(spark, dir)
      .withColumn("day_idx",
        datediff(col("day"), to_date(lit("1995-01-01"))))
      .withColumn("rev_7d", sum(d2(col("revenue"))).over(w).cast(DoubleType))
      .withColumn("n_days_7d", count(lit(1)).over(w))
      .select(col("day"), col("revenue"), col("rev_7d"), col("n_days_7d"))
      .orderBy(col("day"))
  }

  /** SCD Type-2 history derivation: collapse each customer's
    * status-change log into validity intervals — rows where the status
    * differs from its predecessor open an interval
    * (`valid_from` = change time), `valid_to` = the next change's
    * start, NULL (+`is_current`) for the open tail. The reference's
    * MinIO last-write-wins key (SCD1, q19) keeps only the latest
    * state; this is the history-preserving twin every warehouse load
    * eventually needs.
    *
    * Scale shape: ONE shuffle on the entity key — the change-detect
    * lag window and the interval-close lead window share partitioning
    * AND sort order, and the filter between them preserves both, so
    * Catalyst plans a single exchange+sort feeding two window passes.
    * The change log never leaves its partition. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderstatus"), col("o_orderdate"),
        col("o_orderkey"))
      .withColumn("prev", lag(col("o_orderstatus"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderstatus"))
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("o_orderstatus").as("status"),
        col("o_orderkey").as("anchor_orderkey"),
        col("o_orderdate").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("o_custkey"), col("valid_from"), col("anchor_orderkey"))
  }

  /** FORWARD-FILL imputation (LOCF — last observation carried
    * forward): sparse readings per user filled with the most recent
    * non-null value, via the IGNORE NULLS frame semantics
    * (`last(ignoreNulls)` over ROWS UNBOUNDED PRECEDING) — the
    * time-series imputation every feature pipeline needs for sensor
    * dropout / sparse telemetry. Dropout is simulated in-query by
    * nulling 'view' rows, so fill paths of every length occur. The
    * filled value is COPIED, never computed — no float arithmetic to
    * diverge. One user-key shuffle; frame state is one value. */
  def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") =!= "view", col("value")).as("v"))
      .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** SCD2 TIME-TRAVEL read: the state of every entity AS OF a given
    * past date, read straight from q76's validity intervals
    * (valid_from <= D < valid_to, open intervals unbounded) — the
    * third leg of the SCD2 duality after full history (q76) and
    * current snapshot (q96): one interval filter answers "what did
    * the table say on D" without replaying history. Same single
    * entity-key shuffle as q76; the filter is free. */
  def scd2AsOf(spark: SparkSession, dir: String): DataFrame = {
    val d = to_date(lit("1996-06-30"))
    scd2History(spark, dir)
      .filter(col("valid_from") <= d &&
        (col("valid_to").isNull || col("valid_to") > d))
      .select(col("o_custkey"), col("status"), col("anchor_orderkey"),
        col("valid_from"), col("valid_to"))
      .orderBy(col("o_custkey"))
  }

  /** LINEAR INTERPOLATION imputation — q189's LOCF upgraded to
    * time-weighted interpolation between the neighboring non-null
    * readings: v = vp + (vn−vp)·(t−tp)/(tn−tp) with EXACT integer-
    * microsecond time deltas (the q116 duration rule) and ONE fixed
    * IEEE op sequence both engines execute identically; rows before
    * the first / after the last reading stay null (no extrapolation),
    * same-instant neighbors fall back to vp rather than 0/0. Two
    * frames over one user-key shuffle (prev via last-ignore-nulls,
    * next via first-ignore-nulls); frame state is one (value, ts)
    * pair in each direction. */
  def linearInterpolate(spark: SparkSession, dir: String): DataFrame = {
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") =!= "view", col("value")).as("v"))
      .withColumn("vp", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("tp",
        last(when(col("v").isNotNull, col("ts")), ignoreNulls = true)
          .over(wPrev))
      .withColumn("vn", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("tn",
        first(when(col("v").isNotNull, col("ts")), ignoreNulls = true)
          .over(wNext))
      .withColumn("v_interp",
        when(col("v").isNotNull, col("v"))
          .when(col("vp").isNull || col("vn").isNull, lit(null))
          .when(expr("timestampdiff(MICROSECOND, tp, tn)") === 0L, col("vp"))
          .otherwise(col("vp") + (col("vn") - col("vp")) *
            (expr("timestampdiff(MICROSECOND, tp, ts)").cast(DoubleType) /
              expr("timestampdiff(MICROSECOND, tp, tn)").cast(DoubleType))))
      .select(col("user_id"), col("ts"), col("event_id"), col("v"),
        col("v_interp"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Ordered conversion funnel (view → click → purchase) per user: the
    * product-analytics staple. Each stage's timestamp is the FIRST
    * qualifying event strictly after the previous stage — order
    * matters, so this is min-after-join, not three independent mins.
    *
    * Scale shape: three aggregations and two joins, ALL keyed on
    * user_id — one partitioning reused across the whole chain (no
    * re-shuffle between stages), and each stage's frame shrinks to one
    * row per user before the next join, so join inputs are bounded by
    * the user count, not the event count. */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    def typed(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), col("ts"))
    val v = typed("view").groupBy(col("user_id"))
      .agg(min(col("ts")).as("t_view"))
    val c = typed("click").join(v, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = typed("purchase").join(c, "user_id")
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"),
        (lit(1L) + col("t_click").isNotNull.cast(LongType) +
          col("t_purchase").isNotNull.cast(LongType)).as("stage"))
      .orderBy(col("user_id"))
  }

  /** Distinct (day, user) activity pairs — the shared pre-shrink of the
    * rolling-actives (q89) and cohort-retention (q91) plans: both
    * operate on daily-distinct activity, never raw events. */
  private def dailyUsers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
        col("user_id"))
      .distinct()

  /** Trailing-7-day DISTINCT user count per day (rolling actives — the
    * DAU/WAU primitive). COUNT(DISTINCT) is not window-able, and the
    * naive day×events range self-join rescans the event log per day.
    * The scale shape used here: shrink once to distinct (day, user)
    * pairs, then EXPLODE each pair to the <=7 future days it can serve
    * — the classic remap that turns a sliding-window distinct into a
    * plain partial-aggregable groupBy. Shuffle volume is bounded by
    * 7 × daily-distinct pairs (tiny vs raw events at any scale), and
    * the final count-distinct shuffles (target_day, user) partials
    * only. A left-semi join restricts output to days that exist in the
    * data (the explode overshoots past the last day). */
  def slidingDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val du = dailyUsers(spark, dir)
    val days = du.select(col("day")).distinct()
    du.withColumn("target_day",
        explode(sequence(col("day"), col("day") + expr("interval 6 days"),
          expr("interval 1 day"))))
      .join(days.withColumnRenamed("day", "target_day"), Seq("target_day"),
        "left_semi")
      .groupBy(col("target_day").as("day"))
      .agg(countDistinct(col("user_id")).as("n_users_7d"))
      .orderBy(col("day"))
  }

  /** Cohort retention matrix: users grouped by first-activity day
    * (their cohort), counted distinctly at each day offset 0..7 after
    * it — the onboarding-retention table every product review reads.
    *
    * Scale shape: the user's cohort day is a per-user aggregate (one
    * shuffle on user_id), the offset join rides the SAME user_id
    * partitioning, and the final (cohort, k) count-distinct shuffles
    * only (cohort, k, user) partials — events never self-join on the
    * time axis. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val du = dailyUsers(spark, dir)
    val cohorts = du.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    du.join(cohorts, "user_id")
      .withColumn("k", datediff(col("day"), col("cohort_day")).cast(LongType))
      .filter(col("k") <= 7)
      .groupBy(col("cohort_day"), col("k"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("k"))
  }

  /** Pure-range interval-overlap aggregation — how many order
    * fulfillment windows ([order date, order date + keyed duration])
    * are open in each calendar week. Unlike q38 there is NO equality
    * key to hang a sort-merge join on; a naive formulation is a full
    * range theta-join of intervals × weeks. The scale shape used here
    * is interval BUCKETIZATION: each interval explodes into the
    * (bounded-length) list of week buckets it overlaps and the result
    * is a plain partial-aggregable groupBy on the bucket — shuffle
    * volume is O(rows × avg weeks per interval), never rows × weeks.
    * The same trick generalizes to any bounded-span pure-range join
    * (bucket both sides, equi-join on bucket, residual-filter). */
  def intervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    // epoch lives in the expr strings below (date'1990-01-01') and the
    // oracle's DATE '1990-01-01' — keep the four literals in step
    val iv = load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast(DateType).as("d1"))
      .withColumn("d2",
        date_add(col("d1"), (col("o_orderkey") % 30).cast(IntegerType)))
      // integer div (not double-divide-then-truncate): exact floor
      // semantics matching DuckDB's // on the same nonnegative operands
      .withColumn("w1",
        expr("cast(datediff(d1, date'1990-01-01') as bigint) div 7"))
      .withColumn("w2",
        expr("cast(datediff(d2, date'1990-01-01') as bigint) div 7"))
    iv.withColumn("wk", explode(sequence(col("w1"), col("w2"))))
      .groupBy(col("wk"))
      .agg(count(lit(1)).as("n_open"))
      .orderBy(col("wk"))
  }

  /** Current-state snapshot FROM the SCD2 history: the open interval
    * (is_current) of q76 is definitionally each entity's latest state —
    * the consistency every history-keeping warehouse relies on when it
    * serves "current" reads from the dimension's open rows instead of
    * re-deriving them from the change log. The oracle goes the OTHER
    * way (keep-last over the raw log), so the gate proves the duality,
    * not just the plumbing. Scale: q76's single entity-key shuffle plus
    * a filter — the snapshot is free once the history exists. */
  def scd2Current(spark: SparkSession, dir: String): DataFrame =
    scd2History(spark, dir)
      .filter(col("is_current"))
      .select(col("o_custkey"), col("status").as("current_status"),
        col("anchor_orderkey"), col("valid_from"))
      .orderBy(col("o_custkey"))

  /** q291 — FORECAST-BASELINE evaluation (MASE, Hyndman & Koehler):
    * score the SEASONAL-NAIVE forecast (ŷ_d = y_{d−7}) of the daily
    * event-count series per event_type against the one-step-naive
    * scale (ŷ_d = y_{d−1}). q248 reads the seasonality; this prices
    * it: MASE < 1 means the weekly pattern genuinely predicts — the
    * go/no-go a capacity-planning model is judged against before
    * anyone fits anything. Lags are ROW lags over the observed daily
    * series (a day with zero events is absent, not zero-filled —
    * q61's gap-fill is the densifier when calendar lags are wanted).
    *
    * Exactness: both absolute-error masses are exact BIGINT sums over
    * integer daily counts; MASE is ONE double division. Scale shape:
    * one (type, day) partial-agg rollup — O(types × days) series
    * rows — then per-type lag windows over that tiny series and a
    * one-row-per-type fold. */
  def maseForecastEval(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = daily
      .withColumn("y7", lag(col("y"), 7).over(w))
      .withColumn("y1", lag(col("y"), 1).over(w))
    lagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("y7").isNotNull, abs(col("y") - col("y7")))
          .otherwise(lit(0L))).as("sae_seasonal"),
        sum(when(col("y1").isNotNull, abs(col("y") - col("y1")))
          .otherwise(lit(0L))).as("sae_naive1"),
        count(col("y7")).as("n_eval7"), count(col("y1")).as("n_eval1"))
      .select(col("event_type"), col("n_days"),
        col("sae_seasonal").cast(LongType).as("sae_seasonal"),
        col("sae_naive1").cast(LongType).as("sae_naive1"),
        col("n_eval7"), col("n_eval1"),
        when(col("sae_naive1") > 0 && col("n_eval7") > 0 && col("n_eval1") > 0,
          (col("sae_seasonal").cast(DoubleType) / col("n_eval7"))
            / (col("sae_naive1").cast(DoubleType) / col("n_eval1")))
          .as("mase"))
      .orderBy(col("event_type"))
  }

  /** q296 — OUT-OF-ORDER LATENESS histogram: for each event, how far
    * its event time lags the maximum event time already seen in
    * ARRIVAL order — THE watermark-tuning readout:
    * `withWatermark("ts", X)` silently drops every event whose
    * lateness exceeds X, so you read this histogram FIRST and pick
    * the band that covers the mass you can't afford to lose (the
    * §2.10 streaming family consumes the number; this batch audit
    * produces it). The corpus' event_id order is perfectly
    * time-sorted, so arrival models the transport that actually
    * causes lateness: events ship in 256-event micro-batches within
    * which each connection's (user's) rows arrive contiguously —
    * arrival order (batch, user_id, event_id), the per-connection
    * regrouping every fan-in collector exhibits.
    *
    * The running prefix-max rides the SAME two-level shape as
    * globalRankNoSort/globalCumSumNoSort (max is associative): per
    * batch maxima roll into broadcast prefix offsets (the only
    * unpartitioned window is O(batches)), the intra-batch running
    * max runs in parallel, and prev-max = greatest(batch prefix,
    * intra max). All integer microseconds; the first arrival (no
    * predecessor, sentinel −1) is excluded in both engines.
    * Output: O(bands). */
  /** q326 — TIME-BOXED FUNNEL (q84 with a conversion window): each
    * hop must land within 7 days of the previous stage's first event
    * — the form every product-analytics funnel actually uses, because
    * an unbounded funnel (q84) credits a purchase months after the
    * view to the "funnel" when it is really a separate visit. Same
    * first-event-per-stage reduction (partial-aggregable MIN per
    * user, one equi-join per hop carrying only (user_id, ts)); the
    * window is one interval predicate pushed into each hop join, so
    * the plan cost is identical to q84's while the semantics tighten.
    * Dropout between the two forms is itself meaningful: q84.stage −
    * q326.stage counts conversions that only an unbounded window
    * would claim. */
  def funnelWindowed(spark: SparkSession, dir: String): DataFrame =
    funnelWindowedAt(spark, dir, days = 7)

  /** The q326 chain at an arbitrary conversion window — shared by the
    * q344 sweep so the curve and the production setting never fork. */
  private def funnelWindowedAt(spark: SparkSession, dir: String,
      days: Int): DataFrame = {
    val ev = events(spark, dir)
    def typed(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), col("ts"))
    val v = typed("view").groupBy(col("user_id"))
      .agg(min(col("ts")).as("t_view"))
    val c = typed("click").join(v, "user_id")
      .filter(col("ts") > col("t_view") &&
        col("ts") <= col("t_view") + expr(s"INTERVAL $days DAYS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = typed("purchase").join(c, "user_id")
      .filter(col("ts") > col("t_click") &&
        col("ts") <= col("t_click") + expr(s"INTERVAL $days DAYS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"),
        (lit(1L) + col("t_click").isNotNull.cast(LongType) +
          col("t_purchase").isNotNull.cast(LongType)).as("stage"))
      .orderBy(col("user_id"))
  }

  /** q344 — FUNNEL WINDOW SWEEP: the q326 funnel evaluated at
    * conversion windows {1, 3, 7, 14} days — the tuning curve that
    * answers "how long is our consideration window" empirically
    * (too short undercounts real conversions, too long credits
    * unrelated visits; the elbow is in this table). One row per
    * window with stage populations, each composing the SAME
    * [[funnelWindowedAt]] chain as the production q326 setting, so
    * curve and setting can never fork. Counts exact; O(windows)
    * output. */
  def funnelWindowSweep(spark: SparkSession, dir: String): DataFrame =
    Seq(1, 3, 7, 14).map { d =>
      funnelWindowedAt(spark, dir, d)
        .agg(count(lit(1)).as("n_view"),
          sum(col("t_click").isNotNull.cast(LongType)).as("n_click"),
          sum(col("t_purchase").isNotNull.cast(LongType)).as("n_purchase"))
        .select(lit(d.toLong).as("window_days"), col("n_view"),
          col("n_click"), col("n_purchase"))
    }.reduce(_.unionByName(_)).orderBy(col("window_days"))

  /** q350 — USER BEHAVIORAL DIVERSITY: per user, the inverse-Simpson
    * "effective event-type count" n²/Σc² — the log-free diversity
    * number (q283's lexical rule carried to behavior): 1.0 means a
    * single-action user however many events they fire, k means usage
    * spread evenly over k action types — the engagement-breadth
    * signal segmentation models consume, robust where raw n_types
    * credits one stray click as a whole type. One partial-agg rollup
    * to (user, type), one to users; exact integer moments in
    * DECIMAL(38) (n² outgrows int64 at real event volumes), ONE
    * correctly-rounded division. */
  def userTypeDiversity(spark: SparkSession, dir: String): DataFrame = {
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n_events"),
        count(lit(1)).as("n_types"),
        sum(dec(col("c")) * dec(col("c"))).as("sumsq"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        ((dec(col("n_events")) * dec(col("n_events"))).cast(DoubleType) /
          col("sumsq").cast(DoubleType)).as("effective_types"))
      .orderBy(col("user_id"))
  }

  /** q337 — FUNNEL SUMMARY: the q326 windowed funnel rolled to the
    * one-row report every dashboard actually shows — users per stage
    * and the per-hop conversion rates ("view→click 34%, click→buy
    * 11%") — computed FROM the gated per-user operator (compose,
    * don't re-derive), so the report can never disagree with the
    * drill-down. One partial-aggregable pass over q326's output;
    * rates ONE division each, null-guarded for an empty hop. */
  def funnelSummary(spark: SparkSession, dir: String): DataFrame =
    funnelWindowed(spark, dir)
      .agg(count(lit(1)).as("n_view"),
        sum(col("t_click").isNotNull.cast(LongType)).as("n_click"),
        sum(col("t_purchase").isNotNull.cast(LongType)).as("n_purchase"))
      .select(col("n_view"), col("n_click"), col("n_purchase"),
        (col("n_click").cast(DoubleType) / col("n_view"))
          .as("view_to_click"),
        when(col("n_click") > 0L,
          col("n_purchase").cast(DoubleType) / col("n_click"))
          .as("click_to_purchase"))

  /** q325 — PEAK CONCURRENCY per day: the maximum number of
    * simultaneously-active 30-minute presence windows, per calendar
    * day — THE capacity-planning number (connection pools, rate
    * limits, serving replicas are sized to the peak, not the mean;
    * q25 counts events per hour, this counts OVERLAP). Classic
    * interval sweep: each event contributes (+1 at ts, −1 at
    * ts+30min), concurrency is the running sum over the global
    * endpoint order, the peak is a per-day max of that sum.
    *
    * Scale shape: the global running sum rides
    * [[Windows.globalCumSumNoSort]] — per-time-bucket partial sums
    * roll into broadcast prefix offsets, so NO single-partition
    * global window ever materializes (the naive ORDER BY over every
    * endpoint is the thing that dies at 100 TB). End-before-start at
    * an exact boundary is encoded into the sort key itself (v =
    * 2·micros + kind), making the order total and both engines'
    * sweep identical. All-integer; output O(days). */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val W = 30L * 60 * 1000000
    val e = events(spark, dir).select(col("event_id"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
    val pts = e.select(col("event_id"), (col("us") * 2 + 1).as("v"),
        lit(1L).as("delta"))
      .unionByName(e.select(col("event_id"),
        ((col("us") + W) * 2).as("v"), lit(-1L).as("delta")))
    Windows.globalCumSumNoSort(pts, col("v"), col("event_id"),
        col("delta"), 1L << 38, "conc", "tot")
      .withColumn("day", to_date(expr("timestamp_micros(v div 2)")))
      .groupBy(col("day"))
      .agg(max(col("conc")).as("peak_concurrency"),
        count(lit(1)).as("n_points"))
      .orderBy(col("day"))
  }

  def latenessHistogram(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select(col("event_id"), col("user_id"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
      .withColumn("blk", expr("event_id div 256"))
    val blkMax = e.groupBy(col("blk")).agg(max(col("us")).as("bm"))
    val wOff = Window.orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = blkMax
      .withColumn("off", coalesce(max(col("bm")).over(wOff), lit(-1L)))
      .drop("bm")
    val wIn = Window.partitionBy(col("blk"))
      .orderBy(col("user_id"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = e.join(broadcast(offs), "blk")
      .withColumn("intra", coalesce(max(col("us")).over(wIn), lit(-1L)))
      .withColumn("prevmax", greatest(col("off"), col("intra")))
      .filter(col("prevmax") >= 0)
      .withColumn("late_us", greatest(lit(0L), col("prevmax") - col("us")))
    late.select(col("late_us"),
      when(col("late_us") === 0, struct(lit(0L).as("band_rank"),
        lit("on_time").as("band")))
        .when(col("late_us") <= 60L * 1000000L,
          struct(lit(1L).as("band_rank"), lit("lt_1m").as("band")))
        .when(col("late_us") <= 600L * 1000000L,
          struct(lit(2L).as("band_rank"), lit("lt_10m").as("band")))
        .when(col("late_us") <= 3600L * 1000000L,
          struct(lit(3L).as("band_rank"), lit("lt_1h").as("band")))
        .otherwise(struct(lit(4L).as("band_rank"), lit("gte_1h").as("band")))
        .as("b"))
      .groupBy(col("b.band_rank").as("band_rank"), col("b.band").as("band"))
      .agg(count(lit(1)).as("n_events"), max(col("late_us")).as("ml"))
      .select(col("band_rank"), col("band"), col("n_events"),
        expr("ml div 1000000").as("max_late_s"))
      .orderBy(col("band_rank"))
  }

  /** q298 — MARKOV NEXT-EVENT PREDICTION, evaluated in-engine: train
    * the order-1 model (most frequent successor per current type,
    * q141's transition counts) on the FIRST time half (q207's
    * integer-microsecond midpoint split, anchored at the current
    * event), predict every second-half transition, and score per-type
    * accuracy — the complete train/predict/evaluate loop of the
    * simplest sequence model, run as three aggregations with no ML
    * runtime. The baseline number any sequence model must beat, and
    * the leakage discipline (the model never sees an eval-half
    * anchor) is the point.
    *
    * Determinism: the argmax successor is rank-1 of (count DESC,
    * next_type) — total order, same rule both engines; counts exact
    * BIGINT; accuracy ONE division. Scale shape: transitions ride ONE
    * user-key shuffle (q141's lead window); the model is O(types²)
    * counts → O(types) rows, broadcast to the eval join. */
  def markovEval(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
          .as("us"))
    val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val pairs = ev
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("is_train", col("us") <= expr("(lo + hi) DIV 2"))
    val wArg = Window.partitionBy(col("event_type"))
      .orderBy(col("c").desc, col("next_type"))
    val model = pairs.filter(col("is_train"))
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("next_type").as("pred_type"))
    pairs.filter(!col("is_train"))
      .join(broadcast(model), Seq("event_type"), "left")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("pred_type") === col("next_type"), lit(1L))
          .otherwise(lit(0L))).as("n_hits"))
      .select(col("event_type"), col("n_eval"),
        col("n_hits").cast(LongType).as("n_hits"),
        (col("n_hits").cast(DoubleType) / col("n_eval")).as("accuracy"))
      .orderBy(col("event_type"))
  }

  /** q299 — RETENTION HALF-LIFE per cohort: the first day offset at
    * which a cohort retains fewer than half its day-0 users — the
    * single decay number product reviews quote, distilled from q91's
    * full retention matrix (which this query composes verbatim, so
    * matrix and summary can never disagree). The offset grid is
    * DENSIFIED to 0..7 before the scan — a day with ZERO returning
    * users has no q91 row, yet it is precisely a below-half day, so
    * skipping densification would silently overestimate longevity.
    * The 50% cut is exact-integer (n_users·2 < n0), never a float
    * retention rate per row; day-7 retention ships beside it with ONE
    * division.
    *
    * Scale shape: q91's rollup (one user-key shuffle) + an
    * O(cohorts × 8) dense grid join + one cohort rollup. */
  def retentionHalfLife(spark: SparkSession, dir: String): DataFrame = {
    val grid = cohortRetention(spark, dir)
    val n0 = grid.filter(col("k") === 0)
      .select(col("cohort_day"), col("n_users").as("n0"))
    n0.select(col("cohort_day"), col("n0"),
        explode(sequence(lit(0L), lit(7L))).as("k"))
      .join(grid, Seq("cohort_day", "k"), "left")
      .withColumn("n_users", coalesce(col("n_users"), lit(0L)))
      .groupBy(col("cohort_day"))
      .agg(max(col("n0")).as("cohort_size"),
        min(when(col("k") >= 1 && col("n_users") * 2 < col("n0"),
          col("k"))).as("half_life_day"),
        sum(when(col("k") === 7, col("n_users")).otherwise(lit(0L)))
          .as("n_day7"))
      .select(col("cohort_day"), col("cohort_size"),
        col("half_life_day"),
        col("n_day7").cast(LongType).as("n_day7"),
        (col("n_day7").cast(DoubleType) / col("cohort_size"))
          .as("day7_retention"))
      .orderBy(col("cohort_day"))
  }

  /** q300 — TIMEZONE-CORRECT local-hour activity profile: events
    * bucketed by each user's LOCAL wall-clock hour (home zone assigned
    * deterministically per user), not the warehouse's UTC hour — the
    * difference between "traffic peaks at 19:00 in every market" and
    * the UTC-naive smear every global rollup sees. Conversion is
    * full-IANA (`from_utc_timestamp` with a per-row zone COLUMN), so
    * DST transitions inside the corpus window shift the mapping
    * mid-range exactly as real clocks do — both engines resolve rules
    * from the same tzdata, and the oracle's
    * `timezone(tz, ts::TIMESTAMPTZ)` is the identical UTC→local
    * direction under the pinned-UTC session both sides run with.
    *
    * Scale shape: one codegen'd projection (zone lookup + convert +
    * hour) and one partial-agg rollup to O(zones × 24) rows. */
  def localHourProfile(spark: SparkSession, dir: String): DataFrame = {
    val tzs = array(lit("UTC"), lit("America/New_York"),
      lit("Europe/Paris"), lit("Asia/Tokyo"))
    events(spark, dir)
      .withColumn("tz", element_at(tzs, (col("user_id") % 4).cast("int") + 1))
      .withColumn("local_hour",
        hour(from_utc_timestamp(col("ts").cast(TimestampType), col("tz")))
          .cast(LongType))
      .groupBy(col("tz"), col("local_hour"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("tz"), col("local_hour"))
  }

  /** q306 — BITEMPORAL RESTATEMENT report: monthly revenue as it was
    * KNOWN at a cutoff (transaction time — each order lands in the
    * warehouse `orderkey % 7` days after its business date) versus as
    * known NOW, and the restatement between them — the late-arriving-
    * data audit behind "why did last month's number change?": valid
    * time says WHEN revenue happened, transaction time says when we
    * LEARNED of it, and every as-of-then report is a filter on the
    * second while grouping by the first (q76/q190's SCD2 machinery
    * tracks attribute history; this tracks FACT arrival). One
    * conditional aggregation pass, exact cents, O(months) output,
    * restated share ONE division. */
  def restatementReport(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_date(lit("1998-07-01"))
    load(spark, dir, "orders")
      .select(date_trunc("month", col("o_orderdate")).cast(DateType)
        .as("month"),
        date_add(col("o_orderdate").cast(DateType),
          (col("o_orderkey") % 7).cast(IntegerType)).as("tx_day"),
        (d2(col("o_totalprice")) * 100).cast(LongType).as("cents"))
      .groupBy(col("month"))
      .agg(sum(when(col("tx_day") <= cutoff, col("cents")).otherwise(lit(0L)))
        .as("cents_known"),
        sum(col("cents")).as("cents_now"))
      .select(col("month"),
        col("cents_known").cast(LongType).as("cents_known"),
        col("cents_now").cast(LongType).as("cents_now"),
        (col("cents_now") - col("cents_known")).cast(LongType)
          .as("restated_cents"),
        ((col("cents_now") - col("cents_known")).cast(DoubleType) /
          col("cents_now").cast(DoubleType)).as("restated_share"))
      .orderBy(col("month"))
  }

  /** q309 — SEASONAL INDEX by calendar month: each month-of-year's
    * order count and revenue relative to a uniform year (index 1.0 =
    * no seasonality) — the classic retail seasonality readout that
    * complements q248 (autocorrelation detects the cycle) and q291
    * (MASE prices predicting with it): this names WHICH months carry
    * the cycle. Counts and cents exact; each index is the exact
    * integer mass cross-multiplied by 12, then ONE division. One
    * partial-agg rollup, O(12) output. */
  def seasonalIndex(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
      .select(month(col("o_orderdate")).cast(LongType).as("month_of_year"),
        (d2(col("o_totalprice")) * 100).cast(LongType).as("cents"))
    val m = o.groupBy(col("month_of_year"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev"))
    val tot = m.agg(sum(col("n_orders")).as("tn"),
      sum(col("rev")).as("tr"))
    m.crossJoin(broadcast(tot))
      .select(col("month_of_year"), col("n_orders"),
        col("rev").cast(LongType).as("revenue_cents"),
        ((col("n_orders") * 12).cast(DoubleType) / col("tn"))
          .as("order_index"),
        ((col("rev") * 12).cast(DoubleType) / col("tr"))
          .as("revenue_index"))
      .orderBy(col("month_of_year"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q309_seasonal_index" -> seasonalIndex,
    "q306_restatement_report" -> restatementReport,
    "q300_local_hour_profile" -> localHourProfile,
    "q299_retention_half_life" -> retentionHalfLife,
    "q298_markov_eval" -> markovEval,
    "q296_lateness_histogram" -> latenessHistogram,
    "q325_peak_concurrency" -> peakConcurrency,
    "q326_funnel_windowed" -> funnelWindowed,
    "q337_funnel_summary" -> funnelSummary,
    "q344_funnel_window_sweep" -> funnelWindowSweep,
    "q350_user_type_diversity" -> userTypeDiversity,
    "q352_asof_tolerance" -> asofJoinTolerance,
    "q353_propensity_labels" -> propensityLabels,
    "q354_temporal_split_embargo" -> temporalSplitEmbargo,
    "q291_mase_forecast" -> maseForecastEval,
    "q96_scd2_current" -> scd2Current,
    "q94_interval_overlap" -> intervalOverlap,
    "q91_cohort_retention" -> cohortRetention,
    "q89_sliding_distinct" -> slidingDistinctUsers,
    "q84_funnel_stages" -> funnelStages,
    "q37_asof_join" -> asofJoin,
    "q38_range_join" -> rangeJoin,
    "q39_session_window" -> sessionWindows,
    "q58_full_outer_join" -> fullOuterDaily,
    "q61_gapfill_days" -> gapFillDays,
    "q62_moving_average" -> movingAverage,
    "q76_scd2_history" -> scd2History,
    "q189_forward_fill" -> forwardFill,
    "q190_scd2_asof" -> scd2AsOf,
    "q191_linear_interpolate" -> linearInterpolate,
    "q109_trend_regression" -> trendRegression,
    "q111_anomaly_days" -> anomalyDays,
    "q114_group_correlation" -> groupCorrelation,
    "q248_autocorrelation" -> autocorrelation,
    "q115_ohlc_bars" -> ohlcBars,
    "q116_twap" -> twap,
    "q121_cusum_changepoint" -> cusumChangepoint,
    "q125_clean_conversions" -> cleanConversions,
    "q132_rolling_correlation" -> rollingCorrelation,
    "q135_golden_record" -> goldenRecord,
    "q141_transition_matrix" -> transitionMatrix,
    "q142_last_touch_attribution" -> lastTouchAttribution,
    "q204_linear_attribution" -> linearAttribution,
    "q208_session_paths" -> sessionPaths,
    "q254_pattern_match" -> patternMatch,
    "q255_nearest_asof" -> nearestAsof,
    "q256_business_days" -> businessDayLatency,
    "q258_clamped_balance" -> clampedBalance,
    "q259_interval_conflicts" -> intervalConflicts,
    "q261_fifo_matching" -> fifoMatching,
    "q269_token_bucket" -> tokenBucket,
    "q217_session_skipgrams" -> sessionSkipgrams,
    "q224_modal_behavior" -> modalBehavior,
    "q235_session_distance" -> sessionDistance,
    "q239_feature_assembly" -> featureAssembly,
    "q240_pit_features" -> pitFeatures,
    "q225_try_arithmetic" -> tryArithmetic,
    "q152_period_growth" -> periodGrowth,
    "q156_funnel_latency" -> funnelLatency,
    "q160_cumulative_uniques" -> cumulativeUniques,
    "q163_day_overlap" -> dayOverlap,
    "q165_ltv_triangle" -> ltvTriangle,
    "q167_session_stats" -> sessionStats,
    "q168_longest_streak" -> longestStreak)

  /** Per-group least-squares TREND (slope + intercept of value over
    * time) — the drift detector of metric pipelines: one
    * partial-aggregable pass collecting the five classic sufficient
    * statistics (n, Σx, Σx², Σy, Σxy), then the closed-form solution
    * per group. x is the epoch day; y is the event value.
    *
    * Determinism: Σy and Σxy accumulate in EXACT decimal (x is an
    * integer, y is a 2-dp measure — products stay decimal-exact), Σx
    * and Σx² in int64; each sum is cast to double ONCE and the
    * closed form is then the identical IEEE expression in both
    * engines. No float summation order anywhere.
    *
    * Scale: sufficient statistics are commutative monoids — map-side
    * combine reduces each partition to 5 numbers per group, the only
    * shuffle is one row per (group × partition). This is the pattern
    * for ANY moment-based statistic at 100 TB (variance, covariance,
    * correlation, higher moments): never sort, never window, just
    * partial-agg the moments. */
  def trendRegression(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .withColumn("x",
        datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast(LongType))
    val g = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(d2(col("value"))).as("sy"),
      sum(d2(col("value")) * col("x")).as("sxy"))
    val nD = col("n").cast(DoubleType)
    val sxD = col("sx").cast(DoubleType)
    val sxxD = col("sxx").cast(DoubleType)
    val syD = col("sy").cast(DoubleType)
    val sxyD = col("sxy").cast(DoubleType)
    val denom = nD * sxxD - sxD * sxD
    val slope = (nD * sxyD - sxD * syD) / denom
    g.filter(col("n") >= 2 && denom =!= 0.0)
      .select(col("event_type"), col("n"),
        slope.as("slope"),
        ((syD - slope * sxD) / nD).as("intercept"))
      .orderBy(col("event_type"))
  }

  /** OHLC RESAMPLING: open/high/low/close/volume bars per (type, day)
    * — the time-series downsampling primitive (metrics, finance, any
    * tick stream). Open/close are the q09 argmax pattern (min/max of a
    * (ts, id, value) struct — partially aggregable, NO window sort),
    * so the whole bar is ONE map-side-combinable aggregate pass: at
    * 100 TB each partition reduces to one candidate row per bar before
    * the shuffle, the exact shape a tick store needs. */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .withColumn("day", to_date(col("ts")))
    ev.groupBy(col("event_type"), col("day"))
      .agg(
        min(struct(col("ts").as("t"), col("event_id").as("id"),
          col("value").as("v"))).getField("v").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts").as("t"), col("event_id").as("id"),
          col("value").as("v"))).getField("v").as("close"),
        count(lit(1)).as("n"),
        dsum(col("value")).as("volume"))
      .orderBy(col("event_type"), col("day"))
  }

  /** TIME-WEIGHTED average (TWAP) per (type, day): each observation
    * weighted by its holding time until the next observation — the
    * correct mean for irregularly-sampled series (a plain avg
    * over-weights bursts). Last observation of a bar carries no
    * forward duration and drops out (span-interior TWAP).
    *
    * Determinism: durations are EXACT integer microseconds (both
    * engines store micros after the ns→us read truncation), weights
    * multiply 2-dp decimals → exact decimal numerator, int64
    * denominator, ONE double division at the end.
    *
    * Scale: one (type, day)-partitioned window for the lead (the same
    * single shuffle the bar rollup needs anyway — Catalyst reuses the
    * partitioning), then a partial-aggregable sum. */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .withColumn("day", to_date(col("ts")))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .withColumn("dur_us", expr("timestampdiff(MICROSECOND, ts, next_ts)"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(d2(col("value")) * col("dur_us")).as("num"),
        sum(col("dur_us")).as("den"))
      .filter(col("den") > 0L)
      .select(col("event_type"), col("day"),
        (col("num").cast(DoubleType) / col("den").cast(DoubleType)).as("twap"),
        col("den").as("span_us"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Markov TRANSITION matrix of user behavior: counts and conditional
    * probabilities of (event_type → next event_type) within each
    * user's timeline — the session-flow / next-action model behind
    * funnels and anomaly rules. One user-key shuffle for the lead
    * window, then a partial-aggregable pair count; probabilities
    * divide two exact integers once. */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(broadcast(fromTotals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast(DoubleType) / col("n_from").cast(DoubleType)).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** LAST-TOUCH ATTRIBUTION: credit each purchase to the user's most
    * recent preceding touch (click/view) within a 7-day lookback, else
    * 'direct' — the marketing-attribution primitive. Scale shape: the
    * as-of semantics ride ONE user-key shuffle + per-partition sort
    * (`last(ignoreNulls)` over an unbounded-preceding frame), never a
    * purchase×touch range probe; the two `last` calls pick their values
    * off the same row because both markers are null on exactly the
    * non-touch rows. Revenue is exact DECIMAL, cast once. */
  def lastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .filter(col("event_type").isin("click", "view", "purchase"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("click", "view")
    ev.withColumn("last_touch",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("last_touch_ts",
        last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("last_touch_ts").isNotNull &&
          col("last_touch_ts") >= col("ts") - expr("INTERVAL 7 DAYS"),
          col("last_touch")).otherwise(lit("direct")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("revenue"))
      .orderBy(col("channel"))
  }

  /** The 30-minute-gap sessionization shared by every session-path
    * operator (q167/q208/q217/q235 must agree on what a session IS):
    * appends `sid` to (user_id, ts, event_id, +extra cols) via the
    * lag-detect + running-sum islands pattern — one user-key window
    * pass. */
  private val SessionGapUs = 1800000000L
  private def withSessionIds(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    df.withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s", (col("prev").isNull ||
        expr("timestampdiff(MICROSECOND, prev, ts)") > SessionGapUs)
        .cast(LongType))
      .withColumn("sid", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev", "new_s")
  }

  /** SESSION PATH MINING: the 20 most common within-session event-type
    * SEQUENCES (q167's 30-minute-gap sessions, each rendered as
    * 'view>click>purchase'-style path strings) — the navigation-flow
    * report that funnels (q84) hard-code one hypothesis of and this
    * discovers from data. Determinism: the path string is built from a
    * `sort_array(collect_list(struct(ts, event_id, type)))` — the sort
    * imposes the (ts, event_id) total order AFTER collection, so the
    * rendering is partition-order-free (collect_list alone is not),
    * mirroring the oracle's `STRING_AGG(... ORDER BY ts, event_id)`.
    * Scale shape: one user-key shuffle carries the sessionization
    * windows AND the per-session fold; the path rollup
    * partial-aggregates; top-20 is a TakeOrderedAndProject heap.
    * Per-session state is gap-bounded (a 30-min-gap session is as long
    * as real traffic makes it, not the whole history). */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame = {
    withSessionIds(events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))
      .groupBy(col("user_id"), col("sid"))
      .agg(concat_ws(">", transform(
        sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))),
        s => s.getField("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  /** SESSION BEHAVIORAL DRIFT: Levenshtein distance between each
    * user's CONSECUTIVE session paths — how much a user's in-session
    * behavior pattern changes visit to visit (distance 0 = ritualized
    * behavior, large = exploratory), emitted as a corpus-level
    * distance histogram. Paths are rendered in a SINGLE-CHAR alphabet
    * (each event type mapped to 'A'+its alphabetical rank via a
    * broadcast O(types) dictionary) so character-level edit distance
    * equals event-level edit distance — multi-char type names would
    * make 'click'→'view' cost 5 edits, not 1. One user-key shuffle
    * carries sessionization, path fold AND the consecutive-session
    * lag; the histogram rollup is O(distinct distances). */
  def sessionDistance(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val wt = Window.orderBy(col("event_type"))
    val dict = ev.select(col("event_type")).distinct()
      .withColumn("ch", chr(lit(64) + row_number().over(wt)))
    val paths = withSessionIds(ev.join(broadcast(dict), "event_type"))
      .groupBy(col("user_id"), col("sid"))
      .agg(concat_ws("", transform(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("ch")))),
        s => s.getField("ch"))).as("path"))
    val ws = Window.partitionBy(col("user_id")).orderBy(col("sid"))
    paths.withColumn("prev_path", lag(col("path"), 1).over(ws))
      .filter(col("prev_path").isNotNull)
      .select(levenshtein(col("prev_path"), col("path")).cast(LongType)
        .as("dist"))
      .groupBy(col("dist")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("dist"))
  }

  /** SEQUENCE-PATTERN DETECTION — SQL MATCH_RECOGNIZE's core (PATTERN
    * (A+ B) over ordered rows PER PARTITION) emulated at scale:
    * sessions rendered as single-char event strings (a FIXED literal
    * alphabet — click→C, error→X, purchase→P, signup→S, view→V,
    * else O — so the pattern below is meaningful prose, unlike q235's
    * data-derived alphabet), then the motif "browsing burst ending in
    * a purchase" = regex `[VC]+P` counted per session. Greedy
    * leftmost non-overlapping matching agrees between Java regex and
    * DuckDB's RE2 for this pattern class (no backrefs, no
    * lookaround), so the match COUNTS are engine-portable even
    * though the engines' regex libraries differ. One corpus-level
    * readout row: sessions, matched sessions, total matches, max
    * matches in one session — all exact integers.
    *
    * Scale shape: the q167 sessionization's one user-key shuffle
    * carries the path fold; the regex runs once per SESSION STRING
    * (bounded by the 30-min gap, not history length) as a per-row
    * codegen'd projection; the final rollup is a partial-aggregable
    * 4-column fold to a single row — nothing wide ever shuffles. */
  def patternMatch(spark: SparkSession, dir: String): DataFrame = {
    val ch = when(col("event_type") === "click", "C")
      .when(col("event_type") === "error", "X")
      .when(col("event_type") === "purchase", "P")
      .when(col("event_type") === "signup", "S")
      .when(col("event_type") === "view", "V")
      .otherwise("O")
    withSessionIds(events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), ch.as("ch")))
      .groupBy(col("user_id"), col("sid"))
      .agg(concat_ws("", transform(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("ch")))),
        s => s.getField("ch"))).as("path"))
      .select(size(regexp_extract_all(col("path"), lit("[VC]+P"), lit(0)))
        .cast(LongType).as("m"))
      .agg(count(lit(1)).as("n_sessions"),
        sum((col("m") > 0).cast(LongType)).as("n_matched"),
        sum(col("m")).as("n_matches"),
        max(col("m")).as("max_matches"))
  }

  /** CLAMPED RUNNING BALANCE — the order-dependent NONLINEAR fold no
    * window frame can express: per user, balance_t = max(0,
    * balance_{t-1} + amount_t) (a wallet/inventory that cannot go
    * negative; every clamp FORGETS history, so this is not a running
    * sum minus a constant — prefix-sum tricks provably cannot rewrite
    * it). Done declaratively with the `aggregate` higher-order
    * function over the session-sorted event array — a codegen'd
    * per-group fold with a struct accumulator, NO UDF and NO
    * row-at-a-time driver loop; deterministic amounts (event_id
    * parity signs the exact cents) keep both engines integer-exact.
    * Output: final balance + how often the floor clamped (the
    * stockout/overdraft count a replenishment policy reads).
    *
    * Scale shape: ONE user-key shuffle carries collect+sort+fold;
    * per-group state is the event list, bounded by per-user activity
    * (the same bound every per-user window in q141/q208 lives with —
    * a pathological whale user would page one task, the cue to
    * sessionize the fold). The oracle unrolls the identical
    * recurrence as a per-user recursive CTE — step i joins row i+1 —
    * so both engines walk the same chain. */
  def clampedBalance(spark: SparkSession, dir: String): DataFrame = {
    val amt = when(col("event_id") % 2 === 0, col("cents"))
      .otherwise(-col("cents"))
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        (d2(col("value")) * 100).cast(LongType).as("cents"))
      .select(col("user_id"), col("ts"), col("event_id"), amt.as("amt"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("amt")))).as("evs"))
      .select(col("user_id"),
        expr("""aggregate(evs,
          named_struct('bal', bigint(0), 'clamps', bigint(0)),
          (acc, x) -> named_struct(
            'bal', greatest(acc.bal + x.amt, bigint(0)),
            'clamps', acc.clamps +
              if(acc.bal + x.amt < bigint(0), bigint(1), bigint(0))))
          """).as("st"))
      .select(col("user_id"), col("st.bal").as("final_bal_cents"),
        col("st.clamps").as("n_clamps"))
      .orderBy(col("user_id"))
  }

  /** INTERVAL CONFLICT DETECTION (double-booking audit) by SWEEP, not
    * self-join: each user's events become usage intervals
    * [ts, ts + duration] (duration = exact cents mod 3600 seconds —
    * deterministic, integer); an interval CONFLICTS iff it starts
    * before the running max end of all EARLIER intervals of the same
    * user. That running max is one window aggregate over the
    * (ts, event_id)-ordered frame ending 1 PRECEDING — the classic
    * O(n log n) sweep-line, where the naive formulation is a
    * quadratic interval × interval self-theta-join per key (q94's
    * bucketization handles the cross-TABLE case; within-key conflict
    * only needs the sweep). One user-key shuffle carries sort +
    * window + rollup; output is the per-user booking-health row. */
  def intervalConflicts(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        (d2(col("value")) * 100).cast(LongType).as("cents"))
      .withColumn("fin", expr("ts + make_dt_interval(0, 0, 0, cents % 3600)"))
      .withColumn("prev_max_end", max(col("fin")).over(w))
      .select(col("user_id"),
        (col("prev_max_end").isNotNull &&
          col("ts") < col("prev_max_end")).cast(LongType).as("conflict"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("conflict")).as("n_conflicts"))
      .orderBy(col("user_id"))
  }

  /** TOKEN-BUCKET RATE-LIMITER audit — [[clampedBalance]]'s one-sided
    * clamp completed to the full two-sided recurrence every API
    * gateway runs: tokens refill with ELAPSED TIME (1 per 120 s,
    * integer-floor), cap at 100, each request costs its deterministic
    * integer price, and an unaffordable request is REJECTED without
    * consuming (count it, don't partially serve it). Replayed per
    * user over the event history as the same codegen'd `aggregate`
    * HOF fold (state = (prev_ts, tokens, throttle count) — carrying
    * prev_ts in the accumulator is what makes time-based refill a
    * fold, no self-join on adjacent rows); the answer to "which
    * users would this rate-limit policy actually throttle, and how
    * often" BEFORE deploying the policy. All-integer arithmetic
    * (unix micros, floor division); oracle walks the identical
    * recurrence as a per-user recursive CTE. */
  def tokenBucket(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        ((d2(col("value")) * 100).cast(LongType) % 100 + 1).as("cost"))
      .select(col("user_id"),
        // ts is NTZ; the session TZ is pinned UTC, so the cast is the
        // identity on the instant and matches DuckDB's epoch_us
        struct(expr("unix_micros(cast(ts as timestamp))").as("us"),
          col("event_id"),
          col("cost")).as("e"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(col("user_id"),
        expr("""aggregate(evs,
          named_struct('p', bigint(-1), 'tok', bigint(100),
            'thr', bigint(0)),
          (acc, x) -> named_struct(
            'p', x.us,
            'tok', least(bigint(100), acc.tok +
                if(acc.p < bigint(0), bigint(0),
                  (x.us - acc.p) div 120000000))
              - if(least(bigint(100), acc.tok +
                  if(acc.p < bigint(0), bigint(0),
                    (x.us - acc.p) div 120000000)) >= x.cost,
                x.cost, bigint(0)),
            'thr', acc.thr +
              if(least(bigint(100), acc.tok +
                  if(acc.p < bigint(0), bigint(0),
                    (x.us - acc.p) div 120000000)) >= x.cost,
                bigint(0), bigint(1))))""").as("st"))
      .select(col("user_id"), col("st.tok").as("final_tokens"),
        col("st.thr").as("n_throttled"))
      .orderBy(col("user_id"))

  /** FIFO LOT MATCHING via cumulative-interval overlap — the
    * cost-basis/inventory primitive ("match each sale to the oldest
    * unconsumed purchase lots") that looks inherently sequential but
    * is EXACTLY the overlap of two cumulative-quantity number lines:
    * buy lot i occupies [Σqty_{<i}, Σqty_{≤i}) of the user's supply
    * line, sell j the same on the demand line, and FIFO assigns their
    * INTERSECTION — matched(i,j) = max(0, min(b_end, s_end) −
    * max(b_start, s_start)). The matching is ORDINAL (the i-th unit
    * of demand consumes the i-th unit of supply, each line in its own
    * time order — backorder-filling; a sell arriving before supply
    * queues rather than vanishes). Two window cumsums + one per-user
    * overlap join replace the row-at-a-time lot walk; all quantities
    * are exact integers.
    *
    * Scale shape: both cumsums ride ONE user-key shuffle; the match
    * join is user-equi + interval residual (the q38 shape), and the
    * overlap predicate makes total matched pairs ≤ buys + sells per
    * user (each pair consumes a lot boundary) — never the quadratic
    * all-pairs. Unmatched demand (oversold) and supply (inventory)
    * fall out of the same totals. */
  def fifoMatching(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        ((d2(col("value")) * 100).cast(LongType) % 100 + 1).as("qty"))
    def line(t: String, pre: String) = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.filter(col("event_type") === t)
        .withColumn("end", sum(col("qty")).over(w))
        .select(col("user_id"), (col("end") - col("qty")).as(s"${pre}_start"),
          col("end").as(s"${pre}_end"))
    }
    val buys = line("purchase", "b")
    val sells = line("click", "s")
    val matched = buys.join(sells,
        buys("user_id") === sells("user_id") &&
        col("b_start") < col("s_end") && col("s_start") < col("b_end"))
      .groupBy(buys("user_id").as("user_id"))
      .agg(count(lit(1)).as("n_lot_pairs"),
        sum(least(col("b_end"), col("s_end")) -
          greatest(col("b_start"), col("s_start"))).as("matched_qty"))
    val totals = ev.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", col("qty"))
        .otherwise(0L)).as("bought"),
        sum(when(col("event_type") === "click", col("qty"))
          .otherwise(0L)).as("sold"))
    totals.join(matched, Seq("user_id"), "left")
      .select(col("user_id"), col("bought"), col("sold"),
        coalesce(col("n_lot_pairs"), lit(0L)).as("n_lot_pairs"),
        coalesce(col("matched_qty"), lit(0L)).as("matched_qty"),
        (col("sold") - coalesce(col("matched_qty"), lit(0L)))
          .as("oversold_qty"))
      .orderBy(col("user_id"))
  }

  /** FEATURE-STORE ASSEMBLY: one row per user with the model-serving
    * feature block — recency (calendar days, DATE-difference on both
    * sides: day-BOUNDARY semantics agree cross-engine where
    * timestamp-diff DAY does not), frequency, monetary exact cents,
    * behavioral width — materialized in ONE aggregation pass over the
    * event log (the offline feature-store refresh shape: N features =
    * N partial-aggregable columns, never N scans). Scope anchor is
    * the broadcast corpus max-ts, so a refresh is reproducible from
    * the data alone. */
  def featureAssembly(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val mx = ev.agg(max(to_date(col("ts"))).as("mxd"))
    ev.crossJoin(broadcast(mx))
      .groupBy(col("user_id"))
      .agg(
        datediff(max(col("mxd")), max(to_date(col("ts"))))
          .cast(LongType).as("recency_days"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase",
          (d2(col("value")) * 100).cast(LongType)).otherwise(0L))
          .as("monetary_cents"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("user_id"))
  }

  /** POINT-IN-TIME-CORRECT features (the feature store's serving
    * half): for every purchase, the user's event count and purchase
    * spend STRICTLY BEFORE that moment — the unbounded-preceding-to-
    * 1-PRECEDING frame is the no-leakage contract (a training row
    * must never see its own label's timestamp, the bug PIT joins
    * exist to prevent). One user-key shuffle carries both frames;
    * exact cents. */
  def pitFeatures(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(spark, dir)
      .withColumn("cents", (d2(col("value")) * 100).cast(LongType))
      .withColumn("prior_events", count(lit(1)).over(w))
      .withColumn("prior_cents", coalesce(
        sum(when(col("event_type") === "purchase", col("cents"))).over(w),
        lit(0L)))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("prior_events"), col("prior_cents"))
      .orderBy(col("event_id"))
  }

  /** MODE() aggregate surface (Spark 3.4+/4 `mode(expr,
    * deterministic)`): each user's modal event type via the native
    * partial-aggregable MODE with the DETERMINISTIC flag — ties break
    * to the lowest value, which is the contract the oracle's
    * count-then-row_number derivation states explicitly. The point of
    * gating this surface: `mode()` without the flag is
    * partition-order-dependent and would flap the hash gate — the
    * deterministic variant is the only one a reproducible pipeline
    * may use. Distribution histogram output keeps rows O(types). */
  def modalBehavior(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(expr("mode(event_type, true)").as("modal_type"))
      .groupBy(col("modal_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("modal_type"))

  /** TRY_* ANSI-safety surface (Spark 4 runs ANSI mode ON, so raw
    * arithmetic THROWS on division-by-zero/overflow): revenue per
    * click per day through `try_divide`, which yields NULL on a
    * zero-click day instead of killing the job — the per-row
    * error-tolerance contract a 100 TB batch needs (one pathological
    * group must not fail the stage). Oracle spells the same semantics
    * as NULLIF. Revenue is exact cents, ONE cast to double before the
    * division. */
  def tryArithmetic(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_clicks"),
        sum(when(col("event_type") === "purchase",
          (d2(col("value")) * 100).cast(LongType)).otherwise(0L))
          .as("cents"))
      .withColumn("cents_per_click",
        expr("try_divide(CAST(cents AS DOUBLE), n_clicks)"))
      .orderBy(col("day"))

  /** SESSION SKIP-GRAMS: ordered event-type pairs within a forward
    * window of 3 inside each 30-min-gap session — the word2vec-style
    * context-pair extraction over behavioral sequences (q141's
    * transition matrix sees only ADJACENT pairs; skip-grams catch
    * 'view … purchase' with distractions between). Top-20 pairs by
    * count. Scale shape: one user-key shuffle sessionizes AND builds
    * the per-session ordered array; pair generation is a per-row
    * nested-HOF flatten (no position self-join — the q210 rule); the
    * (w1, w2) rollup partial-aggregates; heap top-20. Sessions
    * shorter than 2 events are filtered before the index sequence
    * (the q205 guard). */
  def sessionSkipgrams(spark: SparkSession, dir: String): DataFrame = {
    withSessionIds(events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))
      .groupBy(col("user_id"), col("sid"))
      .agg(transform(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("event_type")))),
        s => s.getField("event_type")).as("types"))
      .filter(size(col("types")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(types) - 1), i ->
          |  transform(sequence(i + 1, least(i + 3, size(types))), j ->
          |    struct(element_at(types, i) AS w1,
          |           element_at(types, j) AS w2))))""".stripMargin)).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** MULTI-TOUCH LINEAR ATTRIBUTION — q142's last-touch rule replaced
    * by the equal-split model: every click/view in the purchase's
    * 7-day lookback shares the revenue. Credit is EXACT-INTEGER
    * largest-remainder apportionment in cents (the q146 rule: each
    * touch gets cents DIV n, the first cents MOD n touches in
    * (ts, event_id) order get the extra cent), so per-purchase credits
    * sum to the purchase EXACTLY — no float shares, conservation
    * audit-clean. Touchless purchases credit 'direct' whole.
    *
    * Scale shape: ONE user-key equi-join carries the 7-day range as a
    * residual predicate (per-user fan-out is lookback-bounded, never
    * purchase×touch cartesian); the rank and touch-count windows both
    * ride a single purchase-id shuffle; the final rollup
    * partial-aggregates to O(channels). */
  def linearAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("ts").as("tts"), col("event_id").as("tid"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"),
        (d2(col("value")) * 100).cast(LongType).as("cents"))
    val j = purchases.join(touches, Seq("user_id"))
      .filter(col("tts") < col("pts") &&
        col("tts") >= col("pts") - expr("INTERVAL 7 DAYS"))
    val wp = Window.partitionBy(col("pid"))
    val credited = j
      .withColumn("r", row_number()
        .over(wp.orderBy(col("tts"), col("tid"))).cast(LongType))
      .withColumn("ntouch", count(lit(1)).over(wp))
      .withColumn("credit_cents", expr("cents DIV ntouch") +
        when(col("r") <= col("cents") % col("ntouch"), 1L).otherwise(0L))
    val directRows = purchases
      .join(credited.select(col("pid")).distinct(), Seq("pid"), "left_anti")
      .select(lit("direct").as("channel"), col("cents").as("credit_cents"))
    credited.select(col("channel"), col("credit_cents"))
      .unionByName(directRows)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit_cents")).as("credited_cents"))
      .orderBy(col("channel"))
  }

  /** PERIOD-OVER-PERIOD growth: monthly revenue with MoM and YoY
    * deltas — the first chart of every revenue dashboard. The fact
    * scan partial-aggregates to O(months) rows; the lag windows run
    * over that tiny aggregate (the single-partition window is
    * O(months), the q146/q90 smallness argument). Growth = exact
    * DECIMAL difference, then ONE double division — both engines see
    * identical operands, so the doubles match bit-for-bit. */
  def periodGrowth(spark: SparkSession, dir: String): DataFrame = {
    val monthly = load(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz")
        .as("month"))
      .agg(sum(d2(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy(col("month"))
    def growth(lagN: Int): Column = {
      val prev = lag(col("rev"), lagN).over(w)
      (col("rev") - prev).cast(DoubleType) / prev.cast(DoubleType)
    }
    monthly
      .withColumn("mom_growth", growth(1))
      .withColumn("yoy_growth", growth(12))
      .select(col("month"), col("rev").cast(DoubleType).as("revenue"),
        col("mom_growth"), col("yoy_growth"))
      .orderBy(col("month"))
  }

  /** FUNNEL LATENCY percentiles: per signup-month cohort, the median
    * and p90 time from a user's first signup to their first subsequent
    * purchase — the activation-latency SLA chart. Lags are exact int64
    * microseconds; the percentiles are integer RANK CUTOFFS
    * (k50=(n+1)/2, k90=⌈9n/10⌉ — the float-free percentile rule) read
    * off a window PARTITIONED by cohort, so every window is keyed and
    * the plan stays parallel across cohorts. One user-key shuffle to
    * pair the firsts, one cohort shuffle for the ranks. */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val firstBuy = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .join(signups, "user_id")
      .filter(col("ts") >= col("s_ts"))
      .groupBy(col("user_id"), col("s_ts")).agg(min(col("ts")).as("p_ts"))
    val lagged = firstBuy
      .select(date_trunc("month", col("s_ts")).cast("timestamp_ntz")
        .as("cohort_month"), col("user_id"),
        expr("timestampdiff(MICROSECOND, s_ts, p_ts)").as("lag_us"))
    val w = Window.partitionBy(col("cohort_month"))
      .orderBy(col("lag_us"), col("user_id"))
    val wN = Window.partitionBy(col("cohort_month"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lagged
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(wN))
      .groupBy(col("cohort_month"))
      .agg(max(col("n")).as("n_converted"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("lag_us")))
          .as("p50_us"),
        max(when(col("rn") === expr("(9 * n + 9) DIV 10"), col("lag_us")))
          .as("p90_us"))
      .orderBy(col("cohort_month"))
  }

  /** CUMULATIVE UNIQUES: total distinct users ever seen, by day — the
    * registered-users growth curve. COUNT(DISTINCT) OVER (ORDER BY
    * day) is unwindowable and a running self-join is quadratic; the
    * scale form is first-seen reduction: min(day) per user (one keyed
    * shuffle, partial-aggregable), roll to a per-day first-seen
    * histogram, then ONE cumulative window over O(days) rows. */
  def cumulativeUniques(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    // dense axis over every OBSERVED day: an active day with zero new
    // users must still carry the running total forward (n_new = 0)
    val days = ev.select(col("day")).distinct()
    val firstSeen = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_first"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(firstSeen, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_first"), lit(0L)))
      .withColumn("n_total", sum(col("n_new")).over(wCum))
      .select(col("day"), col("n_new"), col("n_total"))
      .orderBy(col("day"))
  }

  /** DAY-OVER-DAY audience overlap: for each day, how many of its
    * active users return tomorrow — retention rate and Jaccard of the
    * two audience sets. The scale form is the PAIR COUNT, not set
    * materialization: distinct (day, user) rows self-join on the
    * composite equi-key (user, day+1) — Catalyst takes the date_add
    * expression as a join key, so there is no per-user day×day
    * explosion and no giant per-day array to build. Counts exact,
    * ratios one division each. */
  def dayOverlap(spark: SparkSession, dir: String): DataFrame = {
    val du = events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val counts = du.groupBy(col("day")).agg(count(lit(1)).as("n_users"))
    val common = du.alias("a").join(du.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.day") === date_add(col("a.day"), 1))
      .groupBy(col("a.day").as("day")).agg(count(lit(1)).as("n_common"))
    val nc = coalesce(col("n_common"), lit(0L))
    counts
      .join(counts.select(date_sub(col("day"), 1).as("day"),
        col("n_users").as("n_next")), "day")
      .join(common, Seq("day"), "left")
      .select(col("day"), col("n_users").as("n_today"), col("n_next"),
        nc.as("n_common"),
        (nc.cast(DoubleType) / col("n_users").cast(DoubleType))
          .as("retention"),
        (nc.cast(DoubleType) /
          (col("n_users") + col("n_next") - nc).cast(DoubleType))
          .as("jaccard"))
      .orderBy(col("day"))
  }

  /** LTV TRIANGLE: cumulative revenue per acquisition cohort by
    * month-age — q91's retention triangle with money instead of
    * presence, the payback-period table. Cohort = month of first
    * order (one keyed reduction + one keyed join); age is an integer
    * month difference (year·12+month arithmetic — months_between's
    * fractional double never appears); the running total stays DECIMAL
    * through the cohort-PARTITIONED window (float cusum order differs
    * between engines; decimal is associative-exact) and casts once. */
  def ltvTriangle(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
      .select(col("o_custkey").as("key"), col("o_orderdate").as("d"),
        d2(col("o_totalprice")).as("p"))
    val first = o.groupBy(col("key")).agg(min(col("d")).as("fd"))
    val mi = (c: Column) => year(c) * 12 + month(c)
    val cell = o.join(first, "key")
      .groupBy(date_trunc("month", col("fd")).cast("timestamp_ntz")
          .as("cohort_month"),
        (mi(col("d")) - mi(col("fd"))).as("age_months"))
      .agg(sum(col("p")).as("rev"))
    val w = Window.partitionBy(col("cohort_month")).orderBy(col("age_months"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell.withColumn("cum", sum(col("rev")).over(w))
      .select(col("cohort_month"), col("age_months"),
        col("rev").cast(DoubleType).as("revenue"),
        col("cum").cast(DoubleType).as("cum_revenue"))
      .orderBy(col("cohort_month"), col("age_months"))
  }

  /** SESSION STATS: gap-based sessionization (30-min inactivity cut —
    * the islands pattern: lag-detect session starts, running-sum them
    * into session ids, all inside ONE user-partitioned window pass),
    * rolled to per-day engagement health: session count, bounce share
    * (single-event sessions), median duration. Durations are exact
    * int64 microseconds; the median is the k50 integer rank cutoff on
    * a day-PARTITIONED window. Complements q39 (native session_window
    * aggregation): same semantics family, but this form yields the
    * per-session ROWS a downstream join can consume. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    val GapUs = 1800000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sessions = events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s", (col("prev").isNull ||
        expr("timestampdiff(MICROSECOND, prev, ts)") > GapUs).cast(LongType))
      .withColumn("sid",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("s_start"),
        max(col("ts")).as("s_end"))
      .select(to_date(col("s_start")).as("day"), col("user_id"), col("sid"),
        col("n_events"),
        expr("timestampdiff(MICROSECOND, s_start, s_end)").as("dur_us"))
    val wDay = Window.partitionBy(col("day"))
      .orderBy(col("dur_us"), col("user_id"), col("sid"))
    val wN = Window.partitionBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sessions
      .withColumn("rn", row_number().over(wDay).cast(LongType))
      .withColumn("n", count(lit(1)).over(wN))
      .groupBy(col("day"))
      .agg(max(col("n")).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("dur_us")))
          .as("p50_dur_us"))
      .withColumn("bounce_share",
        col("n_bounce").cast(DoubleType) / col("n_sessions").cast(DoubleType))
      .orderBy(col("day"))
  }

  /** LONGEST-STREAK distribution: per user, the longest run of
    * CONSECUTIVE active days, rolled to a histogram — the habit/
    * gamification metric. The islands trick without a gap join:
    * day_number − row_number is CONSTANT within a consecutive run, so
    * one user-partitioned window + two keyed aggregations find every
    * streak; all integers. */
  def longestStreak(spark: SparkSession, dir: String): DataFrame = {
    val du = events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    du.withColumn("grp",
        datediff(col("day"), to_date(lit("1990-01-01"))) -
          row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("streak_len"))
      .groupBy(col("user_id"))
      .agg(max(col("streak_len")).as("longest"))
      .groupBy(col("longest"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("longest"))
  }

  /** GOLDEN-RECORD survivorship: one consolidated row per user with
    * each field taken from that field's OWN latest occurrence — the
    * entity-resolution merge rule (MDM "most recent non-null wins")
    * that q19's whole-row keep-last can't express: a user's latest
    * click value and latest purchase value come from different rows.
    * Each field is an independent max(struct(ts, id, value)) argmax,
    * so the whole record is ONE partial-aggregable pass — no N-way
    * self-join of per-field keep-lasts. */
  /** Per-field latest-wins argmax over (ts, event_id) — the ONE
    * survivorship rule shared by the batch golden record (q135) and
    * its streaming twin (q140); the two must never fork. */
  private[graft] def latestBy(eventType: String, field: Column,
      out: String): Column =
    max(when(col("event_type") === eventType,
      struct(col("ts").as("t"), col("event_id").as("id"),
        field.as("v")))).getField("v").as(out)

  def goldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.groupBy(col("user_id"))
      .agg(
        latestBy("click", col("value"), "last_click_value"),
        latestBy("purchase", col("value"), "last_purchase_value"),
        max(when(col("event_type") === "signup", col("ts")))
          .as("last_signup_ts"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** ROLLING 14-day correlation between two daily series (click vs
    * purchase totals) — the co-movement monitor built by composing
    * [[groupCorrelation]]'s moment algebra with a sliding frame: all
    * six sufficient statistics are WINDOW sums of exact decimals
    * (decimal addition is associative-exact, so DuckDB's segment-tree
    * window accumulation and Spark's sliding-frame updates cannot
    * diverge — the float version would), and the closed form is one
    * IEEE expression per row. Emitted only for full 14-day frames
    * with nonzero variance on both sides.
    *
    * Scale: the window runs over the DAY-level rollup (≤ one row per
    * day), not raw events — the q90 histogram principle; the raw
    * stream contributes one partial-aggregable pass. */
  def rollingCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val W = 14
    val daily = events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        coalesce(sum(when(col("event_type") === "click", d2(col("value")))),
          lit(0).cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).as("x"),
        coalesce(sum(when(col("event_type") === "purchase", d2(col("value")))),
          lit(0).cast(DecimalType(18, 2))).cast(DecimalType(18, 2)).as("y"))
    val w = Window.orderBy(col("day")).rowsBetween(-(W - 1), 0)
    val rolled = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxx",
        sum((col("x") * col("x")).cast(DecimalType(38, 4))).over(w))
      .withColumn("syy",
        sum((col("y") * col("y")).cast(DecimalType(38, 4))).over(w))
      .withColumn("sxy",
        sum((col("x") * col("y")).cast(DecimalType(38, 4))).over(w))
    val nD = col("n").cast(DoubleType)
    def d(c: String) = col(c).cast(DoubleType)
    val cov = nD * d("sxy") - d("sx") * d("sy")
    val vx = nD * d("sxx") - d("sx") * d("sx")
    val vy = nD * d("syy") - d("sy") * d("sy")
    rolled.filter(col("n") === W)
      .withColumn("vx", vx).withColumn("vy", vy)
      .filter(col("vx") > 0.0 && col("vy") > 0.0)
      .select(col("day"), (cov / sqrt(col("vx") * col("vy"))).as("corr"))
      .orderBy(col("day"))
  }

  /** SEQUENCE-PATTERN detection: clicks converting to a purchase
    * within 4h with NO error event in between — the negative-condition
    * funnel (fraud rules, clean-conversion attribution) that q84's
    * plain ordered funnel can't express. Formulated as two
    * forward-looking window minima per event (next purchase ts, next
    * error ts over ROWS 1 FOLLOWING..UNBOUNDED): a click converts
    * cleanly iff its next purchase lands inside the horizon and
    * strictly precedes its next error. ONE user-key shuffle and sort
    * serves both minima — no per-pattern self-joins, which is what
    * keeps arbitrary A→B-without-C rules linear at 100 TB. Timestamp
    * comparisons only, no arithmetic to drift. */
  def cleanConversions(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val wF = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    ev.withColumn("next_p",
        min(when(col("event_type") === "purchase", col("ts"))).over(wF))
      .withColumn("next_e",
        min(when(col("event_type") === "error", col("ts"))).over(wF))
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(when(col("next_p").isNotNull &&
            col("next_p") <= col("ts") + expr("interval 4 hours") &&
            (col("next_e").isNull || col("next_e") > col("next_p")), 1L)
          .otherwise(0L)).as("n_clean_conversions"))
      .orderBy(col("user_id"))
  }

  /** CUSUM CHANGEPOINT estimate per event type: the day where the
    * cumulative deviation of the daily total from its overall mean
    * peaks — the classic offline CUSUM location estimator (Page 1954)
    * for "when did this metric's level shift?".
    *
    * Determinism trick: the textbook cusum_t = Σ_{i≤t}(x_i − x̄)
    * mixes a float mean into a running float sum — and engines
    * disagree on window-sum accumulation order (DuckDB's segment tree
    * vs a left fold), so float cusums drift. Scaling by n removes the
    * division: n·cusum_t = Σ_{i≤t}(n·x_i − S₁) is EXACT decimal
    * arithmetic end to end — any summation tree gives the same
    * decimal — and /n happens once, after the argmax, for display.
    *
    * Scale: day-level rollup first (partial-aggregable), windows only
    * over the tiny per-type day series — the q90 histogram principle
    * again. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(d2(col("value"))).cast(DecimalType(18, 2)).as("ds"))
    val stats = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("ds")).as("s1"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPeak = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("ncusum")).desc, col("day"))
    daily.join(stats, "event_type")
      .withColumn("ncusum",
        sum(col("n") * col("ds") - col("s1")).over(wRun))
      .withColumn("rn", row_number().over(wPeak))
      .filter(col("rn") === 1 && col("n") >= 2)
      .select(col("event_type"), col("day").as("change_day"),
        (col("ncusum").cast(DoubleType) / col("n").cast(DoubleType))
          .as("peak_cusum"))
      .orderBy(col("event_type"))
  }

  /** Per-group Pearson CORRELATION between two measures (quantity vs
    * price per return flag) — the third member of the moment-statistic
    * family with [[trendRegression]] and [[anomalyDays]]: one
    * partial-aggregable pass over six sufficient statistics, exact
    * decimal sums, one cast each to double, then the closed form as an
    * identical IEEE expression in both engines (sqrt is
    * correctly-rounded IEEE everywhere). */
  /** AUTOCORRELATION of the daily-revenue series at lags 1..7 — the
    * ACF readout that decides seasonality before anyone fits a
    * forecasting model (a weekly cycle shows as a spike at lag 7).
    * Built as q114's exact-decimal Pearson machinery applied to the
    * series joined against itself: daily totals stay EXACT
    * DECIMAL(18,2) (one partial-aggregable rollup), the lag table is
    * a 7-row broadcast, pairs come from an equi-join on day+k (never
    * a window over the whole series — the series is grouped O(days)
    * rows, but the same shape holds when "day" is "minute"), and the
    * six moment sums per lag are DECIMAL(38,4) integers-in-disguise
    * with q114's ONE fixed double sequence at the end (the oracle
    * routes its int128 sums through VARCHAR for correctly-rounded
    * casts, the q114/q155 rule). */
  def autocorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(d2(col("o_totalprice"))).cast(DecimalType(18, 2)).as("rev"))
    val lags = spark.range(1, 8).select(col("id").cast(IntegerType).as("k"))
    val pairs = daily.alias("a").crossJoin(broadcast(lags))
      .join(daily.alias("b"),
        date_add(col("a.day"), col("k")) === col("b.day"))
    val g = pairs.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      sum(col("a.rev")).as("sx"),
      sum((col("a.rev") * col("a.rev")).cast(DecimalType(38, 4))).as("sxx"),
      sum(col("b.rev")).as("sy"),
      sum((col("b.rev") * col("b.rev")).cast(DecimalType(38, 4))).as("syy"),
      sum((col("a.rev") * col("b.rev")).cast(DecimalType(38, 4))).as("sxy"))
    val nD = col("n").cast(DoubleType)
    def d(c: String) = col(c).cast(DoubleType)
    val cov = nD * d("sxy") - d("sx") * d("sy")
    val vx = nD * d("sxx") - d("sx") * d("sx")
    val vy = nD * d("syy") - d("sy") * d("sy")
    g.filter(col("n") >= 2)
      .select(col("k").cast(LongType).as("k"), col("n"),
        (cov / sqrt(vx * vy)).as("acf"))
      .orderBy(col("k"))
  }

  def groupCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val g = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(d2(col("l_quantity"))).as("sx"),
      sum((d2(col("l_quantity")) * d2(col("l_quantity")))
        .cast(DecimalType(38, 4))).as("sxx"),
      sum(d2(col("l_extendedprice"))).as("sy"),
      sum((d2(col("l_extendedprice")) * d2(col("l_extendedprice")))
        .cast(DecimalType(38, 4))).as("syy"),
      sum((d2(col("l_quantity")) * d2(col("l_extendedprice")))
        .cast(DecimalType(38, 4))).as("sxy"))
    val nD = col("n").cast(DoubleType)
    def d(c: String) = col(c).cast(DoubleType)
    val cov = nD * d("sxy") - d("sx") * d("sy")
    val vx = nD * d("sxx") - d("sx") * d("sx")
    val vy = nD * d("syy") - d("sy") * d("sy")
    g.filter(col("n") >= 2)
      .select(col("l_returnflag"), col("n"),
        (cov / sqrt(vx * vy)).as("corr"))
      .orderBy(col("l_returnflag"))
  }

  /** Metric ANOMALY detection: days whose per-type daily total
    * deviates ≥ 2σ from that type's mean daily total — the alerting
    * primitive over any pipeline metric stream, built on the same
    * sufficient-statistics shape as [[trendRegression]].
    *
    * Determinism: the daily totals stay EXACT DECIMAL through both
    * aggregation levels (the squares are DECIMAL(18,2)² = DECIMAL(37,4)
    * — inside both engines' 38-digit cap, so no precision-loss
    * rounding); each per-type moment is cast to double ONCE and
    * mean/variance/z are then identical IEEE expressions. The
    * variance guard (> 0) keeps sqrt off the NaN path in both
    * engines.
    *
    * Scale: two partial-aggregable passes (day rollup, then moment
    * rollup over ~days-per-type rows), one broadcast-sized stats
    * table joined back — the fact stream is scanned once and never
    * re-shuffled. */
  def anomalyDays(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(d2(col("value"))).cast(DecimalType(18, 2)).as("ds"))
    val stats = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_days"),
      sum(col("ds")).as("s1"),
      sum(col("ds") * col("ds")).as("s2"))
    val nD = col("n_days").cast(DoubleType)
    val s1D = col("s1").cast(DoubleType)
    val s2D = col("s2").cast(DoubleType)
    val mean = s1D / nD
    val variance = (s2D - s1D * s1D / nD) / nD
    val z = (col("ds").cast(DoubleType) - col("mean")) / sqrt(col("variance"))
    daily.join(
        stats.filter(col("n_days") >= 2)
          .select(col("event_type"), mean.as("mean"), variance.as("variance"))
          .filter(col("variance") > 0.0),
        "event_type")
      .withColumn("z", z)
      .filter(abs(col("z")) >= 2.0)
      .select(col("event_type"), col("day"),
        col("ds").cast(DoubleType).as("daily_sum"), col("z"))
      .orderBy(col("event_type"), col("day"))
  }

  private val dailySql =
    """SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    // q309: same exact masses, ×12 cross-multiplication, one division
    "q309_seasonal_index" ->
      """WITH o AS (SELECT MONTH(o_orderdate) AS m,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |g AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |        CAST(SUM(cents) AS BIGINT) AS rev
        |      FROM o GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS tn,
        |        CAST(SUM(rev) AS BIGINT) AS tr FROM g)
        |SELECT CAST(m AS BIGINT) AS month_of_year, n_orders,
        |  rev AS revenue_cents,
        |  CAST(n_orders * 12 AS DOUBLE) / tn AS order_index,
        |  CAST(rev * 12 AS DOUBLE) / tr AS revenue_index
        |FROM g CROSS JOIN t ORDER BY month_of_year""".stripMargin,
    // q306: identical synthetic transaction-time rule and cutoff
    "q306_restatement_report" ->
      """WITH o AS (SELECT
        |    CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
        |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 7 AS INT)
        |      AS tx_day,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT month,
        |  CAST(SUM(CASE WHEN tx_day <= DATE '1998-07-01' THEN cents
        |    ELSE 0 END) AS BIGINT) AS cents_known,
        |  CAST(SUM(cents) AS BIGINT) AS cents_now,
        |  CAST(SUM(cents) AS BIGINT)
        |    - CAST(SUM(CASE WHEN tx_day <= DATE '1998-07-01' THEN cents
        |        ELSE 0 END) AS BIGINT) AS restated_cents,
        |  CAST(CAST(SUM(cents) AS BIGINT)
        |    - CAST(SUM(CASE WHEN tx_day <= DATE '1998-07-01' THEN cents
        |        ELSE 0 END) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
        |    AS restated_share
        |FROM o GROUP BY 1 ORDER BY month""".stripMargin,
    // q300: same zone table, same UTC→local direction (session tz is
    // UTC in both engines' containers)
    "q300_local_hour_profile" ->
      """WITH e AS (SELECT ts,
        |    (['UTC', 'America/New_York', 'Europe/Paris', 'Asia/Tokyo'])
        |      [CAST(user_id % 4 AS INT) + 1] AS tz
        |  FROM events)
        |SELECT tz,
        |  CAST(HOUR(timezone(tz, ts::TIMESTAMPTZ)) AS BIGINT)
        |    AS local_hour,
        |  COUNT(*) AS n_events
        |FROM e GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // q299: q91's CTEs verbatim + the densified 0..7 grid
    "q299_retention_half_life" ->
      """WITH du AS (SELECT DISTINCT DATE_TRUNC('day', ts) AS day, user_id
        |            FROM events),
        |cohorts AS (SELECT user_id, MIN(day) AS cohort_day
        |            FROM du GROUP BY 1),
        |g AS (SELECT c.cohort_day, DATE_DIFF('day', c.cohort_day, u.day) AS k,
        |        COUNT(DISTINCT u.user_id) AS n_users
        |      FROM du u JOIN cohorts c ON u.user_id = c.user_id
        |      WHERE DATE_DIFF('day', c.cohort_day, u.day) <= 7
        |      GROUP BY 1, 2),
        |n0 AS (SELECT cohort_day, n_users AS n0 FROM g WHERE k = 0),
        |dense AS (SELECT n0.cohort_day, n0.n0, s.k,
        |            COALESCE(g.n_users, 0) AS n_users
        |          FROM n0
        |          CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS k) s
        |          LEFT JOIN g ON g.cohort_day = n0.cohort_day
        |            AND g.k = s.k)
        |SELECT cohort_day, CAST(MAX(n0) AS BIGINT) AS cohort_size,
        |  CAST(MIN(CASE WHEN k >= 1 AND n_users * 2 < n0 THEN k END)
        |    AS BIGINT) AS half_life_day,
        |  CAST(SUM(CASE WHEN k = 7 THEN n_users ELSE 0 END) AS BIGINT)
        |    AS n_day7,
        |  CAST(SUM(CASE WHEN k = 7 THEN n_users ELSE 0 END) AS DOUBLE)
        |    / CAST(MAX(n0) AS BIGINT) AS day7_retention
        |FROM dense GROUP BY 1 ORDER BY 1""".stripMargin,
    // q298: identical midpoint split, argmax rule, and eval join
    "q298_markov_eval" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, ts,
        |    epoch_us(ts) AS us FROM events),
        |b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev),
        |p0 AS (SELECT user_id, event_type, us,
        |        LEAD(event_type, 1) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS next_type
        |      FROM ev),
        |p AS (SELECT p0.*, us <= (lo + hi) // 2 AS is_train
        |      FROM p0 CROSS JOIN b WHERE next_type IS NOT NULL),
        |tc AS (SELECT event_type, next_type, COUNT(*) AS c
        |       FROM p WHERE is_train GROUP BY 1, 2),
        |m AS (SELECT event_type, next_type AS pred_type FROM (
        |        SELECT event_type, next_type,
        |          ROW_NUMBER() OVER (PARTITION BY event_type
        |            ORDER BY c DESC, next_type) AS rn
        |        FROM tc) WHERE rn = 1)
        |SELECT p.event_type, COUNT(*) AS n_eval,
        |  CAST(SUM(CASE WHEN m.pred_type = p.next_type THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hits,
        |  CAST(SUM(CASE WHEN m.pred_type = p.next_type THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*) AS accuracy
        |FROM p LEFT JOIN m USING (event_type)
        |WHERE NOT is_train
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q296: the oracle states the naive global prefix-max window; the
    // two-level block/offset form computes the same running max
    // q354: same midpoint + embargo arithmetic
    "q354_temporal_split_embargo" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |           FROM events),
        |b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM e),
        |s AS (SELECT e.*, (b.lo + b.hi) // 2 AS cut FROM e, b)
        |SELECT CASE WHEN us < cut - 86400000000 THEN '1_train'
        |            WHEN us >= cut THEN '3_test'
        |            ELSE '2_embargo' END AS split,
        |  COUNT(*) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(MIN(us) AS BIGINT) AS t_min_us,
        |  CAST(MAX(us) AS BIGINT) AS t_max_us
        |FROM s
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // q353: the forward frame, same tag order
    "q353_propensity_labels" ->
      """SELECT event_id, user_id, ts,
        |  COALESCE(gap > 0 AND gap <= 86400000000, FALSE) AS converted_24h,
        |  CASE WHEN gap > 0 AND gap <= 86400000000 THEN gap END
        |    AS time_to_conversion_us,
        |  CASE WHEN gap > 0 AND gap <= 86400000000 THEN npe END
        |    AS purchase_event
        |FROM (
        |  SELECT event_id, user_id, ts, tag,
        |    epoch_us(FIRST_VALUE(pt IGNORE NULLS) OVER w) - epoch_us(ts)
        |      AS gap,
        |    FIRST_VALUE(pe IGNORE NULLS) OVER w AS npe
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |      CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
        |      CASE WHEN event_type = 'purchase' THEN event_id END AS pe,
        |      CASE WHEN event_type = 'purchase' THEN ts END AS pt
        |    FROM events WHERE event_type IN ('purchase', 'click'))
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
        |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        |WHERE tag = 1
        |ORDER BY event_id""".stripMargin,
    // q352: q37's window + the staleness nulling
    "q352_asof_tolerance" ->
      """SELECT event_id, user_id, ts,
        |  CASE WHEN age_us <= 3600000000 THEN lpe END AS purchase_event,
        |  CASE WHEN age_us <= 3600000000 THEN lpv END AS purchase_value,
        |  COALESCE(age_us <= 3600000000, FALSE) AS fresh
        |FROM (
        |  SELECT event_id, user_id, ts, tag,
        |    epoch_us(ts) - epoch_us(LAST_VALUE(pt IGNORE NULLS) OVER w)
        |      AS age_us,
        |    LAST_VALUE(pe IGNORE NULLS) OVER w AS lpe,
        |    LAST_VALUE(pv IGNORE NULLS) OVER w AS lpv
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |      CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
        |      CASE WHEN event_type = 'purchase' THEN event_id END AS pe,
        |      CASE WHEN event_type = 'purchase' THEN value END AS pv,
        |      CASE WHEN event_type = 'purchase' THEN ts END AS pt
        |    FROM events WHERE event_type IN ('purchase', 'click'))
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |WHERE tag = 1
        |ORDER BY event_id""".stripMargin,
    // q350: same moments; HUGEINT squares, VARCHAR-detour casts
    "q350_user_type_diversity" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS c
        |           FROM events GROUP BY 1, 2),
        |g AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
        |        CAST(COUNT(*) AS BIGINT) AS n_types,
        |        SUM(CAST(c AS HUGEINT) * c) AS sumsq
        |      FROM c GROUP BY 1)
        |SELECT user_id, n_events, n_types,
        |  CAST(CAST(CAST(n_events AS HUGEINT) * n_events AS VARCHAR)
        |       AS DOUBLE)
        |    / CAST(CAST(sumsq AS VARCHAR) AS DOUBLE) AS effective_types
        |FROM g
        |ORDER BY user_id""".stripMargin,
    // q344: one q326-shaped chain per window
    "q344_funnel_window_sweep" ->
      """WITH v1 AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |      WHERE event_type = 'view' GROUP BY 1),
        |c1 AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |      FROM events e JOIN v1 ON e.user_id = v1.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v1.t_view
        |        AND e.ts <= v1.t_view + INTERVAL 1 DAY
        |      GROUP BY 1),
        |p1 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |      FROM events e JOIN c1 ON e.user_id = c1.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c1.t_click
        |        AND e.ts <= c1.t_click + INTERVAL 1 DAY
        |      GROUP BY 1),
        |v3 AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |      WHERE event_type = 'view' GROUP BY 1),
        |c3 AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |      FROM events e JOIN v3 ON e.user_id = v3.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v3.t_view
        |        AND e.ts <= v3.t_view + INTERVAL 3 DAY
        |      GROUP BY 1),
        |p3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |      FROM events e JOIN c3 ON e.user_id = c3.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c3.t_click
        |        AND e.ts <= c3.t_click + INTERVAL 3 DAY
        |      GROUP BY 1),
        |v7 AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |      WHERE event_type = 'view' GROUP BY 1),
        |c7 AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |      FROM events e JOIN v7 ON e.user_id = v7.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v7.t_view
        |        AND e.ts <= v7.t_view + INTERVAL 7 DAY
        |      GROUP BY 1),
        |p7 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |      FROM events e JOIN c7 ON e.user_id = c7.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c7.t_click
        |        AND e.ts <= c7.t_click + INTERVAL 7 DAY
        |      GROUP BY 1),
        |v14 AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |      WHERE event_type = 'view' GROUP BY 1),
        |c14 AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |      FROM events e JOIN v14 ON e.user_id = v14.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v14.t_view
        |        AND e.ts <= v14.t_view + INTERVAL 14 DAY
        |      GROUP BY 1),
        |p14 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |      FROM events e JOIN c14 ON e.user_id = c14.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c14.t_click
        |        AND e.ts <= c14.t_click + INTERVAL 14 DAY
        |      GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS window_days,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v1) AS n_view,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c1) AS n_click,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p1) AS n_purchase
        |UNION ALL SELECT CAST(3 AS BIGINT) AS window_days,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v3) AS n_view,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c3) AS n_click,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p3) AS n_purchase
        |UNION ALL SELECT CAST(7 AS BIGINT) AS window_days,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v7) AS n_view,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c7) AS n_click,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p7) AS n_purchase
        |UNION ALL SELECT CAST(14 AS BIGINT) AS window_days,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v14) AS n_view,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c14) AS n_click,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p14) AS n_purchase
        |ORDER BY window_days""".stripMargin,
    // q337: q326's CTEs + the one-row rollup
    "q337_funnel_summary" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view
        |        AND e.ts <= v.t_view + INTERVAL 7 DAY
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |        AND e.ts <= c.t_click + INTERVAL 7 DAY
        |      GROUP BY 1),
        |j AS (SELECT v.user_id, c.t_click, p.t_purchase
        |      FROM v LEFT JOIN c ON v.user_id = c.user_id
        |             LEFT JOIN p ON v.user_id = p.user_id),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_view,
        |        CAST(SUM(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_click,
        |        CAST(SUM(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_purchase
        |      FROM j)
        |SELECT n_view, n_click, n_purchase,
        |  CAST(n_click AS DOUBLE) / n_view AS view_to_click,
        |  CASE WHEN n_click > 0
        |       THEN CAST(n_purchase AS DOUBLE) / n_click END
        |    AS click_to_purchase
        |FROM g""".stripMargin,
    // q326: q84's CTEs + the 7-day hop windows
    "q326_funnel_windowed" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view
        |        AND e.ts <= v.t_view + INTERVAL 7 DAY
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |        AND e.ts <= c.t_click + INTERVAL 7 DAY
        |      GROUP BY 1)
        |SELECT v.user_id, t_view, t_click, t_purchase,
        |  1 + CAST(t_click IS NOT NULL AS BIGINT)
        |    + CAST(t_purchase IS NOT NULL AS BIGINT) AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    // q325: plain-window sweep — same total order (v encodes
    // end-before-start), same per-day max
    "q325_peak_concurrency" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
        |p AS (SELECT event_id, us * 2 + 1 AS v, 1 AS delta FROM e
        |      UNION ALL
        |      SELECT event_id, (us + 1800000000) * 2 AS v, -1 FROM e),
        |c AS (SELECT v, CAST(SUM(delta) OVER (ORDER BY v, event_id
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
        |      FROM p)
        |SELECT CAST(make_timestamp(v // 2) AS DATE) AS day,
        |  MAX(conc) AS peak_concurrency, COUNT(*) AS n_points
        |FROM c
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q296_lateness_histogram" ->
      """WITH e AS (SELECT event_id, user_id, event_id // 256 AS blk,
        |    epoch_us(ts) AS us FROM events),
        |p AS (SELECT event_id, us,
        |        COALESCE(MAX(us) OVER (ORDER BY blk, user_id, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |          AS prevmax
        |      FROM e),
        |l AS (SELECT GREATEST(0, prevmax - us) AS late_us FROM p
        |      WHERE prevmax >= 0),
        |b AS (SELECT late_us,
        |        CASE WHEN late_us = 0 THEN 0
        |             WHEN late_us <= CAST(60000000 AS BIGINT) THEN 1
        |             WHEN late_us <= CAST(600000000 AS BIGINT) THEN 2
        |             WHEN late_us <= CAST(3600000000 AS BIGINT) THEN 3
        |             ELSE 4 END AS band_rank,
        |        CASE WHEN late_us = 0 THEN 'on_time'
        |             WHEN late_us <= CAST(60000000 AS BIGINT) THEN 'lt_1m'
        |             WHEN late_us <= CAST(600000000 AS BIGINT) THEN 'lt_10m'
        |             WHEN late_us <= CAST(3600000000 AS BIGINT) THEN 'lt_1h'
        |             ELSE 'gte_1h' END AS band
        |      FROM l)
        |SELECT CAST(band_rank AS BIGINT) AS band_rank, band,
        |  COUNT(*) AS n_events,
        |  CAST(MAX(late_us) // 1000000 AS BIGINT) AS max_late_s
        |FROM b GROUP BY 1, 2
        |ORDER BY band_rank""".stripMargin,
    // q291: identical row-lag series; MASE mirrors the Spark division
    // sequence verbatim
    "q291_mase_forecast" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, y,
        |        LAG(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7,
        |        LAG(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1
        |      FROM daily),
        |s AS (SELECT event_type, COUNT(*) AS n_days,
        |        CAST(SUM(CASE WHEN y7 IS NOT NULL THEN ABS(y - y7)
        |          ELSE 0 END) AS BIGINT) AS sae_seasonal,
        |        CAST(SUM(CASE WHEN y1 IS NOT NULL THEN ABS(y - y1)
        |          ELSE 0 END) AS BIGINT) AS sae_naive1,
        |        COUNT(y7) AS n_eval7, COUNT(y1) AS n_eval1
        |      FROM l GROUP BY 1)
        |SELECT event_type, n_days, sae_seasonal, sae_naive1,
        |  n_eval7, n_eval1,
        |  CASE WHEN sae_naive1 > 0 AND n_eval7 > 0 AND n_eval1 > 0 THEN
        |    (CAST(sae_seasonal AS DOUBLE) / n_eval7)
        |      / (CAST(sae_naive1 AS DOUBLE) / n_eval1) END AS mase
        |FROM s ORDER BY event_type""".stripMargin,
    "q168_longest_streak" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |g AS (SELECT user_id,
        |    DATE_DIFF('day', DATE '1990-01-01', day)
        |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM du),
        |s AS (SELECT user_id, grp, COUNT(*) AS streak_len
        |      FROM g GROUP BY 1, 2),
        |m AS (SELECT user_id, CAST(MAX(streak_len) AS BIGINT) AS longest
        |      FROM s GROUP BY 1)
        |SELECT longest, COUNT(*) AS n_users
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q167_session_stats" ->
      """WITH m AS (SELECT user_id, ts, event_id,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |      OR DATE_DIFF('microsecond', LAG(ts) OVER w, ts) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sid AS (SELECT user_id, ts, event_id,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m),
        |s AS (SELECT CAST(MIN(ts) AS DATE) AS day, user_id, sid,
        |    COUNT(*) AS n_events,
        |    DATE_DIFF('microsecond', MIN(ts), MAX(ts)) AS dur_us
        |  FROM sid GROUP BY user_id, sid),
        |r AS (SELECT day, n_events, dur_us,
        |    ROW_NUMBER() OVER (PARTITION BY day
        |      ORDER BY dur_us, user_id, sid) AS rn,
        |    COUNT(*) OVER (PARTITION BY day) AS n
        |  FROM s)
        |SELECT day, CAST(MAX(n) AS BIGINT) AS n_sessions,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounce,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN dur_us END) AS p50_dur_us,
        |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(MAX(n) AS DOUBLE) AS bounce_share
        |FROM r GROUP BY day ORDER BY day""".stripMargin,
    "q165_ltv_triangle" ->
      """WITH o AS (SELECT o_custkey AS key, o_orderdate AS d,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
        |f AS (SELECT key, MIN(d) AS fd FROM o GROUP BY 1),
        |cell AS (SELECT DATE_TRUNC('month', f.fd) AS cohort_month,
        |    (YEAR(o.d) * 12 + MONTH(o.d))
        |      - (YEAR(f.fd) * 12 + MONTH(f.fd)) AS age_months,
        |    SUM(o.p) AS rev
        |  FROM o JOIN f USING (key) GROUP BY 1, 2)
        |SELECT cohort_month, age_months,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  CAST(SUM(rev) OVER (PARTITION BY cohort_month ORDER BY age_months
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS cum_revenue
        |FROM cell ORDER BY cohort_month, age_months""".stripMargin,
    "q163_day_overlap" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events),
        |c AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users
        |      FROM du GROUP BY 1),
        |ov AS (SELECT a.day, CAST(COUNT(*) AS BIGINT) AS n_common
        |       FROM du a JOIN du b
        |         ON a.user_id = b.user_id AND b.day = a.day + 1
        |       GROUP BY 1)
        |SELECT c0.day, c0.n_users AS n_today, c1.n_users AS n_next,
        |  COALESCE(ov.n_common, 0) AS n_common,
        |  CAST(COALESCE(ov.n_common, 0) AS DOUBLE)
        |    / CAST(c0.n_users AS DOUBLE) AS retention,
        |  CAST(COALESCE(ov.n_common, 0) AS DOUBLE)
        |    / CAST(c0.n_users + c1.n_users - COALESCE(ov.n_common, 0)
        |        AS DOUBLE) AS jaccard
        |FROM c c0 JOIN c c1 ON c1.day = c0.day + 1
        |LEFT JOIN ov ON ov.day = c0.day
        |ORDER BY c0.day""".stripMargin,
    // first-seen histogram left-joined onto the dense observed-day axis
    "q160_cumulative_uniques" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |d AS (SELECT DISTINCT day FROM ev),
        |f AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY 1),
        |h AS (SELECT day, COUNT(*) AS n_first FROM f GROUP BY 1)
        |SELECT d.day, CAST(COALESCE(h.n_first, 0) AS BIGINT) AS n_new,
        |  CAST(SUM(COALESCE(h.n_first, 0)) OVER (ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_total
        |FROM d LEFT JOIN h USING (day) ORDER BY d.day""".stripMargin,
    "q156_funnel_latency" ->
      """WITH s AS (SELECT user_id, MIN(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p AS (SELECT e.user_id, s.s_ts, MIN(e.ts) AS p_ts
        |      FROM events e JOIN s USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts >= s.s_ts
        |      GROUP BY 1, 2),
        |l AS (SELECT DATE_TRUNC('month', s_ts) AS cohort_month, user_id,
        |        EPOCH_US(p_ts) - EPOCH_US(s_ts) AS lag_us FROM p),
        |r AS (SELECT cohort_month, lag_us,
        |        ROW_NUMBER() OVER (PARTITION BY cohort_month
        |          ORDER BY lag_us, user_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY cohort_month) AS n
        |      FROM l)
        |SELECT cohort_month, CAST(MAX(n) AS BIGINT) AS n_converted,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN lag_us END) AS p50_us,
        |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_us END) AS p90_us
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q152_period_growth" ->
      """WITH m AS (SELECT DATE_TRUNC('month', o_orderdate) AS month,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |l AS (SELECT month, rev,
        |    LAG(rev, 1) OVER (ORDER BY month) AS prev1,
        |    LAG(rev, 12) OVER (ORDER BY month) AS prev12
        |  FROM m)
        |SELECT month, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(rev - prev1 AS DOUBLE) / CAST(prev1 AS DOUBLE) AS mom_growth,
        |  CAST(rev - prev12 AS DOUBLE) / CAST(prev12 AS DOUBLE) AS yoy_growth
        |FROM l ORDER BY month""".stripMargin,
    "q239_feature_assembly" ->
      """WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS mxd FROM events)
        |SELECT user_id,
        |  CAST(DATE_DIFF('day', MAX(CAST(ts AS DATE)), MAX(mx.mxd))
        |    AS BIGINT) AS recency_days,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN event_type = 'purchase'
        |    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS monetary_cents,
        |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM events, mx
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q240_pit_features" ->
      """WITH e AS (SELECT event_id, user_id, ts, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |f AS (SELECT event_id, user_id, event_type,
        |    COUNT(*) OVER w AS prior_events,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN cents END) OVER w, 0) AS prior_cents
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, prior_events,
        |  CAST(prior_cents AS BIGINT) AS prior_cents
        |FROM f WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "q235_session_distance" ->
      """WITH dict AS (SELECT event_type,
        |    CHR(64 + CAST(ROW_NUMBER() OVER (ORDER BY event_type)
        |      AS INTEGER)) AS ch
        |  FROM (SELECT DISTINCT event_type FROM events)),
        |e AS (SELECT ev.user_id, ev.ts, ev.event_id, d.ch,
        |    CASE WHEN LAG(ev.ts) OVER w IS NULL
        |      OR DATE_DIFF('microsecond', LAG(ev.ts) OVER w, ev.ts)
        |        > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events ev JOIN dict d USING (event_type)
        |  WINDOW w AS (PARTITION BY ev.user_id ORDER BY ev.ts, ev.event_id)),
        |sid AS (SELECT user_id, ts, event_id, ch,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e),
        |p AS (SELECT user_id, sid,
        |    STRING_AGG(ch, '' ORDER BY ts, event_id) AS path
        |  FROM sid GROUP BY 1, 2),
        |d2 AS (SELECT user_id, path,
        |    LAG(path) OVER (PARTITION BY user_id ORDER BY sid) AS prev_path
        |  FROM p)
        |SELECT CAST(LEVENSHTEIN(prev_path, path) AS BIGINT) AS dist,
        |  COUNT(*) AS n_pairs
        |FROM d2 WHERE prev_path IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q224_modal_behavior" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT user_id, event_type AS modal_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY n DESC, event_type) AS rn
        |  FROM c)
        |SELECT modal_type, COUNT(*) AS n_users
        |FROM m WHERE rn = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q225_try_arithmetic" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_clicks,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS cents
        |  FROM events GROUP BY 1)
        |SELECT day, n_clicks, cents,
        |  CAST(cents AS DOUBLE) / NULLIF(n_clicks, 0) AS cents_per_click
        |FROM d ORDER BY day""".stripMargin,
    "q217_session_skipgrams" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |      OR DATE_DIFF('microsecond', LAG(ts) OVER w, ts) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sid AS (SELECT user_id, ts, event_id, event_type,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m),
        |p AS (SELECT user_id, sid,
        |    LIST(event_type ORDER BY ts, event_id) AS types
        |  FROM sid GROUP BY 1, 2),
        |e1 AS (SELECT types,
        |    UNNEST(GENERATE_SERIES(1, LEN(types) - 1)) AS i
        |  FROM p WHERE LEN(types) >= 2),
        |e2 AS (SELECT types, i,
        |    UNNEST(GENERATE_SERIES(i + 1, LEAST(i + 3, LEN(types)))) AS j
        |  FROM e1),
        |g AS (SELECT types[i] AS w1, types[j] AS w2 FROM e2)
        |SELECT w1, w2, COUNT(*) AS n
        |FROM g GROUP BY 1, 2
        |ORDER BY n DESC, w1, w2 LIMIT 20""".stripMargin,
    "q269_token_bucket" ->
      """WITH RECURSIVE ev AS (SELECT user_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS i,
        |    epoch_us(ts) AS us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 100 + 1
        |      AS cost
        |  FROM events),
        |n AS (SELECT user_id, MAX(i) AS n FROM ev GROUP BY 1),
        |walk(user_id, i, p, tok, thr) AS (
        |  SELECT user_id, CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
        |    CAST(100 AS BIGINT), CAST(0 AS BIGINT) FROM n
        |  UNION ALL
        |  SELECT w.user_id, w.i + 1, e.us,
        |    LEAST(100, w.tok + CASE WHEN w.p < 0 THEN 0
        |        ELSE (e.us - w.p) // 120000000 END)
        |      - CASE WHEN LEAST(100, w.tok + CASE WHEN w.p < 0 THEN 0
        |          ELSE (e.us - w.p) // 120000000 END) >= e.cost
        |        THEN e.cost ELSE 0 END,
        |    w.thr + CASE WHEN LEAST(100, w.tok +
        |        CASE WHEN w.p < 0 THEN 0
        |          ELSE (e.us - w.p) // 120000000 END) >= e.cost
        |      THEN 0 ELSE 1 END
        |  FROM walk w JOIN ev e ON e.user_id = w.user_id
        |    AND e.i = w.i + 1)
        |SELECT w.user_id, w.tok AS final_tokens, w.thr AS n_throttled
        |FROM walk w JOIN n ON w.user_id = n.user_id AND w.i = n.n
        |ORDER BY 1""".stripMargin,
    "q261_fifo_matching" ->
      """WITH ev AS (SELECT user_id, ts, event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 100 + 1
        |      AS qty
        |  FROM events),
        |b AS (SELECT user_id,
        |    SUM(qty) OVER w - qty AS b_start, SUM(qty) OVER w AS b_end
        |  FROM ev WHERE event_type = 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT user_id,
        |    SUM(qty) OVER w - qty AS s_start, SUM(qty) OVER w AS s_end
        |  FROM ev WHERE event_type = 'click'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT b.user_id, COUNT(*) AS n_lot_pairs,
        |    CAST(SUM(LEAST(b_end, s_end) - GREATEST(b_start, s_start))
        |      AS BIGINT) AS matched_qty
        |  FROM b JOIN s ON b.user_id = s.user_id
        |    AND b_start < s_end AND s_start < b_end
        |  GROUP BY 1),
        |t AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN qty
        |      ELSE 0 END) AS BIGINT) AS bought,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN qty
        |      ELSE 0 END) AS BIGINT) AS sold
        |  FROM ev GROUP BY 1)
        |SELECT t.user_id, t.bought, t.sold,
        |  COALESCE(m.n_lot_pairs, 0) AS n_lot_pairs,
        |  CAST(COALESCE(m.matched_qty, 0) AS BIGINT) AS matched_qty,
        |  CAST(t.sold - COALESCE(m.matched_qty, 0) AS BIGINT)
        |    AS oversold_qty
        |FROM t LEFT JOIN m ON t.user_id = m.user_id
        |ORDER BY 1""".stripMargin,
    "q259_interval_conflicts" ->
      """WITH iv AS (SELECT user_id, ts, event_id,
        |    ts + (CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      % 3600) * INTERVAL 1 SECOND AS fin
        |  FROM events),
        |m AS (SELECT user_id, ts,
        |    MAX(fin) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_max_end
        |  FROM iv)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |  CAST(SUM(CASE WHEN prev_max_end IS NOT NULL
        |    AND ts < prev_max_end THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_conflicts
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q258_clamped_balance" ->
      """WITH RECURSIVE ev AS (SELECT user_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS i,
        |    CASE WHEN event_id % 2 = 0 THEN cents ELSE -cents END AS amt
        |  FROM (SELECT user_id, ts, event_id,
        |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |    FROM events)),
        |n AS (SELECT user_id, MAX(i) AS n FROM ev GROUP BY 1),
        |walk(user_id, i, bal, clamps) AS (
        |  SELECT user_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |    CAST(0 AS BIGINT) FROM n
        |  UNION ALL
        |  SELECT w.user_id, w.i + 1,
        |    GREATEST(w.bal + e.amt, 0),
        |    w.clamps + CASE WHEN w.bal + e.amt < 0 THEN 1 ELSE 0 END
        |  FROM walk w JOIN ev e ON e.user_id = w.user_id
        |    AND e.i = w.i + 1)
        |SELECT w.user_id, w.bal AS final_bal_cents, w.clamps AS n_clamps
        |FROM walk w JOIN n ON w.user_id = n.user_id AND w.i = n.n
        |ORDER BY 1""".stripMargin,
    "q255_nearest_asof" ->
      """WITH ev AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS tag
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |m AS (SELECT event_id, user_id, ts, tag,
        |    LAST_VALUE(CASE WHEN tag = 0 THEN ts END IGNORE NULLS)
        |      OVER wb AS p_ts,
        |    LAST_VALUE(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
        |      OVER wb AS p_id,
        |    FIRST_VALUE(CASE WHEN tag = 0 THEN ts END IGNORE NULLS)
        |      OVER wf AS n_ts,
        |    FIRST_VALUE(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
        |      OVER wf AS n_id
        |  FROM ev
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, tag, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY ts, tag, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id,
        |  CASE WHEN p_ts IS NULL AND n_ts IS NULL THEN NULL
        |    WHEN n_ts IS NULL OR (p_ts IS NOT NULL AND
        |      DATE_DIFF('microsecond', p_ts, ts)
        |        <= DATE_DIFF('microsecond', ts, n_ts)) THEN p_id
        |    ELSE n_id END AS nearest_error_id,
        |  CASE WHEN p_ts IS NULL AND n_ts IS NULL THEN NULL
        |    WHEN n_ts IS NULL OR (p_ts IS NOT NULL AND
        |      DATE_DIFF('microsecond', p_ts, ts)
        |        <= DATE_DIFF('microsecond', ts, n_ts))
        |      THEN -DATE_DIFF('microsecond', p_ts, ts)
        |    ELSE DATE_DIFF('microsecond', ts, n_ts) END AS delta_us
        |FROM m WHERE tag = 1 ORDER BY event_id""".stripMargin,
    "q256_business_days" ->
      """WITH b AS (SELECT
        |    DATE_DIFF('day', DATE '1900-01-01',
        |      CAST(o_orderdate AS DATE)) AS d1,
        |    DATE_DIFF('day', DATE '1900-01-01',
        |      CAST(l_shipdate AS DATE)) AS d2
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT ((d2 // 7) * 5 + LEAST(d2 % 7, 5))
        |    - ((d1 // 7) * 5 + LEAST(d1 % 7, 5)) AS latency_bd,
        |  COUNT(*) AS n_items
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q254_pattern_match" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |      OR DATE_DIFF('microsecond', LAG(ts) OVER w, ts) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sid AS (SELECT user_id, ts, event_id, event_type,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m),
        |p AS (SELECT user_id, sid,
        |    STRING_AGG(CASE event_type WHEN 'click' THEN 'C'
        |        WHEN 'error' THEN 'X' WHEN 'purchase' THEN 'P'
        |        WHEN 'signup' THEN 'S' WHEN 'view' THEN 'V'
        |        ELSE 'O' END, '' ORDER BY ts, event_id) AS path
        |  FROM sid GROUP BY 1, 2),
        |c AS (SELECT CAST(LEN(REGEXP_EXTRACT_ALL(path, '[VC]+P'))
        |    AS BIGINT) AS m FROM p)
        |SELECT COUNT(*) AS n_sessions,
        |  CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_matched,
        |  CAST(SUM(m) AS BIGINT) AS n_matches,
        |  CAST(MAX(m) AS BIGINT) AS max_matches
        |FROM c""".stripMargin,
    "q208_session_paths" ->
      """WITH m AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN LAG(ts) OVER w IS NULL
        |      OR DATE_DIFF('microsecond', LAG(ts) OVER w, ts) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sid AS (SELECT user_id, ts, event_id, event_type,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m),
        |p AS (SELECT user_id, sid,
        |    STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM sid GROUP BY 1, 2)
        |SELECT path, COUNT(*) AS n_sessions
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "q204_linear_attribution" ->
      """WITH t AS (SELECT user_id, event_type AS channel, ts AS tts,
        |    event_id AS tid
        |  FROM events WHERE event_type IN ('click', 'view')),
        |p AS (SELECT user_id, event_id AS pid, ts AS pts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT p.pid, p.cents, t.channel, t.tts, t.tid
        |  FROM p JOIN t ON t.user_id = p.user_id
        |   AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 7 DAY),
        |c AS (SELECT pid, channel, cents,
        |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tts, tid) AS r,
        |    COUNT(*) OVER (PARTITION BY pid) AS ntouch
        |  FROM j),
        |cr AS (SELECT channel, cents // ntouch +
        |    CASE WHEN r <= cents % ntouch THEN 1 ELSE 0 END AS credit_cents
        |  FROM c
        |  UNION ALL
        |  SELECT 'direct', cents FROM p
        |  WHERE pid NOT IN (SELECT pid FROM j))
        |SELECT channel, COUNT(*) AS n_credits,
        |  CAST(SUM(credit_cents) AS BIGINT) AS credited_cents
        |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,
    "q142_last_touch_attribution" ->
      """WITH ev AS (SELECT * FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')),
        |a AS (SELECT event_type, ts, value,
        |    LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
        |        THEN event_type END IGNORE NULLS) OVER w AS last_touch,
        |    LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
        |        THEN ts END IGNORE NULLS) OVER w AS last_touch_ts
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT CASE WHEN last_touch_ts IS NOT NULL
        |    AND last_touch_ts >= ts - INTERVAL 7 DAY
        |    THEN last_touch ELSE 'direct' END AS channel,
        |  COUNT(*) AS n_purchases,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q141_transition_matrix" ->
      """WITH l AS (SELECT event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |p AS (SELECT event_type AS from_type, next_type AS to_type,
        |        COUNT(*) AS n
        |      FROM l WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        |      FROM p GROUP BY 1)
        |SELECT p.from_type, p.to_type, p.n,
        |  CAST(p.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
        |FROM p JOIN t USING (from_type)
        |ORDER BY p.from_type, p.to_type""".stripMargin,
    // per-field argmax via ROW_NUMBER per type — the q09 duality again
    "q135_golden_record" ->
      """WITH r AS (SELECT user_id, event_type, ts, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |l AS (SELECT * FROM r WHERE rn = 1),
        |cnt AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1)
        |SELECT c.user_id,
        |  MAX(CASE WHEN l.event_type = 'click' THEN l.value END)
        |    AS last_click_value,
        |  MAX(CASE WHEN l.event_type = 'purchase' THEN l.value END)
        |    AS last_purchase_value,
        |  MAX(CASE WHEN l.event_type = 'signup' THEN l.ts END)
        |    AS last_signup_ts,
        |  c.n_events
        |FROM cnt c LEFT JOIN l ON l.user_id = c.user_id
        |GROUP BY c.user_id, c.n_events
        |ORDER BY c.user_id""".stripMargin,
    "q132_rolling_correlation" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DECIMAL(18,2)) AS x,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DECIMAL(18,2)) AS y
        |  FROM events GROUP BY 1),
        |r AS (SELECT day,
        |    COUNT(*) OVER w AS n,
        |    SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
        |    SUM(CAST(CAST(x AS DECIMAL(19,2))
        |      * CAST(x AS DECIMAL(19,2)) AS DECIMAL(38,4))) OVER w AS sxx,
        |    SUM(CAST(CAST(y AS DECIMAL(19,2))
        |      * CAST(y AS DECIMAL(19,2)) AS DECIMAL(38,4))) OVER w AS syy,
        |    SUM(CAST(CAST(x AS DECIMAL(19,2))
        |      * CAST(y AS DECIMAL(19,2)) AS DECIMAL(38,4))) OVER w AS sxy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        |f AS (SELECT day, n,
        |    CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
        |      - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
        |        * CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS cov,
        |    CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
        |      - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
        |        * CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
        |      - CAST(CAST(sy AS VARCHAR) AS DOUBLE)
        |        * CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS vy
        |  FROM r)
        |SELECT day, cov / SQRT(vx * vy) AS corr
        |FROM f WHERE n = 14 AND vx > 0 AND vy > 0
        |ORDER BY day""".stripMargin,
    "q125_clean_conversions" ->
      """WITH w AS (SELECT user_id, ts, event_type,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p,
        |    MIN(CASE WHEN event_type = 'error' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_e
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_clicks,
        |  CAST(SUM(CASE WHEN next_p IS NOT NULL
        |        AND next_p <= ts + INTERVAL 4 HOUR
        |        AND (next_e IS NULL OR next_e > next_p)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_conversions
        |FROM w WHERE event_type = 'click'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // n-scaled cusum keeps the running sum exact-decimal (see the
    // cusumChangepoint scaladoc); the one /n lands after the argmax
    "q121_cusum_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ds
        |  FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, COUNT(*) AS n, SUM(ds) AS s1
        |          FROM daily GROUP BY 1),
        |c AS (SELECT d.event_type, d.day, s.n,
        |    SUM(s.n * d.ds - s.s1) OVER (PARTITION BY d.event_type
        |      ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS ncusum
        |  FROM daily d JOIN stats s USING (event_type)),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY ABS(ncusum) DESC, day) AS rn FROM c)
        |SELECT event_type, day AS change_day,
        |  CAST(ncusum AS DOUBLE) / CAST(n AS DOUBLE) AS peak_cusum
        |FROM r WHERE rn = 1 AND n >= 2
        |ORDER BY event_type""".stripMargin,
    // open/close via ROW_NUMBER asc/desc — the q09 argmax duality of the
    // Spark side's min/max(struct)
    "q115_ohlc_bars" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, ts,
        |             event_id, value
        |           FROM events),
        |r AS (SELECT *,
        |        ROW_NUMBER() OVER (PARTITION BY event_type, day
        |          ORDER BY ts, event_id) AS rn_a,
        |        ROW_NUMBER() OVER (PARTITION BY event_type, day
        |          ORDER BY ts DESC, event_id DESC) AS rn_z
        |      FROM e),
        |agg AS (SELECT event_type, day, MAX(value) AS high,
        |          MIN(value) AS low, COUNT(*) AS n,
        |          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
        |        FROM e GROUP BY 1, 2)
        |SELECT a.event_type, a.day, op.value AS open, a.high, a.low,
        |  cl.value AS close, a.n, a.volume
        |FROM agg a
        |JOIN r op ON op.event_type = a.event_type AND op.day = a.day
        |  AND op.rn_a = 1
        |JOIN r cl ON cl.event_type = a.event_type AND cl.day = a.day
        |  AND cl.rn_z = 1
        |ORDER BY a.event_type, a.day""".stripMargin,
    "q116_twap" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, ts,
        |             event_id, value
        |           FROM events),
        |l AS (SELECT *, LEAD(ts) OVER (PARTITION BY event_type, day
        |        ORDER BY ts, event_id) AS next_ts FROM e),
        |d AS (SELECT event_type, day, value,
        |        DATE_DIFF('microseconds', ts, next_ts) AS dur_us
        |      FROM l WHERE next_ts IS NOT NULL),
        |g AS (SELECT event_type, day,
        |        SUM(CAST(value AS DECIMAL(18,2)) * dur_us) AS num,
        |        CAST(SUM(dur_us) AS BIGINT) AS den
        |      FROM d GROUP BY 1, 2)
        |SELECT event_type, day,
        |  CAST(CAST(num AS VARCHAR) AS DOUBLE) / CAST(den AS DOUBLE) AS twap,
        |  den AS span_us
        |FROM g WHERE den > 0
        |ORDER BY event_type, day""".stripMargin,
    // NOTE the CAST(CAST(x AS VARCHAR) AS DOUBLE) detour on the wide
    // sums: DuckDB's direct DECIMAL->DOUBLE double-rounds (int128 to
    // double, then divide by 10^scale), losing the low bits once the
    // unscaled value exceeds 2^53 — the squared sums here do. The
    // string path is correctly rounded, matching Spark's
    // BigDecimal.doubleValue exactly.
    "q248_autocorrelation" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |      AS rev
        |  FROM orders GROUP BY 1),
        |lags AS (SELECT UNNEST(range(1, 8)) AS k),
        |g AS (SELECT k, COUNT(*) AS n,
        |    SUM(a.rev) AS sx,
        |    SUM(CAST(CAST(a.rev AS DECIMAL(19,2))
        |        * CAST(a.rev AS DECIMAL(19,2)) AS DECIMAL(38,4))) AS sxx,
        |    SUM(b.rev) AS sy,
        |    SUM(CAST(CAST(b.rev AS DECIMAL(19,2))
        |        * CAST(b.rev AS DECIMAL(19,2)) AS DECIMAL(38,4))) AS syy,
        |    SUM(CAST(CAST(a.rev AS DECIMAL(19,2))
        |        * CAST(b.rev AS DECIMAL(19,2)) AS DECIMAL(38,4))) AS sxy
        |  FROM daily a CROSS JOIN lags
        |  JOIN daily b ON b.day = a.day + CAST(k AS INTEGER)
        |  GROUP BY 1)
        |SELECT CAST(k AS BIGINT) AS k, n,
        |  (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
        |     - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
        |       * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
        |   / SQRT((CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
        |       - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
        |         * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
        |     * (CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
        |       - CAST(CAST(sy AS VARCHAR) AS DOUBLE)
        |         * CAST(CAST(sy AS VARCHAR) AS DOUBLE))) AS acf
        |FROM g WHERE n >= 2
        |ORDER BY k""".stripMargin,
    "q114_group_correlation" ->
      """WITH g AS (SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |        * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS syy,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |        * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
        |     - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
        |       * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
        |   / SQRT((CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
        |       - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
        |         * CAST(CAST(sx AS VARCHAR) AS DOUBLE))
        |     * (CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
        |       - CAST(CAST(sy AS VARCHAR) AS DOUBLE)
        |         * CAST(CAST(sy AS VARCHAR) AS DOUBLE))) AS corr
        |FROM g WHERE n >= 2
        |ORDER BY l_returnflag""".stripMargin,
    "q111_anomaly_days" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS ds
        |  FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, COUNT(*) AS n_days,
        |    SUM(ds) AS s1,
        |    SUM(CAST(ds AS DECIMAL(19,2)) * CAST(ds AS DECIMAL(19,2))) AS s2
        |  FROM daily GROUP BY 1),
        |st AS (SELECT event_type,
        |    CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
        |    (CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
        |       - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
        |         * CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
        |       / CAST(n_days AS DOUBLE)) / CAST(n_days AS DOUBLE) AS variance
        |  FROM stats WHERE n_days >= 2)
        |SELECT d.event_type, d.day, CAST(d.ds AS DOUBLE) AS daily_sum,
        |  (CAST(d.ds AS DOUBLE) - st.mean) / SQRT(st.variance) AS z
        |FROM daily d JOIN st USING (event_type)
        |WHERE st.variance > 0
        |  AND ABS((CAST(d.ds AS DOUBLE) - st.mean) / SQRT(st.variance)) >= 2
        |ORDER BY event_type, day""".stripMargin,
    "q109_trend_regression" ->
      """WITH e AS (SELECT event_type, value,
        |    DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x
        |  FROM events),
        |g AS (SELECT event_type, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(x*x) AS sxx,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(value AS DECIMAL(18,2)) * x) AS sxy
        |  FROM e GROUP BY event_type)
        |SELECT event_type, n,
        |  (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
        |   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
        |  (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
        |    - ((CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
        |FROM g
        |WHERE n >= 2 AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
        |ORDER BY event_type""".stripMargin,
    // keep-LAST over the change log — the independent derivation of the
    // same current state q96 reads from the SCD2 open intervals
    "q96_scd2_current" ->
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |    LAG(o_orderstatus) OVER w AS prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |chg AS (SELECT * FROM ordered
        |        WHERE prev IS NULL OR prev <> o_orderstatus)
        |SELECT o_custkey, o_orderstatus AS current_status,
        |  o_orderkey AS anchor_orderkey, o_orderdate AS valid_from
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM chg)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    // the naive pure-range formulation (weeks × intervals theta-join)
    // that the Spark plan's bucketization deliberately avoids
    "q94_interval_overlap" ->
      """WITH iv AS (SELECT o_orderkey,
        |    DATE_DIFF('day', DATE '1990-01-01',
        |              CAST(o_orderdate AS DATE)) // 7 AS w1,
        |    DATE_DIFF('day', DATE '1990-01-01',
        |              CAST(o_orderdate AS DATE)
        |                + CAST(o_orderkey % 30 AS INTEGER)) // 7 AS w2
        |  FROM orders),
        |wk AS (SELECT UNNEST(GENERATE_SERIES((SELECT MIN(w1) FROM iv),
        |                                     (SELECT MAX(w2) FROM iv))) AS wk)
        |SELECT wk.wk AS wk, COUNT(*) AS n_open
        |FROM wk JOIN iv ON wk.wk BETWEEN iv.w1 AND iv.w2
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q91_cohort_retention" ->
      """WITH du AS (SELECT DISTINCT DATE_TRUNC('day', ts) AS day, user_id
        |            FROM events),
        |cohorts AS (SELECT user_id, MIN(day) AS cohort_day
        |            FROM du GROUP BY 1)
        |SELECT c.cohort_day, DATE_DIFF('day', c.cohort_day, u.day) AS k,
        |  COUNT(DISTINCT u.user_id) AS n_users
        |FROM du u JOIN cohorts c ON u.user_id = c.user_id
        |WHERE DATE_DIFF('day', c.cohort_day, u.day) <= 7
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // naive range-join formulation — the explode-remap plan must agree
    "q89_sliding_distinct" ->
      """WITH du AS (SELECT DISTINCT DATE_TRUNC('day', ts) AS day, user_id
        |            FROM events),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT d.day AS day, COUNT(DISTINCT u.user_id) AS n_users_7d
        |FROM days d JOIN du u
        |  ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q84_funnel_stages" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |      GROUP BY 1)
        |SELECT v.user_id, t_view, t_click, t_purchase,
        |  1 + CAST(t_click IS NOT NULL AS BIGINT)
        |    + CAST(t_purchase IS NOT NULL AS BIGINT) AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    // identical dropout rule, frames and scalar op sequence as the
    // Spark plan: vp + (vn - vp) * (CAST AS DOUBLE / CAST AS DOUBLE)
    "q191_linear_interpolate" ->
      """WITH s AS (SELECT user_id, ts, event_id,
        |    CASE WHEN event_type <> 'view' THEN value END AS v
        |  FROM events),
        |w AS (SELECT user_id, ts, event_id, v,
        |    LAST_VALUE(v IGNORE NULLS) OVER wp AS vp,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
        |      OVER wp AS tp,
        |    FIRST_VALUE(v IGNORE NULLS) OVER wn AS vn,
        |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN ts END IGNORE NULLS)
        |      OVER wn AS tn
        |  FROM s
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, ts, event_id, v,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN vp IS NULL OR vn IS NULL THEN NULL
        |       WHEN DATE_DIFF('microsecond', tp, tn) = 0 THEN vp
        |       ELSE vp + (vn - vp)
        |         * (CAST(DATE_DIFF('microsecond', tp, ts) AS DOUBLE)
        |            / CAST(DATE_DIFF('microsecond', tp, tn) AS DOUBLE))
        |  END AS v_interp
        |FROM w ORDER BY user_id, ts, event_id""".stripMargin,
    "q189_forward_fill" ->
      """WITH s AS (SELECT user_id, ts, event_id,
        |    CASE WHEN event_type <> 'view' THEN value END AS v
        |  FROM events)
        |SELECT user_id, ts, event_id, v,
        |  LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM s ORDER BY user_id, ts, event_id""".stripMargin,
    // the IDENTICAL interval derivation as q76, read back at one date:
    // [valid_from, valid_to) with NULL = open
    "q190_scd2_asof" ->
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |    LAG(o_orderstatus) OVER w AS prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |chg AS (SELECT * FROM ordered
        |        WHERE prev IS NULL OR prev <> o_orderstatus),
        |hist AS (SELECT o_custkey, o_orderstatus AS status,
        |    o_orderkey AS anchor_orderkey, o_orderdate AS valid_from,
        |    LEAD(o_orderdate) OVER w AS valid_to
        |  FROM chg
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |SELECT o_custkey, status, anchor_orderkey, valid_from, valid_to
        |FROM hist
        |WHERE valid_from <= DATE '1996-06-30'
        |  AND (valid_to IS NULL OR valid_to > DATE '1996-06-30')
        |ORDER BY o_custkey""".stripMargin,
    "q76_scd2_history" ->
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |    LAG(o_orderstatus) OVER w AS prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |chg AS (SELECT * FROM ordered
        |        WHERE prev IS NULL OR prev <> o_orderstatus)
        |SELECT o_custkey, o_orderstatus AS status,
        |  o_orderkey AS anchor_orderkey, o_orderdate AS valid_from,
        |  LEAD(o_orderdate) OVER w AS valid_to,
        |  LEAD(o_orderdate) OVER w IS NULL AS is_current
        |FROM chg
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, anchor_orderkey""".stripMargin,
    "q61_gapfill_days" ->
      s"""WITH daily AS ($dailySql),
        |days AS (SELECT UNNEST(GENERATE_SERIES(
        |           (SELECT MIN(day) FROM daily),
        |           (SELECT MAX(day) FROM daily),
        |           INTERVAL 1 DAY))::DATE AS day)
        |SELECT day,
        | COALESCE(n_orders, 0) AS n_orders,
        | COALESCE(revenue, 0.0) AS revenue
        |FROM days LEFT JOIN daily USING (day)
        |ORDER BY day""".stripMargin,
    "q62_moving_average" ->
      s"""WITH daily AS ($dailySql)
        |SELECT day, revenue,
        | CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rev_7d,
        | COUNT(*) OVER w AS n_days_7d
        |FROM daily
        |WINDOW w AS (ORDER BY DATE_DIFF('day', DATE '1995-01-01', day)
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "q58_full_outer_join" ->
      """SELECT day,
        | COALESCE(n_clicks, 0) AS n_clicks,
        | COALESCE(n_purchases, 0) AS n_purchases
        |FROM (SELECT DATE_TRUNC('day', ts) AS day, COUNT(*) AS n_clicks
        |      FROM events WHERE event_type = 'click' GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT DATE_TRUNC('day', ts) AS day, COUNT(*) AS n_purchases
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1) p
        |USING (day)
        |ORDER BY day""".stripMargin,
    "q37_asof_join" ->
      """SELECT event_id, user_id, ts, last_purchase_event, last_purchase_value
        |FROM (
        |  SELECT event_id, user_id, ts, tag,
        |    LAST_VALUE(pe IGNORE NULLS) OVER w AS last_purchase_event,
        |    LAST_VALUE(pv IGNORE NULLS) OVER w AS last_purchase_value
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |      CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
        |      CASE WHEN event_type = 'purchase' THEN event_id END AS pe,
        |      CASE WHEN event_type = 'purchase' THEN value END AS pv
        |    FROM events WHERE event_type IN ('purchase', 'click'))
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |WHERE tag = 1
        |ORDER BY event_id""".stripMargin,
    "q38_range_join" ->
      """SELECT p_event_id, user_id, COUNT(c_ts) AS n_clicks,
        | CAST(SUM(CAST(c_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_click_value
        |FROM (SELECT event_id AS p_event_id, user_id, ts AS p_ts
        |      FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id AS c_user, ts AS c_ts, value AS c_value
        |           FROM events WHERE event_type = 'click') c
        |  ON user_id = c_user AND c_ts > p_ts
        |     AND c_ts <= p_ts + INTERVAL 1 HOUR
        |GROUP BY p_event_id, user_id
        |ORDER BY p_event_id""".stripMargin,
    "q39_session_window" ->
      """SELECT user_id, MIN(ts) AS session_start,
        | MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT user_id, event_id, ts, value,
        |      CASE WHEN LAG(ts) OVER w IS NULL
        |                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |           THEN 1 ELSE 0 END AS brk
        |    FROM events
        |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)
}
