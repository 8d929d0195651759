package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Window-function coverage (SURVEY.md §2.6 — the reference's per-day
  * top-1 lookups /root/reference/api/mongo/main.py:72-75 are
  * semantically `row_number() OVER (PARTITION BY date ORDER BY ...)`;
  * here the full ranking/analytic/frame machinery is exercised).
  *
  * Every ROWS-frame / ranking window ORDER BY carries a unique
  * tie-break key so results are total-order deterministic across
  * engines; RANGE frames (q54, q171) are the deliberate exception —
  * a tie-break column is illegal there, and peers aggregate together
  * identically in both engines by definition.
  */
object Windows {

  /** NTILE quartile assignment: customers bucketed into balance
    * quartiles within their market segment, rolled up to per-bucket
    * counts and exact-decimal average balance — the
    * equal-frequency-binning window (cohort tiers, spend bands). The
    * ORDER BY carries the custkey tie-break, making bucket boundaries
    * total-order deterministic; NTILE's floor/ceil split of n into 4
    * is the same standard-SQL rule in both engines. One segment-key
    * shuffle, then a partial-aggregable rollup. */
  def balanceQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    load(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
      .withColumn("quartile", ntile(4).over(w).cast(LongType))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n"), davg(col("c_acctbal")).as("avg_bal"))
      .orderBy(col("c_mktsegment"), col("quartile"))
  }

  /** GLOBAL ROW_NUMBER without a global sort — the q93/q139 two-level
    * rank pattern generalized to any ordering: bucket by `value div
    * width` (bucket order == value order), roll per-bucket counts into
    * broadcast cumulative offsets (the only unpartitioned window runs
    * over O(buckets) rows), rank within buckets in parallel; global
    * rank = offset + in-bucket row_number. `value` must be a LongType
    * whose ascending order is the wanted rank order (negate for DESC);
    * `tie` makes the order total. Appends `rankOut` and `nOut` (the
    * total row count) and leaves the input columns untouched. Serves
    * q147's NTILE and q155's Gini rank-weighted sum. */
  private[graft] def globalRankNoSort(df: DataFrame, value: Column,
      tie: Column, bucketWidth: Long, rankOut: String, nOut: String)
      : DataFrame = {
    val b = df.withColumn("_v", value).withColumn("_t", tie)
      .withColumn("_bkt",
        floor(col("_v").cast(DoubleType) / bucketWidth).cast(LongType))
    val counts = b.groupBy(col("_bkt")).agg(count(lit(1)).as("_c"))
    val wOff = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(wAll)).drop("_c")
    val wIn = Window.partitionBy(col("_bkt")).orderBy(col("_v"), col("_t"))
    b.join(broadcast(offs), "_bkt")
      .withColumn(rankOut, col("_off") + row_number().over(wIn))
      .withColumn(nOut, col("_n"))
      .drop("_v", "_t", "_bkt", "_off", "_n")
  }

  /** Test hook: the ntile split on an arbitrary frame, named `t`. */
  private[graft] def rfmNtileForTest(df: DataFrame, value: Column,
      tie: Column, k: Int, bucketWidth: Long): DataFrame =
    ntileNoGlobalSort(df, value, tie, k, bucketWidth, "t")

  /** GLOBAL NTILE on top of [[globalRankNoSort]]: the exact rank mapped
    * through standard NTILE's integer split (first n%k tiles get ⌈n/k⌉
    * rows). Appends `out`, input columns untouched. Shared with the
    * q147 RFM scores and q251's calibration deciles. */
  private[graft] def ntileNoGlobalSort(df: DataFrame, value: Column, tie: Column,
      k: Int, bucketWidth: Long, out: String): DataFrame =
    globalRankNoSort(df, value, tie, bucketWidth, "_rank", "_nt")
      .withColumn(out, expr(
        s"""CASE WHEN _rank <= (_nt % $k) * ((_nt DIV $k) + 1)
           |  THEN (_rank - 1) DIV ((_nt DIV $k) + 1) + 1
           |  ELSE (_nt % $k) +
           |    (_rank - (_nt % $k) * ((_nt DIV $k) + 1) - 1) DIV (_nt DIV $k) + 1
           |END""".stripMargin))
      .drop("_rank", "_nt")

  /** GLOBAL RUNNING SUM without a global sort — [[globalRankNoSort]]'s
    * two-level trick carried to prefix sums: per-bucket totals roll
    * into broadcast cumulative offsets (the only unpartitioned window
    * runs over O(buckets) rows), the intra-bucket running sum runs in
    * parallel per bucket, and the global prefix sum is offset +
    * in-bucket sum. `value` orders (ascending; negate for DESC),
    * `tie` totalizes, `weight` is what gets summed (Long). Appends
    * `cumOut` (inclusive prefix sum) and `totOut` (grand total).
    * Serves q293's Pareto share curve. */
  private[graft] def globalCumSumNoSort(df: DataFrame, value: Column,
      tie: Column, weight: Column, bucketWidth: Long,
      cumOut: String, totOut: String): DataFrame = {
    val b = df.withColumn("_v", value).withColumn("_t", tie)
      .withColumn("_w", weight)
      .withColumn("_bkt",
        floor(col("_v").cast(DoubleType) / bucketWidth).cast(LongType))
    val sums = b.groupBy(col("_bkt")).agg(sum(col("_w")).as("_s"))
    val wOff = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = sums
      .withColumn("_off", coalesce(sum(col("_s")).over(wOff), lit(0L)))
      .withColumn("_tot", sum(col("_s")).over(wAll)).drop("_s")
    val wIn = Window.partitionBy(col("_bkt")).orderBy(col("_v"), col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(offs), "_bkt")
      .withColumn(cumOut, col("_off") + sum(col("_w")).over(wIn))
      .withColumn(totOut, col("_tot"))
      .drop("_v", "_t", "_w", "_bkt", "_off", "_tot")
  }

  /** RFM SEGMENTATION: customers scored 1–4 on Recency (days since
    * last order), Frequency (order count) and Monetary (lifetime
    * spend), rolled up to segment sizes + revenue — the classic CRM
    * cohorting pass. Each score is an equal-frequency quartile over
    * ALL customers computed via [[ntileNoGlobalSort]], so unlike a
    * naive `NTILE(4) OVER (ORDER BY …)` nothing ever funnels through
    * one partition; the oracle states exactly that naive window and
    * matches because the two-level rank is the same total order.
    * Money stays exact DECIMAL (cents) until the final cast. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val epoch = to_date(lit("1990-01-01"))
    val m = load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"))
      .agg(max(col("o_orderdate")).as("last_dt"),
        count(lit(1)).as("freq"),
        sum(d2(col("o_totalprice"))).as("money"))
      .withColumn("cents", (col("money") * 100).cast(LongType))
    val scored = Seq[(String, DataFrame => Column, Long)](
      ("r_score", d => -datediff(d("last_dt"), epoch).cast(LongType), 64L),
      ("f_score", d => -d("freq"), 1L),
      ("m_score", d => -d("cents"), 1L << 20))
      .foldLeft(m) { case (df, (name, v, width)) =>
        ntileNoGlobalSort(df, v(df), df("key"), 4, width, name)
      }
    scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("money")).cast(DoubleType).as("revenue"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** TIME-INTERVAL RANGE frame: each event's trailing-24h activity
    * (count + exact-decimal value sum) per user — the true
    * event-time sliding window (`RANGE BETWEEN INTERVAL ... PRECEDING`),
    * where q54's RANGE frame is numeric-peer and q62 pre-aggregates to
    * fixed buckets. The frame is ordered by the raw timestamp, so
    * same-instant events are frame PEERS (included together) in both
    * engines — no tie-break column is legal in a RANGE frame and none
    * is needed. One user-key shuffle; running sums stay DECIMAL.
    * Both engines read the events parquet at MICROSECOND precision
    * (Spark via [[graft.Tables.events]]'s ns→µs truncation, DuckDB by
    * its native parquet TIMESTAMP mapping), so the 24h frame boundary
    * compares identical operands on both sides. */
  def intervalRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), d2(col("value")).as("v"))
    ev.createOrReplaceTempView("graft_ev_range")
    spark.sql(
      """SELECT user_id, ts, event_id,
        |  COUNT(*) OVER w AS n_24h,
        |  CAST(SUM(v) OVER w AS DOUBLE) AS sum_24h
        |FROM graft_ev_range
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin)
  }

  /** EXPONENTIAL-DECAY recency score: each customer's last ≤ 8 orders
    * weighted 2^(8-rank) (most recent ×128, halving per step) — the
    * time-decayed engagement/LTV signal every ranking pipeline wants,
    * computed with INTEGER powers of two so the weighted sum stays
    * exact DECIMAL end-to-end (a float `exp(-λ·age)` would diverge
    * between engines; a power-of-two ladder is the same decay curve
    * quantized, and bit-portable). One customer-key shuffle for the
    * ranking window, then a partial-aggregable rollup; the rank filter
    * caps per-customer state at 8 rows regardless of history length —
    * the property that keeps the operator O(customers) at 100 TB. */
  def decayRecencyScore(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        d2(col("o_totalprice")).as("p"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8)
      .withColumn("wt",
        expr("shiftleft(CAST(1 AS BIGINT), 8 - rn)").cast(DecimalType(4, 0)))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_recent"),
        sum(col("p") * col("wt")).cast(DoubleType).as("decay_score"))
      .orderBy(col("o_custkey"))
  }

  /** RUNNING DISTINCT COUNT window: each event's cumulative number of
    * DISTINCT event types its user has produced so far — the
    * "behavioral breadth so far" feature (how many product surfaces a
    * user has touched by time t). Plain running counts are sum
    * monoids; a distinct count is not, so engines differ in surface:
    * Spark has no COUNT(DISTINCT) OVER and instead composes
    * `size(collect_set() OVER)` — set semantics make the result
    * independent of within-frame order, which is exactly what keeps
    * it engine-portable. One user-key shuffle; per-row state is the
    * set of types seen (bounded by the type vocabulary, here 5 — at
    * 100 TB the frame state is O(vocabulary), NOT O(history)). */
  def runningDistinctTypes(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("n_distinct_types",
        size(collect_set(col("event_type")).over(w)).cast(LongType))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Top-3 orders per customer by price — ranking window + filter. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running (cumulative) quantity per supplier — frame-spec window.
    * The order carries l_quantity as a final tie-break: the synthetic
    * corpus has duplicate (suppkey, shipdate, orderkey, linenumber)
    * keys at sf0.1, and with l_quantity included any remaining ties
    * are rows identical in every output column, so tie order cannot
    * change the result multiset in either engine. */
  def runningQuantityPerSupplier(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    load(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_quantity"))
      .withColumn("running_qty", sum(d2(col("l_quantity"))).over(w).cast(DoubleType))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
  }

  /** Analytic functions: rank + lag over each customer's order history. */
  def orderHistoryAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("order_seq", row_number().over(w).cast(LongType))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  /** Keep-last dedup — the MinIO object-key upsert semantics (K3,
    * /root/reference/dags/get_prices_load_minio.py:80: object key
    * date+station makes the last write win). Latest event per
    * (user_id, event_type). */
  def keepLastEvent(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** RANGE frame (vs q17's ROWS): peers at the same order date share
    * the cumulative value — the frame-spec semantics distinction. */
  def rangeFrameCumulative(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("cum_orders_range", count(lit(1)).over(w))
      .withColumn("cum_price_range",
        sum(d2(col("o_totalprice"))).over(w).cast(DoubleType))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Distribution window functions: quartile, percent_rank, cume_dist
    * over each segment's balance ladder (unique tie-break key so both
    * engines compute identical integer-derived ratios). */
  def balanceDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    load(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w).cast(LongType))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
  }

  /** q294 — DECILE MIGRATION matrix: customers' lifetime-spend decile
    * in the first half of the order period (orderdate < 1998-07-01)
    * crossed with their decile in the second half — the churn/growth
    * readout behind "did our top decile stay top?". Decile 0 means
    * inactive in that half (kept by the full-outer join — silently
    * dropping them is exactly the churn you came to measure). Both
    * decile assignments ride [[ntileNoGlobalSort]] (equal to standard
    * NTILE(10) over (cents, custkey) — the rfm/q251 contract), so
    * nothing funnels through a single sorted partition.
    *
    * Scale shape: two partial-agg spend rollups, two two-level ntile
    * passes, ONE full-outer key join, and an O(11²)-row matrix
    * rollup. Money exact in cents throughout. */
  def decileMigration(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderdate").as("dt"),
        d2(col("o_totalprice")).as("m"))
    val split = to_date(lit("1998-07-01"))
    def half(pred: Column, out: String): DataFrame = {
      val s = o.filter(pred).groupBy(col("ck"))
        .agg((sum(col("m")) * 100).cast(LongType).as("cents"))
      ntileNoGlobalSort(s, col("cents"), col("ck"), 10, 1L << 22, out)
        .select(col("ck"), col(out).cast(LongType).as(out))
    }
    half(col("dt") < split, "d1")
      .join(half(col("dt") >= split, "d2"), Seq("ck"), "full_outer")
      .select(coalesce(col("d1"), lit(0L)).as("decile_h1"),
        coalesce(col("d2"), lit(0L)).as("decile_h2"))
      .groupBy(col("decile_h1"), col("decile_h2"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("decile_h1"), col("decile_h2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q294_decile_migration" -> decileMigration,
    "q16_window_topn" -> topOrdersPerCustomer,
    "q17_window_running_sum" -> runningQuantityPerSupplier,
    "q18_window_analytics" -> orderHistoryAnalytics,
    "q19_keep_last_dedup" -> keepLastEvent,
    "q54_window_range_frame" -> rangeFrameCumulative,
    "q55_window_distribution" -> balanceDistribution,
    "q133_balance_quartiles" -> balanceQuartiles,
    "q147_rfm_segments" -> rfmSegments,
    "q171_interval_range_frame" -> intervalRangeFrame,
    "q176_decay_recency_score" -> decayRecencyScore,
    "q187_running_distinct" -> runningDistinctTypes)

  val oracles: Map[String, String] = Map(
    // q294: the oracle states the naive NTILE windows; the two-level
    // ntile is pinned equal to standard NTILE on the same total order
    "q294_decile_migration" ->
      """WITH o AS (SELECT o_custkey AS ck, o_orderdate AS dt,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS m FROM orders),
        |h1 AS (SELECT ck, CAST(SUM(m) * 100 AS BIGINT) AS cents
        |       FROM o WHERE dt < DATE '1998-07-01' GROUP BY 1),
        |n1 AS (SELECT ck,
        |        CAST(NTILE(10) OVER (ORDER BY cents, ck) AS BIGINT) AS d1
        |       FROM h1),
        |h2 AS (SELECT ck, CAST(SUM(m) * 100 AS BIGINT) AS cents
        |       FROM o WHERE dt >= DATE '1998-07-01' GROUP BY 1),
        |n2 AS (SELECT ck,
        |        CAST(NTILE(10) OVER (ORDER BY cents, ck) AS BIGINT) AS d2
        |       FROM h2)
        |SELECT COALESCE(d1, 0) AS decile_h1, COALESCE(d2, 0) AS decile_h2,
        |  COUNT(*) AS n_customers
        |FROM n1 FULL JOIN n2 USING (ck)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // set semantics: the distinct count is frame-order-independent, so
    // DuckDB's native COUNT(DISTINCT) OVER equals Spark's
    // size(collect_set() OVER) on the same total order
    "q187_running_distinct" ->
      """SELECT user_id, ts, event_id, event_type,
        |  COUNT(DISTINCT event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS n_distinct_types
        |FROM events
        |ORDER BY user_id, ts, event_id""".stripMargin,
    // decimal × integer-decimal weight stays exact in both engines; the
    // VARCHAR detour gives the correctly-rounded decimal->double cast
    "q176_decay_recency_score" ->
      """WITH r AS (SELECT o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT o_custkey, COUNT(*) AS n_recent,
        |  CAST(CAST(SUM(p * CAST(CAST(1 AS BIGINT) << (8 - rn)
        |    AS DECIMAL(4,0))) AS VARCHAR) AS DOUBLE) AS decay_score
        |FROM r WHERE rn <= 8
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q171_interval_range_frame" ->
      """SELECT user_id, ts, event_id,
        |  COUNT(*) OVER w AS n_24h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS sum_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    // the naive single-partition form of the same total orders — the
    // two-level rank must reproduce it exactly
    "q147_rfm_segments" ->
      """WITH m AS (SELECT o_custkey AS key, MAX(o_orderdate) AS last_dt,
        |    COUNT(*) AS freq,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS money
        |  FROM orders GROUP BY 1),
        |s AS (SELECT key, money,
        |    CAST(NTILE(4) OVER (ORDER BY last_dt DESC, key) AS BIGINT)
        |      AS r_score,
        |    CAST(NTILE(4) OVER (ORDER BY freq DESC, key) AS BIGINT)
        |      AS f_score,
        |    CAST(NTILE(4) OVER (ORDER BY money DESC, key) AS BIGINT)
        |      AS m_score
        |  FROM m)
        |SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
        |  CAST(SUM(money) AS DOUBLE) AS revenue
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q133_balance_quartiles" ->
      """WITH q AS (SELECT c_mktsegment, c_acctbal,
        |    CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
        |  FROM customer)
        |SELECT c_mktsegment, quartile, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |    AS avg_bal
        |FROM q
        |GROUP BY 1, 2
        |ORDER BY c_mktsegment, quartile""".stripMargin,
    "q16_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             ROW_NUMBER() OVER (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q17_window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |   PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q18_window_analytics" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        | ROW_NUMBER() OVER w AS order_seq,
        | LAG(o_totalprice, 1) OVER w AS prev_price,
        | LEAD(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin,
    "q54_window_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        | COUNT(*) OVER w AS cum_orders_range,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |   AS cum_price_range
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q55_window_distribution" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        | CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        | PERCENT_RANK() OVER w AS pct_rank,
        | CUME_DIST() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin,
    "q19_keep_last_dedup" ->
      """SELECT user_id, event_type, event_id, ts, value
        |FROM (SELECT user_id, event_type, event_id, ts, value,
        |             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |               ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin)
}
