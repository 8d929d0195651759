package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Relational operator coverage: scans/filters/projections (SURVEY.md
  * §2.1/§2.3), joins of every flavor (§2.4 — all ABSENT in the reference,
  * supplied here via Catalyst), aggregations (§2.5), sorts/top-k (§2.7)
  * and set operations (§2.8).
  *
  * Every query is paired with an ANSI-SQL oracle (DuckDB) in
  * [[oracles]]; numeric determinism comes from exact DECIMAL arithmetic
  * (see graft.Tables scaladoc). Every query ends in a total ORDER BY so
  * row order is reproducible across engines.
  *
  * Scale design: aggregations are expressed as groupBy/agg so Catalyst
  * plans partial (map-side) aggregation before the shuffle; small
  * dimension tables (region/nation/supplier) are explicitly
  * broadcast; top-k uses orderBy+limit which Spark executes as
  * TakeOrderedAndProject (per-partition heap, no global sort).
  */
object Relational {

  /** TPC-H Q1-style pricing summary: full-scan partial aggregation.
    * Maps the reference's only aggregate shapes (A1-A3,
    * /root/reference/api/mongo/main.py:72-75) onto a wide measure set. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= tsLit("2000-12-01 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumExpr(d2(col("l_extendedprice")) * d4(lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        dsumExpr(d2(col("l_extendedprice")) * d4(lit(1.0) - col("l_discount"))
          * d4(lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q6-style: predicate-pushdown scan + ungrouped aggregate.
    * The filter reaches the parquet scan (PushedFilters) — the engine's
    * answer to the reference's server-side-filter pattern
    * (/root/reference/api/mongo/main.py:72). */
  def revenueFilter(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= tsLit("1997-01-01 00:00:00") &&
        col("l_shipdate") < tsLit("1998-01-01 00:00:00") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dsumExpr(d2(col("l_extendedprice")) * d2(col("l_discount")))
        .as("revenue"))

  /** TPC-H Q3-style: 3-way shuffle join + agg + top-k by revenue. */
  /** PHYSICAL JOIN-STRATEGY OVERRIDE surface: q03's exact semantics
    * with `hint("shuffle_hash")` on the dimension sides — the
    * knob a tuner reaches for when sort-merge's per-partition sorts
    * are the bottleneck and one side's partitions fit a hash table
    * (hints outrank the planner's auto choice, including
    * auto-broadcast, in Spark's JoinSelection). Hints change the
    * PHYSICAL plan only, so the gate runs the SAME oracle string as
    * q03 — the two can never fork semantically — and PlanSpec pins
    * that ShuffledHashJoin was actually chosen (a silently ignored
    * hint is the common failure mode of this surface). */
  def topOrdersShuffleHash(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").hint("shuffle_hash")
    val o = load(spark, dir, "orders")
      .filter(col("o_orderdate") < tsLit("2000-03-15 00:00:00"))
      .hint("shuffle_hash")
    val l = load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > tsLit("2000-03-15 00:00:00"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsumExpr(d2(col("l_extendedprice")) * d4(lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  def topUnshippedOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = load(spark, dir, "orders")
      .filter(col("o_orderdate") < tsLit("2000-03-15 00:00:00"))
    val l = load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > tsLit("2000-03-15 00:00:00"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsumExpr(d2(col("l_extendedprice")) * d4(lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-style: left-semi join (EXISTS). */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
      .filter(col("o_orderdate") >= tsLit("1997-07-01 00:00:00") &&
        col("o_orderdate") < tsLit("1997-10-01 00:00:00"))
    val l = load(spark, dir, "lineitem").filter(col("l_quantity") > 47)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q5-style: multiway join with broadcast dimensions
    * (region/nation/supplier are tiny at any SF — broadcast them). */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    val o = load(spark, dir, "orders")
    val l = load(spark, dir, "lineitem")
    val s = load(spark, dir, "supplier")
    val n = load(spark, dir, "nation")
    val r = load(spark, dir, "region")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsumExpr(d2(col("l_extendedprice")) * d4(lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q13-style: left-outer join + two-level aggregation
    * (distribution of orders per customer, zeros included). */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    val o = load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    val o = load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition
    * heaps, no full sort; this is the all-time argmax path of the
    * reference (T1, /root/reference/api/postgres/api.py:22). */
  def globalTopOrders(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)

  /** Per-day argmax as max(struct(...)): partially aggregable — no
    * window shuffle-and-sort, map-side combine does most of the work.
    * This is the reference's flagship query A1
    * (/root/reference/api/mongo/main.py:72) generalized to every day. */
  def argmaxPerDay(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast(DateType).as("order_date"))
      .agg(max(struct(col("o_totalprice"), col("o_orderkey"), col("o_custkey")))
        .as("top"))
      .select(col("order_date"), col("top.o_orderkey").as("o_orderkey"),
        col("top.o_custkey").as("o_custkey"),
        col("top.o_totalprice").as("o_totalprice"))
      .orderBy(col("order_date"))

  /** Per-day argmin (A2, /root/reference/api/mongo/main.py:75). */
  def argminPerDay(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast(DateType).as("order_date"))
      .agg(min(struct(col("o_totalprice"), col("o_orderkey"), col("o_custkey")))
        .as("top"))
      .select(col("order_date"), col("top.o_orderkey").as("o_orderkey"),
        col("top.o_custkey").as("o_custkey"),
        col("top.o_totalprice").as("o_totalprice"))
      .orderBy(col("order_date"))

  /** Set operations (§2.8 — ABSENT in reference, engine-native):
    * (O ∩ F) \ P over customer keys by order status. */
  def setOpsCustkeys(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
    def keys(status: String) =
      o.filter(col("o_orderstatus") === status)
        .select(col("o_custkey").as("custkey"))
    keys("O").intersect(keys("F")).except(keys("P")).orderBy(col("custkey"))
  }

  /** ROLLUP grouping sets over return flag/line status. */
  def rollupQuantities(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** CUBE grouping sets over order status/priority. */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n"), col("sum_price"))
      .orderBy(col("orderstatus"), col("orderpriority"))

  /** HAVING: market segments whose average balance clears a floor. */
  def segmentBalances(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        davg(col("c_acctbal")).as("avg_bal"),
        dsum(col("c_acctbal")).as("sum_bal"))
      .filter(col("n_customers") > 3)
      .orderBy(col("c_mktsegment"))

  /** DISTINCT + count-distinct aggregates. */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Multiset set operations (§2.8 completion): INTERSECT ALL keeps
    * duplicate multiplicity min(a,b), EXCEPT ALL subtracts it —
    * duplicates matter because o_custkey repeats across orders. */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders")
    def keys(status: String) =
      o.filter(col("o_orderstatus") === status)
        .select(col("o_custkey").as("custkey"))
    keys("O").intersectAll(keys("F")).exceptAll(keys("P"))
      .groupBy(col("custkey")).agg(count(lit(1)).as("multiplicity"))
      .orderBy(col("custkey"))
  }

  /** HIERARCHY SHARE: nation revenue as a share of its region and of
    * the world — the percent-of-parent drill-down every BI rollup
    * needs. Revenue aggregates once at the LEAF (nation) in exact
    * DECIMAL; region and grand totals re-aggregate the O(nations)
    * leaf table (the q86 partial-merge algebra — the fact table is
    * scanned exactly once) and broadcast back; each share is one
    * double division of decimal-exact operands. */
  def hierarchyShare(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
    val o = load(spark, dir, "orders")
    val n = load(spark, dir, "nation")
    val r = load(spark, dir, "region")
    // leaf feeds itself + both totals: materialize ONCE (the q67/q92
    // localCheckpoint pattern) rather than trusting exchange reuse to
    // dedupe three runs of the fact join
    val leaf = c.join(o, c("c_custkey") === o("o_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(d2(col("o_totalprice"))).as("rev"))
      .localCheckpoint(eager = false)
    val regionTot = leaf.groupBy(col("r_name")).agg(sum(col("rev")).as("r_rev"))
    val worldTot = leaf.agg(sum(col("rev")).as("w_rev"))
    leaf.join(broadcast(regionTot), "r_name")
      .crossJoin(broadcast(worldTot))
      .select(col("r_name"), col("n_name"),
        col("rev").cast(DoubleType).as("revenue"),
        (col("rev").cast(DoubleType) / col("r_rev").cast(DoubleType))
          .as("share_of_region"),
        (col("rev").cast(DoubleType) / col("w_rev").cast(DoubleType))
          .as("share_of_world"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** TOP-N + OTHER rollup: per nation, the top-3 customers by
    * lifetime spend as individual rows PLUS one 'OTHER' row absorbing
    * everyone else — the reporting staple that keeps a dashboard's
    * category count fixed while losing no total. One aggregation to
    * per-customer spend (partial-aggregable), one nation-key ranking
    * window with a WindowGroupLimit-ineligible tail (the OTHER branch
    * needs the non-top rows, so the full ranked set flows once and
    * both branches read the same shuffle), one rollup of the tail.
    * Money stays exact DECIMAL until the final casts; the OTHER sum
    * takes the VARCHAR-detour cast in the oracle (wide decimal). */
  def topNWithOther(spark: SparkSession, dir: String): DataFrame = {
    val spend = load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"))
      .agg(sum(d2(col("o_totalprice"))).as("sp"))
      .join(load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("key") === col("c_custkey"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("sp").desc, col("key"))
    val ranked = spend.withColumn("rn", row_number().over(w))
      .localCheckpoint(eager = false)
    val top = ranked.filter(col("rn") <= 3)
      .select(col("c_nationkey"), col("key").cast(StringType).as("entity"),
        lit(1L).as("n_customers"), col("sp").cast(DoubleType).as("spend"))
    val other = ranked.filter(col("rn") > 3)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("sp")).cast(DoubleType).as("spend"))
      .select(col("c_nationkey"), lit("OTHER").as("entity"),
        col("n_customers"), col("spend"))
    top.unionByName(other).orderBy(col("c_nationkey"), col("entity"))
  }

  /** SQL PIPE-SYNTAX surface (Spark 4, SPARK-49555): q01's pricing
    * summary restated as a `|>` pipeline — scan |> WHERE |> AGGREGATE
    * |> ORDER BY — and gated on the IDENTICAL oracle string as q01
    * (the q196 twin rule: two language surfaces of one computation can
    * never fork). The aggregate expressions spell out the exact
    * decimal-then-one-cast [[graft.Tables.dsum]] contract inline, so
    * the plan Catalyst builds is the same partial-aggregable hash
    * aggregate as the DataFrame form. */
  def pipeSyntaxPricing(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "lineitem").createOrReplaceTempView("graft_li_pipe")
    spark.sql(
      """FROM graft_li_pipe
        ||> WHERE l_shipdate <= TIMESTAMP_NTZ'2000-12-01 00:00:00'
        ||> AGGREGATE
        |     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        |     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        |     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |     COUNT(*) AS count_order
        |   GROUP BY l_returnflag, l_linestatus
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** SQL SESSION-VARIABLE surface (Spark 4, SPARK-46908): q02's
    * revenue filter with its predicate constants hoisted into
    * `DECLARE VARIABLE`s — the parameterized-report shape (one
    * statement text, per-run bindings) — gated on the IDENTICAL q02
    * oracle. Variables resolve at analysis time, so the pushed-down
    * scan predicate is the same constant filter q02 plans. */
  def sqlVariablesRevenue(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "lineitem").createOrReplaceTempView("graft_li_var")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_disc_lo DOUBLE DEFAULT 0.05")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_disc_hi DOUBLE DEFAULT 0.07")
    spark.sql("DECLARE OR REPLACE VARIABLE graft_qty_cap DOUBLE DEFAULT 24.0")
    spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM graft_li_var
        |WHERE l_shipdate >= TIMESTAMP_NTZ'1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP_NTZ'1998-01-01 00:00:00'
        |  AND l_discount >= graft_disc_lo AND l_discount <= graft_disc_hi
        |  AND l_quantity < graft_qty_cap""".stripMargin)
  }

  /** Three more Spark 4 SQL surfaces in one statement, each the shape
    * a templated-report layer actually uses: `IDENTIFIER(var)` resolves
    * the TABLE NAME from a session variable (SPARK-43205 — injection-
    * safe dynamic identifiers), `GROUP BY ALL` infers the grouping
    * keys, and the filter constant arrives as a NAMED PARAMETER via
    * `spark.sql(text, args)` (SPARK-44680) — typed java.time binding,
    * not string splicing. Gated on a plain-SQL oracle of the same
    * aggregation. */
  /** SQL SCRIPTING (Spark 4's SPARK-48338 procedural surface —
    * BEGIN/END, DECLARE, WHILE): an iterative doubling search for the
    * smallest power-of-two revenue threshold that keeps at most 10
    * orders, run entirely AS a SQL script (the control flow lives in
    * the engine, not the driver program — what a SQL-only caller can
    * express without a Scala loop). Doubling stays on exact binary
    * powers, so the loop is bit-deterministic; the oracle runs the
    * CLOSED FORM (smallest 2^k with count ≤ 10 over a generated power
    * table) — loop and closed form must agree or the gate fails. */
  def sqlScripting(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.scripting.enabled", "true")
    // the WHILE loop's guard COUNT re-scans this view once per
    // doubling (~20 sequential jobs to cross the price range) — pin
    // the view to a materialized snapshot so iterations 2..n read
    // blocks, not parquet (optimization r16; blocks free at the next
    // dropStaleBlocks, no cache-registry entry that could leak the
    // snapshot into other queries' plans)
    load(spark, dir, "orders").localCheckpoint(eager = false)
      .createOrReplaceTempView("graft_orders_scr")
    spark.sql(
      """BEGIN
        |  DECLARE thr DOUBLE DEFAULT 1.0;
        |  WHILE (SELECT COUNT(*) FROM graft_orders_scr
        |         WHERE o_totalprice >= thr) > 10 DO
        |    SET thr = thr * 2;
        |  END WHILE;
        |  SELECT thr AS threshold,
        |    (SELECT COUNT(*) FROM graft_orders_scr
        |     WHERE o_totalprice >= thr) AS n_above;
        |END""".stripMargin)
  }

  def sqlSurfaces(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "lineitem").createOrReplaceTempView("graft_li_idf")
    spark.sql(
      "DECLARE OR REPLACE VARIABLE graft_tbl STRING DEFAULT 'graft_li_idf'")
    spark.sql(
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM IDENTIFIER(graft_tbl)
        |WHERE l_shipdate <= :cutoff
        |GROUP BY ALL
        |ORDER BY l_returnflag""".stripMargin,
      Map("cutoff" -> java.time.LocalDateTime.parse("2000-12-01T00:00:00")))
  }

  /** KEYSET PAGINATION (the scale-safe pager): page 2 of the
    * customer-by-balance listing fetched by SEEK PREDICATE —
    * (bal, key) strictly after page 1's last row — instead of
    * OFFSET, which at 100 TB still sorts and discards everything it
    * skips; the seek predicate pushes down and each page is one heap
    * top-k. The page-1 boundary derives inline as two
    * TakeOrderedAndProject passes (top-10, then its last row). Gated
    * against the OFFSET form ITSELF as the DuckDB oracle — the gate
    * IS the proof that seek == skip on a total order. Balance ties
    * are broken by key, making the order total; exact DECIMAL
    * balance, one cast on output. */
  def keysetPagination(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        d2(col("c_acctbal")).as("bal"))
    val b = c.orderBy(col("bal").desc, col("c_custkey")).limit(10)
      .orderBy(col("bal"), col("c_custkey").desc).limit(1)
      .select(col("bal").as("b_bal"), col("c_custkey").as("b_key"))
    c.crossJoin(broadcast(b))
      .filter(col("bal") < col("b_bal") ||
        (col("bal") === col("b_bal") && col("c_custkey") > col("b_key")))
      .orderBy(col("bal").desc, col("c_custkey"))
      .limit(10)
      .select(col("c_custkey"), col("c_name"),
        col("bal").cast(DoubleType).as("bal"))
  }

  /** LATERAL COLUMN ALIAS surface (Spark 3.4+, SPARK-27561): an
    * aggregate alias (`gross`) consumed by a sibling expression in
    * the SAME select list — the de-duplication that keeps derived
    * metrics defined ONCE in report SQL (the oracle spells the
    * expansion the analyzer performs). */
  def lateralAlias(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "orders").createOrReplaceTempView("graft_ord_la")
    spark.sql(
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS gross,
        |  gross / COUNT(*) AS avg_price,
        |  COUNT(*) AS n
        |FROM graft_ord_la
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** q290 — MARKET-BASKET co-purchase affinity: support and lift of
    * part PAIRS bought in the same order — q112's collocation lift
    * moved to the transactional side (baskets, not token adjacency):
    * the cross-sell / "bought-together" primitive. Lift stays
    * LOG-FREE (a pure count ratio — the q112 rule): ranking is
    * unchanged by the monotone log and the doubles stay bit-portable.
    *
    * Scale shape: pair generation is a SELF-EQUI-JOIN on the basket
    * key, so per-basket fan-out is C(items-per-order, 2) — bounded by
    * basket size (TPC-H ≤ 7 lines), never corpus-quadratic; the
    * support floor prunes before the O(parts) count joins; final
    * ranking is a heap top-20 (TakeOrderedAndProject), no global
    * sort. All counts exact BIGINT; lift is ONE spelled double
    * ratio. */
  def copurchasePairs(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val nBaskets = li.agg(countDistinct(col("ok")).as("nb"))
    val itemCnt = li.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    val d = (x: org.apache.spark.sql.Column) => x.cast(DoubleType)
    li.alias("a")
      .join(li.alias("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .join(itemCnt.select(col("pk").as("part_a"), col("cnt").as("ca")),
        "part_a")
      .join(itemCnt.select(col("pk").as("part_b"), col("cnt").as("cb")),
        "part_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("part_a"), col("part_b"), col("support"),
        (d(col("support")) * d(col("nb")) / (d(col("ca")) * d(col("cb"))))
          .as("lift"))
      .orderBy(col("support").desc, col("lift").desc,
        col("part_a"), col("part_b"))
      .limit(20)
  }

  /** q293 — ABC / PARETO classification of parts by revenue: rank
    * parts by revenue DESC, take the exact cumulative revenue share,
    * and cut classes at 80% (A) and 95% (B) — the inventory-priority
    * readout behind "20% of SKUs carry 80% of revenue" (q155's Gini
    * gives the one-number inequality; this names WHICH items are the
    * head). Class membership is decided in EXACT integers by
    * cross-multiplication (cum·100 ≤ 80·total), never a float share
    * per row; the per-class shares at the end are one double division
    * each.
    *
    * Scale shape: revenue rollup is one partial-agg on partkey; the
    * cumulative curve rides [[Windows.globalCumSumNoSort]] (two-level
    * prefix sum — per-bucket totals + broadcast offsets, NO global
    * sorted window); the class rollup is O(parts) → 3 rows. */
  def abcClassification(spark: SparkSession, dir: String): DataFrame = {
    val rev = load(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(d2(col("l_extendedprice"))).as("money"))
      .select(col("pk"), (col("money") * 100).cast(LongType).as("cents"))
    val cum = Windows.globalCumSumNoSort(rev, -col("cents"), col("pk"),
      col("cents"), 1L << 22, "cum", "tot")
    val cls = cum.withColumn("abc_class",
      when(col("cum") * 100 <= col("tot") * 80, lit("A"))
        .when(col("cum") * 100 <= col("tot") * 95, lit("B"))
        .otherwise(lit("C")))
    cls.groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("cents")).as("revenue_cents"),
        max(col("tot")).as("tot"))
      .select(col("abc_class"), col("n_parts"),
        col("revenue_cents").cast(LongType).as("revenue_cents"),
        (col("revenue_cents").cast(DoubleType) / col("tot").cast(DoubleType))
          .as("revenue_share"))
      .orderBy(col("abc_class"))
  }

  /** q304 — SKYLINE (2-D Pareto front): the parts no other part beats
    * on BOTH revenue and order count — the multi-criteria shortlist
    * (top-k forces one weighting; the skyline is every defensible
    * answer at once). Dominance: p dominates q iff p ≥ q in both
    * dimensions and > in at least one; equal points are mutually
    * non-dominated and both survive.
    *
    * Scale shape: the classic sort-scan skyline made distributed —
    * per-revenue-group max count (one partial-agg-sized window per
    * group), then ONE prefix-max over the O(distinct revenues) group
    * rows (the only unpartitioned window), and a point survives iff
    * it tops its own revenue group AND strictly beats every
    * higher-revenue group's best count. Never the naive O(n²)
    * dominance self-join the oracle states. All-integer. */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    val parts = load(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg((sum(d2(col("l_extendedprice"))) * 100).cast(LongType)
        .as("revenue_cents"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    val wGrp = Window.partitionBy(col("revenue_cents"))
    val grp = parts.withColumn("gmax", max(col("n_orders")).over(wGrp))
    val gRows = grp.select(col("revenue_cents"), col("gmax")).distinct()
    val wPre = Window.orderBy(col("revenue_cents").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = gRows.withColumn("premax",
      coalesce(max(col("gmax")).over(wPre), lit(-1L)))
      .select(col("revenue_cents"), col("premax"))
    grp.join(broadcast(pre), "revenue_cents")
      .filter(col("n_orders") === col("gmax") &&
        col("n_orders") > col("premax"))
      .select(col("pk"), col("revenue_cents"), col("n_orders"))
      .orderBy(col("pk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q304_skyline_parts" -> skylineParts,
    "q293_abc_classification" -> abcClassification,
    "q290_copurchase_pairs" -> copurchasePairs,
    "q226_keyset_pagination" -> keysetPagination,
    "q227_lateral_alias" -> lateralAlias,
    "q220_sql_surfaces" -> sqlSurfaces,
    "q214_pipe_syntax" -> pipeSyntaxPricing,
    "q215_sql_variables" -> sqlVariablesRevenue,
    "q192_topn_other" -> topNWithOther,
    "q169_hierarchy_share" -> hierarchyShare,
    "q63_set_ops_all" -> setOpsAll,
    "q01_pricing_summary" -> pricingSummary,
    "q02_revenue_filter" -> revenueFilter,
    "q03_top_orders" -> topUnshippedOrders,
    "q265_join_hints" -> topOrdersShuffleHash,
    "q267_sql_scripting" -> sqlScripting,
    "q04_semi_join" -> orderPriorityCheck,
    "q05_multiway_join" -> localSupplierVolume,
    "q06_outer_join_distribution" -> customerDistribution,
    "q07_anti_join" -> customersWithoutOrders,
    "q08_global_topk" -> globalTopOrders,
    "q09_argmax_per_day" -> argmaxPerDay,
    "q10_argmin_per_day" -> argminPerDay,
    "q11_set_ops" -> setOpsCustkeys,
    "q12_rollup" -> rollupQuantities,
    "q13_cube" -> cubeOrders,
    "q14_having" -> segmentBalances,
    "q15_distinct_counts" -> distinctCounts)

  private lazy val pricingOracle: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private lazy val revenueOracle: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  private val q03Oracle: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  val oracles: Map[String, String] = Map(
    // q304: deliberately the NAIVE quadratic dominance anti-join —
    // matching it proves the sort-scan skyline exact
    "q304_skyline_parts" ->
      """WITH p AS (SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
        |      AS BIGINT) AS revenue_cents,
        |    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |  FROM lineitem GROUP BY 1)
        |SELECT pk, revenue_cents, n_orders FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p b
        |  WHERE b.revenue_cents >= a.revenue_cents
        |    AND b.n_orders >= a.n_orders
        |    AND (b.revenue_cents > a.revenue_cents
        |         OR b.n_orders > a.n_orders))
        |ORDER BY pk""".stripMargin,
    // q293: oracle states the naive global-sorted window; the
    // two-level prefix sum is the same total order
    "q293_abc_classification" ->
      """WITH rev AS (SELECT l_partkey AS pk,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT pk, cents,
        |        SUM(cents) OVER (ORDER BY cents DESC, pk) AS cum,
        |        SUM(cents) OVER () AS tot FROM rev),
        |k AS (SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
        |             WHEN cum * 100 <= tot * 95 THEN 'B'
        |             ELSE 'C' END AS abc_class,
        |        cents, tot FROM c)
        |SELECT abc_class, COUNT(*) AS n_parts,
        |  CAST(SUM(cents) AS BIGINT) AS revenue_cents,
        |  CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(MAX(tot) AS BIGINT) AS DOUBLE) AS revenue_share
        |FROM k GROUP BY 1 ORDER BY abc_class""".stripMargin,
    "q290_copurchase_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |           FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT ok) AS nb FROM li),
        |ic AS (SELECT pk, COUNT(*) AS cnt FROM li GROUP BY 1),
        |p AS (SELECT a.pk AS part_a, b.pk AS part_b,
        |        CAST(COUNT(*) AS BIGINT) AS support
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT part_a, part_b, support,
        |  CAST(support AS DOUBLE) * CAST(nb AS DOUBLE)
        |    / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)) AS lift
        |FROM p JOIN ic ca ON ca.pk = part_a
        |       JOIN ic cb ON cb.pk = part_b, n
        |ORDER BY support DESC, lift DESC, part_a, part_b
        |LIMIT 20""".stripMargin,
    "q192_topn_other" ->
      """WITH s AS (SELECT o_custkey AS key,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
        |  FROM orders GROUP BY 1),
        |j AS (SELECT c_nationkey, key, sp,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY sp DESC, key) AS rn
        |  FROM s JOIN customer ON key = c_custkey)
        |SELECT c_nationkey, CAST(key AS VARCHAR) AS entity,
        |  CAST(1 AS BIGINT) AS n_customers, CAST(sp AS DOUBLE) AS spend
        |FROM j WHERE rn <= 3
        |UNION ALL
        |SELECT c_nationkey, 'OTHER', COUNT(*),
        |  CAST(CAST(SUM(sp) AS VARCHAR) AS DOUBLE)
        |FROM j WHERE rn > 3 GROUP BY 1
        |ORDER BY c_nationkey, entity""".stripMargin,
    "q169_hierarchy_share" ->
      """WITH leaf AS (SELECT r.r_name, n.n_name,
        |    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM customer c
        |  JOIN orders o ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT r_name, SUM(rev) AS r_rev FROM leaf GROUP BY 1),
        |wt AS (SELECT SUM(rev) AS w_rev FROM leaf)
        |SELECT leaf.r_name, leaf.n_name,
        |  CAST(leaf.rev AS DOUBLE) AS revenue,
        |  CAST(leaf.rev AS DOUBLE) / CAST(rt.r_rev AS DOUBLE)
        |    AS share_of_region,
        |  CAST(leaf.rev AS DOUBLE) / CAST(wt.w_rev AS DOUBLE)
        |    AS share_of_world
        |FROM leaf JOIN rt USING (r_name), wt
        |ORDER BY leaf.r_name, leaf.n_name""".stripMargin,
    "q63_set_ops_all" ->
      """SELECT custkey, COUNT(*) AS multiplicity
        |FROM (
        |  (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |   INTERSECT ALL
        |   SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |  EXCEPT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P')
        |GROUP BY custkey
        |ORDER BY custkey""".stripMargin,
    // the OFFSET form IS the oracle: seek-pagination must equal skip
    "q226_keyset_pagination" ->
      """SELECT c_custkey, c_name,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |FROM customer
        |ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey
        |LIMIT 10 OFFSET 10""".stripMargin,
    "q227_lateral_alias" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS gross,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(*) AS avg_price,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q220_sql_surfaces" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q01_pricing_summary" -> pricingOracle,
    // the SAME oracle strings as q01/q02: the pipe-syntax and
    // session-variable surfaces must agree with the DataFrame forms
    "q214_pipe_syntax" -> pricingOracle,
    "q02_revenue_filter" -> revenueOracle,
    "q215_sql_variables" -> revenueOracle,
    "q03_top_orders" -> q03Oracle,
    // hints are physical-only: same oracle STRING as q03 so the two
    // forms can never fork semantically
    "q265_join_hints" -> q03Oracle,
    // the loop's fixpoint in closed form: smallest 2^k keeping <= 10
    "q267_sql_scripting" ->
      """WITH ks AS (SELECT UNNEST(GENERATE_SERIES(0, 62)) AS k),
        |t AS (SELECT CAST(CAST(1 AS BIGINT) << k AS DOUBLE) AS thr
        |      FROM ks),
        |c AS (SELECT thr,
        |    (SELECT COUNT(*) FROM orders o WHERE o.o_totalprice >= t.thr)
        |      AS n_above
        |  FROM t)
        |SELECT thr AS threshold, n_above FROM c
        |WHERE n_above <= 10 ORDER BY thr LIMIT 1""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 47)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q05_multiway_join" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q06_outer_join_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q08_global_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 15""".stripMargin,
    "q09_argmax_per_day" ->
      """SELECT order_date, o_orderkey, o_custkey, o_totalprice
        |FROM (SELECT CAST(o_orderdate AS DATE) AS order_date, o_orderkey,
        |             o_custkey, o_totalprice,
        |             ROW_NUMBER() OVER (PARTITION BY CAST(o_orderdate AS DATE)
        |               ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1
        |ORDER BY order_date""".stripMargin,
    "q10_argmin_per_day" ->
      """SELECT order_date, o_orderkey, o_custkey, o_totalprice
        |FROM (SELECT CAST(o_orderdate AS DATE) AS order_date, o_orderkey,
        |             o_custkey, o_totalprice,
        |             ROW_NUMBER() OVER (PARTITION BY CAST(o_orderdate AS DATE)
        |               ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn
        |      FROM orders) t
        |WHERE rn = 1
        |ORDER BY order_date""".stripMargin,
    "q11_set_ops" ->
      """(SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        | INTERSECT
        | SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY custkey""".stripMargin,
    "q12_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q13_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
        |       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin,
    "q14_having" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |GROUP BY c_mktsegment
        |HAVING COUNT(*) > 3
        |ORDER BY c_mktsegment""".stripMargin,
    "q15_distinct_counts" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_orderkey) AS n_orders,
        |       COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
}
