package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Incremental-maintenance operators: the CDC MERGE (upsert) that keeps
  * a warehouse snapshot in step with a change stream. The reference's
  * only update semantics is the MinIO last-write-wins object key
  * (/root/reference/dags/get_prices_load_minio.py:80, SCD1) and the
  * Postgres full reload (get_prices_load_postgres.py:59); this is the
  * set-based MERGE both of those grow into.
  *
  * Scale design: a MERGE is ONE full-outer shuffle join on the key —
  * never a per-row lookup loop. The classify-and-apply step is a single
  * codegen'd projection over the joined row; AQE handles skewed keys.
  * Contrast with row-at-a-time upserts, which at 100 TB would be 10^11
  * point lookups.
  */
object Incremental {

  /** CDC merge of an order-derived change batch into the customer
    * snapshot. Changes = per-customer order totals; change keys
    * divisible by 100 also appear with negated keys (-key-1) as
    * brand-new entities,
    * so all three MERGE actions occur: matched -> 'update' (balance +=
    * delta), unmatched-change -> 'insert', untouched-base -> 'keep'.
    * Balance arithmetic is exact DECIMAL with one final cast to double
    * (the [[graft.Tables]] determinism contract). */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    // side-presence markers classify the action by KEY presence (the
    // MERGE contract), not by value nullness — a NULL balance or delta
    // must not flip a matched row to 'insert'
    val base = load(spark, dir, "customer")
      .select(col("c_custkey").as("key"), d2(col("c_acctbal")).as("old_bal"),
        lit(true).as("in_base"))
    val agg = load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"))
      .agg(sum(d2(col("o_totalprice"))).as("delta"),
        count(lit(1)).as("n_orders"))
    // synthetic brand-new entities: negated keys can never collide with
    // a real (nonnegative) custkey at ANY scale factor
    val inserts = agg.filter(col("key") % 100 === 0)
      .select((-col("key") - 1).as("key"), col("delta"),
        col("n_orders"))
    val changes = agg.unionByName(inserts)
      .withColumn("in_ch", lit(true))
    base.join(changes, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("in_base").isNotNull && col("in_ch").isNotNull, "update")
          .when(col("in_ch").isNull, "keep")
          .otherwise("insert").as("action"),
        col("old_bal").cast(DoubleType).as("old_bal"),
        (coalesce(col("old_bal"), lit(0).cast(DecimalType(18, 2))) +
          coalesce(col("delta"), lit(0).cast(DecimalType(18, 2))))
          .cast(DoubleType).as("new_bal"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("key"))
  }

  /** CDC MERGE with DELETE TOMBSTONES — [[mergeUpsert]]'s three-action
    * MERGE completed to the full four-action contract (WHEN MATCHED
    * AND tombstone THEN DELETE): the change feed carries per-customer
    * order deltas and brand-new inserts (q80's slices) PLUS explicit
    * delete tombstones for base keys divisible by 97 (the q143/q174
    * deletion slice), and a tombstone SUPERSEDES a same-batch delta —
    * standard CDC feed-compaction order (a replicated DELETE must win
    * over an earlier UPDATE in the same batch or the row resurrects).
    * Output is the audit relation a MERGE emits: every key with its
    * action; 'delete' rows carry NULL new_bal (they survive in the
    * audit, not in the snapshot) and zeroed n_orders.
    *
    * Scale shape: compacting the feed is ONE outer join of the two
    * O(changes) sides; applying it is ONE full-outer key join against
    * the base — never a per-row lookup. Balance arithmetic stays in
    * exact DECIMAL until one final cast ([[graft.Tables]] contract). */
  def mergeTombstones(spark: SparkSession, dir: String): DataFrame = {
    val base = load(spark, dir, "customer")
      .select(col("c_custkey").as("key"), d2(col("c_acctbal")).as("old_bal"),
        lit(true).as("in_base"))
    val agg = load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"))
      .agg(sum(d2(col("o_totalprice"))).as("delta"),
        count(lit(1)).as("n_orders"))
    val inserts = agg.filter(col("key") % 100 === 0)
      .select((-col("key") - 1).as("key"), col("delta"), col("n_orders"))
    val tombs = load(spark, dir, "customer")
      .filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("key"), lit(true).as("is_tomb"))
    // feed compaction: delta/insert rows ⟗ tombstones on the key —
    // a key can carry both, and the classifier below lets the
    // tombstone win
    val feed = agg.unionByName(inserts).withColumn("in_upd", lit(true))
      .join(tombs, Seq("key"), "full_outer")
    base.join(feed, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("is_tomb").isNotNull, "delete")
          .when(col("in_upd").isNotNull && col("in_base").isNotNull, "update")
          .when(col("in_upd").isNotNull, "insert")
          .otherwise("keep").as("action"),
        col("old_bal").cast(DoubleType).as("old_bal"),
        when(col("is_tomb").isNotNull, lit(null).cast(DoubleType))
          .otherwise(
            (coalesce(col("old_bal"), lit(0).cast(DecimalType(18, 2))) +
              coalesce(col("delta"), lit(0).cast(DecimalType(18, 2))))
              .cast(DoubleType)).as("new_bal"),
        when(col("is_tomb").isNotNull, lit(0L))
          .otherwise(coalesce(col("n_orders"), lit(0L))).as("n_orders"))
      .orderBy(col("key"))
  }

  /** Incremental view maintenance by partial-aggregate algebra: the
    * monthly rollup is computed FROM the daily partials — sum of sums,
    * sum of counts, min of mins, max of maxs — never from the base
    * table. This is the algebra that lets a 100 TB warehouse maintain
    * coarse aggregates by merging yesterday's materialized partials
    * with today's delta partials (O(partials), not O(base)); the
    * oracle recomputes directly from base, and the two agree exactly
    * because sum/count/min/max are commutative monoids and the money
    * arithmetic stays in exact DECIMAL until one final cast. */
  def rollupMerge(spark: SparkSession, dir: String): DataFrame = {
    val daily = load(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"), sum(d2(col("o_totalprice"))).as("s"),
        min(d2(col("o_totalprice"))).as("mn"),
        max(d2(col("o_totalprice"))).as("mx"))
    daily
      .groupBy(date_trunc("month", col("day")).cast("timestamp_ntz")
        .as("month"))
      .agg(sum(col("n")).as("n_orders"),
        sum(col("s")).cast(DoubleType).as("revenue"),
        min(col("mn")).cast(DoubleType).as("min_price"),
        max(col("mx")).cast(DoubleType).as("max_price"))
      .orderBy(col("month"))
  }

  /** Late-arriving-data reconcile, partition-targeted: a deterministic
    * slice of orders (key % 50 = 0) arrives late; instead of
    * recomputing every day's aggregate, recompute ONLY the days the
    * late batch touches (left-semi join on the late batch's day set)
    * and emit those corrected rows — the partition-overwrite a backfill
    * job writes. At 100 TB this is the difference between rescanning
    * the fact table and rescanning O(affected partitions); the same
    * day-predicate reaches a date-partitioned store as partition
    * pruning (q64's pinned mechanics). The oracle recomputes the full
    * daily aggregate and restricts it to the affected days — identical
    * because the full-data aggregate of an affected day IS its
    * corrected value. */
  def lateRecompute(spark: SparkSession, dir: String): DataFrame = {
    val orders = load(spark, dir, "orders")
    val lateDays = orders.filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderdate").as("day")).distinct()
    orders
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
      .join(lateDays, Seq("day"), "left_semi")
      .orderBy(col("day"))
  }

  /** SNAPSHOT DIFF — CDC *extract*, the inverse of q80's MERGE apply:
    * given two snapshots of the customer table, emit the minimal change
    * feed (insert/update/delete) that transforms A into B. Snapshot B
    * is derived in-query so the diff is self-checking: keys % 97 = 0
    * dropped (deletes), % 100 = 0 get balance+10 (updates) plus a
    * negated-key twin (inserts; can never collide with a real
    * nonnegative custkey). Scale shape: ONE full-outer shuffle join on
    * the key and a codegen'd classify projection — the same no-per-row-
    * lookup contract as the merge; unchanged rows are filtered before
    * the sink so the feed is O(changes), not O(snapshot). Balances
    * compare in exact DECIMAL and cast to double once. */
  /** Snapshot A: the customer table as stored. ONE definition serving
    * the diff (q143) and the feed apply (q174). */
  private def snapA(cust: DataFrame): DataFrame =
    cust.select(col("c_custkey").as("key"), d2(col("c_acctbal")).as("bal_a"))

  /** Snapshot B: A evolved in-query — keys % 97 = 0 dropped, % 100 = 0
    * get balance+10 plus a negated-key insert twin. Shared by q143 and
    * q174's closure oracle. */
  private def snapB(cust: DataFrame): DataFrame = {
    val kept = cust.filter(col("c_custkey") % 97 =!= 0)
      .select(col("c_custkey").as("key"),
        when(col("c_custkey") % 100 === 0,
          d2(col("c_acctbal")) + lit(10).cast(DecimalType(18, 2)))
          .otherwise(d2(col("c_acctbal"))).as("bal_b"))
    val inserted = cust.filter(col("c_custkey") % 100 === 0)
      .select((-col("c_custkey") - 1).as("key"),
        d2(col("c_acctbal")).as("bal_b"))
    kept.unionByName(inserted)
  }

  /** The raw change feed (key, action, bal_a, bal_b) in DECIMAL —
    * q143 projects it to doubles, q174 applies it. */
  private def changeFeed(cust: DataFrame): DataFrame =
    snapA(cust).withColumn("in_a", lit(true))
      .join(snapB(cust).withColumn("in_b", lit(true)), Seq("key"),
        "full_outer")
      .withColumn("action",
        when(col("in_a").isNull, "insert")
          .when(col("in_b").isNull, "delete")
          .when(col("bal_a") =!= col("bal_b"), "update"))
      .filter(col("action").isNotNull)

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame =
    changeFeed(load(spark, dir, "customer"))
      .select(col("key"), col("action"),
        col("bal_a").cast(DoubleType).as("old_bal"),
        col("bal_b").cast(DoubleType).as("new_bal"))
      .orderBy(col("key"))

  /** CHANGE-FEED APPLY — the full MERGE including DELETE: snapshot A +
    * q143's feed must reconstruct snapshot B exactly (extract ∘ apply
    * = identity, the round-trip law of CDC). One full-outer join of A
    * with the feed classifies per key: delete → drop, update/insert →
    * feed value, absent → keep A. The oracle derives B DIRECTLY from
    * the shared snapB rule, so the gate checks the closure, not a
    * re-implementation of the apply. */
  def applyChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val cust = load(spark, dir, "customer")
    val feed = changeFeed(cust)
      .select(col("key"), col("action"), col("bal_b"))
    snapA(cust).join(feed, Seq("key"), "full_outer")
      .filter(col("action").isNull || col("action") =!= "delete")
      .select(col("key"),
        coalesce(col("bal_b"), col("bal_a")).cast(DoubleType).as("balance"))
      .orderBy(col("key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_merge_upsert" -> mergeUpsert,
    "q253_merge_tombstones" -> mergeTombstones,
    "q86_rollup_merge" -> rollupMerge,
    "q87_late_recompute" -> lateRecompute,
    "q143_snapshot_diff" -> snapshotDiff,
    "q174_apply_change_feed" -> applyChangeFeed)

  val oracles: Map[String, String] = Map(
    // B derived DIRECTLY (not via a diff re-implementation): the gate
    // checks extract∘apply = identity
    "q174_apply_change_feed" ->
      """SELECT key, CAST(bal_b AS DOUBLE) AS balance
        |FROM (SELECT c_custkey AS key,
        |    CASE WHEN c_custkey % 100 = 0
        |      THEN CAST(c_acctbal AS DECIMAL(18,2)) + CAST(10 AS DECIMAL(18,2))
        |      ELSE CAST(c_acctbal AS DECIMAL(18,2)) END AS bal_b
        |  FROM customer WHERE c_custkey % 97 <> 0
        |  UNION ALL
        |  SELECT -c_custkey - 1, CAST(c_acctbal AS DECIMAL(18,2))
        |  FROM customer WHERE c_custkey % 100 = 0)
        |ORDER BY key""".stripMargin,
    "q143_snapshot_diff" ->
      """WITH a AS (SELECT c_custkey AS key,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal_a FROM customer),
        |b AS (SELECT c_custkey AS key,
        |    CASE WHEN c_custkey % 100 = 0
        |      THEN CAST(c_acctbal AS DECIMAL(18,2)) + CAST(10 AS DECIMAL(18,2))
        |      ELSE CAST(c_acctbal AS DECIMAL(18,2)) END AS bal_b
        |  FROM customer WHERE c_custkey % 97 <> 0
        |  UNION ALL
        |  SELECT -c_custkey - 1, CAST(c_acctbal AS DECIMAL(18,2))
        |  FROM customer WHERE c_custkey % 100 = 0),
        |d AS (SELECT COALESCE(a.key, b.key) AS key,
        |    CASE WHEN a.key IS NULL THEN 'insert'
        |      WHEN b.key IS NULL THEN 'delete'
        |      WHEN a.bal_a <> b.bal_b THEN 'update' END AS action,
        |    CAST(a.bal_a AS DOUBLE) AS old_bal,
        |    CAST(b.bal_b AS DOUBLE) AS new_bal
        |  FROM a FULL OUTER JOIN b ON a.key = b.key)
        |SELECT * FROM d WHERE action IS NOT NULL ORDER BY key""".stripMargin,
    "q253_merge_tombstones" ->
      """WITH base AS (SELECT c_custkey AS key,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS old_bal FROM customer),
        |agg AS (SELECT o_custkey AS key,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS delta,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |feedu AS (SELECT key, delta, n_orders FROM agg
        |  UNION ALL
        |  SELECT -key - 1, delta, n_orders FROM agg WHERE key % 100 = 0),
        |tomb AS (SELECT c_custkey AS key FROM customer
        |  WHERE c_custkey % 97 = 0),
        |feed AS (SELECT COALESCE(u.key, t.key) AS key, u.delta,
        |    u.n_orders, u.key IS NOT NULL AS in_upd,
        |    t.key IS NOT NULL AS is_tomb
        |  FROM feedu u FULL OUTER JOIN tomb t ON u.key = t.key)
        |SELECT COALESCE(b.key, f.key) AS key,
        |  CASE WHEN f.is_tomb THEN 'delete'
        |       WHEN f.in_upd AND b.key IS NOT NULL THEN 'update'
        |       WHEN f.in_upd THEN 'insert'
        |       ELSE 'keep' END AS action,
        |  CAST(b.old_bal AS DOUBLE) AS old_bal,
        |  CASE WHEN f.is_tomb THEN NULL
        |       ELSE CAST(COALESCE(b.old_bal, CAST(0 AS DECIMAL(18,2)))
        |         + COALESCE(f.delta, CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
        |  END AS new_bal,
        |  CAST(CASE WHEN f.is_tomb THEN 0 ELSE COALESCE(f.n_orders, 0) END
        |    AS BIGINT) AS n_orders
        |FROM base b FULL OUTER JOIN feed f ON b.key = f.key
        |ORDER BY 1""".stripMargin,
    "q80_merge_upsert" ->
      """WITH base AS (SELECT c_custkey AS key,
        |                CAST(c_acctbal AS DECIMAL(18,2)) AS old_bal
        |              FROM customer),
        |agg AS (SELECT o_custkey AS key,
        |          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS delta,
        |          COUNT(*) AS n_orders
        |        FROM orders GROUP BY 1),
        |changes AS (SELECT * FROM agg
        |            UNION ALL
        |            SELECT -key - 1, delta, n_orders
        |            FROM agg WHERE key % 100 = 0)
        |SELECT COALESCE(b.key, c.key) AS key,
        |  CASE WHEN b.key IS NOT NULL AND c.key IS NOT NULL THEN 'update'
        |       WHEN c.key IS NULL THEN 'keep'
        |       ELSE 'insert' END AS action,
        |  CAST(b.old_bal AS DOUBLE) AS old_bal,
        |  CAST(COALESCE(b.old_bal, 0) + COALESCE(c.delta, 0) AS DOUBLE) AS new_bal,
        |  COALESCE(c.n_orders, 0) AS n_orders
        |FROM base b FULL OUTER JOIN changes c ON b.key = c.key
        |ORDER BY key""".stripMargin,
    // direct-from-base formulation: equals the Spark side's
    // merge-of-daily-partials by monoid algebra
    "q86_rollup_merge" ->
      """SELECT DATE_TRUNC('month', o_orderdate) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        |FROM orders
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q87_late_recompute" ->
      """WITH late_days AS (SELECT DISTINCT o_orderdate AS day FROM orders
        |                   WHERE o_orderkey % 50 = 0)
        |SELECT o_orderdate AS day, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderdate IN (SELECT day FROM late_days)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin)
}
