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
    * divisible by 100 also appear offset by 10^7 as brand-new entities,
    * so all three MERGE actions occur: matched -> 'update' (balance +=
    * delta), unmatched-change -> 'insert', untouched-base -> 'keep'.
    * Balance arithmetic is exact DECIMAL with one final cast to double
    * (the [[graft.Tables]] determinism contract). */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = load(spark, dir, "customer")
      .select(col("c_custkey").as("key"), d2(col("c_acctbal")).as("old_bal"))
    val agg = load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"))
      .agg(sum(d2(col("o_totalprice"))).as("delta"),
        count(lit(1)).as("n_orders"))
    val inserts = agg.filter(col("key") % 100 === 0)
      .select((col("key") + 10000000L).as("key"), col("delta"),
        col("n_orders"))
    val changes = agg.unionByName(inserts)
    base.join(changes, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("old_bal").isNotNull && col("delta").isNotNull, "update")
          .when(col("delta").isNull, "keep")
          .otherwise("insert").as("action"),
        col("old_bal").cast(DoubleType).as("old_bal"),
        (coalesce(col("old_bal"), lit(0).cast(DecimalType(18, 2))) +
          coalesce(col("delta"), lit(0).cast(DecimalType(18, 2))))
          .cast(DoubleType).as("new_bal"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_merge_upsert" -> mergeUpsert)

  val oracles: Map[String, String] = Map(
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
        |            SELECT key + 10000000, delta, n_orders
        |            FROM agg WHERE key % 100 = 0)
        |SELECT COALESCE(b.key, c.key) AS key,
        |  CASE WHEN b.key IS NOT NULL AND c.key IS NOT NULL THEN 'update'
        |       WHEN c.key IS NULL THEN 'keep'
        |       ELSE 'insert' END AS action,
        |  CAST(b.old_bal AS DOUBLE) AS old_bal,
        |  CAST(COALESCE(b.old_bal, 0) + COALESCE(c.delta, 0) AS DOUBLE) AS new_bal,
        |  COALESCE(c.n_orders, 0) AS n_orders
        |FROM base b FULL OUTER JOIN changes c ON b.key = c.key
        |ORDER BY key""".stripMargin)
}
