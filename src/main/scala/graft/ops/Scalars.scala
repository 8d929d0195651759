package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Scalar-function coverage (SURVEY.md §2.9 F1-F8): string
  * normalization / split / concat (F1, F2, F6 —
  * /root/reference/dags/get_prices_load_mongodb.py:31-38), date
  * round-trips and day arithmetic (F4, F5 —
  * /root/reference/api/mongo/main.py:68-69), struct->JSON (F7 —
  * /root/reference/dags/get_prices_load_minio.py:77), JSON extraction,
  * and numeric casts at the serving edge (F8).
  */
object Scalars {

  /** String functions over part: upper/substr/length/replace/concat/
    * split/regexp-extract — all codegen'd built-ins, no UDFs (the
    * engine's rule: built-ins only in the hot path, SURVEY §2.11). */
  def stringFunctions(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      substring(col("p_type"), 1, 3).as("type_prefix"),
      length(col("p_name")).cast(LongType).as("name_len"),
      concat_ws(":", col("p_brand"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_name"), " ", "_").as("name_us"),
      regexp_extract(col("p_brand"), "([0-9]+)", 1).cast(LongType)
        .as("brand_num"),
      split(col("p_name"), " ").getItem(0).as("first_word"),
      trim(regexp_replace(col("p_name"), "\\s+", " ")).as("name_norm"))
      .orderBy(col("p_partkey"))

  /** Date part extraction + day arithmetic (F4/F5). */
  def dateFunctions(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast(LongType).as("order_year"),
      month(col("o_orderdate")).cast(LongType).as("order_month"),
      dayofmonth(col("o_orderdate")).cast(LongType).as("order_day"),
      quarter(col("o_orderdate")).cast(LongType).as("order_quarter"),
      col("o_orderdate").cast(DateType).as("order_date"),
      date_add(col("o_orderdate").cast(DateType), 1).as("next_day"),
      datediff(col("o_orderdate").cast(DateType),
        to_date(lit("1995-01-01"))).cast(LongType).as("days_since_epoch"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_str"))
      .orderBy(col("o_orderkey"))

  /** Monthly revenue series — date_trunc group-by (time-series shape). */
  def monthlyRevenue(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz")
        .as("order_month"))
      .agg(dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("order_month"))

  /** CASE WHEN + arithmetic at the serving edge (F8-style casts). */
  def caseWhenBuckets(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_totalprice") < 50000.0, "small")
        .when(col("o_totalprice") < 150000.0, "medium")
        .otherwise("large").as("price_bucket"),
      (d2(col("o_totalprice")) * d4(lit(0.1))).cast(DoubleType).as("fee"),
      col("o_totalprice").cast("decimal(18,2)").cast(StringType)
        .as("price_str"))
      .orderBy(col("o_orderkey"))

  /** JSON extraction from the events props column (F7 inverse). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))
      .orderBy(col("event_id"))

  /** Spark 4 VARIANT semi-structured path (SPARK-45891) — q24's
    * string-at-a-time get_json_object upgraded to the binary VARIANT
    * encoding: parse once (`parse_json`), then typed path extraction
    * (`variant_get(..., 'long')`) feeds a normal relational rollup.
    * At 100 TB the difference is material: VARIANT parses each props
    * value ONCE into a traversable binary form instead of re-running
    * a JSON parser per extracted path, and the typed get avoids a
    * string→long cast per row. The oracle runs the same typed
    * extraction through DuckDB's native JSON operator — same values,
    * engine-appropriate encodings on both sides. */
  def variantExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
      .groupBy(expr("k div 10").as("k_decile"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
      .orderBy(col("k_decile"))

  /** SQL-DEFINED FUNCTION surface (Spark 4 `CREATE FUNCTION ...
    * RETURN expr`, SPARK-46246): the library's exact-decimal net-price
    * rule packaged as a reusable SQL function and used in a rollup.
    * Unlike a Scala/Python UDF, a SQL function is MACRO-EXPANDED into
    * the Catalyst expression tree — it constant-folds, participates
    * in whole-stage codegen and pushdown, and costs nothing at 100 TB
    * (the engine's no-UDF rule §2.11, now with a user-extensible
    * front door). The oracle inlines the identical arithmetic. */
  def sqlFunctionRollup(spark: SparkSession, dir: String): DataFrame = {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_net_price(
        |  p DOUBLE, d DOUBLE) RETURNS DECIMAL(23,4)
        |RETURN CAST(p AS DECIMAL(18,2)) * CAST(1.0 - d AS DECIMAL(4,2))
        |""".stripMargin)
    load(spark, dir, "lineitem").createOrReplaceTempView("graft_li_sqlfn")
    spark.sql(
      """SELECT l_returnflag,
        |  CAST(SUM(graft_net_price(l_extendedprice, l_discount)) AS DOUBLE)
        |    AS net_revenue,
        |  COUNT(*) AS n
        |FROM graft_li_sqlfn GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** Hourly tumbling aggregation over events — the batch twin of the
    * Structured Streaming query (SURVEY §2.10); also exercises the
    * ns->us timestamp path. */
  def hourlyEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz")
        .as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_string_funcs" -> stringFunctions,
    "q21_date_funcs" -> dateFunctions,
    "q22_monthly_revenue" -> monthlyRevenue,
    "q23_case_buckets" -> caseWhenBuckets,
    "q24_json_extract" -> jsonExtract,
    "q25_events_hourly" -> hourlyEvents,
    "q195_variant_extract" -> variantExtract,
    "q197_sql_function" -> sqlFunctionRollup)

  val oracles: Map[String, String] = Map(
    "q197_sql_function" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
        |    AS net_revenue,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q195_variant_extract" ->
      """WITH x AS (SELECT CAST(props->>'k' AS BIGINT) AS k FROM events)
        |SELECT k // 10 AS k_decile, COUNT(*) AS n,
        |  CAST(SUM(k) AS BIGINT) AS k_sum
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_string_funcs" ->
      """SELECT p_partkey,
        | UPPER(p_name) AS name_upper,
        | SUBSTRING(p_type, 1, 3) AS type_prefix,
        | LENGTH(p_name) AS name_len,
        | p_brand || ':' || p_type AS brand_type,
        | REPLACE(p_name, ' ', '_') AS name_us,
        | CAST(REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
        | STRING_SPLIT(p_name, ' ')[1] AS first_word,
        | TRIM(REGEXP_REPLACE(p_name, '\s+', ' ', 'g')) AS name_norm
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q21_date_funcs" ->
      """SELECT o_orderkey,
        | CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
        | CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
        | CAST(DAY(o_orderdate) AS BIGINT) AS order_day,
        | CAST(QUARTER(o_orderdate) AS BIGINT) AS order_quarter,
        | CAST(o_orderdate AS DATE) AS order_date,
        | CAST(o_orderdate AS DATE) + 1 AS next_day,
        | DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch,
        | STRFTIME(o_orderdate, '%Y-%m-%d') AS date_str
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q22_monthly_revenue" ->
      """SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q23_case_buckets" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice < 50000.0 THEN 'small'
        |      WHEN o_totalprice < 150000.0 THEN 'medium'
        |      ELSE 'large' END AS price_bucket,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(4,2)) AS DOUBLE) AS fee,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q24_json_extract" ->
      """SELECT event_id,
        | CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q25_events_hourly" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)
}
