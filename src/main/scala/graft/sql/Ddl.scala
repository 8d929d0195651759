package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DDL surface (SURVEY §2.12 O2): the reference's CREATE TABLE tasks
  * (/root/reference/dags/get_prices_load_postgres.py:80-85 for
  * gas_prices, /root/reference/dags/test_dag_postgres.py:13-26 for
  * employee — its full DDL type vocabulary) re-expressed against the
  * Spark session catalog.
  *
  * Type decisions vs the reference (SURVEY §1.2/§1.3): price is
  * DECIMAL(6,1) not VARCHAR (numeric ordering, the lexicographic-sort
  * bug fixed); SERIAL becomes an ordinary BIGINT the pipeline
  * populates; quoted reserved column "user" carries over unchanged.
  */
object Ddl {

  /** `gas_prices` canonical schema (SURVEY §1.4). */
  def createGasPrices(spark: SparkSession): DataFrame =
    spark.sql(
      """CREATE TABLE IF NOT EXISTS gas_prices (
        |  price   DECIMAL(6,1),
        |  station STRING,
        |  city    STRING,
        |  time    STRING,
        |  user    STRING,
        |  date    DATE
        |) USING parquet PARTITIONED BY (date)""".stripMargin)

  /** `employee` — the reference's DDL type-vocabulary example. */
  def createEmployee(spark: SparkSession): DataFrame =
    spark.sql(
      """CREATE TABLE IF NOT EXISTS employee (
        |  id         BIGINT NOT NULL,
        |  first_name VARCHAR(40) NOT NULL,
        |  last_name  VARCHAR(40) NOT NULL,
        |  hire_date  DATE NOT NULL,
        |  notes      VARCHAR(255)
        |) USING parquet""".stripMargin)
}
