package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.Ddl

/** DDL surface (SURVEY §2.12 O2): session-catalog tables with the
  * reference's schemas, typed per the §1.2/§1.3 decisions. */
class DdlSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()

  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(s"spark-warehouse/$name"))
  }

  test("gas_prices: partitioned by date, price is DECIMAL(6,1)") {
    resetTable("gas_prices")
    Ddl.createGasPrices(spark)
    val schema = spark.table("gas_prices").schema
    assert(schema("price").dataType === DecimalType(6, 1))
    assert(schema("date").dataType === DateType)
    // numeric ordering holds in the catalog table (the reference's
    // varchar price sorted lexicographically — §1.2 divergence)
    spark.sql("""INSERT INTO gas_prices
      VALUES (99.9, 's1', 'c', '9:00AM', 'u', DATE '2023-04-01'),
             (163.9, 's2', 'c', '9:01AM', 'u', DATE '2023-04-01')""")
    val top = spark.sql(
      "SELECT station FROM gas_prices ORDER BY price DESC LIMIT 1")
    assert(top.head.getString(0) === "s2") // varchar sort would say s1
    resetTable("gas_prices")
  }

  test("column DEFAULT values: omitted columns fill from the declared default") {
    // Spark 3.4+ DEFAULT surface on file-based tables (SPARK-38334):
    // the warehouse-grade schema-evolution companion to q179 — new
    // columns get declared defaults instead of an app-level COALESCE.
    resetTable("graft_dflt")
    spark.sql(
      """CREATE TABLE graft_dflt (
        |  id BIGINT,
        |  status STRING DEFAULT 'new',
        |  score BIGINT DEFAULT 0
        |) USING parquet""".stripMargin)
    spark.sql("INSERT INTO graft_dflt (id) VALUES (1), (2)")
    spark.sql(
      "INSERT INTO graft_dflt (id, status, score) VALUES (3, 'done', 9)")
    spark.sql("INSERT INTO graft_dflt VALUES (4, DEFAULT, DEFAULT)")
    val rows = spark.table("graft_dflt").orderBy(col("id")).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("new", "new", "done", "new"))
    assert(rows.map(_.getLong(2)).toSeq === Seq(0L, 0L, 9L, 0L))
    resetTable("graft_dflt")
  }

  test("employee: the reference DDL type vocabulary maps cleanly") {
    resetTable("employee")
    Ddl.createEmployee(spark)
    val schema = spark.table("employee").schema
    assert(schema("id").dataType === LongType)
    assert(schema("first_name").dataType === VarcharType(40) ||
      schema("first_name").dataType === StringType) // char-type mapping
    // NOT NULL is accepted DDL but file-based tables relax nullability
    // in the catalog schema (parquet can't enforce it) — both nullable
    assert(schema("notes").nullable)
    resetTable("employee")
  }
}
