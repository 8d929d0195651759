package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-layout operators: Z-order (Morton) multi-dimensional
  * clustering. Partitioning prunes on ONE dimension; at 100 TB a scan
  * filtered on a second dimension reads everything. Sorting by the
  * bit-interleaved Z-value co-locates rows that are close in BOTH
  * dimensions, so parquet row-group min/max statistics prune scans on
  * either predicate — the standard lakehouse trick (Delta/Iceberg
  * OPTIMIZE ZORDER BY), here as a pure Spark range-repartition + sort.
  *
  * The Z-value itself is plain integer Column arithmetic (20 codegen'd
  * shift/mask/add terms — no UDF), identical in the DuckDB oracle.
  */
object Layout {

  /** Bits interleaved per dimension: 10 -> a 20-bit Z-value. */
  val ZBITS = 10

  /** Morton interleave of the low [[ZBITS]] bits of x (even positions)
    * and y (odd positions). Inputs must be nonnegative. */
  def zorder(x: Column, y: Column): Column =
    (0 until ZBITS).map { b =>
      shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)

  /** The DuckDB spelling of [[zorder]] — the identical 20-term integer
    * sum, generated from the same loop so the two can never drift. */
  def zorderSql(x: String, y: String): String =
    (0 until ZBITS).map { b =>
      s"((($x >> $b) & 1) * ${1L << (2 * b)}) + ((($y >> $b) & 1) * ${1L << (2 * b + 1)})"
    }.mkString("(", " + ", ")")

  /** Re-layout a frame so Z-adjacent rows land in the same output file:
    * range-repartition on the Z-value (contiguous, balanced Z-ranges
    * per partition) + an in-partition sort (clustered row groups within
    * each file). Writing the result gives files whose (x, y) min/max
    * envelopes are small on BOTH dimensions — the property file-skipping
    * needs. The Z column is dropped on output; layout is a physical
    * concern, not a schema one. */
  def clusterByZorder(df: DataFrame, x: Column, y: Column,
      numFiles: Int): DataFrame = {
    // collision-proof scratch column: withColumn REPLACES an existing
    // column of the same name, which on a caller frame that already
    // carries "__z" would silently destroy caller data on drop
    val zc = Iterator.from(0).map(i => s"__z$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(zc, zorder(x, y))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
  }

  /** Z-order layout audit over events (x = user_id mod 1024, y =
    * event_id mod 1024): bucket by the top 8 Z bits and report each
    * bucket's (x, y) envelope. The per-bucket ranges are ~1/16 of each
    * dimension — the quantitative evidence that Z-clustering bounds
    * BOTH dimensions at once, where a 1-D sort bounds only one. (The
    * audit is what a table-maintenance job logs after an OPTIMIZE
    * ZORDER pass; the write-side counterpart is [[clusterByZorder]].) */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      // sign-of-dividend % matches the oracle's %; ids are nonnegative
      // (zorder requires nonneg inputs either way)
      .select((col("user_id") % lit(1024L)).as("x"),
        (col("event_id") % lit(1024L)).as("y"))
      .withColumn("z", zorder(col("x"), col("y")))
      .groupBy(shiftright(col("z"), 12).as("z_bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("z_bucket"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_zorder_layout" -> zorderLayout)

  val oracles: Map[String, String] = Map(
    "q83_zorder_layout" ->
      s"""WITH xy AS (SELECT user_id % 1024 AS x, event_id % 1024 AS y
        |            FROM events),
        |z AS (SELECT x, y, ${zorderSql("x", "y")} AS z FROM xy)
        |SELECT z >> 12 AS z_bucket, COUNT(*) AS n_events,
        |  MIN(x) AS min_x, MAX(x) AS max_x,
        |  MIN(y) AS min_y, MAX(y) AS max_y
        |FROM z
        |GROUP BY 1
        |ORDER BY 1""".stripMargin)
}
