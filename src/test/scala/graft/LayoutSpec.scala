package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

/** Z-order layout specs: the clustering property file-skipping relies
  * on (disjoint Z-ranges per output partition) and funnel/merge
  * ordering invariants for the round's other new operators. */
class LayoutSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  private val sf = "/root/testdata/sf0.001"

  test("zorder interleave is a bijection on the 20-bit domain") {
    import spark.implicits._
    val xs = (0 until 1024 by 31).flatMap(x =>
      (0 until 1024 by 37).map(y => (x.toLong, y.toLong)))
    val df = xs.toDF("x", "y")
      .withColumn("z", Layout.zorder(col("x"), col("y")))
    assert(df.select("z").distinct().count() === xs.size.toLong)
    // round trip: de-interleaving even/odd bits recovers x and y
    val bad = df.filter(
      (0 until Layout.ZBITS).map { b =>
        (shiftright(col("z"), 2 * b).bitwiseAND(lit(1L)) =!=
          shiftright(col("x"), b).bitwiseAND(lit(1L))) ||
        (shiftright(col("z"), 2 * b + 1).bitwiseAND(lit(1L)) =!=
          shiftright(col("y"), b).bitwiseAND(lit(1L)))
      }.reduce(_ || _)).count()
    assert(bad === 0L)
  }

  test("clusterByZorder yields disjoint z-ranges across partitions") {
    val ev = Tables.load(spark, sf, "events")
      .select(pmod(col("user_id"), lit(1024L)).as("x"),
        pmod(col("event_id"), lit(1024L)).as("y"))
    val laid = Layout.clusterByZorder(ev, col("x"), col("y"), 8)
      .withColumn("z", Layout.zorder(col("x"), col("y")))
      .withColumn("pid", spark_partition_id())
    val ranges = laid.groupBy(col("pid"))
      .agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .orderBy(col("lo"))
      .collect()
    assert(ranges.length > 1) // the repartition actually spread the data
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
          s"overlapping z-ranges: $a vs $b")
      case _ =>
    }
  }

  test("funnel stages are ordered and consistent") {
    val f = SparkEntry.queries("q84_funnel_stages")(spark, sf)
    // stage k implies all earlier timestamps present and increasing
    val bad = f.filter(
      (col("stage") >= 2 && (col("t_click").isNull ||
        col("t_click") <= col("t_view"))) ||
      (col("stage") === 3 && (col("t_purchase").isNull ||
        col("t_purchase") <= col("t_click"))) ||
      (col("stage") === 1 && col("t_click").isNotNull))
    assert(bad.count() === 0L)
  }

  test("merge actions partition the key space") {
    val m = SparkEntry.queries("q80_merge_upsert")(spark, sf)
    // keep-rows preserve balance; update/insert rows change it coherently
    val bad = m.filter(
      (col("action") === "keep" && col("new_bal") =!= col("old_bal")) ||
      (col("action") === "insert" && col("old_bal").isNotNull) ||
      (col("action") === "update" &&
        (col("old_bal").isNull || col("n_orders") === 0)))
    assert(bad.count() === 0L)
    assert(m.groupBy(col("key")).count().filter(col("count") > 1).count() === 0L)
  }
}
