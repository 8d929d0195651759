package graft

import java.time.LocalDate

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.GasPrices

/** Golden tests for the reference-domain ingest: HTML cell extraction,
  * zip-truncation alignment, normalization, and the top-of-day answer
  * shape (/root/reference/README.md:12-23). */
class GasPricesSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  private val day = LocalDate.of(2023, 4, 1)

  private def parsed = {
    import spark.implicits._
    GasPrices.parse(
      Seq((1L, GasPrices.fixtureHtml)).toDF("page_id", "html"), day)
  }

  test("parse aligns cell families and drops the unmatched tail row") {
    val rows = parsed.orderBy(col("price")).collect()
    // 4 price cells but only 3 complete rows -> zip truncation drops one
    assert(rows.length === 3)
    assert(rows.map(_.getAs[java.math.BigDecimal]("price").toString).toSeq
      === Seq("154.4", "163.9", "166.4"))
  }

  test("normalization: tags stripped, whitespace collapsed, accents kept") {
    val esso = parsed.filter(col("price") === "163.9").head
    assert(esso.getAs[String]("station") === "Esso Du Commerce / René Lévesque")
    assert(esso.getAs[String]("city") === "Verdun ( Île des Soeurs )")
    assert(esso.getAs[String]("time") === "10:42AM")
    assert(esso.getAs[String]("user") === "driverMTL")
  }

  test("time/user split: missing user becomes empty string") {
    val shell = parsed.filter(col("price") === "154.4").head
    assert(shell.getAs[String]("time") === "9:05AM")
    assert(shell.getAs[String]("user") === "")
  }

  test("topOfDay answers the README shape with numeric (not lexicographic) order") {
    val r = GasPrices.topOfDay(parsed, day).head
    val hi = r.getAs[Row]("highest_price")
    val lo = r.getAs[Row]("lowest_price")
    assert(hi.getAs[java.math.BigDecimal]("price").toString === "166.4")
    assert(hi.getAs[String]("station") === "Petro-Canada 7950 Boul Newman")
    assert(lo.getAs[java.math.BigDecimal]("price").toString === "154.4")
    assert(lo.getAs[String]("city") === "Montréal")
  }

  test("numeric sort diverges from the reference's lexicographic sort by design") {
    // "99.9" > "163.9" as varchar (the reference's latent bug,
    // /root/reference/api/postgres/api.py:22); numerically it is lower.
    import spark.implicits._
    val withCheap = parsed.select(col("price").cast("string"))
      .union(Seq("99.9").toDF)
    val lexMax = withCheap.agg(max(col("price"))).as[String].head
    assert(lexMax === "99.9") // what the reference would serve as "highest"
    val numMax = withCheap.agg(max(col("price").cast("decimal(6,1)"))).head
      .getDecimal(0).toString
    assert(numMax === "166.4") // what graft serves
  }

  test("droppedRowCount reports the zip-truncated rows the reference hides") {
    import spark.implicits._
    val pages = Seq((1L, GasPrices.fixtureHtml)).toDF("page_id", "html")
    // fixture: 4 price cells, 3 complete rows -> exactly 1 dropped
    assert(GasPrices.droppedRowCount(pages) === 1L)
    // the metric agrees with what parse actually drops
    assert(GasPrices.droppedRowCount(pages) ===
      4L - GasPrices.parse(pages, day).count())
    // a complete page drops nothing
    val complete = Seq((1L, GasPrices.fixtureHtml.linesIterator
      .filterNot(_.contains("""pricecell">159.9""")).mkString("\n")))
      .toDF("page_id", "html")
    assert(GasPrices.droppedRowCount(complete) === 0L)
  }

  test("fanOut writes one cached batch to every sink (no re-extract)") {
    val base = java.nio.file.Files.createTempDirectory("graft-fanout").toString
    GasPrices.fanOut(parsed, s"$base/parquet", s"$base/json")
    GasPrices.fanOut(parsed, s"$base/parquet", s"$base/json") // rerun
    assert(spark.read.parquet(s"$base/parquet").count() === 3) // not 6
    assert(spark.read.json(s"$base/json").count() === 3)
    // serving records carry the date INLINE in the body (reference
    // serving-object shape) — not only in the dt=... directory name
    val raw = spark.read.textFile(s"$base/json/dt=*/*.json")
    assert(raw.count() === 3)
    assert(raw.filter(_.contains("\"date\":")).count() === 3)
  }

  test("writeServingJdbc round-trips the gas_prices table through a real JDBC sink") {
    System.setProperty("derby.system.home", sys.props("java.io.tmpdir"))
    val url =
      s"jdbc:derby:${sys.props("java.io.tmpdir")}/graft_gp_derby_${ProcessHandle.current().pid()};create=true"
    // twice: overwrite mode is the reference's daily-replace idempotence
    GasPrices.writeServingJdbc(parsed, url)
    val back = GasPrices.writeServingJdbc(parsed, url)
    assert(back.count() === parsed.count())
    val direct = parsed.orderBy(col("price")).collect()
      .map(r => (r.getAs[java.math.BigDecimal]("price").toString,
        r.getString(r.fieldIndex("station"))))
    val rt = back.orderBy(col("price")).collect()
      .map(r => (r.getAs[java.math.BigDecimal]("price").toString,
        r.getString(r.fieldIndex("station"))))
    assert(rt.toSeq === direct.toSeq)
    // the flagship query answers identically off the JDBC store
    assert(GasPrices.topOfDay(back, day).collect().toSeq ===
      GasPrices.topOfDay(parsed, day).collect().toSeq)
  }

  test("compactStore shrinks a fragmented store and preserves every row") {
    def partFiles(dir: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.startsWith("part-")) Seq(f) else Nil
      walk(new java.io.File(dir))
    }
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // fragment: two ingest days, each scattered across 6 shuffled files
    val twoDays = parsed.union(GasPrices.parse(
      { import spark.implicits._
        Seq((1L, GasPrices.fixtureHtml)).toDF("page_id", "html") },
      day.plusDays(1)))
    twoDays.repartition(6)
      .write.partitionBy("date").parquet(s"$base/frag")
    val before = partFiles(s"$base/frag").size
    assert(before >= 6, s"fixture store not fragmented enough: $before files")
    GasPrices.compactStore(spark, s"$base/frag", s"$base/tidy", 2)
    val after = partFiles(s"$base/tidy").size
    assert(after <= 3, s"compaction left $after files (was $before)")
    // content identical (multiset)
    val a = spark.read.parquet(s"$base/frag")
    val b = spark.read.parquet(s"$base/tidy").select(a.columns.map(col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("expirePartitions drops only stale date partitions, without a rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-expire").toString + "/store"
    val threeDays = (0 to 2).map(i => GasPrices.parse(
      { import spark.implicits._
        Seq((1L, GasPrices.fixtureHtml)).toDF("page_id", "html") },
      day.plusDays(i))).reduce(_ union _)
    threeDays.write.partitionBy("date").parquet(dir)
    assert(spark.read.parquet(dir).select("date").distinct().count() === 3)
    val dropped = GasPrices.expirePartitions(spark, dir, day.plusDays(1))
    assert(dropped === 1L)
    val kept = spark.read.parquet(dir)
    assert(kept.select("date").distinct().count() === 2)
    assert(kept.filter(col("date") < java.sql.Date.valueOf(day.plusDays(1)))
      .count() === 0)
    // idempotent: nothing further to expire
    assert(GasPrices.expirePartitions(spark, dir, day.plusDays(1)) === 0L)
  }

  test("writeCanonical keeps last per (date, station) and reruns idempotently") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gas").toString
    val dup = parsed.union(parsed) // simulate a rerun double-load
    GasPrices.writeCanonical(dup, dir)
    GasPrices.writeCanonical(dup, dir) // second run must not double
    val back = spark.read.parquet(dir)
    assert(back.count() === 3)
    assert(back.groupBy("date", "station").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("keep-last is chronological, not lexicographic on the time token") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gas-t").toString
    // same station reported at 9:05AM then 1:15PM: "9:05AM" wins a
    // string sort, but 1:15PM is the actual last write
    val rows = Seq(("150.0", "9:05AM"), ("160.0", "1:15PM"))
      .toDF("p", "time")
      .select(col("p").cast("decimal(6,1)").as("price"), lit("S").as("station"),
        lit("C").as("city"), col("time"), lit("u").as("user"),
        lit(java.sql.Date.valueOf(day)).as("date"))
    GasPrices.writeCanonical(rows, dir)
    val kept = spark.read.parquet(dir)
    assert(kept.count() === 1)
    assert(kept.head.getAs[java.math.BigDecimal]("price").toString === "160.0")
  }

  test("writeCanonical overwrites only the partitions present in the batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gas-d").toString
    GasPrices.writeCanonical(parsed, dir) // day 1
    val day2 = parsed.withColumn("date",
      lit(java.sql.Date.valueOf(day.plusDays(1))))
    GasPrices.writeCanonical(day2, dir) // day 2 must not wipe day 1
    val back = spark.read.parquet(dir)
    assert(back.select("date").distinct().count() === 2)
    assert(back.count() === 6)
  }
}
