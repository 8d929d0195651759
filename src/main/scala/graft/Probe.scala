package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.printSchema()
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.selectExpr("ts", "date_trunc('hour', ts) as h", "cast(ts as date) d").show(3, false)
    li.selectExpr("l_shipdate", "year(l_shipdate) y").show(2, false)
    spark.stop()
  }
}
