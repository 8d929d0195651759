package graft
import org.apache.spark.sql.SparkSession

/** Dev scratch main for cross-engine probes (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(
      """SELECT s,
        |  cast(conv(substring(md5(cast(s as binary)), 1, 14), 16, 10) as bigint) AS h56,
        |  cast(conv(substring(md5(cast(s as binary)), 1, 14), 16, 10) as bigint) % 1000000007 AS hmod
        |FROM VALUES ('abc'), ('hello world'), (''), ('thé çà') AS t(s)
        |""".stripMargin).show(false)
    spark.stop()
  }
}
