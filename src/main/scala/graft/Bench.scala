package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point (driver-run per round → BENCH_r{N}.json).
  *
  * Each query is fully materialized through the `noop` sink — unlike
  * `count()`, which would let Catalyst prune every projected column and
  * time only a metadata row-count. One warmup pass (JIT + codegen cache +
  * page cache) precedes the measured pass, standard JVM benchmarking
  * practice; reported numbers are the warm steady-state a long-running
  * cluster job sees.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(n => run(n, SparkEntry.queries(n))) // warmup
    val results = names.map(n => n -> run(n, SparkEntry.queries(n)))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
