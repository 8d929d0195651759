package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables._

/** Structured Streaming coverage (SURVEY.md §2.10 — the reference
  * *intends* streaming via its unused kafka-python dependency,
  * /root/reference/requirements.txt:18, but never implements it; its
  * only incremental processing is the @daily batch rerun with no
  * late-data semantics).
  *
  * The hourly aggregation here is the streaming twin of the batch
  * query q25 (graft.ops.Scalars.hourlyEvents): same watermark-eligible
  * event-time tumbling window, run with Trigger.AvailableNow so a
  * batch oracle can check it exactly. On a cluster the same plan runs
  * unbounded from a Kafka source — the point of Structured Streaming
  * is precisely that this code does not change.
  *
  * Scale notes: windowed aggregation state is partitioned by (window,
  * event_type) group keys; the 1-hour watermark bounds state size for
  * append-mode/unbounded runs. File-source micro-batches inherit the
  * parquet scan's partitioning.
  */
object Streams {

  /** Event-time tumbling 1-hour aggregation executed as a stream
    * (AvailableNow), materialized through the memory sink.
    *
    * Spark's file stream source requires a *directory* to monitor; the
    * corpus stores each table as a single parquet file, so the stream
    * reads the containing directory with a glob restricted to the
    * events file — the same shape a production job uses to tail a
    * landing directory. */
  def streamHourly(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema // int64 nanos
    // watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
    // so the wall-clock values match the NTZ batch path exactly.
    val agg = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    val name = "graft_stream_hourly"
    if (spark.catalog.tableExists(name)) spark.catalog.dropTempView(name)
    val ckpt = Files.createTempDirectory("graft-stream-ckpt")
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
    } finally {
      q.stop()
      deleteRecursively(ckpt.toFile) // Bench reruns each query; don't leak
    }
    spark.table(name)
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_stream_hourly" -> streamHourly)

  /** Identical to q25's oracle: the streaming run must agree with the
    * batch semantics bit-for-bit. */
  val oracles: Map[String, String] = Map(
    "q40_stream_hourly" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)
}
