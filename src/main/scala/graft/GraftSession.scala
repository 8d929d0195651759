package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session tuning so Verify, Bench, and the
  * test suites all run the same configuration.
  *
  * Scale notes (designed for a real cluster, exercised on local[N]):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join
  *    splitting are what keep the same plans healthy at 100 TB.
  *  - shuffle.partitions is sized to the local core count here; on a
  *    cluster it should be ~2-3x total cores (AQE coalesces down).
  *  - session TZ pinned to UTC: the reference has a latent local-vs-UTC
  *    day-boundary bug (/root/reference/api/mongo/main.py:68 vs
  *    dags/get_prices_load_mongodb.py:41); we fix it by pinning.
  *  - nanosAsLong: corpus generations that store events.ts as
  *    TIMESTAMP(NANOS) (which Spark's parquet reader rejects) arrive
  *    as raw int64 nanos and are converted explicitly; generations
  *    that store TIMESTAMP(MICROS) are unaffected by this flag and
  *    pass through natively (see Tables.tsToNtz — schema-adaptive).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // scan-split size matched to local executor threads: the default
      // 128 MiB hands a whole >=sf1 table to ONE task (these corpora
      // ship few, large row groups); 16 MiB keeps scans wide while AQE
      // coalesces the small-file end. On a real cluster size this to
      // executor memory / core count as usual.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  /** Session for ScalaTest suites (shared across suites via getOrCreate). */
  def test(): SparkSession = {
    val s = builder("local[8]", "8").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Drop every persisted RDD still registered with the block manager.
    * The iterative operators (connected components, streaming twins)
    * localCheckpoint per round and those blocks live until the context
    * dies; a long query SUITE accumulates passes of stale blocks that
    * squeeze the storage pool and tax late queries with eviction + GC
    * (observed: q74 16.8s in a full Bench run vs 4.9s isolated). Safe
    * whenever no live plan depends on a truncated lineage — i.e.
    * BETWEEN fully-materialized queries, which is where Verify and
    * Bench call it. */
  def dropStaleBlocks(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    // same safe point, same contract: scratch dirs written by the
    // previous query (per-call index builds, frame-hash snapshots)
    // are fully consumed once its result materialized — purge them so
    // a long run's tmp usage stays bounded at one query's worth
    graft.util.Scratch.purge()
  }
}
