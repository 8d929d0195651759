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

  /** Run `body` (a streaming-query `.start()` call) with
    * spark.sql.shuffle.partitions lowered to the STREAMING state
    * parallelism, restoring the caller's value before returning.
    *
    * Why a separate knob (optimization r16, guide §2.2/§6): a stateful
    * streaming operator materializes ONE state store instance per
    * shuffle partition, and every micro-batch commits a delta file per
    * instance (plus task setup/teardown per partition per batch) — the
    * per-batch floor scales with the partition count, not the data.
    * The bounded gate streams hold small keyed state (hours, users,
    * band keys), so batch-sized parallelism (the session's core count)
    * buys nothing downstream of the watermark while multiplying the
    * per-batch commit bill. State size, not corpus size, is what
    * should set this in production — raise it via
    * SPARK_GRAFT_STREAM_PARTITIONS for large keyed state (it must be
    * fixed for the life of a checkpoint; every gate/bench run starts
    * from a fresh checkpoint, so re-runs stay comparable).
    *
    * Restoring immediately after `.start()` is safe: StreamExecution
    * clones the session synchronously at construction, so the running
    * query keeps the lowered value for every batch while the caller's
    * session never sees it. Results are partition-count-invariant
    * (InvarianceSpec pins this; the oracle gates re-verify per run).
    */
  def withStreamParallelism[T](spark: SparkSession)(body: => T): T =
    // Serialized (ADVICE r16): the set/restore mutates the session-global
    // conf, and is only safe because StreamExecution clones the session
    // synchronously inside .start(). Without the lock, two concurrent
    // wrapped starts could capture the LOWERED value as `prev` and
    // permanently throttle later batch shuffles. Stream starts are
    // currently sequential per session; the lock makes the contract hold
    // for any future concurrent caller too.
    streamParallelismLock.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      val sessionN = scala.util.Try(prev.toInt).getOrElse(8)
      // env override validated (ADVICE r16): garbage or non-positive
      // values fall back to the default instead of failing obscurely
      // inside the stream; the value is capped at the session's own
      // parallelism so the knob only ever LOWERS (the SessionSpec
      // contract) — raising state parallelism above batch parallelism
      // is a cluster-deployment decision, not a gate-bench one.
      val n = sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS")
        .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
        .filter(_ > 0)
        .map(math.min(_, sessionN))
        .getOrElse(math.min(sessionN, 8))
      spark.conf.set(key, n.toString)
      try body finally spark.conf.set(key, prev)
    }

  private[this] val streamParallelismLock = new Object

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
