package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table access + determinism helpers shared by every operator.
  *
  * Determinism contract (the driver hash-compares our parquet output
  * against DuckDB running `SparkEntry.oracleSql`): all money/measure
  * arithmetic is done in exact DECIMAL and only the final aggregate is
  * cast back to DOUBLE. Both engines then perform the identical
  * exact-decimal computation followed by one identical decimal->double
  * rounding, so results match bit-for-bit — no float-summation-order
  * nondeterminism. Mirrors the numeric-over-lexicographic decision in
  * SURVEY.md §1.2 (reference sorts price as varchar:
  * /root/reference/api/postgres/api.py:22).
  */
object Tables {

  /** All driver-generated tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Round-robin repartition to the cluster's parallelism. The corpus
    * stores each table as ONE parquet file with ONE row group, which
    * Spark cannot split — so a scan feeding compute-heavy per-row work
    * (hashing, shingling, vector math) would otherwise run on a single
    * core. One tiny shuffle buys full-width execution; on a real
    * cluster the same call is a no-op in spirit (many files → many
    * splits) but still protects against skewed file layouts. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** `events.ts` surfaced as timestamp_ntz regardless of the corpus'
    * physical parquet type. The generator has shipped BOTH encodings
    * across corpus regenerations: TIMESTAMP(NANOS) (which Spark's
    * reader only accepts as raw int64 via
    * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (which arrives as timestamp_ntz natively).
    * Branching on the *observed* schema keeps every events operator
    * running on either corpus; the ns->us truncation matches what
    * DuckDB applies on read, so oracle comparisons agree either way. */
  val tsFromNanos: String = "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"

  /** Adapter from the observed `ts` type to timestamp_ntz. */
  def tsToNtz(dt: DataType): Column = dt match {
    case LongType         => expr(tsFromNanos)          // int64 nanos
    case TimestampNTZType => col("ts")                  // micros, naive
    case _                => col("ts").cast(TimestampNTZType) // micros, UTC-adjusted
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.withColumn("ts", tsToNtz(raw.schema("ts").dataType))
  }

  /** Naive (NTZ) timestamp literal — the corpus stores naive timestamps,
    * which Spark reads as timestamp_ntz; literals must match that type. */
  def tsLit(s: String): Column = lit(s).cast("timestamp_ntz")

  /** Exact 2-dp decimal view of a money/measure double column. Input
    * doubles in the corpus carry <=2 decimals, so the cast is lossless. */
  def d2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Narrow decimal for small factors like (1 - discount), (1 + tax). */
  def d4(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact decimal sum of a 2-dp double column, surfaced as double. */
  def dsum(c: Column): Column = sum(d2(c)).cast(DoubleType)

  /** Exact decimal sum of an already-decimal expression, as double. */
  def dsumExpr(c: Column): Column = sum(c).cast(DoubleType)

  /** Deterministic average: exact decimal sum, one cast to double, then
    * double division — both engines perform the identical IEEE op. */
  def davg(c: Column): Column = sum(d2(c)).cast(DoubleType) / count(lit(1))

  /** Portable 56-bit content hash: the top 14 hex digits of MD5 over the
    * UTF-8 bytes, read as a non-negative BIGINT. Chosen because BOTH
    * engines compute it identically — Spark:
    * `conv(substring(md5(x),1,14),16,10)`; DuckDB:
    * `('0x' || substring(md5(x),1,14))::BIGINT` — so sketch operators
    * built on it (MinHash, SimHash, LSH) stay oracle-checkable.
    * 56 bits also guarantees headroom for modular re-hashing without
    * int64 overflow. */
  def phash(c: Column): Column =
    conv(substring(md5(c.cast(BinaryType)), 1, 14), 16, 10).cast(LongType)

  /** The DuckDB spelling of [[phash]], for oracle SQL interpolation. */
  def phashSql(x: String): String =
    s"(('0x' || substring(md5($x),1,14))::BIGINT)"

  /** [[phash]] folded into the prime field Z_p, p = 1e9+7: values < 2^30,
    * so a*h+b with a,b < 2^30 stays within int64 in both engines. */
  val P: Long = 1000000007L
  def phashMod(c: Column): Column = phash(c) % P
  def phashModSql(x: String): String = s"(${phashSql(x)} % ${P})"
}
