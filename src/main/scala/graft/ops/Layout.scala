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

  /** Hash-ring span: [[graft.Tables.phash]] values live in [0, 2^56). */
  private val RingSpan = 1L << 56

  /** Ring node position: the SAME portable 56-bit md5 prefix as
    * [[graft.Tables.phash]]/`phashSql`, computed over the literal node
    * name — one hash definition across engine, oracle, and these
    * baked-in constants. */
  private def nodePos(name: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(7).map(b => f"$b%02x").mkString, 16)
  }

  /** Consistent-hash successor: the node whose ring position is the
    * first at or after h (wrapping) — evaluated as one codegen'd
    * `least` over #nodes constant structs, no join, no shuffle. */
  private def ringShard(h: Column, nodes: Seq[(Long, Long)]): Column =
    least(nodes.map { case (id, pos) =>
      struct(when(lit(pos) >= h, lit(pos)).otherwise(lit(pos) + RingSpan)
        .as("wp"), lit(id).as("node"))
    }: _*).getField("node")

  /** q320 — RESHARD MIGRATION PLAN: the (old shard → new shard) doc
    * matrix for growing an 8-shard store to 10, under BOTH placement
    * disciplines — `mod` (shard = h % N, the naive rehash) and `ring`
    * (consistent hashing: first node clockwise of h, Karger et al.) —
    * the capacity-planning bill a resharding migration reads before
    * touching 100 TB: mod-N re-homes the vast majority of documents
    * (every residue class re-maps), while the ring moves ONLY the
    * arcs the two new nodes claim (≈ 2/10 of the data) and every
    * moved doc lands on a NEW node — visible directly in the matrix's
    * new_shard column. Old nodes keep their ring positions, so the
    * comparison is the textbook argument made quantitative on the
    * actual corpus.
    *
    * Scale shape: both assignments are per-row codegen'd integer
    * expressions over the portable doc hash (the ring successor is a
    * `least` over 10 CONSTANT (wrapped-pos, node) structs — node
    * positions are baked-in md5 literals, no node table, no join);
    * the corpus is scanned once, shuffled once for the O(2·N·M)-row
    * matrix rollup. */
  def reshardPlan(spark: SparkSession, dir: String): DataFrame = {
    val nodes = (0L until 10L).map(i => i -> nodePos(s"node:$i"))
    val docs = spread(load(spark, dir, "documents"))
      .select(phash(col("doc_id").cast(org.apache.spark.sql.types.StringType))
        .as("h"))
    val mod = docs.select(lit("mod").as("strategy"),
      (col("h") % 8L).as("old_shard"), (col("h") % 10L).as("new_shard"))
    val ring = docs.select(lit("ring").as("strategy"),
      ringShard(col("h"), nodes.take(8)).as("old_shard"),
      ringShard(col("h"), nodes).as("new_shard"))
    mod.unionByName(ring)
      .groupBy(col("strategy"), col("old_shard"), col("new_shard"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("moved", col("old_shard") =!= col("new_shard"))
      .orderBy(col("strategy"), col("old_shard"), col("new_shard"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q320_reshard_plan" -> reshardPlan,
    "q83_zorder_layout" -> zorderLayout)

  val oracles: Map[String, String] = Map(
    // q320: the oracle RE-DERIVES node positions from the same md5
    // rule (phashSql over the literal names) rather than trusting the
    // engine's baked constants — an independent check of both hash
    // and successor logic
    "q320_reshard_plan" ->
      s"""WITH n AS (SELECT i AS node,
        |    ${phashSql("'node:' || CAST(i AS VARCHAR)")} AS pos
        |  FROM (SELECT UNNEST(GENERATE_SERIES(0, 9)) AS i)),
        |d AS (SELECT doc_id,
        |    ${phashSql("CAST(doc_id AS VARCHAR)")} AS h FROM documents),
        |m AS (SELECT 'mod' AS strategy, h % 8 AS old_shard,
        |        h % 10 AS new_shard FROM d),
        |ro AS (SELECT d.doc_id, ARG_MIN(n.node,
        |          CASE WHEN n.pos >= d.h THEN n.pos
        |               ELSE n.pos + ${RingSpan} END) AS old_shard
        |       FROM d, n WHERE n.node < 8 GROUP BY d.doc_id),
        |rn AS (SELECT d.doc_id, ARG_MIN(n.node,
        |          CASE WHEN n.pos >= d.h THEN n.pos
        |               ELSE n.pos + ${RingSpan} END) AS new_shard
        |       FROM d, n GROUP BY d.doc_id),
        |u AS (SELECT * FROM m
        |      UNION ALL
        |      SELECT 'ring', ro.old_shard, rn.new_shard
        |      FROM ro JOIN rn ON ro.doc_id = rn.doc_id)
        |SELECT strategy, old_shard, new_shard, COUNT(*) AS n_docs,
        |  old_shard <> new_shard AS moved
        |FROM u
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
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
