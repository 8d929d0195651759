package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's named queries;
  * `oracleSql` carries the DuckDB-equivalent SQL for each (queries
  * without an oracle get the driver's weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query (SURVEY §3.2): per-day argmax — the reference's
    * "today's highest price" (/root/reference/api/mongo/main.py:72)
    * generalized to every day, as a partially-aggregable max(struct). */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.argmaxPerDay(spark, "/root/testdata/sf0.001")

  private[graft] val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])] = Seq(
    (ops.Relational.queries, ops.Relational.oracles),
    (ops.Windows.queries, ops.Windows.oracles),
    (ops.Scalars.queries, ops.Scalars.oracles),
    (text.TextAnalysis.queries, text.TextAnalysis.oracles),
    (dedup.Dedup.queries, dedup.Dedup.oracles),
    (sim.Similarity.queries, sim.Similarity.oracles),
    (ops.Temporal.queries, ops.Temporal.oracles),
    (ops.Extended.queries, ops.Extended.oracles),
    (ops.Incremental.queries, ops.Incremental.oracles),
    (ops.Layout.queries, ops.Layout.oracles),
    (ops.Pipeline.queries, ops.Pipeline.oracles),
    (ops.Validate.queries, ops.Validate.oracles),
    (streaming.Streams.queries, streaming.Streams.oracles),
    (multimodal.Multimodal.queries, multimodal.Multimodal.oracles),
    (multimodal.Audio.queries, multimodal.Audio.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] = modules.flatMap(_._2).toMap
}
