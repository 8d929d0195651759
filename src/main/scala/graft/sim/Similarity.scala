package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Similarity search over the embeddings table (north-star extension,
  * BASELINE.json): exact cosine near-duplicate pairs, brute-force
  * top-k nearest neighbors, and an IVF-bucketed approximate variant —
  * the three standard regimes of embedding search in training-data
  * pipelines.
  *
  * Determinism contract: cosines are doubles produced by a strict
  * left-to-right fold over the element products — Spark side via the
  * codegen'd [[graft.functions.VecDotFloat]] (`s += a[i]*b[i]` in
  * order), DuckDB side via `list_reduce` over the same product list.
  * Identical IEEE op sequence → bit-identical doubles, no decimal
  * detour needed (decimal rounding modes differ between engines:
  * Spark HALF_UP vs DuckDB, which broke an earlier draft).
  *
  * Scale design (100 TB):
  *  - the pair/candidate scoring loop is whole-stage-codegen'd native
  *    code, not an interpreted higher-order function — at billions of
  *    candidate pairs that is the difference that matters.
  *  - brute-force kNN broadcasts the tiny query side and ranks with a
  *    per-query window: one narrow scan of the corpus, no shuffle of
  *    the embedding column.
  *  - IVF: cluster-assign each vector once (narrow x #centroids), then
  *    queries probe only nprobe buckets — search cost drops by
  *    #centroids/nprobe; the bucket join is an equi-join on centroid
  *    id with the probe side broadcast. This is the ANN shape that
  *    survives 100 TB; brute force is the recall baseline.
  */
object Similarity {

  /** Codegen'd sequential-fold dot product (see GraftExtensions). */
  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** Deterministic cosine from dot + squared norms (all double). */
  private def cosine(d: Column, n2a: Column, n2b: Column): Column =
    d / sqrt(n2a * n2b)

  /** Embeddings with precomputed squared norms. */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    spread(load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("embedding"))
      .withColumn("n2", dot(col("embedding"), col("embedding")))

  /** Near-duplicate pairs: cosine >= 0.4 over all id-ordered pairs.
    * The cross join is the exactness baseline; at scale the pair
    * stream comes from LSH/IVF blocking instead (see annIvf). */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val a = v.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("n2").as("na"))
    val b = v.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("n2").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosine(dot(col("ea"), col("eb")),
        col("na"), col("nb")))
      .filter(col("cosine") >= 0.4)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Brute-force exact top-10 cosine neighbors for query vectors
    * (vec_id < 5): the correctness baseline every ANN variant is
    * measured against. */
  def knnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("n2").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).join(v, col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(dot(col("qe"), col("embedding")),
        col("qn"), col("n2")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF approximate top-10: vectors are assigned once to their
    * nearest centroid (deterministic coarse quantizer: every 100th
    * vector is a centroid); each query probes its nprobe=2 closest
    * centroids and searches only those buckets. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val v = vecs(spark, dir)
    val cent = v.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("n2").as("cn"))

    // cluster assignment: argmax cosine over centroids, ties to larger cid
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").desc)
    val assign = v.join(broadcast(cent), lit(true))
      .withColumn("csim", cosine(dot(col("embedding"), col("ce")),
        col("n2"), col("cn")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("n2"), col("cid"))

    // probe selection: top-2 centroids per query
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("n2").as("qn"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("psim").desc, col("cid").desc)
    val probes = q.join(broadcast(cent), lit(true))
      .withColumn("psim", cosine(dot(col("qe"), col("ce")),
        col("qn"), col("cn")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= 2)
      .select(col("query_id"), col("qe"), col("qn"), col("cid"))

    // bucket-restricted search
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(probes).join(assign, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(dot(col("qe"), col("embedding")),
        col("qn"), col("n2")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
      .withColumn("rank", row_number().over(wRank).cast(LongType))
      .filter(col("rank") <= 10)
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_embedding_neardup" -> embeddingNearDup,
    "q35_knn_bruteforce" -> knnBruteForce,
    "q36_ann_ivf" -> annIvf)

  /** SQL fragment: strict left-fold dot product of two vector
    * expressions — the same op order as VecDotFloat's codegen loop. */
  private def dotSql(a: String, b: String): String =
    s"""LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE),
       |   LIST_TRANSFORM(GENERATE_SERIES(1, LEN($a)), i ->
       |     CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)""".stripMargin

  private val vSql =
    s"""SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS n2
       |FROM embeddings""".stripMargin

  private def cosSql(d: String, n2a: String, n2b: String): String =
    s"$d / SQRT($n2a * $n2b)"

  val oracles: Map[String, String] = Map(
    "q34_embedding_neardup" ->
      s"""WITH v AS ($vSql),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |        ${cosSql(dotSql("a.embedding", "b.embedding"), "a.n2", "b.n2")} AS cosine
        |      FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, cosine FROM p
        |WHERE cosine >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q35_knn_bruteforce" ->
      s"""WITH v AS ($vSql),
        |q AS (SELECT vec_id AS query_id, embedding AS qe, n2 AS qn FROM v WHERE vec_id < 5),
        |c AS (SELECT query_id, v.vec_id AS neighbor_id,
        |        ${cosSql(dotSql("qe", "v.embedding"), "qn", "v.n2")} AS cosine
        |      FROM q JOIN v ON v.vec_id != query_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, neighbor_id) AS rank FROM c)
        |SELECT query_id, neighbor_id, cosine, rank FROM r
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "q36_ann_ivf" ->
      s"""WITH v AS ($vSql),
        |cent AS (SELECT vec_id AS cid, embedding AS ce, n2 AS cn FROM v WHERE vec_id % 100 = 0),
        |asg0 AS (SELECT v.vec_id, v.embedding, v.n2, cent.cid,
        |           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
        |             ${cosSql(dotSql("v.embedding", "ce"), "v.n2", "cn")} DESC, cid DESC) AS arn
        |         FROM v, cent),
        |asg AS (SELECT vec_id, embedding, n2, cid FROM asg0 WHERE arn = 1),
        |q AS (SELECT vec_id AS query_id, embedding AS qe, n2 AS qn FROM v WHERE vec_id < 5),
        |pr0 AS (SELECT query_id, qe, qn, cent.cid,
        |          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
        |            ${cosSql(dotSql("qe", "ce"), "qn", "cn")} DESC, cid DESC) AS prn
        |        FROM q, cent),
        |pr AS (SELECT query_id, qe, qn, cid FROM pr0 WHERE prn <= 2),
        |c AS (SELECT query_id, asg.vec_id AS neighbor_id,
        |        ${cosSql(dotSql("qe", "asg.embedding"), "qn", "asg.n2")} AS cosine
        |      FROM pr JOIN asg ON pr.cid = asg.cid AND asg.vec_id != pr.query_id),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, neighbor_id) AS rank FROM c)
        |SELECT query_id, neighbor_id, cosine, rank FROM r
        |WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)
}
