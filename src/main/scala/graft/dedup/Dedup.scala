package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Deduplication operators for LLM-training-data pipelines (north-star
  * extension, BASELINE.json): exact dedup, MinHash+LSH near-dup pairs,
  * SimHash fingerprints, and exact n-gram Jaccard via an inverted-index
  * join. The reference's only dedup is the MinIO last-write-wins object
  * key (/root/reference/dags/get_prices_load_minio.py:80); these
  * generalize it to content-level duplicate detection.
  *
  * Scale design (100 TB):
  *  - exact dedup is a hash shuffle on a 128-bit content key — the only
  *    wide op; no sort.
  *  - MinHash signatures are one narrow pass; LSH banding turns the
  *    quadratic pair search into an equi-join on band keys. Band
  *    width r tunes the candidate-pair false-positive rate, so the
  *    shuffle volume is controlled regardless of corpus size.
  *  - n-gram Jaccard avoids O(n^2) via the inverted index; the join
  *    explodes only on shared shingles. For web-scale corpora add
  *    prefix filtering (PPJoin) — join only on each doc's rarest
  *    (n - ceil(tau*n) + 1) shingles — which preserves exactness.
  *  - every hash is the engine-portable [[graft.Tables.phash]] so the
  *    whole pipeline stays DuckDB-oracle-checkable.
  */
object Dedup {

  def tokens(c: Column): Column = split(trim(c), " +")

  /** Distinct word trigram shingles of a document. */
  def shingles(c: Column): Column = {
    val toks = tokens(c)
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", try_element_at(toks, i),
        try_element_at(toks, i + 1), try_element_at(toks, i + 2))))
  }

  /** Exact duplicate grouping on whitespace/case-normalized content.
    * One shuffle on the md5 key; at scale prefer groupBy+agg over the
    * window when only canonical rows are kept (smaller state). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val key = md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))).cast(BinaryType))
    val w = Window.partitionBy(col("content_key"))
    load(spark, dir, "documents")
      .select(col("doc_id"), key.as("content_key"))
      .withColumn("dup_group", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col("doc_id") === col("dup_group"))
      .select(col("doc_id"), col("dup_group"), col("group_size"),
        col("is_canonical"))
      .orderBy(col("doc_id"))
  }

  /** Fixed MinHash permutation constants (primes; deterministic and
    * mirrored literally in the DuckDB oracle). h_i(x) = (a_i*x + b_i)
    * mod P with x < 2^30 keeps every product within int64. */
  val A: Seq[Long] = Seq(472882049L, 972663749L, 203280221L, 715225739L,
    179424673L, 899809363L, 32452843L, 49979687L, 67867967L, 86028121L,
    104395301L, 122949823L, 141650939L, 160481183L, 298489861L, 350377849L)
  val B: Seq[Long] = Seq(15485863L, 86028157L, 256203161L, 533000389L,
    982451653L, 472882027L, 179424691L, 32452867L, 67867979L, 104395303L,
    122949829L, 141650963L, 160481219L, 203280251L, 715225741L, 899809343L)
  val K = 16 // signature length
  val BANDS = 4 // LSH bands of r = K/BANDS rows
  val R = K / BANDS

  /** Per-doc MinHash signature (array of K minima) over trigram
    * shingles. Narrow, shuffle-free. */
  private def withSignature(docs: DataFrame): DataFrame = {
    val hs = transform(shingles(col("text")), s => phashMod(s))
    val sig = array((0 until K).map(i =>
      array_min(transform(col("hs"),
        h => (lit(A(i)) * h + lit(B(i))) % lit(P)))): _*)
    docs.select(col("doc_id"), hs.as("hs")).withColumn("sig", sig)
  }

  /** MinHash + LSH near-duplicate pairs: band-key equi-join produces
    * candidates; the signature-estimated Jaccard >= 0.5 confirms. The
    * band join is the scale path — pair generation never touches
    * non-colliding docs. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigs = withSignature(load(spark, dir, "documents"))
    val bandStructs = array((0 until BANDS).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until R).map(r =>
          element_at(col("sig"), b * R + r + 1).cast(StringType)): _*).as("bkey"))
    }: _*)
    val bands = sigs
      .select(col("doc_id"), col("sig"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"),
        col("bk.bkey").as("bkey"))
    val x = bands.alias("x")
    val y = bands.alias("y")
    x.join(y, col("x.band") === col("y.band") &&
        col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sig").as("sa"), col("y.sig").as("sb"))
      .distinct()
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sa"), col("sb"), (a, b) => a === b),
          m => m)).cast(DoubleType) / lit(K.toDouble))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 32-bit SimHash per document over tokens (with multiplicity): bit b
    * is set when the signed sum of token-hash bit b is positive. One
    * narrow pass; near-dup lookup is then hamming distance on int keys. */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("doc_id"),
        transform(tokens(col("text")), t => phash(t)).as("hs"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 31), 0L, (acc, b) -> acc + IF(
          |  aggregate(hs, 0L, (a2, h) ->
          |    a2 + IF(((shiftright(h, b) & 1) = 1), 1L, -1L)) > 0,
          |  shiftleft(1L, b), 0L))""".stripMargin))
      .select(col("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))

  /** Exact trigram-shingle Jaccard >= 0.5 via inverted-index self-join:
    * explode distinct shingles, equi-join on shingle, count overlap,
    * |A ∪ B| = |A| + |B| - common. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val s = load(spark, dir, "documents")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    val sizes = s.select(col("doc_id"), size(col("sh")).cast(LongType).as("n"))
    val inv = s.select(col("doc_id"), explode(col("sh")).as("ng"))
    val a = inv.alias("a")
    val b = inv.alias("b")
    val common = a.join(b, col("a.ng") === col("b.ng") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        col("c").cast(DoubleType) / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_exact_dedup" -> exactDedup,
    "q31_minhash_lsh" -> minhashLsh,
    "q32_simhash" -> simhash,
    "q33_ngram_jaccard" -> ngramJaccard)

  private val shinglesSql =
    """LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(toks)-2, 1)),
      |      i -> CONCAT_WS(' ', toks[i], toks[i+1], toks[i+2])))""".stripMargin
  private val toksSql =
    "SELECT doc_id, text, STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks FROM documents"
  private val permsSql = A.zip(B)
    .map { case (a, b) => s"{'a': ${a}, 'b': ${b}}" }.mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "q30_exact_dedup" ->
      """SELECT doc_id,
        | MIN(doc_id) OVER (PARTITION BY content_key) AS dup_group,
        | COUNT(*) OVER (PARTITION BY content_key) AS group_size,
        | doc_id = MIN(doc_id) OVER (PARTITION BY content_key) AS is_canonical
        |FROM (SELECT doc_id,
        |        md5(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')))) AS content_key
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q31_minhash_lsh" ->
      s"""WITH t AS ($toksSql),
        |s AS (SELECT doc_id, $shinglesSql AS sh FROM t),
        |h AS (SELECT doc_id, LIST_TRANSFORM(sh, x -> ${phashModSql("x")}) AS hs FROM s),
        |sig AS (SELECT doc_id, LIST_TRANSFORM($permsSql,
        |          p -> LIST_MIN(LIST_TRANSFORM(hs, v -> (p.a * v + p.b) % ${P}))) AS sig
        |        FROM h),
        |bands AS (SELECT doc_id, sig, b.band,
        |            ARRAY_TO_STRING(sig[b.band*${R}+1 : b.band*${R}+${R}], ',') AS bkey
        |          FROM sig, (SELECT UNNEST([0,1,2,3]) AS band) b),
        |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |            x.sig AS sa, y.sig AS sb
        |          FROM bands x JOIN bands y
        |            ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
        |SELECT doc_a, doc_b,
        |  CAST(LEN(LIST_FILTER(GENERATE_SERIES(1, ${K}), i -> sa[i] = sb[i])) AS DOUBLE) / ${K}.0 AS est_jaccard
        |FROM pairs
        |WHERE CAST(LEN(LIST_FILTER(GENERATE_SERIES(1, ${K}), i -> sa[i] = sb[i])) AS DOUBLE) / ${K}.0 >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q32_simhash" ->
      s"""SELECT doc_id,
        | CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(0, 31), b ->
        |   CASE WHEN LIST_SUM(LIST_TRANSFORM(hs, h ->
        |          CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
        |        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
        |FROM (SELECT doc_id, LIST_TRANSFORM(toks, x -> ${phashSql("x")}) AS hs
        |      FROM ($toksSql))
        |ORDER BY doc_id""".stripMargin,
    "q33_ngram_jaccard" ->
      s"""WITH t AS ($toksSql),
        |s AS (SELECT doc_id, $shinglesSql AS sh FROM t),
        |sizes AS (SELECT doc_id, CAST(LEN(sh) AS BIGINT) AS n FROM s),
        |inv AS (SELECT doc_id, UNNEST(sh) AS ng FROM s),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        |           FROM inv a JOIN inv b ON a.ng = b.ng AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
        |FROM common
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin)
}
