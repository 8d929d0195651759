package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Data-validation operators — the checks a 100 TB pipeline runs
  * around every load, migration, and replication step (the reference's
  * only validation is row-count prints in its DAG logs; these are the
  * set-based forms that scale).
  *
  * Scale design: every check is a single aggregation pass over the
  * table — order-INDEPENDENT by construction (XOR and modular sums of
  * per-row hashes, never float accumulation), so two clusters can
  * checksum the same logical table under different partitionings /
  * row orders and compare one tiny result row per table.
  */
object Validate {

  /** The per-table canonical row serialization + its stable column
    * subset: integer and string columns only (float/timestamp
    * RENDERING differs across engines; a production deployment pins a
    * byte-level codec instead). NULL gets an explicit sentinel
    * (CONCAT_WS silently SKIPS nulls in both engines, which would make
    * (NULL,'x') collide with ('x',NULL) — exactly the shifted-field
    * corruption a migration check exists to catch), and the separator
    * is the ASCII unit separator, not a printable character free text
    * could contain. */
  private val checksumCols: Seq[(String, Seq[String])] = Seq(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_returnflag", "l_linestatus"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
    "documents" -> Seq("doc_id", "text", "source"),
    "events" -> Seq("event_id", "user_id", "event_type"))

  private val Sep = "\u001f" // ASCII unit separator
  private val NullMark = "\u0002"

  // private[graft]: specs must reuse THE serialization rule, not copy it
  private[graft] def rowKey(cols: Seq[String]): Column =
    phash(concat_ws(Sep,
      cols.map(c => coalesce(col(c).cast(StringType), lit(NullMark))): _*))

  /** Order-independent table fingerprints: one row per table with
    * (n_rows, xor of row hashes, modular sum of row hashes). XOR
    * catches any single-row difference; the Z_p sum catches the
    * classes XOR misses (a row duplicated an even number of times);
    * the count catches cardinality drift. All three are commutative
    * monoids → partial-aggregable, shuffle of ONE row per table, and
    * two sides of a migration compare equal iff they (almost surely)
    * hold the same row multiset. */
  def tableChecksums(spark: SparkSession, dir: String): DataFrame =
    checksumCols.map { case (t, cols) =>
      // spread(): the corpus tables are single-file parquet, and per-row
      // md5 is exactly the compute-heavy scan that must not run one-core
      spread(load(spark, dir, t))
        .select(rowKey(cols).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          // phash is 56-bit so XOR stays nonnegative in both engines
          expr("bit_xor(h)").as("xor_hash"),
          sum(col("h") % P).as("sum_hash"))
        .select(lit(t).as("table_name"), col("n_rows"), col("xor_hash"),
          col("sum_hash"))
    }.reduce(_ unionByName _).orderBy(col("table_name"))

  /** Profiled columns of the documents table (the corpus-facing
    * table): null count, distinct count, and the min/max rendered
    * length per column — the completeness/cardinality profile that
    * gates a corpus refresh before anything downstream runs. One
    * aggregation pass computes every metric; `stack` unpivots to one
    * row per column. */
  private val profiled = Seq("doc_id", "text", "source")

  def profileDocuments(spark: SparkSession, dir: String): DataFrame = {
    val d = spread(load(spark, dir, "documents"))
    val aggs = profiled.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(length(col(c).cast(StringType))).as(s"${c}__minlen"),
        max(length(col(c).cast(StringType))).as(s"${c}__maxlen"))
    }
    d.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${profiled.length}, " +
        profiled.map(c =>
          s"'$c', ${c}__nulls, ${c}__distinct, ${c}__minlen, ${c}__maxlen")
          .mkString(", ") +
        ") AS (column_name, n_nulls, n_distinct, min_len, max_len)"))
      .orderBy(col("column_name"))
  }

  /** EXPECTATION suite over lineitem (the Deequ/Great-Expectations
    * shape): declarative value-domain rules evaluated in ONE
    * conditional-aggregation pass — no per-rule scans, no collect; at
    * 100 TB adding a rule costs one more partial-agg column, not a
    * pass. Emits per rule the checked count, violation count, and the
    * pass verdict (violations = 0), unpivoted to one row per rule. */
  private val expectations: Seq[(String, Column)] = Seq(
    "quantity_in_range" -> (col("l_quantity") >= 0 && col("l_quantity") <= 100),
    "price_positive" -> (col("l_extendedprice") > 0),
    "discount_in_range" -> (col("l_discount") >= 0 && col("l_discount") <= 0.5),
    "shipdate_present" -> col("l_shipdate").isNotNull,
    "flag_in_domain" -> col("l_returnflag").isin("A", "N", "R"))

  def expectationSuite(spark: SparkSession, dir: String): DataFrame = {
    val li = spread(load(spark, dir, "lineitem"))
    val aggs = expectations.flatMap { case (name, pred) =>
      Seq(count(lit(1)).as(s"${name}__n"),
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L))
          .as(s"${name}__bad"))
    }
    li.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${expectations.length}, " +
        expectations.map { case (name, _) =>
          s"'$name', ${name}__n, ${name}__bad" }.mkString(", ") +
        ") AS (rule, n_checked, n_violations)"))
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("rule"))
  }

  /** REFERENTIAL-INTEGRITY audit: orphaned foreign keys across the
    * star schema, each as a LEFT ANTI join count — the set-based form
    * of "every fact row has its dimensions" that replaces per-row
    * lookup validation. Anti joins broadcast (dim side) or shuffle on
    * the key; either way one pass per edge, zero when healthy. */
  def referentialIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String,
        edge: String): DataFrame =
      fact.select(col(fk)).join(dim.select(col(pk)),
          col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(edge).as("fk_edge"), col("n_orphans"))
    val li = load(spark, dir, "lineitem")
    Seq(
      orphans(li, "l_orderkey", load(spark, dir, "orders"), "o_orderkey",
        "lineitem.orderkey->orders"),
      orphans(li, "l_partkey", load(spark, dir, "part"), "p_partkey",
        "lineitem.partkey->part"),
      orphans(li, "l_suppkey", load(spark, dir, "supplier"), "s_suppkey",
        "lineitem.suppkey->supplier"),
      orphans(load(spark, dir, "orders"), "o_custkey",
        load(spark, dir, "customer"), "c_custkey",
        "orders.custkey->customer"))
      .reduce(_ unionByName _)
      .orderBy(col("fk_edge"))
  }

  /** Primary keys audited by [[duplicateKeys]] — lineitem's composite
    * key shows the general (multi-column) form. */
  private val primaryKeys: Seq[(String, Seq[String])] = Seq(
    "orders" -> Seq("o_orderkey"),
    "customer" -> Seq("c_custkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "documents" -> Seq("doc_id"),
    "events" -> Seq("event_id"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"))

  /** UNIQUE-key violation detector: per declared primary key, how many
    * key values occur more than once and how many rows they cover —
    * the dedup-health audit every load gate runs (a healthy corpus
    * reports zeros; the zeros ARE the assertion). One partial-
    * aggregable key rollup per table, then a one-row conditional
    * aggregate — key histograms never leave their task unaggregated. */
  def duplicateKeys(spark: SparkSession, dir: String): DataFrame =
    primaryKeys.map { case (t, keyCols) =>
      load(spark, dir, t)
        .groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_rows"))
        .select(lit(t).as("table_name"), col("n_keys"),
          col("n_dup_keys"), col("n_dup_rows"))
    }.reduce(_ unionByName _).orderBy(col("table_name"))

  /** CHI-SQUARE independence audit: the event_type × ISO-weekday
    * contingency table with expected counts and per-cell χ²
    * contributions — the drift detector for "did the traffic mix
    * change by day of week?". All counts are exact int64; expected and
    * χ² are computed by ONE fixed IEEE op sequence per cell
    * (rt·ct exact in int64 → one divide, one subtract, one multiply,
    * one divide) so both engines render identical doubles — there is
    * deliberately no χ² *sum* (a float total would be fold-order-
    * dependent; a consumer sums the 35 cells driver-side). Scale
    * shape: one groupBy over the stream, then everything runs on
    * O(types × 7) rows with broadcast margins. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    val cells = events(spark, dir)
      .groupBy(col("event_type"), (weekday(col("ts")) + 1).as("isodow"))
      .agg(count(lit(1)).as("observed"))
    val rowTot = cells.groupBy(col("event_type")).agg(sum(col("observed")).as("rt"))
    val colTot = cells.groupBy(col("isodow")).agg(sum(col("observed")).as("ct"))
    val tot = cells.agg(sum(col("observed")).as("n"))
    val e = (col("rt") * col("ct")).cast(DoubleType) / col("n").cast(DoubleType)
    val d = col("observed").cast(DoubleType) - col("expected")
    cells.join(broadcast(rowTot), "event_type")
      .join(broadcast(colTot), "isodow")
      .crossJoin(broadcast(tot))
      .withColumn("expected", e)
      .withColumn("chi2_cell", d * d / col("expected"))
      .select(col("event_type"), col("isodow"), col("observed"),
        col("expected"), col("chi2_cell"))
      .orderBy(col("event_type"), col("isodow"))
  }

  /** BITMAP-rollup exact distinct: daily active users counted from
    * 64-bit word bitmaps instead of shuffling raw (day, user) rows —
    * each partition ORs its users into (day, word-index) bitmap words
    * (bit_or is a commutative monoid, so the aggregate partial-merges
    * map-side), and popcounts sum per day. The shuffle carries one row
    * per (day, occupied word) ≈ active-range/64 — the roaring-bitmap
    * idea in columnar form, and the backbone of COUNT(DISTINCT)
    * rollups over dense integer keys at 100 TB. Exact, not a sketch:
    * == COUNT(DISTINCT) oracle. */
  /** The ONE bitmap-word derivation (day, user_id DIV 64 → bit_or
    * word), shared by batch q153 and streaming q164 so the two Spark
    * sides can never fork (the q140/q135 latestBy convention). Works
    * on a streaming df too — it is a single aggregation. Assumes
    * nonnegative user ids (DIV truncation == floor only for ≥ 0). */
  private[graft] def dayUserBitmap(ev: DataFrame): DataFrame =
    ev.groupBy(to_date(col("ts")).as("day"),
        expr("user_id DIV 64").as("word_idx"))
      .agg(bit_or(expr("shiftleft(1L, CAST(user_id % 64 AS INT))"))
        .as("word"))

  /** The matching popcount rollup: (day, word) rows → per-day exact
    * distinct counts. Shared by q153/q164. */
  private[graft] def bitmapRollup(words: DataFrame): DataFrame =
    words.groupBy(col("day"))
      .agg(sum(bit_count(col("word")).cast(LongType)).as("n_users"),
        count(lit(1)).as("n_words"))
      .orderBy(col("day"))

  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    bitmapRollup(dayUserBitmap(events(spark, dir)))

  /** Benford first-digit audit of order totals — the fraud/synthetic-
    * data screen: observed share of each leading digit vs Benford's
    * log10(1+1/d). The expected probabilities are Scala-computed
    * doubles interpolated as LITERALS into both the plan and the
    * oracle SQL (shortest-repr round-trip), so no engine evaluates a
    * transcendental at query time — counts are exact, share and delta
    * are one division and one subtraction each. One partial-aggregable
    * digit rollup; everything after runs on 9 rows. */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val expected = benfordP.toDF("digit", "benford_p")
    val digits = load(spark, dir, "orders")
      .select(substring(d2(col("o_totalprice")).cast(StringType), 1, 1)
        .cast(LongType).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("total"))
    digits.join(broadcast(expected), "digit")
      .crossJoin(broadcast(tot))
      .withColumn("share",
        col("n").cast(DoubleType) / col("total").cast(DoubleType))
      .select(col("digit"), col("n"), col("share"), col("benford_p"),
        (col("share") - col("benford_p")).as("delta"))
      .orderBy(col("digit"))
  }

  private[graft] val benfordP: Seq[(Long, Double)] =
    (1L to 9L).map(d => (d, math.log10(1 + 1.0 / d)))

  /** GINI concentration of customer lifetime revenue — the inequality
    * metric that tells you whether 1% of keys carry 50% of the table
    * (the q131 skew profile condensed to one number). Needs every
    * customer's global revenue rank; [[Windows.globalRankNoSort]]
    * supplies it via two-level bucket ranking — no single-partition
    * window over the customer set. The rank-weighted sum Σ rk·xᵢ stays
    * exact DECIMAL(38) (int64 would overflow at ~10²⁰), and Gini =
    * 2·S1/(n·S0) − (n+1)/n is evaluated in the same IEEE op order in
    * both engines (the oracle routes its int128 sums through VARCHAR
    * so DuckDB's cast is correctly rounded too). */
  def giniConcentration(spark: SparkSession, dir: String): DataFrame = {
    val rev = load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"))
      .agg(sum(d2(col("o_totalprice"))).as("money"))
      .select(col("key"), (col("money") * 100).cast(LongType).as("cents"))
    val ranked = Windows.globalRankNoSort(rev, col("cents"), col("key"),
      1L << 20, "rk", "n")
    val d38 = DecimalType(38, 0)
    ranked
      .agg(max(col("n")).as("n"),
        sum(col("cents").cast(d38)).as("s0"),
        sum(col("rk").cast(d38) * col("cents").cast(d38)).as("s1"))
      .select(col("n"),
        ((col("s1") * 2).cast(DoubleType) /
          (col("n").cast(d38) * col("s0")).cast(DoubleType) -
          (col("n") + 1).cast(DoubleType) / col("n").cast(DoubleType))
          .as("gini"))
  }

  /** JOIN FAN-OUT profiler: before running an n:m join, estimate its
    * per-key output EXACTLY as n_left(k) × n_right(k) and surface the
    * heaviest keys — the q131 skew profile specialized to the join
    * about to run (here q73's clicks ⋈ purchases per user). Two
    * partial-aggregated key counts, one keyed join of the COUNT tables
    * (never the fact tables), a heap top-k — the diagnostic costs two
    * scans, the blind join it guards against can cost the cluster. */
  def joinFanoutProfile(spark: SparkSession, dir: String): DataFrame = {
    def sideCount(t: String, out: String) = events(spark, dir)
      .filter(col("event_type") === t)
      .groupBy(col("user_id")).agg(count(lit(1)).as(out))
    sideCount("click", "n_left").join(sideCount("purchase", "n_right"),
        "user_id")
      .select(col("user_id"), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("fanout"))
      .orderBy(col("fanout").desc, col("user_id"))
      .limit(20)
  }

  /** GINI-SIMPSON diversity of each source's language mix — the
    * corpus-composition balance audit (is a source monolingual?).
    * 1 − Σpᵢ² computed as (N² − Σnᵢ²)/N²: numerator and denominator
    * are exact int64 (NO float sum across language rows — that fold
    * order would be engine-dependent), then ONE division. */
  def diversityIndex(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n_i"))
      .groupBy(col("source"))
      .agg(sum(col("n_i")).as("n_docs"), count(lit(1)).as("n_langs"),
        sum(col("n_i") * col("n_i")).as("sum_sq"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        ((col("n_docs") * col("n_docs") - col("sum_sq")).cast(DoubleType) /
          (col("n_docs") * col("n_docs")).cast(DoubleType))
          .as("simpson_diversity"))
      .orderBy(col("source"))
  }

  /** A/B-TEST readout: users hash-split 50/50 (the q69 assignment
    * rule — deterministic, layout-independent), per-variant conversion
    * (purchase-heavy user: purchases exceed 20% of the user's events,
    * an integer-exact 5·n_purch > n_events test — absolute thresholds
    * like "ever purchased" saturate at 100% on a dense fixture, and a
    * rate of exactly 0 or 1 makes z undefined), and the
    * two-proportion z-score, NULL-guarded for degenerate pooled rates. Counts are exact int64; the rates and z
    * ride one fixed scalar IEEE sequence (sqrt is correctly rounded),
    * so the doubles are bit-portable. Scale shape: two
    * partial-aggregated passes over events (user rollup, then variant
    * rollup) and a 2-row broadcast join — raw events shuffle once. */
  def abTestReadout(spark: SparkSession, dir: String): DataFrame = {
    val users = events(spark, dir)
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        * 5 > count(lit(1))).cast(LongType).as("converted"))
      .withColumn("variant", (phash(col("user_id").cast(StringType)) % 2)
        .cast(IntegerType))
    val arms = users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
    val d = (c: Column) => c.cast(DoubleType)
    val wide = arms.filter(col("variant") === 0)
      .select(col("n_users").as("n0"), col("n_conv").as("c0"))
      .crossJoin(broadcast(arms.filter(col("variant") === 1)
        .select(col("n_users").as("n1"), col("n_conv").as("c1"))))
    val p0 = d(col("c0")) / d(col("n0"))
    val p1 = d(col("c1")) / d(col("n1"))
    val pp = d(col("c0") + col("c1")) / d(col("n0") + col("n1"))
    wide.select(col("n0"), col("c0"), col("n1"), col("c1"),
      p0.as("rate_control"), p1.as("rate_treatment"),
      when(pp > 0 && pp < 1,
        (p1 - p0) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / d(col("n0")) + lit(1.0) / d(col("n1")))))
        .as("z_score"))
  }

  /** SPEARMAN rank correlation between order frequency and lifetime
    * spend per customer — the monotone-association check that Pearson
    * (q114) can't give, and float-free: both rankings come from the
    * shared two-level [[Windows.globalRankNoSort]] (no single-partition
    * window), Σd² is exact DECIMAL(38), and ρ = 1 − 6Σd²/(n(n²−1)) is
    * one division. Ties broken by custkey in BOTH rankings, the
    * documented total-order convention (identical in the oracle), so ρ
    * is a deterministic statistic of the dataset. */
  def spearmanCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val m = load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("freq"),
        sum(d2(col("o_totalprice"))).as("money"))
      .select(col("key"), col("freq"),
        (col("money") * 100).cast(LongType).as("cents"))
    val r1 = Windows.globalRankNoSort(m, col("freq"), col("key"), 4L,
      "rk_freq", "n")
    val r2 = Windows.globalRankNoSort(r1, col("cents"), col("key"), 1L << 20,
      "rk_spend", "n2")
    val d38 = DecimalType(38, 0)
    val diff = (col("rk_freq") - col("rk_spend")).cast(d38)
    r2.agg(max(col("n")).as("n"), sum(diff * diff).as("sum_d2"))
      .select(col("n"),
        (lit(1.0) - (col("sum_d2") * 6).cast(DoubleType) /
          (col("n").cast(d38) *
            (col("n").cast(d38) * col("n").cast(d38) - 1)).cast(DoubleType))
          .as("spearman_rho"))
  }

  /** AUDIENCE VENN: the 7 inclusion–exclusion regions of the click /
    * view / purchase user sets in ONE pass — per-user presence bits
    * rolled to a 3-bit mask histogram (no pairwise set intersections,
    * no self-joins; the n-way generalization is the same mask trick).
    * The audience-overlap report behind "how many purchasers never
    * clicked?". Scoped to the corpus's trailing 7 days (broadcast
    * scalar max-ts) — over all time every user hits every type and
    * all regions but one are empty. All integers. */
  def vennOverlap(spark: SparkSession, dir: String): DataFrame = {
    def bit(t: String, w: Int) =
      max(when(col("event_type") === t, w).otherwise(0))
    val ev = events(spark, dir)
    val mx = ev.agg(max(col("ts")).as("mx"))
    ev.crossJoin(broadcast(mx))
      .filter(col("ts") >= col("mx") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("user_id"))
      .agg((bit("click", 1) + bit("view", 2) + bit("purchase", 4))
        .as("mask"))
      .filter(col("mask") > 0)
      .groupBy(col("mask")).agg(count(lit(1)).as("n_users"))
      .select(col("mask"),
        (col("mask").bitwiseAND(1) > 0).as("clicked"),
        (col("mask").bitwiseAND(2) > 0).as("viewed"),
        (col("mask").bitwiseAND(4) > 0).as("purchased"),
        col("n_users"))
      .orderBy(col("mask"))
  }

  /** ZONE-MAP (data-skipping) effectiveness audit: per storage chunk
    * (simulated as 4096-key orderkey ranges — the row-group granularity
    * a writer actually produces), the min/max envelope of `l_shipdate`
    * plus whether a year-1995 ship-date predicate could SKIP the chunk
    * entirely (envelope disjoint from the predicate range). This is the
    * min/max-statistics pruning decision parquet readers make from
    * footer metadata; on a key-clustered layout the audit honestly
    * shows near-zero skipping (dates are uncorrelated with keys) — the
    * quantified motivation for q83's Z-order re-clustering, which makes
    * the same envelopes tight. One partial-aggregable pass. */
  def zoneMapSkipAudit(spark: SparkSession, dir: String): DataFrame = {
    val lo = to_date(lit("1995-01-01"))
    val hi = to_date(lit("1995-12-31"))
    load(spark, dir, "lineitem")
      .groupBy(expr("l_orderkey div 4096").as("chunk_id"))
      .agg(min(col("l_shipdate")).as("min_sd"),
        max(col("l_shipdate")).as("max_sd"),
        count(lit(1)).as("n_rows"))
      .withColumn("skipped", col("max_sd") < lo || col("min_sd") > hi)
      .orderBy(col("chunk_id"))
  }

  /** K-ANONYMITY audit: quasi-identifier combinations — (nation,
    * market segment, 1000-wide balance band) — whose group size falls
    * below k = 5, i.e. customers re-identifiable by joining public
    * attributes. The privacy gate a training corpus runs AFTER q66's
    * direct-PII scrub: scrubbing names doesn't help if the remaining
    * attribute combination is unique. One partial-aggregable rollup +
    * a size filter; the band edges use one identical IEEE double
    * division + floor in both engines. */
  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast(LongType).as("bal_band"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < 5)
      .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))

  /** q330 — T-CLOSENESS audit (completing the privacy trio: q182
    * k-anonymity counts group sizes, q209 l-diversity counts distinct
    * sensitive values, this measures DISTRIBUTION distance): per
    * quasi-identifier group (nation, balance band — q209's grouping),
    * the total-variation distance between the group's market-segment
    * distribution and the global one. l-diversity is fooled by a
    * group with 3 segments at 98%/1%/1% — an attacker still learns
    * the segment with near certainty; t-closeness catches exactly
    * that skew. Groups with TVD > t = 0.25 are flagged for
    * generalization/suppression.
    *
    * Scale shape: one rollup to O(groups × segments) cells, the
    * grid completed by a broadcast cross of the tiny segment
    * marginal (absent cells matter: a MISSING segment is maximal
    * information). TVD is computed in exact integer cross-products
    * — |n_gs·N − n_s·n_g| summed in DECIMAL(38) — with ONE
    * correctly-rounded division at the end, mirrored by the oracle's
    * HUGEINT-via-VARCHAR casts (the q236/q315 pattern). */
  def tClosenessAudit(spark: SparkSession, dir: String): DataFrame = {
    val c = load(spark, dir, "customer").select(col("c_nationkey"),
      floor(col("c_acctbal") / 1000).cast(LongType).as("bal_band"),
      col("c_mktsegment").as("seg"))
    val gs = c.groupBy(col("c_nationkey"), col("bal_band"), col("seg"))
      .agg(count(lit(1)).as("n_gs"))
    val g = gs.groupBy(col("c_nationkey"), col("bal_band"))
      .agg(sum(col("n_gs")).as("n_g"))
    val s = gs.groupBy(col("seg")).agg(sum(col("n_gs")).as("n_s"))
    val tot = s.agg(sum(col("n_s")).as("nn"))
    val dec = (x: Column) => x.cast(DecimalType(38, 0))
    g.crossJoin(broadcast(s))
      .join(gs, Seq("c_nationkey", "bal_band", "seg"), "left")
      .withColumn("n_gs", coalesce(col("n_gs"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("num", abs(dec(col("n_gs")) * dec(col("nn")) -
        dec(col("n_s")) * dec(col("n_g"))))
      .groupBy(col("c_nationkey"), col("bal_band"))
      .agg(max(col("n_g")).as("n"), sum(col("num")).as("tvd_num"),
        max(col("nn")).as("nn2"))
      .select(col("c_nationkey"), col("bal_band"), col("n"),
        (col("tvd_num").cast(DoubleType) /
          (dec(col("n")) * dec(col("nn2")) * 2).cast(DoubleType)).as("tvd"))
      .withColumn("violates_t", col("tvd") > 0.25)
      .orderBy(col("c_nationkey"), col("bal_band"))
  }

  /** REPLICA DIVERGENCE LOCATOR — q98's order-independent checksums
    * pushed down one level: both replicas roll (count, bit_xor, Z_p
    * sum) of the row hash into 256 KEY-HASH buckets, and a full-outer
    * bucket join emits only buckets whose triples disagree — the
    * Merkle-ish "which 1/256th of the table do I re-sync" answer that
    * turns a 100 TB reconciliation into a targeted repair. Replica B
    * is derived in-query with deterministic faults (every 7777th key
    * missing, every 5000th key's cents drifted by +100) so both
    * fault classes — missing rows and corrupted values — must
    * surface. Money is bucketed as exact DECIMAL cents (BIGINT), so
    * the row key never renders a double. Each side is one
    * partial-aggregable pass; the join carries 256 rows. */
  def replicaBucketDiff(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "cents")
    val a = load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        (d2(col("o_totalprice")) * 100).cast(LongType).as("cents"))
    val b = a.filter(col("o_orderkey") % 7777 =!= 0)
      .withColumn("cents",
        when(col("o_orderkey") % 5000 === 0, col("cents") + 100)
          .otherwise(col("cents")))
    def bucketSums(df: DataFrame, side: String): DataFrame =
      spread(df)
        .select((phash(col("o_orderkey").cast(StringType)) % 256).as("bucket"),
          rowKey(cols).as("h"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as(s"n_$side"),
          expr("bit_xor(h)").as(s"x_$side"),
          sum(col("h") % P).as(s"s_$side"))
    bucketSums(a, "a").join(bucketSums(b, "b"), Seq("bucket"), "full_outer")
      .filter(not(col("n_a") <=> col("n_b"))
        || not(col("x_a") <=> col("x_b"))
        || not(col("s_a") <=> col("s_b")))
      .orderBy(col("bucket"))
  }

  /** BEHAVIORAL SEGMENT fingerprints — q175's Venn generalized to ANY
    * number of event types: each user's trailing-7-day behavior
    * reduced to a canonical sorted type-set string ("click,purchase"),
    * then a segment-size histogram. The sort makes the fingerprint
    * set-deterministic (collect_set order is partition-dependent;
    * sorted rendering is not), which is what lets an arbitrary-width
    * set survive the cross-engine hash gate where a bit mask would
    * need a fixed vocabulary. Two partial-aggregable rollups, state
    * O(type vocabulary) per user. */
  def behaviorSegments(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val mx = ev.agg(max(col("ts")).as("mx"))
    ev.crossJoin(broadcast(mx))
      .filter(col("ts") >= col("mx") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("user_id"))
      .agg(concat_ws(",", sort_array(collect_set(col("event_type"))))
        .as("segment"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("segment"))
  }

  /** DISTRIBUTION DRIFT between the first and second time-halves of
    * the event stream: per-type counts in each half plus the TOTAL
    * VARIATION DISTANCE between the two event-type mixes — the "did
    * the workload change shape" monitor beside q150's chi-square
    * independence test (TVD is the bounded [0,1] distance product
    * dashboards alarm on; chi-square answers significance). The PSI
    * the industry also quotes needs ln(), which is not
    * correctly-rounded-portable across engines — TVD carries the same
    * signal with none of the float hazard.
    *
    * Determinism: TVD = Σ|n1ᵢ·N2 − n2ᵢ·N1| / (2·N1·N2) — the
    * numerator is EXACT BIGINT per cell (cross-multiplied counts, no
    * per-cell division), the Σ is an integer aggregate, and the single
    * final division happens once on identical operands. The time split
    * is the integer-microsecond midpoint (lo+hi) DIV 2 — no float
    * timestamps. Scale: two partial-aggregable passes (bounds, then
    * counts) + O(types) arithmetic; the broadcast scalars are one row
    * each. */
  def distributionDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"), expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
        .as("us"))
    val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val counts = ev.crossJoin(broadcast(bounds))
      .withColumn("h1",
        (col("us") <= expr("(lo + hi) DIV 2")).cast(LongType))
      .groupBy(col("event_type"))
      .agg(sum(col("h1")).as("n_first"),
        sum(lit(1L) - col("h1")).as("n_second"))
    val totals = counts.agg(sum(col("n_first")).as("t1"),
      sum(col("n_second")).as("t2"))
    val d = counts.crossJoin(broadcast(totals))
      .withColumn("drift_num",
        abs(col("n_first") * col("t2") - col("n_second") * col("t1")))
    val num = d.agg(sum(col("drift_num")).as("num"))
    d.crossJoin(broadcast(num))
      .withColumn("tvd", col("num").cast(DoubleType) /
        (lit(2L) * col("t1") * col("t2")).cast(DoubleType))
      .select(col("event_type"), col("n_first"), col("n_second"),
        col("drift_num"), col("tvd"))
      .orderBy(col("event_type"))
  }

  /** L-DIVERSITY audit — q182's k-anonymity strengthened the standard
    * way (Machanavajjhala et al. 2007): a quasi-identifier group can
    * be size-k yet still leak if everyone in it shares the same
    * sensitive value. Here QI = (nation, balance band), sensitive =
    * market segment; groups with fewer than 3 DISTINCT segments are
    * flagged. One QI-key rollup with a count-distinct — the distinct
    * expands to (QI, segment) pre-aggregation then re-rolls, both
    * partial-aggregable; all integers. */
  def lDiversityAudit(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast(LongType).as("bal_band"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("c_mktsegment")).as("l"))
      .filter(col("l") < 3)
      .orderBy(col("c_nationkey"), col("bal_band"))

  /** OBSERVED-METRICS surface (`Dataset.observe` + `Observation`,
    * SPARK-34806): data-quality counters collected ON the pass that
    * does the work — zero extra scans, the AccumulatorV2 path — here
    * surfaced as the query result itself and gated against a direct
    * aggregate oracle, proving observe() counts exactly what a
    * dedicated aggregation would. This is the pipeline-health pattern
    * for 100 TB jobs: every production write carries its row-count /
    * mass / null-count metrics for free. */
  def observedMetrics(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Observation
    val obs = Observation()
    load(spark, dir, "orders")
      .observe(obs,
        count(lit(1)).as("n_orders"),
        sum(d2(col("o_totalprice"))).cast(DoubleType).as("gross"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L))
          .as("n_open"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    import spark.implicits._
    Seq((m("n_orders").asInstanceOf[Long],
      m("gross").asInstanceOf[Double],
      m("n_open").asInstanceOf[Long]))
      .toDF("n_orders", "gross", "n_open")
  }

  /** `df.stat.crosstab` surface: the exact event-type × ISO-weekday
    * contingency table (q150's input cells) through the stat-API
    * front door — one pass, exact counts; columns re-selected in
    * fixed ISO order because crosstab's column order follows value
    * encounter order, which is not a contract. Weekday rule:
    * Spark `weekday()+1` == DuckDB `isodow` (Mon=1..Sun=7). */
  def statCrosstab(spark: SparkSession, dir: String): DataFrame = {
    val ct = events(spark, dir)
      .select(col("event_type"),
        (weekday(col("ts")) + 1).cast(StringType).as("dow"))
      .stat.crosstab("event_type", "dow")
    ct.select(col("event_type_dow").as("event_type") +:
        (1 to 7).map(i => col(s"`$i`").as(s"dow_$i")): _*)
      .orderBy(col("event_type"))
  }

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV drift over a CONTINUOUS column —
    * the companion to q207's categorical TVD: q207 answers "did the
    * event-type mix shift", this answers "did the order-value
    * DISTRIBUTION shift" between the first and second time-halves.
    * KS D = max over v of |F1(v) − F2(v)|, location- and bin-free,
    * which is why drift monitors prefer it to fixed-bucket histogram
    * distances for amounts/latencies.
    *
    * Determinism: values are exact cents (BIGINT), the time split is
    * q207's integer-microsecond midpoint, and D's numerator is EXACT —
    * |c1·N2 − c2·N1| cross-multiplied in DECIMAL(38) (counts stay
    * products-safe far past BIGINT's ~3·10⁹-row pair limit) — with ONE
    * final double division. The argmax row is picked by (d_num, cents)
    * max-struct, a total order, so ties cannot fork engines.
    *
    * Scale: the cumulative counts NEVER run through a single-partition
    * global window — per-value counts bucket by `cents DIV 2²⁰`
    * (bucket order == value order), per-bucket subtotals roll to
    * broadcast offsets (the only unpartitioned window is over
    * O(buckets) rows), and each bucket cumulates internally in
    * parallel — the [[Windows.globalRankNoSort]] shape applied to a
    * running SUM instead of a rank. Everything else is two
    * partial-aggregable passes + one-row broadcasts. */
  /** q341 — WEEKLY DRIFT SERIES: q244's two-sample KS turned into the
    * monitoring TIME SERIES — for every ISO week, the exact KS
    * statistic of that week's event-value distribution against the
    * whole corpus, the chart a data-quality dashboard alarms on
    * ("week 31 drifted"). Same exact-integer construction: per-week
    * and global CDFs as cumulative counts over the value histogram
    * (the week grid completed against the GLOBAL support so a value a
    * week never saw still contributes its step), the sup-distance
    * numerator |c_w·N − C·n_w| in DECIMAL(38) cross-products, argmax
    * by a deterministic max-struct, ONE division per week.
    *
    * Scale shape: all windows partition by week or run over the
    * O(distinct values) global histogram — never a single-partition
    * sweep over raw rows; the grid is O(weeks × distinct values),
    * bounded by the value DOMAIN, not the row count. */
  def weeklyDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select(
      expr("date_trunc('WEEK', ts)").cast(DateType).as("week"),
      (d2(col("value")) * 100).cast(LongType).as("cents"))
    val wkCounts = e.groupBy(col("week"), col("cents"))
      .agg(count(lit(1)).as("n"))
    val gCounts = e.groupBy(col("cents")).agg(count(lit(1)).as("g"))
    val wG = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gCum = gCounts.withColumn("cg", sum(col("g")).over(wG))
    val grid = e.select(col("week")).distinct()
      .crossJoin(gCum.select(col("cents"), col("cg")))
      .join(wkCounts, Seq("week", "cents"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val wW = Window.partitionBy(col("week")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = e.agg(count(lit(1)).as("nn"))
    val wkTot = e.groupBy(col("week")).agg(count(lit(1)).as("nw"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    grid.withColumn("cw", sum(col("n")).over(wW))
      .join(broadcast(wkTot), "week")
      .crossJoin(broadcast(tot))
      .withColumn("d_num",
        abs(dec(col("cw")) * dec(col("nn")) - dec(col("cg")) * dec(col("nw")))
          .cast(DecimalType(38, 0)))
      .groupBy(col("week"))
      .agg(max(col("nw")).as("n_week"), max(col("nn")).as("nn2"),
        max(struct(col("d_num"), col("cents"))).as("mx"))
      .select(col("week"), col("n_week"),
        col("mx.cents").as("at_cents"),
        (col("mx.d_num").cast(DoubleType) /
          (col("n_week").cast(DoubleType) * col("nn2").cast(DoubleType)))
          .as("ks"))
      .orderBy(col("week"))
  }

  /** q346 — DRIFT BAND ATTRIBUTION: q341 says WHICH week drifted;
    * this says WHERE — for every week, the 1000-cent value band with
    * the largest absolute share gap against the corpus, with both
    * shares emitted. The alarm→diagnosis pair every drift dashboard
    * needs ("week 31 drifted because the 40–50 band doubled"). Gap
    * numerator |n_band·N − g_band·n_w| in exact DECIMAL(38)
    * cross-products over the completed week×band grid (a band a week
    * never saw still attributes); argmax by deterministic max-struct
    * (ties to the highest band); shares ONE division each. Grid is
    * O(weeks × bands), bands bounded by the value domain. */
  def driftBandAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select(
      expr("date_trunc('WEEK', ts)").cast(DateType).as("week"),
      expr(s"(cast(cast(value as decimal(18,2)) * 100 as bigint)) div 1000")
        .as("band"))
    val wk = e.groupBy(col("week"), col("band")).agg(count(lit(1)).as("n"))
    val g = e.groupBy(col("band")).agg(count(lit(1)).as("gb"))
    val tot = e.agg(count(lit(1)).as("nn"))
    val wkTot = e.groupBy(col("week")).agg(count(lit(1)).as("nw"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    e.select(col("week")).distinct()
      .crossJoin(broadcast(g))
      .join(wk, Seq("week", "band"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .join(broadcast(wkTot), "week")
      .crossJoin(broadcast(tot))
      .withColumn("gap",
        abs(dec(col("n")) * dec(col("nn")) - dec(col("gb")) * dec(col("nw")))
          .cast(DecimalType(38, 0)))
      .groupBy(col("week"))
      .agg(max(struct(col("gap"), col("band"), col("n"), col("gb"),
        col("nw"), col("nn"))).as("m"))
      .select(col("week"), col("m.band").as("top_band"),
        (col("m.n").cast(DoubleType) / col("m.nw")).as("week_share"),
        (col("m.gb").cast(DoubleType) / col("m.nn")).as("global_share"))
      .orderBy(col("week"))
  }

  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    val o = load(spark, dir, "orders").select(
      (d2(col("o_totalprice")) * 100).cast(LongType).as("cents"),
      expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', o_orderdate)")
        .as("us"))
    val bounds = o.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val counts = o.crossJoin(broadcast(bounds))
      .withColumn("h1",
        (col("us") <= expr("(lo + hi) DIV 2")).cast(LongType))
      .groupBy(col("cents"))
      .agg(sum(col("h1")).as("n1"), sum(lit(1L) - col("h1")).as("n2"))
    val totals = counts.agg(sum(col("n1")).as("tn1"),
      sum(col("n2")).as("tn2"))
    // two-level cumulative sum: bucket subtotals -> broadcast offsets
    val b = counts.withColumn("bkt", expr("cents DIV 1048576"))
    val offs = b.groupBy(col("bkt"))
      .agg(sum(col("n1")).as("b1"), sum(col("n2")).as("b2"))
    val wOff = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumOffs = offs
      .withColumn("off1", coalesce(sum(col("b1")).over(wOff), lit(0L)))
      .withColumn("off2", coalesce(sum(col("b2")).over(wOff), lit(0L)))
      .drop("b1", "b2")
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val dec = (c: Column) => c.cast(DecimalType(19, 0))
    val cum = b.join(broadcast(cumOffs), "bkt")
      .withColumn("c1", col("off1") + sum(col("n1")).over(wIn))
      .withColumn("c2", col("off2") + sum(col("n2")).over(wIn))
      .crossJoin(broadcast(totals))
      .withColumn("d_num",
        abs(dec(col("c1")) * dec(col("tn2")) - dec(col("c2")) * dec(col("tn1")))
          .cast(DecimalType(38, 0)))
    cum.groupBy(col("tn1"), col("tn2"))
      .agg(max(struct(col("d_num"), col("cents"))).as("mx"))
      .select(col("tn1").as("n1"), col("tn2").as("n2"),
        col("mx.d_num").cast(LongType).as("d_num"),
        col("mx.cents").as("at_cents"),
        (col("mx.d_num").cast(DoubleType) /
          (col("tn1").cast(DoubleType) * col("tn2").cast(DoubleType)))
          .as("ks"))
  }

  /** PER-WEEKDAY CLASS PURITY — Gini impurity of the event-type mix
    * within each ISO weekday: the decision-tree split-scoring
    * primitive (CART's criterion) phrased as a feature-quality audit:
    * a weekday whose impurity sits far below the others predicts the
    * event type by itself. Gini needs no logarithm — unlike entropy /
    * information gain it is exactly representable: impurity = 1 −
    * Σ(nᵢ/n)² = (n² − Σnᵢ²)/n², so the numerator and denominator are
    * EXACT BIGINTs (the same integer-moment trick as q159's diversity
    * index, which is this statistic over a different grouping) and the
    * single division is one identical IEEE op in both engines. Two
    * partial-aggregable rollups — (dow, type) cells, then O(7)
    * weekday rows; nothing wider than the cell table ever shuffles. */
  def giniPurity(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy((weekday(col("ts")) + 1).cast(LongType).as("dow"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("dow"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("cnt") * col("cnt")).as("ssq"))
      .withColumn("gini",
        (col("n") * col("n") - col("ssq")).cast(DoubleType) /
          (col("n") * col("n")).cast(DoubleType))
      .orderBy(col("dow"))

  /** q287 — TUKEY/IQR outlier audit per event_type, ALL-INTEGER: exact
    * discrete quartiles from the value-histogram CDF (the q95 trick —
    * never a per-row global sort), fences at Q1 − 1.5·IQR / Q3 +
    * 1.5·IQR evaluated in DOUBLED cents so the ×1.5 stays integer,
    * and the per-group outlier mass counted by ONE broadcast join of
    * the O(types) fence table back to the histogram. The robust
    * anomaly gate a telemetry load runs before trusting `value`:
    * mean/stddev fences (q161's moment machinery) move with the very
    * outliers they hunt; rank-based fences don't.
    *
    * Quartile definition (both engines, exactly): Q_k = the smallest
    * value whose cumulative count reaches ceil(k·n/4). Everything is
    * BIGINT — no doubles anywhere in the result, so there is no
    * op-order hazard at all.
    *
    * Scale shape: the histogram rollup is partial-aggregated on
    * (type, cents); the CDF window runs per type over O(distinct
    * values) histogram rows, not raw events; fences are O(types) and
    * broadcast. */
  def iqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"), (d2(col("value")) * 100).cast(LongType)
        .as("cents"))
    val hist = ev.groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("c"))
    val wCdf = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cdf = hist
      .withColumn("cum", sum(col("c")).over(wCdf))
      .withColumn("n_grp", sum(col("c")).over(wTot))
    val fences = cdf.groupBy(col("event_type"))
      .agg(max(col("n_grp")).as("n"),
        min(when(col("cum") >= expr("(n_grp + 3) div 4"), col("cents")))
          .as("q1"),
        min(when(col("cum") >= expr("(3 * n_grp + 3) div 4"), col("cents")))
          .as("q3"))
      .withColumn("iqr", col("q3") - col("q1"))
    val out = hist.join(broadcast(fences), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("q1")).as("q1_cents"),
        max(col("q3")).as("q3_cents"), max(col("iqr")).as("iqr_cents"),
        sum(when(col("cents") * 2 < col("q1") * 2 - col("iqr") * 3,
          col("c")).otherwise(lit(0L))).as("n_low_outliers"),
        sum(when(col("cents") * 2 > col("q3") * 2 + col("iqr") * 3,
          col("c")).otherwise(lit(0L))).as("n_high_outliers"))
      .select(col("event_type"), col("n"), col("q1_cents"), col("q3_cents"),
        col("iqr_cents"),
        col("n_low_outliers").cast(LongType).as("n_low_outliers"),
        col("n_high_outliers").cast(LongType).as("n_high_outliers"))
      .orderBy(col("event_type"))
    out
  }

  /** q288 — MANN-WHITNEY U (Wilcoxon rank-sum): the NONPARAMETRIC A/B
    * readout on purchase VALUES, completing q161 (which compares
    * conversion proportions): does variant 1 stochastically dominate
    * variant 0, with no normality assumption and total robustness to
    * the heavy tails q287 flags? Users split by the same q69/q161
    * hash-parity rule so the experiment families can never fork.
    *
    * Exactness: ranks come from the shared value-HISTOGRAM CDF, and
    * midranks are kept in DOUBLED units (2·below + t + 1, integer) so
    * tied ranks never produce a .5 float — the rank sum R, U = R −
    * n(n+1)/2 (both doubled) and the tie-correction term Σ(t³−t) are
    * ALL exact BIGINT. Only the final z-score is double, computed in
    * ONE spelled IEEE sequence mirrored verbatim in the oracle
    * (sqrt is correctly rounded in both engines).
    *
    * Scale shape: one (cents) partial-agg histogram rollup with
    * per-variant conditional counts; the CDF window runs over the
    * O(distinct values) histogram — bounded by the value DOMAIN
    * (~20k cents cells), not the row count — then ONE fold to a
    * single row. (At extreme scale the doubled rank sum approaches
    * 2n²; production widens r2 to DECIMAL(38) — the corpus stays far
    * inside int64.) */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).filter(col("event_type") === "purchase")
      .select((phash(col("user_id").cast(StringType)) % 2).as("variant"),
        (d2(col("value")) * 100).cast(LongType).as("cents"))
    val hist = e.groupBy(col("cents")).agg(
      sum(when(col("variant") === 0, lit(1L)).otherwise(lit(0L))).as("ca"),
      sum(when(col("variant") === 1, lit(1L)).otherwise(lit(0L))).as("cb"))
    val wBelow = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = hist.withColumn("t", col("ca") + col("cb"))
      .withColumn("below", coalesce(sum(col("t")).over(wBelow), lit(0L)))
    val s = c.agg(
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      sum(col("ca") * (col("below") * 2 + col("t") + 1)).as("r2"),
      sum(col("t") * col("t") * col("t") - col("t")).as("tt"))
    val d = (x: Column) => x.cast(DoubleType)
    val nn = col("na") + col("nb")
    val u2 = col("r2") - col("na") * (col("na") + 1)
    val v1 = d(col("na")) * d(col("nb")) / lit(12.0)
    val v2 = d(nn + 1) - d(col("tt")) / (d(nn) * d(nn - 1))
    s.select(col("na").cast(LongType).as("na"),
      col("nb").cast(LongType).as("nb"),
      u2.cast(LongType).as("u_x2"),
      when(col("na") > 0 && col("nb") > 0 && v1 * v2 > 0,
        d(u2 - col("na") * col("nb")) / (lit(2.0) * sqrt(v1 * v2)))
        .as("z_score"))
  }

  /** q289 — WASSERSTEIN-1 (earth mover's) drift of each source's
    * doc-length distribution against the pooled corpus — the metric
    * that completes the drift family: q207's TVD saturates when
    * supports barely overlap and q244's KS reads only the worst single
    * point, while W1 = ∫|F_s − F_pool| dv prices HOW FAR the mass
    * moved in character units (the number you alert on when one feed
    * starts shipping truncated docs).
    *
    * Exactness: the pooled value grid contains every source's values,
    * so both CDFs are step functions constant between consecutive grid
    * points and the integral is EXACT: Σ |cumS·nP − cumP·nS| · gap —
    * all integer (cross-multiplied CDF difference, never a float
    * fraction per row), summed as BIGINT, then ONE double division by
    * nS·nP. Grid size is bounded by the VALUE DOMAIN (distinct
    * n_chars), not the row count.
    *
    * Scale shape: one (source, v) histogram partial-agg + one pooled
    * histogram; the dense per-source grid is sources × grid (both
    * tiny, broadcast); CDF windows run over grid rows only. */
  def wassersteinDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
      .select(col("source"), col("n_chars").as("v"))
    val pooled = docs.groupBy(col("v")).agg(count(lit(1)).as("cp"))
    val srcHist = docs.groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("cs"))
    val sources = docs.select(col("source")).distinct()
    val grid = sources.crossJoin(broadcast(pooled))
      .join(srcHist, Seq("source", "v"), "left")
      .withColumn("cs", coalesce(col("cs"), lit(0L)))
    val wS = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wLead = Window.partitionBy(col("source")).orderBy(col("v"))
    val cdf = grid
      .withColumn("cum_s", sum(col("cs")).over(wS))
      .withColumn("cum_p", sum(col("cp")).over(wS))
      .withColumn("n_s", sum(col("cs")).over(wTot))
      .withColumn("n_p", sum(col("cp")).over(wTot))
      .withColumn("gap", coalesce(lead(col("v"), 1).over(wLead) - col("v"),
        lit(0L)))
    cdf.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_docs"),
        sum(abs(col("cum_s") * col("n_p") - col("cum_p") * col("n_s"))
          * col("gap")).as("s1"),
        max(col("n_s") * col("n_p")).as("den"))
      .select(col("source"), col("n_docs"),
        (col("s1").cast(DoubleType) / col("den").cast(DoubleType))
          .as("w1_chars"))
      .orderBy(col("source"))
  }

  /** q305 — DAILY PERCENTILE BANDS (p50/p90/p99 of event value per
    * day): the SRE/ops dashboard series — q287 fences one
    * distribution per type, this tracks the distribution of every DAY
    * so a drifting tail shows up as a moving p99 line. Same exact
    * histogram-CDF machinery (percentile = smallest value whose
    * cumulative count reaches ceil(q·n/100)), grouped by day: the CDF
    * windows run over O(days × distinct values) histogram rows, all
    * outputs exact integer cents — no approximate percentile sketch
    * and no float rank arithmetic anywhere. */
  def dailyPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val hist = events(spark, dir)
      .select(to_date(col("ts")).as("day"),
        (d2(col("value")) * 100).cast(LongType).as("cents"))
      .groupBy(col("day"), col("cents")).agg(count(lit(1)).as("c"))
    val wCdf = Window.partitionBy(col("day")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("cum", sum(col("c")).over(wCdf))
      .withColumn("n_day", sum(col("c")).over(wTot))
      .groupBy(col("day"))
      .agg(max(col("n_day")).as("n_events"),
        min(when(col("cum") >= expr("(50 * n_day + 99) div 100"),
          col("cents"))).as("p50_cents"),
        min(when(col("cum") >= expr("(90 * n_day + 99) div 100"),
          col("cents"))).as("p90_cents"),
        min(when(col("cum") >= expr("(99 * n_day + 99) div 100"),
          col("cents"))).as("p99_cents"))
      .orderBy(col("day"))
  }

  /** q310 — JOIN-CARDINALITY ESTIMATE audit: the textbook equi-join
    * estimator |L⋈R| ≈ |L|·|R| / max(ndv_L, ndv_R) (the
    * uniform-distribution + containment assumption every cost-based
    * optimizer starts from) computed NEXT TO the exact answer
    * Σ_k n_L(k)·n_R(k) — the calibration readout that tells you how
    * far skew bends the planner's guess on YOUR data (q157 lists the
    * guilty keys; this prices the aggregate misestimate). Exact side
    * runs on the COUNT tables, never the fact rows; estimate and
    * ratio are a fixed double sequence off exact integers. */
  def joinCardinalityAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    def side(t: String): DataFrame = e.filter(col("event_type") === t)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val l = side("click")
    val r = side("purchase")
    val d = (x: Column) => x.cast(DoubleType)
    val stats = l.agg(sum(col("c")).as("n_left"),
        count(lit(1)).as("ndv_left"))
      .crossJoin(r.agg(sum(col("c")).as("n_right"),
        count(lit(1)).as("ndv_right")))
    val actual = l.select(col("user_id"), col("c").as("cl"))
      .join(r.select(col("user_id"), col("c").as("cr")), "user_id")
      .agg(sum(col("cl") * col("cr")).as("actual_rows"))
    stats.crossJoin(actual)
      .withColumn("est_rows", d(col("n_left")) * d(col("n_right")) /
        d(greatest(col("ndv_left"), col("ndv_right"))))
      .select(col("n_left").cast(LongType).as("n_left"),
        col("n_right").cast(LongType).as("n_right"),
        col("ndv_left"), col("ndv_right"), col("est_rows"),
        col("actual_rows").cast(LongType).as("actual_rows"),
        (d(col("actual_rows")) / col("est_rows")).as("actual_over_est"))
  }

  private[graft] lazy val bottomKAgg =
    udaf(graft.functions.BottomKSample,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())

  /** q370 — MERGEABLE QUANTILE SKETCH (bottom-k sample): per-source
    * document-length percentiles WITHOUT a corpus-wide per-group sort
    * — the quantile companion of q365's KMV, completing the classic
    * sketch family (HLL / MinHash / KMV / bottom-k sample). Each doc
    * contributes (portable 56-bit id-hash, n_chars) to
    * [[graft.functions.BottomKSample]]; the kept K = 64 values are a
    * deterministic uniform sample of the source (see the Aggregator
    * doc for why bottom-k is oracle-recomputable where KLL is not),
    * and p50/p90/p99 are read off the sorted sample at the integer
    * rank `(m−1)·p div 100` — every index step exact in both engines.
    * Exact doc counts ride along as audit columns (the q211/q234/q365
    * estimate-beside-truth pattern).
    *
    * Scale shape: ONE partial-aggregable rollup — map-side combine
    * reduces every partition to ≤ 64 (hash, value) pairs per source
    * before the shuffle (PlanSpec pins `partial_bottomksample`), vs
    * the full per-group sort/shuffle an exact percentile needs;
    * output is O(sources). */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(load(spark, dir, "documents"))
      .select(col("source"),
        phash(expr("cast(doc_id as string)")).as("h"),
        col("n_chars").cast(LongType).as("v"))
    // integer `div` (Column./ is double division and would detour the
    // rank through IEEE); element_at is 1-based, index ∈ [1, m] so the
    // ANSI bounds check can never throw
    def pAt(p: Int): Column =
      element_at(col("sv"),
        expr(s"cast((size(sv) - 1) * $p div 100 as int) + 1")).as(s"p$p")
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        bottomKAgg(col("h"), col("v")).as("sample"))
      .withColumn("sv", array_sort(col("sample")))
      .select(col("source"), col("n_docs"),
        size(col("sv")).as("m_sample"), pAt(50), pAt(90), pAt(99))
      .orderBy(col("source"))
  }

  private[graft] lazy val weightedBottomKAgg =
    udaf(graft.functions.WeightedBottomKSample,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Long)]())

  /** q374 — WEIGHTED QUANTILE SKETCH (weighted bottom-k sample):
    * per-return-flag weighted median of lineitem price, weight =
    * quantity — q149's semantics as a MERGEABLE sketch, the one
    * quantile form q370's unweighted sample can't serve. Each row
    * contributes (portable row-key hash, cents, weight) to
    * [[graft.functions.WeightedBottomKSample]]; the kept K = 64
    * (value, weight) pairs are a deterministic uniform row-sample, and
    * the estimate applies q149's exact lower-median walk — smallest
    * value whose cumulative weight reaches `(total + 1) div 2` — to
    * the SAMPLE's weights (the Hansen–Hurwitz CDF estimate; integer
    * arithmetic end to end, so the oracle replays the sample AND the
    * walk row-for-row). Exact row count and exact total weight ride
    * the same rollup as audit columns (the estimate-beside-truth
    * pattern): the reader sees how much mass the 64-row sample
    * summarizes.
    *
    * Scale shape: ONE partial-aggregable rollup — map-side combine
    * reduces every partition to ≤ 64 triples per group before the
    * shuffle (PlanSpec pins `partial_weightedbottomksample`) — then
    * the median walk runs over ≤ 64·groups sample rows, vs q149's
    * two-pass bucket selection over the full corpus. */
  def weightedQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val rows = load(spark, dir, "lineitem").select(
      col("l_returnflag"),
      phash(concat_ws(":", col("l_orderkey").cast(StringType),
        col("l_linenumber").cast(StringType))).as("h"),
      (d2(col("l_extendedprice")) * 100).cast(LongType).as("v"),
      col("l_quantity").cast(LongType).as("w"))
    val sk = rows.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), sum(col("w")).as("total_weight"),
        weightedBottomKAgg(col("h"), col("v"), col("w")).as("sample"))
    // the weighted-median walk over the exploded ≤ 64-pair samples —
    // kept relational so the estimator arithmetic stays in the plan
    val ex = sk.select(col("l_returnflag"), col("n_rows"),
        col("total_weight"), size(col("sample")).as("m_sample"),
        explode(col("sample")).as("s"))
      .groupBy(col("l_returnflag"), col("n_rows"), col("total_weight"),
        col("m_sample"), col("s._1").as("v"))
      .agg(sum(col("s._2")).as("wc"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ex.withColumn("cum", sum(col("wc")).over(wCum))
      .withColumn("sw", sum(col("wc")).over(wAll))
      .filter(col("cum") >= expr("(sw + 1) div 2") &&
        col("cum") - col("wc") < expr("(sw + 1) div 2"))
      .select(col("l_returnflag"), col("n_rows"), col("total_weight"),
        col("m_sample"), col("sw").as("sample_weight"),
        col("v").as("est_median_cents"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q374_weighted_quantile_sketch" -> weightedQuantileSketch,
    "q370_quantile_sketch" -> quantileSketch,
    "q310_join_cardinality" -> joinCardinalityAudit,
    "q305_daily_percentiles" -> dailyPercentiles,
    "q289_wasserstein_drift" -> wassersteinDrift,
    "q288_mann_whitney" -> mannWhitney,
    "q287_iqr_outliers" -> iqrOutliers,
    "q244_ks_drift" -> ksDrift,
    "q245_gini_purity" -> giniPurity,
    "q229_observed_metrics" -> observedMetrics,
    "q230_stat_crosstab" -> statCrosstab,
    "q209_l_diversity" -> lDiversityAudit,
    "q207_distribution_drift" -> distributionDrift,
    "q193_behavior_segments" -> behaviorSegments,
    "q184_replica_bucket_diff" -> replicaBucketDiff,
    "q181_zonemap_skip" -> zoneMapSkipAudit,
    "q182_k_anonymity" -> kAnonymityAudit,
    "q330_t_closeness" -> tClosenessAudit,
    "q341_weekly_drift" -> weeklyDrift,
    "q346_drift_band_attribution" -> driftBandAttribution,
    "q150_chi_square" -> chiSquare,
    "q175_venn_overlap" -> vennOverlap,
    "q161_ab_test_readout" -> abTestReadout,
    "q162_spearman_correlation" -> spearmanCorrelation,
    "q153_bitmap_distinct" -> bitmapDistinct,
    "q157_join_fanout_profile" -> joinFanoutProfile,
    "q159_diversity_index" -> diversityIndex,
    "q154_benford_digits" -> benfordDigits,
    "q155_gini_concentration" -> giniConcentration,
    "q98_table_checksums" -> tableChecksums,
    "q100_profile_documents" -> profileDocuments,
    "q126_expectation_suite" -> expectationSuite,
    "q127_referential_integrity" -> referentialIntegrity,
    "q136_duplicate_keys" -> duplicateKeys)

  private def rowKeySql(cols: Seq[String]): String =
    phashSql("CONCAT_WS(CHR(31), " +
      cols.map(c => s"COALESCE(CAST($c AS VARCHAR), CHR(2))").mkString(", ") + ")")

  private lazy val bucketDiffSideSql: String = {
    val rk = rowKeySql(Seq("o_orderkey", "o_custkey", "cents"))
    s"""SELECT ${phashSql("CAST(o_orderkey AS VARCHAR)")} % 256 AS bucket,
       |    COUNT(*) AS n_?, BIT_XOR($rk) AS x_?,
       |    CAST(SUM($rk % ${P}) AS BIGINT) AS s_?
       |  FROM ?SRC GROUP BY 1""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // q374: the weighted sample is deterministic (bottom-64 by (hash,
    // value, weight)), so the oracle recomputes the sample with a
    // window rank and replays q149's lower-median walk over it
    "q374_weighted_quantile_sketch" ->
      s"""WITH s AS (
        | SELECT l_returnflag AS grp,
        |        ${phashSql("CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} AS hk,
        |        CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
        |        CAST(l_quantity AS BIGINT) AS w
        | FROM lineitem),
        |t AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |        CAST(SUM(w) AS BIGINT) AS total_weight
        |      FROM s GROUP BY grp),
        |r AS (SELECT grp, v, w,
        |        ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hk, v, w) AS rn
        |      FROM s),
        |k AS (SELECT grp, v, w FROM r WHERE rn <= 64),
        |ms AS (SELECT grp, CAST(COUNT(*) AS INT) AS m_sample
        |       FROM k GROUP BY grp),
        |g AS (SELECT grp, v, CAST(SUM(w) AS BIGINT) AS wc
        |      FROM k GROUP BY grp, v),
        |c AS (SELECT grp, v, wc,
        |        SUM(wc) OVER (PARTITION BY grp ORDER BY v) AS cum,
        |        SUM(wc) OVER (PARTITION BY grp) AS sw
        |      FROM g),
        |m AS (SELECT grp, CAST(sw AS BIGINT) AS sample_weight,
        |        v AS est_median_cents
        |      FROM c
        |      WHERE cum >= (sw + 1) // 2 AND cum - wc < (sw + 1) // 2)
        |SELECT t.grp AS l_returnflag, t.n_rows, t.total_weight,
        |  ms.m_sample, m.sample_weight, m.est_median_cents
        |FROM t JOIN ms ON t.grp = ms.grp JOIN m ON t.grp = m.grp
        |ORDER BY l_returnflag""".stripMargin,
    // q370: the bottom-64-by-(hash,value) sample is deterministic, so
    // the oracle recomputes it with a window rank and reads the same
    // integer ranks off the sorted sample values
    "q370_quantile_sketch" ->
      s"""WITH h AS (
        | SELECT source, CAST(n_chars AS BIGINT) AS v,
        |        ${phashSql("CAST(doc_id AS VARCHAR)")} AS hk
        | FROM documents),
        |r AS (
        | SELECT source, v,
        |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, v) AS rn
        | FROM h),
        |cn AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |       FROM h GROUP BY source),
        |s AS (SELECT source, LIST_SORT(LIST(v)) AS sv
        |      FROM r WHERE rn <= 64 GROUP BY source)
        |SELECT s.source, cn.n_docs,
        |       CAST(LEN(sv) AS INT) AS m_sample,
        |       sv[CAST((LEN(sv) - 1) * 50 // 100 AS INT) + 1] AS p50,
        |       sv[CAST((LEN(sv) - 1) * 90 // 100 AS INT) + 1] AS p90,
        |       sv[CAST((LEN(sv) - 1) * 99 // 100 AS INT) + 1] AS p99
        |FROM s JOIN cn ON s.source = cn.source
        |ORDER BY s.source""".stripMargin,
    // q310: identical estimator spelling and exact count-table join
    "q310_join_cardinality" ->
      """WITH l AS (SELECT user_id, COUNT(*) AS c FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |r AS (SELECT user_id, COUNT(*) AS c FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |sl AS (SELECT CAST(SUM(c) AS BIGINT) AS n_left,
        |        CAST(COUNT(*) AS BIGINT) AS ndv_left FROM l),
        |sr AS (SELECT CAST(SUM(c) AS BIGINT) AS n_right,
        |        CAST(COUNT(*) AS BIGINT) AS ndv_right FROM r),
        |a AS (SELECT CAST(SUM(l.c * r.c) AS BIGINT) AS actual_rows
        |      FROM l JOIN r USING (user_id))
        |SELECT n_left, n_right, ndv_left, ndv_right,
        |  CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
        |    / CAST(GREATEST(ndv_left, ndv_right) AS DOUBLE) AS est_rows,
        |  actual_rows,
        |  CAST(actual_rows AS DOUBLE)
        |    / (CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
        |       / CAST(GREATEST(ndv_left, ndv_right) AS DOUBLE))
        |    AS actual_over_est
        |FROM sl CROSS JOIN sr CROSS JOIN a""".stripMargin,
    // q305: identical ceil(q·n/100) discrete-percentile rule
    "q305_daily_percentiles" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |h AS (SELECT day, cents, COUNT(*) AS c FROM e GROUP BY 1, 2),
        |cdf AS (SELECT day, cents, c,
        |          SUM(c) OVER (PARTITION BY day ORDER BY cents) AS cum,
        |          SUM(c) OVER (PARTITION BY day) AS n_day
        |        FROM h)
        |SELECT day, CAST(MAX(n_day) AS BIGINT) AS n_events,
        |  MIN(CASE WHEN cum >= (50 * n_day + 99) // 100 THEN cents END)
        |    AS p50_cents,
        |  MIN(CASE WHEN cum >= (90 * n_day + 99) // 100 THEN cents END)
        |    AS p90_cents,
        |  MIN(CASE WHEN cum >= (99 * n_day + 99) // 100 THEN cents END)
        |    AS p99_cents
        |FROM cdf GROUP BY 1 ORDER BY day""".stripMargin,
    // q289: the same exact cross-multiplied step-function integral
    "q289_wasserstein_drift" ->
      """WITH d AS (SELECT source, n_chars AS v FROM documents),
        |p AS (SELECT v, COUNT(*) AS cp FROM d GROUP BY 1),
        |sh AS (SELECT source, v, COUNT(*) AS cs FROM d GROUP BY 1, 2),
        |g AS (SELECT s.source, p.v, p.cp, COALESCE(sh.cs, 0) AS cs
        |      FROM (SELECT DISTINCT source FROM d) s
        |      CROSS JOIN p
        |      LEFT JOIN sh ON sh.source = s.source AND sh.v = p.v),
        |c AS (SELECT source, v, cp, cs,
        |        SUM(cs) OVER (PARTITION BY source ORDER BY v) AS cum_s,
        |        SUM(cp) OVER (PARTITION BY source ORDER BY v) AS cum_p,
        |        SUM(cs) OVER (PARTITION BY source) AS n_s,
        |        SUM(cp) OVER (PARTITION BY source) AS n_p,
        |        COALESCE(LEAD(v, 1) OVER (PARTITION BY source ORDER BY v)
        |          - v, 0) AS gap
        |      FROM g)
        |SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
        |  CAST(CAST(SUM(ABS(cum_s * n_p - cum_p * n_s) * gap) AS BIGINT)
        |       AS DOUBLE)
        |    / CAST(CAST(MAX(n_s * n_p) AS BIGINT) AS DOUBLE) AS w1_chars
        |FROM c GROUP BY source
        |ORDER BY source""".stripMargin,
    // q288: identical doubled-midrank machinery; the z expression is
    // the verbatim IEEE sequence of the Spark side
    "q288_mann_whitney" ->
      s"""WITH e AS (SELECT
        |    ${phashSql("CAST(user_id AS VARCHAR)")} % 2 AS variant,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT cents,
        |        SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS ca,
        |        SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS cb
        |      FROM e GROUP BY 1),
        |c AS (SELECT ca, cb, ca + cb AS t,
        |        COALESCE(SUM(ca + cb) OVER (ORDER BY cents
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS below
        |      FROM h),
        |s AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |        CAST(SUM(cb) AS BIGINT) AS nb,
        |        CAST(SUM(ca * (below * 2 + t + 1)) AS BIGINT) AS r2,
        |        CAST(SUM(t * t * t - t) AS BIGINT) AS tt
        |      FROM c)
        |SELECT na, nb, r2 - na * (na + 1) AS u_x2,
        |  CASE WHEN na > 0 AND nb > 0
        |        AND (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0)
        |          * (CAST(na + nb + 1 AS DOUBLE) - CAST(tt AS DOUBLE)
        |             / (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE))) > 0
        |  THEN CAST(r2 - na * (na + 1) - na * nb AS DOUBLE)
        |    / (2.0 * SQRT(
        |        (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0)
        |        * (CAST(na + nb + 1 AS DOUBLE) - CAST(tt AS DOUBLE)
        |           / (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE)))))
        |  END AS z_score
        |FROM s""".stripMargin,
    // q287: identical integer quartile rule — smallest value whose
    // cumulative count reaches ceil(k·n/4); fences in doubled cents
    "q287_iqr_outliers" ->
      """WITH e AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |h AS (SELECT event_type, cents, COUNT(*) AS c
        |      FROM e GROUP BY 1, 2),
        |cdf AS (SELECT event_type, cents, c,
        |          SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
        |          SUM(c) OVER (PARTITION BY event_type) AS n_grp
        |        FROM h),
        |f AS (SELECT event_type, CAST(MAX(n_grp) AS BIGINT) AS n,
        |        MIN(CASE WHEN cum >= (n_grp + 3) // 4 THEN cents END) AS q1,
        |        MIN(CASE WHEN cum >= (3 * n_grp + 3) // 4 THEN cents END)
        |          AS q3
        |      FROM cdf GROUP BY 1)
        |SELECT h.event_type, f.n, f.q1 AS q1_cents, f.q3 AS q3_cents,
        |  f.q3 - f.q1 AS iqr_cents,
        |  CAST(SUM(CASE WHEN h.cents * 2 < f.q1 * 2 - (f.q3 - f.q1) * 3
        |    THEN h.c ELSE 0 END) AS BIGINT) AS n_low_outliers,
        |  CAST(SUM(CASE WHEN h.cents * 2 > f.q3 * 2 + (f.q3 - f.q1) * 3
        |    THEN h.c ELSE 0 END) AS BIGINT) AS n_high_outliers
        |FROM h JOIN f USING (event_type)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY event_type""".stripMargin,
    "q244_ks_drift" ->
      """WITH o AS (SELECT
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    epoch_us(o_orderdate) AS us FROM orders),
        |b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM o),
        |c AS (SELECT cents,
        |    CAST(SUM(CASE WHEN us <= (lo + hi) // 2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN us <= (lo + hi) // 2
        |      THEN 0 ELSE 1 END) AS BIGINT) AS n2
        |  FROM o, b GROUP BY 1),
        |t AS (SELECT CAST(SUM(n1) AS BIGINT) AS tn1,
        |    CAST(SUM(n2) AS BIGINT) AS tn2 FROM c),
        |cum AS (SELECT cents,
        |    CAST(SUM(n1) OVER (ORDER BY cents) AS BIGINT) AS c1,
        |    CAST(SUM(n2) OVER (ORDER BY cents) AS BIGINT) AS c2 FROM c),
        |d AS (SELECT cents, tn1, tn2,
        |    ABS(CAST(c1 AS HUGEINT) * CAST(tn2 AS HUGEINT)
        |      - CAST(c2 AS HUGEINT) * CAST(tn1 AS HUGEINT)) AS d_num
        |  FROM cum, t)
        |SELECT tn1 AS n1, tn2 AS n2, CAST(d_num AS BIGINT) AS d_num,
        |  cents AS at_cents,
        |  CAST(d_num AS DOUBLE)
        |    / (CAST(tn1 AS DOUBLE) * CAST(tn2 AS DOUBLE)) AS ks
        |FROM d ORDER BY d_num DESC, cents DESC LIMIT 1""".stripMargin,
    "q245_gini_purity" ->
      """WITH cells AS (SELECT isodow(ts) AS dow, event_type,
        |    COUNT(*) AS cnt FROM events GROUP BY 1, 2)
        |SELECT CAST(dow AS BIGINT) AS dow,
        |  CAST(SUM(cnt) AS BIGINT) AS n,
        |  CAST(SUM(cnt * cnt) AS BIGINT) AS ssq,
        |  CAST(SUM(cnt) * SUM(cnt) - SUM(cnt * cnt) AS DOUBLE)
        |    / CAST(SUM(cnt) * SUM(cnt) AS DOUBLE) AS gini
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin,
    "q229_observed_metrics" ->
      """SELECT COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS gross,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_open
        |FROM orders""".stripMargin,
    "q230_stat_crosstab" ->
      """SELECT event_type,
        |  CAST(SUM(CASE WHEN isodow(ts) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dow_1,
        |  CAST(SUM(CASE WHEN isodow(ts) = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dow_2,
        |  CAST(SUM(CASE WHEN isodow(ts) = 3 THEN 1 ELSE 0 END) AS BIGINT) AS dow_3,
        |  CAST(SUM(CASE WHEN isodow(ts) = 4 THEN 1 ELSE 0 END) AS BIGINT) AS dow_4,
        |  CAST(SUM(CASE WHEN isodow(ts) = 5 THEN 1 ELSE 0 END) AS BIGINT) AS dow_5,
        |  CAST(SUM(CASE WHEN isodow(ts) = 6 THEN 1 ELSE 0 END) AS BIGINT) AS dow_6,
        |  CAST(SUM(CASE WHEN isodow(ts) = 7 THEN 1 ELSE 0 END) AS BIGINT) AS dow_7
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // q346: same grid, band granularity, window-argmax mirror
    "q346_drift_band_attribution" ->
      """WITH e AS (SELECT CAST(DATE_TRUNC('week', ts) AS DATE) AS week,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 1000
        |      AS band
        |  FROM events),
        |wk AS (SELECT week, band, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS gb FROM e GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM e),
        |nw AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS nw
        |       FROM e GROUP BY 1),
        |grid AS (SELECT w.week, g.band, g.gb, COALESCE(wk.n, 0) AS n
        |  FROM (SELECT DISTINCT week FROM e) w
        |  CROSS JOIN g
        |  LEFT JOIN wk ON wk.week = w.week AND wk.band = g.band),
        |d AS (SELECT grid.week, grid.band, grid.n, grid.gb, nw.nw, nt.nn,
        |        ABS(CAST(grid.n AS HUGEINT) * nt.nn
        |            - CAST(grid.gb AS HUGEINT) * nw.nw) AS gap
        |      FROM grid JOIN nw ON nw.week = grid.week, nt),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY week
        |        ORDER BY gap DESC, band DESC) AS rn FROM d)
        |SELECT week, band AS top_band,
        |  CAST(n AS DOUBLE) / nw AS week_share,
        |  CAST(gb AS DOUBLE) / nn AS global_share
        |FROM r WHERE rn = 1
        |ORDER BY week""".stripMargin,
    // q341: plain-window mirror of the grid CDFs; same cross-products
    "q341_weekly_drift" ->
      """WITH e AS (SELECT CAST(DATE_TRUNC('week', ts) AS DATE) AS week,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |wk AS (SELECT week, cents, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |gc AS (SELECT cents, COUNT(*) AS g FROM e GROUP BY 1),
        |gcum AS (SELECT cents,
        |    SUM(g) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cg
        |  FROM gc),
        |grid AS (SELECT w.week, g.cents, g.cg, COALESCE(wk.n, 0) AS n
        |  FROM (SELECT DISTINCT week FROM e) w
        |  CROSS JOIN gcum g
        |  LEFT JOIN wk ON wk.week = w.week AND wk.cents = g.cents),
        |cw AS (SELECT *, SUM(n) OVER (PARTITION BY week ORDER BY cents
        |        ROWS UNBOUNDED PRECEDING) AS cw FROM grid),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM e),
        |nw AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS n_week
        |       FROM e GROUP BY 1),
        |d AS (SELECT cw.week, cw.cents,
        |        ABS(CAST(cw.cw AS HUGEINT) * nt.nn
        |            - CAST(cw.cg AS HUGEINT) * nw.n_week) AS d_num,
        |        nw.n_week, nt.nn
        |      FROM cw JOIN nw ON nw.week = cw.week, nt),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY week
        |        ORDER BY d_num DESC, cents DESC) AS rn FROM d)
        |SELECT week, n_week, cents AS at_cents,
        |  CAST(CAST(d_num AS VARCHAR) AS DOUBLE)
        |    / (CAST(n_week AS DOUBLE) * CAST(nn AS DOUBLE)) AS ks
        |FROM r WHERE rn = 1
        |ORDER BY week""".stripMargin,
    // q330: exact integer cross-products; HUGEINT-via-VARCHAR casts
    "q330_t_closeness" ->
      """WITH c AS (SELECT c_nationkey,
        |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    c_mktsegment AS seg FROM customer),
        |gs AS (SELECT c_nationkey, bal_band, seg, COUNT(*) AS n_gs
        |       FROM c GROUP BY 1, 2, 3),
        |g AS (SELECT c_nationkey, bal_band,
        |        CAST(SUM(n_gs) AS BIGINT) AS n_g
        |      FROM gs GROUP BY 1, 2),
        |s AS (SELECT seg, CAST(SUM(n_gs) AS BIGINT) AS n_s
        |      FROM gs GROUP BY 1),
        |tt AS (SELECT CAST(SUM(n_s) AS BIGINT) AS nn FROM s),
        |grid AS (SELECT g.c_nationkey, g.bal_band, g.n_g, s.seg, s.n_s,
        |           COALESCE(gs.n_gs, 0) AS n_gs
        |         FROM g CROSS JOIN s
        |         LEFT JOIN gs ON gs.c_nationkey = g.c_nationkey
        |           AND gs.bal_band = g.bal_band AND gs.seg = s.seg),
        |agg AS (SELECT c_nationkey, bal_band, MAX(n_g) AS n,
        |          SUM(ABS(CAST(n_gs AS HUGEINT) * tt.nn
        |              - CAST(n_s AS HUGEINT) * n_g)) AS tvd_num,
        |          MAX(tt.nn) AS nn2
        |        FROM grid, tt GROUP BY 1, 2)
        |SELECT c_nationkey, bal_band, n,
        |  CAST(CAST(tvd_num AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(n AS HUGEINT) * nn2 * 2 AS VARCHAR) AS DOUBLE)
        |    AS tvd,
        |  CAST(CAST(tvd_num AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(n AS HUGEINT) * nn2 * 2 AS VARCHAR) AS DOUBLE)
        |    > 0.25 AS violates_t
        |FROM agg
        |ORDER BY c_nationkey, bal_band""".stripMargin,
    "q209_l_diversity" ->
      """SELECT c_nationkey,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |  COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
        |FROM customer
        |GROUP BY 1, 2
        |HAVING COUNT(DISTINCT c_mktsegment) < 3
        |ORDER BY c_nationkey, bal_band""".stripMargin,
    "q207_distribution_drift" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev),
        |c AS (SELECT event_type,
        |    CAST(SUM(CASE WHEN us <= (lo + hi) // 2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        |    CAST(SUM(CASE WHEN us <= (lo + hi) // 2
        |      THEN 0 ELSE 1 END) AS BIGINT) AS n_second
        |  FROM ev, b GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_first) AS BIGINT) AS t1,
        |    CAST(SUM(n_second) AS BIGINT) AS t2 FROM c),
        |d AS (SELECT event_type, n_first, n_second,
        |    ABS(n_first * t2 - n_second * t1) AS drift_num, t1, t2
        |  FROM c, t),
        |n AS (SELECT CAST(SUM(drift_num) AS BIGINT) AS num FROM d)
        |SELECT event_type, n_first, n_second, drift_num,
        |  CAST(num AS DOUBLE) / CAST(2 * t1 * t2 AS DOUBLE) AS tvd
        |FROM d, n ORDER BY event_type""".stripMargin,
    "q193_behavior_segments" ->
      """WITH mx AS (SELECT MAX(ts) AS mx FROM events),
        |s AS (SELECT user_id,
        |    ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT event_type)), ',')
        |      AS segment
        |  FROM events, mx WHERE ts >= mx.mx - INTERVAL 7 DAY
        |  GROUP BY 1)
        |SELECT segment, COUNT(*) AS n_users
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q184_replica_bucket_diff" ->
      s"""WITH a AS (SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |b AS (SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 5000 = 0 THEN cents + 100
        |         ELSE cents END AS cents
        |  FROM a WHERE o_orderkey % 7777 <> 0),
        |sa AS (${bucketDiffSideSql.replace("?SRC", "a").replace("?", "a")}),
        |sb AS (${bucketDiffSideSql.replace("?SRC", "b").replace("?", "b")})
        |SELECT COALESCE(sa.bucket, sb.bucket) AS bucket,
        |  n_a, x_a, s_a, n_b, x_b, s_b
        |FROM sa FULL OUTER JOIN sb ON sa.bucket = sb.bucket
        |WHERE (n_a IS DISTINCT FROM n_b) OR (x_a IS DISTINCT FROM x_b)
        |   OR (s_a IS DISTINCT FROM s_b)
        |ORDER BY bucket""".stripMargin,
    "q181_zonemap_skip" ->
      """SELECT l_orderkey // 4096 AS chunk_id,
        |  MIN(l_shipdate) AS min_sd, MAX(l_shipdate) AS max_sd,
        |  COUNT(*) AS n_rows,
        |  (MAX(l_shipdate) < DATE '1995-01-01'
        |   OR MIN(l_shipdate) > DATE '1995-12-31') AS skipped
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q182_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |  COUNT(*) AS n
        |FROM customer
        |GROUP BY 1, 2, 3
        |HAVING COUNT(*) < 5
        |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin,
    "q175_venn_overlap" ->
      """WITH mx AS (SELECT MAX(ts) AS mx FROM events),
        |m AS (SELECT user_id,
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    + MAX(CASE WHEN event_type = 'view' THEN 2 ELSE 0 END)
        |    + MAX(CASE WHEN event_type = 'purchase' THEN 4 ELSE 0 END)
        |      AS mask
        |  FROM events, mx WHERE ts >= mx.mx - INTERVAL 7 DAY
        |  GROUP BY 1)
        |SELECT mask, mask & 1 > 0 AS clicked, mask & 2 > 0 AS viewed,
        |  mask & 4 > 0 AS purchased, COUNT(*) AS n_users
        |FROM m WHERE mask > 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q162_spearman_correlation" ->
      """WITH m AS (SELECT o_custkey AS key, COUNT(*) AS freq,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT key,
        |    ROW_NUMBER() OVER (ORDER BY freq, key) AS rk_freq,
        |    ROW_NUMBER() OVER (ORDER BY cents, key) AS rk_spend
        |  FROM m)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  1.0 - CAST(CAST(6 * SUM(CAST(rk_freq - rk_spend AS HUGEINT)
        |          * (rk_freq - rk_spend)) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(COUNT(*) AS HUGEINT) * (CAST(COUNT(*) AS HUGEINT)
        |          * COUNT(*) - 1) AS VARCHAR) AS DOUBLE) AS spearman_rho
        |FROM r""".stripMargin,
    "q161_ab_test_readout" ->
      s"""WITH u AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      * 5 > COUNT(*) AS BIGINT) AS converted
        |  FROM events GROUP BY 1),
        |v AS (SELECT ${phashSql("CAST(user_id AS VARCHAR)")} % 2 AS variant,
        |        converted FROM u),
        |a AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
        |        CAST(SUM(converted) AS BIGINT) AS n_conv FROM v GROUP BY 1)
        |SELECT a0.n_users AS n0, a0.n_conv AS c0,
        |  a1.n_users AS n1, a1.n_conv AS c1,
        |  CAST(a0.n_conv AS DOUBLE) / CAST(a0.n_users AS DOUBLE)
        |    AS rate_control,
        |  CAST(a1.n_conv AS DOUBLE) / CAST(a1.n_users AS DOUBLE)
        |    AS rate_treatment,
        |  CASE WHEN a0.n_conv + a1.n_conv > 0
        |        AND a0.n_conv + a1.n_conv < a0.n_users + a1.n_users THEN
        |  (CAST(a1.n_conv AS DOUBLE) / CAST(a1.n_users AS DOUBLE)
        |   - CAST(a0.n_conv AS DOUBLE) / CAST(a0.n_users AS DOUBLE))
        |  / SQRT(
        |      CAST(a0.n_conv + a1.n_conv AS DOUBLE)
        |        / CAST(a0.n_users + a1.n_users AS DOUBLE)
        |      * (1.0 - CAST(a0.n_conv + a1.n_conv AS DOUBLE)
        |          / CAST(a0.n_users + a1.n_users AS DOUBLE))
        |      * (1.0 / CAST(a0.n_users AS DOUBLE)
        |         + 1.0 / CAST(a1.n_users AS DOUBLE))) END AS z_score
        |FROM (SELECT * FROM a WHERE variant = 0) a0,
        |     (SELECT * FROM a WHERE variant = 1) a1""".stripMargin,
    "q157_join_fanout_profile" ->
      """WITH l AS (SELECT user_id, COUNT(*) AS n_left FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |r AS (SELECT user_id, COUNT(*) AS n_right FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT l.user_id, l.n_left, r.n_right,
        |  l.n_left * r.n_right AS fanout
        |FROM l JOIN r USING (user_id)
        |ORDER BY fanout DESC, user_id LIMIT 20""".stripMargin,
    "q159_diversity_index" ->
      """WITH c AS (SELECT source, lang, COUNT(*) AS n_i
        |  FROM documents GROUP BY 1, 2),
        |a AS (SELECT source, CAST(SUM(n_i) AS BIGINT) AS n_docs,
        |    CAST(COUNT(*) AS BIGINT) AS n_langs,
        |    CAST(SUM(n_i * n_i) AS BIGINT) AS sum_sq
        |  FROM c GROUP BY 1)
        |SELECT source, n_docs, n_langs,
        |  CAST(n_docs * n_docs - sum_sq AS DOUBLE)
        |    / CAST(n_docs * n_docs AS DOUBLE) AS simpson_diversity
        |FROM a ORDER BY source""".stripMargin,
    "q153_bitmap_distinct" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(COUNT(DISTINCT user_id // 64) AS BIGINT) AS n_words
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the benford_p literals are the SAME Scala doubles the plan uses
    "q154_benford_digits" ->
      s"""WITH d AS (SELECT CAST(SUBSTRING(
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
        |    AS BIGINT) AS digit FROM orders),
        |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
        |e(digit, benford_p) AS (VALUES ${benfordP.map { case (d, p) =>
          // E-notation forces DuckDB to parse the literal as DOUBLE
          // directly; a plain decimal literal would round-trip through
          // DECIMAL and double-round off by one ulp
          s"(CAST($d AS BIGINT), CAST(${p}e0 AS DOUBLE))" }.mkString(",\n|  ")})
        |SELECT c.digit, c.n,
        |  CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
        |  e.benford_p,
        |  CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) - e.benford_p AS delta
        |FROM c JOIN e USING (digit), t ORDER BY c.digit""".stripMargin,
    "q155_gini_concentration" ->
      """WITH rev AS (SELECT o_custkey AS key,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT key, cents,
        |    ROW_NUMBER() OVER (ORDER BY cents, key) AS rk FROM rev)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(2 * SUM(CAST(rk AS HUGEINT) * cents) AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(COUNT(*) * SUM(CAST(cents AS HUGEINT)) AS VARCHAR)
        |        AS DOUBLE)
        |  - CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS gini
        |FROM r""".stripMargin,
    "q150_chi_square" ->
      """WITH cells AS (SELECT event_type, ISODOW(ts) AS isodow,
        |    COUNT(*) AS observed
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(SUM(observed) AS BIGINT) AS rt
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT isodow, CAST(SUM(observed) AS BIGINT) AS ct
        |       FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cells)
        |SELECT c.event_type, c.isodow, c.observed,
        |  CAST(rt.rt * ct.ct AS DOUBLE) / CAST(t.n AS DOUBLE) AS expected,
        |  (CAST(c.observed AS DOUBLE)
        |     - CAST(rt.rt * ct.ct AS DOUBLE) / CAST(t.n AS DOUBLE))
        |  * (CAST(c.observed AS DOUBLE)
        |     - CAST(rt.rt * ct.ct AS DOUBLE) / CAST(t.n AS DOUBLE))
        |  / (CAST(rt.rt * ct.ct AS DOUBLE) / CAST(t.n AS DOUBLE))
        |    AS chi2_cell
        |FROM cells c
        |JOIN rt USING (event_type) JOIN ct USING (isodow), t
        |ORDER BY c.event_type, c.isodow""".stripMargin,
    "q136_duplicate_keys" -> primaryKeys.map { case (t, keyCols) =>
      val keys = keyCols.mkString(", ")
      s"""SELECT '$t' AS table_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_keys,
         |  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
         |    AS n_dup_rows
         |FROM (SELECT $keys, COUNT(*) AS c FROM $t GROUP BY $keys)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name"),
    "q126_expectation_suite" ->
      """WITH a AS (SELECT
        |    COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN NOT COALESCE(l_quantity >= 0 AND l_quantity <= 100,
        |      FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
        |    CAST(SUM(CASE WHEN NOT COALESCE(l_extendedprice > 0,
        |      FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
        |    CAST(SUM(CASE WHEN NOT COALESCE(l_discount >= 0 AND l_discount <= 0.5,
        |      FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc,
        |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS bad_ship,
        |    CAST(SUM(CASE WHEN NOT COALESCE(l_returnflag IN ('A','N','R'),
        |      FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS bad_flag
        |  FROM lineitem)
        |SELECT rule, n AS n_checked, n_violations, n_violations = 0 AS passed
        |FROM (SELECT n, 'quantity_in_range' AS rule, bad_qty AS n_violations FROM a
        |      UNION ALL SELECT n, 'price_positive', bad_price FROM a
        |      UNION ALL SELECT n, 'discount_in_range', bad_disc FROM a
        |      UNION ALL SELECT n, 'shipdate_present', bad_ship FROM a
        |      UNION ALL SELECT n, 'flag_in_domain', bad_flag FROM a)
        |ORDER BY rule""".stripMargin,
    "q127_referential_integrity" ->
      """SELECT 'lineitem.orderkey->orders' AS fk_edge,
        |  CAST(COUNT(*) FILTER (WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |    AS BIGINT) AS n_orphans
        |FROM lineitem l
        |UNION ALL
        |SELECT 'lineitem.partkey->part',
        |  CAST(COUNT(*) FILTER (WHERE NOT EXISTS
        |    (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
        |FROM lineitem l
        |UNION ALL
        |SELECT 'lineitem.suppkey->supplier',
        |  CAST(COUNT(*) FILTER (WHERE NOT EXISTS
        |    (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
        |FROM lineitem l
        |UNION ALL
        |SELECT 'orders.custkey->customer',
        |  CAST(COUNT(*) FILTER (WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        |FROM orders o
        |ORDER BY fk_edge""".stripMargin,
    "q98_table_checksums" -> checksumCols.map { case (t, cols) =>
      s"""SELECT '$t' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  BIT_XOR(${rowKeySql(cols)}) AS xor_hash,
         |  CAST(SUM(${rowKeySql(cols)} % ${P}) AS BIGINT) AS sum_hash
         |FROM $t""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name"),
    "q100_profile_documents" -> profiled.map { c =>
      s"""SELECT '$c' AS column_name,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  MIN(LENGTH(CAST($c AS VARCHAR))) AS min_len,
         |  MAX(LENGTH(CAST($c AS VARCHAR))) AS max_len
         |FROM documents""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name"))
}
