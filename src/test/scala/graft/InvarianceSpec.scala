package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout invariance: the library's determinism contract says
  * every query's RESULT is independent of the cluster's physical layout
  * (shuffle partition count, parallelism) — that is what makes hash
  * gates reproducible across refreshes and what lets the same code run
  * on local[8] and a 1000-executor cluster. This suite pins it by
  * re-running a representative query slice in a SIBLING session with an
  * adversarial `spark.sql.shuffle.partitions` (7 — coprime with the
  * default 8 and with every modulo used in bucketing) and comparing
  * collected results exactly.
  *
  * The slice deliberately crosses the machinery most at risk:
  * two-level no-global-sort rank/cumsum/ntile (q293/q303/q139/q292),
  * the mergeable sketch aggregate (q74), iterative label propagation
  * (q67), the float-sensitive exact-decimal rollups (q01), the
  * interval sweep (q325), weighted sampling (q117) and adaptive
  * salting (q322). */
class InvarianceSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  private val sf = "/root/testdata/sf0.001"

  private val queries = Seq(
    "q01_pricing_summary", "q67_dedup_clusters", "q74_cluster_minhash",
    "q117_weighted_sample", "q139_median_selection", "q292_quantile_normalize",
    "q293_abc_classification", "q303_budget_selection",
    "q322_adaptive_salted_join", "q325_peak_concurrency")

  /** Retry/speculation safety: at cluster scale a task can be
    * re-executed (stage retry, speculative duplicate) and its output
    * must be byte-identical — Spark only guarantees that when every
    * expression in the plan is deterministic. A single rand()/uuid()/
    * monotonically_increasing_id smuggled into a query would pass a
    * single-run hash gate yet corrupt results under retries. Walked on
    * the ANALYZED plan, so it covers expressions synthesized by
    * resolution, not just what the source spells. */
  private def assertRetrySafe(q: String,
      df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach { node =>
      node.expressions.foreach { e =>
        assert(e.deterministic,
          s"$q plan contains a nondeterministic expression " +
            s"(${e.getClass.getSimpleName}) — unsafe under task retry/speculation")
      }
    }

  test("results are identical under an adversarial shuffle-partition count") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    queries.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      assertRetrySafe(q, df)
      val base = df.collect().map(_.toString).sorted
      val other = SparkEntry.queries(q)(alt, sf).collect().map(_.toString).sorted
      assert(base.sameElements(other), s"$q result depends on shuffle layout")
    }
  }

  /** The round-9 additions (q282–q354) lean hardest on the
    * "bit-stable on any partition layout" claims — integer folds,
    * two-level no-global-sort ranks/cumsums, bucketed pair joins,
    * iterative graph rounds, derived sweep configs. One query per
    * distinct machinery family, re-run under TWO adversarial layouts:
    * a starved shuffle (3 partitions) with shattered input splits
    * (64 KiB maxPartitionBytes → every scan arrives in many small
    * partitions, so `spread`'s round-robin deals rows differently),
    * and an oversized shuffle (64 partitions — more reducers than
    * rows for the small aggregates, so empty partitions abound). */
  private val r9Queries = Seq(
    "q282_repeated_bigram_mass", "q283_simpson_diversity",
    "q284_semantic_dedup", "q285_incremental_dedup",
    "q288_mann_whitney", "q289_wasserstein_drift",
    "q294_decile_migration", "q302_pair_evidence",
    "q307_threshold_sweep", "q308_rare_trigram_rate",
    "q311_lsh_config_sweep", "q313_build_waterfall",
    "q318_dedup_loser_matrix", "q323_lsh_bucket_stats",
    "q327_cluster_hub", "q329_delta_ingest_report",
    "q333_interleave_order", "q334_interleaved_packing",
    "q341_weekly_drift", "q343_doc_lineage",
    "q345_degree_distribution", "q347_retention_whatif",
    "q352_asof_tolerance", "q353_propensity_labels",
    "q354_temporal_split_embargo",
    // round-10 additions: the shared per-source chunk-DF fragment
    "q355_source_boilerplate", "q356_template_scrub",
    // round-13 additions: paired-band fingerprints (decode must be
    // bit-stable under any input split), occupancy-derived candidate
    // counts, and the weighted bottom-k sample (merge-order law under
    // adversarial partition layouts)
    "q372_image_neardup_wide128", "q373_banding_audit",
    "q374_weighted_quantile_sketch",
    "q375_image_neardup_quad256", "q376_banding_audit256",
    "q377_priority_sample", "q378_stratified_priority_sample",
    // round-14 additions: the delta-vs-corpus media probes (banded
    // fingerprint join + per-delta verdict window must be bit-stable
    // on any layout; q380's persisted form is gated by its own spec)
    "q379_image_incremental_dedup", "q381_audio_incremental_dedup")

  test("round-9 families are layout-invariant (starved + oversized shuffle, shattered splits)") {
    val starved = spark.newSession()
    starved.conf.set("spark.sql.shuffle.partitions", "3")
    starved.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    val oversized = spark.newSession()
    oversized.conf.set("spark.sql.shuffle.partitions", "64")
    r9Queries.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      assertRetrySafe(q, df)
      val base = df.collect().map(_.toString).sorted
      val a = SparkEntry.queries(q)(starved, sf).collect().map(_.toString).sorted
      assert(base.sameElements(a), s"$q differs under starved shuffle + shattered splits")
      val b = SparkEntry.queries(q)(oversized, sf).collect().map(_.toString).sorted
      assert(base.sameElements(b), s"$q differs under oversized shuffle")
    }
  }
}
