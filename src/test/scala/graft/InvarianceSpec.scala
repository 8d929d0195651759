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

  test("results are identical under an adversarial shuffle-partition count") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    queries.foreach { q =>
      val base = SparkEntry.queries(q)(spark, sf).collect().map(_.toString).sorted
      val other = SparkEntry.queries(q)(alt, sf).collect().map(_.toString).sorted
      assert(base.sameElements(other), s"$q result depends on shuffle layout")
    }
  }
}
