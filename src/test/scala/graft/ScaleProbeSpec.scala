package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke pin for the scale-soak work probe (`graft.tools.ScaleProbe`,
  * the tool SCALE.md's work-vs-time analysis is built on). The probe
  * is main-only in production use; this spec keeps it compiling AND
  * keeps its internal consistency honest: the candidate-instance
  * count must bound its length-filtered subset, the emitted pair
  * families must be bounded by the candidate space, and the shingle
  * profile must cohere with the corpus.
  */
class ScaleProbeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  private val sf = "/root/testdata/sf0.001"

  test("probe cardinalities are internally consistent at sf0.001") {
    val m = tools.ScaleProbe.probe(spark, sf)
    assert(m("n_docs") > 0L)
    assert(m("distinct_shingles") > 0L)
    // instances count each doc's DISTINCT shingles once
    assert(m("shingle_instances") >= m("distinct_shingles"))
    assert(m("max_df") <= m("n_docs"))
    // the τ=0.5 length filter can only shrink the candidate set
    assert(m("cand_pair_instances_lenfiltered") <= m("cand_pair_instances"))
    // a qualifying pair shares >= 1 shingle, so every emitted family
    // is bounded by the DISTINCT candidate pair count, which is
    // itself bounded by the instance count
    assert(m("jaccard_edges_tau05") <= m("cand_pair_instances"))
    assert(m("containment_pairs_09") <= 2L * m("cand_pair_instances"))
    // Σ df = instances implies Σ C(df,2) <= instances * max_df / 2
    assert(m("cand_pair_instances") <= m("shingle_instances") * m("max_df") / 2L)
  }
}
