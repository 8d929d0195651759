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

  test("DataGen heaps mode grows vocabulary and keeps planted duplicates") {
    import org.apache.spark.sql.functions._
    val out = s"${sys.props("java.io.tmpdir")}/graft_heaps_spec_" +
      ProcessHandle.current().pid()
    // two corpus sizes a decade apart, documents only matter here
    tools.DataGen.generate(spark, s"$out/a", 0.1, heapsVocab = true)
    tools.DataGen.generate(spark, s"$out/b", 1.0, heapsVocab = true)
    def vocab(dir: String): Long =
      spark.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(col("text"), " ")).as("w"))
        .agg(countDistinct(col("w"))).head().getLong(0)
    val (va, vb) = (vocab(s"$out/a"), vocab(s"$out/b"))
    // Heaps' law with β≈0.5: 10× docs ⇒ ~√10 ≈ 3.2× vocabulary,
    // nowhere near the ~1× of the saturated fixed-vocab corpus
    assert(vb.toDouble / va > 2.0 && vb.toDouble / va < 5.0,
      s"vocab growth $va -> $vb outside the Heaps band")
    // planted exact pairs survive the vocab mode: doc 624 copies 623
    val docs = spark.read.parquet(s"$out/a/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id").isin(623L, 624L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs(623L) === docs(624L))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
