package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Pipeline

/** End-to-end corpus-build specs: the operator COMPOSITION contracts
  * that no single-query oracle covers — survivor accounting across
  * stages, exclusion guarantees, and rerun determinism of the written
  * artifact. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  private val sf = "/root/testdata/sf0.001"
  private val out = s"${sys.props("java.io.tmpdir")}/graft_corpus_build"

  private lazy val summary = Pipeline.prepareCorpus(spark, sf, out).collect()
  private lazy val corpus = spark.read.parquet(out)

  test("build emits all three splits with the 8/1/1 hash rule") {
    assert(summary.map(_.getString(0)).toSeq.sorted === Seq("test", "train", "val"))
    val n = summary.map(_.getLong(1)).sum
    assert(n > 0)
    // every written doc is in exactly the split its hash dictates —
    // recompute the rule over the artifact
    val wrong = corpus.withColumn("eb",
        Tables.phash(col("doc_id").cast("string")) % 10)
      .filter(
        (col("eb") < 8 && col("split") =!= "train") ||
        (col("eb") === 8 && col("split") =!= "val") ||
        (col("eb") === 9 && col("split") =!= "test"))
    assert(wrong.count() === 0L)
  }

  test("no bench-slice or contaminated doc survives the build") {
    assert(corpus.filter(col("doc_id") % 20 === 0).count() === 0L)
    val contaminated = Pipeline.decontaminate(spark, sf).select(col("doc_id"))
    assert(corpus.join(contaminated, Seq("doc_id"), "left_semi").count() === 0L)
  }

  test("survivors are canonical and cluster-minimal (dedup contracts hold)") {
    // no two survivors share normalized content
    val key = md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      .cast("binary"))
    val dupGroups = corpus.select(col("doc_id"), key.as("k"))
      .groupBy(col("k")).count().filter(col("count") > 1)
    assert(dupGroups.count() === 0L)
    // no survivor is a non-minimal member of a near-dup cluster
    val losers = graft.dedup.Dedup.dedupClusters(spark, sf)
      .filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
    assert(corpus.join(losers, Seq("doc_id"), "left_semi").count() === 0L)
  }

  test("rerun writes the identical corpus (deterministic artifact)") {
    val first = corpus.select(col("doc_id"), col("split"))
      .orderBy(col("doc_id")).collect().toSeq
    val out2 = s"${out}_rerun"
    Pipeline.prepareCorpus(spark, sf, out2)
    val second = spark.read.parquet(out2).select(col("doc_id"), col("split"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(first === second)
  }
}
