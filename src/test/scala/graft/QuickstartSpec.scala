package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-test for README.md's Quickstart: every call the README shows a
  * new user must actually compile and return rows against a stock
  * corpus dir, so the quickstart can never drift from the library
  * surface. Mirrors the README block line for line (only the corpus
  * dir and master differ — tests share the suite session). */
class QuickstartSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  private val sf = "/root/testdata/sf0.001"

  test("README quickstart: named gated queries run by name") {
    assert(SparkEntry.queries("q31_minhash_lsh")(spark, sf).columns.nonEmpty)
    assert(SparkEntry.queries("q35_knn_bruteforce")(spark, sf).count() > 0)
  }

  test("README quickstart: operator modules callable as library functions") {
    assert(ops.Relational.argmaxPerDay(spark, sf).count() > 0)
    assert(dedup.Dedup.minhashLsh(spark, sf).columns.nonEmpty)
    assert(sim.Similarity.knnBruteForce(spark, sf).count() > 0)
    val out = java.nio.file.Files
      .createTempDirectory("graft_quickstart_corpus").toString
    try assert(ops.Pipeline.prepareCorpus(spark, sf, out).count() > 0)
    finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(out))
    }
  }

  test("README quickstart: native SQL functions resolve in plain SQL") {
    val rows = spark.sql(s"""
      SELECT doc_id, simhash32(phash_array(split(trim(text), ' +'))) AS fp
      FROM parquet.`$sf/documents.parquet` LIMIT 5""").collect()
    assert(rows.length == 5 && rows.forall(!_.isNullAt(1)))
  }
}
