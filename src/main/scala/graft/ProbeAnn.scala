package graft

import org.apache.spark.sql.functions._

/** Reproducible probe for the IVF scale knob (SCALE.md): q389's
  * streaming semantic detector pays probe candidates proportional to
  * n_delta · n_corpus / k, so the FIXED k = 32 the oracle pins turns
  * the bucket join super-linear as the corpus grows. The production
  * answer is raising k with n at index-build time; this tool measures
  * that claim instead of asserting it — same detector code (the
  * probe half is [[graft.streaming.Streams.probeSemanticStreamIndexed]],
  * shared with the gate form — never forked), same corpus, different
  * k. Prints one JSON line per run:
  *
  *   {"dir":...,"k":K,"corpus_vecs":N,"delta_vecs":M,
  *    "build_s":...,"probe_s":...,"pairs":P}
  *
  * Regen recipe (all configs in ONE JVM so JIT/page-cache state is
  * shared and the lines are comparable; ProbeIngest's window caveat
  * applies across separate invocations):
  *   sbt "runMain graft.ProbeAnn heaps1 32 heaps10 32 heaps10 320"
  * (dirs resolve against /root/repo/testdata-local when relative)
  *
  * Note the pair SET is k-dependent by design (coarser k merges
  * buckets, finer k splits them — both the candidate generation and
  * the within-stream blocking move), exactly like re-banding an LSH
  * index: the knob trades recall shape for probe cost and retrains
  * nothing downstream. Only the k = 32 form is oracle-gated.
  */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val configs =
      if (args.isEmpty) Seq(("/root/testdata/sf0.1", 32))
      else args.grouped(2).map { g =>
        val d = if (g(0).contains("/")) g(0)
          else s"/root/repo/testdata-local/${g(0)}"
        (d, g.lift(1).map(_.toInt).getOrElse(32))
      }.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    configs.foreach { case (dir, k) =>
      val ix = graft.util.Scratch.indexDir("graft_probe_ann", dir)
      val v = sim.Similarity.vecs(spark, dir)
      val base = v.filter(col("vec_id") % 10 =!= 0)
      val nCorpus = base.count()
      val nDelta = v.filter(col("vec_id") % 10 === 0).count()
      val (_, buildS) = timed {
        sim.Similarity.saveIvfIndexOn(spark, base, ix, k)
      }
      val (pairs, probeS) = timed {
        streaming.Streams.probeSemanticStreamIndexed(spark, dir, ix).count()
      }
      println(
        s"""{"dir":"$dir","k":$k,"corpus_vecs":$nCorpus,"delta_vecs":$nDelta,""" +
        f""""build_s":$buildS%.3f,"probe_s":$probeS%.3f,"pairs":$pairs}""")
      GraftSession.dropStaleBlocks(spark)
    }
    spark.stop()
  }
}
