package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end operator specs over the sf0.001 corpus: structural
  * invariants that hold regardless of data values (the exact-value gate
  * is the driver's DuckDB crosscheck; these protect refactors between
  * rounds). */
class OperatorSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)
  private def run2(name: String, dir: String) = SparkEntry.queries(name)(spark, dir)

  private def rmTree(f: java.io.File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(rmTree)
    f.delete(): Unit
  }

  test("every registered query has an oracle and returns rows") {
    val qs = SparkEntry.queries
    val missing = qs.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    // entry() is the flagship smoke check
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("module registries never collide: the merged maps lose no keys") {
    // Map ++ silently overrides duplicate keys — a copy-pasted query
    // name in a second module would shadow the first and the shadowed
    // operator would drop out of the gate without any failure
    val qTotal = SparkEntry.modules.map(_._1.size).sum
    assert(qTotal === SparkEntry.queries.size,
      s"duplicate query names across modules: $qTotal registered, ${SparkEntry.queries.size} merged")
    val oTotal = SparkEntry.modules.map(_._2.size).sum
    assert(oTotal === SparkEntry.oracleSql.size,
      s"duplicate oracle names across modules: $oTotal registered, ${SparkEntry.oracleSql.size} merged")
  }

  test("globalRankNoSort == naive global row_number on negatives, ties, skew") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // adversarial shape: negative values (floor-vs-truncate bucketing
    // bug bait), one value repeated across bucket boundary widths, and
    // a skewed hot value
    val vals = (Seq.fill(500)(42L) ++ (-100L to 100L) ++
      Seq(-7L, -7L, 63L, 64L, 65L, Long.MinValue / (1L << 40))).zipWithIndex
    val df = vals.toDF("v", "id")
    val got = ops.Windows.globalRankNoSort(df, col("v"), col("id"),
        bucketWidth = 64L, rankOut = "rk", nOut = "n")
      .select(col("v"), col("id"), col("rk"), col("n"))
    val naive = df.withColumn("rk",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val mismatches = got.alias("g")
      .join(naive.alias("x"), Seq("v", "id"))
      .filter(col("g.rk") =!= col("x.rk")).count()
    assert(mismatches === 0)
    val n = vals.size.toLong
    assert(got.agg(min(col("n")), max(col("n"))).as[(Long, Long)].head()
      === ((n, n)))
  }

  test("q147's ntile split == Spark's ntile across remainder shapes") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // n % k of 0..3 all covered (n = 40..43), plus n < k (n = 3)
    for (n <- Seq(3, 40, 41, 42, 43)) {
      val df = (1 to n).map(i => (i.toLong * 7 % 97, i.toLong)).toDF("v", "id")
      val naive = df.withColumn("t",
        ntile(4).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      val got = ops.Windows.rfmNtileForTest(df, col("v"), col("id"), 4, 16L)
      val bad = got.alias("g").join(naive.alias("x"), Seq("v", "id"))
        .filter(col("g.t") =!= col("x.t")).count()
      assert(bad === 0, s"n=$n")
    }
  }

  test("argmax rows are real input rows (row membership)") {
    val top = run("q09_argmax_per_day")
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val bogus = top.join(orders, Seq("o_orderkey"))
      .filter(top("o_totalprice") =!= orders("o_totalprice"))
    assert(bogus.count() === 0)
  }

  test("exact dedup partitions the corpus: group sizes sum to row count") {
    val d = run("q30_exact_dedup")
    val total = Tables.load(spark, sf, "documents").count()
    assert(d.count() === total)
    // each group: exactly one canonical row, the min doc_id
    val perGroup = d.groupBy("dup_group")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canon"),
        min("doc_id").as("min_id"), first("dup_group").as("g"))
    assert(perGroup.filter(col("n_canon") =!= 1).count() === 0)
    assert(perGroup.filter(col("min_id") =!= col("g")).count() === 0)
  }

  test("minhash LSH pairs are ordered and estimates bounded in [0.5, 1]") {
    val p = run("q31_minhash_lsh")
    assert(p.filter(col("doc_a") >= col("doc_b")).count() === 0)
    assert(p.filter(col("est_jaccard") < 0.5 || col("est_jaccard") > 1.0)
      .count() === 0)
  }

  test("ngram jaccard finds the planted duplicates minhash estimates") {
    val exact = run("q33_ngram_jaccard").select("doc_a", "doc_b")
    // every exact-Jaccard>=0.5 pair should collide in at least one LSH
    // band with high probability at this signature size; sanity: exact
    // pair set is non-empty and symmetric-free
    assert(exact.count() > 0)
    assert(exact.filter(col("doc_a") >= col("doc_b")).count() === 0)
  }

  test("ppjoin prefix filter loses no pairs: q53 result == q33 result") {
    val full = run("q33_ngram_jaccard").collect().toSeq
    val pp = run("q53_ppjoin_jaccard").collect().toSeq
    assert(pp === full)
  }

  test("knn: rank 1..10 per query, no self-matches, cosine in [-1, 1]") {
    val k = run("q35_knn_bruteforce")
    assert(k.filter(col("neighbor_id") === col("query_id")).count() === 0)
    assert(k.filter(col("cosine") > 1.0001 || col("cosine") < -1.0001)
      .count() === 0)
    val ranks = k.groupBy("query_id").agg(
      min("rank").as("lo"), max("rank").as("hi"), count(lit(1)).as("n"))
    assert(ranks.filter(col("lo") =!= 1 || col("hi") =!= col("n")).count() === 0)
  }

  test("ann recall against brute force is high at this scale") {
    val bf = run("q35_knn_bruteforce").select("query_id", "neighbor_id")
    val ann = run("q36_ann_ivf").select("query_id", "neighbor_id")
    val nBf = bf.count().toDouble
    val hit = bf.intersect(ann).count().toDouble
    assert(nBf > 0)
    assert(hit / nBf >= 0.5, s"recall ${hit / nBf}") // nprobe=8 of k=32 lists
  }

  test("persisted text index probes byte-identically and prunes to query terms") {
    val idx = java.nio.file.Files.createTempDirectory("graft_text_idx").toString
    try {
      graft.text.TextAnalysis.saveTextIndex(spark, sf, idx)
      val fromIdx = graft.text.TextAnalysis.searchFromIndex(spark, idx)
      // the probe must reach only the query terms' partitions — a
      // partition filter on tok, not a data filter over the vocabulary
      val plan = fromIdx.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("PartitionFilters") && plan.contains("tok"), plan)
      assert(!plan.contains("PushedFilters: [In(tok"), plan)
      assert(fromIdx.collect().toSeq ===
        run("q108_inverted_search").collect().toSeq)
    } finally rmTree(new java.io.File(idx))
  }

  test("pareto frontier: no survivor is dominated, no dominator excluded") {
    val front = run("q120_pareto_frontier")
      .select("p_brand", "p_size", "p_partkey", "p_retailprice")
    val all = Tables.load(spark, sf, "part")
      .select(col("p_brand"), col("p_size"), col("p_partkey"),
        col("p_retailprice"))
    // naive quadratic dominance check — the definition, not the plan
    val dominated = all.alias("p").join(all.alias("q"),
      col("p.p_brand") === col("q.p_brand") &&
        col("q.p_partkey") =!= col("p.p_partkey") &&
        ((col("q.p_size") < col("p.p_size") &&
          col("q.p_retailprice") >= col("p.p_retailprice")) ||
         (col("q.p_size") <= col("p.p_size") &&
          col("q.p_retailprice") > col("p.p_retailprice"))),
      "left_semi")
    val naive = all.exceptAll(dominated)
      .orderBy(col("p_brand"), col("p_size"), col("p_partkey"))
      .collect().toSeq
    assert(naive.nonEmpty)
    assert(front.collect().toSeq === naive)
  }

  test("weighted sample overrepresents heavy docs vs the corpus") {
    val sample = run("q117_weighted_sample")
    val meanSampleW = sample.agg(avg(col("w"))).head().getDouble(0)
    val corpus = Tables.load(spark, sf, "documents")
      .select(least(expr("n_chars div 200") + 1, lit(8)).as("w"))
    val meanCorpusW = corpus.agg(avg(col("w"))).head().getDouble(0)
    info(f"mean weight: sample $meanSampleW%.2f corpus $meanCorpusW%.2f")
    // selection probability rises with w (pairwise w_i/(w_i+w_j)), so
    // the sampled mean weight must exceed the corpus mean on this
    // frozen fixture
    assert(meanSampleW > meanCorpusW)
    // and priorities are true minima: deterministic, re-run identical
    assert(sample.collect().toSeq === run("q117_weighted_sample").collect().toSeq)
  }

  test("bloom prune is lossless: q110 equals the plain join") {
    val pruned = run("q110_bloom_pruned_join").collect().toSeq
    val dim = Tables.load(spark, sf, "supplier")
      .filter(col("s_nationkey") === 3).select(col("s_suppkey"), col("s_name"))
    val plain = Tables.load(spark, sf, "lineitem")
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n"),
        Tables.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("s_name"))
      .collect().toSeq
    assert(plain.nonEmpty)
    assert(pruned === plain)
  }

  test("deletion-neighborhood blocking loses no edit-distance-1 pairs") {
    // q107's equi-join on deletion variants must equal the naive
    // theta-join it replaces — the SymSpell losslessness guarantee
    val blocked = run("q107_edit_distance_join").collect().toSeq
    val s = Tables.load(spark, sf, "supplier").select(col("s_name"))
    val naive = s.select(col("s_name").as("name_a"))
      .join(s.select(col("s_name").as("name_b")),
        col("name_a") < col("name_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
      .orderBy(col("name_a"), col("name_b"))
      .collect().toSeq
    assert(naive.nonEmpty)
    assert(blocked === naive)
  }

  test("deletion-neighborhood blocking: property test over random single edits") {
    // adversarial generator: strings + one random edit each
    // (insert / delete / substitute at a random position) — every such
    // pair has distance <= 1 and MUST be found by the blocked join
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefgh"
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = (1 to 40).map { i =>
      val base = s"w$i" + randStr(3 + rnd.nextInt(8))
      val pos = rnd.nextInt(base.length)
      val edited = rnd.nextInt(3) match {
        case 0 => base.substring(0, pos) + alpha(rnd.nextInt(alpha.length)) +
          base.substring(pos) // insert
        case 1 => base.substring(0, pos) + base.substring(pos + 1) // delete
        case _ => base.substring(0, pos) + alpha(rnd.nextInt(alpha.length)) +
          base.substring(pos + 1) // substitute
      }
      (base, edited)
    }
    import spark.implicits._
    val names = pairs.flatMap(p => Seq(p._1, p._2)).distinct.toDF("name")
    val found = graft.ops.Extended.editDistancePairs(names)
      .select("name_a", "name_b").collect()
      .map(r => Set(r.getString(0), r.getString(1))).toSet
    val expected = pairs.filter(p => p._1 != p._2)
      .map(p => Set(p._1, p._2)).toSet
    val missed = expected -- found
    assert(missed.isEmpty, s"blocking missed true pairs: $missed")
  }

  test("pq adc search: valid rank structure, no self-matches, fair recall") {
    val adc = run("q106_pq_adc_search")
    assert(adc.filter(col("neighbor_id") === col("query_id")).count() === 0)
    val ranks = adc.groupBy("query_id").agg(
      min("rank").as("lo"), max("rank").as("hi"), count(lit(1)).as("n"))
    assert(ranks.filter(col("lo") =!= 1 || col("hi") =!= col("n")).count() === 0)
    // ADC distances are squared-L2 to reconstructions: never negative
    assert(adc.filter(col("adc_dist") < 0.0).count() === 0)
    // ADC approximates exact L2 (distances to reconstructions), so the
    // recall baseline is the exact-L2 top-10 — NOT q35's cosine ranking,
    // which orders differently on unnormalized vectors by design.
    // Measured at sf0.01: at sf0.001, 16 of the 50 corpus vectors ARE
    // codewords (self-quantization error 0), which distorts ranks into
    // small-sample noise; at 500 vectors the random-overlap baseline is
    // ~0.02 and measured recall is ~0.2 — 10x above chance.
    val sfR = "/root/testdata/sf0.01"
    val adcR = run2("q106_pq_adc_search", sfR)
    val v = Tables.load(spark, sfR, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("l2"), col("vec_id"))
    val exact = broadcast(q).join(v, col("vec_id") =!= col("query_id"))
      .withColumn("l2", aggregate(zip_with(col("qe"), col("e"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (a, b) => a + b))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val nExact = exact.count().toDouble
    val hit = exact.intersect(adcR.select("query_id", "neighbor_id"))
      .count().toDouble
    info(f"pq-adc recall vs exact L2 at sf0.01: ${hit / nExact}%.3f")
    assert(nExact > 0)
    // untrained K=16 codebook is coarse by design — the pin is that PQ
    // codes carry real neighborhood signal against the metric they
    // actually approximate (vs ~0.02 random overlap at this corpus size)
    assert(hit / nExact >= 0.1, s"pq-adc recall ${hit / nExact}")
  }

  test("persisted IVF index probes byte-identically to the inline build") {
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    try {
      graft.sim.Similarity.saveIvfIndex(spark, sf, idx)
      // the index covers every corpus vector exactly once
      val assigned = spark.read.parquet(s"$idx/assign")
      assert(assigned.count() === Tables.load(spark, sf, "embeddings").count())
      assert(assigned.groupBy("vec_id").count()
        .filter(col("count") > 1).count() === 0)
      val fromIndex = graft.sim.Similarity.annIvfFromIndex(spark, sf, idx)
        .collect().toSeq
      val inline = run("q36_ann_ivf").collect().toSeq
      assert(fromIndex === inline)
    } finally rmTree(new java.io.File(idx))
  }

  test("trained IVF index recall is at least the hash-sample index recall") {
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_tr").toString
    try {
      val bf = run("q35_knn_bruteforce").select("query_id", "neighbor_id")
      val nBf = bf.count().toDouble
      def recallOf(idx: String): Double = {
        val ann = graft.sim.Similarity.annIvfFromIndex(spark, sf, idx)
          .select("query_id", "neighbor_id")
        bf.intersect(ann).count().toDouble / nBf
      }
      graft.sim.Similarity.saveIvfIndex(spark, sf, s"$base/hash")
      graft.sim.Similarity.saveIvfIndex(spark, sf, s"$base/trained",
        trained = true, trainIters = 2)
      val rHash = recallOf(s"$base/hash")
      val rTrained = recallOf(s"$base/trained")
      info(f"recall: hash-sample $rHash%.3f, trained $rTrained%.3f")
      assert(rTrained >= rHash,
        s"trained quantizer recall $rTrained < hash-sample recall $rHash")
      assert(rTrained > 0.0)
    } finally rmTree(new java.io.File(base))
  }

  test("Lloyd training monotonically improves the quantizer objective") {
    val k = 16
    val c0 = sim.Similarity.trainIvfCentroids(spark, sf, k, iters = 0)
    val c2 = sim.Similarity.trainIvfCentroids(spark, sf, k, iters = 2)
    assert(c0.count() === k && c2.count() === k)
    val o0 = sim.Similarity.quantizerObjective(spark, sf, c0)
    val o2 = sim.Similarity.quantizerObjective(spark, sf, c2)
    assert(o2 >= o0 - 1e-9,
      s"training worsened the spherical k-means objective: $o0 -> $o2")
    // NOTE: strict improvement is a property of the data (a hash-order
    // init can already be Lloyd-stable); monotonicity is the contract.
  }

  test("simhash band blocking is lossless: q79 equals the naive hamming filter") {
    val blocked = run("q79_simhash_neardup").collect().toSeq
    val fp = run("q32_simhash")
    val a = fp.select(col("doc_id").as("doc_a"), col("simhash").as("sha"))
    val b = fp.select(col("doc_id").as("doc_b"), col("simhash").as("shb"))
    val naive = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sha").bitwiseXOR(col("shb"))).cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b")).collect().toSeq
    assert(blocked === naive)
    assert(blocked.nonEmpty)
  }

  test("tiled exact pair join equals the naive all-pairs formulation") {
    val tiled = run("q34_embedding_neardup").collect().toSeq
    val v = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("n2", call_function("vec_dot", col("embedding"), col("embedding")))
    val a = v.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("n2").as("na"))
    val b = v.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("n2").as("nb"))
    val naive = a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        call_function("vec_dot", col("ea"), col("eb")) / sqrt(col("na") * col("nb")))
      .filter(col("cosine") >= 0.4)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b")).collect().toSeq
    assert(tiled === naive)
  }

  test("streaming hourly aggregation equals its batch twin exactly") {
    val stream = run("q40_stream_hourly").collect().toSeq
    val batch = run("q25_events_hourly").collect().toSeq
    assert(stream === batch)
  }

  test("session windows: no session shorter than 1 event or overlapping gap") {
    val s = run("q39_session_window")
    assert(s.filter(col("n_events") < 1).count() === 0)
    assert(s.filter(col("session_end") <= col("session_start")).count() === 0)
  }

  test("as-of join: every click row keeps user and clicks-only output") {
    val a = run("q37_asof_join")
    val clicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(a.count() === clicks)
  }

  test("dedup clusters: both ends of every near-dup pair share a cluster") {
    val clusters = run("q67_dedup_clusters")
      .select(col("doc_id"), col("cluster_id")).persist()
    val pairs = run("q33_ngram_jaccard").select(col("doc_a"), col("doc_b"))
    val split = pairs
      .join(clusters.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("cluster_id", "ca"), "doc_a")
      .join(clusters.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("cluster_id", "cb"), "doc_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(split === 0, "a near-dup pair was split across clusters")
    // cluster label is the minimum member id
    val badLabel = clusters.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("mn"))
      .filter(col("cluster_id") =!= col("mn")).count()
    assert(badLabel === 0)
    clusters.unpersist()
    ()
  }

  test("train split covers the corpus exactly once with an 8/1/1 shape") {
    val s = run("q69_train_split").collect()
    val total = Tables.load(spark, sf, "documents").count()
    assert(s.map(_.getLong(1)).sum === total)
    assert(s.map(_.getString(0)).sorted.toSeq === Seq("test", "train", "val"))
    val train = s.find(_.getString(0) == "train").get.getLong(1)
    assert(train > total / 2, "train must be the dominant split")
  }

  test("hash sample rows satisfy the bucket predicate and are stable") {
    val a = run("q68_hash_sample").collect().toSeq
    val b = run("q68_hash_sample").collect().toSeq // rerun: identical
    assert(a === b)
    assert(a.nonEmpty && a.size < 100) // ~5% of 500
  }

  test("decontamination never flags a benchmark doc") {
    val flagged = run("q70_decontaminate")
      .filter(col("doc_id") % 20 === 0).count()
    assert(flagged === 0)
    assert(run("q70_decontaminate").count() > 0) // planted dups overlap
  }

  test("connected components: star contraction labels a 200-deep chain (budget exceeded)") {
    import spark.implicits._
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    // budget 3 << diameter 199 forces the large-star/small-star path
    val cc = dedup.Dedup.connectedComponents(chain, propagationBudget = 3)
      .persist()
    assert(cc.count() === 200)
    assert(cc.filter(col("label") =!= 0L).count() === 0,
      "star contraction must label every chain node with the component min")
    assert(cc.filter(col("n_members") =!= 200L).count() === 0)
    // the two regimes agree when propagation IS allowed to converge
    val viaProp = dedup.Dedup.connectedComponents(chain, propagationBudget = 250)
      .orderBy("id").collect().toSeq
    assert(cc.orderBy("id").collect().toSeq === viaProp)
    cc.unpersist()
  }

  test("cluster minhash signature is the per-slot min over member signatures") {
    val sigs = Tables.spread(Tables.load(spark, sf, "documents"))
      .select(col("doc_id"), call_function("minhash_sig",
        call_function("phash_mod_array",
          call_function("word_shingles",
            split(trim(col("text")), " +"), lit(3)))).as("sig"))
    val got = run("q74_cluster_minhash").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val members = run("q67_dedup_clusters")
      .join(sigs, "doc_id")
      .select(col("cluster_id"), col("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).groupBy(_._1)
    assert(got.keySet === members.keySet)
    members.foreach { case (cid, ss) =>
      val expect = ss.map(_._2).reduce((x, y) =>
        x.zip(y).map { case (p, q) => math.min(p, q) })
      assert(got(cid)._1 === ss.size.toLong)
      assert(got(cid)._2 === expect.mkString(","))
    }
  }

  test("streaming foreachBatch fan-out lands every row in BOTH sinks, idempotently") {
    val base = java.nio.file.Files.createTempDirectory("graft-sfan").toString
    val n = Tables.load(spark, sf, "events").count()
    val b1 = streaming.Streams.streamFanOut(spark, sf,
      s"$base/parquet", s"$base/json", s"$base/ckpt")
    assert(b1 >= 1)
    assert(spark.read.parquet(s"$base/parquet").count() === n)
    assert(spark.read.json(s"$base/json").count() === n)
    // a SECOND run against the SAME checkpoint replays nothing new and
    // the by-batchId overwrite keeps both sinks duplicate-free
    val b2 = streaming.Streams.streamFanOut(spark, sf,
      s"$base/parquet", s"$base/json", s"$base/ckpt")
    assert(b2 === 0, s"checkpointed rerun replayed $b2 batches")
    assert(spark.read.parquet(s"$base/parquet").count() === n)
    assert(spark.read.json(s"$base/json").count() === n)
  }

  test("kafka source contract is pinned offline: format, options, projection") {
    // the surface a cluster-side run configures, asserted WITHOUT a
    // broker or connector jar — only .load() needs the jar
    assert(streaming.Streams.KafkaFormat === "kafka")
    val opts = streaming.Streams.kafkaOptions("broker1:9092,broker2:9092", "events")
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "events"))
    val proj = streaming.Streams.kafkaProjection
    assert(proj.size === 6)
    // each projection item must be valid SQL over the kafka source's
    // fixed schema, and together they must surface the six columns
    val parsed = proj.map(spark.sessionState.sqlParser.parseExpression)
    assert(parsed.nonEmpty)
    val outNames = proj.map(_.split(" AS ").last.trim)
    assert(outNames === Seq("key", "value", "topic", "partition", "offset", "timestamp"))
  }

  test("kafka source constructor builds the streaming plan when the connector is present") {
    try {
      val df = streaming.Streams.kafkaSource(spark, "localhost:9092", "events")
      assert(df.isStreaming)
      assert(df.columns.toSeq ===
        Seq("key", "value", "topic", "partition", "offset", "timestamp"))
    } catch {
      case e: Exception
          if String.valueOf(e.getMessage).contains("Failed to find data source: kafka") ||
            String.valueOf(e.getMessage).contains("KAFKA") =>
        cancel("spark-sql-kafka connector absent from the offline classpath " +
          "(zero-egress container); the constructor is the code path a cluster runs")
    }
  }

  test("stream joins are single-data-batch with bounded state (overhead is machinery, not plan)") {
    // the audit behind the bench's q73/q119 cost: if the AvailableNow
    // run needs >1 data micro-batch or holds state beyond the
    // watermark-bounded click/purchase rows, the PLAN is the problem;
    // otherwise the wall-clock floor is checkpoint WAL + sink commit
    // machinery, which a long-lived production stream amortizes
    val ev = Tables.events(spark, sf)
    val inputRows = ev.filter(col("event_type").isin("click", "purchase")).count()
    run("q73_stream_join").collect()
    val (b1, s1, ms1) = streaming.Streams.joinProfile("join", sf)
    info(s"q73: $b1 micro-batches, max state rows $s1, trigger ms $ms1")
    // AvailableNow on one source file: 1 data batch (+ possibly a
    // no-data batch that only advances the watermark)
    assert(b1 >= 1 && b1 <= 3, s"q73 ran $b1 micro-batches — plan re-batches")
    assert(s1 <= inputRows, s"q73 state $s1 exceeds watermark-bounded input $inputRows")
    run("q119_stream_outer_join").collect()
    val (b2, s2, ms2) = streaming.Streams.joinProfile("ojoin", sf)
    info(s"q119: $b2 micro-batches, max state rows $s2, trigger ms $ms2")
    assert(b2 >= 1 && b2 <= 3, s"q119 ran $b2 micro-batches — plan re-batches")
    assert(s2 <= inputRows, s"q119 state $s2 exceeds watermark-bounded input $inputRows")
  }

  test("stream-stream join equals its batch twin exactly") {
    val streamed = run("q73_stream_join")
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("value"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("interval 4 hours"))
      .groupBy(col("cu").as("user_id"))
      .agg(count(lit(1)).as("n_attributed"),
        Tables.dsum(col("value")).as("sum_value"))
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
    // the raw match stream lands in the checkpointed FILE sink, not on
    // the driver: the sink directory holds exactly the join's matches
    val (out, _) = streaming.Streams.streamJoinPaths(sf)
    val sunk = spark.read.parquet(out).count()
    val nMatches = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("interval 4 hours")).count()
    assert(sunk === nMatches && sunk > 0,
      s"file sink holds $sunk rows, expected $nMatches")
  }

  test("bucket-blocked near-dup pairs are a subset of the exact pairs (precision 1)") {
    // collect each small pair set ONCE (both plans hold quadratic joins)
    def pairs(q: String): Set[(Long, Long)] =
      run(q).select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("q34_embedding_neardup")
    val blocked = pairs("q99_semantic_neardup_ivf")
    // blocking prunes candidates but never misSCORES one: every emitted
    // pair must exist in the exact answer
    assert((blocked -- exact).isEmpty)
    val recall = blocked.size.toDouble / exact.size
    info(f"blocked recall vs exact: $recall%.3f (${blocked.size}/${exact.size})")
    assert(recall > 0.0) // same-bucket near-dups exist in the fixture
  }

  test("int8 quantization: codes bounded, error within half a quantization step") {
    val q = run("q101_quantize_int8")
      .withColumn("code_arr",
        split(col("codes"), ",").cast("array<long>"))
    // symmetric int8 range — never -128, the asymmetric edge
    val outOfRange = q.filter(exists(col("code_arr"),
      c => c > 127L || c < -127L))
    assert(outOfRange.count() === 0)
    // reconstruction error bound: |x - c/s| <= 0.5/s (+1 ulp headroom)
    val bad = q.filter(col("max_err") > (lit(0.5) / col("scale")) * 1.0000001)
    assert(bad.count() === 0)
    assert(q.filter(col("scale") <= 0.0).count() === 0)
  }

  test("pq encoding: M codes per vector, codebook-source vectors reconstruct exactly") {
    val q = run("q105_pq_encode")
      .withColumn("code_arr", split(col("codes"), ",").cast("array<long>"))
    // every vector carries exactly M=8 codes
    assert(q.filter(size(col("code_arr")) =!= 8).count() === 0)
    assert(q.filter(col("recon_err") < 0.0).count() === 0)
    // a vector whose subvectors ARE codewords (the 16 hash-order sample
    // vectors) must encode losslessly: its own codeword wins each
    // subspace with distance 0
    val zeroErr = q.filter(col("recon_err") === 0.0).count()
    assert(zeroErr >= 16, s"expected the 16 codebook sources lossless, got $zeroErr")
    // and most non-sample vectors should NOT be lossless (quantization
    // is lossy by nature)
    assert(q.filter(col("recon_err") > 0.0).count() > 0)
  }

  test("table checksums detect a one-row difference and are order-independent") {
    import spark.implicits._
    val base = run("q98_table_checksums").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(base.keySet === Set("lineitem", "orders", "customer", "documents",
      "events"))
    // order independence: a DIFFERENTLY-partitioned, reverse-sorted
    // replica of documents must fingerprint identically (XOR/mod-sum
    // are commutative monoids — re-running the same plan would only
    // test determinism, not this property)
    val docCols = Seq("doc_id", "text", "source")
    val replica = Tables.load(spark, sf, "documents")
      .repartition(7, col("source"))
      .sortWithinPartitions(col("doc_id").desc)
    val rep = replica.select(ops.Validate.rowKey(docCols).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)"), sum(col("h") % Tables.P)).head()
    assert((rep.getLong(0), rep.getLong(1), rep.getLong(2)) === base("documents"))
    // sensitivity: recompute the documents checksum with one doc's text
    // perturbed — all three of (count-same, xor, sum) must move
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("text", when(col("doc_id") === 1L,
        concat(col("text"), lit("X"))).otherwise(col("text")))
    val perturbed = docs.select(ops.Validate.rowKey(docCols).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"),
        sum(col("h") % Tables.P).as("s")).head()
    val (n0, x0, s0) = base("documents")
    assert(perturbed.getLong(0) === n0) // same cardinality...
    assert(perturbed.getLong(1) !== x0) // ...but both fingerprints move
    assert(perturbed.getLong(2) !== s0)
  }

  test("degree-ordered triangle orientation: the hub anchors no join fan-out") {
    import spark.implicits._
    // star: hub 0 with 60 leaves, plus leaf-leaf edges forming triangles
    val edges = ((1 to 60).map(i => (0L, i.toLong)) ++
      Seq((1L, 2L), (2L, 3L), (1L, 3L))).toDF("doc_a", "doc_b")
    val oriented = dedup.Dedup.orientByDegree(edges,
      dedup.Dedup.endpointDegrees(edges))
    // the hub has max degree, so EVERY star edge points INTO it: id
    // order would give the hub 60 out-edges and a 60x59 (a,b)x(b,c)
    // fan-out; degree order gives it zero
    assert(oriented.filter(col("src") === 0L).count() === 0L)
    val maxOut = oriented.groupBy(col("src")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxOut <= 3, s"oriented out-degree must stay O(sqrt(m)), got $maxOut")
    // triangle multiset unchanged by orientation: (0,1,2),(0,1,3),(0,2,3),(1,2,3)
    val tc = dedup.Dedup.triangleCountsFrom(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("watermark-bounded dedup uses state-bounded operator and matches exact dedup") {
    // the plan must carry DeduplicateWithinWatermark (state evicted as
    // the watermark advances), NOT the unbounded Deduplicate of q43
    val stream = streaming.Streams.dedupBoundedStream(spark, sf)
    val plan = stream.queryExecution.analyzed.toString
    assert(plan.contains("DeduplicateWithinWatermark"),
      s"expected state-bounded dedup operator in plan:\n$plan")
    // fixture has no cross-watermark duplicate -> equals the exact form
    val bounded = run("q97_stream_dedup_bounded").collect().toSeq
    val exact = run("q43_stream_dedup").collect().toSeq
    assert(bounded === exact)
  }

  test("k-core peel: pendant chain peels away over multiple rounds, core survives") {
    import spark.implicits._
    // triangle {1,2,3} with a 4-node pendant chain 3-4-5-6-7: each peel
    // round removes only the current chain endpoint, so convergence
    // takes several iterations (exercises the loop, not just round 1)
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)).toDF("a", "b")
    val sym = e.union(e.select(col("b"), col("a"))).toDF("src", "dst")
    val core = dedup.Dedup.kCorePeel(sym, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("forget cascade: purged + retained = total per table, cascade consistent") {
    val audit = run("q180_forget_cascade").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cust = Tables.load(spark, sf, "customer").count()
    val ord = Tables.load(spark, sf, "orders").count()
    val line = Tables.load(spark, sf, "lineitem").count()
    assert(audit("customer")._1 + audit("customer")._2 === cust)
    assert(audit("orders")._1 + audit("orders")._2 === ord)
    assert(audit("lineitem")._1 + audit("lineitem")._2 === line)
    // a forgotten customer with no orders is legal, but purged lineitems
    // without purged orders are not: the cascade must be top-down
    assert(audit("lineitem")._1 === 0L || audit("orders")._1 > 0L)
  }

  test("linear interpolation stays within its neighboring readings") {
    // for every filled row, v_interp must lie in [min(vp,vn), max(vp,vn)];
    // rows with a missing side stay null (no extrapolation)
    val df = run("q191_linear_interpolate")
    val filled = df.filter(col("v").isNull && col("v_interp").isNotNull)
    assert(filled.count() > 0, "dropout simulation must produce filled rows")
    // re-derive the neighbor bounds independently of the operator
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bounded = df
      .withColumn("vp", last(col("v"), ignoreNulls = true).over(wp))
      .withColumn("vn", first(col("v"), ignoreNulls = true).over(wn))
      .filter(col("v").isNull && col("v_interp").isNotNull)
      .filter(col("v_interp") < least(col("vp"), col("vn")) ||
        col("v_interp") > greatest(col("vp"), col("vn")))
    assert(bounded.count() === 0L)
  }

  test("top-N + OTHER loses no revenue: per-nation totals preserved") {
    val df = run("q192_topn_other")
    val fromQuery = df.groupBy(col("c_nationkey"))
      .agg(sum(col("spend")).as("s"), sum(col("n_customers")).as("n"))
    val direct = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey").as("key"))
      .agg(sum(Tables.d2(col("o_totalprice"))).as("sp"))
      .join(Tables.load(spark, sf, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("key") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("sp")).cast("double").as("s"), count(lit(1)).as("n"))
    val joined = fromQuery.alias("q").join(direct.alias("d"), "c_nationkey")
      .filter(col("q.n") =!= col("d.n") ||
        abs(col("q.s") - col("d.s")) > lit(1e-6))
    assert(joined.count() === 0L)
  }

  test("streaming merge is rerun-deterministic: two full runs agree exactly") {
    val a = run("q188_stream_merge").collect().toSeq
    val b = run("q188_stream_merge").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("pagerank: star hub outranks leaves, leaves tie, everyone keeps teleport mass") {
    import spark.implicits._
    // star: hub 0 <-> leaves 1..8. After any round count the hub must
    // hold strictly more mass than any leaf, all leaves identical by
    // symmetry, and nobody falls below the 0.15 teleport floor.
    val e = (1L to 8L).map(i => (0L, i)).toDF("a", "b")
    val sym = e.union(e.select(col("b"), col("a"))).toDF("src", "dst")
    val pr = dedup.Dedup.pageRankIterate(sym, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.size === 9)
    val hub = pr(0L); val leaves = (1L to 8L).map(pr)
    assert(leaves.distinct.size === 1, s"asymmetric leaves: $pr")
    assert(hub > leaves.head, s"hub $hub not above leaf ${leaves.head}")
    assert(pr.values.forall(_ >= 150000000L), s"below teleport floor: $pr")
  }

  test("label communities: two cliques joined by one bridge keep separate labels") {
    import spark.implicits._
    // K4 on {1..4} + K4 on {11..14} + bridge 4-11: frequency voting
    // must keep each clique on its own (minimum) label — the behavior
    // that distinguishes this from q67's connected components, which
    // would merge everything into one label.
    def k4(base: Long) = for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (base + i, base + j)
    val e = (k4(1L) ++ k4(11L) :+ (4L, 11L)).toDF("a", "b")
    val sym = e.union(e.select(col("b"), col("a"))).toDF("src", "dst")
    val lbl = dedup.Dedup.labelPropagate(sym, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = (1L to 4L).map(lbl).toSet
    val right = (11L to 14L).map(lbl).toSet
    assert(left.intersect(right).isEmpty,
      s"cliques merged across the bridge: $lbl")
  }

  test("linear attribution conserves revenue: credits sum to purchase cents exactly") {
    val credited = run("q204_linear_attribution")
      .agg(sum(col("credited_cents"))).collect()(0).getLong(0)
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum((Tables.d2(col("value")) * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(credited === purchases,
      s"credited $credited != purchase total $purchases")
  }

  test("dict encode: token counts match a direct recount, ids stay in-vocab") {
    val enc = run("q202_dict_encode")
    val direct = Tables.spread(Tables.load(spark, sf, "documents"))
      .select(col("doc_id"),
        size(split(trim(col("text")), " +")).cast("long").as("n_direct"))
    val vocabSize = Tables.spread(Tables.load(spark, sf, "documents"))
      .select(explode(split(trim(col("text")), " +")).as("t"))
      .agg(countDistinct(col("t"))).collect()(0).getLong(0)
    val bad = enc.join(direct, "doc_id")
      .filter(col("n_tokens") =!= col("n_direct") ||
        col("max_tid") > lit(vocabSize) || col("max_tid") < 1)
    assert(bad.count() === 0L)
  }

  test("bpe merge pairs: every candidate is a 2-char pair, counts descend") {
    val rows = run("q205_bpe_merge_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0).length === 2, r.toString))
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts === counts.sorted.reverse, s"not descending: $counts")
  }

  test("hard negatives: ranks 1..5, never the anchor, never the anchor's label") {
    val rows = run("q206_hard_negatives").collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(5)).toSeq.sorted === (1L to rs.length).toSeq)
      rs.foreach { r =>
        assert(r.getLong(2) !== q, s"self match for $q")
        assert(r.getInt(1) !== r.getInt(3), s"same-label negative for $q")
        val c = r.getDouble(4)
        assert(c >= -1.0000001 && c <= 1.0000001, s"cosine $c")
      }
    }
  }

  test("distribution drift: halves partition the stream, tvd bounded in [0,1]") {
    val d = run("q207_distribution_drift")
    val total = d.agg(sum(col("n_first") + col("n_second")))
      .collect()(0).getLong(0)
    assert(total === Tables.events(spark, sf).count())
    val tvds = d.select(col("tvd")).distinct().collect().map(_.getDouble(0))
    assert(tvds.length === 1, "tvd must be one corpus-level scalar")
    assert(tvds.head >= 0.0 && tvds.head <= 1.0, s"tvd ${tvds.head}")
  }

  test("session paths: every path step is a real event type, counts descend") {
    val types = Tables.events(spark, sf)
      .select(col("event_type")).distinct().collect()
      .map(_.getString(0)).toSet
    val rows = run("q208_session_paths").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      r.getString(0).split('>').foreach(s =>
        assert(types.contains(s), s"unknown step '$s' in ${r.getString(0)}"))
    }
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts === counts.sorted.reverse)
  }

  test("dedup agreement marginals reconcile with the q31/q33 pair sets") {
    val r = run("q211_dedup_agreement").collect()(0)
    val (both, lshOnly, exOnly) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(both + lshOnly === run("q31_minhash_lsh").count())
    assert(both + exOnly === run("q33_ngram_jaccard").count())
    // LSH banding can only MISS pairs vs the exact index after the
    // same >=0.5 estimate cut — both detectors gate on their own
    // scores, so precision/recall live in (0, 1]
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
  }

  test("trigram lm: support floor holds, ranks 1..k per context, counts descend in rank") {
    val rows = run("q210_trigram_lm").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 5, r.toString))
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to rs.length).toSeq)
      val ns = sorted.map(_.getLong(2)).toSeq
      assert(ns === ns.sorted.reverse)
    }
  }

  test("l-diversity: flagged groups have l < 3 and l never exceeds group size") {
    val rows = run("q209_l_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) < 3 && r.getLong(3) >= 1 &&
        r.getLong(3) <= r.getLong(2), r.toString)
    }
  }

  test("rank fusion: rrf recomputes from the component ranks, fused order descends") {
    val rows = run("q212_rank_fusion").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rc, rl, rrf) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(rrf === 1.0 / (60.0 + rc) + 1.0 / (60.0 + rl), r.toString)
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(5))
      assert(sorted.map(_.getLong(5)).toSeq === (1L to rs.length).toSeq)
      val scores = sorted.map(_.getDouble(4)).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  test("centroid affinity: all unordered label pairs exactly once, cosines bounded") {
    val rows = run("q213_centroid_affinity").collect()
    val labels = Tables.load(spark, sf, "embeddings")
      .select(col("label")).distinct().count()
    assert(rows.length === (labels * (labels - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), r.toString)
      val c = r.getDouble(2)
      assert(c >= -1.0000001 && c <= 1.0000001, r.toString)
    }
  }

  test("pipe-syntax and session-variable surfaces equal their DataFrame twins exactly") {
    assert(run("q214_pipe_syntax").collect().toSeq ===
      run("q01_pricing_summary").collect().toSeq)
    assert(run("q215_sql_variables").collect().toSeq ===
      run("q02_revenue_filter").collect().toSeq)
  }

  test("hits: on a directed star the center is the hub, leaves the authorities") {
    import spark.implicits._
    // 0 -> {1..6}: the center endorses every leaf. Hub mass must sit
    // on 0 (normalized to exactly SCALE), leaves must carry equal
    // authority and zero hub score, and the center zero authority.
    val e = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val r = dedup.Dedup.hitsIterate(e, rounds = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L)._1 === 1000000L && r(0L)._2 === 0L, r.toString)
    val leaves = (1L to 6L).map(r)
    assert(leaves.map(_._1).forall(_ === 0L), r.toString)
    assert(leaves.map(_._2).distinct.size === 1 &&
      leaves.head._2 === 1000000L, r.toString)
  }

  test("session skipgrams: superset of adjacent transitions, counts descend") {
    val rows = run("q217_session_skipgrams").collect()
    assert(rows.nonEmpty)
    val counts = rows.map(_.getLong(2)).toSeq
    assert(counts === counts.sorted.reverse)
    val types = Tables.events(spark, sf)
      .select(col("event_type")).distinct().collect()
      .map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(types.contains(r.getString(0)) && types.contains(r.getString(1)))
    }
  }

  test("dim stats: one row per dimension, full corpus counted, std non-negative") {
    val rows = run("q218_dim_stats").collect()
    val nVecs = Tables.load(spark, sf, "embeddings").count()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === nVecs, r.toString)
      assert(r.getDouble(3) >= 0.0, r.toString)
    }
  }

  test("knn label purity: purity is n_same/10 with n_same in 0..10") {
    val rows = run("q219_knn_label_purity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(2)
      assert(n >= 0 && n <= 10, r.toString)
      assert(r.getDouble(3) === n / 10.0, r.toString)
    }
  }

  test("sql-surfaces query reconciles with the flagship aggregate's groups") {
    val surf = run("q220_sql_surfaces").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val direct = run("q01_pricing_summary")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("count_order")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(surf === direct)
  }

  test("mixture plan: allocations sum to the budget exactly and T=2 flattens the head") {
    val rows = run("q221_mixture_plan").collect()
    assert(rows.map(_.getLong(3)).sum === 1000000L)
    assert(rows.forall(_.getLong(3) > 0))
    val totalMass = rows.map(_.getLong(1)).sum.toDouble
    val top = rows.maxBy(_.getLong(1))
    // sqrt weighting must give the heaviest source LESS than its
    // proportional share (that is the point of temperature smoothing)
    assert(top.getLong(3) / 1000000.0 < top.getLong(1) / totalMass + 1e-9,
      top.toString)
  }

  test("cross-source dup matrix is triangular and accounts for every q33 pair") {
    val rows = run("q222_cross_source_dups").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) <= r.getString(1), r.toString))
    assert(rows.map(_.getLong(2)).sum === run("q33_ngram_jaccard").count())
  }

  test("borda select: borda is the exact rank sum, output ascends") {
    val rows = run("q223_borda_select").collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getLong(5) === r.getLong(3) + r.getLong(4), r.toString))
    val bordas = rows.map(_.getLong(5)).toSeq
    assert(bordas === bordas.sorted)
  }

  test("modal behavior covers every user exactly once") {
    val total = run("q224_modal_behavior")
      .agg(sum(col("n_users"))).collect()(0).getLong(0)
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(total === users)
  }

  test("try_divide yields null on a zero denominator, value otherwise") {
    import spark.implicits._
    val r = Seq((10.0, 0L), (10.0, 4L)).toDF("x", "n")
      .selectExpr("try_divide(x, n) AS v").collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getDouble(0) === 2.5)
    // and the gated query keeps every day even when clicks are zero
    val days = run("q225_try_arithmetic").count()
    val direct = Tables.events(spark, sf)
      .select(to_date(col("ts"))).distinct().count()
    assert(days === direct)
  }

  test("keyset page 2 equals rows 11-20 of the full ordering") {
    val keyset = run("q226_keyset_pagination").collect().toSeq
    val full = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"),
        Tables.d2(col("c_acctbal")).as("bal"))
      .orderBy(col("bal").desc, col("c_custkey"))
      .limit(20).collect().drop(10)
      .map(r => (r.getLong(0), r.getString(1),
        r.getDecimal(2).doubleValue)).toSeq
    assert(keyset.map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))) === full)
  }

  test("lateral alias: avg_price is exactly gross over n") {
    run("q227_lateral_alias").collect().foreach { r =>
      assert(r.getDouble(2) === r.getDouble(1) / r.getLong(3), r.toString)
    }
  }

  test("crosstab rows sum to per-type totals; observed metrics match a recount") {
    val ct = run("q230_stat_crosstab").collect()
    val perType = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ct.foreach { r =>
      val s = (1 to 7).map(i => r.getLong(i)).sum
      assert(s === perType(r.getString(0)), r.toString)
    }
    val m = run("q229_observed_metrics").collect()(0)
    assert(m.getLong(0) === Tables.load(spark, sf, "orders").count())
  }

  test("SQL PIVOT/UNPIVOT clauses equal their DataFrame twins exactly") {
    assert(run("q231_sql_pivot").collect().toSeq ===
      run("q44_pivot").collect().toSeq)
    assert(run("q232_sql_unpivot").collect().toSeq ===
      run("q57_unpivot").collect().toSeq)
  }

  test("vocab update: sizes reconcile with direct era recounts, ids stay dense") {
    val r = run("q233_vocab_update").collect()(0)
    val toks = Tables.spread(Tables.load(spark, sf, "documents"))
      .select(col("doc_id"), explode(split(trim(col("text")), " +")).as("t"))
    val oldDistinct = toks.filter(col("doc_id") % 2 === 0)
      .select(col("t")).distinct()
    val nOld = oldDistinct.count()
    val nAdded = toks.filter(col("doc_id") % 2 =!= 0)
      .select(col("t")).distinct()
      .join(oldDistinct, Seq("t"), "left_anti").count()
    assert(r.getLong(0) === nOld)
    assert(r.getLong(1) === nAdded)
    // dense id space: max id == total vocabulary size (no holes)
    assert(r.getLong(2) === nOld + nAdded)
  }

  test("ann recall readout: hits bounded by k, recall in [0,1]") {
    val rows = run("q234_ann_recall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10, r.toString)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, r.toString)
    }
  }

  test("session distance: pair count is sessions minus users-with-sessions") {
    val nPairs = run("q235_session_distance")
      .agg(sum(col("n_pairs"))).collect()(0).getLong(0)
    // each user with s sessions contributes s-1 consecutive pairs
    val sessions = run("q167_session_stats")
      .agg(sum(col("n_sessions"))).collect()(0).getLong(0)
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(nPairs === sessions - users)
  }

  test("degree assortativity is a correlation: bounded, computed over every edge") {
    val r = run("q236_degree_assortativity").collect()(0)
    val edges = run("q33_ngram_jaccard").count() * 2
    assert(r.getLong(0) === edges)
    val a = r.getDouble(1)
    assert(a >= -1.0000001 && a <= 1.0000001, a.toString)
  }

  test("containment: asymmetric, bounded by 1, and catches every symmetric near-dup side") {
    val rows = run("q237_containment_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) !== r.getLong(1), r.toString)
      assert(r.getDouble(2) >= 0.9 && r.getDouble(2) <= 1.0 + 1e-12,
        r.toString)
    }
  }

  test("transitivity: exact integer counts, ratio bounded in [0,1]") {
    val r = run("q238_transitivity").collect()(0)
    assert(r.getLong(0) >= 0 && r.getLong(1) > 0)
    val t = r.getDouble(2)
    assert(t >= 0.0 && t <= 1.0, t.toString)
    // 3*triangles can never exceed the open-path count
    assert(3 * r.getLong(0) <= r.getLong(1))
  }

  test("pit features never leak: prior spend of a user's first purchase is 0") {
    val rows = run("q240_pit_features")
    // the first purchase per user (lowest prior_events among purchases)
    // must have prior_cents consistent with no leakage: every row's
    // prior totals are bounded by the user's eventual totals
    val feats = run("q239_feature_assembly")
      .select(col("user_id"), col("n_events"), col("monetary_cents"))
    val bad = rows.join(feats, "user_id")
      .filter(col("prior_events") >= col("n_events") ||
        col("prior_cents") > col("monetary_cents"))
    assert(bad.count() === 0L)
    // and one purchase per user is strictly before any purchase spend
    val firsts = rows.groupBy(col("user_id"))
      .agg(min(col("prior_cents")).as("m"))
    assert(firsts.filter(col("m") > 0).count() <
      firsts.count(), "some user must have a zero-prior first purchase")
  }

  test("feature assembly covers every user with sane recency") {
    val rows = run("q239_feature_assembly").collect()
    assert(rows.length === Tables.events(spark, sf)
      .select(col("user_id")).distinct().count().toInt)
    rows.foreach(r => assert(r.getLong(1) >= 0, r.toString))
  }

  test("bm25: every hit contains a query term, scores positive and descending") {
    val rows = run("q241_bm25_topk").collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse)
    assert(scores.forall(_ > 0.0))
    val hitIds = rows.map(_.getLong(0)).toSet
    val withTerm = Tables.spread(Tables.load(spark, sf, "documents"))
      .select(col("doc_id"), explode(split(trim(col("text")), " +")).as("t"))
      .filter(col("t").isin("join", "vector", "stream"))
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(withTerm))
  }

  test("ks drift equals the naive single-partition KS and is bounded") {
    import org.apache.spark.sql.expressions.Window
    val r = run("q244_ks_drift").collect()(0)
    val (n1, n2, dNum, ks) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4))
    assert(ks >= 0.0 && ks <= 1.0, ks.toString)
    assert(n1 + n2 === Tables.load(spark, sf, "orders").count())
    // the two-level cumulative sum must equal the naive global-window
    // form (fine at spec scale; the operator avoids it for scale)
    val o = Tables.load(spark, sf, "orders").select(
      (Tables.d2(col("o_totalprice")) * 100).cast("long").as("cents"),
      expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', o_orderdate)").as("us"))
    val b = o.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .collect()(0)
    val mid = (b.getLong(0) + b.getLong(1)) / 2 // positive: same as DIV
    val c = o.withColumn("h1", (col("us") <= mid).cast("long"))
      .groupBy(col("cents"))
      .agg(sum(col("h1")).as("n1"), sum(lit(1L) - col("h1")).as("n2"))
    val w = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val naive = c.withColumn("c1", sum(col("n1")).over(w))
      .withColumn("c2", sum(col("n2")).over(w))
      .select(abs(col("c1") * n2 - col("c2") * n1).as("d"))
      .agg(max(col("d"))).collect()(0).getLong(0)
    assert(dNum === naive, s"two-level $dNum vs naive $naive")
  }

  test("gini purity: exact integer moments, impurity bounded, all weekdays") {
    val rows = run("q245_gini_purity").collect()
    assert(rows.map(_.getLong(0)).toSet === (1L to 7L).toSet)
    var total = 0L
    rows.foreach { r =>
      val (n, ssq, g) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(ssq <= n * n && ssq >= n, r.toString) // n classes >= 1
      assert(g >= 0.0 && g < 1.0, r.toString)
      total += n
    }
    assert(total === Tables.events(spark, sf).count())
  }

  test("link prediction: non-adjacent, common bounded by degrees, ranked") {
    val rows = run("q246_link_prediction").collect()
    assert(rows.nonEmpty)
    val commons = rows.map(_.getLong(2)).toSeq
    assert(commons === commons.sorted.reverse, "ranked by common desc")
    rows.foreach { r =>
      val (a, b, cn, da, db, j) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(a < b, r.toString)
      assert(cn >= 1 && cn <= math.min(da, db), r.toString)
      assert(j > 0.0 && j <= 1.0, r.toString)
    }
    // no emitted pair is an edge (co-ordered >= 2 distinct orders)
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = li.alias("a").join(li.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select(col("pa"), col("pb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach(r =>
      assert(!edges.contains((r.getLong(0), r.getLong(1))), r.toString))
  }

  test("loo target encoding: one row per customer, segment sums reconcile") {
    val rows = run("q247_loo_target_encoding")
    assert(rows.count() === Tables.load(spark, sf, "customer").count())
    // within a segment, loo_num + target is the constant segment total
    // and loo_den + 1 is the constant segment size
    val bad = rows
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("loo_num") + col("target")).as("k1"),
        countDistinct(col("loo_den")).as("k2"),
        count(lit(1)).as("n"), max(col("loo_den")).as("d"))
      .filter(col("k1") =!= 1 || col("k2") =!= 1 ||
        col("d") =!= col("n") - 1)
    assert(bad.count() === 0L)
    // the encoding never equals using one's own target unless uniform:
    // spot-check the division on a sample row
    val s = rows.filter(col("loo_den") > 0).limit(1).collect()(0)
    val expected = s.getLong(3).toDouble / s.getLong(4).toDouble
    assert(s.getDouble(5) === expected)
  }

  test("autocorrelation: all seven lags, bounded, lag-pair counts shrink") {
    val rows = run("q248_autocorrelation").collect()
    assert(rows.map(_.getLong(0)).toSet === (1L to 7L).toSet)
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1.0000001 && r.getDouble(2) <= 1.0000001,
        r.toString)
    }
    // |D ∩ (D−k)| < |D|: the max day never finds a lag partner
    val d = Tables.load(spark, sf, "orders")
      .select(to_date(col("o_orderdate"))).distinct().count()
    rows.foreach(r => assert(r.getLong(1) <= d - 1, r.toString))
  }

  test("stream union of the parity feeds reproduces the single-stream hourly rollup") {
    val union = run("q249_stream_union").collect().toSeq
    val single = run("q40_stream_hourly").collect().toSeq
    assert(union === single)
  }

  test("grouped k-fold: all five folds, partition of users and events") {
    val rows = run("q250_grouped_kfold").collect()
    assert(rows.map(_.getLong(0)).toSet === (0L to 4L).toSet)
    val ev = Tables.events(spark, sf)
    assert(rows.map(_.getLong(1)).sum ===
      ev.select(col("user_id")).distinct().count())
    assert(rows.map(_.getLong(2)).sum === ev.count())
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), r.toString)
      val share = r.getDouble(4)
      assert(share >= 0.0 && share <= 1.0, r.toString)
    }
  }

  test("calibration deciles: equal-frequency split covering every user") {
    val rows = run("q251_calibration_deciles").collect()
    assert(rows.map(_.getLong(0)).toSet === (1L to 10L).toSet)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, sizes.mkString(","))
    assert(sizes.sum === Tables.events(spark, sf)
      .select(col("user_id")).distinct().count())
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1), r.toString))
  }

  test("kwic snippets: every hit window contains the term and stays within ±2 words") {
    val rows = run("q252_kwic_snippets").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, r.toString)
      val words = r.getString(2).split(" ")
      assert(words.contains("vector"), r.toString)
      assert(words.length >= 1 && words.length <= 5, r.toString)
    }
  }

  test("merge tombstones: deletes match the %97 slice, supersede deltas, null out the row") {
    val rows = run("q253_merge_tombstones").collect()
    val byAction = rows.groupBy(_.getString(1))
    val base = Tables.load(spark, sf, "customer")
    assert(byAction("delete").length ===
      base.filter(col("c_custkey") % 97 === 0).count())
    byAction("delete").foreach { r =>
      assert(r.isNullAt(3) && r.getLong(4) === 0L, r.toString)
    }
    byAction("insert").foreach(r => assert(r.getLong(0) < 0, r.toString))
    // audit covers every base key exactly once plus the synthetic inserts
    assert(rows.length === base.count() + byAction("insert").length)
  }

  test("pattern match: one readout row with consistent match counters") {
    val r = run("q254_pattern_match").collect().head
    val (ns, nm, tot, mx) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(ns > 0 && nm <= ns)
    assert(tot >= nm) // every matched session contributes >= 1 match
    assert(mx <= tot && (nm > 0) === (tot > 0))
  }

  test("nearest asof: covers every purchase, picks the closer side, ties go earlier") {
    val rows = run("q255_nearest_asof").collect()
    val ev = Tables.events(spark, sf)
    assert(rows.length.toLong ===
      ev.filter(col("event_type") === "purchase").count())
    val errUsers = ev.filter(col("event_type") === "error")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val hasErr = errUsers.contains(r.getLong(1))
      assert(!r.isNullAt(2) === hasErr, r.toString)
      assert(!r.isNullAt(3) === hasErr, r.toString)
    }
    // brute-force the nearest error for every purchase and compare
    def us(r: org.apache.spark.sql.Row, i: Int): Long = {
      val t = r.getAs[java.time.LocalDateTime](i)
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        t.getNano / 1000L
    }
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .groupBy(_.getLong(0))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), us(r, 2)))
      .toMap
    rows.filter(!_.isNullAt(2)).foreach { r =>
      val (u, pts) = purchases(r.getLong(0))
      val cands = errs(u).map { e =>
        val ets = us(e, 1)
        (math.abs(ets - pts), ets, e.getLong(2))
      }
      // operator+oracle tie-break among same-|Δt| same-ts errors:
      // backward side takes the LAST of the (ts, event_id) ordering
      // (largest id), forward side the FIRST (smallest id)
      val bestKey = cands.map(x => (x._1, x._2)).min
      val tied = cands.filter(x => (x._1, x._2) == bestKey).map(_._3)
      val best = if (bestKey._2 <= pts) tied.max else tied.min
      assert(r.getLong(2) === best, s"purchase ${r.getLong(0)}")
    }
  }

  test("business days: formula matches a brute-force weekday count, totals reconcile") {
    val rows = run("q256_business_days").collect()
    assert(rows.map(_.getLong(1)).sum ===
      Tables.load(spark, sf, "lineitem").count())
    // brute-force the closed form on a spread of date pairs
    def brute(d1: java.time.LocalDate, d2: java.time.LocalDate): Long =
      Iterator.iterate(d1)(_.plusDays(1)).takeWhile(_.isBefore(d2))
        .count(d => d.getDayOfWeek.getValue <= 5).toLong
    def formula(d: java.time.LocalDate): Long = {
      val dn = java.time.temporal.ChronoUnit.DAYS
        .between(java.time.LocalDate.of(1900, 1, 1), d)
      (dn / 7) * 5 + math.min(dn % 7, 5)
    }
    val probe = Seq(("1995-03-06", "1995-03-13"), ("1995-03-04", "1995-03-05"),
      ("1992-01-01", "1998-12-31"), ("1995-03-10", "1995-03-16"))
    probe.foreach { case (a, b) =>
      val (d1, d2) = (java.time.LocalDate.parse(a), java.time.LocalDate.parse(b))
      assert(formula(d2) - formula(d1) === brute(d1, d2), s"$a..$b")
    }
  }

  test("weighted sssp: reaches exactly the BFS node set, seeds at zero, others positive") {
    val sssp = run("q257_weighted_sssp").collect()
    val bfs = run("q144_bfs_seed_distance").collect()
    assert(sssp.map(_.getLong(0)).toSet === bfs.map(_.getLong(0)).toSet)
    sssp.foreach { r =>
      val seed = r.getLong(0) % 10 == 0
      assert(if (seed) r.getLong(1) === 0L else r.getLong(1) > 0L, r.toString)
    }
  }

  test("clamped balance matches a brute-force per-user fold") {
    val rows = run("q258_clamped_balance").collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        (expr("cast(value as decimal(18,2))") * 100).cast("long").as("cents"))
      .collect()
    def us(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    val expect = ev.groupBy(_.getLong(0)).map { case (u, rs) =>
      val sorted = rs.sortBy(r =>
        (us(r.getAs[java.time.LocalDateTime](1)), r.getLong(2)))
      val (bal, clamps) = sorted.foldLeft((0L, 0L)) { case ((b, c), r) =>
        val amt = if (r.getLong(2) % 2 == 0) r.getLong(3) else -r.getLong(3)
        (math.max(b + amt, 0L), c + (if (b + amt < 0) 1L else 0L))
      }
      u -> ((bal, clamps))
    }
    assert(rows.length === expect.size)
    rows.foreach { r =>
      assert(expect(r.getLong(0)) === ((r.getLong(1), r.getLong(2))), r.toString)
    }
  }

  test("interval conflicts match a brute-force sweep per user") {
    val rows = run("q259_interval_conflicts").collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        (expr("cast(value as decimal(18,2))") * 100).cast("long").as("cents"))
      .collect()
    def us(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    val expect = ev.groupBy(_.getLong(0)).map { case (u, rs) =>
      val iv = rs.map { r =>
        val start = us(r.getAs[java.time.LocalDateTime](1))
        (start, r.getLong(2), start + (r.getLong(3) % 3600) * 1000000L)
      }.sortBy(x => (x._1, x._2))
      val conflicts = iv.indices.count { i =>
        i > 0 && iv(i)._1 < iv.take(i).map(_._3).max
      }
      u -> ((iv.length.toLong, conflicts.toLong))
    }
    assert(rows.length === expect.size)
    rows.foreach { r =>
      assert(expect(r.getLong(0)) === ((r.getLong(1), r.getLong(2))), r.toString)
    }
  }

  test("matryoshka recall: one row per query anchor, hits bounded by k") {
    val rows = run("q260_matryoshka_recall").collect()
    assert(rows.map(_.getLong(0)).toSet === (0L to 4L).toSet)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 10L, r.toString)
      val rec = r.getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0, r.toString)
      assert(rec === r.getLong(1).toDouble / 10.0, r.toString)
    }
  }

  test("fifo matching equals a sequential lot-walk simulation") {
    val rows = run("q261_fifo_matching").collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        ((expr("cast(value as decimal(18,2))") * 100).cast("long") % 100 + 1)
          .as("qty"))
      .collect()
    def us(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    val expect = ev.groupBy(_.getLong(0)).map { case (u, rs) =>
      val sorted = rs.sortBy(r =>
        (us(r.getAs[java.time.LocalDateTime](1)), r.getLong(2)))
      // the declared semantics: i-th unit of demand matches the i-th
      // unit of supply (both lines in their own time order) — walk the
      // two lot queues front-to-front
      val lots = scala.collection.mutable.Queue[Array[Long]]()
      sorted.filter(_.getString(3) == "purchase")
        .foreach(r => lots.enqueue(Array(r.getLong(4))))
      var matched = 0L
      var pairs = 0L
      sorted.filter(_.getString(3) == "click").foreach { r =>
        var need = r.getLong(4)
        while (need > 0 && lots.nonEmpty) {
          val lot = lots.head
          val take = math.min(need, lot(0))
          matched += take; need -= take; lot(0) -= take; pairs += 1
          if (lot(0) == 0) { lots.dequeue(): Unit }
        }
      }
      u -> ((pairs, matched))
    }
    rows.foreach { r =>
      val (pairs, matched) = expect(r.getLong(0))
      assert(r.getLong(3) === pairs, s"pairs for user ${r.getLong(0)}")
      assert(r.getLong(4) === matched, s"matched for user ${r.getLong(0)}")
      assert(r.getLong(5) === r.getLong(2) - matched, r.toString)
    }
  }

  test("chained streaming agg: watermark-closed days only, matching the batch rollup") {
    val rows = run("q262_stream_chained").collect()
    val byDay = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[java.time.LocalDateTime](0) -> r.getLong(1)).toMap
    // the in-flight last day must be held open (append-mode contract)
    assert(rows.length === byDay.size - 1)
    rows.foreach { r =>
      val day = r.getAs[java.time.LocalDateTime](0)
      assert(r.getLong(1) === byDay(day), s"day $day")
      assert(r.getLong(2) >= 1L && r.getLong(2) <= 24L, r.toString)
      assert(r.getLong(3) <= r.getLong(1), r.toString)
    }
    assert(!rows.map(_.getAs[java.time.LocalDateTime](0))
      .contains(byDay.keys.max(Ordering.by((t: java.time.LocalDateTime) =>
        t.toEpochSecond(java.time.ZoneOffset.UTC)))))
  }

  test("grid neighbors: symmetric relation, bounded counts") {
    val rows = run("q263_grid_neighbors").collect()
    assert(rows.nonEmpty)
    // neighborhood is symmetric => total directed count is even
    assert(rows.map(_.getLong(1)).sum % 2 === 0L)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L, r.toString)
      assert(r.getBoolean(2) === (r.getLong(1) >= 10L), r.toString)
    }
  }

  test("corrupt json: torn slice quarantined exactly, clean rows all parsed") {
    val rows = run("q264_corrupt_json").collect()
    val docs = Tables.load(spark, sf, "documents")
    val corrupt = rows.filter(_.getString(0) == "_corrupt")
    assert(corrupt.length === 1)
    assert(corrupt.head.getLong(1) ===
      docs.filter(col("doc_id") % 13 === 0).count())
    assert(corrupt.head.isNullAt(2), corrupt.head.toString)
    assert(rows.map(_.getLong(1)).sum === docs.count())
  }

  test("lang confusion cells reconcile with q28's per-doc predictions") {
    val cells = run("q268_lang_confusion").collect()
    val pred = run("q28_language_id").collect()
    assert(cells.map(_.getLong(2)).sum === pred.length.toLong)
    val expect = pred.groupBy(r => (r.getString(1), r.getString(2)))
      .view.mapValues(_.length.toLong).toMap
    cells.foreach { c =>
      assert(expect((c.getString(0), c.getString(1))) === c.getLong(2),
        c.toString)
    }
  }

  test("token bucket matches a brute-force replay of the refill/reject recurrence") {
    val rows = run("q269_token_bucket").collect()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        ((expr("cast(value as decimal(18,2))") * 100).cast("long") % 100 + 1)
          .as("cost"))
      .collect()
    def us(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    val expect = ev.groupBy(_.getLong(0)).map { case (u, rs) =>
      val sorted = rs.sortBy(r =>
        (us(r.getAs[java.time.LocalDateTime](1)), r.getLong(2)))
      var p = -1L; var tok = 100L; var thr = 0L
      sorted.foreach { r =>
        val t = us(r.getAs[java.time.LocalDateTime](1))
        val refill = if (p < 0) 0L else (t - p) / 120000000L
        tok = math.min(100L, tok + refill); p = t
        val cost = r.getLong(3)
        if (tok >= cost) tok -= cost else thr += 1
      }
      u -> ((tok, thr))
    }
    assert(rows.length === expect.size)
    // the policy must actually bite somewhere or the gate is vacuous
    assert(rows.map(_.getLong(2)).sum > 0L)
    rows.foreach { r =>
      assert(expect(r.getLong(0)) === ((r.getLong(1), r.getLong(2))), r.toString)
    }
  }

  test("span dedup: invariants hold and a planted verbatim span is caught") {
    val rows = run("q272_span_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nd, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nd >= 1L && nd <= nw, r.toString)
      assert(f > 0.0 && f <= 1.0, r.toString)
    }
    // fixture: two docs share a 120-char verbatim block at DIFFERENT
    // offsets (100 vs 123 — no common residue mod any stride), which
    // content-defined anchoring must still align; a third doc is unique
    val dir = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_span_fixture")
    rmTree(dir)
    try {
      import spark.implicits._
      val block = ("the quick brown fox jumps over the lazy dog again and " +
        "again until the whole paragraph repeats verbatim across both pages " +
        "of the corpus fixture").take(120)
      assert(block.length === 120)
      val docs = Seq(
        (1L, "unique preamble one " * 5 + block, "en", "web", 0L),
        (2L, "a different lead-in text here, " * 4 + block + " trailing", "en", "web", 0L),
        (3L, "entirely original content with no shared spans at all " * 6, "en", "web", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = run2("q272_span_dedup", dir.getAbsolutePath).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got.keySet === Set(1L, 2L), got.toString)
      assert(got.values.forall(_ >= 1L), got.toString)
    } finally rmTree(dir)
  }

  test("source boilerplate + template scrub: invariants hold and a planted template is caught") {
    // corpus invariants at sf0.001
    val report = run("q355_source_boilerplate").collect()
    assert(report.length === 20) // one row per source
    report.foreach { r =>
      val (nOcc, nDist, nTpl, tplOcc, share) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(nTpl <= nDist && tplOcc <= nOcc, r.toString)
      assert(nDist <= nOcc, r.toString)
      assert(share >= 0.0 && share <= 1.0, r.toString)
      // every template chunk contributes >= 2 occurrences
      assert(tplOcc >= 2 * nTpl, r.toString)
    }
    val scrub = run("q356_template_scrub").collect()
    scrub.foreach { r =>
      val (nCh, nTpl, share, action) =
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(5))
      assert(nTpl <= nCh, r.toString)
      assert((action == "drop") === (share > 0.5), r.toString)
      assert((action == "keep") === (nTpl == 0L), r.toString)
    }
    // the two views must agree: per-source template incidences from the
    // scrub rows equal the report's template_occ
    val scrubBySrc = scrub.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    report.foreach { r =>
      assert(scrubBySrc.getOrElse(r.getString(0), 0L) === r.getLong(5), r.getString(0))
    }
    // fixture: source A plants one grid-aligned 8-token template in
    // three docs (one doc is ONLY the template -> drop; two dilute it
    // below half -> trim); source B is template-free -> keep
    val dir = new java.io.File(s"${sys.props("java.io.tmpdir")}" +
      s"/graft_template_fixture_${ProcessHandle.current().pid()}")
    rmTree(dir)
    try {
      import spark.implicits._
      val tpl = "nav home about contact legal privacy terms sitemap" // 8 tokens
      val filler = (1 to 24).map(i => s"unique$i").mkString(" ")
      val filler2 = (1 to 24).map(i => s"other$i").mkString(" ")
      val docs = Seq(
        (1L, s"$tpl $filler", "en", "A", 0L),   // 4 chunks, 1 template
        (2L, s"$tpl $filler2", "en", "A", 0L),  // 4 chunks, 1 template
        (3L, tpl, "en", "A", 0L),               // 1 chunk, all template
        (4L, s"plain body $filler", "en", "B", 0L),
        (5L, s"plain body $filler2", "en", "B", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rep = run2("q355_source_boilerplate", dir.getAbsolutePath).collect()
        .map(r => r.getString(0) -> ((r.getLong(4), r.getLong(5)))).toMap
      assert(rep("A") === ((1L, 3L)), rep.toString) // one template, df=3
      assert(rep("B") === ((0L, 0L)), rep.toString)
      val acts = run2("q356_template_scrub", dir.getAbsolutePath).collect()
        .map(r => r.getLong(0) -> r.getString(5)).toMap
      assert(acts === Map(1L -> "trim", 2L -> "trim", 3L -> "drop",
        4L -> "keep", 5L -> "keep"), acts.toString)
    } finally rmTree(dir)
  }

  test("source overlap: full pair matrix, bounded estimates, identical sources read 1.0") {
    val rows = run("q275_source_overlap").collect()
    assert(rows.length === 190) // C(20, 2) unordered source pairs
    rows.foreach { r =>
      val (ex, est) = (r.getDouble(3), r.getDouble(4))
      assert(ex >= 0.0 && ex <= 1.0, r.toString)
      assert(est >= 0.0 && est <= 1.0, r.toString)
    }
    // with K=16 slots the estimator is coarse but must track the truth
    // in aggregate: mean |est - exact| under 3 sketch slots' worth
    val mae = rows.map(r => math.abs(r.getDouble(4) - r.getDouble(3))).sum /
      rows.length
    assert(mae <= 3.0 / 16.0, s"mean abs error $mae")
    // fixture: A and B carry the SAME texts (union sets equal -> both
    // jaccards exactly 1.0); C is disjoint from both
    val dir = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_overlap_fixture")
    rmTree(dir)
    try {
      import spark.implicits._
      val shared = (1 to 30).map(i => s"shared corpus sentence number $i with stable words")
      val docs =
        shared.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "A", 0L) } ++
        shared.zipWithIndex.map { case (t, i) => (100L + i, t, "en", "B", 0L) } ++
        (1 to 30).map(i =>
          (200L + i, s"disjoint vocabulary item $i entirely elsewhere", "en", "C", 0L))
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = run2("q275_source_overlap", dir.getAbsolutePath).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getDouble(3), r.getDouble(4))).toMap
      assert(got(("A", "B")) === ((1.0, 1.0)), got.toString)
      assert(got(("A", "C"))._1 === 0.0, got.toString)
      assert(got(("B", "C"))._1 === 0.0, got.toString)
    } finally rmTree(dir)
  }

  test("fisher separation: one ratio per dim, nonnegative, matches a brute force") {
    val rows = run("q281_fisher_separation").collect()
    assert(rows.length === 64)
    assert(rows.map(_.getLong(0)).toSeq === (0L until 64L))
    rows.filter(!_.isNullAt(1)).foreach { r =>
      assert(r.getDouble(1) >= -1e-9, r.toString) // SSB >= 0 up to FP noise
    }
    // brute-force dim 0 from the same quantization rule
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0),
        math.floor(r.getSeq[Float](1).head.toDouble * 1000 + 0.5).toLong))
    val byLabel = vecs.groupBy(_._1)
    val n = vecs.length.toDouble
    val s1 = vecs.map(_._2).sum.toDouble
    val s2 = vecs.map(v => v._2 * v._2).sum.toDouble
    val sumTerms = byLabel.toSeq.sortBy(_._1).map { case (_, vs) =>
      val s = vs.map(_._2).sum.toDouble
      s * s / vs.length
    }.sum
    val expect = (sumTerms - s1 * s1 / n) / (s2 - sumTerms)
    val got = rows.head.getDouble(1)
    assert(math.abs(got - expect) < 1e-9, s"$got vs $expect")
  }

  test("leak severity: covers every bench doc, marginals reconcile with q70") {
    val sev = run("q280_leak_severity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // one row per bench doc (doc_id % 20 == 0), clean items included
    val nBench = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 20 === 0).count()
    assert(sev.length.toLong === nBench)
    assert(sev.forall { case (_, nt, ns) =>
      (nt == 0L) == (ns == 0L) && nt >= 0L && ns >= 0L })
    // both directions see the same bipartite leak graph: a bench item
    // leaks iff some q70-contaminated train doc shares a 5-gram, so
    // leaking-bench-docs > 0 exactly when q70 flags any train doc
    val contaminated = run("q70_decontaminate").collect()
    assert((sev.count(_._2 > 0L) > 0) === contaminated.nonEmpty)
    // and every contaminated train doc's bench partners are counted:
    // sum over bench of n_train_docs == sum over train of n_bench_docs
    // (both count distinct (train, bench) sharing pairs)
    assert(sev.map(_._2).sum === contaminated.map(_.getLong(1)).sum)
  }

  test("span scrub plan: reconciles with q272 and a brute-force interval merge") {
    val scrub = run("q279_span_scrub_plan").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val detect = run("q272_span_dedup").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // same doc set, and flagged-window counts agree with the detector
    assert(scrub.keySet === detect.keySet)
    scrub.foreach { case (doc, (nf, ni, removed, kept)) =>
      assert(nf === detect(doc), s"doc $doc")
      assert(ni >= 1L && ni <= nf, s"doc $doc")
      // islands merge overlapping L=40 windows: each island spans at
      // least one window and at most the whole flagged range
      assert(removed >= 40L * ni - 39L * (ni - 1L) || ni === 0L, s"doc $doc")
      assert(removed + kept >= 40L, s"doc $doc") // len reconstructed
    }
    // brute-force the merge on a synthetic position set
    def brute(ps: Seq[Long], L: Long): (Long, Long) = {
      var islands = 0L; var removed = 0L
      var s = -1L; var e = -1L
      ps.sorted.foreach { p =>
        if (s < 0 || p > e) {
          if (s >= 0) removed += e - s + 1
          islands += 1; s = p; e = p + L - 1
        } else e = math.max(e, p + L - 1)
      }
      if (s >= 0) removed += e - s + 1
      (islands, removed)
    }
    // [1,49] (1+10 merged), [60,119] (60+80 merged), [200,239]
    assert(brute(Seq(1L, 10L, 60L, 80L, 200L), 40L) === ((3L, 149L)))
    assert(brute(Seq(5L), 40L) === ((1L, 40L)))
  }

  test("stream source sketch: 4-batch incremental merge equals the batch sketch") {
    import org.apache.spark.sql.functions._
    val streamed = run("q278_stream_source_sketch").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    // batch twin built directly from the same mergeable aggregate
    val batch = graft.dedup.Dedup.sourceSketchBatch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(streamed === batch)
    assert(streamed.size === 20)
    // signatures are 16 comma-joined non-negative longs
    streamed.values.foreach { case (_, sig) =>
      val parts = sig.split(",")
      assert(parts.length === graft.dedup.Dedup.K, sig)
      assert(parts.forall(p => p.toLong >= 0L), sig)
    }
  }

  test("heldout coverage: covers exactly the non-train split, fractions well-formed") {
    val rows = run("q276_heldout_coverage").collect()
    // one row per val/test doc of the q69 split — reconcile counts
    val splitCounts = run("q69_train_split").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length.toLong ===
      splitCounts("val") + splitCounts("test"), splitCounts.toString)
    rows.foreach { r =>
      val (n, c, f) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(n >= 1L && c >= 0L && c <= n, r.toString)
      assert(f >= 0.0 && f <= 1.0, r.toString)
      assert(r.getString(1) === "val" || r.getString(1) === "test", r.toString)
    }
  }

  test("effective yield: canonical charge reconciles with cluster structure") {
    val rows = run("q277_effective_yield").collect()
    assert(rows.length === 20) // one row per source
    rows.foreach { r =>
      val (raw, eff, y) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(eff >= 0L && eff <= raw, r.toString)
      assert(y >= 0.0 && y <= 1.0, r.toString)
    }
    // total docs reconcile and dedup must bite somewhere: corpus-wide
    // effective < raw exactly when near-dup clusters exist
    assert(rows.map(_.getLong(1)).sum ===
      Tables.load(spark, sf, "documents").count())
    val nClustered = run("q67_dedup_clusters").collect().length
    val nClusters = run("q137_cluster_sizes").collect()
      .map(_.getLong(1)).sum
    val (raw, eff) = (rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    if (nClustered > nClusters) assert(eff < raw, s"$eff vs $raw")
  }

  test("curriculum stages: exact 4-way split, ordered non-overlapping char ranges") {
    val rows = run("q273_curriculum_stages").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    val total = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum === total)
    // NTILE: tile sizes differ by at most 1
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1L, sizes.toSeq.toString)
    // stages ordered by length: stage k's max <= stage k+1's min
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2),
        s"stage ${a.getLong(0)} max ${a.getLong(3)} > stage ${b.getLong(0)} min ${b.getLong(2)}")
    }
  }

  test("repeated bigram mass: matches a brute-force per-doc recount") {
    val rows = run("q282_repeated_bigram_mass").collect()
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val toks = docs(r.getLong(0)).trim.split(" +")
      val bgs = toks.sliding(2).map(_.mkString(" ")).toSeq
      val byBg = bgs.groupBy(identity).view.mapValues(_.size)
      val dup = byBg.values.filter(_ >= 2).sum
      assert(r.getLong(1) === bgs.size.toLong, s"doc ${r.getLong(0)} n_bigrams")
      assert(r.getLong(2) === dup.toLong, s"doc ${r.getLong(0)} dup_occ")
      assert(r.getDouble(3) === dup.toDouble / bgs.size, s"doc ${r.getLong(0)} mass")
    }
    // every doc with >= 2 tokens appears exactly once
    val expected = docs.count(_._2.trim.split(" +").length >= 2)
    assert(rows.length === expected)
  }

  test("simpson diversity: bounded, matches brute force, penalizes repetition") {
    val rows = run("q283_simpson_diversity").collect()
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val toks = docs(r.getLong(0)).trim.split(" +").toSeq
      val c2 = toks.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
      val n = toks.size.toLong
      assert(r.getLong(1) === n)
      assert(r.getLong(3) === c2)
      assert(r.getDouble(4) === 1.0 - c2.toDouble / (n * n))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
      // inverse Simpson is bounded by the distinct-token count
      assert(r.getDouble(5) <= r.getLong(2).toDouble + 1e-9)
    }
  }

  test("semantic dedup: q99 pair endpoints co-clustered, one min-id keeper per cluster") {
    val rows = run("q284_semantic_dedup").collect()
    assert(rows.nonEmpty, "sf0.001 must yield at least one semantic near-dup edge")
    val label = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every q99 edge's endpoints share a cluster label
    run("q99_semantic_neardup_ivf").collect().foreach { p =>
      assert(label(p.getLong(0)) === label(p.getLong(1)), p.toString)
    }
    // per cluster: keeper is exactly the min member; n_members is the size
    rows.groupBy(_.getLong(1)).foreach { case (cid, members) =>
      val keeps = members.filter(_.getBoolean(3)).map(_.getLong(0))
      assert(keeps.toSeq === Seq(members.map(_.getLong(0)).min))
      assert(cid === members.map(_.getLong(0)).min)
      members.foreach(m => assert(m.getLong(2) === members.length.toLong))
      assert(members.length >= 2, s"cluster $cid is a singleton")
    }
  }

  test("incremental dedup: every delta doc gets a verdict; matches are exact q33 pairs") {
    val rows = run("q285_incremental_dedup").collect()
    val deltaIds = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === deltaIds, "one verdict per delta doc")
    // exact-Jaccard ground truth (q33 emits J >= 0.5 pairs corpus-wide)
    val exact = run("q33_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val matched = rows.filter(!_.isNullAt(2))
    assert(matched.nonEmpty, "sf0.001 must produce at least one incremental match")
    matched.foreach { r =>
      val (nd, bm) = (r.getLong(0), r.getLong(2))
      val key = (math.min(nd, bm), math.max(nd, bm))
      // precision 1: every emitted match is a true exact-Jaccard pair
      assert(exact.contains(key), s"pair $key not in exact q33 set")
      assert(r.getDouble(3) === exact(key), s"jaccard mismatch for $key")
      assert(r.getLong(1) >= 1L)
    }
    rows.filter(_.isNullAt(2)).foreach(r => assert(r.getLong(1) === 0L))
  }

  test("vocab coverage: monotone in cap, exact masses, max cap covers full vocab mass") {
    val rows = run("q286_vocab_coverage").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(5L, 10L, 20L, 40L))
    val total = rows.head.getLong(2)
    // brute-force token mass
    val toks = Tables.load(spark, sf, "documents").selectExpr("text")
      .collect().flatMap(_.getString(0).trim.split(" +"))
    assert(total === toks.length.toLong)
    val byCount = toks.groupBy(identity).map { case (t, g) => (t, g.length) }
      .toSeq.sortBy { case (t, n) => (-n, t) }
    rows.foreach { r =>
      val cap = r.getLong(0).toInt
      val covered = byCount.take(cap).map(_._2.toLong).sum
      assert(r.getLong(1) === covered, s"cap $cap")
      assert(r.getDouble(3) === covered.toDouble / total)
    }
    // coverage is monotone non-decreasing in the cap
    rows.map(_.getDouble(3)).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
    }
  }

  test("iqr outliers: quartile rule matches a per-group sorted brute force") {
    val rows = run("q287_iqr_outliers").collect()
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents")
      .collect().groupBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSet === ev.keySet)
    rows.foreach { r =>
      val vs = ev(r.getString(0)).map(_.getLong(1)).sorted
      val n = vs.length
      def qAt(k: Int): Long = vs((k * n + 3) / 4 - 1) // ceil(k n/4)-th, 1-based
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === qAt(1), s"${r.getString(0)} q1")
      assert(r.getLong(3) === qAt(3), s"${r.getString(0)} q3")
      val (q1, q3) = (qAt(1), qAt(3))
      val iqr = q3 - q1
      assert(r.getLong(5) === vs.count(v => 2 * v < 2 * q1 - 3 * iqr).toLong)
      assert(r.getLong(6) === vs.count(v => 2 * v > 2 * q3 + 3 * iqr).toLong)
    }
  }

  test("mann-whitney: doubled rank sums match a brute-force midrank computation") {
    val r = run("q288_mann_whitney").collect()(0)
    val vals = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .selectExpr("cast(conv(substring(md5(cast(cast(user_id as string) as binary)),1,14),16,10) as bigint) % 2 as variant",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val a = vals.filter(_._1 == 0L).map(_._2)
    val b = vals.filter(_._1 == 1L).map(_._2)
    assert(r.getLong(0) === a.length.toLong && r.getLong(1) === b.length.toLong)
    // doubled midrank of value v in the pooled sample
    val all = (a ++ b).sorted
    def mid2(v: Long): Long = {
      val below = all.count(_ < v).toLong
      val t = all.count(_ == v).toLong
      2 * below + t + 1
    }
    val r2 = a.map(mid2).sum
    val u2 = r2 - a.length.toLong * (a.length + 1)
    assert(r.getLong(2) === u2)
    // z is bounded and defined for this two-sided non-degenerate sample
    assert(!r.isNullAt(3) && math.abs(r.getDouble(3)) < 50.0)
  }

  test("wasserstein drift: matches the brute-force step integral per source") {
    val rows = run("q289_wasserstein_drift").collect()
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val pooled = docs.map(_._2).sorted
    val grid = pooled.distinct.sorted
    assert(rows.map(_.getString(0)).toSeq === docs.map(_._1).distinct.sorted.toSeq)
    rows.foreach { r =>
      val mine = docs.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(1) === mine.length.toLong)
      val (ns, np) = (mine.length.toLong, pooled.length.toLong)
      val s1 = grid.sliding(2).collect { case Array(v, nx) =>
        val cumS = mine.count(_ <= v).toLong
        val cumP = pooled.count(_ <= v).toLong
        math.abs(cumS * np - cumP * ns) * (nx - v)
      }.sum
      assert(r.getDouble(2) === s1.toDouble / (ns * np).toDouble,
        s"source ${r.getString(0)}")
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("copurchase pairs: support/lift match a brute-force basket recount") {
    val rows = run("q290_copurchase_pairs").collect()
    assert(rows.nonEmpty)
    val baskets = Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nb = baskets.map(_._1).distinct.length.toLong
    val byOrder = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val itemCnt = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val (pa, pb) = (r.getLong(0), r.getLong(1))
      val support = byOrder.values.count(s => s(pa) && s(pb)).toLong
      assert(r.getLong(2) === support, s"($pa,$pb)")
      assert(support >= 2L)
      assert(r.getDouble(3) ===
        support.toDouble * nb.toDouble / (itemCnt(pa).toDouble * itemCnt(pb).toDouble))
    }
    // ordering contract: support desc first
    rows.map(_.getLong(2)).sliding(2).foreach { case Array(x, y) => assert(x >= y) }
  }

  test("mase forecast eval: error masses match a brute-force series walk") {
    val rows = run("q291_mase_forecast").collect()
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "to_date(ts) as day")
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    assert(rows.map(_.getString(0)).toSet === daily.map(_._1).toSet)
    rows.foreach { r =>
      val ys = daily.filter(_._1 == r.getString(0)).sortBy(_._2.toEpochDay)
        .map(_._3)
      assert(r.getLong(1) === ys.length.toLong)
      def sae(k: Int) = ys.drop(k).zip(ys.dropRight(k))
        .map { case (y, yk) => math.abs(y - yk) }.sum
      assert(r.getLong(2) === sae(7), s"${r.getString(0)} seasonal")
      assert(r.getLong(3) === sae(1), s"${r.getString(0)} naive1")
      assert(r.getLong(4) === math.max(ys.length - 7, 0).toLong)
      assert(r.getLong(5) === math.max(ys.length - 1, 0).toLong)
    }
  }

  test("quantile normalize: rank-preserving within source, pooled value at matched quantile") {
    val rows = run("q292_quantile_normalize").collect()
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length === docs.length)
    val pooled = docs.sortBy(d => (d._3, d._1)).map(_._3)
    val n = pooled.length.toLong
    val bySource = docs.groupBy(_._2)
    val normOf = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    bySource.foreach { case (_, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._1))
      val ns = sorted.length.toLong
      sorted.zipWithIndex.foreach { case (d, i) =>
        val r = i + 1L
        val tgt = (r * n + ns - 1) / ns
        assert(normOf(d._1) === pooled((tgt - 1).toInt), s"doc ${d._1}")
      }
      // within-source order is preserved by the normalized value
      sorted.map(d => normOf(d._1)).sliding(2).foreach {
        case Array(a, b) => assert(a <= b); case _ => ()
      }
    }
  }

  test("abc classification: classes partition parts, boundaries honor the 80/95 rule") {
    val rows = run("q293_abc_classification").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("A", "B", "C"))
    val rev = Tables.load(spark, sf, "lineitem")
      .selectExpr("l_partkey", "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint) as cents")
      .groupBy("l_partkey").agg(sum("cents").as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sorted = rev.sortBy(x => (-x._2, x._1))
    val tot = sorted.map(_._2).sum
    var cum = 0L
    val classes = sorted.map { case (_, c) =>
      cum += c
      if (cum * 100 <= tot * 80) "A" else if (cum * 100 <= tot * 95) "B" else "C"
    }
    val expect = classes.groupBy(identity).view.mapValues(_.length.toLong)
    rows.foreach { r =>
      assert(r.getLong(1) === expect(r.getString(0)), r.getString(0))
    }
    assert(rows.map(_.getLong(1)).sum === rev.length.toLong)
    assert(rows.map(_.getLong(2)).sum === tot)
    // head class carries the dominant share
    assert(rows.head.getDouble(3) > rows.last.getDouble(3))
  }

  test("decile migration: cells partition customers, deciles near-equal-frequency") {
    val rows = run("q294_decile_migration").collect()
    val custs = Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey").distinct().count()
    assert(rows.map(_.getLong(2)).sum === custs, "every active customer lands in one cell")
    rows.foreach { r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) <= 10L)
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 10L)
    }
    // per-half decile sizes differ by at most 1 (NTILE contract), half 1
    val h1Sizes = rows.filter(_.getLong(0) > 0L).groupBy(_.getLong(0))
      .map { case (_, g) => g.map(_.getLong(2)).sum }
    assert(h1Sizes.max - h1Sizes.min <= 1L, h1Sizes.toSeq.sorted.toString)
  }

  test("ivf maintenance: one row per centroid, counts partition base and delta") {
    val rows = run("q295_ivf_maintenance").collect()
    assert(rows.length === 32, "IvfK centroid rows")
    val n = Tables.load(spark, sf, "embeddings").count()
    val nDelta = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") % 10 === 0).count()
    assert(rows.map(_.getLong(1)).sum === n - nDelta, "base mass")
    assert(rows.map(_.getLong(2)).sum === nDelta, "delta mass")
    rows.foreach { r =>
      assert(r.getLong(3) === r.getLong(1) + r.getLong(2))
      assert(r.getBoolean(4) === (r.getLong(3) * 32 > 2 * n), r.toString)
    }
  }

  test("lateness histogram: bands partition late-able events, brute-force prefix max agrees") {
    val rows = run("q296_lateness_histogram").collect()
    val ev = Tables.events(spark, sf)
      .selectExpr("event_id", "user_id",
        "unix_micros(cast(ts as timestamp)) as us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e._1 / 256, e._2, e._1)) // arrival: (batch, user, id)
    assert(rows.map(_.getLong(2)).sum === ev.length.toLong - 1,
      "every event except the first arrival is scored")
    var prevmax = Long.MinValue
    val lates = ev.flatMap { case (_, _, us) =>
      val l = if (prevmax == Long.MinValue) None
        else Some(math.max(0L, prevmax - us))
      prevmax = math.max(prevmax, us)
      l
    }
    assert(lates.exists(_ > 0L), "the arrival model must produce real disorder")
    def band(l: Long): Long =
      if (l == 0) 0 else if (l <= 60000000L) 1 else if (l <= 600000000L) 2
      else if (l <= 3600000000L) 3 else 4
    val expect = lates.groupBy(band).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === expect(r.getLong(0)), r.getString(1))
      val maxL = lates.filter(l => band(l) == r.getLong(0)).max
      assert(r.getLong(3) === maxL / 1000000L)
    }
  }

  test("stream quartiles: streamed histogram state finalizes to the batch quartiles") {
    val s = run("q297_stream_quartiles").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val b = run("q287_iqr_outliers").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(s === b, "stream state must equal the batch rollup exactly")
  }

  test("markov eval: accuracy is hits/evals, model argmax matches brute force") {
    val rows = run("q298_markov_eval").collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type",
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) as us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val (lo, hi) = (ev.map(_._4).min, ev.map(_._4).max)
    val mid = Math.floorDiv(lo + hi, 2L)
    val pairs = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._4, e._2))
      s.zip(s.drop(1)).map { case (a, b) => (a._3, b._3, a._4) }
    }.toSeq
    val model = pairs.filter(_._3 <= mid).groupBy(_._1).map { case (t, g) =>
      t -> g.groupBy(_._2).toSeq.map { case (nt, xs) => (xs.size, nt) }
        .sortBy { case (c, nt) => (-c, nt) }.head._2
    }
    val evalP = pairs.filter(_._3 > mid)
    rows.foreach { r =>
      val mine = evalP.filter(_._1 == r.getString(0))
      assert(r.getLong(1) === mine.size.toLong)
      val hits = mine.count(p => model.get(p._1).contains(p._2))
      assert(r.getLong(2) === hits.toLong, r.getString(0))
      assert(r.getDouble(3) === hits.toDouble / mine.size)
    }
  }

  test("retention half-life: reconciles with the q91 matrix incl. densified zero days") {
    val grid = run("q91_cohort_retention").collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2)))
    val rows = run("q299_retention_half_life").collect()
    assert(rows.map(_.get(0).toString).toSet === grid.filter(_._2 == 0L).map(_._1).toSet)
    rows.foreach { r =>
      val c = r.get(0).toString
      val byK = grid.filter(_._1 == c).map(x => x._2 -> x._3).toMap
      val n0 = byK(0L)
      assert(r.getLong(1) === n0)
      val hl = (1L to 7L).find(k => byK.getOrElse(k, 0L) * 2 < n0)
      if (hl.isEmpty) assert(r.isNullAt(2), s"$c half-life should be null")
      else assert(r.getLong(2) === hl.get, c)
      assert(r.getLong(3) === byK.getOrElse(7L, 0L))
    }
  }

  test("local hour profile: masses reconcile per zone, non-UTC zones actually shift") {
    val rows = run("q300_local_hour_profile").collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 23L)
    }
    // UTC rows must equal the plain hour() histogram for users % 4 == 0
    val utc = Tables.events(spark, sf).filter(col("user_id") % 4 === 0)
      .selectExpr("cast(hour(ts) as bigint) as h").groupBy("h").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mineUtc = rows.filter(_.getString(0) == "UTC")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(mineUtc === utc)
    // Tokyo (UTC+9, no DST) is a pure rotation of its users' UTC histogram
    val tokyoUtc = Tables.events(spark, sf).filter(col("user_id") % 4 === 3)
      .selectExpr("cast(hour(ts) as bigint) as h").groupBy("h").count()
      .collect().map(r => (r.getLong(0) + 9L) % 24L -> r.getLong(1)).toMap
    val mineTokyo = rows.filter(_.getString(0) == "Asia/Tokyo")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(mineTokyo === tokyoUtc)
  }

  test("lang margin: predictions equal q28's, margins nonnegative and honest") {
    val m = run("q301_lang_margin").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val q28 = run("q28_language_id").collect()
    assert(q28.length === m.size)
    q28.foreach { r =>
      val (pred, margin, unc) = m(r.getLong(0))
      assert(pred === r.getString(2), s"doc ${r.getLong(0)} prediction forked")
      assert(margin >= 0L)
      assert(unc === (margin <= 1L))
    }
    assert(m.values.exists(_._3) && m.values.exists(!_._3),
      "corpus must contain both confident and uncertain docs")
  }

  test("pair evidence: same pair set and scores as q33, exhibit really is shared") {
    val ev = run("q302_pair_evidence").collect()
    val q33 = run("q33_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ev.map(r => (r.getLong(0), r.getLong(1))).toSet === q33.keySet)
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" +").toSeq
        .sliding(3).map(_.mkString(" ")).toSet).toMap
    ev.foreach { r =>
      assert(r.getDouble(3) === q33((r.getLong(0), r.getLong(1))))
      val shared = docs(r.getLong(0)).intersect(docs(r.getLong(1)))
      assert(r.getLong(2) === shared.size.toLong, "shared count")
      assert(r.getString(4) === shared.min, "exhibit is the lex-min shared shingle")
    }
  }

  test("budget selection: greedy take-while matches brute force, budget never exceeded") {
    val rows = run("q303_budget_selection").collect()
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect().map { r =>
        val toks = r.getString(1).trim.split(" +")
        (r.getLong(0), toks.length.toLong, toks.distinct.length.toLong)
      }
    assert(rows.length === docs.length)
    val order = docs.sortBy(d => (-d._3, d._1))
    var cum = 0L
    val expectSel = order.map { d => cum += d._2; d._1 -> (cum <= 15000L) }.toMap
    val selMass = order.map(d => (d._1, d._2)).filter(x => expectSel(x._1)).map(_._2).sum
    assert(selMass <= 15000L)
    rows.foreach { r =>
      assert(r.getBoolean(4) === expectSel(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
    assert(rows.count(_.getBoolean(4)) > 0 && rows.exists(!_.getBoolean(4)))
  }

  test("skyline: sort-scan front equals the brute-force dominance check") {
    val rows = run("q304_skyline_parts").collect()
    val parts = Tables.load(spark, sf, "lineitem")
      .selectExpr("l_partkey",
        "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint) as c",
        "l_orderkey")
      .groupBy("l_partkey")
      .agg(sum("c").as("rev"), countDistinct("l_orderkey").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sky = parts.filter { a =>
      !parts.exists(b => b._2 >= a._2 && b._3 >= a._3 &&
        (b._2 > a._2 || b._3 > a._3))
    }.map(_._1).toSet
    assert(rows.map(_.getLong(0)).toSet === sky)
    assert(rows.nonEmpty && rows.length < parts.length)
  }

  test("daily percentiles: rank rule matches a per-day sorted brute force, bands ordered") {
    val rows = run("q305_daily_percentiles").collect()
    val byDay = Tables.events(spark, sf)
      .selectExpr("to_date(ts) as day",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents")
      .collect().groupBy(_.getDate(0).toString)
    assert(rows.map(_.getDate(0).toString).toSet === byDay.keySet)
    rows.take(30).foreach { r =>
      val vs = byDay(r.getDate(0).toString).map(_.getLong(1)).sorted
      val n = vs.length
      def pAt(q: Int): Long = vs(((q * n + 99) / 100 - 1).max(0))
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === pAt(50))
      assert(r.getLong(3) === pAt(90))
      assert(r.getLong(4) === pAt(99))
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
    }
  }

  test("restatement report: known+restated reconcile, pre-cutoff months fully known") {
    val rows = run("q306_restatement_report").collect()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(3) === r.getLong(2), r.toString)
      assert(r.getLong(1) >= 0L && r.getLong(3) >= 0L)
    }
    // months ending well before the cutoff (minus the 6-day max delay)
    // must be fully known; months starting after it fully restated
    val cut = java.time.LocalDate.parse("1998-07-01")
    rows.foreach { r =>
      val m = r.getDate(0).toLocalDate
      if (m.plusMonths(1).plusDays(6).isBefore(cut))
        assert(r.getLong(3) === 0L, s"$m should be fully known")
      if (m.isAfter(cut)) assert(r.getLong(1) === 0L, s"$m should be unknown")
    }
    assert(rows.exists(_.getLong(3) > 0L) && rows.exists(_.getLong(3) === 0L))
  }

  test("threshold sweep: monotone decreasing, tau=0.5 row equals q33's pair count") {
    val rows = run("q307_threshold_sweep").collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    rows.map(_.getLong(1)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b); case _ => ()
    }
    assert(rows.head.getLong(1) === run("q33_ngram_jaccard").count())
  }

  test("rare trigram rate: matches a brute-force corpus recount") {
    val rows = run("q308_rare_trigram_rate").collect()
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split(" +").toSeq
        .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq).toMap
    val corpus = docs.values.flatten.groupBy(identity).view.mapValues(_.size)
    assert(rows.length === docs.count(_._2.nonEmpty))
    rows.take(50).foreach { r =>
      val gs = docs(r.getLong(0))
      val rare = gs.count(g => corpus(g) < 5)
      assert(r.getLong(1) === gs.size.toLong)
      assert(r.getLong(2) === rare.toLong, s"doc ${r.getLong(0)}")
      assert(r.getDouble(3) === rare.toDouble / gs.size)
    }
  }

  test("seasonal index: indices average to 1 under the month masses") {
    val rows = run("q309_seasonal_index").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 12L))
    val tn = rows.map(_.getLong(1)).sum
    // sum of n_m * 12 / tn over months == 12 => mean index 1
    val meanIdx = rows.map(_.getDouble(3)).sum / 12.0
    assert(math.abs(meanIdx - 1.0) < 1e-9, meanIdx.toString)
    rows.foreach { r =>
      assert(r.getDouble(3) === r.getLong(1).toDouble * 12 / tn)
    }
  }

  test("join cardinality audit: exact side equals the real join count") {
    val r = run("q310_join_cardinality").collect()(0)
    val e = Tables.events(spark, sf)
    val real = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("a"))
      .join(e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("b")), "user_id")
      .count()
    assert(r.getLong(5) === real, "actual_rows must equal the materialized join")
    assert(r.getDouble(4) > 0.0 && r.getDouble(6) > 0.0)
    assert(r.getDouble(6) === r.getLong(5).toDouble / r.getDouble(4))
  }

  test("lsh config sweep: recall monotone in band count, 4x4 row matches q31+q33") {
    val rows = run("q311_lsh_config_sweep").collect()
    // more bands can only add candidate pairs => recall non-decreasing
    rows.sortBy(_.getLong(1)).map(_.getDouble(5)).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-12); case _ => ()
    }
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "hits cannot exceed candidates")
      assert(r.getLong(3) <= r.getLong(4), "hits cannot exceed truth")
    }
    // the production 4x4 config exists and has nonzero recall at sf0.001
    val p44 = rows.find(_.getString(0) == "4x4")
    assert(p44.nonEmpty && p44.get.getDouble(5) > 0.0)
  }

  test("nprobe sweep: recall monotone in nprobe, nprobe=8 matches q234's aggregate") {
    val rows = run("q312_nprobe_sweep").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 8L))
    rows.map(_.getDouble(3)).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-12); case _ => ()
    }
    // the nprobe=8 row must agree with q234's per-query recall audit
    val agg234 = run("q234_ann_recall").collect().map(_.getLong(1)).sum
    assert(rows.last.getLong(1) === agg234, "sweep forked from q234")
    assert(rows.last.getDouble(3) > 0.0)
  }

  test("build waterfall: stages monotone, reconcile with q70/q30/q67 components") {
    val rows = run("q313_build_waterfall").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("1_total", "2_non_bench", "3_decontaminated", "4_min_length",
        "5_exact_canonical", "6_neardup_rep", "7_image_rep", "8_audio_rep"))
    val n = rows.map(_.getLong(1))
    n.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => () }
    val docs = Tables.load(spark, sf, "documents")
    assert(n(0) === docs.count())
    assert(n(1) === docs.filter(col("doc_id") % 20 =!= 0).count())
    // q70's output is exactly the contaminated train docs
    assert(n(2) === n(1) - run("q70_decontaminate").count())
    assert(n(2) > n(3) - 1) // length gate can only drop
    // stage 6 re-derived from q67's clusters over stage-5 survivors
    val clusters = run("q67_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s5 = run("q30_exact_dedup").collect()
      .filter(_.getBoolean(3)).map(_.getLong(0)) // canonical…
    // (not identical filter chain; only sanity: stage6 <= stage5)
    assert(n(5) <= n(4) && s5.nonEmpty && clusters.nonEmpty)
  }

  test("quality dup audit: deciles partition the corpus, dup total equals q67's removals") {
    val rows = run("q314_quality_dup_audit").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L))
    val docs = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum === docs)
    // NTILE split: tile sizes differ by at most 1, non-increasing
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1L)
    val removed = run("q67_dedup_clusters")
      .filter(col("doc_id") =!= col("cluster_id")).count()
    assert(rows.map(_.getLong(2)).sum === removed)
    rows.foreach { r =>
      assert(r.getDouble(3) === r.getLong(2).toDouble / r.getLong(1))
    }
  }

  test("gate kappa: cells partition the corpus, kappa matches the closed form") {
    val r = run("q315_gate_kappa").collect()(0)
    val (n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val n = n11 + n10 + n01 + n00
    assert(n === Tables.load(spark, sf, "documents").count())
    val agree = n11 + n00
    val (a1, b1) = (n11 + n10, n11 + n01)
    val peNum = BigInt(a1) * b1 + BigInt(n - a1) * (n - b1)
    assert(r.getDouble(4) === agree.toDouble / n)
    assert(r.getDouble(5) === peNum.toDouble / (BigInt(n) * BigInt(n)).toDouble)
    val kappa = (BigInt(n) * BigInt(agree) - peNum).toDouble /
      (BigInt(n) * BigInt(n) - peNum).toDouble
    assert(r.getDouble(6) === kappa)
    assert(r.getDouble(6) >= -1.0 && r.getDouble(6) <= 1.0)
  }

  test("pack fragmentation: reconciles with q78 and the boundary-count bound") {
    val rows = run("q316_pack_fragmentation").collect()
    val docs = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum === docs)
    val packs = run("q78_pack_sequences").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(rs => (rs.map(_.getLong(2)).sum, rs.map(_.getLong(3)).sum))
    rows.foreach { r =>
      val (shard, nDocs, sumTok, nSplit, nFrag) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (pDocs, pTok) = packs(shard)
      assert(nDocs === pDocs && sumTok === pTok, s"shard $shard forked from q78")
      // offset packing: each pack boundary is crossed by at most ONE
      // doc, so extra fragments <= interior boundary count
      assert(nFrag - nDocs <= (sumTok - 1) / 2000, r.toString)
      assert(nSplit <= nFrag - nDocs, "a split doc has >= 2 fragments")
      assert(r.getDouble(5) === nSplit.toDouble / nDocs)
    }
  }

  test("semantic decontam: equals a brute-force max-cosine scan against the bench slice") {
    val rows = run("q317_semantic_decontam").collect()
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val bench = vecs.filter(_._1 % 20 == 0)
    val corpus = vecs.filter(_._1 % 20 != 0).toMap
    assert(rows.length === corpus.size)
    rows.foreach { r =>
      val e = corpus(r.getLong(0))
      val n2 = dot(e, e)
      val scored = bench.map { case (bid, be) =>
        (bid, dot(e, be) / math.sqrt(n2 * dot(be, be)))
      }
      val mx = scored.map(_._2).max
      val bestId = scored.filter(_._2 == mx).map(_._1).min
      assert(r.getDouble(2) === mx, s"vec ${r.getLong(0)}")
      assert(r.getLong(1) === bestId)
      assert(r.getLong(3) === scored.count(_._2 >= 0.4).toLong)
      assert(r.getBoolean(4) === (mx >= 0.4))
    }
  }

  test("dedup loser matrix: totals reconcile with q67 removals and q277's yield gap") {
    val rows = run("q318_dedup_loser_matrix").collect()
    val removed = run("q67_dedup_clusters")
      .filter(col("doc_id") =!= col("cluster_id")).count()
    assert(rows.map(_.getLong(2)).sum === removed)
    // per loser source, removed token mass == q277's raw - effective
    val byLoser = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    run("q277_effective_yield").collect().foreach { y =>
      val gap = y.getLong(2) - y.getLong(3)
      assert(byLoser.getOrElse(y.getString(0), 0L) === gap,
        s"source ${y.getString(0)} forked from q277")
    }
  }

  test("streaming LSH dedup emits exactly the batch q31 pair set") {
    val stream = run("q319_stream_lsh_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = run("q31_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stream === batch)
  }

  test("reshard plan: ring moves only to new nodes and moves less than mod") {
    val rows = run("q320_reshard_plan").collect()
    val docs = Tables.load(spark, sf, "documents").count()
    def tot(s: String, moved: Option[Boolean] = None) = rows
      .filter(r => r.getString(0) == s &&
        moved.forall(_ == r.getBoolean(4)))
      .map(_.getLong(3)).sum
    assert(tot("mod") === docs && tot("ring") === docs)
    // every ring-moved doc lands on one of the two ADDED nodes
    rows.filter(r => r.getString(0) == "ring" && r.getBoolean(4))
      .foreach(r => assert(r.getLong(2) >= 8L, r.toString))
    // consistent hashing must beat mod-rehash on migration volume
    assert(tot("ring", Some(true)) < tot("mod", Some(true)))
    // ring expectation: ~2/10 of docs move (generous 3x bound)
    assert(tot("ring", Some(true)) < docs * 6 / 10)
  }

  test("salt plan mixes factors and the adaptive join is result-invariant") {
    val plan = run("q321_salt_plan").collect()
    val factors = plan.map(_.getLong(2)).toSet
    assert(factors.size >= 2, s"degenerate plan: $factors")
    plan.foreach(r => assert(r.getLong(2) === (r.getLong(1) + 599) / 600))
    // the salted rollup equals the plain-join rollup bit-for-bit
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2))
    val salted = run("q322_adaptive_salted_join").collect().map(key).toSeq
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        Tables.dsumExpr(Tables.d2(col("l_extendedprice")) *
          Tables.d4(lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("s_nationkey")).collect().map(key).toSeq
    assert(salted === plain)
  }

  test("lsh bucket stats: each band partitions the corpus; candidates bound q31's pairs") {
    val rows = run("q323_lsh_bucket_stats").collect()
    val docs = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(0)).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    (0L to 3L).foreach { b =>
      val inBand = rows.filter(_.getLong(0) == b)
        .map(r => r.getLong(2) * r.getLong(1)).sum
      assert(inBand === docs, s"band $b does not partition the corpus")
    }
    rows.foreach(r => assert(r.getLong(3) ===
      r.getLong(2) * (r.getLong(1) * (r.getLong(1) - 1) / 2)))
    // every verified q31 pair collides in >= 1 band => candidate work
    // across bands bounds the verified pair count from above
    assert(rows.map(_.getLong(3)).sum >= run("q31_minhash_lsh").count())
  }

  test("pq codebook stats: every subspace accounts for all vectors within K codes") {
    val rows = run("q324_pq_codebook_stats").collect()
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 7L))
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= 16L)
      assert(r.getLong(4) === n, "assignment must cover every vector")
      assert(r.getLong(2) >= r.getLong(3))
      assert(r.getDouble(5) === r.getLong(2).toDouble / n)
    }
  }

  test("peak concurrency equals a brute-force interval sweep") {
    val rows = run("q325_peak_concurrency").collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    val W = 30L * 60 * 1000000
    val epoch = java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
    val evs = Tables.events(spark, sf).select(col("event_id"), col("ts"))
      .collect().map { r =>
        val us = java.time.temporal.ChronoUnit.MICROS.between(
          epoch, r.getAs[java.time.LocalDateTime](1))
        (r.getLong(0), us)
      }
    val pts = (evs.map { case (id, us) => (us * 2 + 1, id, 1L) } ++
      evs.map { case (id, us) => ((us + W) * 2, id, -1L) })
      .sortBy(p => (p._1, p._2))
    var conc = 0L
    val peaks = scala.collection.mutable.Map[java.time.LocalDate, Long]()
    pts.foreach { case (v, _, d) =>
      conc += d
      val day = java.time.LocalDateTime.ofEpochSecond(
        v / 2 / 1000000, 0, java.time.ZoneOffset.UTC).toLocalDate
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), conc)
    }
    assert(rows === peaks.toMap)
  }

  test("windowed funnel never outranks the unbounded q84 funnel and honors the 7-day box") {
    val w = run("q326_funnel_windowed").collect()
      .map(r => r.getLong(0) -> r).toMap
    val u = run("q84_funnel_stages").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(w.keySet === u.keySet, "stage-1 population must match q84")
    w.foreach { case (uid, r) =>
      assert(r.getLong(4) <= u(uid), s"user $uid gained a stage from the window")
      if (!r.isNullAt(2)) {
        val gap = java.time.temporal.ChronoUnit.MICROS.between(
          r.getAs[java.time.LocalDateTime](1), r.getAs[java.time.LocalDateTime](2))
        assert(gap > 0 && gap <= 7L * 24 * 3600 * 1000000, s"user $uid")
      }
    }
    // the corpus must actually exercise the dropout (else q326==q84)
    assert(w.values.map(_.getLong(4)).sum < u.values.sum)
  }

  test("cluster hub: one hub per q67 cluster, and no member out-degrees it") {
    val hubs = run("q327_cluster_hub").collect()
    val clusters = run("q67_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(hubs.map(_.getLong(0)).toSet === clusters.map(_._2).toSet)
    val pairs = run("q33_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byCluster = clusters.groupBy(_._2)
    hubs.foreach { r =>
      val (cid, hub, hubDeg) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val members = byCluster(cid).map(_._1)
      assert(members.contains(hub), s"hub $hub outside cluster $cid")
      assert(deg(hub) === hubDeg)
      members.foreach { m =>
        assert(deg(m) < hubDeg ||
          (deg(m) == hubDeg && m >= hub), s"member $m beats hub in $cid")
      }
      assert(r.getBoolean(4) === (hub === cid))
    }
  }

  test("ann scoreboard reconciles with the per-method recall audits") {
    val rows = run("q328_ann_scoreboard").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.keySet === Set("ivf", "pq_adc", "ivfpq", "matryoshka"))
    val ivf234 = run("q234_ann_recall").collect().map(_.getLong(1)).sum
    assert(rows("ivf")._1 === ivf234, "ivf row forked from q234")
    val mat260 = run("q260_matryoshka_recall").collect().map(_.getLong(1)).sum
    assert(rows("matryoshka")._1 === mat260, "matryoshka row forked from q260")
    val k = run("q35_knn_bruteforce").count()
    rows.values.foreach { case (nh, kt, rec) =>
      assert(kt === k)
      assert(nh <= kt)
      assert(rec === nh.toDouble / kt)
    }
  }

  test("delta ingest report: stages monotone and reconciled with the probe verdicts") {
    val rows = run("q329_delta_ingest_report").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("1_delta_total", "2_non_bench", "3_min_length",
        "4_decontaminated", "5_exact_new", "6_neardup_new",
        "7_image_new", "8_audio_new"))
    val n = rows.map(_.getLong(1))
    n.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => () }
    val docs = Tables.load(spark, sf, "documents")
    assert(n(0) === docs.filter(col("doc_id") % 10 === 0).count())
    assert(n(1) === docs.filter(col("doc_id") % 10 === 0 &&
      col("doc_id") % 20 =!= 0).count())
    // stage 6 drop == q285-flagged docs among stage-5 survivors
    val dup285 = run("q285_incremental_dedup")
      .filter(col("n_matches") > 0).collect().map(_.getLong(0)).toSet
    assert(n(4) - n(5) <= dup285.size)
    assert(n(4) - n(5) >= 0)
    // media stages compose q379/q381's verdicts: a stage-6 survivor
    // passes 7/8 iff its probe found no corpus match (on the planted
    // corpus every delta doc has group siblings, so both pin zero —
    // reconciled against the probes, not hard-coded)
    val imgDup = run("q379_image_incremental_dedup")
      .filter(col("n_matches") > 0).collect().map(_.getLong(0)).toSet
    val audDup = run("q381_audio_incremental_dedup")
      .filter(col("n_matches") > 0).collect().map(_.getLong(0)).toSet
    assert(n(5) - n(6) <= imgDup.size)
    assert(n(6) - n(7) <= audDup.size)
  }

  test("t-closeness equals a brute-force TVD over the full group x segment grid") {
    val rows = run("q330_t_closeness").collect()
    val cust = Tables.load(spark, sf, "customer")
      .selectExpr("c_nationkey", "cast(floor(c_acctbal / 1000) as long) b",
        "c_mktsegment").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getString(2)))
    val nn = cust.length.toLong
    val segTot = cust.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val byGroup = cust.groupBy(c => (c._1, c._2))
    assert(rows.length === byGroup.size)
    rows.foreach { r =>
      val g = byGroup((r.getAs[Number](0).longValue, r.getLong(1)))
      val nG = g.length.toLong
      assert(r.getLong(2) === nG)
      val segCnt = g.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val num = segTot.map { case (seg, nS) =>
        (BigInt(segCnt.getOrElse(seg, 0L)) * nn - BigInt(nS) * nG).abs
      }.sum
      val tvd = num.toDouble / (BigInt(nG) * nn * 2).toDouble
      assert(r.getDouble(3) === tvd, s"group ${r.get(0)}/${r.getLong(1)}")
      assert(r.getBoolean(4) === (tvd > 0.25))
    }
    // the corpus must exercise both verdicts
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)))
  }

  test("semantic threshold sweep: monotone, tau=0.4 row equals q99's pair count") {
    val rows = run("q332_semantic_threshold_sweep").collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
    rows.map(_.getLong(1)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b); case _ => ()
    }
    assert(rows.head.getLong(1) === run("q99_semantic_neardup_ivf").count())
  }

  test("interleave order: contiguous positions, rounds emit each live source once") {
    val rows = run("q333_interleave_order").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (1L to rows.length))
    // within a round every source appears at most once, sources sorted
    rows.groupBy(_._2).foreach { case (round, rs) =>
      val srcs = rs.sortBy(_._1).map(_._3)
      assert(srcs.distinct.length === srcs.length, s"round $round repeats a source")
      assert(srcs.sorted.toSeq === srcs.toSeq, s"round $round not source-sorted")
    }
    // rounds are non-increasing in width (sources exhaust, never revive)
    val widths = rows.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.length)
    widths.sliding(2).foreach { case Seq(a, b) => assert(a >= b); case _ => () }
    // no same-source adjacency while >= 2 sources are live
    rows.sortBy(_._1).sliding(2).foreach {
      case Array(a, b) =>
        if (widths(b._2.toInt - 1) >= 2)
          assert(a._3 != b._3, s"positions ${a._1},${b._1} same source")
      case _ => ()
    }
  }

  test("interleaved packing: lossless total, and packs draw from many sources") {
    val rows = run("q334_interleaved_packing").collect()
    val docs = Tables.load(spark, sf, "documents")
    assert(rows.map(_.getLong(1)).sum === docs.count())
    val totTok = docs
      .selectExpr("cast(size(split(trim(text), ' +')) as long) t")
      .collect().map(_.getLong(0)).sum
    assert(rows.map(_.getLong(2)).sum === totTok)
    assert(rows.map(_.getLong(0)).toSeq === rows.indices.map(_.toLong))
    // the point of interleaving: every full pack mixes sources (the
    // corpus has 20; a 2000-token pack holds ~26 docs)
    val nSources = docs.select(col("source")).distinct().count()
    rows.dropRight(1).foreach { r =>
      assert(r.getLong(3) >= math.min(nSources, 5L),
        s"pack ${r.getLong(0)} is source-clumped: ${r.getLong(3)} sources")
    }
  }

  test("planted canaries: every seeded near-dup is recovered by the q31 path") {
    val r = run("q335_planted_canaries").collect()(0)
    val planted = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 97 === 0).count()
    assert(r.getLong(0) === planted)
    // one appended token on a >=50-token doc keeps J far above 0.5;
    // the deterministic 16-perm estimate must recover every canary
    assert(r.getLong(1) === planted, "detector missed a planted canary")
    assert(r.getDouble(2) === 1.0)
  }

  test("matryoshka sweep: monotone in dims, full-dim rung exact, 8-dim rung == q260") {
    val rows = run("q336_matryoshka_sweep").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(8L, 16L, 32L, 64L))
    rows.map(_.getDouble(3)).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-12); case _ => ()
    }
    assert(rows.last.getDouble(3) === 1.0, "64-dim rung must be exact")
    val q260 = run("q260_matryoshka_recall").collect().map(_.getLong(1)).sum
    assert(rows.head.getLong(1) === q260, "8-dim rung forked from q260")
  }

  test("funnel summary reconciles with q326's per-user stages") {
    val r = run("q337_funnel_summary").collect()(0)
    val stages = run("q326_funnel_windowed").collect().map(_.getLong(4))
    assert(r.getLong(0) === stages.length.toLong)
    assert(r.getLong(1) === stages.count(_ >= 2).toLong)
    assert(r.getLong(2) === stages.count(_ >= 3).toLong)
    assert(r.getDouble(3) === r.getLong(1).toDouble / r.getLong(0))
  }

  test("jdbc roundtrip is rerun-idempotent and equals the direct parquet rollup") {
    // run TWICE in one session: overwrite mode must replace, not append
    run("q339_jdbc_roundtrip").collect()
    val viaJdbc = run("q339_jdbc_roundtrip").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val direct = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        Tables.dsumExpr(Tables.d2(col("o_totalprice"))).as("s"))
      .orderBy(col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaJdbc === direct)
  }

  test("weekly drift: KS in [0,1], week totals partition the corpus") {
    val rows = run("q341_weekly_drift").collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, r.toString)
    }
    // weeks are distinct Mondays in order
    val weeks = rows.map(_.getDate(0).toLocalDate)
    assert(weeks.distinct.length === weeks.length)
    weeks.foreach(w => assert(w.getDayOfWeek === java.time.DayOfWeek.MONDAY))
  }

  test("dataset card reconciles with the operators it summarizes") {
    val r = run("q342_dataset_card").collect()(0)
    assert(r.getLong(0) === Tables.load(spark, sf, "documents").count())
    assert(r.getLong(5) === run("q33_ngram_jaccard").count())
    assert(r.getLong(6) === run("q70_decontaminate").count())
    assert(r.getDouble(7) === r.getLong(1).toDouble / r.getLong(0))
  }

  test("doc lineage flags sum exactly to q313's waterfall counts") {
    val rows = run("q343_doc_lineage").collect()
    val wf = run("q313_build_waterfall").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length.toLong === wf("1_total"))
    assert(rows.count(!_.getBoolean(1)).toLong === wf("2_non_bench"))
    def live(r: org.apache.spark.sql.Row, upTo: Int): Boolean =
      !r.getBoolean(1) && (upTo < 2 || !r.getBoolean(3)) &&
        (upTo < 3 || !r.getBoolean(2))
    assert(rows.count(r => live(r, 2)).toLong === wf("3_decontaminated"))
    assert(rows.count(r => live(r, 3)).toLong === wf("4_min_length"))
    assert(rows.count(r => live(r, 3) && !r.getBoolean(4)).toLong ===
      wf("5_exact_canonical"))
    assert(rows.count(r => live(r, 3) && !r.getBoolean(4) &&
      !r.getBoolean(5)).toLong === wf("6_neardup_rep"))
    assert(rows.count(r => live(r, 3) && !r.getBoolean(4) &&
      !r.getBoolean(5) && !r.getBoolean(6)).toLong === wf("7_image_rep"))
    assert(rows.count(_.getBoolean(8)).toLong === wf("8_audio_rep"))
    // verdict coherence: kept implies it passed every gate, including
    // both media dedup stages
    rows.filter(_.getBoolean(8)).foreach { r =>
      assert(!r.getBoolean(1) && !r.getBoolean(2) && !r.getBoolean(3) &&
        !r.getBoolean(4) && !r.getBoolean(5) && !r.getBoolean(6) &&
        !r.getBoolean(7), r.toString)
    }
  }

  test("funnel window sweep: stages monotone in the window, 7-day row equals q326") {
    val rows = run("q344_funnel_window_sweep").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 3L, 7L, 14L))
    Seq(2, 3).foreach { c =>
      rows.map(_.getLong(c)).sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"col $c not monotone"); case _ => ()
      }
    }
    val q326 = run("q326_funnel_windowed").collect().map(_.getLong(4))
    val d7 = rows.find(_.getLong(0) == 7L).get
    assert(d7.getLong(1) === q326.length.toLong)
    assert(d7.getLong(2) === q326.count(_ >= 2).toLong)
    assert(d7.getLong(3) === q326.count(_ >= 3).toLong)
  }

  test("degree distribution: node-weighted sum equals twice the q33 pair count") {
    val rows = run("q345_degree_distribution").collect()
    val pairs = run("q33_ngram_jaccard").count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === 2 * pairs)
    assert(rows.map(_.getLong(0)).forall(_ >= 1L))
  }

  test("drift band attribution aligns with q341's weeks and emits real shares") {
    val rows = run("q346_drift_band_attribution").collect()
    val weeks341 = run("q341_weekly_drift").collect()
      .map(_.getDate(0).toLocalDate).toSet
    assert(rows.map(_.getDate(0).toLocalDate).toSet === weeks341)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("retention what-if: same kept count per policy, max-tokens dominates token mass") {
    val rows = run("q347_retention_whatif").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet === Set("1_min_id", "2_hub", "3_max_tokens"))
    // every policy keeps exactly one doc per cluster + all unclustered
    assert(rows.values.map(_._1).toSet.size === 1)
    val total = Tables.load(spark, sf, "documents").count()
    val removed = run("q67_dedup_clusters")
      .filter(col("doc_id") =!= col("cluster_id")).count()
    assert(rows("1_min_id")._1 === total - removed)
    // the quality proxy cannot keep FEWER tokens than any other policy
    assert(rows("3_max_tokens")._2 >= rows("1_min_id")._2)
    assert(rows("3_max_tokens")._2 >= rows("2_hub")._2)
  }

  test("source cards roll up exactly to the global dataset card") {
    val rows = run("q348_source_cards").collect()
    val card = run("q342_dataset_card").collect()(0)
    assert(rows.map(_.getLong(1)).sum === card.getLong(0))
    assert(rows.map(_.getLong(2)).sum === card.getLong(1))
    assert(rows.map(_.getLong(5)).sum === card.getLong(6))
    assert(rows.length.toLong === card.getLong(3))
  }

  test("leak source matrix marginals reconcile with q280 and q70") {
    val rows = run("q349_leak_source_matrix").collect()
    val sev = run("q280_leak_severity").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (bid, rs) =>
      assert(rs.map(_.getLong(2)).sum === sev(bid),
        s"bench $bid forked from q280")
    }
    // the union of train docs across cells == q70's contaminated set size
    assert(rows.map(_.getLong(2)).sum >= run("q70_decontaminate").count())
  }

  test("user type diversity: bounded by type count, equals a brute-force recount") {
    val rows = run("q350_user_type_diversity").collect()
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = evs.groupBy(_._1)
    assert(rows.length === byUser.size)
    rows.foreach { r =>
      val cs = byUser(r.getLong(0)).groupBy(_._2).map(_._2.length.toLong)
      val n = cs.sum
      assert(r.getLong(1) === n && r.getLong(2) === cs.size.toLong)
      val eff = (BigInt(n) * BigInt(n)).toDouble /
        cs.map(c => BigInt(c) * BigInt(c)).sum.toDouble
      assert(r.getDouble(3) === eff)
      assert(r.getDouble(3) >= 1.0 - 1e-12 &&
        r.getDouble(3) <= cs.size.toDouble + 1e-12)
    }
  }

  test("weighted jaccard covers the q33 pair set with scores in (0, 1]") {
    val rows = run("q351_weighted_jaccard").collect()
    val q33 = run("q33_ngram_jaccard").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.length === q33.size)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(q33(key) === r.getDouble(2), s"set score forked for $key")
      val wj = r.getDouble(3)
      assert(wj > 0.0 && wj <= 1.0, s"$key wj=$wj")
    }
  }

  test("asof tolerance: subset of q37's matches, fresh iff within the hour") {
    val tol = run("q352_asof_tolerance").collect()
      .map(r => r.getLong(0) -> r).toMap
    val q37 = run("q37_asof_join").collect().map(r => r.getLong(0) -> r).toMap
    assert(tol.keySet === q37.keySet, "click population must match q37")
    var dropped = 0
    tol.foreach { case (eid, r) =>
      val unlimited = q37(eid)
      if (!r.isNullAt(3)) {
        // a fresh match must BE q37's match
        assert(r.getLong(3) === unlimited.getLong(3), s"click $eid")
        assert(r.getBoolean(5))
      } else {
        assert(!r.getBoolean(5))
        if (!unlimited.isNullAt(3)) dropped += 1
      }
    }
    assert(dropped > 0, "the corpus must exercise staleness dropout")
  }

  test("propensity labels equal a brute-force strict-future scan") {
    val rows = run("q353_propensity_labels").collect()
    val H = 24L * 3600 * 1000000
    val epoch = java.time.LocalDateTime.of(1970, 1, 1, 0, 0)
    def us(t: java.time.LocalDateTime) =
      java.time.temporal.ChronoUnit.MICROS.between(epoch, t)
    val evs = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        us(r.getAs[java.time.LocalDateTime](2)), r.getString(3)))
    val purchases = evs.filter(_._4 == "purchase").groupBy(_._2)
    val clicks = evs.filter(_._4 == "click")
    assert(rows.length === clicks.length)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    clicks.foreach { case (eid, uid, t, _) =>
      val future = purchases.getOrElse(uid, Array.empty)
        .filter(p => p._3 > t)
        .sortBy(p => (p._3, p._1))
      val label = future.headOption.filter(_._3 - t <= H)
      val r = byId(eid)
      assert(r.getBoolean(3) === label.nonEmpty, s"click $eid")
      label.foreach { p =>
        assert(r.getLong(4) === p._3 - t)
        assert(r.getLong(5) === p._1)
      }
    }
  }

  test("temporal split embargo: partitions all events with a clean 24h purge gap") {
    val rows = run("q354_temporal_split_embargo").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet === Set("1_train", "2_embargo", "3_test"))
    assert(rows.values.map(_._1).sum === Tables.events(spark, sf).count())
    val E = 24L * 3600 * 1000000
    // the boundary invariants: train ends >= 24h before test begins
    assert(rows("1_train")._4 < rows("3_test")._3 - E + 1,
      "train bleeds into the embargo horizon")
    // embargo sits strictly between them
    assert(rows("2_embargo")._3 > rows("1_train")._4)
    assert(rows("2_embargo")._4 < rows("3_test")._3)
  }

  test("q371: TTL text dedup equals q319's replay set minus the watermark-evicted gap-3 pairs") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val replay = run("q319_stream_lsh_dedup").collect().map(key).toSet
    val ttl = run("q371_stream_lsh_dedup_ttl").collect().map(key).toSet
    assert(ttl.subsetOf(replay), "TTL form invented pairs the replay detector lacks")
    val suppressed = replay -- ttl
    assert(suppressed.nonEmpty, "nothing evicted — the TTL gate is vacuous at sf0.001")
    // exactly the pairs whose event-hours (doc_id mod 4) are 3 apart
    // fall out of the 90-minute window; everything in-window survives
    suppressed.foreach { case (a, b, _) =>
      assert(math.abs(a % 4 - b % 4) === 3, s"in-window pair ($a,$b) evicted")
    }
    replay.foreach { case p @ (a, b, _) =>
      if (math.abs(a % 4 - b % 4) <= 2) assert(ttl.contains(p), s"missing $p")
    }
  }

  test("q371: drained band buckets are PHYSICALLY removed, not just filtered") {
    // the EventTimeTimeout contract: once the watermark passes a
    // bucket's newest resident, the state row is deleted (state.remove)
    // — the metric that separates bounded state from state that merely
    // stops answering. A NoTimeout implementation reports 0 here.
    val base = s"${sys.props("java.io.tmpdir")}/graft_spec_lsh_ttl_${ProcessHandle.current().pid()}"
    val pairs = streaming.Streams.lshPairsTtlStream(spark, sf, base, "90 minutes")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-spec-ckpt")
    val name = "graft_spec_lsh_ttl"
    if (spark.catalog.tableExists(name)) spark.catalog.dropTempView(name)
    val q = pairs.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    try {
      val state = q.recentProgress.flatMap(Option(_)).flatMap(_.stateOperators)
      val removed = state.map(_.numRowsRemoved).sum
      assert(removed > 0,
        "no state rows physically removed — buckets linger filtered-but-resident")
    } finally {
      rmTree(new java.io.File(base)); rmTree(ckpt.toFile)
    }
  }

  test("index-seeded streaming image dedup: corpus near-dups flag statelessly and survive a cold restart") {
    // VERDICT r15 #6: a restarted detector must flag near-dups of
    // already-ingested corpus docs WITHOUT reprocessing corpus files —
    // the corpus side is saveImageIndex's parquet (stream-static join),
    // not band-bucket state, so a fresh checkpoint loses nothing.
    val ix = java.nio.file.Files.createTempDirectory("graft_spec_imgix").toString
    graft.multimodal.Multimodal.saveImageIndex(spark, sf, ix)
    def runOnce(tag: String): Set[(Long, Long, Int)] = {
      val base = s"${sys.props("java.io.tmpdir")}/graft_spec_imgix_src_" +
        s"${tag}_${ProcessHandle.current().pid()}"
      val pairs = streaming.Streams.imagePairsTtlStreamIndexed(
        spark, sf, base, "4 hours", ix)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-spec-ckpt-ix")
      val name = s"graft_spec_img_ix_$tag"
      if (spark.catalog.tableExists(name)) spark.catalog.dropTempView(name)
      val q = pairs.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      try spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      finally { rmTree(new java.io.File(base)); rmTree(ckpt.toFile) }
    }
    try {
      val first = runOnce("1")
      // every delta doc's scene group holds 4 corpus members at
      // planted distance <= 2 — all must surface with a CORPUS
      // partner even though the corpus never entered the stream
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(org.apache.spark.sql.functions.col("doc_id"))
        .collect().map(_.getLong(0))
      val ids = docs.toSet
      val expected = for {
        d <- docs.toSeq if d % 10 == 0
        m <- (d / 5 * 5) until (d / 5 * 5 + 5) if m != d && ids.contains(m)
      } yield (math.min(d, m), math.max(d, m))
      assert(expected.nonEmpty)
      val firstPairs = first.map(p => (p._1, p._2))
      expected.foreach(p =>
        assert(firstPairs.contains(p), s"missing corpus flag $p"))
      // COLD RESTART: new query, fresh checkpoint, empty state —
      // verdicts must be identical because the corpus side is the
      // persisted index, not state
      val second = runOnce("2")
      assert(second === first, "restart changed the verdict set")
    } finally rmTree(new java.io.File(ix))
  }

  test("index-seeded streaming text dedup: corpus matches come from the persisted LSH index and survive a cold restart") {
    // q385's restart contract (VERDICT r15 next-round #3): the corpus
    // side is saveLshIndex's parquet joined stream-static — no corpus
    // signature ever enters band-bucket state, so a fresh checkpoint
    // reproduces the identical pair set.
    val ix = java.nio.file.Files.createTempDirectory("graft_spec_lshix").toString
    graft.dedup.Dedup.saveLshIndex(spark, sf, ix)
    def runOnce(tag: String): Set[(Long, Long)] = {
      val base = s"${sys.props("java.io.tmpdir")}/graft_spec_lshix_src_" +
        s"${tag}_${ProcessHandle.current().pid()}"
      val pairs = streaming.Streams.lshPairsTtlStreamIndexed(
        spark, sf, base, "4 hours", ix)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-spec-ckpt-lx")
      val name = s"graft_spec_lsh_ix_$tag"
      if (spark.catalog.tableExists(name)) spark.catalog.dropTempView(name)
      val q = pairs.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      try spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally { rmTree(new java.io.File(base)); rmTree(ckpt.toFile) }
    }
    try {
      val first = runOnce("1")
      // every corpus partner must be a NON-delta doc reached through
      // the index (delta-delta pairs are the within-stream path), and
      // the corpus-hit set must be exactly q285's verified matches
      val verdicts = SparkEntry.queries("q285_incremental_dedup")(spark, sf)
        .collect()
      val expected = verdicts.filter(_.getLong(1) > 0)
        .map(r => (r.getLong(0), r.getLong(2))) // (new_doc, best_match)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
      expected.foreach(p =>
        assert(first.contains(p), s"missing corpus flag $p"))
      val second = runOnce("2")
      assert(second === first, "restart changed the verdict set")
    } finally rmTree(new java.io.File(ix))
  }

  test("index-seeded streaming audio dedup: corpus matches come from the persisted audio index and survive a cold restart") {
    val ix = java.nio.file.Files.createTempDirectory("graft_spec_audix").toString
    graft.multimodal.Audio.saveAudioIndex(spark, sf, ix)
    def runOnce(tag: String): Set[(Long, Long, Int)] = {
      val base = s"${sys.props("java.io.tmpdir")}/graft_spec_audix_src_" +
        s"${tag}_${ProcessHandle.current().pid()}"
      val pairs = streaming.Streams.audioPairsTtlStreamIndexed(
        spark, sf, base, "4 hours", ix)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-spec-ckpt-ax")
      val name = s"graft_spec_aud_ix_$tag"
      if (spark.catalog.tableExists(name)) spark.catalog.dropTempView(name)
      val q = pairs.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      try spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      finally { rmTree(new java.io.File(base)); rmTree(ckpt.toFile) }
    }
    try {
      val first = runOnce("1")
      // every delta doc's clip group (div 4) holds 3 corpus members at
      // planted distance <= 2 — all must surface with a corpus partner
      // even though the corpus never entered the stream
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(org.apache.spark.sql.functions.col("doc_id"))
        .collect().map(_.getLong(0))
      val ids = docs.toSet
      val expected = for {
        d <- docs.toSeq if d % 10 == 0
        m <- (d / 4 * 4) until (d / 4 * 4 + 4)
        if m != d && m % 10 != 0 && ids.contains(m)
      } yield (math.min(d, m), math.max(d, m))
      assert(expected.nonEmpty)
      val firstPairs = first.map(p => (p._1, p._2))
      expected.foreach(p =>
        assert(firstPairs.contains(p), s"missing corpus flag $p"))
      val second = runOnce("2")
      assert(second === first, "restart changed the verdict set")
    } finally rmTree(new java.io.File(ix))
  }

  test("index-seeded streaming semantic dedup: stateless probe matches the batch probe, corpus side is the IVF index, planted within-stream pairs emit, and the set survives a cold restart") {
    import org.apache.spark.sql.functions._
    val Sim = graft.sim.Similarity
    // --- never-fork pin on the REAL corpus: the streaming stateless
    // probe (higher-order array expr) must choose exactly the batch
    // probeBuckets bucket set for every delta vector
    val ix = java.nio.file.Files.createTempDirectory("graft_spec_semix").toString
    val v = Sim.vecs(spark, sf)
    Sim.saveIvfIndexOn(spark, v.filter(col("vec_id") % 10 =!= 0), ix)
    try {
      val cent = spark.read.parquet(s"$ix/centroids")
      val delta = v.filter(col("vec_id") % 10 === 0)
      val batchProbe = Sim.probeBuckets(
          delta.select(col("vec_id").as("query_id"),
            col("embedding").as("qe"), col("n2").as("qn")), cent)
        .groupBy(col("query_id"))
        .agg(sort_array(collect_list(col("cid"))).as("cids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val centArr = cent.agg(array_sort(collect_list(
        struct(col("cid"), col("ce"), col("cn")))).as("cents"))
      val streamProbe = delta.crossJoin(broadcast(centArr))
        .withColumn("cids",
          Sim.probeCidsExpr(col("cents"), col("embedding"), col("n2")))
        .select(col("vec_id"), col("cids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      assert(streamProbe === batchProbe,
        "stateless streaming probe forked from the batch probe rule")

      // --- full detector on the real corpus: every pair touches at
      // least one delta vector (the index side never self-pairs), and
      // a cold restart (fresh checkpoint + state) reproduces the set
      def runOnce(dir: String, tag: String): Set[(Long, Long, Double)] = {
        val base = s"${sys.props("java.io.tmpdir")}/graft_spec_semix_src_" +
          s"${tag}_${ProcessHandle.current().pid()}"
        val ixr = java.nio.file.Files
          .createTempDirectory(s"graft_spec_semix_$tag").toString
        val vv = Sim.vecs(spark, dir)
        Sim.saveIvfIndexOn(spark, vv.filter(col("vec_id") % 10 =!= 0), ixr)
        val pairs = streaming.Streams.semanticPairsStreamIndexed(
          spark, dir, base, "4 hours", ixr)
        val ckpt = java.nio.file.Files.createTempDirectory("graft-spec-ckpt-sx")
        val name = s"graft_spec_sem_ix_$tag"
        if (spark.catalog.tableExists(name)) spark.catalog.dropTempView(name)
        val q = pairs.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        try spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        finally { rmTree(new java.io.File(base)); rmTree(ckpt.toFile)
          rmTree(new java.io.File(ixr)) }
      }
      val first = runOnce(sf, "1")
      assert(first.nonEmpty)
      first.foreach { case (a, b, _) =>
        assert(a % 10 == 0 || b % 10 == 0,
          s"corpus-corpus pair ($a,$b) — the index side must never self-pair") }
      val second = runOnce(sf, "2")
      assert(second === first, "restart changed the verdict set")

      // --- planted synthetic corpus: three delta vectors share one
      // dominant base direction (same top-1 coarse bucket whatever the
      // quantizer sample picks), so the within-stream ttlPairs leg —
      // empty on the real corpora at spec scales — must emit all
      // three pairwise matches, including the same-micro-batch pair
      // (10,30), and the shared base partner must flag through the
      // index for each
      val synth = java.nio.file.Files
        .createTempDirectory("graft_spec_semsyn").toString
      val dim = 64
      def unit(ax: Int, sc: Float, ax2: Int = -1, sc2: Float = 0f) = {
        val a = Array.fill(dim)(0f); a(ax) = sc
        if (ax2 >= 0) a(ax2) = sc2
        a
      }
      // 36 ids = 32 base vectors exactly: EVERY base vector is a
      // centroid (hashCentroids takes IvfK = 32), so the planted
      // shared direction (base 5) is guaranteed a bucket of its own
      // and the three deltas provably share their top-1 bucket
      val rows = (0L until 36L).map { i =>
        val e = i match {
          case 0L  => unit(5, 0.8f, 12, 0.1f)   // delta, batch 0
          case 10L => unit(5, 0.9f)             // delta, batch 2
          case 30L => unit(5, 0.85f, 11, 0.05f) // delta, batch 2
          case _   => unit((i % dim).toInt, 1f) // orthogonal base/delta
        }
        (i, e, (i % 3).toInt)
      }
      spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$synth/embeddings.parquet")
      try {
        val planted = runOnce(synth, "3")
        val pairSet = planted.map(p => (p._1, p._2))
        Seq((0L, 10L), (0L, 30L), (10L, 30L)).foreach(p =>
          assert(pairSet.contains(p), s"missing within-stream pair $p"))
        Seq((5L, 10L), (0L, 5L), (5L, 30L)).foreach(p =>
          assert(pairSet.contains(p), s"missing corpus partner pair $p"))
        // orthogonal vectors must not pair: everything emitted involves
        // the planted direction
        val involved = Set(0L, 5L, 10L, 30L)
        pairSet.foreach { case (a, b) =>
          assert(involved.contains(a) && involved.contains(b),
            s"unplanted pair ($a,$b) emitted") }
      } finally rmTree(new java.io.File(synth))
    } finally rmTree(new java.io.File(ix))
  }

  test("replica bucket diff flags only faulted buckets and q98-equal replicas flag none") {
    // every emitted bucket must actually disagree on at least one field
    val d = run("q184_replica_bucket_diff").collect()
    assert(d.nonEmpty, "the seeded faults must surface")
    d.foreach { r =>
      val (na, xa, sa) = (r.get(1), r.get(2), r.get(3))
      val (nb, xb, sb) = (r.get(4), r.get(5), r.get(6))
      assert(na != nb || xa != xb || sa != sb, r.toString)
    }
  }
}
