package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.phash

/** Specs for the registered native expressions driven through real
  * Spark plans (codegen path), not direct kernel calls. */
class ExpressionsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.test()
  import spark.implicits._

  test("phash_array through SQL equals Tables.phash per element") {
    val df = Seq(Seq("alpha", "beta", "gamma")).toDF("xs")
    val viaExpr = df.select(call_function("phash_array", col("xs"))).head
      .getSeq[Long](0)
    val viaBuiltins = df.select(explode(col("xs")).as("x"))
      .select(phash(col("x"))).as[Long].collect.toSeq
    assert(viaExpr === viaBuiltins)
  }

  test("span_window_hashes via SQL equals the interpreted HOF formulation") {
    // texts exercising: no anchors, anchors mid-string, text shorter
    // than the window, exact-window-length text, repeated content
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again until done",
      ("shared corpus sentence number one with stable words " * 4).trim,
      "short",
      "x" * 40,
      "").toDF("text")
    val L = 40
    def h(sub: String): String =
      s"cast(conv(substring(md5(cast($sub as binary)), 1, 14), 16, 10) as bigint)"
    val hof = expr(
      s"""transform(
         |  filter(sequence(1, length(text) - ${L - 1}),
         |    i -> (ascii(substring(text, i, 1)) * 31
         |          + ascii(substring(text, i + 1, 1))) % 16 = 0),
         |  i -> ${h(s"substring(text, i, $L)")})""".stripMargin)
    val rows = docs.filter(length(col("text")) >= L).select(
      call_function("span_window_hashes", col("text"), lit(L)).as("native"),
      hof.as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), r.toString)
    }
    // below-window-length inputs yield an empty array, not an error
    val short = docs.filter(length(col("text")) < L)
      .select(call_function("span_window_hashes", col("text"), lit(L)))
      .collect()
    short.foreach(r => assert(r.getSeq[Long](0).isEmpty, r.toString))
  }

  test("word_shingles via SQL equals the interpreted HOF formulation") {
    val docs = Seq("the quick brown fox jumps", "one", "a b", "").toDF("text")
    val toks = split(trim(col("text")), " +")
    val hof = array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", try_element_at(toks, i),
        try_element_at(toks, i + 1), try_element_at(toks, i + 2))))
    val rows = docs.select(
      call_function("word_shingles", toks, lit(3)).as("native"),
      hof.as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("vec_dot: plain dot product on equal-length dense vectors") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val d = df.select(call_function("vec_dot", col("a"), col("b")))
      .as[Double].head
    assert(d === (4.0 + 10.0 + 18.0))
  }

  test("vec_dot: shorter right side or null element yields NULL (oracle fold)") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(Seq(1.0f, 2.0f), Seq(1.0f)),            // shorter right -> null
      Row(Seq(1.0f, null), Seq(1.0f, 2.0f)),      // null element -> null
      Row(Seq(1.0f), Seq(1.0f, 99.0f)))           // longer right ok -> 1.0
    val df = spark.createDataFrame(rows, schema)
    val got = df.select(call_function("vec_dot", col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(None, None, Some(1.0)))
  }

  test("simhash32 and minhash_sig run inside whole-stage codegen plans") {
    // spark.range source: a local Seq would be constant-folded into a
    // LocalTableScan at optimization time, bypassing codegen entirely.
    val df = spark.range(2)
      .select(concat(lit("a b c a word"), col("id").cast("string")).as("text"))
      .select(call_function("simhash32",
        call_function("phash_array", split(col("text"), " "))).as("sh"),
        call_function("minhash_sig",
          call_function("phash_mod_array", split(col("text"), " "))).as("sig"))
    val rows = df.collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getSeq[Long](1).length === functions.Hashing.K))
    // codegen actually engaged: "*(n)" marks a WholeStageCodegen stage;
    // an interpreted fallback would print a bare Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [simhash32"), plan)
  }

  test("MinHashMerge is a lawful mergeable sketch: identity, commutative, associative") {
    import functions.MinHashMerge
    val K = functions.Hashing.K
    def sig(seed: Long): Array[Long] =
      Array.tabulate(K)(i => (seed * 31 + i * 7919) % 100000)
    val (a, b, c) = (sig(3), sig(11), sig(42))
    def m(x: Array[Long], y: Array[Long]): Array[Long] =
      MinHashMerge.merge(MinHashMerge.reduce(MinHashMerge.zero, x),
        MinHashMerge.reduce(MinHashMerge.zero, y))
    // identity: zero merges to the element itself
    assert(MinHashMerge.merge(MinHashMerge.zero, a.clone()).toSeq === a.toSeq)
    // commutativity and associativity (fresh buffers each call — the
    // aggregator mutates its left argument by contract)
    assert(m(a.clone(), b.clone()).toSeq === m(b.clone(), a.clone()).toSeq)
    assert(MinHashMerge.merge(m(a.clone(), b.clone()), c.clone()).toSeq ===
      MinHashMerge.merge(a.clone(), m(b.clone(), c.clone())).toSeq)
    // min-of-union law: merged signature == per-slot min
    assert(m(a.clone(), b.clone()).toSeq ===
      a.zip(b).map { case (x, y) => math.min(x, y) }.toSeq)
    // null input signatures contribute nothing
    assert(MinHashMerge.reduce(MinHashMerge.reduce(MinHashMerge.zero, a.clone()), null)
      .toSeq === a.toSeq)
  }

  test("MinHashMerge udaf over groups equals the per-slot min of member signatures") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (1L, "a completely different sentence entirely here"),
      (1L, "the quick brown fox jumps over the dog again"),
      (2L, "another group with its own words")).toDF("g", "text")
    val sigs = df.select(col("g"), call_function("minhash_sig",
      call_function("phash_mod_array",
        call_function("word_shingles", split(col("text"), " +"), lit(3)))).as("sig"))
    val merged = sigs.repartition(8) // force partial aggregation + merge
      .groupBy(col("g"))
      .agg(udaf(functions.MinHashMerge,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())(col("sig"))
        .as("msig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val bySlotMin = sigs.collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
      .groupBy(_._1).map { case (g, ss) =>
        g -> ss.map(_._2).reduce((x, y) =>
          x.zip(y).map { case (p, q) => math.min(p, q) })
      }
    assert(merged.keySet === bySlotMin.keySet)
    merged.foreach { case (g, s) => assert(s === bySlotMin(g)) }
  }
}
