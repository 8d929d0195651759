package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Text-analysis operators for LLM-training-data pipelines (north-star
  * extension, BASELINE.json): token counting, quality scoring,
  * language ID, document fingerprinting. All are single-pass,
  * shuffle-free per-document projections built from codegen'd
  * built-ins — at 100 TB these run at scan speed with full column
  * pruning (only `doc_id`/`text` are read).
  */
object TextAnalysis {

  /** Whitespace tokens of a trimmed document. */
  def tokens(c: Column): Column = split(trim(c), " +")

  /** BPE-style pre-tokenization: word runs and individual
    * punctuation/symbol marks, the split a subword tokenizer applies
    * before merges — an upper-bound proxy for LLM token counts. ASCII
    * word classes in both engines (Java regex and RE2 agree). */
  val bpeIshPattern = "\\w+|[^\\w\\s]"

  /** Token/char statistics per document (token counting op):
    * whitespace tokens plus the BPE-ish pre-token count. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    spread(load(spark, dir, "documents")).select(
      col("doc_id"),
      length(col("text")).cast(LongType).as("n_chars"),
      size(tokens(col("text"))).cast(LongType).as("n_tokens"),
      size(array_distinct(tokens(col("text")))).cast(LongType)
        .as("n_unique_tokens"),
      size(regexp_extract_all(col("text"), lit(bpeIshPattern), lit(0)))
        .cast(LongType).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length/word-shape/stopword heuristics of the kind
    * used for pre-training corpus filtering (Gopher/C4-style rules). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast(DoubleType)
    val stop = Seq("the", "a", "of", "to", "and", "in", "is", "it")
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"), col("text"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("mean_token_len",
        (length(regexp_replace(trim(col("text")), " +", ""))
          .cast(DoubleType) / col("n_tokens")).cast(DoubleType))
      .withColumn("stopword_ratio",
        (size(filter(tokens(col("text")),
          t => t.isin(stop.map(lit(_)): _*))).cast(DoubleType) /
          col("n_tokens")))
      .withColumn("alpha_ratio",
        (length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
          .cast(DoubleType) / length(col("text")).cast(DoubleType)))
      .withColumn("passes_quality",
        col("n_tokens") >= 10 && col("mean_token_len") >= 2.0 &&
          col("mean_token_len") <= 12.0 && col("stopword_ratio") >= 0.0)
      .select(col("doc_id"), col("n_tokens"), col("mean_token_len"),
        col("stopword_ratio"), col("alpha_ratio"), col("passes_quality"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID by stopword evidence: score each candidate language by
    * hits from a tiny per-language marker lexicon, argmax via greatest
    * struct — one pass, no shuffle, no UDF. (An n-gram model slots in
    * the same shape; the corpus is synthetic so markers are heuristic.) */
  /** Marker lexicon shared by q28/q268/q301 — one definition so the
    * detector and every eval built on it can never fork. */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "una", "y"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "zh" -> Seq("de", "shi", "zai", "le", "wo"))

  private def langScore(lang: String): Column =
    struct(
      size(filter(tokens(col("text")),
        t => t.isin(langMarkers(lang).map(lit(_)): _*))).cast(LongType)
        .as("hits"),
      lit(lang).as("lang"))

  def languageId(spark: SparkSession, dir: String): DataFrame = {
    val best = greatest(langMarkers.keys.toSeq.sorted.map(langScore): _*)
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        best.getField("lang").as("predicted_lang"),
        best.getField("hits").as("marker_hits"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: min/max of portable 56-bit token-bigram
    * hashes ([[graft.Tables.phash]]) — a winnowing-style content
    * fingerprint usable as a cheap near-dup prefilter key. One
    * codegen'd pass (native word_ngrams + phash_array expressions,
    * [[graft.functions.Hashing]]), shuffle-free, oracle-checkable (the
    * hash is engine-portable). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"),
        call_function("phash_array",
          call_function("word_ngrams", tokens(col("text")), lit(2))).as("hs"))
      .select(col("doc_id"),
        array_min(col("hs")).as("fp_min"),
        array_max(col("hs")).as("fp_max"))
      .orderBy(col("doc_id"))

  /** Corpus-wide word frequency top-k: explode tokens → two-phase
    * count (map-side partial agg) → TakeOrderedAndProject. The
    * vocabulary-histogram primitive of corpus analysis; at 100 TB the
    * explode is narrow and only (word, count) partials shuffle. */
  def wordTopK(spark: SparkSession, dir: String): DataFrame =
    spread(load(spark, dir, "documents"))
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("word"))
      .limit(20)

  /** FEATURE HASHING (the "hashing trick" vectorizer): each document's
    * token stream mapped into a FIXED 1024-dim sparse vector — dim =
    * phash(tok) mod 1024, contribution ±1 by an independent hash bit
    * (the signed variant of Weinberger et al. 2009, which debiases the
    * collision expectation) — emitted as posting rows (doc_id, dim, w),
    * zero-cancelled dims dropped. The vocabulary-free featurizer a
    * 100 TB corpus needs: no dictionary to build/broadcast/version,
    * output width fixed regardless of vocabulary growth, and the whole
    * pass is explode → map-side-combinable count — one (doc_id, dim)
    * shuffle of pre-aggregated partials, nothing else. */
  def featureHashing(spark: SparkSession, dir: String): DataFrame = {
    val h = phash(col("tok"))
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), (h % 1024).as("dim"),
        (shiftright(h, 10).bitwiseAND(lit(1L)) * 2 - 1).as("sgn"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("sgn")).as("w"))
      .filter(col("w") =!= 0)
      .orderBy(col("doc_id"), col("dim"))
  }

  /** Conjunctive-search query terms — config constants (the shape is
    * parameterized by the term list; three mid-frequency vocabulary
    * words exercise lists of different lengths). */
  private val SearchTerms = Seq("join", "vector", "stream")

  /** Conjunctive keyword search (terms ANDed) via an inverted index:
    * documents containing ALL query terms, with each term's frequency.
    * The engine-side form of full-text AND search — the posting list
    * (term, doc_id, tf) is the index primitive, and a query touches
    * only its own terms' lists.
    *
    * Scale: the term predicate is applied to the exploded token stream
    * BEFORE any shuffle (Catalyst pushes the IN filter below the
    * aggregation), so only the query terms' postings — a vanishing
    * fraction of the corpus — ever leave the scan stage. At 100 TB the
    * posting table is materialized once, partitioned/bucketed BY TERM
    * (same layout idea as q64's date partitions: a query prunes to its
    * terms' files), and intersection starts from the shortest list;
    * the one-wide-row-per-doc pivot below is that intersection as a
    * single partial-aggregable pass, no join chain. */
  def invertedSearch(spark: SparkSession, dir: String): DataFrame =
    conjunctivePivot(spread(load(spark, dir, "documents"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(SearchTerms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf")))

  /** Shared intersection pivot over a (doc_id, tok, tf) posting set —
    * ONE definition serves the inline q108 scan and the persisted-
    * index probe (the two must never fork). */
  private def conjunctivePivot(postings: DataFrame): DataFrame = {
    val wide = postings.groupBy(col("doc_id")).agg(
      max(when(col("tok") === SearchTerms.head, col("tf"))).as(s"tf_${SearchTerms.head}"),
      SearchTerms.tail.map(t =>
        max(when(col("tok") === t, col("tf"))).as(s"tf_$t")): _*)
    SearchTerms.foldLeft(wide: DataFrame) { (df, t) =>
      df.filter(col(s"tf_$t").isNotNull)
    }.orderBy(col("doc_id"))
  }

  /** COLLOCATION detection: bigrams whose observed frequency beats
    * the independence expectation — lift = P(ab) / (P(a)·P(b)) — the
    * multiword-expression / phrase-mining primitive (PMI without the
    * log: a pure ratio of integer-derived doubles stays bit-portable
    * across engines, and log is monotone so the RANKING is the same).
    *
    * Scale: three partial-aggregable count passes over narrow
    * exploded streams (bigrams, unigrams, totals), then the join runs
    * on the aggregated vocabulary — corpus-cardinality-independent.
    * The n_ab ≥ 5 support floor is applied before the unigram joins,
    * so only frequent candidates join at all (the Apriori prune). */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = spread(load(spark, dir, "documents"))
      .select(tokens(col("text")).as("toks"))
    val uni = toks.select(explode(col("toks")).as("word"))
    val bg = toks.select(explode(
      call_function("word_ngrams", col("toks"), lit(2))).as("bigram"))
    val na = uni.groupBy(col("word")).agg(count(lit(1)).as("n"))
    val nab = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 5)
    val tot = uni.agg(count(lit(1)).as("t_tok"))
      .crossJoin(bg.agg(count(lit(1)).as("t_bg")))
    val lift = (col("n_ab").cast(DoubleType) * col("t_tok").cast(DoubleType)
        * col("t_tok").cast(DoubleType)) /
      (col("t_bg").cast(DoubleType) * col("n_a").cast(DoubleType)
        * col("n_b").cast(DoubleType))
    nab.crossJoin(broadcast(tot))
      .join(na.select(col("word"), col("n").as("n_a")),
        split(col("bigram"), " ").getItem(0) === col("word"))
      .drop("word")
      .join(na.select(col("word"), col("n").as("n_b")),
        split(col("bigram"), " ").getItem(1) === col("word"))
      .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"),
        lift.as("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(20)
  }

  /** Materialize the inverted index — build once, probe many (the
    * text twin of `Similarity.saveIvfIndex`): the full posting table
    * (tok, doc_id, tf) lands as parquet PARTITIONED BY TERM, so a
    * conjunctive query's scan prunes to its own terms' directories
    * (PartitionFilters — pinned in spec) and never touches the rest
    * of the vocabulary. This fixture's vocabulary is small enough to
    * partition per-term; a web-scale vocabulary hash-buckets terms
    * (`pmod(phash(tok), B)`) to bound directory count — same layout
    * rule, coarser key. */
  def saveTextIndex(spark: SparkSession, dir: String, indexDir: String): Unit =
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .write.mode("overwrite").partitionBy("tok").parquet(indexDir)

  /** Conjunctive search over a previously-saved index: byte-identical
    * results to [[invertedSearch]] (spec-pinned) without re-scanning
    * any document text — the read side touches only the query terms'
    * partitions. */
  def searchFromIndex(spark: SparkSession, indexDir: String): DataFrame =
    conjunctivePivot(spark.read.parquet(indexDir)
      .filter(col("tok").isin(SearchTerms: _*)))

  /** Winnowing fingerprint (Schleimer et al. — "rolling hash" local
    * fingerprinting): minima of an 8-wide window sliding over the
    * token-bigram hash sequence, deduped into the document's
    * fingerprint set. Guarantees shared fingerprints for sufficiently
    * long shared substrings — the plagiarism/near-dup detector's
    * selection step. Native codegen'd kernel
    * ([[graft.functions.WinnowMins]]); one narrow pass. */
  def winnowFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val W = 8
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"),
        call_function("winnow_mins",
          call_function("phash_array",
            call_function("word_ngrams", tokens(col("text")), lit(2))),
          lit(W)).as("wins"))
      .select(col("doc_id"),
        size(col("wins")).cast(LongType).as("n_windows"),
        size(array_distinct(col("wins"))).cast(LongType).as("n_fingerprints"),
        array_min(col("wins")).as("fp_global_min"),
        array_max(col("wins")).as("fp_minimax"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF top-3 terms per document — the classic salience ranking a
    * corpus search/labeling pipeline runs. Two-level aggregation: the
    * token explode shuffles once into (doc, tok) partials, document
    * frequency is a second shrink over the already-tiny (tok) domain,
    * and the corpus size rides in as a broadcast 1-row frame (never a
    * driver collect). Determinism: the score is one IEEE division of
    * integer-exact operands (tf·N and df), ties broken by token text.
    * At 100 TB the (doc, tok) partial aggregation is the only wide op
    * and map-side combine absorbs the explode. */
  def tfidfTopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(load(spark, dir, "documents"))
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("tok"))
    tf.join(dfreq, "tok")
      .join(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast(DoubleType) / col("df"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("tok"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Sketch-pruned EXACT heavy hitters: word bigrams occurring in at
    * least 1/1000 of all bigram occurrences (φ-heavy hitters). The
    * scale problem: exact counting shuffles the full (key, partial)
    * stream — at web scale the key domain alone can exceed memory. The
    * two-pass sketch shape bounds it: pass 1 builds a FIXED 256 KiB
    * [[graft.functions.Sketches.CountMinAgg]] sketch (partial-agg,
    * map-side combined); pass 2 probes the broadcast sketch per
    * occurrence with codegen'd Column arithmetic and drops every key
    * whose estimate is already below threshold BEFORE the exact count
    * shuffle. Count-Min never underestimates, so no true heavy hitter
    * is dropped and the surviving exact count + exact threshold produce
    * the exact answer — the oracle is the naive exact formulation. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Sketches
    val bigrams = spread(load(spark, dir, "documents"))
      .select(explode(call_function("word_ngrams",
        tokens(col("text")), lit(2))).as("bigram"))
    val withH = bigrams.withColumn("h", phash(col("bigram")))
    // one pass computes BOTH fixed-size global summaries: the sketch
    // and the total occurrence count the φ threshold needs
    val sketch = withH.agg(Sketches.cmsAgg(col("h")).as("cms"),
      count(lit(1)).as("total"))
    withH.join(broadcast(sketch))
      .filter(Sketches.cmsEstimate(col("h"), col("cms")) * 1000 >= col("total"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n_occurrences"), first(col("total")).as("total"))
      .filter(col("n_occurrences") * 1000 >= col("total"))
      .select(col("bigram"), col("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("bigram"))
  }

  /** Pure-SQL entry through the [[graft.GraftExtensions]] function
    * registry: per-language shingle statistics written as SQL TEXT
    * calling the native `word_shingles` Catalyst expression — the
    * SQL-only-caller story (a BI tool or `spark-sql` shell sees graft's
    * expressions as first-class functions; no Scala imports, no UDF
    * registration). The plan is identical to the DataFrame form: codegen
    * projection, partial aggregation, one lang shuffle. */
  def sqlShingleStats(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "documents").createOrReplaceTempView("graft_docs_sql")
    spark.sql(
      """WITH s AS (SELECT lang,
        |    word_shingles(split(trim(text), ' +'), 3) AS sh
        |  FROM graft_docs_sql)
        |SELECT lang, COUNT(*) AS n_docs,
        |  SUM(size(sh)) AS n_shingles,
        |  MIN(size(sh)) AS min_shingles,
        |  MAX(size(sh)) AS max_shingles
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin)
  }

  /** DICTIONARY ENCODING (the vocabulary counterpart of q177's
    * hashing trick): build a token→id dictionary with ids assigned by
    * frequency rank (freq DESC, token ASC — the id-0-is-most-frequent
    * layout every vocab file uses), then encode the corpus and emit a
    * per-document integer digest: token count, Σid, max id, and the
    * position-weighted checksum Σ(pos·id) that pins the ENCODED ORDER,
    * not just the multiset. Scale shape: the rank runs through
    * [[graft.ops.Windows.globalRankNoSort]] (two-level bucket rank —
    * the only unpartitioned window is over O(buckets) rows, never a
    * single-partition sort of the vocabulary), and the encode join
    * shuffles on the token key where both sides are already
    * pre-reduced (corpus side is (doc, pos, tok) postings, dictionary
    * side O(|V|)). All-integer output — nothing to drift. */
  def dictEncode(spark: SparkSession, dir: String): DataFrame = {
    val toks = spread(load(spark, dir, "documents"))
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val vocab = graft.ops.Windows.globalRankNoSort(freq, -col("n"),
        col("tok"), 16L, "token_id", "_nv")
      .select(col("tok"), col("token_id"))
    toks.join(vocab, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("token_id")).as("sum_tid"),
        max(col("token_id")).as("max_tid"),
        sum((col("pos") + 1).cast(LongType) * col("token_id"))
          .as("pos_weighted"))
      .orderBy(col("doc_id"))
  }

  /** BPE MERGE-CANDIDATE MINING — the counting step of
    * byte-pair-encoding training: adjacent character-pair frequencies
    * over the corpus, weighted by word frequency (count over word
    * TYPES × their occurrence counts, the standard BPE formulation),
    * top 20 pairs = the first merges a tokenizer trained on this
    * corpus would learn. Scale shape: pair generation runs over the
    * DISTINCT-token table (O(|V|) rows, not O(corpus tokens)), the
    * pair rollup partial-aggregates, and the top-k is a
    * TakeOrderedAndProject heap — no global sort. Single-char tokens
    * are filtered BEFORE the index sequence on both sides (Spark's
    * `sequence(1,0)` counts DOWN while DuckDB's generate_series is
    * empty — the guard keeps the engines off that divergent edge). */
  def bpeMergePairs(spark: SparkSession, dir: String): DataFrame = {
    val freq = spread(load(spark, dir, "documents"))
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .filter(length(col("tok")) >= 2)
    freq.select(col("n"), explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substr(tok, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(20)
  }

  /** TRIGRAM LANGUAGE-MODEL COUNTS: for every two-token context seen
    * ≥ 5 times with a given continuation, the top-3 next tokens by
    * count — the classic n-gram LM table (and the repetition/
    * memorization probe: a corpus whose contexts are too predictable
    * is template spam). Support filtering happens BEFORE the ranking
    * window on both sides — sound because rank orders by count DESC,
    * so sub-threshold rows can never sit above surviving ones — which
    * shrinks the window shuffle to the frequent tail. Scale shape:
    * trigram generation is a per-row codegen'd HOF over the token
    * array (no position self-join), the (ctx, next) rollup
    * partial-aggregates, and the per-context top-3 plans as
    * WindowGroupLimit. Docs under 3 tokens are filtered before the
    * index sequence (the q205 descending-sequence guard). */
  def trigramLm(spark: SparkSession, dir: String): DataFrame = {
    val grams = spread(load(spark, dir, "documents"))
      .select(tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 2), i -> struct(
          |  concat(element_at(toks, i), ' ', element_at(toks, i + 1)) AS ctx,
          |  element_at(toks, i + 2) AS nxt))""".stripMargin)).as("g"))
      .select(col("g.ctx"), col("g.nxt"))
    val counts = grams.groupBy(col("ctx"), col("nxt"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 5)
    val w = Window.partitionBy(col("ctx"))
      .orderBy(col("n").desc, col("nxt"))
    counts.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 3)
      .orderBy(col("ctx"), col("rank"))
  }

  /** BORDA-COUNT document selection — q212's fusion idea for CORPUS
    * CURATION: every document globally ranked twice (by token count
    * and by distinct-token richness — volume vs lexical diversity),
    * Borda score = rank sum, top-20 lowest kept. ALL-INTEGER fusion
    * (Borda needs no score calibration and no float at all), both
    * global rankings via [[graft.ops.Windows.globalRankNoSort]] so
    * neither ranking ever sorts the corpus in one partition; the final
    * top-20 is a heap. */
  def bordaSelect(spark: SparkSession, dir: String): DataFrame = {
    val stats = spread(load(spark, dir, "documents"))
      .select(col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"),
        size(array_distinct(tokens(col("text")))).cast(LongType)
          .as("n_distinct"))
    val r1 = graft.ops.Windows.globalRankNoSort(stats, -col("n_tokens"),
      col("doc_id"), 16L, "r_tokens", "_n1")
    val r2 = graft.ops.Windows.globalRankNoSort(r1, -col("n_distinct"),
      col("doc_id"), 16L, "r_distinct", "_n2")
    r2.select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("r_tokens"), col("r_distinct"),
        (col("r_tokens") + col("r_distinct")).as("borda"))
      .orderBy(col("borda"), col("doc_id"))
      .limit(20)
  }

  /** INCREMENTAL VOCABULARY UPDATE — q202's dictionary evolved the way
    * production vocabularies must: tokens already in the OLD
    * dictionary (built from the even-doc_id half of the corpus) KEEP
    * their ids; tokens the new half introduces get fresh ids starting
    * after max(old id), ranked by new-era frequency. Re-ranking from
    * scratch would renumber the whole vocabulary and invalidate every
    * embedding row trained against it — id stability IS the operator.
    * Output is a one-row audit: old size, added count, max id, and a
    * Z_p checksum Σ(id·phashMod(tok)) mod p that pins the ENTIRE id
    * assignment (any swapped pair changes it). Scale: two frequency
    * rollups + one anti-join on the token key; both rankings via the
    * two-level [[graft.ops.Windows.globalRankNoSort]]. */
  def vocabUpdate(spark: SparkSession, dir: String): DataFrame = {
    val toks = spread(load(spark, dir, "documents"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val oldF = toks.filter(col("doc_id") % 2 === 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val oldV = graft.ops.Windows.globalRankNoSort(oldF, -col("n"),
      col("tok"), 16L, "id", "_n").select(col("tok"), col("id"))
    val oldMax = oldV.agg(max(col("id")).as("m"))
    val newF = toks.filter(col("doc_id") % 2 =!= 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .join(oldV.select(col("tok")), Seq("tok"), "left_anti")
    val newV = graft.ops.Windows.globalRankNoSort(newF, -col("n"),
        col("tok"), 16L, "r", "_n2")
      .crossJoin(broadcast(oldMax))
      .select(col("tok"), (col("m") + col("r")).as("id"))
    oldV.withColumn("is_new", lit(false))
      .unionByName(newV.withColumn("is_new", lit(true)))
      .agg(
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_old"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_added"),
        max(col("id")).as("max_id"),
        (sum(((col("id") % P) * phashMod(col("tok"))) % P) % P)
          .as("id_checksum"))
  }

  /** BM25 RANKED RETRIEVAL (log-free variant) over the q108 query
    * terms, disjunctive: score = Σ_t idfS(t) · tf(k₁+1) / (tf + k₁·
    * (1−b+b·len/avglen)) with k₁=1.2, b=0.75 and the RATIO idf
    * surrogate idfS = (N−df+0.5)/(df+0.5) — the q82/q112 rule: no
    * query-time transcendentals, because ln() is not correctly-
    * rounded-portable across engines (production swaps ln(idfS) in;
    * the plan is identical). The length-saturation term — BM25's
    * actual contribution over TF-IDF — is preserved exactly.
    * Cross-engine determinism of the SUM over query terms: the terms
    * are pivoted to fixed columns and added in ONE spelled order
    * (never an aggregate fold over term rows). Scale: postings are
    * pruned to the query terms below the shuffle (the q108 plan), doc
    * lengths join slim, top-20 is a heap. */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(load(spark, dir, "documents"))
      .select(col("doc_id"), size(tokens(col("text"))).cast(LongType)
        .as("len"))
    val n = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("len")).as("total_len"))
    val tf = spread(load(spark, dir, "documents"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(col("tok").isin(SearchTerms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "tok")
      .join(docs, "doc_id").crossJoin(broadcast(n))
      .withColumn("idf",
        (col("n_docs").cast(DoubleType) - col("df") + lit(0.5)) /
          (col("df").cast(DoubleType) + lit(0.5)))
      .withColumn("avglen",
        col("total_len").cast(DoubleType) / col("n_docs"))
      .withColumn("sat",
        (col("tf").cast(DoubleType) * (lit(1.2) + lit(1.0))) /
          (col("tf").cast(DoubleType) + lit(1.2) *
            (lit(1.0) - lit(0.75) + lit(0.75) *
              (col("len").cast(DoubleType) / col("avglen")))))
      .withColumn("s", col("idf") * col("sat"))
    scored.groupBy(col("doc_id")).agg(
        max(when(col("tok") === SearchTerms(0), col("s"))).as("s0"),
        max(when(col("tok") === SearchTerms(1), col("s"))).as("s1"),
        max(when(col("tok") === SearchTerms(2), col("s"))).as("s2"))
      .withColumn("score", coalesce(col("s0"), lit(0.0)) +
        coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0)))
      .orderBy(col("score").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), col("score"))
  }

  /** PHRASE SEARCH via a POSITIONAL inverted index — the capability
    * q108's bag-of-words postings cannot express: occurrences of the
    * exact bigram "table hash" per document, found by the classic
    * positional-index adjacency join (term-A postings ⋈ term-B
    * postings on (doc, posA+1 = posB)). Scale shape: postings are
    * pruned to the two phrase terms BELOW the shuffle (scan-level IN
    * filter), and the adjacency condition is folded into the
    * (doc_id, next_pos) EQUI-key — never a positional range probe.
    * All integers. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val post = spread(load(spark, dir, "documents"))
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(col("tok").isin("table", "hash"))
    val a = post.filter(col("tok") === "table")
      .select(col("doc_id"), (col("pos") + 1).as("nxt"))
    val b = post.filter(col("tok") === "hash")
      .select(col("doc_id").as("doc_b"), col("pos").as("pos_b"))
    a.join(b, col("doc_id") === col("doc_b") && col("nxt") === col("pos_b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("doc_id"))
  }

  /** Shared q28/q268 oracle core: per doc the argmax marker language
    * (LIST_SORT DESC on (hits, lang) structs = greatest(struct...) on
    * the Spark side — both engines break hit ties by the LAST lang in
    * lexicographic order). */
  /** The sorted score-struct LIST (one definition — q28's argmax is
    * [1], q301's margin is [1].hits − [2].hits). */
  private val langScoresSql: String =
    """LIST_SORT([
      |    {'hits': CAST(LEN(LIST_FILTER(toks, t -> t IN ('der','die','das','und','ein'))) AS BIGINT), 'lang': 'de'},
      |    {'hits': CAST(LEN(LIST_FILTER(toks, t -> t IN ('the','and','of','is','a'))) AS BIGINT), 'lang': 'en'},
      |    {'hits': CAST(LEN(LIST_FILTER(toks, t -> t IN ('el','los','las','una','y'))) AS BIGINT), 'lang': 'es'},
      |    {'hits': CAST(LEN(LIST_FILTER(toks, t -> t IN ('le','la','et','les','des'))) AS BIGINT), 'lang': 'fr'},
      |    {'hits': CAST(LEN(LIST_FILTER(toks, t -> t IN ('de','shi','zai','le','wo'))) AS BIGINT), 'lang': 'zh'}
      |  ], 'DESC')""".stripMargin

  private val langIdInnerSql: String =
    s"""SELECT doc_id, lang, $langScoresSql[1] AS best
      |  FROM (SELECT doc_id, lang,
      |          STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks
      |        FROM documents)""".stripMargin

  /** LANGUAGE-ID CONFUSION MATRIX — the eval artifact behind q28's
    * predictions: predicted vs LABELED language counts (the documents
    * table carries ground-truth `lang`), the reliability readout that
    * decides whether the heuristic detector is fit to gate a corpus
    * (which cells bleed, which languages it cannot separate).
    * Composes q28's predictor verbatim — detector and eval can never
    * fork — then ONE partial-aggregable rollup to O(langs²) cells. */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    languageId(spark, dir)
      .groupBy(col("labeled_lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("labeled_lang"), col("predicted_lang"))

  /** KWIC (keyword-in-context) concordance — the search-result SNIPPET
    * renderer beside q108's conjunctive search and q242's phrase
    * search: every occurrence of the query term with its ±2-word
    * window, the human-readable hit context a retrieval UI shows and
    * an annotation pipeline samples for labeling. Per-row work only:
    * one tokenize + posexplode (the occurrence stream stays narrow —
    * doc_id, position, 5-token string; the document text itself never
    * shuffles), window bounds clamped with greatest/least so edge hits
    * keep a short window instead of erroring (ANSI mode: an
    * out-of-range slice would throw). Order (doc_id, pos) is total —
    * no tie hazard. */
  def kwicSnippets(spark: SparkSession, dir: String): DataFrame = {
    val term = "vector"
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"), split(trim(col("text")), " +").as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("n"), col("toks"),
        posexplode(col("toks")).as(Seq("pos0", "tok")))
      .filter(col("tok") === term)
      .withColumn("pos", col("pos0") + 1)
      .withColumn("st", greatest(lit(1), col("pos") - 2))
      .withColumn("en", least(col("n"), col("pos") + 2))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        concat_ws(" ",
          slice(col("toks"), col("st"), col("en") - col("st") + 1))
          .as("snippet"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** q282 — WITHIN-DOCUMENT repeated-bigram mass (the Gopher/
    * MassiveText repetition gate "fraction of tokens inside duplicated
    * n-grams", n=2): per doc, the share of bigram occurrences whose
    * bigram appears >= 2 times in that same doc. The q71 top-token
    * share catches a single hammered word; this catches the looping
    * PHRASE (boilerplate, template spam, decoding loops) a unigram
    * signal misses.
    *
    * Scale shape: bigram generation is a per-row `zip_with` over the
    * token array (codegen'd HOF, no position self-join), then ONE
    * (doc_id, bigram) partial-agg rollup and its per-doc fold — both
    * map-side-combinable; the text column never shuffles, only the
    * slim (doc_id, bigram) stream does. All counts are integers;
    * the fraction is ONE double division so both engines perform the
    * identical IEEE op. Docs with < 2 tokens have no bigrams and drop
    * out in both engines. */
  def repeatedBigramMass(spark: SparkSession, dir: String): DataFrame =
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(when(col("c") >= 2, col("c")).otherwise(lit(0L)))
          .as("dup_occ"))
      .select(col("doc_id"),
        col("n_bigrams").cast(LongType).as("n_bigrams"),
        col("dup_occ").cast(LongType).as("dup_occ"),
        (col("dup_occ").cast(DoubleType) / col("n_bigrams"))
          .as("dup_bigram_mass"))
      .orderBy(col("doc_id"))

  /** q283 — SIMPSON lexical diversity per document: 1 − Σ(c_i/n)² over
    * the token distribution, plus its inverse (the "effective
    * vocabulary size" n²/Σc²). The standard diversity gate that, unlike
    * q71's unique_ratio, weights by the full distribution shape — a doc
    * half-filled by two alternating tokens scores low here while its
    * unique_ratio can still look healthy. Entropy would be the textbook
    * choice but rides transcendental log (not bit-portable across
    * engines); Simpson is pure rational arithmetic: exact integer Σc²
    * and n, then ONE division (and one identical-order subtraction /
    * second independent division), so the gate hash-matches.
    *
    * Scale shape: same two-level (doc, tok) → doc partial-agg rollup
    * as q71 — map-side-combinable, text never shuffles. Σc² ≤ n² so
    * BIGINT never overflows for any doc under ~3B tokens. */
  def simpsonDiversity(spark: SparkSession, dir: String): DataFrame =
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_unique"),
        sum(col("c") * col("c")).as("sum_c2"))
      .select(col("doc_id"),
        col("n_tokens").cast(LongType).as("n_tokens"),
        col("n_unique").cast(LongType).as("n_unique"),
        col("sum_c2").cast(LongType).as("sum_c2"),
        (lit(1.0) - col("sum_c2").cast(DoubleType) /
          (col("n_tokens") * col("n_tokens"))).as("simpson_diversity"),
        ((col("n_tokens") * col("n_tokens")).cast(DoubleType) /
          col("sum_c2")).as("effective_vocab"))
      .orderBy(col("doc_id"))

  /** q286 — VOCABULARY COVERAGE curve (Zipf budget audit): the share
    * of corpus token MASS covered by the top-N vocabulary, for a
    * ladder of candidate vocab caps. The number a tokenizer budget
    * decision reads first: how much of the stream becomes <unk> (or
    * falls to byte-fallback) at each vocabulary size — q194's growth
    * curve asks how fast NEW types appear, this asks how much MASS
    * the head already holds; q202/q233 then assign the actual ids.
    *
    * Scale shape: one (tok) partial-agg rollup (map-side combined) to
    * O(|V|) counts; the frequency rank rides the shared two-level
    * globalRankNoSort — no single-partition sort anywhere; the per-cap
    * sums are ONE conditional aggregation over the ranked vocab
    * (O(|V|), output O(caps)). Exact integer masses; each coverage is
    * ONE double division. Caps are config constants sized to the
    * synthetic corpus' ~40-type vocabulary (production uses 2^k
    * ladders to 256k). */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val counts = spread(load(spark, dir, "documents"))
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val ranked = graft.ops.Windows.globalRankNoSort(
      counts, -col("n"), col("tok"), 1024L, "rk", "nv")
    val caps = Seq(5, 10, 20, 40)
    val aggCols = sum(col("n")).as("total") +:
      caps.map(k => sum(when(col("rk") <= k, col("n")).otherwise(lit(0L)))
        .as(s"c$k"))
    val agg = ranked.agg(aggCols.head, aggCols.tail: _*)
    val stacked = caps.map(k =>
      s"struct(CAST($k AS BIGINT) AS cap, CAST(c$k AS BIGINT) AS covered)")
      .mkString("array(", ", ", ")")
    agg.select(explode(expr(stacked)).as("s"), col("total"))
      .select(col("s.cap").as("vocab_cap"), col("s.covered").as("covered"),
        col("total").cast(LongType).as("total"),
        (col("s.covered").cast(DoubleType) / col("total")).as("coverage"))
      .orderBy(col("vocab_cap"))
  }

  /** q301 — LANGUAGE-ID CONFIDENCE MARGIN: the gap between the best
    * and second-best marker scores per doc — q28 says WHAT the
    * detector picked, q268 says how often it's right overall; this
    * says WHICH individual docs it barely decided (margin ≤ 1), the
    * triage queue a human-review or stronger-model pass works
    * through. Composes the SAME marker lexicon and struct-sort rule
    * (detector, eval, and triage can never fork); all-integer margin.
    * One codegen'd projection (score array + sort of 5 structs per
    * row), shuffle-free, text never leaves the scan. */
  def langMargin(spark: SparkSession, dir: String): DataFrame = {
    val scores = sort_array(
      array(langMarkers.keys.toSeq.sorted.map(langScore): _*), asc = false)
    spread(load(spark, dir, "documents"))
      .select(col("doc_id"), scores.as("s"))
      .select(col("doc_id"),
        element_at(col("s"), 1).getField("lang").as("predicted_lang"),
        (element_at(col("s"), 1).getField("hits") -
          element_at(col("s"), 2).getField("hits")).as("margin"))
      .withColumn("is_uncertain", col("margin") <= 1)
      .orderBy(col("doc_id"))
  }

  /** q308 — RARE-TRIGRAM RATE (the log-free perplexity surrogate):
    * per doc, the fraction of its trigram OCCURRENCES whose corpus
    * count is below 5 — a doc full of trigrams the corpus has barely
    * seen reads as disfluent/garbled to exactly the degree a real LM
    * would assign it high perplexity, and the ratio needs no
    * transcendental (the q82/q241 rule). The cheap fluency gate run
    * before paying for model-scored filtering; q210 builds the same
    * counts into an LM table, q276 reads split coverage — this scores
    * EVERY doc against the whole corpus.
    *
    * Scale shape: trigram generation is a per-row HOF (no position
    * self-join); the corpus count table is one (ctx,nxt)-rollup
    * joined back to the slim per-doc trigram stream; counts exact,
    * the rate ONE division. Docs with < 3 tokens drop in both
    * engines. */
  def rareTrigramRate(spark: SparkSession, dir: String): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 2), i ->
          |  concat(element_at(toks, i), ' ', element_at(toks, i + 1),
          |         ' ', element_at(toks, i + 2)))""".stripMargin)).as("tg"))
    val docGrams = grams(spread(load(spark, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("toks")))
    val corpus = docGrams.groupBy(col("tg")).agg(count(lit(1)).as("n"))
    docGrams.join(corpus, "tg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("n") < 5, lit(1L)).otherwise(lit(0L))).as("n_rare"))
      .select(col("doc_id"),
        col("n_trigrams").cast(LongType).as("n_trigrams"),
        col("n_rare").cast(LongType).as("n_rare"),
        (col("n_rare").cast(DoubleType) / col("n_trigrams"))
          .as("rare_rate"))
      .orderBy(col("doc_id"))
  }

  /** q315 — FILTER-GATE AGREEMENT (Cohen's kappa): chance-corrected
    * agreement between two document quality gates — the q27 heuristic
    * rule (n_tokens ≥ 10 ∧ 2 ≤ mean_token_len ≤ 12, restated
    * verbatim) and a lexical-diversity gate (2·distinct ≥ tokens, the
    * integer Simpson-ish rule) — the audit run before adding a new
    * filter to a pipeline: κ near 1 says the new gate is redundant
    * (it re-rejects what the old one rejects), κ near 0 says it
    * carries independent signal and both must run. Raw agreement
    * (p_o) alone overstates overlap when both gates pass nearly
    * everything; κ subtracts the chance term, which is why annotation
    * pipelines report it.
    *
    * Scale shape: ONE conditional-aggregation pass over the corpus →
    * a 2×2 table of exact BIGINT counts; κ's numerator N·agree −
    * (a1·b1 + a0·b0) and denominator N² − (a1·b1 + a0·b0) are exact
    * DECIMAL(38) products (no BIGINT overflow at corpus scale), each
    * ratio ONE correctly-rounded decimal→double cast + division,
    * mirrored digit-for-digit by the oracle's HUGEINT-via-VARCHAR
    * casts (the q236 pattern). Output is one row.
    *
    * Degenerate-marginal guard (the q236 NULL rule): pe_num = a1·b1 +
    * (n−a1)·(n−b1) equals n² — zeroing κ's denominator — only when
    * BOTH gates are unanimous in the SAME direction (a1=b1=0 or
    * a1=b1=n); a single unanimous gate gives numerator 0 over a
    * nonzero denominator, i.e. κ = 0, not NULL. In the true
    * both-unanimous case κ is mathematically undefined (chance
    * agreement is total), so both engines emit NULL instead of
    * ANSI-throwing; surfaced by the heaps-corpus soak, where both
    * gates pass every doc. */
  def gateKappa(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(tokens(col("text"))).cast(LongType)
    val mtl = length(regexp_replace(trim(col("text")), " +", ""))
      .cast(DoubleType) / nTok
    val gateA = nTok >= 10L && mtl >= 2.0 && mtl <= 12.0
    val gateB = size(array_distinct(tokens(col("text"))))
      .cast(LongType) * 2L >= nTok
    val cell = (p: Column, n: String) =>
      sum(when(p, 1L).otherwise(0L)).as(n)
    val g = spread(load(spark, dir, "documents")).agg(
      cell(gateA && gateB, "n11"), cell(gateA && !gateB, "n10"),
      cell(!gateA && gateB, "n01"), cell(!gateA && !gateB, "n00"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    g.select(col("n11"), col("n10"), col("n01"), col("n00"),
        (col("n11") + col("n10") + col("n01") + col("n00")).as("n"),
        (col("n11") + col("n00")).as("agree"),
        (col("n11") + col("n10")).as("a1"),
        (col("n11") + col("n01")).as("b1"))
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        (dec(col("a1")) * dec(col("b1")) +
          dec(col("n") - col("a1")) * dec(col("n") - col("b1"))).as("pe_num"),
        col("n"), col("agree"))
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        (col("agree").cast(DoubleType) / col("n")).as("po"),
        (col("pe_num").cast(DoubleType) /
          (dec(col("n")) * dec(col("n"))).cast(DoubleType)).as("pe"),
        when(dec(col("n")) * dec(col("n")) === col("pe_num"),
          lit(null).cast(DoubleType))
          .otherwise(
            (dec(col("n")) * dec(col("agree")) - col("pe_num")).cast(DoubleType) /
              (dec(col("n")) * dec(col("n")) - col("pe_num")).cast(DoubleType))
          .as("kappa"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q315_gate_kappa" -> gateKappa,
    "q308_rare_trigram_rate" -> rareTrigramRate,
    "q301_lang_margin" -> langMargin,
    "q286_vocab_coverage" -> vocabCoverage,
    "q282_repeated_bigram_mass" -> repeatedBigramMass,
    "q283_simpson_diversity" -> simpsonDiversity,
    "q252_kwic_snippets" -> kwicSnippets,
    "q268_lang_confusion" -> langConfusion,
    "q241_bm25_topk" -> bm25TopK,
    "q242_phrase_search" -> phraseSearch,
    "q233_vocab_update" -> vocabUpdate,
    "q223_borda_select" -> bordaSelect,
    "q210_trigram_lm" -> trigramLm,
    "q202_dict_encode" -> dictEncode,
    "q205_bpe_merge_pairs" -> bpeMergePairs,
    "q148_sql_shingle_stats" -> sqlShingleStats,
    "q82_tfidf_topk" -> tfidfTopK,
    "q85_heavy_hitters" -> heavyHitters,
    "q26_token_stats" -> tokenStats,
    "q27_quality_score" -> qualityScore,
    "q28_language_id" -> languageId,
    "q29_fingerprint" -> fingerprint,
    "q45_word_topk" -> wordTopK,
    "q59_winnow_fingerprint" -> winnowFingerprint,
    "q108_inverted_search" -> invertedSearch,
    "q112_collocations" -> collocations,
    "q177_feature_hashing" -> featureHashing)

  /** Every query here is oracle-checked. Determinism notes: ratios are a
    * single IEEE double division of integer-derived doubles (identical in
    * both engines); the fingerprint hash is the portable 56-bit md5
    * prefix ([[graft.Tables.phash]]); language-ID argmax is a struct max
    * with (hits, lang) field order, which both engines compare
    * lexicographically field-by-field. */
  val oracles: Map[String, String] = Map(
    // q315: same gate rules; HUGEINT products, VARCHAR-detour casts
    // (DuckDB's HUGEINT->DOUBLE direct cast is not correctly rounded)
    "q315_gate_kappa" ->
      """WITH d AS (SELECT STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks,
        |             text FROM documents),
        |c AS (SELECT CAST(LEN(toks) AS BIGINT) AS nt,
        |        CAST(LENGTH(REGEXP_REPLACE(TRIM(text), ' +', '', 'g'))
        |          AS DOUBLE) / CAST(LEN(toks) AS BIGINT) AS mtl,
        |        CAST(LEN(LIST_DISTINCT(toks)) AS BIGINT) AS nd
        |      FROM d),
        |f AS (SELECT (nt >= 10 AND mtl >= 2.0 AND mtl <= 12.0) AS ga,
        |        (nd * 2 >= nt) AS gb FROM c),
        |g AS (SELECT
        |    CAST(SUM(CASE WHEN ga AND gb THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |    CAST(SUM(CASE WHEN ga AND NOT gb THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |    CAST(SUM(CASE WHEN NOT ga AND gb THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        |    CAST(SUM(CASE WHEN NOT ga AND NOT gb THEN 1 ELSE 0 END) AS BIGINT) AS n00
        |  FROM f),
        |h AS (SELECT n11, n10, n01, n00,
        |    n11 + n10 + n01 + n00 AS n, n11 + n00 AS agree,
        |    CAST(n11 + n10 AS HUGEINT) AS a1,
        |    CAST(n11 + n01 AS HUGEINT) AS b1
        |  FROM g),
        |k AS (SELECT n11, n10, n01, n00, n, agree,
        |    a1 * b1 + (n - a1) * (n - b1) AS pe_num FROM h)
        |SELECT n11, n10, n01, n00,
        |  CAST(agree AS DOUBLE) / n AS po,
        |  CAST(CAST(pe_num AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(n AS HUGEINT) * n AS VARCHAR) AS DOUBLE) AS pe,
        |  CASE WHEN CAST(n AS HUGEINT) * n = pe_num THEN NULL
        |    ELSE CAST(CAST(CAST(n AS HUGEINT) * agree - pe_num AS VARCHAR) AS DOUBLE)
        |      / CAST(CAST(CAST(n AS HUGEINT) * n - pe_num AS VARCHAR) AS DOUBLE)
        |  END AS kappa
        |FROM k""".stripMargin,
    // q308: same trigram stream, same corpus-count join
    "q308_rare_trigram_rate" ->
      """WITH t AS (SELECT doc_id,
        |    STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |        UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
        |          i -> CONCAT_WS(' ', toks[i], toks[i+1], toks[i+2])))
        |          AS tg
        |      FROM t WHERE LEN(toks) >= 3),
        |c AS (SELECT tg, COUNT(*) AS n FROM g GROUP BY 1)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_trigrams,
        |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_rare,
        |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS BIGINT) AS rare_rate
        |FROM g JOIN c USING (tg)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q301: the same sorted score list; margin = [1].hits − [2].hits
    "q301_lang_margin" ->
      s"""WITH s AS (SELECT doc_id, $langScoresSql AS sc
        |  FROM (SELECT doc_id,
        |          STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks
        |        FROM documents))
        |SELECT doc_id, sc[1].lang AS predicted_lang,
        |  sc[1].hits - sc[2].hits AS margin,
        |  (sc[1].hits - sc[2].hits) <= 1 AS is_uncertain
        |FROM s ORDER BY doc_id""".stripMargin,
    "q286_vocab_coverage" -> {
      val caps = Seq(5, 10, 20, 40)
      val sums = caps.map(k =>
        s"CAST(SUM(CASE WHEN rk <= $k THEN n ELSE 0 END) AS BIGINT) AS c$k")
        .mkString(",\n|       ")
      val rows = caps.map(k =>
        s"SELECT CAST($k AS BIGINT) AS vocab_cap, c$k AS covered, total, " +
          s"CAST(c$k AS DOUBLE) / total AS coverage FROM s")
        .mkString("\n|UNION ALL ")
      s"""WITH t AS (SELECT
        |    UNNEST(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY 1),
        |r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk
        |      FROM c),
        |s AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
        |       $sums
        |      FROM r)
        |$rows
        |ORDER BY vocab_cap""".stripMargin
    },
    "q282_repeated_bigram_mass" ->
      """WITH t AS (SELECT doc_id,
        |    STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks FROM documents),
        |b AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
        |  FROM (SELECT doc_id, toks,
        |          UNNEST(GENERATE_SERIES(1, LEN(toks) - 1)) AS i
        |        FROM t WHERE LEN(toks) >= 2)),
        |c AS (SELECT doc_id, bg, COUNT(*) AS c FROM b GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
        |    AS dup_occ,
        |  CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(c) AS BIGINT) AS dup_bigram_mass
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q283_simpson_diversity" ->
      """WITH t AS (SELECT doc_id,
        |    UNNEST(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
        |d AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |        COUNT(*) AS n_unique,
        |        CAST(SUM(c * c) AS BIGINT) AS sum_c2
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_unique, sum_c2,
        |  1.0e0 - CAST(sum_c2 AS DOUBLE) / (n_tokens * n_tokens)
        |    AS simpson_diversity,
        |  CAST(n_tokens * n_tokens AS DOUBLE) / sum_c2
        |    AS effective_vocab
        |FROM d ORDER BY doc_id""".stripMargin,
    "q252_kwic_snippets" ->
      """WITH t AS (SELECT doc_id,
        |    STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks FROM documents),
        |e AS (SELECT doc_id, toks, LEN(toks) AS n,
        |    UNNEST(GENERATE_SERIES(1, LEN(toks))) AS pos FROM t)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |  ARRAY_TO_STRING(
        |    toks[GREATEST(1, pos - 2):LEAST(n, pos + 2)], ' ') AS snippet
        |FROM e WHERE toks[pos] = 'vector'
        |ORDER BY doc_id, pos""".stripMargin,
    "q242_phrase_search" ->
      """WITH t AS (SELECT doc_id,
        |    STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks FROM documents),
        |e AS (SELECT doc_id, toks,
        |    UNNEST(GENERATE_SERIES(1, LEN(toks))) AS pos FROM t),
        |x AS (SELECT doc_id, pos, toks[pos] AS tok FROM e
        |  WHERE toks[pos] IN ('table', 'hash'))
        |SELECT a.doc_id, COUNT(*) AS n_occurrences
        |FROM x a JOIN x b
        |  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        | AND a.tok = 'table' AND b.tok = 'hash'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q241_bm25_topk" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS BIGINT)
        |      AS len
        |  FROM documents),
        |nn AS (SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(len) AS BIGINT) AS total_len FROM d),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM (
        |    SELECT doc_id,
        |      UNNEST(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS tok
        |    FROM documents)
        |  WHERE tok IN ('join', 'vector', 'stream') GROUP BY 1, 2),
        |dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.tok,
        |    ((CAST(n_docs AS DOUBLE) - df + 0.5e0)
        |      / (CAST(df AS DOUBLE) + 0.5e0))
        |    * ((CAST(tf AS DOUBLE) * (1.2e0 + 1.0e0))
        |      / (CAST(tf AS DOUBLE) + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0
        |        * (CAST(len AS DOUBLE)
        |          / (CAST(total_len AS DOUBLE) / n_docs))))) AS s
        |  FROM tf JOIN dfq USING (tok) JOIN d USING (doc_id), nn),
        |w AS (SELECT doc_id,
        |    MAX(CASE WHEN tok = 'join' THEN s END) AS s0,
        |    MAX(CASE WHEN tok = 'vector' THEN s END) AS s1,
        |    MAX(CASE WHEN tok = 'stream' THEN s END) AS s2
        |  FROM sc GROUP BY 1)
        |SELECT doc_id, COALESCE(s0, 0.0e0) + COALESCE(s1, 0.0e0)
        |    + COALESCE(s2, 0.0e0) AS score
        |FROM w ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q233_vocab_update" ->
      s"""WITH t AS (SELECT doc_id,
        |    UNNEST(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS tok
        |  FROM documents),
        |o AS (SELECT tok, COUNT(*) AS n FROM t
        |  WHERE doc_id % 2 = 0 GROUP BY 1),
        |ov AS (SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok)
        |    AS BIGINT) AS id FROM o),
        |om AS (SELECT MAX(id) AS m FROM ov),
        |nf AS (SELECT tok, COUNT(*) AS n FROM t
        |  WHERE doc_id % 2 <> 0 GROUP BY 1),
        |nn AS (SELECT tok, n FROM nf
        |  WHERE tok NOT IN (SELECT tok FROM ov)),
        |nv AS (SELECT tok, om.m + ROW_NUMBER() OVER (ORDER BY n DESC, tok)
        |    AS id FROM nn, om),
        |mg AS (SELECT tok, id, FALSE AS is_new FROM ov
        |  UNION ALL SELECT tok, id, TRUE FROM nv)
        |SELECT
        |  CAST(SUM(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_old,
        |  CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_added,
        |  CAST(MAX(id) AS BIGINT) AS max_id,
        |  CAST(SUM(((id % ${P}) * ${phashModSql("tok")}) % ${P}) % ${P}
        |    AS BIGINT) AS id_checksum
        |FROM mg""".stripMargin,
    "q223_borda_select" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS BIGINT)
        |      AS n_tokens,
        |    CAST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), ' +')))
        |      AS BIGINT) AS n_distinct
        |  FROM documents),
        |r AS (SELECT doc_id, n_tokens, n_distinct,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id)
        |      AS BIGINT) AS r_tokens,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_distinct DESC, doc_id)
        |      AS BIGINT) AS r_distinct
        |  FROM s)
        |SELECT doc_id, n_tokens, n_distinct, r_tokens, r_distinct,
        |  r_tokens + r_distinct AS borda
        |FROM r ORDER BY borda, doc_id LIMIT 20""".stripMargin,
    "q210_trigram_lm" ->
      """WITH t AS (SELECT STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks
        |  FROM documents),
        |g3 AS (SELECT toks FROM t WHERE LEN(toks) >= 3),
        |e AS (SELECT toks,
        |    UNNEST(GENERATE_SERIES(1, LEN(toks) - 2)) AS i FROM g3),
        |g AS (SELECT toks[i] || ' ' || toks[i + 1] AS ctx,
        |    toks[i + 2] AS nxt FROM e),
        |c AS (SELECT ctx, nxt, COUNT(*) AS n FROM g
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |r AS (SELECT ctx, nxt, n,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY ctx
        |      ORDER BY n DESC, nxt) AS BIGINT) AS rank
        |  FROM c)
        |SELECT ctx, nxt, n, rank FROM r WHERE rank <= 3
        |ORDER BY ctx, rank""".stripMargin,
    "q202_dict_encode" ->
      """WITH t AS (SELECT doc_id,
        |    STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks FROM documents),
        |e AS (SELECT doc_id, toks,
        |    UNNEST(GENERATE_SERIES(1, LEN(toks))) AS pos FROM t),
        |x AS (SELECT doc_id, pos, toks[pos] AS tok FROM e),
        |f AS (SELECT tok, COUNT(*) AS n FROM x GROUP BY 1),
        |v AS (SELECT tok,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT)
        |      AS token_id FROM f)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(token_id) AS BIGINT) AS sum_tid,
        |  MAX(token_id) AS max_tid,
        |  CAST(SUM(pos * token_id) AS BIGINT) AS pos_weighted
        |FROM x JOIN v USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q205_bpe_merge_pairs" ->
      """WITH f AS (SELECT tok, COUNT(*) AS n FROM (
        |    SELECT UNNEST(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS tok
        |    FROM documents) GROUP BY 1),
        |g AS (SELECT tok, n FROM f WHERE LENGTH(tok) >= 2),
        |p AS (SELECT n, UNNEST(LIST_TRANSFORM(
        |        GENERATE_SERIES(1, LENGTH(tok) - 1),
        |        i -> SUBSTRING(tok, i, 2))) AS pair
        |      FROM g)
        |SELECT pair, CAST(SUM(n) AS BIGINT) AS n_occurrences
        |FROM p GROUP BY 1
        |ORDER BY n_occurrences DESC, pair LIMIT 20""".stripMargin,
    // sign bit and dim come from disjoint bit ranges of the same
    // portable 56-bit hash; all-integer arithmetic, no float anywhere
    "q177_feature_hashing" ->
      s"""WITH t AS (SELECT doc_id,
        |    UNNEST(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, ${phashSql("tok")} AS h FROM t)
        |SELECT doc_id, h % 1024 AS dim,
        |  CAST(SUM(((h >> 10) & 1) * 2 - 1) AS BIGINT) AS w
        |FROM h GROUP BY 1, 2
        |HAVING SUM(((h >> 10) & 1) * 2 - 1) <> 0
        |ORDER BY doc_id, dim""".stripMargin,
    "q148_sql_shingle_stats" ->
      s"""WITH t AS (SELECT lang,
        |    STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks FROM documents),
        |s AS (SELECT lang, ${graft.dedup.Dedup.shinglesSql} AS sh FROM t)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(LEN(sh)) AS BIGINT) AS n_shingles,
        |  CAST(MIN(LEN(sh)) AS BIGINT) AS min_shingles,
        |  CAST(MAX(LEN(sh)) AS BIGINT) AS max_shingles
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    // same clipped-tail bigram generation as q85; degenerate 1-token
    // grams carry no space, so the two unigram joins drop them on both
    // engines identically
    "q112_collocations" ->
      """WITH t AS (SELECT STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks
        |           FROM documents),
        |uni AS (SELECT UNNEST(toks) AS word FROM t),
        |bg AS (SELECT UNNEST(LIST_TRANSFORM(
        |         GENERATE_SERIES(0, GREATEST(LEN(toks)-2, 0)),
        |         i -> CONCAT_WS(' ', toks[i+1], toks[i+2]))) AS bigram
        |       FROM t),
        |na AS (SELECT word, COUNT(*) AS n FROM uni GROUP BY 1),
        |nab AS (SELECT bigram, COUNT(*) AS n_ab FROM bg
        |        GROUP BY 1 HAVING COUNT(*) >= 5),
        |tot AS (SELECT (SELECT COUNT(*) FROM uni) AS t_tok,
        |               (SELECT COUNT(*) FROM bg) AS t_bg)
        |SELECT bigram, n_ab, a.n AS n_a, b.n AS n_b,
        |  (CAST(n_ab AS DOUBLE) * CAST(t_tok AS DOUBLE)
        |     * CAST(t_tok AS DOUBLE))
        |   / (CAST(t_bg AS DOUBLE) * CAST(a.n AS DOUBLE)
        |     * CAST(b.n AS DOUBLE)) AS lift
        |FROM nab CROSS JOIN tot
        |JOIN na a ON a.word = STRING_SPLIT(bigram, ' ')[1]
        |JOIN na b ON b.word = STRING_SPLIT(bigram, ' ')[2]
        |ORDER BY lift DESC, bigram
        |LIMIT 20""".stripMargin,
    "q108_inverted_search" ->
      """WITH tok AS (SELECT doc_id,
        |               UNNEST(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS tok
        |             FROM documents),
        |p AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok
        |      WHERE tok IN ('join', 'vector', 'stream') GROUP BY 1, 2),
        |g AS (SELECT doc_id,
        |        MAX(CASE WHEN tok = 'join' THEN tf END) AS tf_join,
        |        MAX(CASE WHEN tok = 'vector' THEN tf END) AS tf_vector,
        |        MAX(CASE WHEN tok = 'stream' THEN tf END) AS tf_stream
        |      FROM p GROUP BY doc_id)
        |SELECT doc_id, tf_join, tf_vector, tf_stream FROM g
        |WHERE tf_join IS NOT NULL AND tf_vector IS NOT NULL
        |  AND tf_stream IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "q82_tfidf_topk" ->
      """WITH tok AS (SELECT doc_id,
        |               UNNEST(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, rank, tok, tf, df, score
        |FROM (SELECT doc_id, tok, tf, df,
        |        CAST(tf * n_docs AS DOUBLE) / df AS score,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY CAST(tf * n_docs AS DOUBLE) / df DESC, tok) AS rank
        |      FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    // exact φ-heavy-hitter formulation: the Spark plan's Count-Min
    // prune is lossless (no underestimates), so the naive SQL is the
    // oracle of the sketched plan
    "q85_heavy_hitters" ->
      """WITH t AS (SELECT STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks
        |           FROM documents),
        |bg AS (SELECT UNNEST(LIST_TRANSFORM(
        |         GENERATE_SERIES(0, GREATEST(LEN(toks)-2, 0)),
        |         i -> CONCAT_WS(' ', toks[i+1], toks[i+2]))) AS bigram
        |       FROM t),
        |tot AS (SELECT COUNT(*) AS total FROM bg)
        |SELECT bigram, COUNT(*) AS n_occurrences
        |FROM bg, tot
        |GROUP BY bigram, tot.total
        |HAVING COUNT(*) * 1000 >= tot.total
        |ORDER BY n_occurrences DESC, bigram""".stripMargin,
    "q26_token_stats" ->
      """SELECT doc_id,
        | LENGTH(text) AS n_chars,
        | LEN(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS n_tokens,
        | LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), ' +'))) AS n_unique_tokens,
        | LEN(REGEXP_EXTRACT_ALL(text, '\w+|[^\w\s]')) AS n_bpe_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q27_quality_score" ->
      """SELECT doc_id, n_tokens,
        | CAST(LENGTH(REGEXP_REPLACE(TRIM(text), ' +', '', 'g')) AS DOUBLE) / n_tokens AS mean_token_len,
        | CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), ' +'),
        |   t -> t IN ('the','a','of','to','and','in','is','it'))) AS DOUBLE) / n_tokens AS stopword_ratio,
        | CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |   / CAST(LENGTH(text) AS DOUBLE) AS alpha_ratio,
        | (n_tokens >= 10
        |   AND CAST(LENGTH(REGEXP_REPLACE(TRIM(text), ' +', '', 'g')) AS DOUBLE) / n_tokens >= 2.0
        |   AND CAST(LENGTH(REGEXP_REPLACE(TRIM(text), ' +', '', 'g')) AS DOUBLE) / n_tokens <= 12.0
        |   AND CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), ' +'),
        |     t -> t IN ('the','a','of','to','and','in','is','it'))) AS DOUBLE) / n_tokens >= 0.0)
        |   AS passes_quality
        |FROM (SELECT doc_id, text,
        |        LEN(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS n_tokens
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q28_language_id" ->
      s"""SELECT doc_id, lang AS labeled_lang,
        | best.lang AS predicted_lang, best.hits AS marker_hits
        |FROM ($langIdInnerSql)
        |ORDER BY doc_id""".stripMargin,
    // compose-don't-re-derive: the SAME inner predictor as q28, rolled
    // to the (labeled, predicted) confusion cells
    "q268_lang_confusion" ->
      s"""SELECT lang AS labeled_lang, best.lang AS predicted_lang,
        |  COUNT(*) AS n_docs
        |FROM ($langIdInnerSql)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q45_word_topk" ->
      """SELECT word, COUNT(*) AS n_occurrences
        |FROM (SELECT UNNEST(STRING_SPLIT_REGEX(TRIM(text), ' +')) AS word
        |      FROM documents)
        |GROUP BY word
        |ORDER BY n_occurrences DESC, word
        |LIMIT 20""".stripMargin,
    "q59_winnow_fingerprint" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks
        |           FROM documents),
        |bg AS (SELECT doc_id,
        |         LIST_TRANSFORM(GENERATE_SERIES(0, GREATEST(LEN(toks)-2, 0)),
        |           i -> CONCAT_WS(' ', toks[i+1], toks[i+2])) AS bigrams
        |       FROM t),
        |h AS (SELECT doc_id, LIST_TRANSFORM(bigrams,
        |        b -> ('0x' || substring(md5(b),1,14))::BIGINT) AS hs FROM bg),
        |w AS (SELECT doc_id,
        |        LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(hs)-7, 1)),
        |          i -> LIST_MIN(hs[i : i+7])) AS wins
        |      FROM h)
        |SELECT doc_id,
        | CAST(LEN(wins) AS BIGINT) AS n_windows,
        | CAST(LEN(LIST_DISTINCT(wins)) AS BIGINT) AS n_fingerprints,
        | LIST_MIN(wins) AS fp_global_min,
        | LIST_MAX(wins) AS fp_minimax
        |FROM w
        |ORDER BY doc_id""".stripMargin,
    "q29_fingerprint" ->
      """SELECT doc_id,
        | LIST_MIN(LIST_TRANSFORM(bigrams,
        |   b -> ('0x' || substring(md5(b),1,14))::BIGINT)) AS fp_min,
        | LIST_MAX(LIST_TRANSFORM(bigrams,
        |   b -> ('0x' || substring(md5(b),1,14))::BIGINT)) AS fp_max
        |FROM (
        |  SELECT doc_id,
        |    LIST_TRANSFORM(GENERATE_SERIES(0, GREATEST(LEN(toks)-2, 0)),
        |      i -> CONCAT_WS(' ', toks[i+1], toks[i+2])) AS bigrams
        |  FROM (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), ' +') AS toks
        |        FROM documents)
        |)
        |ORDER BY doc_id""".stripMargin)
}
