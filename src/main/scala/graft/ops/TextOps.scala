package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-data-pipeline text operators over `documents` (driver north star,
  * SURVEY.md §2.11): exact dedup, fingerprinting, token statistics,
  * term frequency, quality scoring, and near-duplicate detection (exact
  * shingle-Jaccard with metadata blocking; MinHash-LSH as the 100 TB
  * candidate-generation path).
  *
  * Scale notes: every operator is a shuffle-partitioned groupBy/join on a
  * key with bounded per-key cardinality — no driver-side collection. The
  * exact-Jaccard pair join is blocked on (lang, source) so candidate pairs
  * stay O(block²) with constant block size; at 100 TB the MinHash-LSH
  * banding query generates candidates instead (same shape: groupBy band
  * bucket), which is the standard sub-quadratic path.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** Tokens + distinct word-bigram shingles via the native BigramShingles
    * expression (graft.functions) — semantically identical to
    * array_distinct(transform(sequence(0, n-2), i -> tokens[i]||' '||tokens[i+1]))
    * and to the oracle's DuckDB list_distinct(list_transform(...)), but one
    * JVM loop per doc instead of interpreted per-element lambdas. */
  private[ops] def withShingles(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("tokens", split(col("text"), " "))
      .withColumn("shingles",
        graft.functions.GraftFunctions.bigramShingles(col("tokens")))
  }

  /** Exact dedup by full text content: one group per distinct text,
    * keep-lowest-id representative. (Content-hash groupBy — at scale,
    * group on xxhash64(text) instead of text to shrink shuffle keys;
    * text groupBy keeps the oracle twin trivial and is semantically
    * identical absent hash collisions.) */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), md5(col("text")).as("fingerprint"))
      .orderBy(col("keep_id"))

  /** Exact dedup, 100 TB shuffle-key variant: group on xxhash64(text)
    * instead of the text itself — the shuffle key shrinks from full
    * document bytes to 8 bytes, which is what makes content dedup viable
    * when documents are megabytes. Result is identical to dedupExact
    * absent 64-bit collisions (~N²/2⁶⁵), so it shares the SAME DuckDB
    * oracle (group-by-text) — the hash is only the shuffle key, never the
    * output. */
  def dedupHashKey(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(xxhash64(col("text")).as("_h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
        first(col("text")).as("_text"))
      .select(col("keep_id"), col("n_copies"), md5(col("_text")).as("fingerprint"))
      .orderBy(col("keep_id"))

  /** Per-document fingerprint (md5 — identical builtin in DuckDB, so the
    * whole fingerprint column is oracle-checkable). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), md5(col("text")).as("fingerprint"),
        length(col("text")).as("text_len"))
      .orderBy(col("doc_id"))

  /** Token counting + type-token ratio per document. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("tokens", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("tokens")).as("n_tokens"),
        size(array_distinct(col("tokens"))).as("n_unique"),
        round(size(array_distinct(col("tokens"))).cast("double") / size(col("tokens")), 6)
          .as("ttr"))
      .orderBy(col("doc_id"))

  /** Per-language corpus stats (the language-ID *consumer* side; lang here
    * is ground truth from the table). */
  def langStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 6).as("avg_chars"),
        round(avg(col("n_tokens")), 6).as("avg_tokens"),
        sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"))

  /** Corpus term frequency: explode tokens, count, top 30. */
  def termFreq(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(30)

  /** Zipf rank–frequency fit: every term's global frequency rank (count
    * desc, term asc — tie-free) via [[ScaledRank.withGlobalRanks]]'s
    * range-partitioned two-phase pass (vocabularies run to hundreds of
    * millions of terms at 100 TB — no single-task Window.orderBy), the
    * log–log OLS slope over the WHOLE vocabulary (Zipf's law predicts
    * ≈ −1; deviation flags synthetic/spammy corpora), and the top 30
    * ranked terms as the inspection sample. The slope is a 1-row
    * aggregate broadcast back onto the bounded top-k. */
  def zipfFit(s: SparkSession, dir: String): DataFrame = {
    val tf = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
    val ranked = ScaledRank.withGlobalRanks(tf,
      Seq(col("n").desc, col("term").asc), Seq(col("n"), col("term")))
      .select(col("term"), col("n"), col("rn").as("rank"))
      .persist() // q-cache: scanned twice — whole-vocab slope + bounded top-k
    // OLS on 2^-10-quantized lnDet values (not regr_slope(ln, ln)): the
    // per-row int64s and their sums are exact on both engines — neither
    // libm's not-correctly-rounded ln nor float summation ORDER (a
    // whole-vocab regr_slope accumulates in engine-dependent order) can
    // move the 6-dp fit. Scale 2^10 keeps Σxq², Σxq·yq within int64 out
    // to ~10⁹ distinct terms (ln ≤ 64 ⇒ q ≤ 65 536, q² ≤ 4.3e9); the
    // cross-products then run in fixed-order IEEE double because m·Σxy
    // itself can exceed int64 at that scale.
    val rq = ranked.select(
      floor(lnDet(col("rank")) * lit(1024.0)).cast("long").as("xq"),
      floor(lnDet(col("n")) * lit(1024.0)).cast("long").as("yq"))
    val fit = rq
      .agg(count(lit(1)).as("m"),
        sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
        sum(col("xq") * col("yq")).as("sxy"),
        sum(col("xq") * col("xq")).as("sxx"))
      .select(round(
        (col("m").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double")) /
          (col("m").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")),
        6).as("zipf_slope"))
    ranked.filter(col("rank") <= 30)
      .crossJoin(broadcast(fit))
      .select(col("rank"), col("term"), col("n"), col("zipf_slope"))
      .orderBy(col("rank"))
  }

  /** Heaps'-law vocabulary-growth fit (Heaps 1978; the corpus-statistics
    * companion to [[zipfFit]]): distinct-vocabulary size V as a function
    * of corpus token count n over 20 FIXED doc-id-prefix checkpoints,
    * plus the log–log OLS slope β (natural text ⇒ β ≈ 0.4–0.6; β → 0
    * a closed vocabulary). The token unit is the word BIGRAM — on the
    * fixture's closed ~31-word vocabulary, unigram V saturates at the
    * first checkpoint (β = 0 exactly, the degenerate diagnosis), while
    * the bigram space keeps growing and exercises the whole fit. The
    * cumulative-distinct count never re-scans prefixes: a term
    * contributes to the checkpoint of its FIRST occurrence, so the whole
    * curve is one explode + two keyed aggregates + a cumsum over the
    * bounded 20-row checkpoint relation (fixed size at ANY corpus scale
    * — checkpoints are quantiles of the doc-id space, not fixed-width
    * blocks). */
  /** (doc_id, bigram) rows — the word-bigram explode shared by
    * [[heapsLaw]], [[ngramNovelty]], and [[burstiness]]. */
  private def bigrams(d: DataFrame): DataFrame =
    d.withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(expr("zip_with(slice(t, 1, size(t) - 1), " +
          "slice(t, 2, size(t) - 1), (a, b) -> concat(a, ' ', b))"))
          .as("term"))

  def heapsLaw(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val nAgg = d.agg(count(lit(1)).as("nd"))
    val toks = bigrams(d).crossJoin(broadcast(nAgg))
      .withColumn("ck", least(lit(20L), expr("(doc_id * 20) div nd") + 1L))
    val newTerms = toks.groupBy(col("term"))
      .agg(min(col("ck")).as("ck"))
      .groupBy(col("ck")).agg(count(lit(1)).as("new_terms"))
    val tokCnt = toks.groupBy(col("ck")).agg(count(lit(1)).as("toks"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ck"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // 20-row relation: the global window is bounded by construction.
    // LEFT join: a checkpoint can introduce ZERO new terms on a
    // closed-vocabulary corpus — an inner join would silently drop its
    // row (the clusterSplit full-outer lesson, ADVICE r10)
    val curve = tokCnt.join(newTerms, Seq("ck"), "left")
      .na.fill(0L, Seq("new_terms"))
      .withColumn("n_tokens", sum(col("toks")).over(w))
      .withColumn("vocab", sum(col("new_terms")).over(w))
      .select(col("ck"), col("n_tokens"), col("vocab"))
      .persist() // q-cache
    // OLS on 2^-20-quantized lnDet values — the [[zipfFit]] discipline,
    // and on this FIXED 20-row curve the cross-products stay exact int64
    // end to end (ln ≤ 28 ⇒ q ≤ 3e7, m·Σxy ≤ 3.4e17): the slope is an
    // exact rational until its one closing IEEE division
    val cq = curve.select(
      floor(lnDet(col("n_tokens")) * lit(1048576.0)).cast("long").as("xq"),
      floor(lnDet(col("vocab")) * lit(1048576.0)).cast("long").as("yq"))
    val fit = cq
      .agg(count(lit(1)).as("m"),
        sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
        sum(col("xq") * col("yq")).as("sxy"),
        sum(col("xq") * col("xq")).as("sxx"))
      .select(round(
        (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("m") * col("sxx") - col("sx") * col("sx")).cast("double"),
        6).as("heaps_beta"))
    curve.crossJoin(broadcast(fit))
      .select(col("ck"), col("n_tokens"), col("vocab"), col("heaps_beta"))
      .orderBy(col("ck"))
  }

  /** Per-document n-gram NOVELTY (the memorization/boilerplate profile
    * used to rank documents for curation, cf. Lee '21's duplicated-text
    * analysis): the fraction of a document's bigram OCCURRENCES whose
    * bigram first appears in THIS document under deterministic doc-id
    * order — repeated-boilerplate docs score near 0, fresh prose near 1.
    * No prefix re-scan: first-occurrence doc per bigram is one keyed
    * `min`, joined back to the occurrence stream (vocabulary-keyed
    * shuffle join, never a corpus broadcast). Exact integer counts; the
    * rate is one IEEE division. */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val occ = bigrams(docs(s, dir))
    val firstDoc = occ.groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
    occ.join(firstDoc, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_bigrams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_bigrams").cast("double"))
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** Term BURSTINESS (Church & Gale 1995): the variance-to-mean ratio of
    * a term's per-document counts — content words clump (VMR ≫ 1),
    * function words spread evenly (VMR ≈ 1 under Poisson). Computed with
    * NO float accumulation: over the n-doc corpus with per-doc counts x
    * (absent docs contribute 0), VMR = (n·Σx² − (Σx)²) / (n·Σx) — both
    * sides exact int64 (absent docs add nothing to Σx or Σx², so the
    * present-rows aggregate IS the full-corpus sum); one IEEE division
    * at the end, ordering tie-broken on the term. Top 25 by VMR over
    * terms appearing ≥ 20 times — the doc-frequency floor keeps the
    * ranked relation bounded and the estimate stable. */
  def burstiness(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val nAgg = d.agg(count(lit(1)).as("nd"))
    val perDoc = bigrams(d)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("x"))
    perDoc.groupBy(col("term"))
      .agg(sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        count(lit(1)).as("df"))
      .filter(col("sx") >= 20L)
      .crossJoin(broadcast(nAgg))
      .select(col("term"), col("df"), col("sx"), col("sxx"),
        (col("nd") * col("sxx") - col("sx") * col("sx")).as("vmr_num"),
        (col("nd") * col("sx")).as("vmr_den"))
      .withColumn("vmr",
        col("vmr_num").cast("double") / col("vmr_den").cast("double"))
      .orderBy(col("vmr").desc, col("term"))
      .limit(25)
  }

  /** Heuristic quality score: stopword ratio + mean word length + length
    * band, the classic cheap pre-filter for training-data curation. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to")
    docs(s, dir)
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("n_tokens", size(col("tokens")))
      .withColumn("n_stop",
        size(filter_exp(col("tokens"), t => t.isInCollection(stop))))
      .select(col("doc_id"),
        round(col("n_stop").cast("double") / col("n_tokens"), 6).as("stopword_ratio"),
        round((col("n_chars") - (col("n_tokens") - lit(1))).cast("double") / col("n_tokens"), 6)
          .as("mean_word_len"),
        round(size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
          .cast("double") / col("n_chars"), 6).as("punct_ratio"),
        when(col("n_tokens") < 20, "short")
          .when(col("n_tokens") <= 60, "medium")
          .otherwise("long").as("len_band"))
      .orderBy(col("doc_id"))
  }

  // Spark's `filter` function name clashes with Dataset.filter in scope.
  private def filter_exp(c: org.apache.spark.sql.Column,
                         f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.filter(c, f)

  /** Gopher-style quality rule screens (Rae et al. '21, arXiv:2112.11446
    * Table A1): per-document boolean flags — token-count band, mean word
    * length band, ≥ 80% of words contain an alphabetic character, ≥ 2
    * distinct required stopwords, symbol-to-word ratio ≤ 1/10 — plus the
    * conjunctive `keep`. Every rule is an EXACT INTEGER comparison
    * (mean-word-length bounds become 3n ≤ Σ|w| ≤ 10n, the alpha ratio
    * 5·n_alpha ≥ 4·n, the symbol ratio 10·n_sym ≤ n), so the flags
    * hash-match DuckDB with no float anywhere. A pure per-row map stage —
    * the shape of the first filter pass every 100 TB curation run makes. */
  def gopherRules(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to")
    docs(s, dir)
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("n_tokens", size(col("tokens")))
      .withColumn("n_alpha",
        size(filter_exp(col("tokens"), t => t.rlike("[a-zA-Z]"))))
      .withColumn("n_sym",
        size(regexp_extract_all(col("text"), lit("[#<>|~^]"), lit(0))))
      .withColumn("n_stop",
        stop.map(w => array_contains(col("tokens"), w).cast("int"))
          .reduce(_ + _))
      // Σ|word| = chars minus the n−1 separating spaces
      .withColumn("wchars", col("n_chars") - (col("n_tokens") - lit(1)))
      .withColumn("wc_ok", col("n_tokens").between(15, 500))
      .withColumn("mwl_ok", (lit(3) * col("n_tokens") <= col("wchars")) &&
        (col("wchars") <= lit(10) * col("n_tokens")))
      .withColumn("alpha_ok", lit(5) * col("n_alpha") >= lit(4) * col("n_tokens"))
      .withColumn("stop_ok", col("n_stop") >= 2)
      .withColumn("sym_ok", lit(10) * col("n_sym") <= col("n_tokens"))
      .select(col("doc_id"), col("wc_ok"), col("mwl_ok"), col("alpha_ok"),
        col("stop_ok"), col("sym_ok"),
        (col("wc_ok") && col("mwl_ok") && col("alpha_ok") &&
          col("stop_ok") && col("sym_ok")).as("keep"))
      .orderBy(col("doc_id"))
  }

  private val dsirBuckets = 1024
  private val dsirScale = 1073741824L // 2^30: lr quantized exact to int64

  /** ln(x) for x ≥ 1 computed ONLY from IEEE-754 correctly-rounded ops
    * (+, −, ×, ÷, sqrt): y = x^(1/2^16) via 16 nested sqrts, then the
    * 4-term Mercator series ln(y) ≈ t − t²/2 + t³/3 − t⁴/4 (t = y − 1)
    * scaled back by 2^16. Neither Java's `Math.log` nor DuckDB's libm
    * `ln` is correctly rounded, so a quantization `floor` downstream of
    * a plain log can flip on a 1-ulp cross-platform divergence; every
    * step HERE is a correctly-rounded IEEE op on identical operands, so
    * the double is bit-identical on any conformant engine/JDK — the same
    * guarantee the sqrt-based affine twins rely on. Deviation from true
    * ln is ~1e-10 (irrelevant for importance weighting; determinism is
    * the contract). [[lnDetSql]] is the operation-order-identical DuckDB
    * mirror; both sides are left-associative with explicit /2.0, /3.0,
    * /4.0 divisions so the expression trees match term for term.
    *
    * Repo-wide transcendental policy (the declared platform assumption):
    * every hash-gated expression where float error can COMPOUND — a
    * regression/sum over transcendental terms, where libm ulps AND
    * engine-dependent accumulation order both move the result — uses this
    * lnDet discipline (DSIR log-ratios, NB/unigram likelihoods, the
    * zipfFit/heapsLaw quantized-OLS slopes). The remaining `ln`/`log`
    * sites (psi_term, mi_term, KM survival steps, the regr_* built-in
    * family, ln-ratings) are accepted as-is because each emitted value
    * applies ONE libm transcendental to an argument that is exactly equal
    * on both engines (integer-derived ratio) and is then rounded to 6 dp:
    * with both libms faithful (≤1 ulp), a flip needs the true value
    * within ~1 ulp of a 0.5·10⁻⁶ decimal boundary — accepted, and
    * regression-guarded by the committed sf0.001 pins. */
  private def lnDet(x: Column): Column = {
    val y = (1 to 16).foldLeft(x.cast("double"))((c, _) => sqrt(c))
    val t = y - lit(1.0)
    (t - t * t / lit(2.0) + t * t * t / lit(3.0)
      - t * t * t * t / lit(4.0)) * lit(65536.0)
  }

  /** DuckDB mirror of [[lnDet]] — `tAlias` must be a column already bound
    * to `sqrt^16(CAST(x AS DOUBLE)) - 1.0` (see [[sqrt16Sql]]). */
  private def lnDetSeriesSql(t: String): String =
    s"($t - $t*$t/2.0 + $t*$t*$t/3.0 - $t*$t*$t*$t/4.0) * 65536.0"

  private def sqrt16Sql(x: String): String =
    (1 to 16).foldLeft(s"CAST($x AS DOUBLE)")((e, _) => s"sqrt($e)")

  /** Shared DuckDB CTE chain (`feat`/`ct`/`cr`/`tot`/`lr`) deriving the
    * ≤1024-row quantized DSIR log-ratio table with [[lnDet]]'s exact
    * operation order — used by both dsir oracle queries. */
  private def dsirLrCtesSql: String =
    s"""WITH feat AS (
       |  SELECT doc_id, lang, ('0x'||substr(md5(w),1,7))::BIGINT % 1024 AS f
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
       |        FROM documents)
       |), ct AS (SELECT f, count(*) AS ct FROM feat WHERE lang = 'en' GROUP BY f
       |), cr AS (SELECT f, count(*) AS cr FROM feat GROUP BY f
       |), tot AS (
       |  SELECT (SELECT CAST(sum(ct) AS BIGINT) FROM ct) AS t_total,
       |         (SELECT CAST(sum(cr) AS BIGINT) FROM cr) AS r_total
       |), lr1 AS (
       |  SELECT cr.f,
       |    ${sqrt16Sql("coalesce(ct.ct, 0) + 1")} - 1.0 AS ta,
       |    ${sqrt16Sql("t_total + 1024")} - 1.0 AS tb,
       |    ${sqrt16Sql("cr.cr + 1")} - 1.0 AS tc,
       |    ${sqrt16Sql("r_total + 1024")} - 1.0 AS td
       |  FROM cr LEFT JOIN ct USING (f), tot
       |), lr AS (
       |  SELECT f,
       |    CAST(floor((${lnDetSeriesSql("ta")}
       |                - ${lnDetSeriesSql("tb")}
       |                - ${lnDetSeriesSql("tc")}
       |                + ${lnDetSeriesSql("td")}) * 1073741824) AS BIGINT) AS lrq
       |  FROM lr1
       |)""".stripMargin

  /** DSIR importance weights (Xie et al. NeurIPS '23, arXiv:2302.03169):
    * data selection by importance resampling — score each raw document by
    * how much more likely its hashed word features are under a TARGET
    * distribution (here the lang='en' slice) than under the raw corpus.
    * Features are md5-prefix(word) mod 1024 buckets; both feature LMs are
    * add-1 smoothed; a doc's log weight is Σ_f [ln(ct_f+1) − ln(T+m) −
    * ln(cr_f+1) + ln(R+m)] over its word occurrences. Each per-feature
    * term is computed once from exact integer counts via [[lnDet]] — a
    * correctly-rounded-ops-only ln whose doubles are bit-identical on
    * both engines BY IEEE-754 guarantee, not by libm coincidence — and
    * then QUANTIZED to int64 units of 2⁻³⁰
    * — so the per-doc sum is an exact integer aggregate, order-free,
    * immune to float-summation ordering. Plan: one explode + two
    * map-side-combined feature aggregates + a broadcast of the ≤1024-row
    * log-ratio table back onto the feature stream — no all-pairs, no
    * driver collect; at 100 TB the bucket table stays 1024 rows no matter
    * the corpus. */
  /** (doc_id, lang, n_words, log_w_q) — the quantized per-doc DSIR scores
    * shared by [[dsirImportance]] and [[dsirSelect]]. */
  private def dsirScores(s: SparkSession, dir: String): DataFrame = {
    val feat = docs(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("w")), 1, 7), 16, 10).cast("long")
          % dsirBuckets).as("f"))
      .persist() // q-cache
    val ct = feat.filter(col("lang") === "en")
      .groupBy(col("f")).agg(count(lit(1)).as("ct"))
    val cr = feat.groupBy(col("f")).agg(count(lit(1)).as("cr"))
    val tot = ct.agg(sum(col("ct")).as("t_total"))
      .crossJoin(cr.agg(sum(col("cr")).as("r_total")))
    val lr = cr.join(ct, Seq("f"), "left").crossJoin(broadcast(tot))
      .select(col("f"), floor(
        (lnDet(coalesce(col("ct"), lit(0L)) + 1)
          - lnDet(col("t_total") + dsirBuckets)
          - lnDet(col("cr") + 1)
          + lnDet(col("r_total") + dsirBuckets)) * dsirScale)
        .cast("long").as("lrq"))
    feat.join(broadcast(lr), "f")
      .groupBy(col("doc_id"))
      .agg(min(col("lang")).as("lang"), count(lit(1)).as("n_words"),
        sum(col("lrq")).as("log_w_q"))
  }

  def dsirImportance(s: SparkSession, dir: String): DataFrame =
    dsirScores(s, dir)
      .select(col("doc_id"), col("lang"), col("n_words"), col("log_w_q"),
        // exact: int64 / 2^30 is a dyadic rational, bit-identical
        (col("log_w_q").cast("double") / dsirScale).as("log_importance"))
      .orderBy(col("doc_id"))

  private val dsirLangBudget = 2000L // tokens per language

  /** DSIR SELECTION — the "resampling" half of the method: within each
    * language, take documents in descending importance order until the
    * per-language token budget fills (the top-p cut Xie et al. apply to
    * the raw corpus before pretraining). A lang-partitioned running sum
    * over the scored relation — never a global single-partition window;
    * the cut composes importance scoring with [[Curation]]'s budget-fill
    * machinery end-to-end, and everything stays exact-integer so the
    * selected set hash-matches DuckDB. */
  def dsirSelect(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("log_w_q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dsirScores(s, dir)
      .withColumn("cum_tokens", sum(col("n_words")).over(w))
      .filter(col("cum_tokens") <= dsirLangBudget)
      .select(col("lang"), col("doc_id"), col("n_words"), col("log_w_q"),
        col("cum_tokens"))
      .orderBy(col("lang"), col("cum_tokens"))
  }

  private val oovVocabK = 20

  /** Out-of-vocabulary rate per language under a frequency-built top-k
    * vocabulary — the coverage check run before committing to a tokenizer
    * or vocab size (an OOV-heavy language pays UNK degradation). Vocab =
    * the corpus's k most frequent words (k = 20 — the fixture's five languages share one 31-word pool, so only a sub-pool vocab yields nonzero OOV; ties lexical — deterministic);
    * per-language rate = OOV word OCCURRENCES / occurrences, one exact
    * integer division. Vocab is bounded (top-k of a grouped count via
    * sort-limit ≡ TakeOrdered) and broadcasts back onto the word stream —
    * the corpus never joins itself. */
  def oovRate(s: SparkSession, dir: String): DataFrame = {
    val words = docs(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .persist() // q-cache
    val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(oovVocabK)
      .select(col("w"), lit(1).as("in_vocab"))
    words.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_words"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_words")).as("oov_rate"))
      .orderBy(col("lang"))
  }

  /** Per-language tokenizer fertility (tokens per word) and bytes per
    * token — the standard multilingual-pipeline efficiency metric (e.g.
    * Rust et al. ACL '21 on tokenizer fertility): languages whose
    * fertility is high pay more sequence length per word of content.
    * Whitespace words vs a max-piece-length subword segmentation (runs of
    * letters split into ≤ 6-char pieces — the regex stand-in for a
    * capped-merge BPE vocabulary, so long words cost > 1 token and
    * fertility varies by language word-length profile); all ratios are
    * single IEEE divisions of exact integer corpus sums — deterministic,
    * no rounding. */
  def tokenFertility(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"),
        size(split(col("text"), " ")).as("ws"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]{1,6}|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))).as("bpe"),
        col("n_chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("n_words"),
        sum(col("bpe")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_words")).as("fertility"),
        (col("n_chars").cast("double") / col("n_tokens")).as("chars_per_token"))
      .orderBy(col("lang"))

  /** Exact near-duplicate pairs: bigram-shingle Jaccard >= 0.25 within a
    * (lang, source) block. Explode distinct shingles, self-join on shingle
    * within the block (pair generation bounded by block size), count
    * intersections, Jaccard = |∩| / (|A|+|B|-|∩|).
    *
    * CRITICAL plan shape: the explode select references `shingles` exactly
    * once. Referencing it alongside (e.g. `size(shingles)`) lets Catalyst
    * collapse the expensive shingle expression into the Generate, where the
    * sibling column is re-evaluated per EXPLODED row (~600× slowdown
    * measured). Shingle counts are re-derived from the exploded rows and
    * joined back on id — plain equi joins, NOT broadcast hints: `counts` is
    * O(N docs), a corpus-sized broadcast at scale; AQE still broadcasts it
    * at runtime when genuinely small. */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    // persisted: referenced 4× below (both join sides + counts twice) —
    // one explode pass instead of four
    val ex = withShingles(docs(s, dir))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(col("shingles")).as("sh"))
      .persist() // q-cache
    ex.count() // eager: 3 sibling-stage consumers (see Tables.pinned)
    val counts = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = ex.select(col("lang"), col("source"), col("sh"), col("doc_id").as("id1"))
    val b = ex.select(col("lang"), col("source"), col("sh"), col("doc_id").as("id2"))
    a.join(b, Seq("lang", "source", "sh"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
      .join(counts.select(col("doc_id").as("id1"), col("n_sh").as("n1")), "id1")
      .join(counts.select(col("doc_id").as("id2"), col("n_sh").as("n2")), "id2")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 6))
      .filter(col("jaccard") >= 0.25)
      .select(col("id1"), col("id2"), col("inter"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /** GLOBAL exact Jaccard self-join with PREFIX FILTERING (Chaudhuri et
    * al. ICDE'06; Xiao et al. WWW'08 "ppjoin") over 5-WORD shingles — the
    * metadata-free exact twin of [[jaccardPairs]], and the scale technique
    * for exact similarity joins when no (lang, source) block exists: order tokens
    * globally by rarity (doc frequency asc, token asc); a doc with n
    * distinct shingles exposes only its first n − ⌈t·n⌉ + 1 tokens in
    * that order, because two docs whose prefixes are disjoint provably
    * have Jaccard < t. The candidate join therefore keys on RARE tokens
    * only — simultaneously shrinking the pair count and killing the
    * hub-token skew a plain token self-join suffers at 100 TB (stopword
    * shingles never enter the join). Candidates are then exact-verified.
    * The ORACLE is the naive all-token join with the same threshold, so
    * the driver proves prune ≡ definition on every run; the per-doc
    * prefix rank window is bounded by tokens-per-doc, never corpus size.
    *
    * Rounding note: verification compares round(J, 6) >= t like the
    * oracle. The prefix bound is against exact J; a pair with exact
    * J < t that ROUNDS to t would break superset-ness, but J is a
    * rational with denominator = |union| (bounded by doc length), so the
    * nearest non-equal value to t is ≥ 1/(4·|union|) away — far outside
    * round-6 range for any real document. */
  def jaccardPrefix(s: SparkSession, dir: String): DataFrame = {
    val thr = 0.25
    graft.functions.GraftFunctions.register(s)
    // 5-WORD shingles (Broder'97 w-shingling), not bigrams: prefix
    // filtering's effectiveness is governed by the shingle space's tail —
    // the fixture's bigram space is ~10³ hub shingles (every doc shares
    // most of them; measured 9.4M candidates at sf0.1, all spurious),
    // while its 5-gram space is ~10⁵·SF with median df = 1, where the
    // rarity-ordered prefix join emits EXACTLY the true near-dup pairs
    // (measured: 256 candidates = 256 answers at sf0.1). Real corpora are
    // heavy-tailed like the latter; pick the shingle width that makes
    // them so.
    val ex = docs(s, dir)
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("shingles",
        graft.functions.GraftFunctions.wordShingles(col("tokens"), 5))
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .persist() // q-cache
    ex.count() // eager: 3 sibling-stage consumers (see Tables.pinned)
    val counts = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val dfreq = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val prefix = ex.join(dfreq, "sh")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .join(counts, "doc_id")
      .filter(col("rk") <= col("n_sh") - ceil(col("n_sh") * thr) + 1)
      .select(col("doc_id"), col("sh"), col("n_sh"))
    // size-ratio gate (J >= t ⇒ t·max(|A|,|B|) <= min(|A|,|B|)) prunes
    // cross-size candidates before the distinct
    val cands = prefix.select(col("sh"), col("doc_id").as("id1"),
        col("n_sh").as("ns1"))
      .join(prefix.select(col("sh"), col("doc_id").as("id2"),
        col("n_sh").as("ns2")), "sh")
      .filter(col("id1") < col("id2") &&
        col("ns1") >= ceil(col("ns2") * thr) &&
        col("ns2") >= ceil(col("ns1") * thr))
      .select(col("id1"), col("id2")).distinct()
    cands
      .join(ex.select(col("doc_id").as("id1"), col("sh")), Seq("id1"))
      .join(ex.select(col("doc_id").as("id2"), col("sh")), Seq("id2", "sh"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
      .join(counts.select(col("doc_id").as("id1"), col("n_sh").as("n1")), "id1")
      .join(counts.select(col("doc_id").as("id2"), col("n_sh").as("n2")), "id2")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 6))
      .filter(col("jaccard") >= thr)
      .select(col("id1"), col("id2"), col("inter"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Overlap-coefficient (Szymkiewicz–Simpson) near-dup pairs — the
    * ASYMMETRIC containment complement to [[jaccardPairs]]: a short doc
    * fully contained in a long one scores inter/min(|A|,|B|) ≈ 1 even
    * though its Jaccard is tiny, which is exactly the quote/excerpt
    * duplication Jaccard misses. Same execution shape as jaccardPairs
    * (one persisted explode, equi joins on (lang, source, shingle), no
    * broadcasts of corpus-sized relations); only the final scoring
    * differs, so the scale posture is inherited. */
  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    // r14-opt: widen + eager-count were tried here and BOTH measured worse
    // (the relation is cheap to compute and its consumers chain mostly
    // sequentially, so the extra materialization pass had nothing to save)
    val ex = withShingles(docs(s, dir))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(col("shingles")).as("sh"))
      .persist() // q-cache
    val counts = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = ex.select(col("lang"), col("source"), col("sh"), col("doc_id").as("id1"))
    val b = ex.select(col("lang"), col("source"), col("sh"), col("doc_id").as("id2"))
    a.join(b, Seq("lang", "source", "sh"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
      .join(counts.select(col("doc_id").as("id1"), col("n_sh").as("n1")), "id1")
      .join(counts.select(col("doc_id").as("id2"), col("n_sh").as("n2")), "id2")
      .withColumn("containment",
        round(col("inter").cast("double") / least(col("n1"), col("n2")), 6))
      .filter(col("containment") >= 0.3)
      .select(col("id1"), col("id2"), col("inter"), col("containment"))
      .orderBy(col("id1"), col("id2"))
  }

  /** MinHash + LSH banding near-dup candidates — the sub-quadratic scale
    * path (SURVEY §2.11). 32 hash functions h_i(s) = xxhash64(i || s),
    * signature = per-i min over shingles; 8 bands × 4 rows; docs sharing a
    * band bucket are candidates; candidates are verified by signature
    * agreement >= 0.5 (estimates Jaccard). Deterministic but xxhash64 has
    * no DuckDB twin → no oracle entry (rows-only driver check); accuracy
    * vs exact Jaccard is pinned in TextVectorSpec. */
  /** per-doc 32-hash MinHash signatures — shared by [[minhashCandidates]]
    * and the deterministic pins in TextVectorSpec. */
  private[graft] def minhashSigs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    withShingles(docs(s, dir))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.minhashSig(col("shingles"), 32).as("sig"))
  }

  /** distinct candidate pairs from 8-band × 4-row LSH banding — the
    * pre-verification stage of [[minhashCandidates]], exposed so specs can
    * pin its exact output size on a fixed fixture. */
  private[graft] def minhashBandPairs(sig: DataFrame): DataFrame = {
    val bands = 8
    val rowsPerBand = 4
    // band key = the 4-long slice itself (arrays join/hash fine) — no extra
    // hashing pass; `sig` referenced only inside the generator
    val banded = sig.select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> struct(b as band, slice(sig, b * $rowsPerBand + 1, $rowsPerBand) as bucket))"""
          .stripMargin)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id1"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("id2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
  }

  def minhashCandidates(s: SparkSession, dir: String): DataFrame = {
    // signature via the native MinHashSig expression: xxhash64(s, seed=i),
    // whole numHashes × |shingles| loop in one eval (graft.functions).
    // persisted: referenced 3× below (banding + both verification joins) —
    // 32 hash passes over every shingle run once, not three times. The
    // verification joins are plain equi joins on id, NOT broadcast hints:
    // sig is O(N docs) and a corpus-sized broadcast kills the driver at
    // scale (AQE still broadcasts when genuinely small).
    val sig = minhashSigs(s, dir).persist() // q-cache
    sig.count() // eager: 3 sibling-stage consumers (see Tables.pinned)
    val pairs = minhashBandPairs(sig)
    pairs
      .join(sig.select(col("doc_id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sig.select(col("doc_id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn("est_jaccard",
        round(graft.functions.GraftFunctions.sigAgreement(col("sig1"), col("sig2")), 6))
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id1"), col("id2"), col("est_jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  /** SimHash near-dup pairs (SURVEY §2.11): one 64-bit signature per doc
    * (native SimHash64 over bigram shingles); candidate pairs come from
    * rotated-prefix blocking (the Manku et al., WWW'07 permute-and-prefix
    * shape): the signature is rotated left 8× in 8-bit steps and bucketed
    * on the top 16 bits of each rotation; docs sharing any (rotation,
    * prefix) bucket are candidates, kept at Hamming distance <= 12
    * (bit_count(xor)). Unlike metadata blocking, buckets are bounded
    * (2^16 keys per rotation, near-uniform under the hash) and candidate
    * generation is a plain equi join — sub-quadratic at corpus scale. A
    * pair is caught iff some 8-bit-aligned circular 16-bit window of
    * sig1^sig2 is zero; recall vs exact Jaccard near-dups is pinned in
    * TextVectorSpec. Hash-based → no DuckDB oracle (rows-only). */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val nRot = 8        // rotations, 64/nRot = 8-bit steps
    val prefixBits = 16 // bucket key width per rotation
    // persisted: the shingle+SimHash pipeline feeds both join sides below
    val sigs = withShingles(docs(s, dir))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.simhash64(col("shingles")).as("sig"))
      .persist() // q-cache
    // (rotation, prefix) bucket keys; sig rides along so the self-join
    // yields both signatures without a join-back. Java shift semantics
    // (shift amounts mod 64) make r=0 degenerate to sig|sig = sig.
    val step = 64 / nRot
    val banded = sigs.select(col("doc_id"), col("sig"), expr(
        s"""explode(transform(sequence(0, ${nRot - 1}), r -> named_struct(
           |  'rot', r,
           |  'prefix', shiftrightunsigned(
           |     shiftleft(sig, r * $step) | shiftrightunsigned(sig, 64 - r * $step),
           |     ${64 - prefixBits}))))""".stripMargin).as("rp"))
      .select(col("doc_id"), col("sig"), col("rp.rot"), col("rp.prefix"))
    val a = banded.select(col("rot"), col("prefix"),
      col("doc_id").as("id1"), col("sig").as("sig1"))
    val b = banded.select(col("rot"), col("prefix"),
      col("doc_id").as("id2"), col("sig").as("sig2"))
    a.join(b, Seq("rot", "prefix"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(expr("sig1 ^ sig2")).as("hamming"))
      .filter(col("hamming") <= 12)
      .distinct()
      .orderBy(col("id1"), col("id2"))
  }

  /** n-gram language-ID heuristic (north star "language-ID"): scores each
    * doc against per-language profiles of frequent character trigrams and
    * stopwords, picks the argmax. Profiles here are tiny hand-rolled ones
    * for the latin-script languages the corpus labels claim; on THIS
    * synthetic corpus text is language-independent (same vocabulary for
    * every lang label), so accuracy against the label is meaningless —
    * the operator's behavior is pinned on real multilingual strings in
    * TextVectorSpec instead. Rows-only for the oracle. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", "ing ", " to "),
    "es" -> Seq(" el ", " la ", " de ", " que ", "ción"),
    "de" -> Seq(" der ", " die ", " und ", " ist ", "sch"),
    "fr" -> Seq(" le ", " et ", " les ", " des ", " une "),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Adds `predicted_lang`/`lang_score` from n-gram occurrence counts —
    * occurrences of gram g = (len(text) - len(replace(text, g, ''))) / len(g),
    * argmax over languages via struct-lexicographic greatest (score, then
    * lang as deterministic tie-break). */
  def languageIdOn(df: DataFrame): DataFrame = {
    // Pattern.quote: the grams are literal strings, and the GENERATED
    // DuckDB oracle counts them with literal replace() — an unquoted gram
    // containing a regex metacharacter would silently diverge the engines.
    // Single quotes stay banned (they would break the oracle's SQL literal).
    langProfiles.foreach { case (_, grams) =>
      grams.foreach(g => require(!g.contains("'"),
        s"langProfiles gram '$g' would break the generated oracle SQL"))
    }
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val scores = langProfiles.map { case (lang, grams) =>
      val hits = grams.map(g =>
        (length(padded) - length(regexp_replace(padded,
          lit(java.util.regex.Pattern.quote(g)), lit("")))) / length(lit(g)))
        .reduce(_ + _)
      struct(hits.cast("double").as("score"), lit(lang).as("lang"))
    }
    df.withColumn("best", greatest(scores: _*))
      .withColumn("predicted_lang", col("best.lang"))
      .withColumn("lang_score", round(col("best.score"), 2))
      .drop("best")
  }

  def languageId(s: SparkSession, dir: String): DataFrame =
    languageIdOn(docs(s, dir))
      .select(col("doc_id"), col("lang").as("label_lang"),
        col("predicted_lang"), col("lang_score"))
      .orderBy(col("doc_id"))

  /** BPE-ish token counting (north star): whitespace tokens vs a
    * subword-flavored regex segmentation (runs of letters, digits, or
    * single punctuation — the pre-tokenization step of BPE pipelines). */
  def tokenCountBpe(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
          .as("bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Winnowing fingerprints (north star "document fingerprinting (rolling
    * hash)"): per-doc stats over the selected k-gram hashes — set size and
    * an order-independent checksum. Hash values are engine-internal →
    * rows-only oracle; the winnowing guarantee (shared substrings ⇒ shared
    * fingerprints) is pinned in TextVectorSpec. */
  def winnowFingerprints(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docs(s, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.winnowFingerprint(col("text"), 8, 4).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_fingerprints"))
      .orderBy(col("doc_id"))
  }

  /** PII redaction (training-data curation): scrub emails, NANP phone
    * numbers, and IPv4 addresses to typed placeholder tokens via chained
    * regexp_replace — all three patterns are backtracking-free, so the Java
    * (Spark) and RE2 (DuckDB oracle) dialects agree. The test corpus has no
    * real PII, so the query first plants deterministic PII derived from
    * doc_id (same expression in the oracle) and then proves the scrub
    * removes it; match counts ride along as evidence. Narrow per-row op —
    * no shuffle, codegen'd regexes — so it scales as a pure map stage. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val ipv4Re  = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  def piiRedact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("content", concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or +1 555-867-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
        lit("."), ((col("doc_id") * 7) % 256).cast("string")))
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("content"),
          emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipv4Re, "<IP>")
          .as("redacted"),
        size(regexp_extract_all(col("content"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("content"), lit(phoneRe), lit(0))).as("n_phones"))
      .orderBy(col("doc_id"))

  /** Fixed-width document chunking (training-data prep: context-window
    * packing): explode chunk indices 0..ceil(len/W)-1, cut each chunk with
    * substring. Narrow generate + project — no shuffle; at 100 TB this is
    * a pure map stage whose output partitioning follows the input. */
  def docChunks(s: SparkSession, dir: String): DataFrame = {
    val w = 120
    docs(s, dir)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          ceil(length(col("text")) / w.toDouble).cast("int") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"substring(text, chunk_idx * $w + 1, $w)").as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** [[docChunks]] re-expressed through the NATIVE GENERATOR `ChunkRows`
    * (graft.functions): `GenerateExec` streams (chunk_idx, chunk) rows
    * straight off each document instead of materializing an index array
    * and re-substringing per element — the generator extension tier next
    * to the expression/aggregate/plan tiers. Output rows are identical to
    * docChunks by construction, so the two queries SHARE one oracle text
    * and the driver proves generator ≡ explode formulation every run;
    * PlanSpec pins that the plan is a Generate over ChunkRows with no
    * sequence/explode projection. */
  def chunkGen(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docs(s, dir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.chunkRows(col("text"), 120))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        length(col("chunk")).as("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Edit-distance near-dup pairs: levenshtein within (lang, source) blocks,
    * pre-filtered by |len difference| <= 30 (levenshtein(a,b) >= |len(a) -
    * len(b)|, so the length gate is a sound O(1) lower-bound prune that
    * skips the O(len²) DP for most pairs). Relative distance = dist /
    * max(len) <= 0.3 keeps true near-dups only. Same blocking-bounded join
    * shape as jaccardPairs — candidate pairs stay O(block²) with bounded
    * blocks; at corpus scale the length gate rides the same join. */
  def editDistancePairs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"))
    // widen the PROBE side only (guide §2.6): the banded DP below is the
    // whole cost of this query and it inherits the probe side's
    // partitioning — a single-row-group fixture scan would run it serial
    // (measured: 3 tasks, task-time ≈ wall). The build side stays narrow
    // (it is broadcast; widening it would shuffle before the collect).
    val a = Tables.widen(d).select(col("lang"), col("source"),
      col("doc_id").as("id1"), col("text").as("t1"), col("n_chars").as("len1"))
    val b = d.select(col("lang"), col("source"), col("doc_id").as("id2"),
      col("text").as("t2"), col("n_chars").as("len2"))
    a.join(b, Seq("lang", "source"))
      // the cheap gates SHOULD reach the join condition — they prune
      // before any DP runs
      .filter(col("id1") < col("id2") &&
        abs(col("len1") - col("len2")) <= 30)
      // PUSHDOWN BARRIER. Left alone, Catalyst substitutes the levenshtein
      // predicate into the JOIN condition, where pushed conjuncts are
      // ordered FIRST — the DP then ran on every (lang, source) pair
      // before the cheap gates, and 3x (join condition + both output
      // columns): measured 35-38 s vs 5.5 s at sf0.1. A filter that
      // references a non-deterministic column cannot be pushed (and the
      // reference keeps `_pin` alive through column pruning, which is what
      // defeats a bare non-deterministic projection). `_pin < 0` is never
      // true (monotonically_increasing_id >= 0) and only evaluates when
      // the distance test already failed.
      .withColumn("_pin", monotonically_increasing_id())
      // banded DP: only dist <= 0.3*maxlen survives the rel_dist filter
      // anyway, so pass that bound as levenshtein's threshold — Spark's
      // thresholded variant runs O(len * threshold) with a -1 early exit
      // instead of O(len^2). dist <= floor(0.3*maxlen) for integer dist is
      // EXACTLY rel_dist <= 0.3, so the -1 filter subsumes the rel filter.
      // (The Scala functions wrapper only takes a literal Int threshold;
      // the SQL surface accepts the per-row expression.)
      .withColumn("edit_dist", expr(
        "levenshtein(t1, t2, cast(floor(greatest(len1, len2) * 0.3) as int))"))
      .filter(col("edit_dist") >= 0 || col("_pin") < 0)
      .withColumn("rel_dist",
        round(col("edit_dist") / greatest(col("len1"), col("len2")), 6))
      .select(col("id1"), col("id2"), col("edit_dist"), col("rel_dist"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Repetition ratio (Gopher-style quality filter): fraction of all word
    * bigrams taken by the most frequent one — high values flag boilerplate /
    * degenerate repetition. Non-distinct bigrams (unlike the dedup
    * shingles), exploded once then two hash aggregations; shuffle key is
    * (doc_id, bigram) then doc_id — both well-distributed. */
  def repetitionRatio(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("tokens", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tokens) - 2), i -> concat(tokens[i], ' ', tokens[i+1]))"))
        .as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
        max(col("n")).as("top_bigram_n"),
        round(max(col("n")) / sum(col("n")), 6).as("top_bigram_frac"))
      .orderBy(col("doc_id"))

  /** TF-IDF keyword extraction: top-3 terms per document by
    * tf·ln((N+1)/(df+1)). Term frequency and document frequency are two
    * hash aggregations over the exploded tokens; the corpus size N rides
    * in as a 1-row aggregate cross-joined onto the scores (broadcast NL of
    * a single row — never a driver-side count stuffed into a literal).
    * Per-doc top-3 via row_number partitioned by doc_id — the bounded
    * per-group-top-k shape, no global sort. */
  def tfidf(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tfc = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfc = tfc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val score = col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0))
    val w = Window.partitionBy(col("doc_id")).orderBy(score.desc, col("term"))
    tfc.join(dfc, "term").crossJoin(n)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"),
        round(score, 6).as("tfidf"))
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))
  }

  /** Absolute-discount constant for [[knBigram]] — Kneser–Ney's standard
    * D (an exact binary quarter, so both engines' arithmetic is
    * bit-identical). */
  private val KnD = 0.75

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney ICASSP'95;
    * Chen & Goodman '98 eq. 4.25) — the smoothing every production n-gram
    * LM shipped before neural LMs, and still the tokenizer-pipeline
    * baseline: discount every observed bigram count by D and redistribute
    * the held-out mass through the CONTINUATION unigram (how many distinct
    * left contexts a word follows — the "San Francisco" fix: 'Francisco'
    * is frequent but follows almost nothing, so its continuation weight is
    * tiny). Emits the top-30 conditional probabilities with their three
    * ingredient counts, so the oracle checks the count plumbing and the
    * interpolation algebra.
    *
    * Shape: one bigram explode + three map-side-combined aggregates
    * (bigram counts, per-context totals+types via one grouped pass,
    * continuation types per word) joined back on their natural keys —
    * context stats are vocab-sized, the bigram relation is the only
    * corpus-scale exchange. */
  def knBigram(s: SparkSession, dir: String): DataFrame = {
    val big = docs(s, dir)
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c12 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .persist() // q-cache
    c12.count() // eager: 4 sibling-stage consumers (see Tables.pinned)
    val ctx = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1plus"))
    val cont = c12.groupBy(col("w2")).agg(count(lit(1)).as("ncont"))
    val types = c12.agg(count(lit(1)).as("ntypes"))
    c12.join(ctx, "w1").join(cont, "w2").crossJoin(broadcast(types))
      .withColumn("p_kn", round(
        (col("c12") - KnD) / col("c1")
          + lit(KnD) * col("n1plus") / col("c1")
            * (col("ncont").cast("double") / col("ntypes")), 6))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("ncont"),
        col("p_kn"))
      .orderBy(col("p_kn").desc, col("w1"), col("w2"))
      .limit(30)
  }

  /** Committed BPE merge table for [[bpeEncode]], in rank order (the
    * order IS the algorithm — each rank is applied corpus-wide before the
    * next, Sennrich et al. ACL'16). Keys are the two adjacent subtokens,
    * values the merged token. */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "t a" -> "ta", "ta b" -> "tab", "l e" -> "le", "tab le" -> "table",
    "s c" -> "sc", "a n" -> "an", "sc an" -> "scan",
    "v a" -> "va", "va l" -> "val", "u e" -> "ue", "val ue" -> "value",
    "o w" -> "ow", "r o" -> "ro", "ro w" -> "row")

  /** One BPE merge rank as pure string algebra on a space-separated
    * subtoken string: double every boundary space, replace the padded
    * pair pattern, collapse doubles. The doubling step is what makes
    * replace-all EXACTLY the non-overlapping greedy merge: adjacent
    * candidate pairs share a boundary space, and doubling gives each
    * match its own copy, so a chain "a n a n" merges both pairs in one
    * rank exactly like the reference algorithm. */
  private def bpeStep(c: Column, pair: String, merged: String): Column =
    replace(
      replace(
        replace(c, lit(" "), lit("  ")),
        lit(" " + pair.replace(" ", "  ") + " "), lit(" " + merged + " ")),
      lit("  "), lit(" "))

  private def bpeStepSql(e: String, pair: String, merged: String): String = {
    val pd = pair.replace(" ", "  ")
    s"replace(replace(replace($e, ' ', '  '), ' $pd ', ' $merged '), '  ', ' ')"
  }

  /** BPE tokenizer APPLY — encode every word with the committed merge
    * table ([[bpeMergeCandidates]] is the learner side; this is the
    * deployment side that turns text into trainer-ready subtokens):
    * split each word to characters, then apply each merge rank in order
    * as three nested `replace` calls (see [[bpeStep]] — straight-line
    * string algebra, no loops, no UDF, fully codegen'd and identical in
    * both engines). Output is the resulting subtoken vocabulary (top 30).
    *
    * 100 TB shape: a single narrow projection per token — the merge
    * chain is ~3·|merges| codegen'd string ops fused into one
    * WholeStageCodegen stage — followed by one map-side-combined count.
    * Nothing joins, nothing broadcasts; merge tables of real tokenizers
    * (~50k ranks) would compile the same chain into a generated-code
    * trie instead, but the dataflow shape does not change. */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    // encode each DISTINCT word once and re-weight by its corpus count —
    // the standard tokenizer-pipeline memoization (corpus token counts
    // are Zipfian, so the distinct vocabulary is orders of magnitude
    // smaller than the token stream; 3.6 s -> sub-second at sf0.1, and
    // at 100 TB the merge chain runs |vocab| times, not |corpus| times).
    // The oracle encodes the raw token stream definitionally, so the
    // driver proves memoized == naive on every run.
    val wordCnt = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val spaced = concat(lit(" "),
      trim(regexp_replace(col("w"), "(.)", "$1 ")), lit(" "))
    val encoded = trim(BpeMerges.foldLeft(spaced: Column) {
      case (c, (p, r)) => bpeStep(c, p, r)
    })
    wordCnt.select(col("wc"), explode(split(encoded, " ")).as("token"))
      .groupBy(col("token")).agg(sum(col("wc")).as("n_occ"))
      .orderBy(col("n_occ").desc, col("token"))
      .limit(30)
  }

  /** WordPiece greedy max-match encoding (Schuster & Nakajima '12; the
    * BERT tokenizer's apply step) — the third subword surface beside the
    * BPE merge chain ([[bpeEncode]]) and the unigram-LM Viterbi
    * ([[unigramSegment]]): from each position take the LONGEST vocab
    * piece that prefixes the remaining suffix, advance, repeat. The
    * vocab is derived deterministically from the corpus (all single
    * chars — guaranteed progress — plus length-2..4 substrings appearing
    * in ≥ 5 distinct words).
    *
    * Scale shape: everything runs on the DISTINCT-word table, never the
    * corpus (the [[bpeEncode]] memoization); the per-position best match
    * is ONE equi broadcast-hash join (candidate substrings → vocab) +
    * a (word, pos) window, and the greedy walk is `maxLen` fixed rounds
    * of a small self-join with a localCheckpoint lineage cut — no
    * per-round count jobs (the q_harmonic lesson: fixed-horizon loops
    * shouldn't pay per-round convergence checks). */
  def wordpieceEncode(s: SparkSession, dir: String): DataFrame = {
    val words = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .localCheckpoint()

    val chars = words.select(explode(split(col("w"), "")).as("piece"))
      .filter(length(col("piece")) > 0).distinct()
    val subs = words
      .select(col("w"), explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("i"),
        explode(array(lit(2), lit(3), lit(4))).as("l"))
      .filter(col("i") + col("l") - 1 <= length(col("w")))
      .select(col("w"), expr("substring(w, i, l)").as("piece"))
      .distinct()
      .groupBy(col("piece")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 5).select(col("piece"))
    val vocab = chars.union(subs).distinct()

    // best (longest) vocab match per (word, position): equi join on the
    // candidate substring, longest-wins window — at most one piece per
    // length exists at a position, so the tie-break is vacuous
    val best = words
      .select(col("w"), explode(sequence(lit(0), length(col("w")) - 1)).as("pos"))
      .select(col("w"), col("pos"),
        explode(array(lit(1), lit(2), lit(3), lit(4))).as("l"))
      .filter(col("pos") + col("l") <= length(col("w")))
      .select(col("w"), col("pos"), col("l"),
        expr("substring(w, pos + 1, l)").as("piece"))
      .join(broadcast(vocab), Seq("piece"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("w"), col("pos")).orderBy(col("l").desc)))
      .filter(col("rn") === 1)
      .select(col("w").as("bw"), col("pos").as("bpos"),
        col("piece"), col("l"))
      .localCheckpoint()

    val maxLen = words.agg(max(length(col("w")))).head().getInt(0)
    require(maxLen <= 64,
      s"wordpieceEncode: corpus word length $maxLen exceeds the 64-round cap")

    var cur = words.select(col("w"), length(col("w")).as("wl"),
      lit(0).as("pos"), lit(0L).as("n_pieces"), lit("").as("pieces"))
    var round = 0
    while (round < maxLen) {
      val active = col("pos") < col("wl")
      cur = cur.join(best,
          cur("w") === col("bw") && cur("pos") === col("bpos"), "left")
        .select(cur("w"), cur("wl"),
          when(active, cur("pos") + col("l")).otherwise(cur("pos")).as("pos"),
          when(active, cur("n_pieces") + 1)
            .otherwise(cur("n_pieces")).as("n_pieces"),
          when(active, when(cur("pieces") === "", col("piece"))
            .otherwise(concat(cur("pieces"), lit(" "), col("piece"))))
            .otherwise(cur("pieces")).as("pieces"))
        .localCheckpoint()
      round += 1
    }
    cur.join(words, Seq("w"))
      .select(col("w").as("word"), col("wc").as("n_occ"),
        col("n_pieces"), col("pieces"))
      .orderBy(col("word"))
  }

  /** Sparse-vector retrieval top-k — the TF-IDF twin of
    * [[VectorOps.cosineTopK]]: each query DOCUMENT (doc_id < 10) is itself
    * the sparse query vector, scored against the corpus through an
    * inverted-index join (posting lists keyed by term), a grouped
    * dot-product, and cosine normalization — the related-documents /
    * more-like-this primitive every retrieval stack runs next to its
    * dense-ANN path.
    *
    * Exact-zero terms (df = N ⇒ idf = ln((N+1)/(N+1)) = 0) are pruned
    * from the index — provably lossless, and it is what keeps posting
    * lists off the corpus-wide stop terms. 100 TB shape: the index join
    * fans out Σ_t df_t(query-side) · df_t rows — bounded by the Q query
    * docs on one side; a df cap (drop near-universal terms, standard
    * impact-ordered-index practice) is the knob when posting lists grow;
    * the per-query top-k collapses through one window over Q·N rows max. */
  def tfidfRetrieval(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tfc = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfc = tfc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val wgt = tfc.join(dfc, "term").crossJoin(broadcast(n))
      .filter(col("df") < col("n_docs")) // idf=0 terms: zero weight, prune
      .select(col("doc_id"), col("term"),
        (col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0))).as("w"))
      .persist() // q-cache
    val norms = wgt.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nm"))
    val q = wgt.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("term"), col("w").as("qw"))
    val dots = q.join(wgt.select(col("doc_id").as("cand_id"), col("term"),
        col("w").as("cw")), "term")
      .filter(col("query_id") =!= col("cand_id"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("qw") * col("cw")).as("dot"))
    val scored = dots
      .join(norms.select(col("doc_id").as("query_id"), col("nm").as("qn")),
        "query_id")
      .join(norms.select(col("doc_id").as("cand_id"), col("nm").as("cn")),
        "cand_id")
      .withColumn("cos", round(col("dot") / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("cand_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Stratified downsampling with per-stratum rates (corpus rebalancing:
    * keep 1/2 of English, 1/5 of everything else). Deterministic modulus
    * on the stable doc_id rather than rand() — reproducible across runs
    * and engines, and the predicate is pure scan-column arithmetic, so the
    * sample is a zero-shuffle filter pushed to the scan; no window, no
    * per-stratum sort, nothing that funnels a stratum through one task. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(when(col("lang") === "en", col("doc_id") % 2 === 0)
        .otherwise(col("doc_id") % 5 === 0))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** Source-interleaved training order (data mixing): round-robin over
    * sources — position i of every source's per-source sequence comes
    * before position i+1 of any source, so a sequential reader sees
    * sources evenly interleaved instead of source-clumped (the order
    * training pipelines want after a source-partitioned ingest). Per-source
    * sequence numbers come from ScaledRank.withGroupedRowNumbers — a
    * Window.partitionBy(source) would funnel each source through ONE task,
    * and sources are exactly the few-huge-groups shape at corpus scale —
    * and the GLOBAL position from ScaledRank's two-phase range-partitioned
    * ranking, not a single-partition Window.orderBy. */
  def sourceMix(s: SparkSession, dir: String): DataFrame = {
    val strat = ScaledRank.withGroupedRowNumbers(
        docs(s, dir).select(col("doc_id"), col("source")),
        groupCols = Seq(col("source")), orderCols = Seq(col("doc_id")))
      .withColumn("srn", col("grn").cast("int"))
      .drop("grn")
    ScaledRank.withGlobalRanks(strat,
        orderCols = Seq(col("srn"), col("source"), col("doc_id")),
        keyCols = Seq(col("srn"), col("source"), col("doc_id")))
      .select(col("rn").cast("long").as("global_pos"),
        col("doc_id"), col("source"), col("srn"))
      .orderBy(col("global_pos"))
  }

  /** Corpus-LM perplexity scoring (the CCNet-style quality filter): train a
    * bigram language model on the corpus itself — p(w2|w1) = c(w1,w2) /
    * Σ_w c(w1,w) — and score each document by the perplexity of its own
    * bigram stream, exp(-avg ln p). Low-perplexity documents are
    * predictable/common text; high perplexity flags junk for curation.
    * No smoothing is needed: every scored bigram is in the training counts
    * by construction, so p > 0 always.
    *
    * Scale shape: the per-instance bigram stream (corpus-sized) is built
    * ONCE and persisted — it feeds the LM aggregation and the scoring join.
    * The LM table is bounded by observed-vocab², far below corpus size; the
    * context totals are a second aggregation OF THE LM TABLE (never a
    * rescan of the corpus). Scoring is one shuffle equi-join on (w1, w2) —
    * the stream × LM join a perplexity filter runs at 100 TB — followed by
    * a per-doc aggregate that rides the same hash partitioning. Documents
    * with fewer than 2 tokens have no bigrams and are excluded up front
    * (mirrored in the oracle's WHERE). */
  /** Per-doc bigram-LM stats (n_bigrams, ppl) — shared by
    * [[lmPerplexity]] and [[perplexityBuckets]]. */
  private def perDocPpl(s: SparkSession, dir: String): DataFrame = {
    val big = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .persist() // q-cache
    // lm is consumed twice (scoring join + ctx aggregation) — persist so
    // the vocab²-bounded (w1,w2) count runs once, not once per consumer
    val lm = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .persist() // q-cache
    val ctx = lm.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    big.join(lm.join(ctx, "w1"), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(log(col("c12") / col("c1")))), 6).as("ppl"))
  }

  def lmPerplexity(s: SparkSession, dir: String): DataFrame =
    perDocPpl(s, dir).orderBy(col("doc_id"))

  /** CCNet-style perplexity bucketing (Wenzek et al. LREC '20): within
    * each language, split documents into head/middle/tail TERCILES of LM
    * perplexity — the standard quality stratification CommonCrawl
    * pipelines filter and mix by (head = most fluent under the LM).
    * Ranking key is the round-6 per-doc perplexity of [[perDocPpl]] with
    * a doc_id tie-break, so the ntile cut is deterministic on both
    * engines; the window shuffles once on language and each partition is
    * a language slice, never the whole corpus. */
  def perplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("ppl"), col("doc_id"))
    perDocPpl(s, dir)
      .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("tercile", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("ppl"), col("tercile"),
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** The corpus-scale inner step of BPE tokenizer training: count adjacent
    * character pairs inside every word and rank merge candidates. Full BPE
    * is a driver loop of ~30k of these rounds over a SHRINKING pair table
    * (exactly how dupClusters drives connected components); the round
    * itself — the part that touches the corpus — is this one
    * explode + count, whose output is bounded by the character-pair
    * alphabet, not the corpus. Top-20 with a deterministic tie-break. */
  def bpeMergeCandidates(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w)-1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(20)

  /** BPE tokenizer TRAINING — the full iterative merge-learning loop
    * (Sennrich et al. '16), not just one round ([[bpeMergeCandidates]])
    * or the apply side ([[bpeEncode]]): start from characters, and for
    * each rank count all adjacent subtoken pairs over the corpus, take
    * the most frequent (ties broken lexicographically), merge it
    * everywhere, repeat. Output is the learned 6-rank merge table —
    * exactly the artifact [[bpeEncode]]'s committed `BpeMerges` deploys.
    *
    * Scale shape: trains on the DISTINCT-word table weighted by corpus
    * counts (the [[bpeEncode]] memoization — per-round cost is O(vocab),
    * never O(corpus)); each round is one explode + map-side-combined
    * groupBy, a bounded-alphabet TakeOrdered(1), and ONE codegen'd
    * string-algebra projection (the [[bpeStep]] space-doubling trick
    * makes replace-all exactly the non-overlapping greedy merge). The
    * winner joins back as a broadcast 1-row relation — no driver-side
    * literal; localCheckpoint cuts the per-round lineage like every
    * iterative op here. The oracle re-derives all 6 ranks with unrolled
    * MATERIALIZED CTEs (each round is referenced twice — by the next
    * round and by the final union — so default CTE inlining would expand
    * the chain 2^6-fold, the q_kcore lesson). */
  def bpeTrain(s: SparkSession, dir: String, rounds: Int = 6): DataFrame = {
    var words = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(concat(lit(" "),
        trim(regexp_replace(col("w"), "(.)", "$1 ")), lit(" ")).as("syms"),
        col("n"))
      .localCheckpoint()
    val merges = Seq.newBuilder[DataFrame]
    for (r <- 1 to rounds) {
      val pairs = words
        .select(col("n"), split(trim(col("syms")), " ").as("toks"))
        .select(col("n"), explode(expr(
          """CASE WHEN size(toks) < 2 THEN array()
            |ELSE transform(sequence(0, size(toks)-2),
            |              i -> struct(toks[i] AS l, toks[i+1] AS r)) END"""
            .stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("pair_n"))
      val best = pairs.orderBy(col("pair_n").desc, col("l"), col("r")).limit(1)
        .select(lit(r).as("rk"), col("l"), col("r"), col("pair_n"))
        .localCheckpoint()
      // loud guard: a corpus of single-character words has nothing to merge
      require(best.count() == 1, s"bpeTrain: no mergeable pair at rank $r")
      merges += best
      words = words
        .crossJoin(broadcast(best.select(col("l").as("_l"), col("r").as("_r"))))
        .select(expr(
          """replace(replace(replace(syms, ' ', '  '),
            |  concat(' ', _l, '  ', _r, ' '), concat(' ', _l, _r, ' ')),
            |  '  ', ' ')""".stripMargin).as("syms"), col("n"))
        .localCheckpoint()
    }
    merges.result().reduce(_.union(_)).orderBy(col("rk"))
  }

  /** Unigram-LM tokenizer E-step (Kudo '18, SentencePiece): per distinct
    * word, the max-likelihood segmentation under a substring unigram model
    * — Viterbi over the word's position DAG, where node i is a character
    * boundary and an edge (j → i) is a vocabulary piece w[j+1..i]. The
    * seed vocabulary is the standard one: every single character (so every
    * word stays segmentable) plus the top-64 multi-character substrings by
    * corpus count (ties lexicographic), pieces capped at 4 chars.
    *
    * Determinism across engines: piece log-probs are quantized int64 —
    * floor((lnDet(cnt) − lnDet(total)) · 2^30) with [[lnDet]]'s IEEE-exact
    * sqrt/Mercator ln — and the DP maximizes an exact-integer COMBINED key
    * comb = 16·score + (15 − n_tok): edge relaxation is the affine update
    * comb' = comb + 16·q − 1, so one int64 `max` per node yields the
    * lexicographic (best score, fewest tokens) optimum with no float
    * anywhere in the recursion and no tie ambiguity in the decoded output.
    *
    * Scale shape: everything after the first token count runs on the
    * DISTINCT-word table (O(vocab), never O(corpus)); the vocabulary is a
    * bounded broadcast; the DP is `maxLen` (12) rounds of an edges ⋈ dp
    * equi join, each O(vocab · len) — the SSSP/BFS frontier discipline
    * applied to the position DAG, with localCheckpoint lineage cuts. The
    * oracle re-derives all 12 rounds via unrolled MATERIALIZED CTEs. */
  private val ugMaxLen = 12
  private val ugMaxPiece = 4

  /** Shared unigram-LM model build for [[unigramSegment]] (E-step) and
    * [[unigramPrune]] (M-step): the distinct-word table, the quantized
    * seed-vocabulary log-probs, and the per-word position-DAG edge list.
    * Everything past the first token count is O(vocab), never O(corpus). */
  private def unigramGraph(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val wrds = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")).between(1, ugMaxLen))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .localCheckpoint()
    val pieces = wrds
      .select(col("w"), col("wn"),
        explode(sequence(lit(1), length(col("w")))).as("p"))
      .select(col("w"), col("wn"), col("p"),
        explode(sequence(lit(1), lit(ugMaxPiece))).as("l"))
      .filter(col("p") + col("l") - 1 <= length(col("w")))
      .select(col("w"), col("wn"), col("p"), col("l"),
        expr("substring(w, p, l)").as("piece"))
    val pieceCnt = pieces.groupBy(col("piece")).agg(sum(col("wn")).as("cnt"))
      .localCheckpoint()
    val tot = pieceCnt.agg(sum(col("cnt")).as("t"))
    val voc = pieceCnt.filter(length(col("piece")) === 1)
      .union(pieceCnt.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(64))
    val vq = voc.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        floor((lnDet(col("cnt")) - lnDet(col("t"))) * lit(1073741824.0))
          .cast("long").as("q"))
      .localCheckpoint()
    val edges = pieces.join(vq, "piece")
      .select(col("w"), (col("p") - 1).as("j"),
        (col("p") + col("l") - 1).as("i"), col("piece"), col("q"))
      .localCheckpoint()
    (wrds, vq, edges)
  }

  def unigramSegment(s: SparkSession, dir: String): DataFrame = {
    val (wrds, _, edges) = unigramGraph(s, dir)
    // r14-opt (guide §1.2): (a) the DP depth is the MEASURED max word
    // length (one tiny agg job), not the committed ugMaxLen cap — levels
    // past the longest word are provably empty, and the oracle's fixed
    // unroll no-ops there identically; (b) levels are kept as separate
    // checkpointed frames and each round's parent view unions only the
    // last ugMaxPiece levels (an edge spans ≤ ugMaxPiece chars, so deeper
    // levels cannot connect) — the cumulative-union form re-copied the
    // whole DP table through every round's checkpoint.
    // coalesce to 0 on an empty word table (r14 ADVICE: max() is NULL
    // there and getInt NPEs) — depth 0 skips the loop entirely.
    val maxLen = math.min(ugMaxLen,
      wrds.agg(coalesce(max(length(col("w"))), lit(0))).head().getInt(0))
    var levels = Vector(
      wrds.select(col("w"), lit(0).as("i"), lit(15L).as("comb")))
    for (pos <- 1 to maxLen) {
      val parent = levels.takeRight(ugMaxPiece).reduce(_.union(_))
        .select(col("w").as("dw"), col("i").as("di"), col("comb").as("pc"))
      val step = edges.filter(col("i") === pos)
        .join(parent, col("w") === col("dw") && col("j") === col("di"))
        .groupBy(col("w"))
        .agg(max(col("pc") + lit(16L) * col("q") - 1).as("comb"))
        .select(col("w"), lit(pos).as("i"), col("comb"))
        .localCheckpoint()
      levels = levels :+ step
    }
    val dp = levels.reduce(_.union(_))
    wrds.join(dp, Seq("w")).filter(col("i") === length(col("w")))
      .withColumn("score_q", floor(col("comb") / lit(16.0)).cast("long"))
      .select(col("w").as("word"), col("wn"), col("score_q"),
        (lit(15L) - (col("comb") - lit(16L) * col("score_q")))
          .cast("int").as("n_tok"))
      .orderBy(col("word"))
  }

  /** Unigram-LM tokenizer M-step + vocabulary prune (Kudo '18 §3.2, the
    * hard-EM round of SentencePiece training) — the training-side
    * complement of the E-step [[unigramSegment]]: re-run the Viterbi DP
    * with ARGUMENT TRACKING (per DAG node, the chosen edge under the
    * deterministic tie order comb desc, j asc, piece asc — all exact
    * int64, so the decoded path is unambiguous), walk the best path
    * backward per word to get hard-EM piece usage counts, re-estimate
    * add-1-smoothed quantized log-probs from those counts, and prune the
    * vocabulary to all single characters (segmentability floor) plus the
    * top-32 multi-char pieces by (usage desc, piece asc).
    *
    * Scale shape: the DP and backwalk run on the DISTINCT-word table —
    * `ugMaxLen` join rounds each, O(vocab·len) per round, localCheckpoint
    * lineage cuts throughout; the final rank/re-estimate acts on the
    * ≤(64 + alphabet)-row vocabulary relation (the bounded global window
    * is over that, never corpus rows). The oracle re-derives the full
    * arg-tracked DP + backwalk via unrolled MATERIALIZED CTEs. */
  def unigramPrune(s: SparkSession, dir: String): DataFrame = {
    val (wrds, vq, edges) = unigramGraph(s, dir)
    // r14-opt: same adaptive-depth + per-level DP restructuring as
    // [[unigramSegment]] — see the comment there.
    val maxLen = math.min(ugMaxLen, // null-safe on empty input, as above
      wrds.agg(coalesce(max(length(col("w"))), lit(0))).head().getInt(0))
    var levels = Vector(
      wrds.select(col("w"), lit(0).as("i"), lit(15L).as("comb"),
        lit(null).cast("int").as("bj"), lit(null).cast("string").as("bpiece")))
    for (pos <- 1 to maxLen) {
      val parent = levels.takeRight(ugMaxPiece).reduce(_.union(_))
        .select(col("w").as("dw"), col("i").as("di"), col("comb").as("pc"))
      val step = edges.filter(col("i") === pos)
        .join(parent, col("w") === col("dw") && col("j") === col("di"))
        .select(col("w"), lit(pos).as("i"),
          (col("pc") + lit(16L) * col("q") - 1).as("comb"),
          col("j").as("bj"), col("piece").as("bpiece"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("w"))
          .orderBy(col("comb").desc, col("bj"), col("bpiece"))))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint()
      levels = levels :+ step
    }
    val dp = levels.reduce(_.union(_))
    // hard-EM backwalk: from each word's final DAG node, follow the argmax
    // edges to node 0, crediting wn to every piece on the path. Each hop
    // consumes >= 1 character, so maxLen rounds drain every word.
    var cur = wrds.join(dp, Seq("w")).filter(col("i") === length(col("w")))
      .select(col("w"), col("wn"), col("bj"), col("bpiece"))
      .localCheckpoint()
    val usedParts = Seq.newBuilder[DataFrame]
    for (_ <- 1 to maxLen) {
      usedParts += cur.select(col("bpiece").as("piece"), col("wn"))
      cur = cur.filter(col("bj") > 0)
        .select(col("w"), col("wn"), col("bj").as("ci"))
        .join(dp, Seq("w"))
        .filter(col("i") === col("ci"))
        .select(col("w"), col("wn"), col("bj"), col("bpiece"))
        .localCheckpoint()
    }
    val usage = usedParts.result().reduce(_.union(_))
      .groupBy(col("piece")).agg(sum(col("wn")).as("usage"))
    val joined = vq.join(usage, Seq("piece"), "left")
      .select(col("piece"), col("cnt"),
        coalesce(col("usage"), lit(0L)).as("usage"))
      .localCheckpoint()
    val totU = joined.agg(sum(col("usage")).as("tu"),
      count(lit(1)).as("nv"))
    // bounded relation (<= 64 multi-char + alphabet): the global rank
    // window is over the vocabulary, never corpus rows
    val ranked = joined
      .withColumn("mrank",
        when(length(col("piece")) === 1, lit(0)).otherwise(
          row_number().over(Window.orderBy(
            (length(col("piece")) === 1).asc, col("usage").desc, col("piece")))))
    ranked.crossJoin(broadcast(totU))
      .select(col("piece"), col("cnt"), col("usage"),
        floor((lnDet(col("usage") + lit(1L)) - lnDet(col("tu") + col("nv")))
          * lit(1073741824.0)).cast("long").as("q_new"),
        (length(col("piece")) === 1 || col("mrank") <= 32)
          .cast("int").as("kept"))
      .orderBy(col("piece"))
  }

  private def unigramOracle: String = {
    val maxLen = 12
    val sb = new StringBuilder
    sb ++=
      s"""WITH wrds AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS wn
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE len(w) BETWEEN 1 AND $maxLen GROUP BY w
         |), pc AS MATERIALIZED (
         |  SELECT substr(w, CAST(p AS INT), CAST(l AS INT)) AS piece,
         |         CAST(sum(wn) AS BIGINT) AS cnt
         |  FROM wrds, UNNEST(range(1, len(w)+1)) AS a(p),
         |       UNNEST(range(1, 5)) AS b(l)
         |  WHERE p + l - 1 <= len(w) GROUP BY 1
         |), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM pc
         |), voc AS (
         |  SELECT piece, cnt FROM pc WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM pc WHERE len(piece) > 1
         |    ORDER BY cnt DESC, piece LIMIT 64) mv
         |), vq AS MATERIALIZED (
         |  SELECT piece,
         |    CAST(floor((${lnDetSeriesSql("ta")} - ${lnDetSeriesSql("tb")})
         |               * 1073741824) AS BIGINT) AS q
         |  FROM (SELECT piece, ${sqrt16Sql("cnt")} - 1.0 AS ta,
         |               ${sqrt16Sql("t")} - 1.0 AS tb
         |        FROM voc, tot) sq
         |), edges AS MATERIALIZED (
         |  SELECT sp.w, sp.j, sp.i, vq.q
         |  FROM (SELECT w, CAST(p - 1 AS INT) AS j, CAST(p + l - 1 AS INT) AS i,
         |               substr(w, CAST(p AS INT), CAST(l AS INT)) AS piece
         |        FROM wrds, UNNEST(range(1, len(w)+1)) AS a(p),
         |             UNNEST(range(1, 5)) AS b(l)
         |        WHERE p + l - 1 <= len(w)) sp
         |  JOIN vq USING (piece)
         |), du0 AS MATERIALIZED (
         |  SELECT w, 0 AS i, CAST(15 AS BIGINT) AS comb FROM wrds)"""
        .stripMargin
    for (pos <- 1 to maxLen) {
      sb ++=
        s""",
           |d$pos AS MATERIALIZED (
           |  SELECT e.w, $pos AS i, max(d.comb + 16*e.q - 1) AS comb
           |  FROM edges e JOIN du${pos - 1} d ON e.w = d.w AND e.j = d.i
           |  WHERE e.i = $pos GROUP BY e.w
           |), du$pos AS MATERIALIZED (
           |  SELECT * FROM du${pos - 1} UNION ALL SELECT * FROM d$pos)"""
          .stripMargin
    }
    sb ++=
      s"""
         |SELECT wrds.w AS word, wrds.wn,
         |  CAST(floor(d.comb / 16.0) AS BIGINT) AS score_q,
         |  CAST(15 - (d.comb - 16*CAST(floor(d.comb / 16.0) AS BIGINT))
         |       AS INTEGER) AS n_tok
         |FROM wrds JOIN du$maxLen d ON d.w = wrds.w AND d.i = len(wrds.w)
         |ORDER BY word""".stripMargin
    sb.toString
  }

  private def unigramPruneOracle: String = {
    val maxLen = ugMaxLen
    val sb = new StringBuilder
    sb ++=
      s"""WITH wrds AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS wn
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE len(w) BETWEEN 1 AND $maxLen GROUP BY w
         |), pc AS MATERIALIZED (
         |  SELECT substr(w, CAST(p AS INT), CAST(l AS INT)) AS piece,
         |         CAST(sum(wn) AS BIGINT) AS cnt
         |  FROM wrds, UNNEST(range(1, len(w)+1)) AS a(p),
         |       UNNEST(range(1, ${ugMaxPiece + 1})) AS b(l)
         |  WHERE p + l - 1 <= len(w) GROUP BY 1
         |), tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM pc
         |), voc AS (
         |  SELECT piece, cnt FROM pc WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM pc WHERE len(piece) > 1
         |    ORDER BY cnt DESC, piece LIMIT 64) mv
         |), vq AS MATERIALIZED (
         |  SELECT piece, cnt,
         |    CAST(floor((${lnDetSeriesSql("ta")} - ${lnDetSeriesSql("tb")})
         |               * 1073741824) AS BIGINT) AS q
         |  FROM (SELECT piece, cnt, ${sqrt16Sql("cnt")} - 1.0 AS ta,
         |               ${sqrt16Sql("t")} - 1.0 AS tb
         |        FROM voc, tot) sq
         |), edges AS MATERIALIZED (
         |  SELECT sp.w, sp.j, sp.i, sp.piece, vq.q
         |  FROM (SELECT w, CAST(p - 1 AS INT) AS j, CAST(p + l - 1 AS INT) AS i,
         |               substr(w, CAST(p AS INT), CAST(l AS INT)) AS piece
         |        FROM wrds, UNNEST(range(1, len(w)+1)) AS a(p),
         |             UNNEST(range(1, ${ugMaxPiece + 1})) AS b(l)
         |        WHERE p + l - 1 <= len(w)) sp
         |  JOIN vq USING (piece)
         |), du0 AS MATERIALIZED (
         |  SELECT w, 0 AS i, CAST(15 AS BIGINT) AS comb,
         |         CAST(NULL AS INTEGER) AS bj, CAST(NULL AS VARCHAR) AS bpiece
         |  FROM wrds)"""
        .stripMargin
    for (pos <- 1 to maxLen) {
      sb ++=
        s""",
           |d$pos AS MATERIALIZED (
           |  SELECT w, $pos AS i, comb, bj, bpiece FROM (
           |    SELECT e.w, d.comb + 16*e.q - 1 AS comb, e.j AS bj,
           |           e.piece AS bpiece,
           |           row_number() OVER (PARTITION BY e.w
           |             ORDER BY (d.comb + 16*e.q - 1) DESC, e.j, e.piece) AS rn
           |    FROM edges e JOIN du${pos - 1} d ON e.w = d.w AND e.j = d.i
           |    WHERE e.i = $pos) rr WHERE rn = 1
           |), du$pos AS MATERIALIZED (
           |  SELECT * FROM du${pos - 1} UNION ALL SELECT * FROM d$pos)"""
          .stripMargin
    }
    sb ++=
      s""",
         |bw0 AS MATERIALIZED (
         |  SELECT d.w, wrds.wn, d.bj, d.bpiece
         |  FROM du$maxLen d JOIN wrds ON d.w = wrds.w AND d.i = len(wrds.w))"""
        .stripMargin
    for (k <- 1 until maxLen) {
      sb ++=
        s""",
           |bw$k AS MATERIALIZED (
           |  SELECT d.w, b.wn, d.bj, d.bpiece
           |  FROM bw${k - 1} b JOIN du$maxLen d ON d.w = b.w AND d.i = b.bj
           |  WHERE b.bj > 0)"""
          .stripMargin
    }
    val usedUnion = (0 until maxLen)
      .map(k => s"SELECT bpiece AS piece, wn FROM bw$k").mkString(" UNION ALL ")
    sb ++=
      s""",
         |usage AS MATERIALIZED (
         |  SELECT piece, CAST(sum(wn) AS BIGINT) AS usage
         |  FROM ($usedUnion) GROUP BY 1
         |), joined AS MATERIALIZED (
         |  SELECT vq.piece, vq.cnt, coalesce(u.usage, 0) AS usage
         |  FROM vq LEFT JOIN usage u USING (piece)
         |), totu AS (
         |  SELECT CAST(sum(usage) AS BIGINT) AS tu,
         |         CAST(count(*) AS BIGINT) AS nv FROM joined
         |), ranked AS (
         |  SELECT piece, cnt, usage,
         |    CASE WHEN len(piece) = 1 THEN 0
         |         ELSE CAST(row_number() OVER (
         |           ORDER BY (len(piece) = 1) ASC, usage DESC, piece) AS INT)
         |    END AS mrank
         |  FROM joined
         |)
         |SELECT piece, cnt, usage,
         |  CAST(floor((${lnDetSeriesSql("na")} - ${lnDetSeriesSql("nb")})
         |             * 1073741824) AS BIGINT) AS q_new,
         |  CAST(len(piece) = 1 OR mrank <= 32 AS INT) AS kept
         |FROM (SELECT piece, cnt, usage, mrank,
         |        ${sqrt16Sql("usage + 1")} - 1.0 AS na,
         |        ${sqrt16Sql("tu + nv")} - 1.0 AS nb
         |      FROM ranked, totu) f
         |ORDER BY piece""".stripMargin
    sb.toString
  }

  private def bpeTrainOracle: String = {
    val rounds = 6
    val sb = new StringBuilder
    sb ++=
      """WITH w0 AS MATERIALIZED (
        |  SELECT ' ' || trim(regexp_replace(w, '(.)', '\1 ', 'g')) || ' ' AS syms,
        |         count(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 GROUP BY 1
        |)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
        |p$r AS (
        |  SELECT toks[i] AS l, toks[i+1] AS r, CAST(sum(n) AS BIGINT) AS pair_n
        |  FROM (SELECT string_split(trim(syms), ' ') AS toks, n FROM w${r - 1}),
        |       UNNEST(range(1, len(toks))) AS u(i)
        |  GROUP BY 1, 2
        |), b$r AS MATERIALIZED (
        |  SELECT $r AS rk, l, r, pair_n FROM p$r
        |  ORDER BY pair_n DESC, l, r LIMIT 1
        |)""".stripMargin
      if (r < rounds) sb ++= s""",
        |w$r AS MATERIALIZED (
        |  SELECT replace(replace(replace(syms, ' ', '  '),
        |           ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' '),
        |         '  ', ' ') AS syms, n
        |  FROM w${r - 1}, b$r b
        |)""".stripMargin
    }
    sb ++= "\n" + (1 to rounds)
      .map(r => s"SELECT rk, l, r, pair_n FROM b$r").mkString("\nUNION ALL\n")
    sb ++= "\nORDER BY rk"
    sb.toString
  }

  /** Frequency-ordered vocabulary build: token → contiguous id, most
    * frequent first (ties broken lexically), the id assignment step before
    * any count-based tokenization. Global ordering over the vocab-sized
    * count table uses ScaledRank's two-phase range-partitioned row_number —
    * a plain Window.orderBy would funnel the whole vocabulary through one
    * task, and real corpora have vocabularies in the hundreds of millions
    * (every typo and number is a token candidate). */
  def vocab(s: SparkSession, dir: String): DataFrame = {
    val counts = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    ScaledRank.withGlobalRanks(counts,
        orderCols = Seq(col("n").desc, col("term")),
        keyCols = Seq(col("n"), col("term")))
      .select(col("rn").cast("long").as("token_id"), col("term"), col("n"))
      .orderBy(col("token_id"))
  }

  /** Spark 4 regex function family beyond extract/replace: regexp_count
    * (occurrence tally) and regexp_substr (first match, NULL-safe).
    * DuckDB twins: len(regexp_extract_all) and regexp_extract(..., 0)
    * with the empty-vs-NULL no-match delta normalized by coalesce on
    * BOTH sides. Pure map stage over the corpus. */
  def regexFuncs(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir).createOrReplaceTempView("documents_v")
    s.sql(
      """SELECT doc_id,
        |  regexp_count(text, '[aeiou]{2}') AS n_vowel_pairs,
        |  coalesce(regexp_substr(text, '[a-z]{8,}'), '') AS first_long_word,
        |  regexp_count(text, '\\.') AS n_periods
        |FROM documents_v ORDER BY doc_id""".stripMargin)
  }

  /** BM25 ranking (Robertson–Spärck Jones, k1 = 1.2, b = 0.75) of the
    * corpus against a fixed query-term set — the lexical-retrieval scorer
    * every RAG/training-data pipeline runs next to its vector leg (the
    * vector leg and the RRF fusion live in VectorOps). Plan shape is the
    * inverted-index join: token explode → (doc, term) tf, term df — the
    * per-term stats are vocabulary-sized and broadcast; no doc×doc or
    * doc×corpus relation ever materializes, so the same plan serves an
    * arbitrarily large corpus. Scores are summed over ≤ |query| terms and
    * rounded before the rank-order, so cross-engine float-sum ordering
    * cannot flip the top-k. */
  def bm25(s: SparkSession, dir: String): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val queryTerms = Seq("spark", "window", "join", "hash")
    val tok = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val qtok = tok.filter(col("term").isin(queryTerms: _*))
    val tf = qtok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfc = qtok.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val contrib = idf * col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfc), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(contrib), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(10)
  }

  /** Token co-occurrence PMI (pointwise mutual information — the word2vec
    * / collocation-mining statistic): over DISTINCT (doc, token) pairs,
    * pmi(a,b) = ln(c_ab·N / (c_a·c_b)) for pairs co-occurring in ≥ 5 docs;
    * top 30 by (pmi, tok1, tok2). The pair space is bounded by VOCABULARY
    * (the df ≥ 5 support floor drops hapax noise), not by corpus size: the
    * self-join is per-doc over each doc's distinct-token list, so work is
    * Σ_d |tokens_d|² — linear in corpus with bounded doc length — and the
    * unigram-count join is vocab-sized and broadcast. */
  def cooccurPmi(s: SparkSession, dir: String): DataFrame = {
    val dtok = docs(s, dir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
        .as("tok"))
      .filter(length(col("tok")) > 0)
      .persist() // q-cache
    val n = docs(s, dir).agg(count(lit(1)).cast("double").as("n"))
    val cnt = dtok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val pairs = dtok.select(col("doc_id"), col("tok").as("tok1"))
      .join(dtok.select(col("doc_id"), col("tok").as("tok2")), "doc_id")
      .filter(col("tok1") < col("tok2"))
      .groupBy(col("tok1"), col("tok2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    pairs
      .join(broadcast(cnt.select(col("tok").as("tok1"), col("c").as("ca"))),
        "tok1")
      .join(broadcast(cnt.select(col("tok").as("tok2"), col("c").as("cb"))),
        "tok2")
      .crossJoin(broadcast(n))
      .select(col("tok1"), col("tok2"), col("c_ab"),
        round(log(col("c_ab") * col("n") / (col("ca") * col("cb"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("tok1"), col("tok2"))
      .limit(30)
  }

  /** Per-source distribution divergence: KL(p_source ‖ p_corpus) and
    * Shannon entropy over token unigram distributions — the domain-shift /
    * corpus-mix monitor a training-data pipeline runs per ingest source.
    * Every source token appears in the corpus distribution by construction,
    * so the KL sum has no zero-denominator terms. The per-(source, token)
    * aggregate is the only corpus-wide pass; token totals and the corpus
    * unigram table are VOCABULARY-sized and broadcast. Gibbs' inequality
    * (KL ≥ 0) is pinned in the spec. */
  def klDivergence(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val st = tok.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).cast("double").as("c_st"))
    val stot = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val ct = tok.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("c_t"))
    val n = tok.agg(count(lit(1)).cast("double").as("n"))
    val p = col("c_st") / col("n_s")
    st.join(broadcast(ct), "tok")
      .join(broadcast(stot), "source")
      .crossJoin(broadcast(n))
      .groupBy(col("source"))
      .agg(max(col("n_s")).cast("long").as("n_tokens"),
        count(lit(1)).as("vocab"),
        round(sum(p * log(p / (col("c_t") / col("n")))), 6).as("kl_div"),
        round(-sum(p * log(p)), 6).as("entropy"))
      .orderBy(col("source"))
  }

  /** Class-based TF-IDF (the BERTopic c-TF-IDF shape): each SOURCE is one
    * meta-document; term weight = tf_source · ln(1 + A/f_term) with A =
    * average per-source token count and f_term = corpus frequency. Top 5
    * keywords per source — the "what is this ingest source about" readout.
    * Per-(source, term) aggregate → vocab-sized stat broadcasts → per-source
    * top-k via a window over vocab-bounded partitions. */
  def sourceKeywords(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .persist() // q-cache
    val tf = tok.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val fTerm = tok.groupBy(col("term")).agg(count(lit(1)).as("f"))
    val a = tok.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      .agg(avg(col("n_s")).as("a"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("ctfidf").desc, col("term"))
    tf.join(broadcast(fTerm), "term")
      .crossJoin(broadcast(a))
      .withColumn("ctfidf",
        round(col("tf") * log(lit(1.0) + col("a") / col("f")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("source"), col("rk"), col("term"), col("ctfidf"))
      .orderBy(col("source"), col("rk"))
  }

  /** Fuzzy name matching with the native string-distance expressions
    * (graft.functions.StringDistances): Jaro–Winkler similarity, FULL
    * Damerau–Levenshtein, and Hamming over supplier-name pairs. Blocked on
    * floor(key/50) so the self-join is a plain equi join with constant
    * 50-row blocks — pairs stay O(blocks × 50²) at any corpus size, never
    * O(N²) — and every distance runs as one static-call codegen'd kernel
    * inside the join's projection (no UDF, no interpreted fallback). The
    * oracle runs DuckDB's builtins of the same names: the driver
    * hash-compares ~2.4k (sf0.01) distance values per run, pinning all
    * three kernels' semantics (boost-gated Winkler bonus; unrestricted
    * transpositions — see StringDistance.scala probes). */
  def fuzzyNameMatch(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import graft.functions.GraftFunctions._
    val sup = Tables(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"),
        floor(col("s_suppkey") / 50).as("blk"))
    val a = sup.select(col("blk"), col("s_suppkey").as("k1"),
      col("s_name").as("n1"))
    val b = sup.select(col("blk"), col("s_suppkey").as("k2"),
      col("s_name").as("n2"))
    a.join(b, "blk")
      .filter(col("k1") < col("k2"))
      .select(col("k1"), col("k2"),
        round(jaroWinkler(col("n1"), col("n2")), 6).as("jw_sim"),
        damerauLev(col("n1"), col("n2")).as("dl_dist"),
        hamming(col("n1"), col("n2")).as("ham_dist"))
      .orderBy(col("k1"), col("k2"))
  }

  /** C4-style duplicate-span detection: fixed 120-char chunks (the same
    * grid as `docChunks`), md5-fingerprinted, grouped — a chunk hash seen
    * in ≥ 2 distinct documents is boilerplate/duplicated material its
    * members share (the line-level dedup pass of C4/RefinedWeb-style
    * pipelines, on a char grid because the synthetic corpus has no
    * newlines). Scale shape: explode is linear in corpus size, the groupBy
    * is a hash agg on a 32-hex key with map-side combine, and the ≥2-doc
    * filter drops the unique long tail before any further join — no pair
    * join anywhere, so this is the cheapest dedup signal in the pipeline
    * (exact dedup of spans rather than whole docs). */
  def dupChunks(s: SparkSession, dir: String): DataFrame = {
    val w = 120
    docs(s, dir)
      // empty docs emit zero chunks, matching the oracle's empty range();
      // without the guard sequence(0, -1) steps BACKWARD to [0, -1] and
      // fabricates two phantom md5('') chunks per empty doc
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          ceil(length(col("text")) / w.toDouble).cast("int") - 1)).as("ci"))
      .select(col("doc_id"),
        expr(s"md5(substring(text, ci * $w + 1, $w))").as("chunk_hash"))
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("chunk_hash"))
  }

  /** Per-group top-k WITHOUT a window: the native `TopKByValue` heap
    * aggregate (graft.functions.TopKAgg) keeps a bounded k-element heap per
    * group with map-side partial aggregation, so only k rows per group per
    * task are shuffled — vs `q_window_topk_group`'s rank-over-partition,
    * which must exchange and sort the full corpus. Same answer (the
    * (value DESC, id ASC) total order matches the oracle's row_number
    * tie-break exactly), different — and at 100 TB strictly better —
    * plan. */
  def topkAgg(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    docs(s, dir)
      .groupBy(col("lang"))
      .agg(graft.functions.GraftFunctions.topK(
        col("n_chars").cast("double"), col("doc_id"), 3).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rnk"),
        col("t.id").as("doc_id"), col("t.value").cast("int").as("n_chars"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** Shift-robust duplicate-span detection via CONTENT-DEFINED chunking
    * (graft.functions.CdcBoundaries — the rsync/LBFS technique): chunk
    * boundaries fall where a rolling window hash hits 0 mod 64, so an
    * insertion early in a document changes only the chunks touching the
    * edit while every later chunk keeps its content and fingerprint —
    * the failure mode of [[dupChunks]]' fixed 120-char grid, whose chunks
    * ALL shift after any edit. Same downstream shape as dupChunks:
    * md5-fingerprint, hash agg with map-side combine, ≥2-doc filter, no
    * pair join. The boundary relation is one native-expression eval per
    * doc; the per-doc lag that turns ends into segments partitions on
    * doc_id (bounded ends per doc, corpus-parallel). The ORACLE recomputes
    * the window hashes in SQL generated from the SAME constants
    * (CdcParams.oracleHashSql — the languageId generated-twin pattern), so
    * chunk fingerprints themselves hash-match, not just counts. */
  def cdcDupChunks(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("e"))
    docs(s, dir)
      .select(col("doc_id"), col("text"),
        explode(graft.functions.GraftFunctions.cdcEnds(col("text"))).as("e"))
      .withColumn("pe", lag(col("e"), 1, 0).over(w))
      .select(col("doc_id"),
        md5(expr("substring(text, pe + 1, e - pe)")).as("chunk_hash"))
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("chunk_hash"))
  }

  /** Sorted-neighborhood (SNM) candidate generation — the third blocking
    * family next to key blocking (jaccardPairs) and LSH banding
    * (minhashCandidates): sort the corpus by a fuzzy key (here (n_chars,
    * doc_id)), then pair each record with its w successors in the global
    * order (Hernández & Stolfo, SIGMOD'95). Guarantees exactly w·N
    * candidates regardless of key skew — where key blocking degrades to
    * O(block²) on hot keys, SNM's window is constant by construction.
    *
    * Scale shape: the global order comes from `ScaledRank.withGlobalRanks`
    * (range-partitioned two-phase — no single-task window), successor
    * pairing is an explode of w rank offsets joined back on rank equality
    * — a plain equi join on a dense unique key. Nothing here is ever
    * quadratic. */
  def snmPairs(s: SparkSession, dir: String): DataFrame = {
    val w = 5
    val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
    val ranked = ScaledRank.withGlobalRanks(d,
        Seq(col("n_chars"), col("doc_id")), Seq(col("doc_id")))
      .select(col("rn"), col("doc_id"), col("n_chars"))
    val a = ranked.select(col("rn").as("r1"), col("doc_id").as("id1"),
      col("n_chars").as("len1"))
    val b = ranked.select(col("rn").as("r2"), col("doc_id").as("id2"),
      col("n_chars").as("len2"))
    a.withColumn("rank_gap", explode(array((1 to w).map(lit): _*)))
      .withColumn("r2", col("r1") + col("rank_gap"))
      .join(b, "r2")
      .select(col("id1"), col("id2"), col("rank_gap"),
        (col("len2") - col("len1")).cast("int").as("len_diff"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Multinomial Naive-Bayes language classifier — the TRAINED-classifier
    * filter stage of modern pretraining pipelines (CCNet's fastText LID,
    * FineWeb-Edu's quality scorer), as opposed to the fixed-profile
    * heuristic [[languageIdOn]]: FIT per-(lang, token) integer counts with
    * add-1 smoothing on the deterministic train split (doc_id % 5 ≠ 0),
    * APPLY to the held-out split, EVALUATE as the test confusion matrix.
    *
    * Determinism across engines: the model is exact integers end to end —
    * log-likelihoods ln((c+1)/(T_l+V)) and log-priors ln(D_l/D) are
    * 2⁻³⁰-quantized int64 via [[lnDet]]'s IEEE-exact ln, a doc's score is
    * an exact int64 dot product Σ n_tok·q(lang,tok) + q_prior(lang)
    * (|q| < 2³⁵, ≤~10³ terms — no overflow), and the argmax breaks score
    * ties by lang ascending. No float enters any comparison.
    *
    * Scale shape: fit is one map-side-combined groupBy over the token
    * stream; the dense likelihood table is vocab × |langs| rows built by
    * broadcasting the |langs|-row totals (vocab is Heaps-law bounded, the
    * CROSS side is 5 rows — never corpus-sized); apply is a shuffle equi
    * join on token (vocab-keyed, NOT a broadcast: at 100 TB the vocab may
    * exceed broadcast limits) + one hash agg per (doc, lang); OOV test
    * tokens drop in the inner join on BOTH engines (the standard NB
    * treatment — no lang is favored since the drop is lang-independent). */
  def nbClassify(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val train = toks.filter(col("doc_id") % 5 =!= 0)
    val cnt = train.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds totals + the dense table; cut the rescan
    val langTot = cnt.groupBy(col("lang")).agg(sum(col("c")).as("lt"))
    val vocab = cnt.select(col("tok")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val lik = vocab
      .crossJoin(broadcast(langTot))
      .crossJoin(broadcast(vSize))
      .join(cnt, Seq("lang", "tok"), "left")
      .select(col("lang"), col("tok"),
        floor((lnDet(coalesce(col("c"), lit(0L)) + lit(1L))
          - lnDet(col("lt") + col("v"))) * lit(1073741824.0))
          .cast("long").as("q"))
    val dl = train.select(col("doc_id"), col("lang")).distinct()
      .groupBy(col("lang")).agg(count(lit(1)).as("d"))
    val dTot = dl.agg(sum(col("d")).as("t"))
    val prior = dl.crossJoin(broadcast(dTot))
      .select(col("lang"),
        floor((lnDet(col("d")) - lnDet(col("t"))) * lit(1073741824.0))
          .cast("long").as("qp"))
    val test = toks.filter(col("doc_id") % 5 === 0)
    val tc = test.groupBy(col("doc_id"), col("lang").as("actual_lang"),
        col("tok")).agg(count(lit(1)).as("n"))
    val scores = tc.join(lik, "tok")
      .groupBy(col("doc_id"), col("actual_lang"), col("lang"))
      .agg(sum(col("n") * col("q")).as("s"))
      .join(broadcast(prior), "lang")
      .select(col("doc_id"), col("actual_lang"), col("lang"),
        (col("s") + col("qp")).as("score"))
    val pred = scores
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("lang"))))
      .filter(col("rn") === 1)
    pred.groupBy(col("actual_lang"), col("lang").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("actual_lang"), col("pred_lang"))
  }

  private def nbClassifyOracle: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, lang, tok FROM (
       |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
       |    FROM documents) WHERE len(tok) > 0
       |), tr AS (SELECT * FROM toks WHERE doc_id % 5 <> 0
       |), cnt AS MATERIALIZED (
       |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
       |  FROM tr GROUP BY 1, 2
       |), lt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS lt FROM cnt GROUP BY 1
       |), voc AS (SELECT DISTINCT tok FROM cnt
       |), vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc
       |), lik1 AS (
       |  SELECT l.lang, voc.tok,
       |    ${sqrt16Sql("coalesce(cnt.c, 0) + 1")} - 1.0 AS ta,
       |    ${sqrt16Sql("l.lt + vs.v")} - 1.0 AS tb
       |  FROM voc CROSS JOIN lt l CROSS JOIN vs
       |  LEFT JOIN cnt ON cnt.lang = l.lang AND cnt.tok = voc.tok
       |), lik AS MATERIALIZED (
       |  SELECT lang, tok,
       |    CAST(floor((${lnDetSeriesSql("ta")} - ${lnDetSeriesSql("tb")})
       |               * 1073741824) AS BIGINT) AS q
       |  FROM lik1
       |), dl AS (
       |  SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS d
       |  FROM tr GROUP BY 1
       |), dt AS (SELECT CAST(sum(d) AS BIGINT) AS t FROM dl
       |), prior AS (
       |  SELECT lang,
       |    CAST(floor((${lnDetSeriesSql("pa")} - ${lnDetSeriesSql("pb")})
       |               * 1073741824) AS BIGINT) AS qp
       |  FROM (SELECT lang, ${sqrt16Sql("d")} - 1.0 AS pa,
       |               ${sqrt16Sql("t")} - 1.0 AS pb FROM dl, dt)
       |), tc AS (
       |  SELECT doc_id, lang AS actual_lang, tok, CAST(count(*) AS BIGINT) AS n
       |  FROM toks WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3
       |), sc AS (
       |  SELECT tc.doc_id, tc.actual_lang, lik.lang,
       |    CAST(sum(tc.n * lik.q) AS BIGINT) AS s
       |  FROM tc JOIN lik USING (tok) GROUP BY 1, 2, 3
       |), scored AS (
       |  SELECT sc.doc_id, sc.actual_lang, sc.lang, sc.s + p.qp AS score
       |  FROM sc JOIN prior p ON p.lang = sc.lang
       |), pred AS (
       |  SELECT doc_id, actual_lang, lang AS pred_lang,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score DESC, lang) AS rn
       |  FROM scored
       |)
       |SELECT actual_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
       |FROM pred WHERE rn = 1
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_source_keywords" -> (sourceKeywords _),
    "q_kl_divergence" -> (klDivergence _),
    "q_bm25" -> (bm25 _),
    "q_cooccur_pmi" -> (cooccurPmi _),
    "q_regex_funcs" -> (regexFuncs _),
    "q_lm_perplexity" -> (lmPerplexity _),
    "q_vocab" -> (vocab _),
    "q_bpe_merge_candidates" -> (bpeMergeCandidates _),
    "q_bpe_train" -> ((s: SparkSession, d: String) => bpeTrain(s, d)),
    "q_unigram_segment" -> (unigramSegment _),
    "q_unigram_prune" -> (unigramPrune _),
    "q_nb_classify" -> (nbClassify _),
    "q_dedup_exact" -> (dedupExact _),
    "q_dedup_hashkey" -> (dedupHashKey _),
    "q_fingerprint" -> (fingerprint _),
    "q_token_stats" -> (tokenStats _),
    "q_lang_stats" -> (langStats _),
    "q_term_freq" -> (termFreq _),
    "q_zipf_fit" -> (zipfFit _),
    "q_heaps_law" -> (heapsLaw _),
    "q_ngram_novelty" -> (ngramNovelty _),
    "q_burstiness" -> (burstiness _),
    "q_quality_score" -> (qualityScore _),
    "q_gopher_rules" -> (gopherRules _),
    "q_dsir_importance" -> (dsirImportance _),
    "q_token_fertility" -> (tokenFertility _),
    "q_perplexity_buckets" -> (perplexityBuckets _),
    "q_dsir_select" -> (dsirSelect _),
    "q_oov_rate" -> (oovRate _),
    "q_jaccard_pairs" -> (jaccardPairs _),
    "q_jaccard_prefix" -> (jaccardPrefix _),
    "q_containment_pairs" -> (containmentPairs _),
    "q_minhash_candidates" -> (minhashCandidates _),
    "q_simhash_pairs" -> (simhashPairs _),
    "q_language_id" -> (languageId _),
    "q_token_count_bpe" -> (tokenCountBpe _),
    "q_winnow_fingerprints" -> (winnowFingerprints _),
    "q_pii_redact" -> (piiRedact _),
    "q_doc_chunks" -> (docChunks _),
    "q_chunk_gen" -> (chunkGen _),
    "q_edit_distance_pairs" -> (editDistancePairs _),
    "q_repetition_ratio" -> (repetitionRatio _),
    "q_tfidf" -> (tfidf _),
    "q_tfidf_retrieval" -> (tfidfRetrieval _),
    "q_bpe_encode" -> (bpeEncode _),
    "q_wordpiece_encode" -> (wordpieceEncode _),
    "q_kn_bigram" -> (knBigram _),
    "q_stratified_sample" -> (stratifiedSample _),
    "q_source_mix" -> (sourceMix _),
    "q_fuzzy_match" -> (fuzzyNameMatch _),
    "q_dup_chunks" -> (dupChunks _),
    "q_topk_agg" -> (topkAgg _),
    "q_snm_pairs" -> (snmPairs _),
    "q_cdc_chunks" -> (cdcDupChunks _),
  )

  /** DuckDB twin of [[cdcDupChunks]], GENERATED from CdcParams' constants:
    * same window-hash term sum, same boundary mask, same end-union, same
    * lag-to-segments construction. */
  private def cdcChunksOracle: String = {
    val pred = graft.functions.CdcParams.oracleHashSql("text", "i")
    val wm = graft.functions.CdcParams.w
    s"""WITH pos AS (
       |  SELECT doc_id, text,
       |         unnest(range($wm, length(text) + 1)) AS i
       |  FROM documents
       |), hh AS (
       |  SELECT doc_id, i AS e FROM pos WHERE $pred
       |), ends AS (
       |  SELECT doc_id, e FROM hh
       |  UNION
       |  SELECT doc_id, length(text) AS e FROM documents
       |), seg AS (
       |  SELECT doc_id, e,
       |         lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY e) AS pe
       |  FROM ends
       |), ch AS (
       |  SELECT s.doc_id,
       |         md5(substring(d.text, s.pe + 1, s.e - s.pe)) AS chunk_hash
       |  FROM seg s JOIN documents d ON s.doc_id = d.doc_id
       |)
       |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
       |       count(*) AS n_occ, min(doc_id) AS first_doc
       |FROM ch GROUP BY chunk_hash
       |HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY chunk_hash""".stripMargin
  }

  private val docChunksOracle: String =
    """WITH e AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, CAST(ceil(length(text)/120.0) AS BIGINT))) AS ci
      |  FROM documents)
      |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
      |       substring(text, CAST(ci*120+1 AS INTEGER), 120) AS chunk,
      |       CAST(length(substring(text, CAST(ci*120+1 AS INTEGER), 120)) AS INTEGER) AS chunk_len
      |FROM e ORDER BY doc_id, chunk_idx""".stripMargin

  /** DuckDB twin of `languageIdOn`, GENERATED from the same `langProfiles`
    * so the two engines cannot drift: per language, the same
    * replace-based occurrence count (each term an exact integer over
    * doubles), argmax via list_sort-descending on (score, lang) structs —
    * DuckDB sorts struct lists lexicographically, which is exactly
    * Spark's greatest(struct(score, lang)) tie-break (largest lang wins
    * on equal scores). */
  private def languageIdOracle: String = {
    val structs = langProfiles.map { case (lang, grams) =>
      val terms = grams.map(g =>
        s"(len(p) - len(replace(p, '$g', ''))) / ${g.length}").mkString(" + ")
      s"{'score': CAST($terms AS DOUBLE), 'lang': '$lang'}"
    }.mkString(",\n        |      ")
    s"""WITH s AS (
        |  SELECT doc_id, lang AS label_lang,
        |         ' ' || lower(text) || ' ' AS p
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, label_lang,
        |    list_sort([
        |      $structs
        |    ], 'DESC')[1] AS best
        |  FROM s)
        |SELECT doc_id, label_lang,
        |  struct_extract(best, 'lang') AS predicted_lang,
        |  round(struct_extract(best, 'score'), 2) AS lang_score
        |FROM b ORDER BY doc_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_source_keywords" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |t2 AS (SELECT source, term FROM tok WHERE term <> ''),
        |tf AS (SELECT source, term, count(*) AS tf FROM t2 GROUP BY 1, 2),
        |f AS (SELECT term, count(*) AS f FROM t2 GROUP BY 1),
        |a AS (SELECT avg(n_s) AS a FROM
        |      (SELECT count(*) AS n_s FROM t2 GROUP BY source)),
        |scored AS (
        |  SELECT source, term,
        |    round(tf * ln(1.0 + (SELECT a FROM a) / f.f), 6) AS ctfidf
        |  FROM tf JOIN f USING (term)),
        |ranked AS (
        |  SELECT source, term, ctfidf,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ctfidf DESC, term) AS rk
        |  FROM scored)
        |SELECT source, CAST(rk AS INTEGER) AS rk, term, ctfidf
        |FROM ranked WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    "q_kl_divergence" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |t2 AS (SELECT source, tok FROM tok WHERE tok <> ''),
        |st AS (SELECT source, tok, CAST(count(*) AS DOUBLE) AS c_st
        |       FROM t2 GROUP BY 1, 2),
        |stot AS (SELECT source, sum(c_st) AS n_s FROM st GROUP BY 1),
        |ct AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c_t
        |       FROM t2 GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM t2)
        |SELECT st.source, CAST(max(n_s) AS BIGINT) AS n_tokens,
        |  count(*) AS vocab,
        |  round(sum((c_st / n_s)
        |    * ln((c_st / n_s) / (c_t / (SELECT n FROM nn)))), 6) AS kl_div,
        |  round(-sum((c_st / n_s) * ln(c_st / n_s)), 6) AS entropy
        |FROM st JOIN stot ON st.source = stot.source
        |        JOIN ct ON st.tok = ct.tok
        |GROUP BY st.source ORDER BY st.source""".stripMargin,

    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tok2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2
        |       WHERE term IN ('spark', 'window', 'join', 'hash') GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok2
        |       WHERE term IN ('spark', 'window', 'join', 'hash') GROUP BY 1)
        |SELECT tf.doc_id,
        |  round(sum(ln(((SELECT n FROM stats) - df + 0.5) / (df + 0.5) + 1.0)
        |    * tf * (1.2 + 1.0)
        |    / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (SELECT avgdl FROM stats)))),
        |    6) AS bm25
        |FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        |GROUP BY tf.doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    "q_cooccur_pmi" ->
      """WITH dtok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), dtok2 AS (SELECT doc_id, tok FROM dtok WHERE tok <> ''),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |cnt AS (SELECT tok, count(*) AS c FROM dtok2 GROUP BY tok),
        |pairs AS (
        |  SELECT a.tok AS tok1, b.tok AS tok2, count(*) AS c_ab
        |  FROM dtok2 a JOIN dtok2 b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT tok1, tok2, c_ab,
        |  round(ln(c_ab * (SELECT n FROM nn) / (ca.c * cb.c)), 6) AS pmi
        |FROM pairs JOIN cnt ca ON pairs.tok1 = ca.tok
        |           JOIN cnt cb ON pairs.tok2 = cb.tok
        |ORDER BY pmi DESC, tok1, tok2 LIMIT 30""".stripMargin,

    "q_regex_funcs" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[aeiou]{2}')) AS INTEGER)
        |    AS n_vowel_pairs,
        |  coalesce(regexp_extract(text, '[a-z]{8,}', 0), '')
        |    AS first_long_word,
        |  CAST(len(regexp_extract_all(text, '\.')) AS INTEGER) AS n_periods
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_language_id" -> languageIdOracle,

    "q_lm_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)),
        |      i -> {'w1': t[i], 'w2': t[i+1]}), recursive := true)
        |  FROM tok),
        |lm AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, sum(c12) AS c1 FROM lm GROUP BY 1)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |  round(exp(-avg(ln(l.c12 / c.c1))), 6) AS ppl
        |FROM bg b JOIN lm l USING (w1, w2) JOIN ctx c ON l.w1 = c.w1
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,

    "q_perplexity_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t)),
        |      i -> {'w1': t[i], 'w2': t[i+1]}), recursive := true)
        |  FROM tok),
        |lm AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, sum(c12) AS c1 FROM lm GROUP BY 1),
        |ppl AS (
        |  SELECT b.doc_id, round(exp(-avg(ln(l.c12 / c.c1))), 6) AS ppl
        |  FROM bg b JOIN lm l USING (w1, w2) JOIN ctx c ON l.w1 = c.w1
        |  GROUP BY b.doc_id),
        |ranked AS (
        |  SELECT p.doc_id, d.lang, p.ppl,
        |    CAST(ntile(3) OVER (PARTITION BY d.lang ORDER BY p.ppl, p.doc_id) AS INTEGER) AS tercile
        |  FROM ppl p JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, ppl, tercile,
        |  CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM ranked ORDER BY doc_id""".stripMargin,

    "q_bpe_train" -> bpeTrainOracle,
    "q_unigram_segment" -> unigramOracle,
    "q_unigram_prune" -> unigramPruneOracle,
    "q_nb_classify" -> nbClassifyOracle,
    "q_bpe_merge_candidates" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |p AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i:i+1])) AS pair
        |  FROM w WHERE len(w) >= 2)
        |SELECT pair, count(*) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    "q_vocab" ->
      """WITH c AS (
        |  SELECT term, count(*) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE length(term) > 0 GROUP BY term)
        |SELECT row_number() OVER (ORDER BY n DESC, term) AS token_id,
        |  term, n
        |FROM c ORDER BY token_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        |       md5(text) AS fingerprint
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    // q_dedup_hashkey: hash is only the SHUFFLE key — the result is the
    // same relation, so the oracle is the same group-by-text SQL
    "q_dedup_hashkey" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        |       md5(text) AS fingerprint
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fingerprint,
        |       CAST(length(text) AS INTEGER) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_unique,
        |  round(len(list_distinct(string_split(text, ' '))) * 1.0
        |        / len(string_split(text, ' ')), 6) AS ttr
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(n_chars), 6) AS avg_chars,
        |  round(avg(len(string_split(text, ' '))), 6) AS avg_tokens,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // slope = OLS on 2^-10-quantized lnDet values, exact int64 sums,
    // cross-products in fixed-order IEEE double — mirrors zipfFit op
    // for op (see the lnDet scaladoc for why ln() itself is banned here)
    "q_zipf_fit" ->
      s"""WITH tf AS (
         |  SELECT term, count(*) AS n FROM (
         |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
         |  WHERE length(term) > 0 GROUP BY term),
         |ranked AS (
         |  SELECT term, n,
         |    row_number() OVER (ORDER BY n DESC, term) AS rank FROM tf),
         |tq AS (
         |  SELECT ${sqrt16Sql("rank")} - 1.0 AS tx,
         |         ${sqrt16Sql("n")} - 1.0 AS ty FROM ranked),
         |q AS (
         |  SELECT CAST(floor((${lnDetSeriesSql("tx")}) * 1024.0) AS BIGINT) AS xq,
         |         CAST(floor((${lnDetSeriesSql("ty")}) * 1024.0) AS BIGINT) AS yq
         |  FROM tq),
         |fit AS (
         |  SELECT round(
         |    (CAST(count(*) AS DOUBLE) * CAST(CAST(sum(xq * yq) AS BIGINT) AS DOUBLE)
         |      - CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE)
         |        * CAST(CAST(sum(yq) AS BIGINT) AS DOUBLE))
         |    / (CAST(count(*) AS DOUBLE) * CAST(CAST(sum(xq * xq) AS BIGINT) AS DOUBLE)
         |      - CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE)
         |        * CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE)), 6) AS zipf_slope
         |  FROM q)
         |SELECT rank, term, n, (SELECT zipf_slope FROM fit) AS zipf_slope
         |FROM ranked WHERE rank <= 30 ORDER BY rank""".stripMargin,

    // cumulative BIGRAM vocabulary via first-occurrence checkpoints — no
    // prefix re-scan; 20 quantile checkpoints of the doc-id space
    "q_heaps_law" ->
      s"""WITH nd AS (SELECT count(*) AS n FROM documents),
        |toks AS (
        |  SELECT doc_id, least(20, (doc_id * 20) // (SELECT n FROM nd) + 1)
        |           AS ck, t[i.g] || ' ' || t[i.g + 1] AS term
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t
        |        FROM documents) d,
        |       LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS g) i
        |  WHERE len(t) >= 2),
        |new_terms AS (
        |  SELECT ck, count(*) AS new_terms FROM (
        |    SELECT term, min(ck) AS ck FROM toks GROUP BY term)
        |  GROUP BY ck),
        |tok_cnt AS (SELECT ck, count(*) AS toks FROM toks GROUP BY ck),
        |curve AS (
        |  SELECT t.ck,
        |    CAST(sum(t.toks) OVER (ORDER BY t.ck
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_tokens,
        |    CAST(sum(coalesce(n.new_terms, 0)) OVER (ORDER BY t.ck
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab
        |  FROM tok_cnt t LEFT JOIN new_terms n ON t.ck = n.ck),
        |tq AS (
        |  SELECT ${sqrt16Sql("n_tokens")} - 1.0 AS tx,
        |         ${sqrt16Sql("vocab")} - 1.0 AS ty FROM curve),
        |q AS (
        |  SELECT CAST(floor((${lnDetSeriesSql("tx")}) * 1048576.0) AS BIGINT) AS xq,
        |         CAST(floor((${lnDetSeriesSql("ty")}) * 1048576.0) AS BIGINT) AS yq
        |  FROM tq),
        |fit AS (
        |  SELECT round(
        |    CAST(count(*) * CAST(sum(xq * yq) AS BIGINT)
        |         - CAST(sum(xq) AS BIGINT) * CAST(sum(yq) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) * CAST(sum(xq * xq) AS BIGINT)
        |         - CAST(sum(xq) AS BIGINT) * CAST(sum(xq) AS BIGINT) AS DOUBLE),
        |    6) AS heaps_beta
        |  FROM q)
        |SELECT ck, n_tokens, vocab,
        |  (SELECT heaps_beta FROM fit) AS heaps_beta
        |FROM curve ORDER BY ck""".stripMargin,

    // first-occurrence novelty per document; docs with <2 tokens have no
    // bigrams and drop out on both engines
    "q_ngram_novelty" ->
      """WITH occ AS (
        |  SELECT doc_id, t[i.g] || ' ' || t[i.g + 1] AS term
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t
        |        FROM documents) d,
        |       LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS g) i
        |  WHERE len(t) >= 2),
        |fd AS (SELECT term, min(doc_id) AS fd FROM occ GROUP BY term)
        |SELECT o.doc_id,
        |  count(*) AS n_bigrams,
        |  CAST(sum(CASE WHEN f.fd = o.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  CAST(CAST(sum(CASE WHEN f.fd = o.doc_id THEN 1 ELSE 0 END)
        |            AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS novelty
        |FROM occ o JOIN fd f ON o.term = f.term
        |GROUP BY o.doc_id ORDER BY o.doc_id""".stripMargin,

    // exact-integer Church-Gale variance-to-mean: absent docs contribute
    // 0 to both sums, so the present-rows aggregate is the corpus sum
    "q_burstiness" ->
      """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |occ AS (
        |  SELECT doc_id, t[i.g] || ' ' || t[i.g + 1] AS term
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t
        |        FROM documents) d,
        |       LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS g) i
        |  WHERE len(t) >= 2),
        |perdoc AS (SELECT term, doc_id, count(*) AS x
        |           FROM occ GROUP BY term, doc_id),
        |agg AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM perdoc GROUP BY term)
        |SELECT term, df, sx, sxx,
        |  (SELECT n FROM nd) * sxx - sx * sx AS vmr_num,
        |  (SELECT n FROM nd) * sx AS vmr_den,
        |  CAST((SELECT n FROM nd) * sxx - sx * sx AS DOUBLE)
        |    / CAST((SELECT n FROM nd) * sx AS DOUBLE) AS vmr
        |FROM agg WHERE sx >= 20
        |ORDER BY vmr DESC, term LIMIT 25""".stripMargin,

    "q_term_freq" ->
      """SELECT term, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |WHERE length(term) > 0
        |GROUP BY term ORDER BY n DESC, term LIMIT 30""".stripMargin,

    "q_quality_score" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS tokens FROM documents)
        |SELECT doc_id,
        |  round(len(list_filter(tokens, x -> x IN ('the', 'a', 'of', 'and', 'to'))) * 1.0
        |        / len(tokens), 6) AS stopword_ratio,
        |  round((n_chars - (len(tokens) - 1)) * 1.0 / len(tokens), 6) AS mean_word_len,
        |  round(len(regexp_extract_all(array_to_string(tokens, ' '), '[^a-zA-Z0-9\s]')) * 1.0 / n_chars, 6) AS punct_ratio,
        |  CASE WHEN len(tokens) < 20 THEN 'short'
        |       WHEN len(tokens) <= 60 THEN 'medium'
        |       ELSE 'long' END AS len_band
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_containment_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS shingles
        |  FROM documents
        |), ex AS (
        |  SELECT doc_id, lang, source, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n_sh AS n1, b.n_sh AS n2,
        |         count(*) AS inter
        |  FROM ex a JOIN ex b
        |    ON a.lang = b.lang AND a.source = b.source AND a.sh = b.sh
        |   AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4
        |)
        |SELECT id1, id2, inter,
        |       round(inter * 1.0 / least(n1, n2), 6) AS containment
        |FROM pairs WHERE round(inter * 1.0 / least(n1, n2), 6) >= 0.3
        |ORDER BY id1, id2""".stripMargin,
    // naive all-token join — the DEFINITION the prefix-filtered plan must
    // reproduce exactly (global: no lang/source blocking)
    "q_jaccard_prefix" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 3),
        |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |        || ' ' || string_split(text, ' ')[i+2] || ' ' || string_split(text, ' ')[i+3]
        |        || ' ' || string_split(text, ' ')[i+4])) AS shingles
        |  FROM documents
        |), ex AS (
        |  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n_sh AS n1, b.n_sh AS n2,
        |         count(*) AS inter
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4
        |)
        |SELECT id1, id2, inter,
        |       round(inter * 1.0 / (n1 + n2 - inter), 6) AS jaccard
        |FROM pairs WHERE round(inter * 1.0 / (n1 + n2 - inter), 6) >= 0.25
        |ORDER BY id1, id2""".stripMargin,

    "q_jaccard_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id, lang, source,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' '))),
        |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS shingles
        |  FROM documents
        |), ex AS (
        |  SELECT doc_id, lang, source, len(shingles) AS n_sh, unnest(shingles) AS sh FROM sh
        |), pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n_sh AS n1, b.n_sh AS n2,
        |         count(*) AS inter
        |  FROM ex a JOIN ex b
        |    ON a.lang = b.lang AND a.source = b.source AND a.sh = b.sh
        |   AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4
        |)
        |SELECT id1, id2, inter,
        |       round(inter * 1.0 / (n1 + n2 - inter), 6) AS jaccard
        |FROM pairs WHERE round(inter * 1.0 / (n1 + n2 - inter), 6) >= 0.25
        |ORDER BY id1, id2""".stripMargin,
    "q_token_count_bpe" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_gopher_rules" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(tokens) AS n_tokens,
        |    len(list_filter(tokens, t -> regexp_matches(t, '[a-zA-Z]'))) AS n_alpha,
        |    len(regexp_extract_all(text, '[#<>|~^]')) AS n_sym,
        |    list_contains(tokens, 'the')::INT + list_contains(tokens, 'a')::INT
        |      + list_contains(tokens, 'of')::INT + list_contains(tokens, 'and')::INT
        |      + list_contains(tokens, 'to')::INT AS n_stop,
        |    n_chars - (len(tokens) - 1) AS wchars
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tokens, n_chars, text
        |        FROM documents)
        |)
        |SELECT doc_id,
        |  n_tokens BETWEEN 15 AND 500 AS wc_ok,
        |  (3*n_tokens <= wchars AND wchars <= 10*n_tokens) AS mwl_ok,
        |  5*n_alpha >= 4*n_tokens AS alpha_ok,
        |  n_stop >= 2 AS stop_ok,
        |  10*n_sym <= n_tokens AS sym_ok,
        |  (n_tokens BETWEEN 15 AND 500)
        |    AND (3*n_tokens <= wchars AND wchars <= 10*n_tokens)
        |    AND 5*n_alpha >= 4*n_tokens AND n_stop >= 2
        |    AND 10*n_sym <= n_tokens AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_dsir_importance" ->
      s"""$dsirLrCtesSql
        |SELECT x.doc_id, min(x.lang) AS lang,
        |  CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(l.lrq) AS BIGINT) AS log_w_q,
        |  CAST(sum(l.lrq) AS BIGINT)::DOUBLE / 1073741824 AS log_importance
        |FROM feat x JOIN lr l USING (f)
        |GROUP BY x.doc_id ORDER BY x.doc_id""".stripMargin,

    "q_dsir_select" ->
      s"""$dsirLrCtesSql
        |, scores AS (
        |  SELECT x.doc_id, min(x.lang) AS lang,
        |    CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(l.lrq) AS BIGINT) AS log_w_q
        |  FROM feat x JOIN lr l USING (f) GROUP BY x.doc_id
        |), filled AS (
        |  SELECT lang, doc_id, n_words, log_w_q,
        |    CAST(sum(n_words) OVER (PARTITION BY lang
        |      ORDER BY log_w_q DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM scores
        |)
        |SELECT lang, doc_id, n_words, log_w_q, cum_tokens
        |FROM filled WHERE cum_tokens <= 2000
        |ORDER BY lang, cum_tokens""".stripMargin,

    "q_oov_rate" ->
      """WITH ws AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
        |), vocab AS (
        |  SELECT w FROM (SELECT w, count(*) AS n FROM ws GROUP BY w
        |                 ORDER BY n DESC, w LIMIT 20)
        |)
        |SELECT ws.lang, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
        |    / count(*) AS oov_rate
        |FROM ws LEFT JOIN vocab v ON ws.w = v.w
        |GROUP BY ws.lang ORDER BY ws.lang""".stripMargin,

    "q_token_fertility" ->
      """WITH d AS (
        |  SELECT lang, len(string_split(text, ' ')) AS ws,
        |    len(regexp_extract_all(text, '[a-zA-Z]{1,6}|[0-9]+|[^a-zA-Z0-9\s]')) AS bpe,
        |    n_chars
        |  FROM documents
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ws) AS BIGINT) AS n_words,
        |  CAST(sum(bpe) AS BIGINT) AS n_tokens,
        |  CAST(sum(bpe) AS BIGINT)::DOUBLE / CAST(sum(ws) AS BIGINT) AS fertility,
        |  CAST(sum(n_chars) AS BIGINT)::DOUBLE / CAST(sum(bpe) AS BIGINT) AS chars_per_token
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail.example.com or +1 555-867-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.0.' ||
        |    CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |    CAST((doc_id * 7) % 256 AS VARCHAR) AS content
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(content,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(content,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(content,
        |    '\b\d{3}-\d{3}-\d{4}\b')) AS INTEGER) AS n_phones
        |FROM p ORDER BY doc_id""".stripMargin,

    "q_doc_chunks" -> docChunksOracle,
    // q_chunk_gen returns the IDENTICAL relation through the native
    // ChunkRows generator — one oracle text proves explode ≡ generator
    "q_chunk_gen" -> docChunksOracle,

    "q_edit_distance_pairs" ->
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_dist,
        |  round(levenshtein(a.text, b.text) * 1.0
        |        / greatest(a.n_chars, b.n_chars), 6) AS rel_dist
        |FROM documents a JOIN documents b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        | AND abs(a.n_chars - b.n_chars) <= 30
        |WHERE levenshtein(a.text, b.text) * 1.0
        |      / greatest(a.n_chars, b.n_chars) <= 0.3
        |ORDER BY id1, id2""".stripMargin,

    "q_repetition_ratio" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(tok)),
        |         i -> tok[i] || ' ' || tok[i+1])) AS bg FROM t),
        |c AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(sum(n) AS BIGINT) AS n_bigrams,
        |  CAST(max(n) AS BIGINT) AS top_bigram_n,
        |  round(max(n) * 1.0 / sum(n), 6) AS top_bigram_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_kn_bigram" ->
      s"""WITH t AS (
         |  SELECT string_split(text, ' ') AS t FROM documents
         |  WHERE len(string_split(text, ' ')) >= 2),
         |big AS (
         |  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
         |  FROM t, UNNEST(range(1, len(t))) AS u(i)),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
         |ctx AS (
         |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1plus
         |  FROM c12 GROUP BY w1),
         |cont AS (SELECT w2, count(*) AS ncont FROM c12 GROUP BY w2),
         |types AS (SELECT count(*) AS ntypes FROM c12)
         |SELECT c12.w1, c12.w2, c12.c12, ctx.c1, cont.ncont,
         |  round((c12.c12 - $KnD) / ctx.c1
         |    + $KnD * ctx.n1plus / ctx.c1
         |      * (CAST(cont.ncont AS DOUBLE) / types.ntypes), 6) AS p_kn
         |FROM c12 JOIN ctx USING (w1) JOIN cont USING (w2)
         |     CROSS JOIN types
         |ORDER BY p_kn DESC, w1, w2 LIMIT 30""".stripMargin,

    "q_bpe_encode" -> {
      val expr = BpeMerges.foldLeft(
        "' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '") {
        case (e, (p, r)) => bpeStepSql(e, p, r)
      }
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |enc AS (
         |  SELECT trim($expr) AS enc FROM tok WHERE length(w) > 0),
         |sub AS (SELECT unnest(string_split(enc, ' ')) AS token FROM enc)
         |SELECT token, count(*) AS n_occ FROM sub GROUP BY token
         |ORDER BY n_occ DESC, token LIMIT 30""".stripMargin
    },

    // WordPiece greedy max-match re-derived definitionally: the same
    // corpus-derived vocab (chars ∪ df≥5 substrings of length 2-4), the
    // same per-position longest-match table, and a recursive-CTE walk
    "q_wordpiece_encode" ->
      """WITH RECURSIVE words AS (
        |  SELECT w, count(*) AS wc FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0 GROUP BY w),
        |chars AS (
        |  SELECT DISTINCT substr(w, CAST(i AS INT), 1) AS piece
        |  FROM words, UNNEST(range(1, length(w) + 1)) AS t(i)),
        |subs AS (
        |  SELECT piece FROM (
        |    SELECT DISTINCT w, substr(w, CAST(i AS INT), CAST(l AS INT)) AS piece
        |    FROM words,
        |         UNNEST(range(1, length(w) + 1)) AS t(i),
        |         UNNEST([2, 3, 4]) AS u(l)
        |    WHERE i + l - 1 <= length(w))
        |  GROUP BY piece HAVING count(*) >= 5),
        |vocab AS (SELECT piece FROM chars UNION SELECT piece FROM subs),
        |best AS (
        |  SELECT w, pos, piece, len FROM (
        |    SELECT wo.w, CAST(t.pos AS INT) AS pos, v.piece,
        |      length(v.piece) AS len,
        |      row_number() OVER (PARTITION BY wo.w, t.pos
        |        ORDER BY length(v.piece) DESC) AS rn
        |    FROM words wo,
        |         UNNEST(range(0, length(wo.w))) AS t(pos),
        |         vocab v
        |    WHERE substr(wo.w, CAST(t.pos AS INT) + 1, length(v.piece)) = v.piece
        |      AND t.pos + length(v.piece) <= length(wo.w))
        |  WHERE rn = 1),
        |walk AS (
        |  SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS n_pieces, '' AS pieces
        |  FROM words
        |  UNION ALL
        |  SELECT wk.w, wk.pos + b.len, wk.n_pieces + 1,
        |    CASE WHEN wk.pieces = '' THEN b.piece
        |         ELSE wk.pieces || ' ' || b.piece END
        |  FROM walk wk JOIN best b ON b.w = wk.w AND b.pos = wk.pos
        |  WHERE wk.pos < length(wk.w))
        |SELECT wo.w AS word, wo.wc AS n_occ, wk.n_pieces, wk.pieces
        |FROM walk wk JOIN words wo ON wo.w = wk.w
        |WHERE wk.pos = length(wk.w)
        |ORDER BY word""".stripMargin,

    "q_tfidf_retrieval" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |        WHERE length(term) > 0 GROUP BY 1, 2),
        |dfc AS (SELECT term AS dterm, count(*) AS df FROM tfc GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |w AS (
        |  SELECT doc_id, term, tf * ln((n_docs + 1.0) / (df + 1.0)) AS w
        |  FROM tfc JOIN dfc ON tfc.term = dfc.dterm CROSS JOIN n
        |  WHERE df < n_docs),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM w GROUP BY 1),
        |dots AS (
        |  SELECT q.doc_id AS query_id, c.doc_id AS cand_id, sum(q.w * c.w) AS dot
        |  FROM w q JOIN w c ON q.term = c.term
        |    AND q.doc_id < 10 AND q.doc_id <> c.doc_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT query_id, cand_id,
        |    round(dot / (x.nm * y.nm), 6) AS cos
        |  FROM dots JOIN nrm x ON query_id = x.doc_id
        |            JOIN nrm y ON cand_id = y.doc_id),
        |ranked AS (
        |  SELECT query_id, cand_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, cand_id) AS INTEGER) AS rk
        |  FROM scored)
        |SELECT query_id, rk, cand_id, cos FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin,

    "q_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |        WHERE length(term) > 0 GROUP BY 1, 2),
        |dfc AS (SELECT term AS dterm, count(*) AS df FROM tfc GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf,
        |    round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf * ln((n_docs + 1.0) / (df + 1.0)) DESC, term) AS rk
        |  FROM tfc JOIN dfc ON tfc.term = dfc.dterm CROSS JOIN n)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf
        |FROM scored WHERE rk <= 3 ORDER BY doc_id, tfidf DESC, term""".stripMargin,
    "q_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CASE WHEN lang = 'en' THEN doc_id % 2 = 0
        |           ELSE doc_id % 5 = 0 END
        |ORDER BY doc_id""".stripMargin,

    "q_source_mix" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |         AS INTEGER) AS srn
        |  FROM documents)
        |SELECT CAST(row_number() OVER (ORDER BY srn, source, doc_id)
        |            AS BIGINT) AS global_pos,
        |       doc_id, source, srn
        |FROM r ORDER BY global_pos""".stripMargin,

    "q_fuzzy_match" ->
      """SELECT a.s_suppkey AS k1, b.s_suppkey AS k2,
        |  round(jaro_winkler_similarity(a.s_name, b.s_name), 6) AS jw_sim,
        |  CAST(damerau_levenshtein(a.s_name, b.s_name) AS INTEGER) AS dl_dist,
        |  CAST(hamming(a.s_name, b.s_name) AS INTEGER) AS ham_dist
        |FROM supplier a JOIN supplier b
        |  ON floor(a.s_suppkey / 50) = floor(b.s_suppkey / 50)
        | AND a.s_suppkey < b.s_suppkey
        |ORDER BY k1, k2""".stripMargin,

    "q_dup_chunks" ->
      """WITH e AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, CAST(ceil(length(text)/120.0) AS BIGINT))) AS ci
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         md5(substring(text, CAST(ci*120+1 AS INTEGER), 120)) AS chunk_hash
        |  FROM e)
        |SELECT chunk_hash,
        |       count(DISTINCT doc_id) AS n_docs,
        |       count(*) AS n_occ,
        |       min(doc_id) AS first_doc
        |FROM c
        |GROUP BY chunk_hash
        |HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY chunk_hash""".stripMargin,

    "q_topk_agg" ->
      """WITH r AS (
        |  SELECT lang, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY n_chars DESC, doc_id) AS rnk
        |  FROM documents)
        |SELECT lang, CAST(rnk AS INTEGER) AS rnk, doc_id,
        |       CAST(n_chars AS INTEGER) AS n_chars
        |FROM r WHERE rnk <= 3
        |ORDER BY lang, rnk""".stripMargin,

    "q_cdc_chunks" -> cdcChunksOracle,

    "q_snm_pairs" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |         row_number() OVER (ORDER BY n_chars, doc_id) AS rn
        |  FROM documents)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |       CAST(b.rn - a.rn AS INTEGER) AS rank_gap,
        |       CAST(b.n_chars - a.n_chars AS INTEGER) AS len_diff
        |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 5
        |ORDER BY id1, id2""".stripMargin,
    // q_minhash_candidates / q_simhash_pairs: no oracle (xxhash64 has no
    // DuckDB equivalent; recall/superset properties pinned in
    // TextVectorSpec instead). Driver records rows-only for those two —
    // but each pipeline ALSO has a fully-oracled deterministic twin in
    // ops/AffineSketch.scala (q_minhash_affine / q_simhash_affine /
    // q_winnow_affine) whose signatures, buckets, and candidate pairs
    // hash-match generated DuckDB SQL.
  )
}
