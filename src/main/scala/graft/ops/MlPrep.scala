package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML-prep operators a large-scale training pipeline runs between raw text
  * and the trainer: exact long-substring duplication (the char-level dedup
  * signal of Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better"), Fellegi–Sunter probabilistic record linkage over
  * blocked candidate pairs, Unicode canonicalization (via the native
  * [[graft.functions.NfcNormalize]] / [[graft.functions.StripAccents]]
  * expressions), and two supervised-feature-engineering classics —
  * WOE/IV predictive-power binning and K-fold leakage-safe target
  * encoding. Reference behavior: the MLE goals of
  * /root/reference/README.md:47-52 (dedup/feature prep before prediction).
  *
  * Every query here is fully DuckDB-oracle-checkable: hashes are md5
  * (bit-identical across engines), money sums go through exact
  * decimal(18,2) accumulation before any double division (the
  * [[Relational.decimalExact]] convention), and log-ratio statistics are
  * ratios of exact integer counts rounded at 6 dp (the
  * [[TextOps]] KL/perplexity convention).
  */
object MlPrep {

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")
  private def customer(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "customer")
  private def orders(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "orders")
  private def lineitem(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "lineitem")
  private def part(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "part")

  // ---------------------------------------------------------------- dedup

  /** Char-gram window length / sampling stride for substring dedup. Lee et
    * al. use 50-token windows; on the fixture's ~300-char docs a 40-char
    * window at stride 10 gives the same coverage shape (every duplicated
    * run ≥ 49 chars is guaranteed to align at least one sampled window on
    * both sides). */
  private val GramLen = 40
  private val Stride = 10

  /** Exact duplicated-substring detection, Lee et al. 2022 style: sample
    * fixed-length char windows at a stride, hash each, group by hash —
    * any hash seen in ≥ 2 documents marks verbatim cross-document
    * duplication (the signal used to cut long memorized runs from
    * training corpora). 100 TB shape: one narrow generate-project per doc
    * (windows/doc ≈ len/stride, no pair join anywhere), then a single
    * map-side-combined group-by on the 16-hex-char hash; the stride is
    * the knob that trades recall floor (detects runs ≥ GramLen+Stride−1)
    * against shuffle volume. */
  def substringDedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).where(length(col("text")) >= GramLen)
    d.select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (GramLen - 1),
          lit(Stride))).as("p"))
      .select(col("doc_id"), expr(s"substring(text, p, $GramLen)").as("gram"))
      .groupBy(substring(md5(col("gram")), 1, 16).as("gram_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_occ"))
      .where(col("n_docs") >= 2)
      .orderBy("gram_md5")
  }

  // ------------------------------------------------------- record linkage

  /** Fellegi–Sunter agreement weights (scaled-integer log-odds, committed
    * so both engines sum exactly): (agree, disagree) per field. */
  private val WSeg = (24, -4)   // same market segment
  private val WBal = (33, -12)  // account balance within 100.00
  private val WNam = (10, -3)   // same trailing name digit
  private val WKbal = (15, -5)  // same 1000-unit balance band

  /** Blocked candidate pairs with the Fellegi–Sunter composite score.
    * Blocking key = nation (the classic linkage block): candidate
    * generation is an equi self-join on the block key — never all-pairs —
    * and the score is a sum of per-field agreement log-odds. Integer
    * weights keep the sum exact in both engines. At 100 TB the only
    * change is a finer block key (e.g. nation × balance band); the plan
    * shape (shuffle both sides on the block key, score inside the join
    * projection) is already the scalable one. */
  private def fsPairs(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir)
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal", "c_name")
    def w(p: (Int, Int), agree: org.apache.spark.sql.Column) =
      when(agree, lit(p._1)).otherwise(lit(p._2))
    c.alias("a").join(c.alias("b"),
        col("a.c_nationkey") === col("b.c_nationkey") &&
          col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("id_a"), col("b.c_custkey").as("id_b"),
        (w(WSeg, col("a.c_mktsegment") === col("b.c_mktsegment")) +
          w(WBal, abs(col("a.c_acctbal") - col("b.c_acctbal")) < 100.0) +
          w(WNam, substring(col("a.c_name"), 18, 1) ===
            substring(col("b.c_name"), 18, 1)) +
          w(WKbal, floor(col("a.c_acctbal") / 1000.0) ===
            floor(col("b.c_acctbal") / 1000.0))).as("score"))
  }

  /** Linked pairs above the match threshold (score ≥ 60 ⇒ at least the
    * balance-proximity field plus two others agree). */
  def recordLinkage(s: SparkSession, dir: String): DataFrame =
    fsPairs(s, dir).where(col("score") >= 60).orderBy("id_a", "id_b")

  /** Score histogram over all blocked pairs — the distribution a linkage
    * practitioner reads to place the match/non-match thresholds. */
  def linkageHist(s: SparkSession, dir: String): DataFrame =
    fsPairs(s, dir).groupBy("score").agg(count(lit(1)).as("n_pairs"))
      .orderBy("score")

  // ------------------------------------------------------- normalization

  /** Unicode canonicalization round-trip through the native expressions:
    * accent the fixture text with precomposed Latin (replace chains both
    * engines run identically), strip accents back; separately build the
    * DECOMPOSED form (base char + combining acute U+0301) and NFC-compose
    * it. Emitting md5 prefixes of the normalized strings hash-compares
    * java.text.Normalizer output against DuckDB's utf8proc per document —
    * a flag-free oracle on the strings themselves. */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val acc = replace(replace(replace(col("text"),
      lit("a"), lit("\u00e1")), lit("e"), lit("\u00e8")), lit("o"), lit("\u00f6"))
    val dec = replace(col("text"), lit("a"), lit("a\u0301"))
    docs(s, dir).select(col("doc_id"),
      substring(md5(call_function("graft_strip_accents", acc)), 1, 16)
        .as("strip_md5"),
      substring(md5(call_function("graft_nfc", dec)), 1, 16).as("nfc_md5"),
      length(call_function("graft_nfc", dec)).as("n_nfc"))
      .orderBy("doc_id")
  }

  // ------------------------------------------- supervised feature prep

  /** Weight-of-evidence / information-value binning: per feature bin
    * (part brand), WOE = ln((good_i/good_tot)/(bad_i/bad_tot)) with
    * target = line item returned; IV = Σ (good%−bad%)·WOE. The standard
    * screen for feature predictive power before model training. Plan:
    * broadcast the part dimension into the fact scan, one grouped pass,
    * totals via a 1-row cross join; all ratios are exact-integer-count
    * ratios so 6-dp rounding is stable. */
  def woeIv(s: SparkSession, dir: String): DataFrame = {
    val base = lineitem(s, dir)
      .join(broadcast(part(s, dir)), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("bin"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("bad"))
    val byBin = base.groupBy("bin").agg(
      sum(col("bad")).cast("double").as("bad_i"),
      sum(lit(1) - col("bad")).cast("double").as("good_i"),
      count(lit(1)).as("n"))
    val tot = base.agg(
      sum(col("bad")).cast("double").as("bad_tot"),
      sum(lit(1) - col("bad")).cast("double").as("good_tot"))
    val woe = log((col("good_i") / col("good_tot")) /
      (col("bad_i") / col("bad_tot")))
    val ivTerm = (col("good_i") / col("good_tot") -
      col("bad_i") / col("bad_tot")) * woe
    byBin.crossJoin(tot)
      .select(col("bin"), col("n"),
        col("bad_i").cast("long").as("n_bad"),
        round(woe, 6).as("woe"), round(ivTerm, 6).as("iv_term"),
        round(sum(ivTerm).over(
          Window.partitionBy(lit(1))), 6).as("iv_total"))
      .orderBy("bin")
  }

  /** K-fold leakage-safe mean target encoding: each row's fold is a
    * deterministic md5 hash of its key; the encoding for (category, fold)
    * is the target mean over the OTHER folds —
    * (Σ_cat − Σ_{cat,fold}) / (n_cat − n_{cat,fold}) — so no row's own
    * target leaks into its feature. Sums accumulate in exact
    * decimal(18,2) (money-sum convention) and only the final mean is a
    * double. Plan: two grouped passes over one scan + a broadcast join of
    * the category totals (|categories| rows). */
  def targetEncoding(s: SparkSession, dir: String): DataFrame = {
    val base = orders(s, dir).select(
      col("o_orderpriority").as("cat"),
      (conv(substring(md5(col("o_orderkey").cast("string")), 1, 7), 16, 10)
        .cast("long") % 5).cast("int").as("fold"),
      col("o_totalprice").cast("decimal(18,2)").as("y"))
    val perCat = base.groupBy("cat").agg(
      sum(col("y")).cast("decimal(28,2)").as("s_cat"),
      count(lit(1)).as("n_cat"))
    val perFold = base.groupBy("cat", "fold").agg(
      sum(col("y")).cast("decimal(28,2)").as("s_f"),
      count(lit(1)).as("n_f"))
    perFold.join(broadcast(perCat), "cat")
      .select(col("cat"), col("fold"), col("n_f").as("n_rows"),
        round((col("s_cat") - col("s_f")).cast("double") /
          (col("n_cat") - col("n_f")), 6).as("enc"))
      .orderBy("cat", "fold")
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_substring_dedup" -> (substringDedup _),
    "q_record_linkage" -> (recordLinkage _),
    "q_linkage_hist" -> (linkageHist _),
    "q_text_normalize" -> (textNormalize _),
    "q_woe_iv" -> (woeIv _),
    "q_target_encoding" -> (targetEncoding _))

  val oracleSql: Map[String, String] = Map(
    "q_substring_dedup" ->
      s"""WITH w AS (
         |  SELECT doc_id, substr(text, CAST(p AS INT), $GramLen) AS gram
         |  FROM documents,
         |       UNNEST(range(1, len(text) - ${GramLen - 2}, $Stride)) AS t(p)
         |  WHERE len(text) >= $GramLen)
         |SELECT substr(md5(gram), 1, 16) AS gram_md5,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  count(*) AS n_occ
         |FROM w GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY gram_md5""".stripMargin,

    "q_record_linkage" ->
      s"""${linkagePairsSql}
         |SELECT id_a, id_b, score FROM pairs WHERE score >= 60
         |ORDER BY id_a, id_b""".stripMargin,

    "q_linkage_hist" ->
      s"""${linkagePairsSql}
         |SELECT score, count(*) AS n_pairs FROM pairs GROUP BY score
         |ORDER BY score""".stripMargin,

    "q_text_normalize" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    replace(replace(replace(text, 'a', '\u00e1'), 'e', '\u00e8'),
        |            'o', '\u00f6') AS acc,
        |    replace(text, 'a', 'a' || chr(769)) AS dec
        |  FROM documents)
        |SELECT doc_id,
        |  substr(md5(strip_accents(acc)), 1, 16) AS strip_md5,
        |  substr(md5(nfc_normalize(dec)), 1, 16) AS nfc_md5,
        |  CAST(length(nfc_normalize(dec)) AS INTEGER) AS n_nfc
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_woe_iv" ->
      """WITH base AS (
        |  SELECT p.p_brand AS bin,
        |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |tot AS (
        |  SELECT CAST(sum(bad) AS DOUBLE) AS bad_tot,
        |    CAST(sum(1 - bad) AS DOUBLE) AS good_tot FROM base),
        |byb AS (
        |  SELECT bin, CAST(sum(bad) AS DOUBLE) AS bad_i,
        |    CAST(sum(1 - bad) AS DOUBLE) AS good_i, count(*) AS n
        |  FROM base GROUP BY bin)
        |SELECT bin, n, CAST(bad_i AS BIGINT) AS n_bad,
        |  round(ln((good_i / good_tot) / (bad_i / bad_tot)), 6) AS woe,
        |  round((good_i / good_tot - bad_i / bad_tot)
        |    * ln((good_i / good_tot) / (bad_i / bad_tot)), 6) AS iv_term,
        |  round(sum((good_i / good_tot - bad_i / bad_tot)
        |    * ln((good_i / good_tot) / (bad_i / bad_tot))) OVER (), 6)
        |    AS iv_total
        |FROM byb, tot ORDER BY bin""".stripMargin,

    "q_target_encoding" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS cat,
        |    CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7))::BIGINT
        |      % 5 AS INT) AS fold,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS y
        |  FROM orders),
        |per_cat AS (
        |  SELECT cat, CAST(sum(y) AS DECIMAL(28,2)) AS s_cat,
        |    count(*) AS n_cat
        |  FROM base GROUP BY cat),
        |per_fold AS (
        |  SELECT cat, fold, CAST(sum(y) AS DECIMAL(28,2)) AS s_f,
        |    count(*) AS n_f
        |  FROM base GROUP BY cat, fold)
        |SELECT cat, fold, n_f AS n_rows,
        |  round(CAST(s_cat - s_f AS DOUBLE) / (n_cat - n_f), 6) AS enc
        |FROM per_fold JOIN per_cat USING (cat) ORDER BY cat, fold""".stripMargin)

  /** Shared oracle CTE: the blocked Fellegi–Sunter pair scoring, weights
    * interpolated from the same committed constants the Spark side uses. */
  private lazy val linkagePairsSql: String =
    s"""WITH pairs AS (
       |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       |    (CASE WHEN a.c_mktsegment = b.c_mktsegment
       |          THEN ${WSeg._1} ELSE ${WSeg._2} END
       |     + CASE WHEN abs(a.c_acctbal - b.c_acctbal) < 100.0
       |            THEN ${WBal._1} ELSE ${WBal._2} END
       |     + CASE WHEN substr(a.c_name, 18, 1) = substr(b.c_name, 18, 1)
       |            THEN ${WNam._1} ELSE ${WNam._2} END
       |     + CASE WHEN floor(a.c_acctbal / 1000.0) = floor(b.c_acctbal / 1000.0)
       |            THEN ${WKbal._1} ELSE ${WKbal._2} END) AS score
       |  FROM customer a JOIN customer b
       |    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey)""".stripMargin
}
