package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational-core coverage queries on the TPC-H-ish star schema
  * (SURVEY.md §2.2-2.8): every join type, aggregate variants incl.
  * rollup/cube/pivot, window functions, top-k, set ops, scalar
  * string/date/conditional functions. Each has an exact DuckDB oracle.
  *
  * Scale notes (100 TB): fact-fact joins (lineitem ⋈ orders) shuffle on the
  * join key and are AQE-coalesced; dim joins (nation, region, customer at
  * small SF) are broadcast — Catalyst auto-broadcasts under the threshold,
  * and `broadcast()` hints pin the plan where determinism matters. Filters
  * and projections sit directly on the parquet scan so pushdown/pruning
  * reach the reader (verified via .explain in RelationalSpec).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // ---- aggregation -------------------------------------------------------

  /** TPC-H Q1-style pricing summary: hash agg with partial aggregation,
    * several aggregate kinds at once. Money sums are rounded to 2 dp
    * (absolute magnitudes ~1e8 at sf0.01; double reorder error ~1e-4). */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Global aggregate + exact distinct aggregate (Expand + 2-phase). */
  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      count(lit(1)).as("n_rows"))

  /** ROLLUP multi-level totals; explicit NULLS FIRST ordering on both sides
    * (Spark defaults nulls-first ASC, DuckDB defaults nulls-last). */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE with grouping() markers (no NULL-vs-missing ambiguity). */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_prio"),
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .select(col("g_status"), col("g_prio"),
        col("o_orderstatus"), col("o_orderpriority"), col("n"), col("sum_price"))
      .orderBy(col("g_status"), col("g_prio"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Pivot: order count per status × priority (explicit value list so the
    * output schema is static; oracle uses FILTER aggregates). */
  def pivotAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderstatus"))

  // ---- joins -------------------------------------------------------------

  /** Broadcast star join: customer ⋈ nation ⋈ region, count + balance per
    * region. Both dims pinned broadcast. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
      .orderBy(col("r_name"))

  /** Big-big equi join (sort-merge / AQE shuffled-hash): revenue per order
    * priority through lineitem ⋈ orders. */
  def joinBigBig(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))

  /** Left outer join keeping customers with zero orders. */
  def joinLeftOuter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  /** Left semi = EXISTS: customers having at least one open ('O') order. */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    val open = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
    t(s, dir, "customer")
      .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left anti = NOT EXISTS: customers with no orders at all. */
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Cross join (tiny dims only): region × nation grid. */
  def joinCross(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").select(col("r_name"))
      .crossJoin(t(s, dir, "nation").select(col("n_name")))
      .orderBy(col("r_name"), col("n_name"))

  /** Range/theta join WITH an equi conjunct (so the planner keeps a hash
    * join, not BNLJ — SURVEY §2.3): lineitems shipped within 90 days of
    * their order date. */
  def joinRange(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_shipped_90d"))
      .orderBy(col("o_orderstatus"))

  // ---- windows / sort / top-k -------------------------------------------

  /** Per-group top-k: top 3 orders per customer by price, row_number with
    * full tie-break. */
  def windowTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** rank / dense_rank / ntile / percent_rank over customer balances —
    * via ScaledRank's two-phase range-partitioned ranking, NOT a global
    * `Window.orderBy` (which funnels the whole relation through one task;
    * VERDICT r1 "What's wrong" #3). Result is identical to the window
    * form (oracle-checked); ScaledRankSpec pins the equivalence including
    * tie handling. */
  def windowRanks(s: SparkSession, dir: String): DataFrame =
    ScaledRank.withGlobalRanks(t(s, dir, "customer"),
        orderCols = Seq(col("c_acctbal").desc, col("c_custkey")),
        keyCols = Seq(col("c_acctbal"), col("c_custkey")), ntileN = 4)
      .select(col("c_custkey"), col("c_acctbal"),
        col("rnk").cast("int").as("rnk"),
        col("drnk").cast("int").as("drnk"),
        col("ntile_bucket").cast("int").as("quartile"),
        round(col("pct_rank"), 6).as("pct_rank"))
      .orderBy(col("c_custkey"))

  /** Running sum + lag/lead: cumulative spend and inter-order gap per
    * customer over order time. */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    // o_orderdate is TIMESTAMP_NTZ (parquet isAdjustedToUTC=false);
    // unix_micros requires TIMESTAMP — identity cast under UTC session tz.
    val orderUs = unix_micros(col("o_orderdate").cast("timestamp"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        orderUs.as("order_us"),
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("cum_spend"),
        (orderUs - lag(orderUs, 1).over(w)).as("gap_us"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Analytic-function coverage beyond ranking: cume_dist, nth_value, and
    * first/last_value with an explicit ROWS frame, per customer over order
    * time. The ordering includes o_orderkey as a unique tie-break so
    * RANGE≡ROWS and the result is deterministic on both engines; frames
    * are stated explicitly (ROWS UNBOUNDED PRECEDING..CURRENT ROW) because
    * nth_value's ANSI default frame is what both Spark and DuckDB use —
    * stating it guards against dialect drift. Partitioned window: shuffles
    * once on o_custkey, no global single-partition sort. */
  def windowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(cume_dist().over(w), 6).as("cd"),
        round(nth_value(col("o_totalprice"), 2).over(frame), 2).as("second_price"),
        round(first(col("o_totalprice")).over(frame), 2).as("first_price"),
        round(last(col("o_totalprice")).over(frame), 2).as("latest_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** FULL OUTER join as the merge/upsert shape (closes the one §2.3 join
    * type not yet on the query surface): two per-customer order summaries
    * split at 1998-01-01 are merged — customers present on either side
    * survive, with null-side counts coalesced to 0 and the latest order
    * taken from whichever side has it. At scale this is the standard
    * snapshot-merge: both sides shuffle on the key once (sort-merge full
    * outer), no broadcast (both sides are corpus-sized in a real merge). */
  def joinFullMerge(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val cut = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val early = o.filter(col("o_orderdate") < cut)
      .groupBy(col("o_custkey").as("ck_e"))
      .agg(count(lit(1)).as("n_early"), max(col("o_orderdate")).as("last_early"))
    val late = o.filter(col("o_orderdate") >= cut)
      .groupBy(col("o_custkey").as("ck_l"))
      .agg(count(lit(1)).as("n_late"), max(col("o_orderdate")).as("last_late"))
    early.join(late, col("ck_e") === col("ck_l"), "full")
      .select(coalesce(col("ck_e"), col("ck_l")).as("custkey"),
        coalesce(col("n_early"), lit(0L)).as("n_early"),
        coalesce(col("n_late"), lit(0L)).as("n_late"),
        unix_micros(coalesce(col("last_late"), col("last_early"))
          .cast("timestamp")).as("last_order_us"))
      .orderBy(col("custkey"))
  }

  /** Global top-k without full sort (TakeOrderedAndProject). */
  def topkOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  // ---- set operations ----------------------------------------------------

  /** UNION distinct vs INTERSECT vs EXCEPT, one query: classify customers
    * by having open/finished orders. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val open = orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    val fin = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    val both = open.intersect(fin).withColumn("bucket", lit("both"))
    // except is already set-semantics — no .distinct first (wasted shuffle)
    val onlyOpen = open.except(fin).withColumn("bucket", lit("open_only"))
    val onlyFin = fin.except(open).withColumn("bucket", lit("fin_only"))
    both.unionByName(onlyOpen).unionByName(onlyFin)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Bag-semantics set ops (SURVEY §2.7's other half): INTERSECT ALL /
    * EXCEPT ALL keep multiplicities — per-customer order-status
    * multiplicity overlap. Both compile to aggregate+join plans (no
    * row-by-row anti semantics), so they scale like any keyed agg. */
  def setOpsAll(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val open = orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    val fin = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    val ia = open.intersectAll(fin).withColumn("bucket", lit("intersect_all"))
    val ea = open.exceptAll(fin).withColumn("bucket", lit("except_all"))
    ia.unionByName(ea)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("custkey")).as("n_custkeys"))
      .orderBy(col("bucket"))
  }

  // ---- scalar functions --------------------------------------------------

  /** String functions: split/substring/regexp/lower/length/concat on part. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        size(split(col("p_name"), " ")).as("name_words"))
      .filter(col("p_name").rlike("^[a-z]"))
      .orderBy(col("p_partkey"))

  /** Date/time functions: year/month bucketing of orders. */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("yr"), col("mo"))

  /** Conditional logic: CASE/COALESCE/NULLIF bucketing of order values. */
  def caseWhen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        when(col("o_totalprice") >= 200000, "large")
          .when(col("o_totalprice") >= 100000, "medium")
          .otherwise("small").as("size_bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("NOT_P")).as("status_np"))
      .groupBy(col("size_bucket"), col("status_np"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("size_bucket"), col("status_np"))

  /** SQL-string API surface (the reference allows "Spark SQL" outright,
    * R:26): GROUPING SETS over a temp view — multi-level totals in one
    * pass, same Expand-based plan as rollup/cube. */
  def sqlGroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** Spark 4 SQL PIPE syntax (`|>`, SPARK-49555 — the linear query-flow
    * surface): filter → EXTEND a derived column → AGGREGATE with GROUP
    * BY → post-aggregation WHERE (pipe HAVING) → ORDER BY, all as pipe
    * stages. Pipe operators desugar to the SAME logical plan as the
    * classic nesting (one hash aggregate after a scan-level filter), so
    * this pins the parser surface, not new execution; the DuckDB oracle
    * is the classic-SQL equivalent — proving the desugaring preserves
    * semantics against an engine with no pipe syntax. */
  def sqlPipe(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    s.sql(
      """FROM lineitem_v
        ||> WHERE l_quantity >= 5
        ||> EXTEND l_extendedprice * (1 - l_discount) AS net
        ||> AGGREGATE count(*) AS n, round(sum(net), 2) AS revenue
        |   GROUP BY l_returnflag, l_linestatus
        ||> WHERE n > 100
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Parameterized dynamic SQL — `EXECUTE IMMEDIATE ... USING` (SQL-2016
    * dynamic SQL, in Spark since 4.0): the statement is a VALUE and the
    * parameters bind by position through USING — the injection-safe path
    * for an orchestrator templating one query over thousands of nightly
    * partitions, instead of string-splicing literals. Binding happens at
    * parse time, so the bound plan is indistinguishable from the static
    * one: the date predicate still reaches the parquet scan as a pushed
    * filter and partition-prunes at 100 TB exactly like a literal. */
  def execImmediate(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT o_orderpriority, count(*) AS n,
        |          min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
        |   FROM orders_v
        |   WHERE o_orderdate >= ? AND o_orderstatus = ?
        |   GROUP BY o_orderpriority ORDER BY o_orderpriority'
        |  USING DATE '1995-01-01', 'O'""".stripMargin)
  }

  /** SQL scripting (SQL/PSM control flow, Spark 4's
    * `spark.sql.scripting.enabled`): a BEGIN…END block with DECLAREd
    * variables and a WHILE loop, executed engine-side as ONE script —
    * the migration path for warehouse stored procedures. The script
    * doubles a price threshold until ≤ 100 orders remain above it (an
    * exponential probe — each iteration is a full aggregate the driver
    * would otherwise round-trip); the result is the script's final
    * SELECT. The loop's work stays distributed — only the loop VARIABLES
    * live on the driver, exactly like the engine's own iterative
    * operators ([[graft.ops.Curation.connectedComponents]] et al.).
    * Exactness: thresholds are 1000·2^k — power(2,k) is IEEE-exact for
    * k ≤ 40, so the crossing count is engine-independent. */
  def sqlScript(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    val key = "spark.sql.scripting.enabled"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try s.sql(
      """BEGIN
        |  DECLARE k INT DEFAULT 0;
        |  DECLARE n BIGINT DEFAULT 0;
        |  SET n = (SELECT count(*) FROM orders_v WHERE o_totalprice >= 1000.0);
        |  WHILE n > 100 DO
        |    SET k = k + 1;
        |    SET n = (SELECT count(*) FROM orders_v
        |             WHERE o_totalprice >= 1000.0 * power(2, k));
        |  END WHILE;
        |  SELECT CAST(k AS BIGINT) AS k_doublings,
        |         CAST(1000.0 * power(2, k) AS DOUBLE) AS cutoff,
        |         n AS n_above;
        |END""".stripMargin)
    finally prev match {
      case Some(p) => s.conf.set(key, p)
      case None => s.conf.unset(key)
    }
  }

  /** Templated identifiers — `IDENTIFIER(:name)` (Spark 4): table and
    * column names bind as PARAMETERS instead of string-spliced SQL text,
    * the injection-safe half of dynamic SQL that [[execImmediate]]'s
    * value-binding can't cover (a `?` can never be a table name). The
    * identifier resolves at parse time, so the plan is byte-identical to
    * the static text — same pushdown, same pruning. */
  def sqlIdentifier(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderstatus, count(*) AS n,
        |  min(IDENTIFIER(:keycol)) AS min_key,
        |  max(IDENTIFIER(:keycol)) AS max_key
        |FROM IDENTIFIER(:tbl)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      Map("tbl" -> "orders_v", "keycol" -> "o_orderkey"))
  }

  /** Case-insensitive grouping via Spark 4 collations
    * (`COLLATE UTF8_LCASE`) — the engine-native form of "group ignoring
    * case": the collation rides the TYPE, so every comparison the plan
    * makes (hash partitioning, group equality, the distinct) honors it
    * with no per-row lower() rewrite in user code, and at 100 TB the
    * grouping hash-shuffles exactly like any binary-string key. Case
    * variants are minted deterministically from doc_id (the corpus
    * itself is single-case); output keys are lowered + cast back to
    * binary collation so the hash compares byte-stable strings. ASCII
    * corpus ⇒ UTF8_LCASE grouping ≡ the oracle's lower() grouping
    * (EdgeCaseSpec pins the equality/ordering semantics directly). */
  def collationGroups(s: SparkSession, dir: String): DataFrame = {
    val terms = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .withColumn("w",
        when(col("doc_id") % 3 === 0, upper(col("term")))
          .when(col("doc_id") % 3 === 1,
            concat(upper(substring(col("term"), 1, 1)),
              substring(col("term"), 2, 1 << 20)))
          .otherwise(col("term")))
    terms
      .groupBy(expr("collate(w, 'UTF8_LCASE')").as("k"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("w")).as("n_variants"))
      .select(lower(col("k")).cast("string").as("word"),
        col("n"), col("n_variants"))
      .orderBy(col("word"))
  }

  /** Per-process oracle-input base (same contract as
    * [[graft.elb.ElbQueries]]'s: checkout-derived, pid-suffixed so
    * concurrent bench/verify JVMs never race on part files). */
  private val OracleInputDir: String = {
    val base = sys.env.getOrElse("GRAFT_ORACLE_INPUT_DIR",
      s"${sys.props("user.dir")}/target/oracle_inputs")
    s"$base/p${ProcessHandle.current().pid()}"
  }

  /** (session, dir)s whose evolved-orders fixture this process has
    * written — computeIfAbsent-style guard via a concurrent set; the
    * fixture is deterministic so later constructions reuse the bytes. */
  private val evolvedWritten =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  private def evolvedOrdersPath(s: SparkSession, dir: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9]+", "_")
    val out = s"$OracleInputDir/evolved_orders_$safe"
    if (evolvedWritten.add((s, dir))) {
      val o = t(s, dir, "orders")
      // batch=1 predates the column; batch=2 added o_orderpriority
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/batch=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/batch=2")
    }
    out
  }

  /** Schema evolution on read — `mergeSchema` over hive-partitioned
    * parquet whose shards DISAGREE on columns (a column added mid-year:
    * the defining shape of any multi-year 100 TB lake). Spark unions the
    * file schemas (absent columns → null) and discovers the partition
    * column from the directory layout; the oracle reads the SAME bytes
    * via union_by_name. Footer-only work at planning time — no data scan
    * to build the merged schema. Exact-integer aggregates per batch pin
    * both the null-fill and the partition discovery. */
  def schemaMerge(s: SparkSession, dir: String): DataFrame = {
    val path = evolvedOrdersPath(s, dir)
    s.read.option("mergeSchema", "true").parquet(path)
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L))
          .as("n_no_priority"),
        sum(col("o_orderkey")).as("sum_keys"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      .select(col("batch").cast("long").as("batch"), col("n"),
        col("n_no_priority"), col("sum_keys"), col("n_priorities"))
      .orderBy(col("batch"))
  }

  /** Paging: ORDER BY ... OFFSET/LIMIT (deterministic keyset order). */
  def limitOffset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(10).limit(5)

  /** HLL++ approximate distinct — the 100 TB path for Goal 3's unique
    * counting (SURVEY §2.4): no expand+double shuffle like exact
    * countDistinct. Not exact ⇒ excluded from the hash oracle (driver
    * records rows-only); ±2 % accuracy vs exact asserted in AccuracySpec. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Bivariate statistics per group: Pearson correlation, sample
    * covariance, sample variance — streaming co-moment aggregates (one
    * pass, map-side partial merge like any algebraic agg). Definitions
    * match DuckDB's corr/covar_samp/var_samp exactly; rounding absorbs
    * the last-ulp difference between merge orders. */
  def statsCorr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qty_price"),
        round(var_samp(col("l_discount")), 6).as("var_discount"))
      .orderBy(col("l_returnflag"))

  /** approx_percentile — the 100 TB path for quantiles (KLL-style sketch,
    * mergeable, no per-group sort like exact percentile). Approximate ⇒
    * rows-only for the oracle; accuracy vs exact percentile is asserted
    * in AccuracySpec. Quartiles are emitted as SCALAR columns, not an
    * array: the driver's rows-only reader sorts the result with pandas,
    * which cannot sort array cells (CORRECTNESS_r04 err on this query). */
  def approxPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)")
        .as("q"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        element_at(col("q"), 1).as("p25"),
        element_at(col("q"), 2).as("p50"),
        element_at(col("q"), 3).as("p75"),
        col("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Deterministic-sample quantile estimation — the fully-oracled twin of
    * [[approxPercentile]] (which is rows-only by nature: KLL sketch
    * internals differ per engine). Classical sample-based quantiles: an
    * md5-keyed 1-in-8 row sample (deterministic, so BOTH engines pick the
    * identical subset — no rand()) and EXACT percentiles over the sample
    * next to exact percentiles over the full data, with the absolute
    * error surfaced. Interpolation parity (Spark `percentile` ≡ DuckDB
    * `quantile_cont`) is exercised at 6 dp on both the sampled and full
    * paths. At 100 TB the sample side is the two-pass scalable shape
    * (hash-filter scan → per-group sort of the 12.5% subset); the
    * one-pass mergeable path stays [[approxPercentile]]'s sketch. */
  def samplePercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("price", col("l_extendedprice").cast("double"))
      .withColumn("in_sample",
        conv(substring(md5(concat_ws(":",
          col("l_orderkey"), col("l_linenumber"))), 1, 7), 16, 10)
          .cast("long") % 8 === 0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("in_sample"), 1)).as("n_sample"),
        round(expr("percentile(price, 0.5)"), 6).as("p50_exact"),
        round(expr("percentile(price, 0.5) FILTER (WHERE in_sample)"), 6)
          .as("p50_sample"),
        round(expr("percentile(price, 0.9)"), 6).as("p90_exact"),
        round(expr("percentile(price, 0.9) FILTER (WHERE in_sample)"), 6)
          .as("p90_sample"))
      .withColumn("err50",
        round(abs(col("p50_sample") - col("p50_exact")), 6))
      .withColumn("err90",
        round(abs(col("p90_sample") - col("p90_exact")), 6))
      .orderBy(col("l_returnflag"))

  /** UNPIVOT / melt (wide → long): each lineitem's three charge
    * components become (metric, value) rows — the reshape feeding
    * metric-generic downstream aggregation. Spark's native `unpivot`
    * (Expand under the hood, a pure map-side 3× row expansion — no
    * shuffle); the oracle spells the same relation as a portable
    * UNION ALL. */
  def unpivotCharges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 200)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_extendedprice").as("extendedprice"),
          col("l_discount").as("discount"), col("l_tax").as("tax")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  /** Recursive CTE (Spark 4 WITH RECURSIVE): every document's depth in
    * the synthetic binary tree doc_id → floor(doc_id / 2) → … → 1 — the
    * iterate-to-fixpoint surface (hierarchies, reachability) expressed in
    * pure SQL rather than a driver loop. The SAME text runs on both
    * engines (DuckDB's recursive CTE dialect matches), so like
    * q_sql_sessionize this pins cross-engine semantics exactly; the
    * driver-loop twin of the same algorithmic shape is
    * Curation.connectedComponents' pointer jumping. */
  val recursiveDepthSql: String =
    """WITH RECURSIVE anc AS (
      |  SELECT doc_id, doc_id AS node, 0 AS depth FROM documents
      |  UNION ALL
      |  SELECT doc_id, CAST(floor(node / 2) AS BIGINT) AS node,
      |         depth + 1 AS depth
      |  FROM anc WHERE node > 1)
      |SELECT doc_id, CAST(max(depth) AS BIGINT) AS depth_to_root
      |FROM anc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def recursiveDepth(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "documents").createOrReplaceTempView("documents")
    s.sql(recursiveDepthSql)
  }

  /** SQL scalar UDF (Spark 4 CREATE FUNCTION ... RETURN expr): the
    * declarative UDF surface — the body is inlined by the analyzer, so
    * unlike a JVM closure it stays inside whole-stage codegen and
    * predicate pushdown (the §2.9 no-scalar-UDF policy is about OPAQUE
    * functions; a SQL UDF is transparent). The TPC-H charge expression,
    * aggregated per return flag; the oracle inlines the same body. */
  def sqlUdfCharge(s: SparkSession, dir: String): DataFrame = {
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION charge(
            |  price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
            |RETURN price * (1 - disc) * (1 + tax)""".stripMargin)
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    s.sql("""SELECT l_returnflag,
            |  round(sum(charge(l_extendedprice, l_discount, l_tax)), 2)
            |    AS sum_charge,
            |  count(*) AS n
            |FROM lineitem_v GROUP BY l_returnflag
            |ORDER BY l_returnflag""".stripMargin)
  }

  /** Custom typed UDAF (Aggregator) — sum of squares per group; exact,
    * order-independent, so fully oracle-checkable. */
  def udafSumSq(s: SparkSession, dir: String): DataFrame = {
    val sumsq = udaf(graft.functions.SumSq)
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sumsq(col("l_quantity")), 2).as("sum_sq_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q3-shaped: shipping priority — 3-way join, filter both sides,
    * aggregate, top-k. The fact-fact join shuffles on the key; customer is
    * under the broadcast threshold at test SF and planner-broadcast. */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(java.sql.Timestamp.valueOf("1998-06-01 00:00:00"))
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("orderdate_us"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped: local-supplier revenue per nation — 6-way star join
    * (two broadcast dims, supplier-nation co-location condition). */
  def localSupplierVolume(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("revenue").desc, col("n_name"))

  /** Typed Dataset[T] row for the typed-API coverage query. */
  case class Li(l_returnflag: String, l_discount: Double)

  /** Typed Dataset[T] path (SURVEY §1.6): case-class encoder, typed filter
    * + groupByKey — compiles to the same Tungsten plan, with compile-time
    * field checks. Same oracle as the equivalent SQL aggregate. */
  def typedCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_discount"))
      .as[Li]
      .filter(_.l_discount > 0.02)
      .groupByKey(_.l_returnflag)
      .count()
      .toDF("l_returnflag", "n")
      .orderBy(col("l_returnflag"))
  }

  /** Salted exact-distinct (ops.Skew): hot-key-safe distinct URL counting —
    * identical results to plain countDistinct (oracle-checked), spread over
    * 16 value-buckets. */
  def saltedDistinct(s: SparkSession, dir: String): DataFrame =
    Skew.saltedDistinctCount(
        Tables(s, dir, "events"), col("event_type"), col("user_id"))
      .withColumnRenamed("key", "event_type")
      .orderBy(col("event_type"))

  /** Hybrid hot/cold skew join (ops.Skew): events fact ⋈ per-user spend
    * dim, with users above 80 fact rows routed through the broadcast hot
    * path and the rest through the normal keyed join. The oracle runs the
    * PLAIN join — the driver proves split ∪ split ≡ join on every run
    * (the same prove-the-rewrite pattern as q_salted_distinct and
    * q_jaccard_prefix). Aggregated to per-type counts so the compare is
    * insensitive to union ordering. */
  def hybridSkewJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val dim = ev.groupBy(col("user_id"))
      .agg(round(sum(col("value")), 6).as("user_total"))
    Skew.hybridSkewJoin(ev, dim, "user_id", hotThreshold = 80L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("user_total")), 2).as("total_spend"))
      .orderBy(col("event_type"))
  }

  /** Correlated scalar subquery (SURVEY §4 "subquery decorrelation"):
    * customers spending above their nation's average order value. Catalyst
    * rewrites the correlated aggregate into a join
    * (RewriteCorrelatedScalarSubquery); expressed via the SQL API since
    * the DataFrame API has no subquery syntax. */
  def correlatedSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, round(total_spend, 2) AS total_spend
        |FROM (
        |  SELECT c_custkey, c_nationkey,
        |         (SELECT sum(o_totalprice) FROM orders_v WHERE o_custkey = c_custkey) AS total_spend
        |  FROM customer_v)
        |WHERE total_spend > (
        |  SELECT avg(t) FROM (
        |    SELECT c2.c_nationkey AS nk, sum(o2.o_totalprice) AS t
        |    FROM customer_v c2 JOIN orders_v o2 ON o2.o_custkey = c2.c_custkey
        |    GROUP BY c2.c_custkey, c2.c_nationkey) x
        |  WHERE x.nk = c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** LATERAL correlated derived table (Spark 4 lateral join): per-nation
    * top-2 customers by balance. Catalyst decorrelates the correlated
    * ORDER BY ... LIMIT subquery into a single join + per-key rank — NOT a
    * per-outer-row re-execution — so at 100 TB this is one shuffle on the
    * correlation key, same cost class as q_window_topk_group. DuckDB runs
    * the identical LATERAL text. */
  def joinLateral(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("nation_v")
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation_v n,
        |  LATERAL (SELECT c_name, c_acctbal FROM customer_v
        |           WHERE c_nationkey = n.n_nationkey
        |           ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)
  }

  /** Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): after the §2.2
    * sentinel-to-null normalization ('P' status → NULL), the null bucket
    * must still join to its dim row — a plain `=` inner join silently
    * drops the whole NULL group. Same shuffle shape as any equi join;
    * the null key hashes like an ordinary value. */
  def joinNullSafe(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .withColumn("st", expr("nullif(o_orderstatus, 'P')"))
    val agg = base.groupBy(col("st"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
    val dim = base.select(col("st").as("st2")).distinct()
      .withColumn("label", coalesce(col("st2"), lit("pending")))
    agg.join(dim, agg("st") <=> dim("st2"))
      .select(col("label"), col("n"), col("sum_price"))
      .orderBy(col("label"))
  }

  /** SCD2 dimension-history build (gaps-and-islands): collapse each
    * customer's order-status sequence to CHANGE rows (status ≠ previous),
    * then derive [valid_from, valid_to) intervals with lead(); the open
    * interval (valid_to IS NULL) is the current version. This is the
    * standard change-log → slowly-changing-dimension transform; both
    * window passes ride ONE hash-by-custkey exchange. Every ORDER BY
    * carries full tie-breaks (same-date orders are ordered by o_orderkey)
    * so the interval bounds are deterministic on both engines. */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("prev", lag(col("o_orderstatus"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderstatus"))
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderstatus"),
        col("valid_to").asc_nulls_first)
  }

  /** EXISTS / NOT EXISTS correlated subqueries: Catalyst decorrelates them
    * into left-semi and left-anti joins (RewritePredicateSubquery) — the
    * declarative spelling of q_join_semi/q_join_anti, one shuffle each,
    * never a per-row probe. Suppliers in nations that have customers with
    * orders, excluding suppliers whose nation has no 'F' order. */
  def existsSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "supplier").createOrReplaceTempView("supplier_v")
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT s_suppkey, s_name
        |FROM supplier_v s
        |WHERE EXISTS (
        |    SELECT 1 FROM customer_v c
        |    WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal > 9000)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM customer_v c JOIN orders_v o
        |      ON o.o_custkey = c.c_custkey
        |    WHERE c.c_nationkey = s.s_nationkey
        |      AND o.o_orderstatus = 'F' AND o.o_totalprice > 490000)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** Date arithmetic beyond bucketing (q_date_funcs): trunc-to-month,
    * datediff spans, add_months, last_day, day-of-week tallies. Engine
    * deltas pinned by the oracle: Spark datediff is int32 (cast to BIGINT
    * for parity), Spark dayofweek is 1-based Sunday vs DuckDB's 0-based,
    * and DuckDB spells add_months as `+ INTERVAL 1 MONTH`. */
  def dateArith(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT date_format(trunc(o_orderdate, 'mm'), 'yyyy-MM-dd')
        |    AS month_start,
        |  count(*) AS n,
        |  min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
        |  CAST(datediff(max(o_orderdate), min(o_orderdate)) AS BIGINT)
        |    AS span_days,
        |  date_format(add_months(trunc(o_orderdate, 'mm'), 1), 'yyyy-MM-dd')
        |    AS next_month,
        |  date_format(last_day(max(o_orderdate)), 'yyyy-MM-dd')
        |    AS month_last_day,
        |  count(CASE WHEN dayofweek(o_orderdate) = 1 THEN 1 END) AS n_sunday
        |FROM orders_v GROUP BY trunc(o_orderdate, 'mm')
        |ORDER BY month_start""".stripMargin)
  }

  /** GROUP BY ALL / ORDER BY ALL (modern SQL ergonomics, Spark 4 +
    * DuckDB): every non-aggregate select item groups implicitly — the
    * identical text runs on both engines and must resolve to the same
    * grouping as the explicit spelling. */
  def groupByAll(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem_v GROUP BY ALL ORDER BY ALL""".stripMargin)
  }

  /** Inline VALUES table as a join dimension (code → label decode without
    * a stored dim table) — the identical text runs on both engines; the
    * 3-row VALUES relation broadcasts. */
  def inlineValues(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT v.label, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders_v o
        |JOIN (VALUES ('F', 'fulfilled'), ('O', 'open'), ('P', 'pending'))
        |  AS v(code, label)
        |  ON o.o_orderstatus = v.code
        |GROUP BY v.label ORDER BY v.label""".stripMargin)
  }

  /** TPC-H Q8-shaped national market share: the deepest join pipeline in
    * the repo — lineitem ⋈ orders ⋈ (customer ⋈ nation ⋈ region) ⋈ part ⋈
    * (supplier ⋈ nation), yearly share of revenue supplied by one nation to
    * one region's customers for one part type. Only the FIXED-cardinality
    * dims (nation ×2, region) carry `broadcast` hints; customer, supplier,
    * and the filtered part relation scale with the corpus, so their joins
    * stay planner-chosen equi shuffles (AQE may still broadcast them at
    * small SF — fine; forcing it would be wrong at 100 TB). The share
    * divides two aggregates of the SAME joined relation — one pass, no
    * re-scan. */
  def marketShare(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val custReg = t(s, dir, "customer")
      .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val supp = t(s, dir, "supplier")
      .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val prt = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(custReg, col("o_custkey") === col("c_custkey"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .withColumn("rev", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_3", col("rev"))
          .otherwise(0.0)) / sum(col("rev")), 6).as("mkt_share"),
        round(sum(col("rev")), 2).as("total_rev"))
      .orderBy(col("o_year"))
  }

  /** 2D Pareto skyline of customers by (total spend, order count): points
    * no other point dominates. Executed WITHOUT the O(N²) dominance join:
    * a point is dominated iff some strictly-higher-spend point has ≥ its
    * order count, or a same-spend point has more orders — both testable
    * from (a) the per-spend max order count and (b) the EXCLUSIVE global
    * prefix max of that in spend-descending order, computed by
    * [[ScaledRank.withGlobalCumMax]]'s range-partitioned two-phase pass.
    * Total cost: two aggregates + one range exchange, O(N log N) vs the
    * naive O(N²). The oracle IS the quadratic NOT-EXISTS definition, so
    * the driver proves plan ≡ definition. Spend is rounded to cents before
    * the skyline on both engines so float formatting cannot shift
    * dominance. */
  def skyline(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "orders").groupBy(col("o_custkey").as("custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"),
        count(lit(1)).as("n_orders"))
    val perS = pts.groupBy(col("spend")).agg(max(col("n_orders")).as("mc"))
    val withM1 = ScaledRank.withGlobalCumMax(perS,
      Seq(col("spend").desc), col("mc"))
    pts.join(withM1.select(col("spend"), col("mc"),
        col("cummax_excl").as("m1")), "spend")
      .filter((col("m1").isNull || col("m1") < col("n_orders")) &&
        col("mc") <= col("n_orders"))
      .select(col("custkey"), col("spend"), col("n_orders"))
      .orderBy(col("spend").desc, col("custkey"))
  }

  /** TPC-H Q21-shaped "sole late supplier": per supplier, the late
    * lineitems (shipped > 365 days after order date) on completed orders
    * where at least one OTHER supplier participated but NO other supplier
    * was late — the classic double-correlated EXISTS / NOT EXISTS,
    * expressed Spark-first as a LEFT SEMI (other-supplier exists) then
    * LEFT ANTI (other-late-supplier absent) join chain on the order key:
    * correlated subqueries become two keyed shuffles, no row explosion
    * (semi/anti preserve left multiplicity and short-circuit per key).
    * Date arithmetic is exact integer microseconds on both engines. */
  def waitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val yearUs = 31536000000000L
    val ord = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("sd_us"))
    val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("sd_us") > col("od_us") + yearUs)
      .select(col("l_orderkey"), col("l_suppkey"))
    val others = li.select(col("l_orderkey").as("lo"), col("l_suppkey").as("so"))
    val lateOthers = late
      .select(col("l_orderkey").as("lo2"), col("l_suppkey").as("so2"))
    late
      .join(others, col("l_orderkey") === col("lo") &&
        col("so") =!= col("l_suppkey"), "left_semi")
      .join(lateOthers, col("l_orderkey") === col("lo2") &&
        col("so2") =!= col("l_suppkey"), "left_anti")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q15-shaped top supplier: revenue per supplier over one quarter,
    * then the suppliers achieving the GLOBAL max — argmax as a broadcast
    * join against the 1-row max aggregate (no global sort, no window over
    * the whole relation; ties all surface, exactly Q15's view semantics).
    * Revenue rounds to cents BEFORE the max comparison so float equality
    * is engine-portable. */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00"))
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate").cast("timestamp") >= lo &&
        col("l_shipdate").cast("timestamp") < hi)
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("mr"))
    rev.join(broadcast(mx), col("total_rev") === col("mr"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("total_rev"))
      .orderBy(col("s_name"))
  }

  /** Derived supply relation standing in for TPC-H `partsupp` (the fixture
    * ships no partsupp table): for every (part, supplier) pair observed in
    * lineitem, supplycost = min unit price ever charged, availqty = total
    * quantity shipped. Both aggregates are order-free (min / sum-of-exact
    * per-row divisions), so the relation is deterministic and the DuckDB
    * twin CTE ([[psSql]]) is value-identical. One groupBy per query — the
    * shuffle is keyed by (part, supplier), the same key the consumers join
    * on, so Catalyst reuses the exchange. */
  private def derivedPartsupp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"),
        sum(col("l_quantity")).as("ps_availqty"))

  private val psSql: String =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(l_extendedprice / l_quantity) AS ps_supplycost,
      |         sum(l_quantity) AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  /** TPC-H Q2-shaped min-cost supplier: for each LARGE part of size ≤ 10, the
    * EUROPE-region supplier(s) offering the minimum supply cost. The
    * correlated `cost = (SELECT min(cost) …)` subquery decorrelates to a
    * per-part min aggregate joined back on (part, exact cost) — two keyed
    * shuffles on p_partkey, no window, no correlated re-execution. Cost
    * equality is safe across engines because both sides compute the
    * identical IEEE division then an order-free min. Dims (filtered parts,
    * region-pruned suppliers) broadcast. */
  def minCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val ps = derivedPartsupp(s, dir)
    val prt = t(s, dir, "part")
      .filter(col("p_size") <= 10 && col("p_type") === "LARGE")
      .select(col("p_partkey"))
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region").filter(col("r_name") === "EUROPE")
    val supp = t(s, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val offers = ps
      .join(broadcast(prt), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("ps_suppkey") === col("s_suppkey"))
    val minc = offers.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("ps_supplycost")).as("min_cost"))
    offers
      .join(minc, col("p_partkey") === col("mk") &&
        col("ps_supplycost") === col("min_cost"))
      .select(round(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"),
        round(col("ps_supplycost"), 2).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q9-shaped product-type profit: for parts named '%gear%', profit
    * = revenue − supply cost × quantity, grouped by the SUPPLIER's nation
    * and order year. The 5-relation join pipeline keeps lineitem as the
    * only big fact: parts (name-filtered, tiny) and supplier×nation
    * broadcast; the derived partsupp joins on its own grouping key
    * (part, supp) so that exchange co-locates with the probe. */
  def productProfit(s: SparkSession, dir: String): DataFrame = {
    val prt = t(s, dir, "part").filter(col("p_name").contains("gear"))
      .select(col("p_partkey"))
    val ps = derivedPartsupp(s, dir)
      .join(broadcast(prt), col("ps_partkey") === col("p_partkey"))
    val supp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    t(s, dir, "lineitem")
      .join(broadcast(prt.select(col("p_partkey").as("fpk"))),
        col("l_partkey") === col("fpk"))
      .join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .withColumn("profit",
        col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("ps_supplycost") * col("l_quantity"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(col("profit")), 2).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11-shaped important stock: parts whose total supply value held
    * by ASIA-region suppliers exceeds 0.1% of the GLOBAL such value — the
    * `HAVING sum > (scalar subquery)` shape, executed as one keyed
    * aggregate plus a broadcast of the 1-row total (never a second scan:
    * the total is re-aggregated from the 2000-row per-part relation).
    * Values round to cents BEFORE the threshold compare so the boundary
    * test is engine-portable. */
  def importantStock(s: SparkSession, dir: String): DataFrame = {
    val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val supp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val byPart = derivedPartsupp(s, dir)
      .join(broadcast(supp), col("ps_suppkey") === col("s_suppkey"))
      .groupBy(col("ps_partkey"))
      .agg(round(sum(col("ps_supplycost") * col("ps_availqty")), 2)
        .as("part_value"))
    val tot = byPart.agg(sum(col("part_value")).as("total_value"))
    byPart.crossJoin(broadcast(tot))
      .filter(col("part_value") > col("total_value") * 0.001)
      .select(col("ps_partkey").as("p_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  /** TPC-H Q16-shaped supplier count per part attribute group, excluding
    * one brand, one type, and "complaint" suppliers (stand-in: negative
    * account balance — the fixture has no s_comment). The NOT IN
    * (subquery) becomes a broadcast LEFT ANTI join; the distinct-supplier
    * count aggregates the anti-joined supply relation grouped by the
    * part's (brand, type, size). */
  def supplierCnt(s: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 4, 7, 10, 13, 16, 19, 22, 25, 28)
    val prt = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val badSupp = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    derivedPartsupp(s, dir)
      .join(broadcast(prt), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("ps_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20-shaped part promotion: AFRICA-region suppliers holding
    * "excess stock" of a red part — derived availqty (all-time shipped
    * quantity) greater than 4× what that (part, supplier) shipped in 1998
    * (the 4× multiplier plays the role of Q20's 0.5× against a
    * same-period availqty: availqty here spans 7 years, so the threshold
    * singles out pairs whose 1998 volume undershot their history). The
    * correlated quantity subquery decorrelates to a (part, supp)-keyed
    * aggregate joined back; pairs with NO 1998 shipments are excluded
    * exactly like Q20's NULL-comparison semantics exclude them. Supplier
    * qualification is a LEFT SEMI (distinct not needed), nation dims
    * broadcast. */
  def partPromotion(s: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00"))
    val redParts = t(s, dir, "part").filter(col("p_name").startsWith("red"))
      .select(col("p_partkey"))
    val qty98 = t(s, dir, "lineitem")
      .filter(col("l_shipdate").cast("timestamp") >= lo &&
        col("l_shipdate").cast("timestamp") < hi)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty98"))
    val qual = derivedPartsupp(s, dir)
      .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"))
      .join(qty98, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") > col("qty98") * 4.0)
      .select(col("ps_suppkey"))
    val reg = t(s, dir, "region").filter(col("r_name") === "AFRICA")
    val nat = t(s, dir, "nation")
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    t(s, dir, "supplier")
      .join(qual, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"))
      .orderBy(col("s_name"))
  }

  /** TPC-H Q4-shaped order-priority check: orders placed in 1997 Q3 with at
    * least one SLOW lineitem (shipped > 60 days after the order date — the
    * fixture has no commit/receipt dates, so lateness vs order date stands
    * in), counted per priority. The correlated EXISTS is a LEFT SEMI join
    * on the order key with the date predicate in the join condition — one
    * keyed shuffle, no row explosion, the exact decorrelation Catalyst
    * performs on the subquery spelling (the oracle runs the literal
    * correlated EXISTS). */
  def orderPriority(s: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Timestamp.valueOf("1997-07-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("1997-10-01 00:00:00"))
    val sixtyDaysUs = 5184000000000L
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate").cast("timestamp") >= lo &&
        col("o_orderdate").cast("timestamp") < hi)
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("sd_us"))
    ord
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("sd_us") > col("od_us") + sixtyDaysUs, "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q6-shaped forecast revenue change: one tight scan-and-aggregate
    * — the query whose whole cost is the scan, which makes it the
    * pushdown/pruning benchmark: every predicate (date range, discount
    * band, quantity cap) must reach the parquet reader and only 3 columns
    * may be read. */
  def forecastRevenue(s: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate").cast("timestamp") >= lo &&
        col("l_shipdate").cast("timestamp") < hi &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue_delta"),
        count(lit(1)).as("n_rows"))
  }

  /** EXACT decimal aggregation — the money-sum path where double drift is
    * not acceptable: each FACTOR is cast to decimal first (price and
    * 1−discount are 2-dp quantities, so their shortest decimal form is
    * their true value on both engines), then product and sum run entirely
    * in exact decimal arithmetic — identical to the cent regardless of
    * partitioning or summation order, NO rounding anywhere. Casting the
    * double PRODUCT instead would be engine-fragile (Spark rounds the
    * shortest-repr string via HALF_UP, DuckDB scales the raw binary —
    * they disagree near .005 boundaries; measured 0.28 drift over 60k
    * rows). Sums are emitted as canonical decimal STRINGS because the
    * driver's pandas-level compare maps Spark's parquet DECIMAL to
    * `object` but DuckDB's to float64 — strings compare exactly on both
    * sides. */
  def decimalExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("decimal(28,2)").cast("string").as("sum_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(4,2)"))
          .cast("decimal(30,4)").cast("string").as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q13-shaped customer order-count distribution: how many customers
    * placed exactly k (non-urgent) orders, INCLUDING the zero bucket. The
    * classic form left-outer-joins every order row to customer then counts;
    * here the count is pushed BELOW the outer join (aggregate orders to one
    * row per custkey first, then outer-join customer to the counts and
    * coalesce the miss to 0) — the join moves |customers| + |custkeys with
    * orders| rows instead of |orders| rows, the aggregate-pushdown rewrite
    * that matters when orders ≫ customers. The oracle states the classic
    * nested form, so the driver proves the rewrite ≡ the definition. */
  def custDistribution(s: SparkSession, dir: String): DataFrame = {
    val cnt = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    t(s, dir, "customer").select(col("c_custkey"))
      .join(cnt, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q17-shaped small-quantity revenue: yearly revenue lost if
    * below-20%-of-average-quantity lineitems of one brand stopped shipping.
    * The correlated per-part AVG decorrelates to a grouped aggregate of the
    * SAME brand-filtered relation joined back on partkey: brand parts are a
    * broadcast dim, so the only keyed exchange is the per-part AVG over the
    * ~1/|brands| filtered slice, and the resulting |brand parts|-row
    * average relation broadcasts back — the full fact table never
    * shuffles (PlanSpec pins both properties). Quantities are integral so
    * the average is exact and the strict `<` boundary is engine-portable. */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val prt = t(s, dir, "part").filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey"))
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
    val lim = li.groupBy(col("l_partkey").as("ak"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_lim"))
    li.join(broadcast(lim), col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < col("qty_lim"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** TPC-H Q18-shaped large-volume orders: orders whose total quantity
    * exceeds 250, with their customer — a HAVING filter on a fact-side
    * aggregate that then drives two key joins. The quantity aggregate runs
    * partial+final on l_orderkey (map-side combine shrinks the shuffle to
    * one row per order), survivors (~1% of orders) join orders and
    * customer, and the top-10 is TakeOrderedAndProject — per-partition
    * heaps, no global sort. */
  def bigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
      .filter(col("sum_qty") > 250)
    t(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice"), 2).as("price"), col("sum_qty"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q22-shaped dormant rich customers: above-average-balance
    * customers with NO order since 2001, bucketed by the "country code"
    * (last digit of the customer name). The scalar AVG subquery becomes a
    * broadcast 1-row cross join (every executor compares locally — no
    * second scan of customer per row), the NOT EXISTS becomes a LEFT ANTI
    * join on the date-filtered order keys (filter pushed to the scan), and
    * the average is rounded to cents on BOTH engines before the strict
    * comparison so an ulp of summation-order drift cannot flip a boundary
    * customer. */
  def dormantRich(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(round(avg(col("c_acctbal")), 2).as("ab"))
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate").cast("timestamp") >=
        lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00")))
      .select(col("o_custkey"))
    cust.join(broadcast(avgBal), col("c_acctbal") > col("ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(expr("right(c_name, 1)").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  /** TPC-H Q7-shaped volume shipping: bilateral trade revenue between two
    * nations by ship year. Supplier and customer each resolve their nation
    * through a broadcast of the 25-row nation dim; the disjunctive
    * two-direction predicate sits on the joined (supp_nation, cust_nation)
    * pair — Catalyst cannot push it below the joins (it spans both sides),
    * but both nation joins are broadcasts so nothing extra shuffles; the
    * only keyed exchanges are the two fact joins (lineitem ⋈ orders ⋈
    * customer). */
  def volumeShipping(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val supp = t(s, dir, "supplier")
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = t(s, dir, "customer")
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("cust_nation"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .filter(
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_19") ||
        (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q10-shaped returned-item report: revenue lost to returns per
    * customer over one quarter, top 20. The returnflag filter prunes the
    * fact scan (pushed to parquet), the quarter filter prunes orders, and
    * the join order keeps the heavily-filtered relations on the build
    * side; nation is a broadcast dim. TakeOrderedAndProject caps the
    * result without a global sort. */
  def returnedItems(s: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00"))
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate").cast("timestamp") >= lo &&
        col("o_orderdate").cast("timestamp") < hi)
    val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12-shaped shipping-lag priority audit (adapted: this schema
    * carries no commit/receipt dates or ship modes, so the mode dimension
    * becomes ship-lag buckets of datediff(l_shipdate, o_orderdate)): per
    * lag bucket, how many high-priority vs other orders shipped there.
    * The CASE-conditional counts ride ONE partial+final hash aggregate
    * over the single fact-fact join — the Q12 shape (join + conditional
    * agg) exactly. Integral datediff makes bucket edges engine-exact. */
  def shipLagPriority(s: SparkSession, dir: String): DataFrame = {
    val lag = datediff(col("l_shipdate").cast("date"),
      col("o_orderdate").cast("date"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_bucket",
        when(lag <= 30, "0-30")
          .when(lag <= 90, "31-90")
          .when(lag <= 180, "91-180")
          .otherwise("181+"))
      .groupBy(col("lag_bucket"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("lag_bucket"))
  }

  /** TPC-H Q14-shaped promo-revenue share: the fraction of one month's
    * revenue from PROMO-type parts. The conditional-numerator /
    * unconditional-denominator division runs in ONE aggregate over ONE
    * join pass — no re-scan per branch; the month filter prunes the fact
    * scan, and the 2-column part projection is the probe side. */
  def promoEffect(s: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Timestamp.valueOf("1998-03-01 00:00:00"))
    val hi = lit(java.sql.Timestamp.valueOf("1998-04-01 00:00:00"))
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate").cast("timestamp") >= lo &&
        col("l_shipdate").cast("timestamp") < hi)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(t(s, dir, "part").select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) * sum(when(col("p_type") === "PROMO", rev)
          .otherwise(0.0)) / sum(rev), 6).as("promo_share_pct"),
        round(sum(rev), 2).as("total_rev"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q19-shaped disjunctive-predicate revenue (adapted: no
    * container/shipmode columns, so the three AND-branches pair brand with
    * disjoint size and quantity bands): revenue from lineitems matching
    * ANY of three (brand, size-range, quantity-range) bundles. The OR of
    * ANDs cannot be a single pushed range, but Catalyst still pushes the
    * COMMON conjuncts extracted from the disjunction and prunes both scans
    * to the referenced columns; the join stays a plain partkey equi join
    * with the composite predicate evaluated post-join in one codegen
    * stage — the Q19 plan shape. */
  def disjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
    val prt = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 25)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(25, 50) &&
        col("l_quantity").between(20, 35))
    li.join(prt, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  // ---- registry ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_volume_shipping" -> (volumeShipping _),
    "q_returned_items" -> (returnedItems _),
    "q_ship_lag" -> (shipLagPriority _),
    "q_promo_effect" -> (promoEffect _),
    "q_disjunctive_revenue" -> (disjunctiveRevenue _),
    "q_cust_distribution" -> (custDistribution _),
    "q_small_qty_revenue" -> (smallQtyRevenue _),
    "q_big_orders" -> (bigOrders _),
    "q_dormant_rich" -> (dormantRich _),
    "q_top_supplier" -> (topSupplier _),
    "q_min_cost_supplier" -> (minCostSupplier _),
    "q_order_priority" -> (orderPriority _),
    "q_forecast_revenue" -> (forecastRevenue _),
    "q_decimal_exact" -> (decimalExact _),
    "q_product_profit" -> (productProfit _),
    "q_important_stock" -> (importantStock _),
    "q_supplier_cnt" -> (supplierCnt _),
    "q_part_promotion" -> (partPromotion _),
    "q_waiting_suppliers" -> (waitingSuppliers _),
    "q_market_share" -> (marketShare _),
    "q_skyline" -> (skyline _),
    "q_pricing_summary" -> (pricingSummary _),
    "q_distinct_agg" -> (distinctAgg _),
    "q_rollup" -> (rollupAgg _),
    "q_cube" -> (cubeAgg _),
    "q_pivot" -> (pivotAgg _),
    "q_join_broadcast" -> (joinBroadcast _),
    "q_join_bigbig" -> (joinBigBig _),
    "q_join_left" -> (joinLeftOuter _),
    "q_join_semi" -> (joinSemi _),
    "q_join_anti" -> (joinAnti _),
    "q_join_cross" -> (joinCross _),
    "q_join_range" -> (joinRange _),
    "q_join_full_merge" -> (joinFullMerge _),
    "q_window_topk_group" -> (windowTopkPerGroup _),
    "q_window_ranks" -> (windowRanks _),
    "q_window_running" -> (windowRunning _),
    "q_window_analytics" -> (windowAnalytics _),
    "q_topk_orders" -> (topkOrders _),
    "q_set_ops" -> (setOps _),
    "q_set_ops_all" -> (setOpsAll _),
    "q_string_funcs" -> (stringFuncs _),
    "q_date_funcs" -> (dateFuncs _),
    "q_case_when" -> (caseWhen _),
    "q_sql_grouping_sets" -> (sqlGroupingSets _),
    "q_sql_pipe" -> (sqlPipe _),
    "q_exec_immediate" -> (execImmediate _),
    "q_sql_script" -> (sqlScript _),
    "q_sql_identifier" -> (sqlIdentifier _),
    "q_collation" -> (collationGroups _),
    "q_schema_merge" -> (schemaMerge _),
    "q_unpivot" -> (unpivotCharges _),
    "q_recursive_depth" -> (recursiveDepth _),
    "q_sql_udf" -> (sqlUdfCharge _),
    "q_limit_offset" -> (limitOffset _),
    "q_approx_distinct" -> (approxDistinct _),
    "q_stats_corr" -> (statsCorr _),
    "q_approx_percentile" -> (approxPercentile _),
    "q_sample_percentile" -> (samplePercentile _),
    "q_udaf_sumsq" -> (udafSumSq _),
    "q_shipping_priority" -> (shippingPriority _),
    "q_local_supplier_volume" -> (localSupplierVolume _),
    "q_typed_counts" -> (typedCounts _),
    "q_salted_distinct" -> (saltedDistinct _),
    "q_hybrid_skew_join" -> (hybridSkewJoin _),
    "q_correlated_subquery" -> (correlatedSubquery _),
    "q_join_lateral" -> (joinLateral _),
    "q_join_nullsafe" -> (joinNullSafe _),
    "q_scd2_history" -> (scd2History _),
    "q_exists_subquery" -> (existsSubquery _),
    "q_date_arith" -> (dateArith _),
    "q_group_by_all" -> (groupByAll _),
    "q_inline_values" -> (inlineValues _),
  )

  val oracleSql: Map[String, String] = Map(
    "q_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |    l_extendedprice, l_discount
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_19')
        |     OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_3'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_returned_items" ->
      """SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS acctbal,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name, acctbal
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_ship_lag" ->
      """SELECT CASE WHEN lag <= 30 THEN '0-30'
        |            WHEN lag <= 90 THEN '31-90'
        |            WHEN lag <= 180 THEN '91-180'
        |            ELSE '181+' END AS lag_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM (
        |  SELECT datediff('day', CAST(o_orderdate AS DATE),
        |                  CAST(l_shipdate AS DATE)) AS lag, o_orderpriority
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |GROUP BY lag_bucket ORDER BY lag_bucket""".stripMargin,

    "q_promo_effect" ->
      """SELECT
        |  round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
        |    / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share_pct,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1998-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'""".stripMargin,

    "q_disjunctive_revenue" ->
      """SELECT p_brand,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 25 AND 50
        |       AND l_quantity BETWEEN 20 AND 35)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_small_qty_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,

    "q_big_orders" ->
      """SELECT c_name, o_orderkey, o_orderdate,
        |  round(o_totalprice, 2) AS price, sum_qty
        |FROM (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(l_quantity) > 250) big
        |JOIN orders ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_dormant_rich" ->
      """SELECT right(c_name, 1) AS cntrycode, count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin,

    "q_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_name, total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_name""".stripMargin,

    "q_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate) + 5184000000000)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_decimal_exact" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DECIMAL(28,2)) AS VARCHAR) AS sum_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(1 - l_discount AS DECIMAL(4,2)))
        |    AS DECIMAL(30,4)) AS VARCHAR) AS sum_disc_price,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_min_cost_supplier" ->
      s"""WITH $psSql,
        |offers AS (
        |  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
        |         ps_supplycost
        |  FROM ps
        |  JOIN part ON ps_partkey = p_partkey
        |   AND p_size <= 10 AND p_type = 'LARGE'
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |minc AS (
        |  SELECT p_partkey AS mk, min(ps_supplycost) AS min_cost
        |  FROM offers GROUP BY 1)
        |SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
        |       round(ps_supplycost, 2) AS supply_cost
        |FROM offers JOIN minc
        |  ON p_partkey = mk AND ps_supplycost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q_product_profit" ->
      s"""WITH $psSql
        |SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(sum(l_extendedprice * (1 - l_discount)
        |    - ps_supplycost * l_quantity), 2) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
        |JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q_important_stock" ->
      s"""WITH $psSql,
        |byp AS (
        |  SELECT ps_partkey,
        |    round(sum(ps_supplycost * ps_availqty), 2) AS part_value
        |  FROM ps
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  GROUP BY 1)
        |SELECT ps_partkey AS p_partkey, part_value
        |FROM byp
        |WHERE part_value > (SELECT sum(part_value) FROM byp) * 0.001
        |ORDER BY part_value DESC, p_partkey""".stripMargin,

    "q_supplier_cnt" ->
      s"""WITH $psSql
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM ps
        |JOIN part ON ps_partkey = p_partkey
        |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25, 28)
        |  AND ps_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_part_promotion" ->
      s"""WITH $psSql,
        |q98 AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty98
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |    AND l_shipdate < TIMESTAMP '1999-01-01'
        |  GROUP BY 1, 2),
        |qual AS (
        |  SELECT DISTINCT ps_suppkey
        |  FROM ps
        |  JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'red%'
        |  JOIN q98 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |  WHERE ps_availqty > qty98 * 4.0)
        |SELECT s_name, n_name
        |FROM supplier
        |JOIN qual ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'AFRICA'
        |ORDER BY s_name""".stripMargin,

    "q_waiting_suppliers" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND epoch_us(l_shipdate) > epoch_us(o_orderdate) + 31536000000000)
        |SELECT s_name, numwait FROM (
        |  SELECT l1.l_suppkey, count(*) AS numwait
        |  FROM late l1
        |  WHERE EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM late l3
        |                    WHERE l3.l_orderkey = l1.l_orderkey
        |                      AND l3.l_suppkey <> l1.l_suppkey)
        |  GROUP BY l1.l_suppkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(sum(CASE WHEN n2.n_name = 'NATION_3'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
        |    / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    // the quadratic NOT-EXISTS dominance definition — the Spark side's
    // prefix-max plan must reproduce it exactly
    "q_skyline" ->
      """WITH pts AS (
        |  SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS spend,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT custkey, spend, n_orders FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.spend >= p.spend AND q.n_orders >= p.n_orders
        |    AND (q.spend > p.spend OR q.n_orders > p.n_orders))
        |ORDER BY spend DESC, custkey""".stripMargin,
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_distinct_agg" ->
      """SELECT count(DISTINCT l_orderkey) AS n_orders,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(*) AS n_rows
        |FROM lineitem""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
        |       CAST(grouping(o_orderpriority) AS TINYINT) AS g_prio,
        |       o_orderstatus, o_orderpriority, count(*) AS n,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio,
        |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_join_bigbig" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_range" ->
      """SELECT o_orderstatus, count(*) AS n_shipped_90d
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_window_topk_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q_window_ranks" ->
      """SELECT c_custkey, c_acctbal,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS order_us,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS cum_spend,
        |  epoch_us(o_orderdate) - lag(epoch_us(o_orderdate)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS gap_us
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_join_full_merge" ->
      """WITH early AS (
        |  SELECT o_custkey, count(*) AS n_early, max(o_orderdate) AS last_early
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY o_custkey),
        |late AS (
        |  SELECT o_custkey, count(*) AS n_late, max(o_orderdate) AS last_late
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |  GROUP BY o_custkey)
        |SELECT COALESCE(e.o_custkey, l.o_custkey) AS custkey,
        |  CAST(COALESCE(n_early, 0) AS BIGINT) AS n_early,
        |  CAST(COALESCE(n_late, 0) AS BIGINT) AS n_late,
        |  epoch_us(COALESCE(last_late, last_early)) AS last_order_us
        |FROM early e FULL JOIN late l ON e.o_custkey = l.o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  round(nth_value(o_totalprice, 2) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS second_price,
        |  round(first_value(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_price,
        |  round(last_value(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS latest_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_set_ops" ->
      """WITH open AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
        |     fin AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
        |     tagged AS (
        |       SELECT custkey, 'both' AS bucket FROM (SELECT custkey FROM open INTERSECT SELECT custkey FROM fin)
        |       UNION ALL
        |       SELECT custkey, 'open_only' FROM (SELECT custkey FROM open EXCEPT SELECT custkey FROM fin)
        |       UNION ALL
        |       SELECT custkey, 'fin_only' FROM (SELECT custkey FROM fin EXCEPT SELECT custkey FROM open))
        |SELECT bucket, count(*) AS n FROM tagged GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_set_ops_all" ->
      """WITH open AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
        |     fin AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
        |     tagged AS (
        |       SELECT custkey, 'intersect_all' AS bucket
        |       FROM (SELECT custkey FROM open INTERSECT ALL SELECT custkey FROM fin)
        |       UNION ALL
        |       SELECT custkey, 'except_all'
        |       FROM (SELECT custkey FROM open EXCEPT ALL SELECT custkey FROM fin))
        |SELECT bucket, count(*) AS n_rows,
        |       count(DISTINCT custkey) AS n_custkeys
        |FROM tagged GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lower,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substring(p_type, 1, 5) AS type_prefix,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS name_words
        |FROM part WHERE regexp_matches(p_name, '^[a-z]')
        |ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       CAST(month(o_orderdate) AS INTEGER) AS mo,
        |       count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,

    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice >= 200000 THEN 'large'
        |            WHEN o_totalprice >= 100000 THEN 'medium'
        |            ELSE 'small' END AS size_bucket,
        |       coalesce(nullif(o_orderstatus, 'P'), 'NOT_P') AS status_np,
        |       count(*) AS n
        |FROM orders GROUP BY 1, 2 ORDER BY size_bucket, status_np""".stripMargin,

    "q_sql_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5 OFFSET 10""".stripMargin,

    // classic-SQL equivalent of the pipe-syntax stages
    "q_sql_pipe" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |WHERE l_quantity >= 5
        |GROUP BY l_returnflag, l_linestatus
        |HAVING count(*) > 100
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // closed-form re-derivation of the script's exponential probe: the
    // smallest k with count(price >= 1000·2^k) <= 100, plus that count
    "q_sql_script" ->
      """WITH ks AS (SELECT CAST(range AS BIGINT) AS k FROM range(0, 40)),
        |cnt AS (
        |  SELECT k, (SELECT count(*) FROM orders
        |             WHERE o_totalprice >= 1000.0 * power(2, k)) AS n
        |  FROM ks),
        |pick AS (SELECT min(k) AS k FROM cnt WHERE n <= 100)
        |SELECT p.k AS k_doublings,
        |       CAST(1000.0 * power(2, p.k) AS DOUBLE) AS cutoff,
        |       c.n AS n_above
        |FROM pick p JOIN cnt c ON c.k = p.k""".stripMargin,

    // the statically-bound equivalent of the EXECUTE IMMEDIATE ... USING
    // parameter binding
    "q_exec_immediate" ->
      """SELECT o_orderpriority, count(*) AS n,
        |       min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
        |FROM orders
        |WHERE o_orderdate >= DATE '1995-01-01' AND o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the statically-named equivalent of IDENTIFIER(:tbl)/(:keycol)
    "q_sql_identifier" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // UTF8_LCASE grouping re-derived as lower() grouping (ASCII corpus)
    "q_collation" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |w AS (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN upper(term)
        |              WHEN doc_id % 3 = 1
        |                THEN upper(substr(term, 1, 1)) || substr(term, 2)
        |              ELSE term END AS w
        |  FROM t WHERE length(term) > 0)
        |SELECT lower(w) AS word, count(*) AS n,
        |       count(DISTINCT w) AS n_variants
        |FROM w GROUP BY lower(w) ORDER BY word""".stripMargin,

    // the evolved shards are a deterministic function of orders, so the
    // oracle re-derives the by-name union (absent column → NULL) from the
    // base table — any mergeSchema/null-fill/partition-discovery drift on
    // the Spark side breaks the hash
    "q_schema_merge" ->
      """WITH evolved AS (
        |  SELECT o_orderkey, CAST(NULL AS VARCHAR) AS o_orderpriority,
        |         1 AS batch
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderpriority, 2 AS batch
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT CAST(batch AS BIGINT) AS batch, count(*) AS n,
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_no_priority,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_keys,
        |  count(DISTINCT o_orderpriority) AS n_priorities
        |FROM evolved GROUP BY batch ORDER BY batch""".stripMargin,

    "q_sample_percentile" ->
      """WITH l AS (
        |  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS price,
        |    ('0x'||substr(md5(concat_ws(':', l_orderkey, l_linenumber)),1,7))::BIGINT % 8 = 0
        |      AS in_sample
        |  FROM lineitem
        |)
        |SELECT l_returnflag, count(*) AS n_rows,
        |  count(*) FILTER (WHERE in_sample) AS n_sample,
        |  round(quantile_cont(price, 0.5), 6) AS p50_exact,
        |  round(quantile_cont(price, 0.5) FILTER (WHERE in_sample), 6) AS p50_sample,
        |  round(quantile_cont(price, 0.9), 6) AS p90_exact,
        |  round(quantile_cont(price, 0.9) FILTER (WHERE in_sample), 6) AS p90_sample,
        |  round(abs(round(quantile_cont(price, 0.5) FILTER (WHERE in_sample), 6)
        |            - round(quantile_cont(price, 0.5), 6)), 6) AS err50,
        |  round(abs(round(quantile_cont(price, 0.9) FILTER (WHERE in_sample), 6)
        |            - round(quantile_cont(price, 0.9), 6)), 6) AS err90
        |FROM l GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // the portable UNION ALL spelling of the same long relation
    "q_unpivot" ->
      """WITH u AS (
        |  SELECT l_orderkey, l_linenumber, 'extendedprice' AS metric,
        |         l_extendedprice AS value
        |  FROM lineitem WHERE l_orderkey < 200
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'discount', l_discount
        |  FROM lineitem WHERE l_orderkey < 200
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'tax', l_tax
        |  FROM lineitem WHERE l_orderkey < 200)
        |SELECT * FROM u ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    // same WITH RECURSIVE text Spark executes (see recursiveDepthSql)
    "q_recursive_depth" -> recursiveDepthSql,

    // the SQL UDF body, inlined (sum of TPC-H charge per return flag)
    "q_sql_udf" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
        |    AS sum_charge,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // q_approx_distinct / q_approx_percentile: sketch estimates ≠ exact —
    // intentionally no oracle; ±tolerance vs exact asserted in AccuracySpec.

    "q_stats_corr" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
        |  round(var_samp(l_discount), 6) AS var_discount
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_udaf_sumsq" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity * l_quantity), 2) AS sum_sq_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_shipping_priority" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS orderdate_us,
        |  o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_local_supplier_volume" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, revenue DESC, n_name""".stripMargin,

    "q_typed_counts" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |WHERE l_discount > 0.02
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_salted_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_hybrid_skew_join" ->
      """WITH dim AS (
        |  SELECT user_id, round(sum(value), 6) AS user_total
        |  FROM events GROUP BY user_id)
        |SELECT e.event_type, count(*) AS n,
        |       round(sum(d.user_total), 2) AS total_spend
        |FROM events e JOIN dim d USING (user_id)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_correlated_subquery" ->
      """SELECT c_custkey, round(total_spend, 2) AS total_spend
        |FROM (
        |  SELECT c_custkey, c_nationkey,
        |         (SELECT sum(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS total_spend
        |  FROM customer)
        |WHERE total_spend > (
        |  SELECT avg(t) FROM (
        |    SELECT c2.c_nationkey AS nk, sum(o2.o_totalprice) AS t
        |    FROM customer c2 JOIN orders o2 ON o2.o_custkey = c2.c_custkey
        |    GROUP BY c2.c_custkey, c2.c_nationkey) x
        |  WHERE x.nk = c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_lateral" ->
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation n,
        |  LATERAL (SELECT c_name, c_acctbal FROM customer
        |           WHERE c_nationkey = n.n_nationkey
        |           ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin,

    "q_join_nullsafe" ->
      """WITH b AS (SELECT nullif(o_orderstatus, 'P') AS st, o_totalprice
        |           FROM orders),
        |a AS (SELECT st, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        |      FROM b GROUP BY st),
        |d AS (SELECT DISTINCT st AS st2 FROM b)
        |SELECT coalesce(st2, 'pending') AS label, n, sum_price
        |FROM a JOIN d ON a.st IS NOT DISTINCT FROM d.st2
        |ORDER BY label""".stripMargin,

    "q_scd2_history" ->
      """WITH seq AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |    lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |ch AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        |  FROM seq WHERE prev IS NULL OR prev <> o_orderstatus)
        |SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM ch
        |ORDER BY o_custkey, valid_from, o_orderstatus,
        |  valid_to ASC NULLS FIRST""".stripMargin,

    "q_exists_subquery" ->
      """SELECT s_suppkey, s_name
        |FROM supplier s
        |WHERE EXISTS (
        |    SELECT 1 FROM customer c
        |    WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal > 9000)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM customer c JOIN orders o
        |      ON o.o_custkey = c.c_custkey
        |    WHERE c.c_nationkey = s.s_nationkey
        |      AND o.o_orderstatus = 'F' AND o.o_totalprice > 490000)
        |ORDER BY s_suppkey""".stripMargin,

    "q_date_arith" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
        |    AS month_start,
        |  count(*) AS n,
        |  min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
        |  date_diff('day', min(o_orderdate), max(o_orderdate)) AS span_days,
        |  strftime(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH,
        |    '%Y-%m-%d') AS next_month,
        |  strftime(last_day(max(o_orderdate)), '%Y-%m-%d') AS month_last_day,
        |  count(CASE WHEN dayofweek(o_orderdate) = 0 THEN 1 END) AS n_sunday
        |FROM orders GROUP BY date_trunc('month', o_orderdate)
        |ORDER BY month_start""".stripMargin,

    "q_group_by_all" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ALL ORDER BY ALL""".stripMargin,

    "q_inline_values" ->
      """SELECT v.label, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders o
        |JOIN (VALUES ('F', 'fulfilled'), ('O', 'open'), ('P', 'pending'))
        |  AS v(code, label)
        |  ON o.o_orderstatus = v.code
        |GROUP BY v.label ORDER BY v.label""".stripMargin,
  )
}
