package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream relational coverage beyond sessionization: JSON props,
  * per-minute load series (the reference's MLE Goal 1 feature/label table,
  * /root/reference/README.md:19), moving averages, as-of joins, and
  * per-user behavioral stats.
  */
object EventOps {

  private def events(s: SparkSession, dir: String) = Tables(s, dir, "events")

  /** JSON extraction from `props` (TESTDATA: `{"k": 87}`) — per-event-type
    * stats over the extracted value. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(avg(col("k")), 6).as("avg_k"))
      .orderBy(col("event_type"))

  /** Semi-structured `props` through Spark 4's VARIANT type: parse once
    * into the binary variant encoding, extract typed paths with
    * `variant_get` — the open-schema ingestion path when the JSON shape
    * is not known up front (vs the fixed-schema `from_json` of
    * q_json_schema). At 100 TB variant parses each value ONCE at ingest
    * into a shreddable binary form instead of re-parsing JSON text per
    * extraction. Same aggregate as q_json_extract, so the two paths
    * cross-check each other through the shared oracle shape. */
  def variantExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'long')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(avg(col("k")), 6).as("avg_k"))
      .orderBy(col("event_type"))

  /** XML through Spark 4's built-in XML support — the third
    * semi-structured path beside [[jsonExtract]]/[[variantExtract]]: each
    * event renders to an XML fragment with `to_xml` (the writer escapes
    * &, <, quotes — no fixture assumption about event_type's alphabet)
    * with the type in an ATTRIBUTE (the default `_` prefix marks
    * attribute fields on both the write and read side) and the id/k in
    * nested ELEMENTS, then `from_xml` parses it back under an explicit
    * schema. The aggregate re-derives the source columns, so attribute
    * parsing, element parsing, and integer text roundtrip are all
    * hash-gated against the base table. All-exact-integer outputs;
    * `from_xml` is a row-local scalar (no shuffle beyond the final
    * aggregate), so the 100 TB shape is identical to the JSON path. */
  def xmlRoundtrip(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("doc", expr(
        "to_xml(struct(event_type AS _type, event_id AS id, " +
          "CAST(get_json_object(props, '$.k') AS BIGINT) AS k))"))
      .withColumn("p",
        expr("from_xml(doc, '_type STRING, id BIGINT, k BIGINT')"))
      .groupBy(col("p._type").as("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("p.id")).as("sum_ids"),
        min(col("p.k")).as("min_k"),
        max(col("p.k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Tumbling 1-minute load series: requests per minute + req/sec — the
    * label series for "predict the expected load in the next minute"
    * (R:19). Minute boundary = date_trunc, emitted as epoch µs. */
  def loadPerMinute(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(unix_micros(date_trunc("minute", col("ts"))).as("minute_us"))
      .agg(count(lit(1)).as("requests"),
        countDistinct(col("user_id")).as("n_users"),
        round(count(lit(1)) / lit(60.0), 6).as("req_per_sec"))
      .orderBy(col("minute_us"))

  /** 5-minute moving average over the per-minute series (rows frame —
    * R:19 smoothing; lag-feature prep for the regression lives in
    * ml/Predict). */
  def slidingLoad(s: SparkSession, dir: String): DataFrame = {
    val perMin = events(s, dir)
      .groupBy(unix_micros(date_trunc("minute", col("ts"))).as("minute_us"))
      .agg(count(lit(1)).as("requests"))
    val w = Window.orderBy(col("minute_us")).rowsBetween(-4, 0)
    // RANGE frame over event-time µs: all minutes within the trailing 5
    // minutes of VALUE distance (robust to gaps, unlike the rows frame)
    val wr = Window.orderBy(col("minute_us"))
      .rangeBetween(-4L * 60 * 1000000, 0)
    perMin
      .select(col("minute_us"), col("requests"),
        round(avg(col("requests")).over(w), 6).as("ma5"),
        round(avg(col("requests")).over(wr), 6).as("ma5_range"),
        lead(col("requests"), 1).over(Window.orderBy(col("minute_us")))
          .as("next_requests"))
      .orderBy(col("minute_us"))
  }

  /** As-of join (SURVEY §2.3): each purchase event paired with the user's
    * most recent prior-or-same-time signup — the union-window trick
    * (`last(..., ignoreNulls)` over an unbounded-preceding frame), which
    * needs no native as-of operator and keeps one hash-by-user shuffle. */
  def asofSignup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("last_signup_us",
        last(when(col("event_type") === "signup", col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("last_signup_us"),
        (col("ts_us") - col("last_signup_us")).as("since_signup_us"))
      .orderBy(col("event_id"))
  }

  /** NEAREST-neighbor as-of (completing the family: [[asofSignup]] is
    * backward-≤, `q_asof_forward` is forward-≥, this picks whichever
    * signup is temporally CLOSER to each purchase, ties to the earlier
    * one — the sensor-fusion alignment rule when causality does not
    * dictate a direction): both directional candidates come from the
    * same ONE hash-by-user window exchange (last-before via a running
    * last, first-after via the mirrored frame), and the winner is a
    * per-row `least` on the absolute gaps — no second exchange, no
    * union. */
  def asofNearest(s: SparkSession, dir: String): DataFrame = {
    val back = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_signup_us",
        last(when(col("event_type") === "signup", col("ts_us")),
          ignoreNulls = true).over(back))
      .withColumn("next_signup_us",
        first(when(col("event_type") === "signup", col("ts_us")),
          ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "purchase")
      .withColumn("gap_prev", col("ts_us") - col("prev_signup_us"))
      .withColumn("gap_next", col("next_signup_us") - col("ts_us"))
      .withColumn("nearest_signup_us",
        when(col("prev_signup_us").isNull, col("next_signup_us"))
          .when(col("next_signup_us").isNull, col("prev_signup_us"))
          .when(col("gap_prev") <= col("gap_next"), col("prev_signup_us"))
          .otherwise(col("next_signup_us")))
      .withColumn("gap_us", least(
        coalesce(col("gap_prev"), col("gap_next")),
        coalesce(col("gap_next"), col("gap_prev"))))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("nearest_signup_us"), col("gap_us"))
      .orderBy(col("event_id"))
  }

  /** The SAME nearest-≤ join as [[asofSignup]], executed by the engine's
    * native [[graft.plans.AsOfJoinExec]] operator instead of the
    * union+window workaround: two co-partitioned sorted children, one
    * O(|L|+|R|) streaming merge per partition, one buffered candidate row
    * — no union materialization, no window frame. The oracle is DuckDB's
    * built-in ASOF LEFT JOIN, so the driver independently proves the
    * custom physical operator's semantics; equality with the window-trick
    * twin and the merge edge cases are pinned in AsOfJoinSpec. */
  def asofNative(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("r_user"),
        unix_micros(col("ts")).as("signup_us"))
    graft.plans.AsOfJoinOps.asofJoin(purchases, signups,
        Seq("user_id"), Seq("r_user"), "ts_us", "signup_us")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("signup_us").as("last_signup_us"),
        (col("ts_us") - col("signup_us")).as("since_signup_us"))
      .orderBy(col("event_id"))
  }

  /** FORWARD as-of through the same native operator: for each signup, the
    * user's NEXT purchase (nearest ≥) — time-to-activation at event grain.
    * Forward direction needs no candidate buffering at all (the first
    * unconsumed same-key right row is the answer); oracle is DuckDB's
    * ASOF LEFT JOIN with the inequality flipped. */
  def asofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        unix_micros(col("ts")).as("purchase_us"))
    graft.plans.AsOfJoinOps.asofJoin(signups, purchases,
        Seq("user_id"), Seq("p_user"), "ts_us", "purchase_us", forward = true)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("purchase_us").as("next_purchase_us"),
        (col("purchase_us") - col("ts_us")).as("wait_us"))
      .orderBy(col("event_id"))
  }

  /** Per-user behavioral profile: event counts by kind (conditional agg),
    * value stats. */
  def userStats(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        count(when(col("event_type") === "error", 1)).as("n_errors"),
        round(sum(col("value")), 4).as("total_value"),
        round(avg(col("value")), 6).as("avg_value"))
      .orderBy(col("user_id"))

  /** Distribution stats per event type: stddev + exact interpolated
    * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`). */
  def statsSummary(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(stddev_samp(col("value")), 6).as("sd_value"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"))
      .orderBy(col("event_type"))

  /** from_json with an explicit schema (vs get_json_object string paths):
    * typed struct access on the parsed column. */
  def jsonSchema(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))))
      .groupBy(pmod(col("p.k"), lit(10)).as("k_mod10"))
      .agg(count(lit(1)).as("n"), sum(col("p.k")).as("sum_k"))
      .orderBy(col("k_mod10"))

  /** MapType surface: props parsed as map<string,long> → map_keys /
    * element_at / explode-of-map (SURVEY §2.8 map family). */
  def jsonMap(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType)))
      .select(col("event_id"), explode(col("m")).as(Seq("key", "value")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .orderBy(col("key"))

  /** Gap-filled per-minute load (time-series resample): a minute spine
    * spans [min(ts), max(ts)] via sequence+explode, left-joined to the
    * observed per-minute counts, missing minutes coalesced to 0 — the
    * standard densify step before windowed/lag features (a lag over a
    * series with holes silently reads the wrong minute). The spine is
    * generated from a 1-row bounds aggregate (no driver collect) and the
    * join is minute-keyed — at scale the spine is tiny relative to events
    * and broadcasts; the expensive side stays a single hash aggregation. */
  def loadGapfill(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val bounds = ev.agg(
      date_trunc("minute", min(col("ts"))).as("t0"),
      date_trunc("minute", max(col("ts"))).as("t1"))
    val spine = bounds.select(
      explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 MINUTE")))
        .as("minute"))
    val counts = ev
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"))
    spine.join(counts, Seq("minute"), "left")
      .select(unix_micros(col("minute")).as("minute_us"),
        coalesce(col("n"), lit(0L)).as("requests"))
      .orderBy(col("minute_us"))
  }

  /** Linear interpolation over a sparse minute series (purchase-value
    * average): the densify-with-estimates step time-series features need
    * when zero-filling would bias a continuous signal. Spine join marks
    * holes; two frame-bounded windows carry the nearest known (minute,
    * value) point backward (LOCF) and forward (NOCB) as structs with
    * IGNORE NULLS, and holes between two known points get the exact
    * linear blend v_p + (v_n − v_p)·(t − t_p)/(t_n − t_p); leading/
    * trailing holes fall back to the single available neighbor. Known
    * values are rounded BEFORE blending so both engines interpolate
    * between identical endpoints, and the blend itself is EXACT INTEGER
    * arithmetic in micro-units — num = vpm·(n−k) + vnm·k with half-up
    * integer division (2·num + n) DIV (2·n); a float blend rounded to 6
    * decimals hash-mismatched on 7 of 43k rows because midpoints of 6-dp
    * endpoints sit exactly on the .5 rounding boundary, where Spark and
    * DuckDB disagree at the ulp. Magnitudes stay < 2^45 (value·1e6 ≤
    * ~5.6e8 × minutes ≤ 43200), far from BIGINT overflow. Aggregate-to-
    * grain first: the windows run over the bounded minute grain, never
    * raw events (the q_sliding_load posture). */
  def loadInterpolate(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).filter(col("event_type") === "purchase")
    val bounds = ev.agg(
      date_trunc("minute", min(col("ts"))).as("t0"),
      date_trunc("minute", max(col("ts"))).as("t1"))
    val spine = bounds.select(
      explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 MINUTE")))
        .as("minute"))
    val c = ev.groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(round(avg(col("value")), 6).as("v"))
    val j = spine.join(c, Seq("minute"), "left")
      .select(unix_micros(col("minute")).as("mu"), col("v"))
    val known = when(col("v").isNotNull, struct(col("mu"), col("v")))
    val wPrev = Window.orderBy(col("mu"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy(col("mu"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    j.withColumn("p", last(known, ignoreNulls = true).over(wPrev))
      .withColumn("nx", first(known, ignoreNulls = true).over(wNext))
      .withColumn("vpm", round(col("p.v") * 1e6).cast("long"))
      .withColumn("vnm", round(col("nx.v") * 1e6).cast("long"))
      .withColumn("k", ((col("mu") - col("p.mu")) / lit(60000000L)).cast("long"))
      .withColumn("n", ((col("nx.mu") - col("p.mu")) / lit(60000000L)).cast("long"))
      .select(col("mu").as("minute_us"),
        when(col("v").isNotNull, round(col("v") * 1e6).cast("long"))
          .when(col("p").isNotNull && col("nx").isNotNull,
            expr("(2 * (vpm * (n - k) + vnm * k) + n) DIV (2 * n)"))
          .otherwise(coalesce(col("vpm"), col("vnm")))
          .as("value_micro"),
        col("v").isNull.as("was_hole"))
      .orderBy(col("minute_us"))
  }

  /** CDC-style latest-record-per-key dedup: the newest event per
    * (user_id, event_type), ties broken by event_id — the "current state
    * from an append-only changelog" query every warehouse materializes.
    * row_number over the composite key partition keeps exactly one row;
    * the key partitioning is the natural shuffle (no global sort, no
    * single-partition window), and at 100 TB this is the shape compaction
    * jobs run per micro-batch. */
  def latestPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Native ordered string aggregation (Spark 4 `listagg ... WITHIN GROUP`):
    * per-user event path in strict (ts, event_id) order. Same semantic
    * family as q_top_paths' ordered-window collect_list, but through the
    * analyzer's ordered-aggregate surface — one hash aggregate, no window
    * pass; DuckDB's `string_agg(... ORDER BY ...)` is the exact twin.
    * Output length is bounded by events-per-user, not corpus size. */
  def listaggPaths(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).createOrReplaceTempView("events_v")
    s.sql(
      """SELECT user_id,
        |  listagg(event_type, '>') WITHIN GROUP (ORDER BY ts, event_id)
        |    AS path,
        |  count(*) AS n
        |FROM events_v GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  /** Exact median + deterministic mode per group (Spark 4 `median`,
    * `mode() WITHIN GROUP`). Ties in mode resolve to the SMALLEST value
    * (ASC within-group order); the oracle spells the same tie-break as
    * (count DESC, value ASC) LIMIT 1 — verified equivalent on all-tied
    * groups. Both are single-pass aggregates; median sorts within the
    * hash-aggregate buffer, bounded per group. */
  def modeMedian(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).createOrReplaceTempView("events_v")
    s.sql(
      """SELECT event_type,
        |  round(median(value), 6) AS med_value,
        |  mode() WITHIN GROUP (ORDER BY user_id % 100) AS mode_bucket,
        |  count(*) AS n
        |FROM events_v GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** URL canonicalization via native `parse_url` (host / path / single
    * query param) — the normalization step before per-URL dedup of a web
    * corpus. URLs are derived deterministically from event columns so the
    * DuckDB oracle can rebuild the identical strings and extract the same
    * components with regexes — parse_url semantics vs a regex spelling is
    * exactly the drift this pins. Pure map stage + one bounded-key agg. */
  def urlParse(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("url", concat(lit("https://"), col("event_type"),
        lit(".example.com/u/"), (col("user_id") % 50).cast("string"),
        lit("/item?ref="), (col("event_id") % 7).cast("string"),
        lit("&v="), (col("event_id") % 3).cast("string")))
      .select(
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'ref')").as("ref"))
      .groupBy(col("host"), col("path"), col("ref"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("host"), col("path"), col("ref"))

  /** URL canonicalization — the crawl-dedup front door (every CommonCrawl
    * -scale pipeline dedups by canonical URL before touching content):
    * noisy variants are minted deterministically from the base fields
    * (scheme/host case, an explicit `:443` default port, `utm_*`/`gclid`
    * tracking params, a fragment, shuffled param order), then normalized
    * with engine primitives — `parse_url` components, lowercased
    * scheme/host (port dropped by HOST extraction), fragment dropped by
    * QUERY extraction, tracking params removed with a `filter` HOF,
    * surviving params re-sorted with `array_sort`. The oracle re-derives
    * the canonical form DEFINITIONALLY from the base fields and rebuilds
    * the noisy strings to count variants, so Spark's parse_url semantics
    * and the HOF pipeline are hash-gated against ground truth. Pure
    * row-local string work until one grouped pass. */
  def urlCanon(s: SparkSession, dir: String): DataFrame = {
    val noisy = events(s, dir)
      .select(col("event_id").as("e"), col("user_id").as("u"),
        col("event_type").as("t"))
      .withColumn("url", concat(
        when(col("e") % 2 === 0, lit("HTTPS")).otherwise(lit("https")),
        lit("://"),
        when(col("u") % 3 === 0, upper(col("t"))).otherwise(col("t")),
        when(col("u") % 3 === 0, lit(".EXAMPLE.COM")).otherwise(lit(".example.com")),
        when(col("e") % 5 === 0, lit(":443")).otherwise(lit("")),
        lit("/u/"), (col("u") % 50).cast("string"), lit("/item?"),
        when(col("e") % 2 === 1,
          concat(lit("v="), (col("e") % 3).cast("string"),
            lit("&ref="), (col("e") % 7).cast("string")))
          .otherwise(concat(lit("ref="), (col("e") % 7).cast("string"),
            lit("&v="), (col("e") % 3).cast("string"))),
        when(col("e") % 3 === 0, lit("&utm_source=feed")).otherwise(lit("")),
        when(col("e") % 7 === 0, lit("&gclid=Zx9")).otherwise(lit("")),
        when(col("e") % 11 === 0, lit("#s2")).otherwise(lit(""))))
    noisy
      .withColumn("params", expr(
        // startswith, not LIKE 'utm_%' — '_' is a single-char LIKE
        // wildcard, so the LIKE spelling would also strip e.g. 'utms='
        "filter(split(parse_url(url, 'QUERY'), '&'), p -> NOT (" +
          "startswith(p, 'utm_') OR p LIKE 'gclid=%' OR p LIKE 'fbclid=%'))"))
      .withColumn("canonical_url", concat(
        lower(expr("parse_url(url, 'PROTOCOL')")), lit("://"),
        lower(expr("parse_url(url, 'HOST')")),
        expr("parse_url(url, 'PATH')"), lit("?"),
        expr("array_join(array_sort(params), '&')")))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("url")).as("n_variants"))
      .orderBy(col("canonical_url"))
  }

  /** Map higher-order functions as the per-user behavior profile:
    * counts → map_from_entries → aggregate (map-total) → transform_values
    * (normalize to shares) → map_filter (keep dominant slices ≥ 25 %) →
    * explode back to rows. The oracle computes the same relation with a
    * window sum — the HOF pipeline must agree with its relational
    * spelling. Map width is bounded by |event_types| (5), so the per-row
    * maps never grow with corpus size. */
  def mapFuncs(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt"))))
        .as("m"))
      .withColumn("tot", expr("aggregate(map_values(m), 0L, (a, x) -> a + x)"))
      .withColumn("shares",
        expr("transform_values(m, (k, v) -> round(CAST(v AS DOUBLE) / tot, 6))"))
      .withColumn("kept", expr("map_filter(shares, (k, v) -> v >= 0.25)"))
      .select(col("user_id"), explode(col("kept")).as(Seq("event_type", "share")))
      .orderBy(col("user_id"), col("event_type"))

  /** ANSI ordered-set aggregates (percentile_cont / percentile_disc
    * WITHIN GROUP) — the standard spelling next to the existing
    * `percentile()` calls; the IDENTICAL text runs on both engines.
    * percentile_disc returns the smallest value whose cume_dist reaches
    * the fraction (an actual data value, not an interpolation). */
  def percentileSql(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).createOrReplaceTempView("events_v")
    s.sql(
      """SELECT event_type,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY value), 6)
        |    AS p25,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6)
        |    AS p50,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90_disc,
        |  count(*) AS n
        |FROM events_v GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Array SET operations (intersect / except / contains) over per-user
    * collected type sets. Outputs are join-to-csv strings with BOTH sides
    * sorted — Spark's array_intersect preserves left-operand order while
    * DuckDB's list_intersect does not define one, so sort-then-join is
    * the portable spelling. Map-side agg then pure projection. */
  def arrayOps(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("types"))
      .select(col("user_id"),
        array_join(sort_array(array_intersect(col("types"),
          array(lit("click"), lit("purchase"), lit("view")))), ",").as("commerce"),
        array_join(sort_array(array_except(col("types"),
          array(lit("error")))), ",").as("non_error"),
        array_contains(col("types"), "error").as("had_error"),
        size(col("types")).cast("long").as("n_types"))
      .orderBy(col("user_id"))

  /** Argmin/argmax aggregates (min_by / max_by — DuckDB arg_min/arg_max):
    * which event type carried each user's smallest/largest value. The
    * ordering key is value widened with event_id into a unique BIGINT so
    * ties are deterministic on both engines (bare min_by picks an
    * arbitrary row among equal values; DuckDB's min_by rejects struct
    * keys, so a composite struct ordering isn't portable). The 1e12
    * multiplier keeps the key value-ordered while event_id < 1e12 (about
    * 100 TB of events) without overflowing: |round(value*1000)| * 1e12
    * stays under Long.MaxValue for |value| <= 9.2e3, and EventOpsSpec
    * pins both fixture bounds. Single hash aggregate. */
  def minMaxBy(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).createOrReplaceTempView("events_v")
    s.sql(
      """SELECT user_id,
        |  min_by(event_type, CAST(round(value * 1000) AS BIGINT) * 1000000000000
        |    + event_id) AS cheapest_type,
        |  max_by(event_type, CAST(round(value * 1000) AS BIGINT) * 1000000000000
        |    + event_id) AS priciest_type,
        |  round(min(value), 6) AS min_value,
        |  round(max(value), 6) AS max_value
        |FROM events_v GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  /** Error-safe arithmetic (try_divide / try_cast): malformed input
    * degrades to NULL instead of failing the job — the ANSI-mode-safe
    * posture a 100 TB ingest needs (one bad row must not kill a stage).
    * The zero-denominator and unparseable-cast rows are derived
    * deterministically; DuckDB spells try_divide as x / nullif(y, 0). */
  def tryFuncs(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).createOrReplaceTempView("events_v")
    s.sql(
      """SELECT event_type,
        |  count(try_divide(value, user_id % 3)) AS n_divisible,
        |  round(sum(try_divide(value, user_id % 3)), 4) AS sum_ratio,
        |  count(try_cast(substring(props, 7, 2) AS BIGINT)) AS n_parsed
        |FROM events_v GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Bitwise aggregates (bit_and / bit_or / bit_xor) — the xor-checksum
    * idiom (order-independent content signature) as a first-class query.
    * Single hash aggregate, map-side combinable. */
  def bitAggs(s: SparkSession, dir: String): DataFrame = {
    events(s, dir).createOrReplaceTempView("events_v")
    s.sql(
      """SELECT event_type,
        |  bit_and(user_id % 256) AS band,
        |  bit_or(user_id % 256) AS bor,
        |  bit_xor(event_id) AS checksum
        |FROM events_v GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Incremental aggregate maintenance (the materialized-view refresh
    * shape): algebraic per-type aggregate STATE (count/sum/min/max) built
    * from events before the cutoff day, a DELTA from the cutoff day on,
    * and the merged view state ⊕ delta — count adds, sum adds, min/max
    * fold, avg derives from merged sum/count. A full-outer merge keeps
    * types that exist on only one side. `matches_full` re-derives the same
    * aggregate from scratch and compares at the rounded precision — the
    * refresh-correctness audit a production MV pipeline runs on samples.
    * At 100 TB only the DELTA is scanned per refresh; state is
    * group-cardinality-sized. */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val cutoff = "2024-01-25"
    def aggOf(df: DataFrame, pfx: String): DataFrame =
      df.groupBy(col("event_type"))
        .agg(count(lit(1)).as(s"${pfx}_cnt"), sum(col("value")).as(s"${pfx}_sum"),
          min(col("value")).as(s"${pfx}_min"), max(col("value")).as(s"${pfx}_max"))
    val e = events(s, dir)
    val state = aggOf(e.filter(col("ts") < lit(cutoff).cast("timestamp")), "s")
    val delta = aggOf(e.filter(col("ts") >= lit(cutoff).cast("timestamp")), "d")
    val merged = state.join(delta, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("s_cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("m_cnt"),
        (coalesce(col("s_sum"), lit(0.0)) + coalesce(col("d_sum"), lit(0.0)))
          .as("m_sum"),
        least(col("s_min"), col("d_min")).as("m_min"),
        greatest(col("s_max"), col("d_max")).as("m_max"))
    val full = aggOf(e, "f")
    merged.join(full, "event_type")
      .select(col("event_type"), col("m_cnt").as("merged_cnt"),
        round(col("m_sum"), 6).as("merged_sum"),
        round(col("m_min"), 6).as("merged_min"),
        round(col("m_max"), 6).as("merged_max"),
        round(col("m_sum") / col("m_cnt"), 6).as("merged_avg"),
        (col("m_cnt") === col("f_cnt") &&
          round(col("m_sum"), 4) === round(col("f_sum"), 4) &&
          col("m_min") === col("f_min") && col("m_max") === col("f_max"))
          .as("matches_full"))
      .orderBy(col("event_type"))
  }

  /** Interval-overlap join: 30-minute-gap user sessions against the
    * recurring 2-hour maintenance windows (00/06/12/18 UTC daily),
    * reporting overlap seconds per (session, window). The join is
    * BUCKETED, not theta: each session explodes into the hour buckets it
    * spans (bounded — sessions are gap-bounded), each window into its two
    * hours, and candidates meet on an (hour-bucket) EQUI join, with the
    * exact overlap predicate verifying after — the standard way to run
    * interval joins at scale without an O(N·M) nested-loop. DISTINCT
    * collapses sessions matching a window in both its hours. The oracle
    * spells the same result as the direct theta join, proving the
    * bucketed plan ≡ the naive one. */
  def intervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600000000L // all instants in exact integer microseconds
    val gapW = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = events(s, dir)
      .withColumn("pts", lag(col("ts"), 1).over(gapW))
      .withColumn("brk",
        when(col("pts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("pts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        gapW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(unix_micros(col("ts"))).as("ss"),
        max(unix_micros(col("ts"))).as("es"))
    // recurring maintenance windows over the days the data spans
    val windows = events(s, dir)
      .select(date_trunc("day", col("ts")).as("day")).distinct()
      .select(col("day"), explode(expr("array(0L, 6L, 12L, 18L)")).as("wh"))
      .select(
        concat(date_format(col("day"), "yyyy-MM-dd"), lit("T"),
          lpad(col("wh").cast("string"), 2, "0")).as("window_id"),
        (unix_micros(col("day")) + col("wh") * hourUs).as("ws"),
        (unix_micros(col("day")) + (col("wh") + 2L) * hourUs).as("we"))
    // bucket both sides by hour: sessions span few buckets (gap-bounded),
    // windows exactly two — candidates meet on an hour-bucket EQUI join
    val sessB = sess.withColumn("hb",
      explode(sequence(expr(s"ss div $hourUs"), expr(s"es div $hourUs"))))
    val winB = windows.withColumn("hb",
      explode(sequence(expr(s"ws div $hourUs"), expr(s"(we - 1) div $hourUs"))))
    sessB.join(winB, "hb")
      .filter(col("ss") < col("we") && col("es") > col("ws"))
      .select(col("user_id"), col("sid"), col("window_id"),
        col("ss"), col("es"), col("ws"), col("we")).distinct()
      .select(col("user_id"), col("sid"), col("window_id"),
        round((least(col("es"), col("we")) - greatest(col("ss"), col("ws")))
          / 1000000.0, 6).as("overlap_s"))
      .orderBy(col("user_id"), col("sid"), col("window_id"))
  }

  /** Dynamic-time-warping distance (Sakoe–Chiba '78, full window) between
    * every pair of event types' load curves — the sequence-alignment
    * operator behind curve clustering / anomaly matching, under the exact
    * hash oracle. Each type's per-bucket count series (32 equal-width
    * buckets over the global span — integer arithmetic, so the series is
    * exact on both engines) is aligned with |a−b| step cost.
    *
    * The DP is evaluated WITHOUT an unrolled per-row loop: the classic
    * recurrence dp[i][j] = c_ij + min(dp[i−1][j], dp[i−1][j−1],
    * dp[i][j−1]) has the min-plus prefix-scan form
    *   row_i[j] = P[j] + min_{k≤j}( min(prev[k−1], prev[k]) − P[k−1] )
    * (P = prefix sums of row i's costs; proof by induction on j, the
    * running-min absorbs the row-internal dependency). That makes each
    * row a pure per-element lambda, so the WHOLE DP is one fixed-size
    * `aggregate` fold over i — no 32-step plan unrolling whose collapsed
    * projection would blow up exponentially, and the same shape mirrors
    * to DuckDB as a recursive CTE (one recursion level per i). Work is
    * O(T³) per pair with T = 32 — constant per pair, rows = pair count.
    * The no-warp L1 distance rides along; DTW ≤ L1 everywhere is the
    * semantic sanity the spec pins. */
  def dtwLoad(s: SparkSession, dir: String): DataFrame = {
    val T = 32
    val inf = "cast(1000000000000000 as bigint)"
    val ev = events(s, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val bnds = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    val cnts = ev.crossJoin(broadcast(bnds))
      .select(col("event_type"),
        expr(s"((us - mn) * $T) div (mx - mn + 1)").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val grid = ev.select(col("event_type")).distinct()
      .select(col("event_type"),
        explode(sequence(lit(0L), lit(T - 1L))).as("bucket"))
    val series = grid.join(cnts, Seq("event_type", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col("event_type"))
      .agg(expr("transform(sort_array(collect_list(struct(bucket, cnt))), x -> x.cnt)")
        .as("v"))
    val pairs = series.as("a")
      .join(series.as("b"), col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("et_a"), col("b.event_type").as("et_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
    // cost prefix-sum P(x) recomputed inline (expressions have no lets;
    // recomputation keeps the tree fixed-size, runtime stays O(T³)/pair)
    def pv(upTo: String, m: String, acc: String, x: String) =
      s"""aggregate(slice(transform(sequence(1, $T),
         |  $m -> abs(element_at(va, i) - element_at(vb, $m))), 1, $upTo),
         |  cast(0 as bigint), ($acc, $x) -> $acc + $x)""".stripMargin
    val dtw =
      s"""aggregate(sequence(1, $T),
         |  concat(array(cast(0 as bigint)), transform(sequence(1, $T), z -> $inf)),
         |  (prev, i) -> concat(array($inf),
         |    transform(sequence(1, $T), j ->
         |      ${pv("j", "m", "a", "x")}
         |      + array_min(transform(sequence(1, j), k ->
         |          least(element_at(prev, k), element_at(prev, k + 1)) -
         |          IF(k = 1, cast(0 as bigint), ${pv("k - 1", "m2", "a2", "x2")}))))),
         |  fin -> element_at(fin, ${T + 1}))""".stripMargin
    pairs
      .select(col("et_a"), col("et_b"), expr(dtw).as("dtw"),
        expr(s"""aggregate(transform(sequence(1, $T),
           | j -> abs(element_at(va, j) - element_at(vb, j))),
           | cast(0 as bigint), (a, x) -> a + x)""".stripMargin).as("l1"))
      .orderBy(col("et_a"), col("et_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dtw_load" -> (dtwLoad _),
    "q_incremental_agg" -> (incrementalAgg _),
    "q_interval_overlap" -> (intervalOverlap _),
    "q_try_funcs" -> (tryFuncs _),
    "q_bit_aggs" -> (bitAggs _),
    "q_minmax_by" -> (minMaxBy _),
    "q_array_ops" -> (arrayOps _),
    "q_percentile_sql" -> (percentileSql _),
    "q_latest_per_key" -> (latestPerKey _),
    "q_json_extract" -> (jsonExtract _),
    "q_variant_extract" -> (variantExtract _),
    "q_xml_roundtrip" -> (xmlRoundtrip _),
    "q_url_canon" -> (urlCanon _),
    "q_load_per_minute" -> (loadPerMinute _),
    "q_sliding_load" -> (slidingLoad _),
    "q_asof_signup" -> (asofSignup _),
    "q_asof_nearest" -> (asofNearest _),
    "q_asof_native" -> (asofNative _),
    "q_asof_forward" -> (asofForward _),
    "q_user_stats" -> (userStats _),
    "q_stats_summary" -> (statsSummary _),
    "q_json_schema" -> (jsonSchema _),
    "q_json_map" -> (jsonMap _),
    "q_load_gapfill" -> (loadGapfill _),
    "q_load_interpolate" -> (loadInterpolate _),
    "q_listagg" -> (listaggPaths _),
    "q_mode_median" -> (modeMedian _),
    "q_url_parse" -> (urlParse _),
    "q_map_funcs" -> (mapFuncs _),
  )

  val oracleSql: Map[String, String] = Map(
    // recursive CTE = the same min-plus prefix-scan DP, one recursion
    // level per series index i (DuckDB identifiers are case-insensitive:
    // cv/pv/gv must stay distinct names, not cv/Cv)
    "q_dtw_load" ->
      """WITH RECURSIVE
        |bnds AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events),
        |bucketed AS (
        |  SELECT event_type, ((epoch_us(ts) - mn) * 32) // (mx - mn + 1) AS bucket
        |  FROM events, bnds),
        |cnts AS (SELECT event_type, bucket, count(*) AS cnt FROM bucketed GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, g.bucket
        |  FROM (SELECT DISTINCT event_type FROM events) t,
        |       (SELECT unnest(range(32)) AS bucket) g),
        |dense AS (
        |  SELECT grid.event_type, grid.bucket, coalesce(cnts.cnt, 0) AS cnt
        |  FROM grid LEFT JOIN cnts
        |    ON grid.event_type = cnts.event_type AND grid.bucket = cnts.bucket),
        |series AS (SELECT event_type, list(cnt ORDER BY bucket) AS v FROM dense GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS et_a, b.event_type AS et_b, a.v AS va, b.v AS vb
        |  FROM series a JOIN series b ON a.event_type < b.event_type),
        |dp AS (
        |  SELECT et_a, et_b, va, vb, 0 AS i,
        |    list_prepend(0::BIGINT, list_transform(range(32), x -> 1000000000000000::BIGINT)) AS row
        |  FROM pairs
        |  UNION ALL
        |  SELECT et_a, et_b, va, vb, i + 1,
        |    list_prepend(1000000000000000::BIGINT,
        |      list_transform(range(1, 33), j -> pv[j] + list_min(gv[1:j]))) AS row
        |  FROM (
        |    SELECT *, list_transform(range(1, 33),
        |        k -> least(row[k], row[k + 1]) -
        |             CASE WHEN k = 1 THEN 0 ELSE pv[k - 1] END) AS gv
        |    FROM (
        |      SELECT *, list_transform(range(1, 33),
        |          j -> CAST(list_sum(cv[1:j]) AS BIGINT)) AS pv
        |      FROM (
        |        SELECT *, list_transform(range(1, 33),
        |            j -> abs(va[i + 1] - vb[j])) AS cv
        |        FROM dp WHERE i < 32) q1) q2) q3)
        |SELECT et_a, et_b, CAST(row[33] AS BIGINT) AS dtw,
        |  CAST(list_sum(list_transform(range(1, 33), j -> abs(va[j] - vb[j]))) AS BIGINT) AS l1
        |FROM dp WHERE i = 32
        |ORDER BY et_a, et_b""".stripMargin,

    "q_incremental_agg" ->
      """WITH state AS (
        |  SELECT event_type, count(*) AS s_cnt, sum(value) AS s_sum,
        |         min(value) AS s_min, max(value) AS s_max
        |  FROM events WHERE ts < TIMESTAMP '2024-01-25' GROUP BY 1),
        |delta AS (
        |  SELECT event_type, count(*) AS d_cnt, sum(value) AS d_sum,
        |         min(value) AS d_min, max(value) AS d_max
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-25' GROUP BY 1),
        |merged AS (
        |  SELECT coalesce(state.event_type, delta.event_type) AS event_type,
        |    coalesce(s_cnt, 0) + coalesce(d_cnt, 0) AS m_cnt,
        |    coalesce(s_sum, 0.0) + coalesce(d_sum, 0.0) AS m_sum,
        |    least(s_min, d_min) AS m_min, greatest(s_max, d_max) AS m_max
        |  FROM state FULL JOIN delta ON state.event_type = delta.event_type),
        |fl AS (
        |  SELECT event_type, count(*) AS f_cnt, sum(value) AS f_sum,
        |         min(value) AS f_min, max(value) AS f_max
        |  FROM events GROUP BY 1)
        |SELECT m.event_type, CAST(m_cnt AS BIGINT) AS merged_cnt,
        |  round(m_sum, 6) AS merged_sum, round(m_min, 6) AS merged_min,
        |  round(m_max, 6) AS merged_max,
        |  round(m_sum / m_cnt, 6) AS merged_avg,
        |  (m_cnt = f_cnt AND round(m_sum, 4) = round(f_sum, 4)
        |    AND m_min = f_min AND m_max = f_max) AS matches_full
        |FROM merged m JOIN fl ON m.event_type = fl.event_type
        |ORDER BY m.event_type""".stripMargin,

    "q_interval_overlap" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN pts IS NULL
        |      OR epoch_us(ts) - epoch_us(pts) > 1800000000 THEN 1 ELSE 0 END
        |      AS brk
        |  FROM o),
        |numbered AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m),
        |sess AS (
        |  SELECT user_id, CAST(sid AS BIGINT) AS sid,
        |    min(epoch_us(ts)) AS ss, max(epoch_us(ts)) AS es
        |  FROM numbered GROUP BY 1, 2),
        |wins AS (
        |  SELECT strftime(day, '%Y-%m-%d') || 'T' || lpad(CAST(wh AS VARCHAR), 2, '0')
        |      AS window_id,
        |    epoch_us(day) + wh * 3600000000 AS ws,
        |    epoch_us(day) + (wh + 2) * 3600000000 AS we
        |  FROM (SELECT DISTINCT date_trunc('day', ts) AS day FROM events)
        |  CROSS JOIN (SELECT unnest([0, 6, 12, 18]) AS wh))
        |SELECT user_id, sid, window_id,
        |  round((least(es, we) - greatest(ss, ws)) / 1000000.0, 6) AS overlap_s
        |FROM sess JOIN wins ON ss < we AND es > ws
        |ORDER BY user_id, sid, window_id""".stripMargin,

    "q_latest_per_key" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, ts_us, value
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the VARIANT path must agree with plain JSON-text extraction
    "q_variant_extract" ->
      """SELECT event_type, count(*) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // canonical form re-derived definitionally from the base fields; the
    // noisy strings are rebuilt only to count variants per canonical URL
    "q_url_canon" ->
      """WITH b AS (
        |  SELECT event_id AS e, user_id AS u, event_type AS t FROM events),
        |noisy AS (
        |  SELECT e, u, t,
        |    (CASE WHEN e % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
        |    || '://'
        |    || (CASE WHEN u % 3 = 0 THEN upper(t) || '.EXAMPLE.COM'
        |             ELSE t || '.example.com' END)
        |    || (CASE WHEN e % 5 = 0 THEN ':443' ELSE '' END)
        |    || '/u/' || CAST(u % 50 AS VARCHAR) || '/item?'
        |    || (CASE WHEN e % 2 = 1
        |          THEN 'v=' || CAST(e % 3 AS VARCHAR)
        |            || '&ref=' || CAST(e % 7 AS VARCHAR)
        |          ELSE 'ref=' || CAST(e % 7 AS VARCHAR)
        |            || '&v=' || CAST(e % 3 AS VARCHAR) END)
        |    || (CASE WHEN e % 3 = 0 THEN '&utm_source=feed' ELSE '' END)
        |    || (CASE WHEN e % 7 = 0 THEN '&gclid=Zx9' ELSE '' END)
        |    || (CASE WHEN e % 11 = 0 THEN '#s2' ELSE '' END) AS url
        |  FROM b)
        |SELECT 'https://' || t || '.example.com/u/' || CAST(u % 50 AS VARCHAR)
        |    || '/item?ref=' || CAST(e % 7 AS VARCHAR)
        |    || '&v=' || CAST(e % 3 AS VARCHAR) AS canonical_url,
        |  count(*) AS n_events,
        |  count(DISTINCT url) AS n_variants
        |FROM noisy GROUP BY 1 ORDER BY canonical_url""".stripMargin,

    // the XML attribute/element parse must agree with the base columns
    "q_xml_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_ids,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_load_gapfill" ->
      """WITH b AS (SELECT date_trunc('minute', min(ts)) AS t0,
        |                  date_trunc('minute', max(ts)) AS t1 FROM events),
        |spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS minute
        |          FROM b),
        |c AS (SELECT date_trunc('minute', ts) AS minute, count(*) AS n
        |      FROM events GROUP BY 1)
        |SELECT epoch_us(spine.minute) AS minute_us,
        |       CAST(COALESCE(c.n, 0) AS BIGINT) AS requests
        |FROM spine LEFT JOIN c ON spine.minute = c.minute
        |ORDER BY minute_us""".stripMargin,

    "q_load_interpolate" ->
      """WITH b AS (SELECT date_trunc('minute', min(ts)) AS t0,
        |                  date_trunc('minute', max(ts)) AS t1
        |           FROM events WHERE event_type = 'purchase'),
        |spine AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS minute
        |          FROM b),
        |c AS (SELECT date_trunc('minute', ts) AS minute, round(avg(value), 6) AS v
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |j AS (SELECT epoch_us(spine.minute) AS mu, c.v
        |      FROM spine LEFT JOIN c ON spine.minute = c.minute),
        |w AS (SELECT mu, v,
        |  last_value(CASE WHEN v IS NOT NULL
        |                  THEN struct_pack(mu := mu, v := v) END IGNORE NULLS)
        |    OVER (ORDER BY mu ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
        |  first_value(CASE WHEN v IS NOT NULL
        |                   THEN struct_pack(mu := mu, v := v) END IGNORE NULLS)
        |    OVER (ORDER BY mu ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        |  FROM j),
        |m AS (SELECT mu, v,
        |  CAST(round(p.v * 1e6) AS BIGINT) AS vpm,
        |  CAST(round(nx.v * 1e6) AS BIGINT) AS vnm,
        |  CAST((mu - p.mu) / 60000000 AS BIGINT) AS k,
        |  CAST((nx.mu - p.mu) / 60000000 AS BIGINT) AS n,
        |  p IS NOT NULL AS hasp, nx IS NOT NULL AS hasn
        |  FROM w)
        |SELECT mu AS minute_us,
        |  CASE WHEN v IS NOT NULL THEN CAST(round(v * 1e6) AS BIGINT)
        |       WHEN hasp AND hasn
        |       THEN (2 * (vpm * (n - k) + vnm * k) + n) // (2 * n)
        |       ELSE coalesce(vpm, vnm) END AS value_micro,
        |  v IS NULL AS was_hole
        |FROM m ORDER BY minute_us""".stripMargin,

    "q_load_per_minute" ->
      """SELECT epoch_us(date_trunc('minute', ts)) AS minute_us,
        |  count(*) AS requests,
        |  count(DISTINCT user_id) AS n_users,
        |  round(count(*) / 60.0, 6) AS req_per_sec
        |FROM events GROUP BY 1 ORDER BY minute_us""".stripMargin,

    "q_sliding_load" ->
      """WITH pm AS (
        |  SELECT epoch_us(date_trunc('minute', ts)) AS minute_us, count(*) AS requests
        |  FROM events GROUP BY 1)
        |SELECT minute_us, requests,
        |  round(avg(requests) OVER (ORDER BY minute_us
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS ma5,
        |  round(avg(requests) OVER (ORDER BY minute_us
        |    RANGE BETWEEN 240000000 PRECEDING AND CURRENT ROW), 6) AS ma5_range,
        |  lead(requests, 1) OVER (ORDER BY minute_us) AS next_requests
        |FROM pm ORDER BY minute_us""".stripMargin,

    "q_asof_signup" ->
      """WITH t AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |    last_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_us
        |  FROM events)
        |SELECT event_id, user_id, ts_us, last_signup_us,
        |       ts_us - last_signup_us AS since_signup_us
        |FROM t WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_asof_nearest" ->
      """WITH t AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |    last_value(CASE WHEN event_type = 'signup'
        |      THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS prev_signup_us,
        |    first_value(CASE WHEN event_type = 'signup'
        |      THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS next_signup_us
        |  FROM events),
        |p AS (
        |  SELECT event_id, user_id, ts_us,
        |    ts_us - prev_signup_us AS gap_prev,
        |    next_signup_us - ts_us AS gap_next,
        |    prev_signup_us, next_signup_us
        |  FROM t WHERE event_type = 'purchase')
        |SELECT event_id, user_id, ts_us,
        |  CASE WHEN prev_signup_us IS NULL THEN next_signup_us
        |       WHEN next_signup_us IS NULL THEN prev_signup_us
        |       WHEN gap_prev <= gap_next THEN prev_signup_us
        |       ELSE next_signup_us END AS nearest_signup_us,
        |  least(coalesce(gap_prev, gap_next),
        |        coalesce(gap_next, gap_prev)) AS gap_us
        |FROM p ORDER BY event_id""".stripMargin,

    "q_asof_native" ->
      """SELECT event_id, user_id, ts_us, last_signup_us,
        |  ts_us - last_signup_us AS since_signup_us
        |FROM (
        |  SELECT l.event_id, l.user_id, l.ts_us, r.signup_us AS last_signup_us
        |  FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |        FROM events WHERE event_type = 'purchase') l
        |  ASOF LEFT JOIN (SELECT user_id AS r_user, epoch_us(ts) AS signup_us
        |                  FROM events WHERE event_type = 'signup') r
        |    ON l.user_id = r.r_user AND l.ts_us >= r.signup_us)
        |ORDER BY event_id""".stripMargin,

    "q_asof_forward" ->
      """SELECT event_id, user_id, ts_us, next_purchase_us,
        |  next_purchase_us - ts_us AS wait_us
        |FROM (
        |  SELECT l.event_id, l.user_id, l.ts_us,
        |    r.purchase_us AS next_purchase_us
        |  FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |        FROM events WHERE event_type = 'signup') l
        |  ASOF LEFT JOIN (SELECT user_id AS p_user, epoch_us(ts) AS purchase_us
        |                  FROM events WHERE event_type = 'purchase') r
        |    ON l.user_id = r.p_user AND l.ts_us <= r.purchase_us)
        |ORDER BY event_id""".stripMargin,

    "q_stats_summary" ->
      """SELECT event_type, count(*) AS n,
        |  round(stddev_samp(value), 6) AS sd_value,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_json_schema" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod10,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY k_mod10""".stripMargin,

    // json_each (table fn) is absent in the oracle's DuckDB build;
    // json_keys + dynamic-path extraction is equivalent
    "q_json_map" ->
      """WITH keys AS (
        |  SELECT event_id, props, unnest(json_keys(props)) AS key FROM events)
        |SELECT key, count(*) AS n,
        |  min(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS min_v,
        |  max(CAST(json_extract_string(props, '$.' || key) AS BIGINT)) AS max_v
        |FROM keys GROUP BY key ORDER BY key""".stripMargin,

    "q_user_stats" ->
      """SELECT user_id, count(*) AS n_events,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
        |  round(sum(value), 4) AS total_value,
        |  round(avg(value), 6) AS avg_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_try_funcs" ->
      """SELECT event_type,
        |  count(value / nullif(user_id % 3, 0)) AS n_divisible,
        |  round(sum(value / nullif(user_id % 3, 0)), 4) AS sum_ratio,
        |  count(try_cast(substring(props, 7, 2) AS BIGINT)) AS n_parsed
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_bit_aggs" ->
      """SELECT event_type,
        |  bit_and(user_id % 256) AS band,
        |  bit_or(user_id % 256) AS bor,
        |  bit_xor(event_id) AS checksum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_minmax_by" ->
      """SELECT user_id,
        |  min_by(event_type, CAST(round(value * 1000) AS BIGINT) * 1000000000000
        |    + event_id) AS cheapest_type,
        |  max_by(event_type, CAST(round(value * 1000) AS BIGINT) * 1000000000000
        |    + event_id) AS priciest_type,
        |  round(min(value), 6) AS min_value,
        |  round(max(value), 6) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_array_ops" ->
      """WITH ua AS (
        |  SELECT user_id, list_sort(list_distinct(list(event_type))) AS types
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  array_to_string(list_sort(list_intersect(types,
        |    ['click', 'purchase', 'view'])), ',') AS commerce,
        |  array_to_string(list_sort(list_filter(types, t -> t <> 'error')),
        |    ',') AS non_error,
        |  list_contains(types, 'error') AS had_error,
        |  CAST(len(types) AS BIGINT) AS n_types
        |FROM ua ORDER BY user_id""".stripMargin,

    "q_percentile_sql" ->
      """SELECT event_type,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY value), 6)
        |    AS p25,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6)
        |    AS p50,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90_disc,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_listagg" ->
      """SELECT user_id,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_mode_median" ->
      """SELECT event_type,
        |  round(median(value), 6) AS med_value,
        |  (SELECT user_id % 100 FROM events i
        |   WHERE i.event_type = o.event_type
        |   GROUP BY 1 ORDER BY count(*) DESC, 1 LIMIT 1) AS mode_bucket,
        |  count(*) AS n
        |FROM events o GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_url_parse" ->
      """WITH u AS (
        |  SELECT 'https://' || event_type || '.example.com/u/' ||
        |    CAST(user_id % 50 AS VARCHAR) || '/item?ref=' ||
        |    CAST(event_id % 7 AS VARCHAR) || '&v=' ||
        |    CAST(event_id % 3 AS VARCHAR) AS url
        |  FROM events)
        |SELECT regexp_extract(url, 'https://([^/]+)', 1) AS host,
        |       regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        |       regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref,
        |       count(*) AS n
        |FROM u GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_map_funcs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT user_id, event_type,
        |    round(CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY user_id), 6)
        |      AS share
        |  FROM c)
        |SELECT user_id, event_type, share
        |FROM s WHERE share >= 0.25 ORDER BY user_id, event_type""".stripMargin,
  )
}
