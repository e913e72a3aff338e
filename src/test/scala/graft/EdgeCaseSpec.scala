package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.ops.{Curation, ScaledRank, Sessionize, TextOps}

/** SURVEY §5's edge-case pins for the reusable DataFrame-level operators:
  * empty relations flow through (schema intact, no crash), single-hit
  * sessions exist with duration 0, null grouping keys form their own
  * group (not silently dropped), and the iterative CC handles the no-edge
  * graph. These are the inputs a 100 TB pipeline hits daily via empty
  * partitions and dirty keys.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyEvents = Seq.empty[(Long, java.sql.Timestamp, String)]
    .toDF("user_id", "ts", "event_id")

  test("sessionizer on an empty relation returns empty with schema intact") {
    val out = Sessionize.withSessionIds(emptyEvents,
      col("user_id"), col("ts"), col("event_id"))
    assert(out.count() === 0)
    assert(out.columns.contains("session_id") && out.columns.contains("ts_us"))
  }

  test("single-hit session has duration 0 and counts as a session") {
    val one = Seq((7L, ts("2015-07-22 09:00:00"), "e1", "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val s = Sessionize.sessions(one, col("user_id"), col("ts"),
      col("event_id"), col("event_type")).collect()
    assert(s.length === 1)
    assert(s.head.getAs[Double]("duration_sec") === 0.0)
    assert(s.head.getAs[Long]("hit_count") === 1L)
  }

  test("null user keys sessionize as their OWN group, not dropped") {
    val rows = Seq(
      (java.lang.Long.valueOf(1L), ts("2015-07-22 09:00:00"), "a", "view"),
      (null.asInstanceOf[java.lang.Long], ts("2015-07-22 09:00:00"), "b", "view"),
      (null.asInstanceOf[java.lang.Long], ts("2015-07-22 09:05:00"), "c", "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val s = Sessionize.sessions(rows, col("user_id"), col("ts"),
      col("event_id"), col("event_type")).collect()
    assert(s.length === 2, "one session for user 1, one for the null user")
    val nullSess = s.filter(_.isNullAt(0))
    assert(nullSess.length === 1 && nullSess.head.getAs[Long]("hit_count") === 2L)
  }

  test("connected components: empty edge list yields singleton components") {
    val ids = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val labs = Curation.connectedComponents(ids, edges)
      .as[(Long, Long)].collect().toMap
    assert(labs === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("language ID and global ranks on empty input return empty, not error") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.languageIdOn(emptyDocs).count() === 0)
    val ranked = ScaledRank.withGlobalRanks(
      Seq.empty[(Long, Long)].toDF("k", "n"),
      orderCols = Seq(col("n").desc, col("k")),
      keyCols = Seq(col("n"), col("k")))
    assert(ranked.count() === 0)
  }

  test("z-order key degenerates gracefully at grid corners") {
    import graft.ops.Layout
    val df = Seq((0L, 0L), (63L, 63L), (0L, 63L), (63L, 0L), (5L, 9L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 6).as("z"))
    val m = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((0L, 0L)) === 0L)
    assert(m((63L, 63L)) === 4095L) // full 12 bits set
    // interleave is a bijection on the grid: all distinct, in range
    assert(m.values.toSet.size === 5)
    assert(m.values.forall(z => z >= 0 && z < 4096))
    // a occupies odd bits: (a=63, b=0) → 0b101010101010
    assert(m((63L, 0L)) === 0xAAAL)
    assert(m((0L, 63L)) === 0x555L)
  }

  test("DSv2 source: zero rows and more partitions than rows don't crash") {
    val zero = spark.read.format("graft.sources.EventsSource")
      .option("rows", 0).option("partitions", 4).load()
    assert(zero.count() === 0)
    val tiny = spark.read.format("graft.sources.EventsSource")
      .option("rows", 3).option("partitions", 8).load()
    assert(tiny.count() === 3)
  }

  test("parameterized SQL binds named args without string interpolation") {
    // the injection-safe templating surface: values bind as literals in
    // the parse tree, never concatenated into SQL text
    val r = spark.sql("SELECT :x + 1 AS v, :s AS s",
      Map("x" -> 41, "s" -> "a'b")).head()
    assert(r.getInt(0) === 42)
    assert(r.getString(1) === "a'b") // a quote-injection attempt stays data
    Seq((1L, "keep"), (2L, "drop")).toDF("id", "tag")
      .createOrReplaceTempView("param_v")
    val filtered = spark.sql(
      "SELECT id FROM param_v WHERE tag = :t", Map("t" -> "keep"))
    assert(filtered.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("EXECUTE IMMEDIATE binds positional params to the static plan's rows") {
    val dyn = graft.ops.Relational.execImmediate(spark, sf001).collect().toSeq
    val static = spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |       min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
        |FROM orders_v
        |WHERE o_orderdate >= DATE '1995-01-01' AND o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      .collect().toSeq
    assert(dyn === static)
    assert(dyn.size === 5) // all five priorities survive the filter
    // binding is typed, not spliced: a quote in a USING string stays data
    val probe = spark.sql(
      "EXECUTE IMMEDIATE 'SELECT ? AS s' USING 'it''s data'")
      .collect()(0).getString(0)
    assert(probe === "it's data")
  }

  test("IDENTIFIER(:name) binds table/column names; injection fails to parse") {
    val dyn = graft.ops.Relational.sqlIdentifier(spark, sf001).collect().toSeq
    val static = spark.sql(
      """SELECT o_orderstatus, count(*) AS n,
        |       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders_v
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      .collect().toSeq
    assert(dyn === static)
    // an identifier parameter is a NAME, not spliced SQL: a predicate
    // smuggled into it must fail to resolve, never execute
    intercept[Exception] {
      spark.sql("SELECT count(*) FROM IDENTIFIER(:t)",
        Map("t" -> "orders_v WHERE o_orderkey < 0")).collect()
    }
  }

  test("UTF8_LCASE collation: equality, grouping, and ordering ignore case") {
    // equality under the collated type
    val eq = spark.sql(
      "SELECT 'SPARK' COLLATE UTF8_LCASE = 'spark' AS same").head().getBoolean(0)
    assert(eq)
    // grouping: the collated key folds case variants into one group
    val grouped = Seq("Scan", "SCAN", "scan", "sort")
      .toDF("w")
      .groupBy(expr("collate(w, 'UTF8_LCASE')").as("k"))
      .agg(count(lit(1)).as("n"))
      .select(lower(col("k")).cast("string"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(grouped === Map("scan" -> 3L, "sort" -> 1L))
    // ordering: case-insensitive sort interleaves cases by letter
    val ordered = Seq("b", "A", "a", "B").toDF("w")
      .orderBy(expr("collate(w, 'UTF8_LCASE')").asc, col("w"))
      .collect().map(_.getString(0)).toSeq
    assert(ordered === Seq("A", "a", "B", "b"))
    // and the oracled query: minted variants fold back to the base corpus
    val rows = graft.ops.Relational.collationGroups(spark, sf001).collect()
    assert(rows.forall(r => r.getString(0) == r.getString(0).toLowerCase))
    assert(rows.exists(_.getLong(2) > 1L), "no case variants were minted")
  }

  test("mergeSchema unions evolving shard schemas; absent columns null-fill") {
    val merged = graft.ops.Relational.schemaMerge(spark, sf001).collect()
    assert(merged.length === 2)
    val byBatch = merged.map(r => r.getLong(0) -> r).toMap
    // batch 1 predates the column: every row null; batch 2 has all 5
    assert(byBatch(1L).getLong(2) === byBatch(1L).getLong(1))
    assert(byBatch(2L).getLong(2) === 0L)
    assert(byBatch(2L).getLong(4) === 5L)
    // nothing lost across the evolution
    val total = merged.map(_.getLong(1)).sum
    assert(total === Tables(spark, sf001, "orders").count())
  }

  test("SQL scripting WHILE loop converges to the closed-form crossing") {
    val r = graft.ops.Relational.sqlScript(spark, sf001).collect()
    assert(r.length === 1)
    val k = r(0).getLong(0)
    def above(kk: Long): Long = spark.table("orders_v")
      .filter(col("o_totalprice") >= 1000.0 * math.pow(2, kk.toDouble))
      .count()
    // k is the FIRST doubling that brings the count to <= 100
    assert(above(k) <= 100L)
    assert(k === 0L || above(k - 1) > 100L)
    assert(r(0).getDouble(1) === 1000.0 * math.pow(2, k.toDouble))
    assert(r(0).getLong(2) === above(k))
  }

  test("SQL pipe syntax desugars to the classic nesting exactly") {
    // q_sql_pipe's |> stages must produce the identical rows AND plan
    // family as the classic WHERE/GROUP BY/HAVING/ORDER BY phrasing
    val piped = graft.ops.Relational.sqlPipe(spark, sf001).collect().toSeq
    val classic = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem_v
        |WHERE l_quantity >= 5
        |GROUP BY l_returnflag, l_linestatus
        |HAVING count(*) > 100
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect().toSeq
    assert(piped === classic)
    assert(piped.size === 6) // independent DuckDB literal over sf0.001
  }

  test("Misra-Gries over an empty relation aggregates to an empty summary") {
    val mg = udaf(new MisraGries(8), Encoders.STRING)
    val out = Seq.empty[String].toDF("k")
      .agg(mg(col("k")).as("hh"))
      .select(explode(col("hh")))
    assert(out.count() === 0)
  }
}
