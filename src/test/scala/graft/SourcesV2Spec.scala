package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Custom DSv2 source (graft.sources.EventsSource): partition planning,
  * reader-level column pruning, and exact deterministic content. */
class SourcesV2Spec extends SparkSpec {

  private def events(rows: Long, parts: Int) =
    spark.read.format("graft.sources.EventsSource")
      .option("rows", rows).option("partitions", parts).load()

  /** Executed-plan text (AQE-finalized) — scan descriptions appear in it
    * wherever the BatchScan node lives, including inside the
    * ShuffleQueryStage leaves a declined (shuffling) plan is wrapped in,
    * which a structural collect cannot descend into. */
  private def scanDesc(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize the adaptive plan before inspecting it
    df.queryExecution.executedPlan.toString
  }

  test("plans the requested number of range partitions, no shuffle") {
    val df = events(10000, 8)
    assert(df.rdd.getNumPartitions === 8)
    assert(df.count() === 10000L)
    // ragged split: 10 rows over 4 parts of 3 → last partition short
    assert(events(10, 4).count() === 10L)
    assert(events(10, 4).rdd.getNumPartitions === 4)
  }

  test("column pruning reaches the reader (BatchScan output is pruned)") {
    val df = events(1000, 4).select(col("event_id"))
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScanExec in plan")
    assert(scans.head.output.map(_.name) === Seq("event_id"),
      s"scan not pruned: ${scans.head.output}")
    assert(scans.head.scan.description().contains("cols=event_id"),
      "pruned schema did not reach the custom Scan")
  }

  test("event_id range filters prune the generated id space in the source") {
    val df = events(100000, 8)
      .filter(col("event_id") >= 20000 && col("event_id") < 30000)
    assert(df.count() === 10000L)
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head
    assert(scan.description().contains("range=[20000,30000)"),
      s"filters not pushed into the scan: ${scan.description()}")
    // fully-honored range filters leave NO residual Filter over the scan
    val hasFilterExec = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.nonEmpty
    assert(!hasFilterExec, "range filter was re-evaluated despite pushdown")
    // point lookup collapses to a single-row range
    val one = events(100000, 8).filter(col("event_id") === 12345L)
    assert(one.count() === 1L)
    assert(one.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.description().contains("range=[12345,12346)"))
  }

  test("Long.MaxValue bounds don't overflow the pushed range") {
    // consumed filters are never re-checked by Spark, so a v+1 wrap at
    // MaxValue would silently drop (or fabricate) rows rather than error
    val n = 1000L
    assert(events(n, 4).filter(col("event_id") <= Long.MaxValue).count() === n,
      "<= MaxValue must constrain nothing")
    assert(events(n, 4).filter(col("event_id") > Long.MaxValue).count() === 0L,
      "> MaxValue must match nothing")
    assert(events(n, 4).filter(col("event_id") === Long.MaxValue).count() === 0L,
      "= MaxValue must match nothing (ids live in [0, rows))")
    assert(events(n, 4).filter(col("event_id") >= Long.MaxValue).count() === 0L)
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered from the range, no scan") {
    val df = events(100000, 8)
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("mn"),
        max(col("event_id")).as("mx"))
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((100000L, 0L, 99999L)))
    // the scan IS the aggregate: one pushed-agg partition, zero row reads
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head
    assert(scan.description().contains("agg=[count,min,max]"),
      s"aggregate not pushed: ${scan.description()}")

    // composes with filter pushdown: the pushed range feeds the aggregate
    val f = events(100000, 8).filter(col("event_id") >= 90000)
      .agg(count(lit(1)), min(col("event_id")), max(col("event_id"))).head()
    assert((f.getLong(0), f.getLong(1), f.getLong(2)) == ((10000L, 90000L, 99999L)))

    // empty pushed range: SQL global-agg-on-empty semantics (0, null, null)
    val e = events(1000, 4).filter(col("event_id") >= 5000)
      .agg(count(lit(1)), min(col("event_id")), max(col("event_id"))).head()
    assert(e.getLong(0) === 0L && e.isNullAt(1) && e.isNullAt(2))

    // unsupported shapes decline and stay exact via the normal scan path:
    // aggregates over non-range columns
    val s = events(1000, 4).agg(sum(col("value"))).head().getDouble(0)
    assert(s === (0L until 1000L).map(i => ((i * 7919L) % 10000L) / 100.0).sum)
  }

  test("grouped aggregate pushdown: per-group COUNT/MIN/MAX from residue arithmetic") {
    // event_type is a pure function of event_id % 5, so each group's
    // aggregates over [0, 1000) are closed-form: count 200, min = the
    // residue, max = 995 + residue — answered with zero rows generated
    val g = events(1000, 4).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("event_id")).as("mn"),
        max(col("event_id")).as("mx"))
    val desc = scanDesc(g)
    assert(desc.contains("group=event_type") &&
      desc.contains("agg=[count,min,max]"),
      s"grouped aggregate not pushed: $desc")
    val types = Seq("view", "click", "purchase", "signup", "error")
    val got = g.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == types.zipWithIndex.map { case (t, k) =>
      t -> ((200L, k.toLong, 995L + k))
    }.toMap)

    // composes with filter pushdown: the residue arithmetic runs over the
    // PRUNED range, and absent residue classes emit no group row
    val f = events(1000, 4).filter(col("event_id") >= 998)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("signup" -> 1L, "error" -> 1L)) // residues 3 and 4 only

    // user_id grouping: period 1000, residues map bijectively to users —
    // 1000 groups answered in O(groups), never O(rows)
    val u = events(100000, 8).filter(col("event_id") < 2500)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"),
        min(col("event_id")).as("mn"))
    assert(scanDesc(u).contains("group=user_id"))
    val rows = u.collect()
    assert(rows.length === 1000)
    assert(rows.map(_.getLong(1)).sum === 2500L)
    // spot-check one group against the pure per-row functions
    val expect = (0L until 2500L).groupBy(i => (i * 2654435761L) % 1000L)
    rows.take(20).foreach { r =>
      val ids = expect(r.getLong(0))
      assert(r.getLong(1) === ids.size.toLong && r.getLong(2) === ids.min)
    }

    // decline paths stay exact via the normal scan + engine aggregate:
    // multi-column grouping and grouping by a non-periodic-supported column
    val two = events(1000, 4).groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    assert(!scanDesc(two).contains("group="))
    assert(two.collect().map(_.getLong(2)).sum === 1000L)
    val byTs = events(1000, 4).groupBy(col("ts_us")).count()
    assert(byTs.count() === 1000L) // ts_us is unique per id
  }

  test("limit and top-N pushdown truncate the planned id space") {
    // plain LIMIT: fully pushed — the scan's range is the limit
    val lim = events(100000, 8).limit(7)
    assert(lim.count() === 7L)
    val limScan = lim.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head
    assert(limScan.description().contains("range=[0,7)"),
      s"limit not pushed: ${limScan.description()}")

    // composes with filter pushdown: limit truncates the PRUNED range
    val fl = events(100000, 8).filter(col("event_id") >= 500).limit(10)
    assert(fl.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.description().contains("range=[500,510)"))
    assert(fl.collect().map(_.getLong(0)).toSeq == (500L until 510L))

    // ASC top-N: completely pushed (ids generate in order)
    val asc = events(100000, 8).orderBy(col("event_id")).limit(5)
    assert(asc.collect().map(_.getLong(0)).toSeq == (0L until 5L))
    assert(asc.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.description().contains("range=[0,5)"))

    // DESC top-N: range prunes to the LAST n ids; Spark's sort stays
    // (partial push) so the order is correct
    val desc = events(100000, 8).orderBy(col("event_id").desc).limit(5)
    assert(desc.collect().map(_.getLong(0)).toSeq ==
      Seq(99999L, 99998L, 99997L, 99996L, 99995L))
    assert(desc.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.description().contains("range=[99995,100000)"))

    // unsupported sort key declines: correct via the normal path
    val byVal = events(1000, 4).orderBy(col("value"), col("event_id")).limit(3)
    val expect = (0L until 1000L)
      .map(i => (((i * 7919L) % 10000L) / 100.0, i)).sorted.take(3).map(_._2)
    assert(byVal.collect().map(_.getLong(0)).toSeq == expect)
  }

  test("DSv2 sink: two-phase commit publishes exact write-side totals") {
    import graft.sources.AuditSink
    // source → sink end-to-end through the v2 write path, 8 write tasks
    events(10000, 8)
      .select(col("event_id"), col("event_type"))
      .write.format("graft.sources.AuditSink")
      .option("name", "t_events").mode("append").save()
    val stats = AuditSink.results.get("t_events")
    assert(stats != null, "commit did not publish")
    assert(stats.rows === 10000L)
    assert(stats.sum === 10000L * 9999 / 2) // Σ event_id — summed per task, merged at commit
    // overwrite (truncate capability) republishes the slot
    events(100, 2).select(col("event_id"))
      .write.format("graft.sources.AuditSink")
      .option("name", "t_events").mode("overwrite").save()
    assert(AuditSink.results.get("t_events").rows === 100L)
  }

  test("micro-batch stream drains the id space rate-limited, exact totals") {
    val n = 5000L
    val stream = spark.readStream.format("graft.sources.EventsSource")
      .option("rows", n).option("partitions", 4)
      .option("rowsPerBatch", 1000).load()
    val q = stream.groupBy()
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("s"))
      .writeStream.format("memory").queryName("v2_stream")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val r = spark.table("v2_stream").head()
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("s") === n * (n - 1) / 2)
    // admission control actually split the drain into ≥ 5 micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      q.recentProgress.map(p => p.numInputRows).mkString(","))
  }

  test("Trigger.AvailableNow drains the WHOLE id space rate-limited, then terminates") {
    // SupportsTriggerAvailableNow: prepare snapshots the end offset and
    // the engine keeps firing rate-limited batches until it is reached —
    // without the interface, AvailableNow's generic wrapper stops after
    // the first 1000-id batch and n/s here would come up 1000/499500
    val n = 5000L
    val stream = spark.readStream.format("graft.sources.EventsSource")
      .option("rows", n).option("partitions", 4)
      .option("rowsPerBatch", 1000).load()
    val q = stream.groupBy()
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("s"))
      .writeStream.format("memory").queryName("v2_stream_an")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    val r = spark.table("v2_stream_an").head()
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("s") === n * (n - 1) / 2)
    // still rate-limited: the drain ran as ≥ 5 admission-controlled batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      q.recentProgress.map(p => p.numInputRows).mkString(","))
  }

  test("content is a pure function of the row id — exact aggregates") {
    val n = 10000L
    val df = events(n, 8)
    val agg = df.agg(
      sum(col("event_id")).as("sum_id"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types"),
      min(col("ts_us")).as("min_ts"),
      max(col("ts_us")).as("max_ts")).head()
    assert(agg.getAs[Long]("sum_id") === n * (n - 1) / 2)
    assert(agg.getAs[Long]("n_users") === 1000L)
    assert(agg.getAs[Long]("n_types") === 5L)
    assert(agg.getAs[Long]("min_ts") === 1700000000000000L)
    assert(agg.getAs[Long]("max_ts") === 1700000000000000L + (n - 1) * 250000L)
    // spot-check one full row against the pure functions
    val r42 = df.filter(col("event_id") === 42).head()
    assert(r42.getAs[Long]("user_id") === graft.sources.EventsSource.userId(42))
    assert(r42.getAs[String]("event_type") === graft.sources.EventsSource.eventType(42))
    assert(r42.getAs[Double]("value") === graft.sources.EventsSource.value(42))
  }

  private def inPredicate(vals: Long*) = {
    import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    new Predicate("IN", (Expressions.column("event_id") +:
      vals.map(v => Expressions.literal(v): Expression)).toArray[Expression])
  }

  test("runtime v2 filtering: a decoded IN prunes generation to the exact id set") {
    import org.apache.spark.sql.connector.read.{Batch, SupportsRuntimeV2Filtering}
    val scan = new graft.sources.EventsScanBuilder(100000L, 8).build()
      .asInstanceOf[SupportsRuntimeV2Filtering]
    assert(scan.filterAttributes().map(_.describe()).toSeq == Seq("event_id"))
    // 123456 is outside [0, rows): dropped; 7 repeats: deduped
    scan.filter(Array(inPredicate(7L, 99999L, 123456L, 7L)))
    val parts = scan.asInstanceOf[Batch].planInputPartitions()
    val ids = parts.flatMap { case graft.sources.EventsIdSet(a) => a.toSeq }.sorted
    assert(ids.toSeq == Seq(7L, 99999L))
  }

  test("runtime v2 filtering: an empty surviving id set plans zero partitions") {
    import org.apache.spark.sql.connector.read.{Batch, SupportsRuntimeV2Filtering}
    val scan = new graft.sources.EventsScanBuilder(1000L, 8).build()
      .asInstanceOf[SupportsRuntimeV2Filtering]
    scan.filter(Array(inPredicate(5000L, 6000L))) // all outside [0, 1000)
    assert(scan.asInstanceOf[Batch].planInputPartitions().isEmpty)
  }

  test("runtime v2 filtering: an undecodable predicate is a safe no-op") {
    import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.connector.read.{Batch, SupportsRuntimeV2Filtering}
    val scan = new graft.sources.EventsScanBuilder(1000L, 8).build()
      .asInstanceOf[SupportsRuntimeV2Filtering]
    // a predicate shape the scan does not understand must not drop rows
    scan.filter(Array(new Predicate("ALWAYS_TRUE", Array.empty[Expression]),
      new Predicate("IN", Array[Expression](Expressions.column("user_id")))))
    val parts = scan.asInstanceOf[Batch].planInputPartitions()
    val n = parts.map { case graft.sources.EventsRange(s, e) => e - s }.sum
    assert(n == 1000L)
  }

  test("runtime v2 filtering fires end-to-end through a broadcast equi join") {
    import spark.implicits._
    // plain (non-adaptive) plan so the BatchScanExec is structurally
    // reachable; runtime filtering itself works under both planners.
    // The build side must be a real scan + Filter — DPP's
    // hasSelectivePredicate check never fires on a constant-folded
    // LocalRelation, exactly like partitioned-parquet DPP.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ev = events(100000L, 8)
      val dim = Tables(spark, sf001, "documents")
        .filter(col("lang") === "zh").select(col("doc_id").as("k"))
      val j = ev.join(broadcast(dim), ev("event_id") === dim("k"))
      // collect() executes THIS DataFrame's plan instance, so its metrics
      // populate (count() would re-plan a separate execution)
      assert(j.collect().length == 74) // zh docs at sf0.001; every doc_id < rows
      val scans = j.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
      assert(scans.nonEmpty)
      // the scan received the runtime IN filter and generated ONLY those ids
      assert(scans.head.runtimeFilters.nonEmpty)
      assert(scans.head.metrics("numOutputRows").value == 74L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
