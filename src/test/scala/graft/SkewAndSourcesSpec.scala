package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Skew-salting correctness on genuinely skewed data + generic file-source
  * round-trips (SURVEY §2.1 CSV/JSON source coverage). */
class SkewAndSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("salted distinct count equals plain countDistinct on a hot key") {
    // hot key: one user with 50k values (1% distinct), cold keys tiny
    val hot = (0 until 50000).map(i => ("hot", i % 500))
    val cold = (0 until 100).map(i => (s"cold${i % 7}", i))
    val df = (hot ++ cold).toDF("key", "v")
    val salted = Skew.saltedDistinctCount(df, col("key"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("key").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === exact)
    assert(salted("hot") === 500L)
  }

  test("hybrid hot/cold join equals the plain join on skewed data, both paths populated") {
    // one hot key with 5k fact rows, 50 cold keys with <= 20 each; dim has
    // one row per key plus an unmatched extra (inner-join semantics must
    // drop it on both paths)
    val fact = ((0 until 5000).map(i => (999L, i)) ++
      (0 until 1000).map(i => ((i % 50).toLong, i))).toDF("k", "payload")
    val dim = ((0 until 50).map(i => (i.toLong, s"dim_$i")) ++
      Seq((999L, "dim_hot"), (12345L, "dim_unmatched"))).toDF("k", "attr")

    val hybrid = Skew.hybridSkewJoin(fact, dim, "k", hotThreshold = 100L)
    val plain = fact.join(dim, Seq("k"))

    val hCounts = hybrid.groupBy("k", "attr").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val pCounts = plain.groupBy("k", "attr").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(hCounts === pCounts)
    assert(hCounts((999L, "dim_hot")) === 5000L, "hot path rows survive")
    assert(!hCounts.keySet.exists(_._1 == 12345L), "unmatched dim row dropped")

    // the split is real: hot slice broadcasts, and the union is present
    val p = hybrid.queryExecution.executedPlan.toString
    assert(p.contains("Union"), s"no union in hybrid plan:\n${p.take(2000)}")
    assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty, p.take(2000))
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in final plan)") {
    // one hot key owning ~99% of the probe side, landed in ONE shuffle
    // partition; with the skew thresholds scaled down to test size, AQE's
    // OptimizeSkewedJoin must split that partition instead of letting a
    // single task drag the stage — the runtime half of the Skew.scala story
    // (salting covers exact-distinct; AQE covers joins).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // payload must be INCOMPRESSIBLE: AQE's partition-size stats are
      // compressed shuffle bytes, and a repeated-character pad deflates
      // below the skew threshold no matter how many rows the hot key has
      val rnd = new scala.util.Random(42)
      val hot = (0 until 120000).map(_ => ("hot", rnd.alphanumeric.take(100).mkString))
      val cold = (0 until 1000).map(i => (s"cold$i", s"v$i"))
      val probe = (hot ++ cold).toDF("key", "payload")
      val dim = ((0 until 1000).map(i => (s"cold$i", i)) :+ (("hot", -1)))
        .toDF("key", "attr")
      val joined = probe.join(dim, "key")
      // materialize THROUGH this Dataset's own QueryExecution — count()
      // builds a separate one, leaving this plan un-executed
      // (isFinalPlan=false) with no AQE re-planning to inspect
      assert(joined.collect().length === 121000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed join:\n${finalPlan.take(3000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("csv and json sources round-trip the events slice") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_src").toString
    val src = Tables(spark, sf001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    src.write.mode("overwrite").json(s"$tmp/json")

    val csv = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$tmp/csv")
    val json = spark.read.schema(src.schema).json(s"$tmp/json")
    assert(csv.count() === src.count())
    assert(json.count() === src.count())
    // value-level: checksum of a stable projection matches across formats
    // bit_xor: order-independent and overflow-free (ANSI sum of hashes throws)
    def sig(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(bit_xor(xxhash64(col("event_id"), col("user_id"), col("event_type")))).head().getLong(0)
    assert(sig(csv) === sig(src))
    assert(sig(json) === sig(src))
  }

  test("orc source round-trips the events slice with predicate pushdown") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = Tables(spark, sf001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    src.write.mode("overwrite").orc(s"$tmp/orc")

    val orc = spark.read.orc(s"$tmp/orc")
    assert(orc.count() === src.count())
    def sig(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(bit_xor(xxhash64(col("event_id"), col("user_id"), col("event_type")))).head().getLong(0)
    assert(sig(orc) === sig(src))
    // filters reach the ORC scan like parquet (columnar pushdown parity)
    val plan = orc.filter(col("event_type") === "view")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,view)]"),
      plan.take(2000))
  }

  test("_metadata hidden columns expose file provenance for lineage") {
    // Corpus curation needs row→source-file lineage (which crawl shard did
    // this doc come from?); the file-source `_metadata` struct provides it
    // with zero extra I/O — constant per file, no join against a manifest.
    val tmp = java.nio.file.Files.createTempDirectory("graft_meta").toString
    val src = Tables(spark, sf001, "events")
      .select(col("event_id"), col("user_id"))
    src.repartition(2).write.mode("overwrite").parquet(s"$tmp/ev")

    val withMeta = spark.read.parquet(s"$tmp/ev")
      .select(col("event_id"),
        col("_metadata.file_path").as("file_path"),
        col("_metadata.file_size").as("file_size"),
        col("_metadata.row_index").as("row_index"))
    assert(withMeta.select(col("file_path")).distinct().count() === 2)
    assert(withMeta.count() === src.count())
    // row_index restarts at 0 within each file and is dense
    val perFile = withMeta.groupBy(col("file_path"))
      .agg(min(col("row_index")).as("lo"), max(col("row_index")).as("hi"),
        count(lit(1)).as("n"))
      .collect()
    perFile.foreach { r =>
      assert(r.getAs[Long]("lo") === 0L)
      assert(r.getAs[Long]("hi") === r.getAs[Long]("n") - 1)
    }
    // file_size is the real on-disk size, usable for shard-skew audits
    assert(perFile.nonEmpty)
    assert(withMeta.select(col("file_size")).head().getLong(0) > 0L)
  }

  test("maxPartitionBytes sizes the scan's input splits") {
    // the input-sizing lever for 100 TB reads: partitions-per-file must
    // track spark.sql.files.maxPartitionBytes so a scan neither creates
    // millions of tiny tasks nor single tasks too big for executor memory
    val conf = spark.conf
    val saved = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.minPartitionNum")
      .map(k => k -> conf.getOption(k)).toMap
    val path = "/root/testdata/sf0.1/lineitem.parquet" // ~11 MB on disk
    try {
      // minPartitionNum defaults to the cluster parallelism: the effective
      // split is min(maxPartitionBytes, totalBytes / minPartitionNum), so
      // maxPartitionBytes alone can't make splits BIGGER than size/cores —
      // pin it to 1 to isolate the max-split lever
      conf.set("spark.sql.files.minPartitionNum", "1")
      conf.set("spark.sql.files.maxPartitionBytes", "2MB")
      val small = spark.read.parquet(path).rdd.getNumPartitions
      conf.set("spark.sql.files.maxPartitionBytes", "128MB")
      val big = spark.read.parquet(path).rdd.getNumPartitions
      assert(big === 1, s"11 MB file under a 128 MB split should be 1 partition, got $big")
      assert(small >= 4, s"11 MB file under 2 MB splits should be >= 4 partitions, got $small")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("maxRecordsPerFile bounds output file size at write time") {
    // the OUTPUT-sizing lever: one task writing a huge partition must not
    // produce one huge file (downstream readers' split unit is the file
    // for many formats; compaction jobs rely on this cap)
    val dir = java.nio.file.Files.createTempDirectory("graft_maxrec").toString
    val n = 10000L
    spark.range(n).toDF("id")
      .coalesce(1) // ONE write task...
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1000) // ...but capped files
      .parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files === 10, s"10k rows / 1k cap should yield 10 files, got $files")
    assert(spark.read.parquet(dir).count() === n)
  }

  test("observe() collects pipeline health metrics without a second pass") {
    // ingest-monitoring shape at 100 TB: row counts / null counts / sums
    // ride the main job as accumulators (CollectMetricsExec), not as a
    // second scan of the input
    import org.apache.spark.sql.Observation
    val obs = Observation("ingest")
    val ev = Tables(spark, sf001, "events")
    val out = ev.observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("user_id").isNull, 1).otherwise(0)).as("null_users"),
        max(col("value")).as("max_value"))
      .filter(col("event_type") === "view")
      .groupBy(col("user_id")).count()
    out.collect()
    val m = obs.get
    assert(m("rows_in") === ev.count())
    assert(m("null_users") === 0L)
    assert(m("max_value").asInstanceOf[Double] > 0.0)
  }

  test("mergeSchema unifies evolved parquet schemas across file generations") {
    // schema evolution at the lake layer: files written before a column
    // existed must still read alongside new files — old rows surface the
    // added column as null, and the scan does not error or drop it
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    spark.range(0, 5).selectExpr("id", "id * 2 AS v")
      .write.parquet(s"$dir/gen=1")
    spark.range(5, 8).selectExpr("id", "id * 2 AS v", "'en' AS lang")
      .write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("gen", "id", "lang", "v"))
    assert(merged.count() === 8)
    assert(merged.filter(col("lang").isNull).count() === 5,
      "pre-evolution rows must read as null for the added column")
    assert(merged.filter(col("lang") === "en").count() === 3)
  }

  test("AQE coalesces over-provisioned shuffle partitions at runtime") {
    // the other half of shuffle sizing: a too-large shuffle.partitions
    // setting (the safe default at scale) must not produce thousands of
    // near-empty tasks — AQE's coalescer merges them to the advisory size
    val conf = spark.conf
    val saved = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.shuffle.partitions", "200")
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      val agg = spark.range(0, 10000)
        .selectExpr("id % 50 AS k", "id AS v")
        .groupBy("k").sum("v")
      agg.collect() // materialize so AQE finalizes the plan
      val finalPartitions = agg.rdd.getNumPartitions
      assert(finalPartitions < 200,
        s"AQE should coalesce the 200 configured partitions, got $finalPartitions")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
