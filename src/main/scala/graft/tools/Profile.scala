package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only micro profiler: times labeled sub-stages of the slow queries.
  * Not part of the driver contract. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    // warm
    graft.Tables(spark, sfDir, "documents").count()
    graft.functions.GraftFunctions.register(spark)

    // --- simhash bucket-skew diagnosis
    val nRot = 8
    val prefixBits = 16
    val step = 64 / nRot
    val docs = graft.Tables(spark, sfDir, "documents")
    println("[profile] docs = " + docs.count())
    val sigs = docs
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("shingles", graft.functions.GraftFunctions.bigramShingles(col("tokens")))
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), graft.functions.GraftFunctions.simhash64(col("shingles")).as("sig"))
      .persist()
    time("sigs.count") { println("sigs: " + sigs.count()) }
    val banded = sigs.select(col("doc_id"), col("sig"), expr(
        s"""explode(transform(sequence(0, ${nRot - 1}), r -> named_struct(
           |  'rot', r,
           |  'prefix', shiftrightunsigned(
           |     shiftleft(sig, r * $step) | shiftrightunsigned(sig, 64 - r * $step),
           |     ${64 - prefixBits}))))""".stripMargin).as("rp"))
      .select(col("doc_id"), col("sig"), col("rp.rot"), col("rp.prefix"))
    val hist = banded.groupBy(col("rot"), col("prefix")).count()
      .agg(count(lit(1)).as("n_buckets"), max(col("count")).as("max_bucket"),
        avg(col("count")).as("avg_bucket"),
        sum(col("count") * (col("count") - 1) / 2).as("candidate_pairs"))
    time("bucket histogram") { hist.show(false) }
    // top-10 biggest buckets
    time("top buckets") {
      banded.groupBy(col("rot"), col("prefix")).count()
        .orderBy(col("count").desc).show(10, false)
    }
    time("simhash full") { graft.ops.TextOps.simhashPairs(spark, sfDir).count() }
    spark.catalog.clearCache()

    // --- jaccard at sf0.1
    time("jaccard full") { graft.ops.TextOps.jaccardPairs(spark, sfDir).count() }
    spark.catalog.clearCache()

    // --- set_ops_all
    time("set_ops_all") { graft.ops.Relational.queries("q_set_ops_all")(spark, sfDir).count() }
    spark.stop()
  }
}
