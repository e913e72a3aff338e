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
    import graft.elb.{LogParser, Synthetic}
    import spark.implicits._

    // warm
    graft.Tables(spark, sfDir, "lineitem").count()

    // --- new jaccard breakdown
    val d2 = graft.Tables(spark, sfDir, "documents")
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("shingles", array_distinct(expr(
        "transform(sequence(0, size(tokens) - 2), i -> concat(tokens[i], ' ', tokens[i+1]))")))
    val ex2 = d2.select(col("doc_id"), col("lang"), col("source"),
      explode(col("shingles")).as("sh"))
    time("ex2.count") { ex2.count() }
    val counts2 = ex2.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    time("counts2.count") { counts2.count() }
    val a2 = ex2.select(col("lang"), col("source"), col("sh"), col("doc_id").as("id1"))
    val b2 = ex2.select(col("lang"), col("source"), col("sh"), col("doc_id").as("id2"))
    val joined = a2.join(b2, Seq("lang", "source", "sh")).filter(col("id1") < col("id2"))
    time("join raw count") { println("join rows: " + joined.count()) }
    val agg2 = joined.groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("inter"))
    time("join+agg count") { agg2.count() }
    time("jaccard full new") { graft.ops.TextOps.jaccardPairs(spark, sfDir).count() }
    graft.ops.TextOps.jaccardPairs(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
