package graft

import org.apache.spark.sql.functions._

/** Partition pruning on a date/status-partitioned layout — the layout-level
  * scan-reduction story for 100 TB (SURVEY §4 "partition pruning
  * (static/dynamic)"): static pruning from a literal filter on the
  * partition column; dynamic pruning (DPP) injected when the partition
  * column is joined against a selectively-filtered broadcast dim. */
class PartitionPruningSpec extends SparkSpec {

  private lazy val factDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables(spark, sf001, "orders")
      .write.partitionBy("o_orderstatus").mode("overwrite")
      .parquet(s"$dir/orders_part")
    s"$dir/orders_part"
  }

  test("static partition pruning: literal filter prunes partitions at scan") {
    val df = spark.read.parquet(factDir).filter(col("o_orderstatus") === "O")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      plan.take(2000))
    // only the O partition is read
    val full = spark.read.parquet(factDir).count()
    assert(df.count() < full)
  }

  test("dynamic partition pruning fires for a filtered broadcast dim join") {
    import spark.implicits._
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    // dim must be a file source: a local Seq's filter constant-folds into
    // the LocalTableScan and DPP no longer sees a selective predicate
    val dimPath = s"${factDir}_dim"
    Seq(("O", "open"), ("F", "finished"), ("P", "pending"))
      .toDF("status", "category")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.read.parquet(factDir)
      .join(broadcast(dim).filter(col("category") === "open"),
        col("o_orderstatus") === col("status"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(3000))
    // semantics: equals the statically-filtered count
    assert(joined.count() ===
      spark.read.parquet(factDir).filter(col("o_orderstatus") === "O").count())
  }
}
