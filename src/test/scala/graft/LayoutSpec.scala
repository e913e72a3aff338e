package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** File-layout / data-skipping posture: a range-partitioned, sorted write
  * produces files whose per-file key ranges are pairwise DISJOINT, so a
  * point or range predicate on the layout key prunes to O(1) files via
  * parquet row-group min/max stats — the single cheapest lever for
  * repeated scans of a 100 TB fact table (the Snowflake/Delta clustering
  * idea, done with nothing but repartitionByRange + sortWithinPartitions).
  *
  * The spec measures the property the optimizer relies on (disjoint file
  * min/max), not the engine's pruning implementation — pruning itself is
  * pinned separately in PartitionPruningSpec/PlanSpec.
  */
class LayoutSpec extends SparkSpec {

  test("range-partitioned sorted write yields disjoint per-file key ranges") {
    val dir = Files.createTempDirectory("graft_layout").toFile
    dir.deleteOnExit()
    val out = s"${dir.getAbsolutePath}/orders_by_price"

    Tables(spark, sf001, "orders")
      .repartitionByRange(8, col("o_totalprice"))
      .sortWithinPartitions(col("o_totalprice"))
      .write.mode("overwrite").parquet(out)

    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 8, s"expected 8 range files, got ${files.length}")

    // per-file [min, max] of the layout key, read file-by-file
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_totalprice")), max(col("o_totalprice")))
        .head()
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)

    ranges.sliding(2).foreach {
      case Array((_, prevMax), (curMin, _)) =>
        assert(curMin >= prevMax,
          s"overlapping file ranges: prev max $prevMax > next min $curMin")
      case _ =>
    }

    // nothing lost in the re-layout
    val n = spark.read.parquet(out).count()
    assert(n == Tables(spark, sf001, "orders").count())

    // and a selective range predicate must reach the scan as a pushed filter
    val plan = spark.read.parquet(out)
      .filter(col("o_totalprice") < 1000.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), LessThan(o_totalprice,1000.0)]"),
      s"range filter not pushed to parquet scan:\n$plan")
  }
}
