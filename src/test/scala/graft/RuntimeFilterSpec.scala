package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter rule) —
  * the 100 TB lever for selective dim→fact joins that are too big to
  * broadcast: the optimizer builds a bloom filter from the filtered
  * creation side and pushes a `bloom_filter_might_contain` probe beneath
  * the fact scan's shuffle, discarding non-joining rows before they are
  * shuffled. The thresholds here shrink Spark's defaults (10 GB
  * application-side scan) to demonstrate the mechanism on test-scale data;
  * at real scale the defaults fire on their own.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom probe on the fact side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // app side must look "big enough to be worth filtering" — defaults
      // assume TB-scale scans; drop to 0 so the sf0.001 fact qualifies
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: with a broadcast join the probe is pointless
      // (the dim rides along anyway) and the rule declines
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = Tables(spark, sf001, "lineitem")
      val dim = Tables(spark, sf001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      // injected shape: Filter(might_contain(scalar-subquery[...],
      // xxhash64(l_orderkey))) over the fact relation, the subquery being a
      // bloom_filter_agg over the FILTERED dim keys
      assert(optimized.contains("might_contain"),
        s"no bloom probe injected:\n${optimized.take(3000)}")
      assert(optimized.contains("bloom_filter_agg"),
        s"no bloom build aggregate:\n${optimized.take(3000)}")
      // and the answer is still right (probe is might-contain: no false
      // negatives, so the join result is unchanged)
      val withFilter = joined.collect().map(_.toSeq).toSeq
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
        .collect().map(_.toSeq).toSeq
      assert(withFilter === without)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
