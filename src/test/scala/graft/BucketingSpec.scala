package graft

import org.apache.spark.sql.functions._

/** Bucketing = the storage-level half of the 100 TB join story (SURVEY
  * §2.11 "bucketing for co-located joins"): two tables bucketed on the join
  * key join WITHOUT a shuffle exchange on either side — the exchange that
  * dominates big-big joins is paid once at write time instead of per query. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans with zero shuffle exchanges") {
    // default warehouse (./spark-warehouse, gitignored); warehouse.dir is a
    // static conf and cannot be set on a live session
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    Tables(spark, sf001, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables(spark, sf001, "orders")
      .select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))

    val plan = joined.queryExecution.executedPlan.toString
    val joinExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // the aggregate after the join still shuffles on its own key; the JOIN
    // itself must not — so at most 1 hash exchange (group-by), never 3
    assert(joinExchanges <= 1,
      s"bucketed join should not shuffle its inputs:\n${plan.take(3000)}")

    // and results match the plain-parquet equivalent
    val plain = Tables(spark, sf001, "lineitem")
      .join(Tables(spark, sf001, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
    assert(joined.orderBy("o_orderpriority").collect().toSeq
      === plain.orderBy("o_orderpriority").collect().toSeq)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
