package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` hop the engine needs: turning a custom
  * [[LogicalPlan]] (graft.plans.AsOfJoin) into a user-facing DataFrame.
  * `classic.Dataset.ofRows` is package-private in Spark 4, and placing a
  * single forwarder inside `org.apache.spark.sql` is the established way
  * third-party Spark libraries expose custom operators (no other Spark
  * internals are touched here; everything else lives under `graft.*`).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
