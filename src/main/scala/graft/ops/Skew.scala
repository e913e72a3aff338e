package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §2.11 "salting for skew", §7.5.4): the
  * documented recipe for hot keys (one bot IP owning a large share of
  * hits), as an executable operator rather than prose.
  *
  * What does NOT need salting in Spark: plain sum/count/min/max group-bys —
  * HashAggregateExec's map-side partial aggregation already collapses a hot
  * key to one row per input partition before the shuffle. Joins with a hot
  * probe key are handled at runtime by AQE skew-join splitting.
  *
  * What DOES: exact distinct aggregation. `countDistinct(value)` expands
  * (key, value) pairs and every pair of the hot key lands on ONE reducer.
  * The fix partitions the VALUE space: bucket = hash(value) % buckets, so
  * each distinct value is counted exactly once in exactly one bucket, and
  * per-key distinct = sum of bucket distincts. The hot key now occupies
  * `buckets` reducers instead of one; the merge touches only
  * #keys × buckets rows.
  */
object Skew {

  /** Exact distinct count per key, salted over the value space.
    * Semantically identical to groupBy(key).agg(countDistinct(value)). */
  def saltedDistinctCount(df: DataFrame, key: Column, value: Column,
                          buckets: Int = 16): DataFrame =
    df.groupBy(key.as("key"), pmod(xxhash64(value), lit(buckets)).as("_bucket"))
      .agg(countDistinct(value).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("n_distinct"))
}
