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

  /** Hybrid hot/cold join — the manual form of the classic skew-join split
    * (what AQE's skew handling does for sort-merge partitions, expressed
    * at the key level so it also covers cases AQE cannot rebalance, e.g. a
    * single key larger than any split): keys whose fact frequency exceeds
    * `hotThreshold` probe a BROADCAST slice of the dim (the hot slice is
    * ≤ |hot keys| dim rows — tiny by definition), while the cold remainder
    * runs the normal keyed join and AQE picks its strategy. The hot-key
    * list itself is a filtered aggregate of the fact — map-side combine
    * collapses it before the shuffle — and is broadcast to split BOTH
    * sides with semi/anti joins, so the split adds no keyed exchange.
    * Semantically identical to `fact.join(dim, key)` for any threshold:
    * every fact row is exactly one of hot/cold, and the union is disjoint
    * by construction. */
  def hybridSkewJoin(fact: DataFrame, dim: DataFrame, key: String,
                     hotThreshold: Long): DataFrame = {
    val hotKeys = fact.groupBy(col(key))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > hotThreshold)
      .select(col(key))
    val factHot = fact.join(broadcast(hotKeys), Seq(key), "left_semi")
    val factCold = fact.join(broadcast(hotKeys), Seq(key), "left_anti")
    val dimHot = dim.join(broadcast(hotKeys), Seq(key), "left_semi")
    factHot.join(broadcast(dimHot), Seq(key))
      .unionByName(factCold.join(dim, Seq(key)))
  }
}
