package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Accuracy gates for the sketch-based aggregates (the 100 TB variants the
  * exact-oracle path can't hash-compare): approx_count_distinct (HLL++) and
  * approx_percentile (KLL-style). Each is asserted against its exact twin
  * on the same data at the tolerance the query claims.
  */
class AccuracySpec extends SparkSpec {

  test("approx_count_distinct within ±2% of exact countDistinct per group") {
    val approx = Relational.queries("q_approx_distinct")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val err = math.abs(approx(k) - ex).toDouble / ex
      assert(err <= 0.02, s"group $k: approx=${approx(k)} exact=$ex err=$err")
    }
  }

  test("approx_percentile quartiles within 1% of exact percentile per group") {
    val approx = Relational.queries("q_approx_percentile")(spark, sf001)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = Tables(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      approx(k).zip(ex).zipWithIndex.foreach { case ((a, e), i) =>
        val err = math.abs(a - e) / e
        assert(err <= 0.01, s"group $k quartile $i: approx=$a exact=$e err=$err")
      }
    }
  }

  test("deterministic-sample percentiles within 20% of exact per group") {
    // the fully-oracled twin of q_approx_percentile: a 1-in-8 md5 sample
    // gives rank error ~1/sqrt(n/8); at sf0.001 (~250 sampled rows per
    // flag) the worst observed value-space error is ~11%, so 20% bounds
    // it with slack while still catching a broken sample predicate
    // (whole-population or near-empty samples push errors to 0 or blow
    // past the bound via n_sample below)
    val rows = Relational.queries("q_sample_percentile")(spark, sf001).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (n, ns) = (r.getLong(1), r.getLong(2))
      assert(math.abs(ns.toDouble / n - 0.125) < 0.03, s"sample fraction $ns/$n")
      assert(r.getDouble(7) / r.getDouble(3) <= 0.2) // err50 / p50_exact
      assert(r.getDouble(8) / r.getDouble(5) <= 0.2) // err90 / p90_exact
    }
  }

  test("ivf-ann recall@5 holds at sf0.1 (2000-vector corpus)") {
    // TextVectorSpec pins the floor on the 500-vector sf0.001 fixture;
    // this re-checks the same 6/16-cell multiprobe config at the bench
    // scale factor, where cells are 4x fuller and the quantizer fit sees
    // a corpus it did not memorize.
    val recalls = graft.ops.VectorOps.annIvfRecall(spark, "/root/testdata/sf0.1")
      .collect().map(_.getDouble(1))
    assert(recalls.nonEmpty)
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.8, s"avg ivf recall@5 at sf0.1 = $avg")
  }
}
