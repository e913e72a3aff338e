package graft

import graft.ops.{Analytics, Relational, TextOps}

/** Semantics pins for the round-7 revenue/cohort/divergence batch. The
  * DuckDB oracle proves engine parity; these prove the DEFINITIONS:
  * brute-force association rules, attribution revenue conservation, LTV
  * curve monotonicity, ntile balance, and Gibbs' inequality — invariants a
  * shared oracle-SQL bug could not fake.
  */
class RevenueStatsSpec extends SparkSpec {

  test("assoc_rules matches a brute-force basket recomputation") {
    val baskets = Tables(spark, sf001, "events")
      .selectExpr("user_id", "date_trunc('day', ts) AS day", "event_type")
      .distinct().collect()
      .map(r => ((r.get(0), r.get(1)), r.getString(2)))
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }.toSeq
    val nb = baskets.size.toDouble
    val itemC = baskets.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toDouble }
    val pairC = baskets.flatMap(b =>
        for (a <- b; c <- b if a != c) yield (a, c))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toDouble }
      .filter(_._2 >= 5)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = pairC.map { case ((a, c), cab) =>
      (a, c) -> ((cab.toLong, r6(cab / nb), r6(cab / itemC(a)),
        r6(cab * nb / (itemC(a) * itemC(c)))))
    }
    val got = Analytics.assocRules(spark, sf001).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"pair $k") }
  }

  test("attribution conserves total purchase revenue on both touch models") {
    val rows = Analytics.attribution(spark, sf001).collect()
    val total = Tables(spark, sf001, "events")
      .filter("event_type = 'purchase'")
      .agg(org.apache.spark.sql.functions.sum("value")).collect()(0)
      .getDouble(0)
    val nPurch = Tables(spark, sf001, "events")
      .filter("event_type = 'purchase'").count()
    assert(rows.map(_.getAs[Long]("lt_purchases")).sum == nPurch)
    assert(rows.map(_.getAs[Long]("ft_purchases")).sum == nPurch)
    assert(math.abs(rows.map(_.getAs[Double]("lt_revenue")).sum - total) < 1e-3)
    assert(math.abs(rows.map(_.getAs[Double]("ft_revenue")).sum - total) < 1e-3)
  }

  test("time_to_convert delays are ordered and counts are consistent") {
    val rows = Analytics.timeToConvert(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_viewers"))
      val med = r.getAs[Double]("median_delay_s")
      val p90 = r.getAs[Double]("p90_delay_s")
      assert(med >= 0.0 && p90 >= med)
    }
  }

  test("cohort_ltv cumulative revenue is a monotone running total") {
    val rows = Analytics.cohortLtv(spark, sf001).collect()
      .map(r => (r.getAs[Long]("cohort_week_us"), r.getAs[Long]("age_wk"),
        r.getAs[Long]("cohort_users"), r.getAs[Long]("buyers"),
        r.getAs[Double]("revenue"), r.getAs[Double]("cum_revenue")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, xs) =>
      val o = xs.sortBy(_._2)
      assert(o.map(_._2).distinct.length == o.length)
      var run = 0.0
      o.foreach { case (_, _, cu, b, rev, cum) =>
        assert(b <= cu)
        run += rev
        assert(math.abs(cum - run) < 1e-3)
      }
    }
  }

  test("rfm ntile buckets are balanced per dimension and cover all buyers") {
    val buyers = Tables(spark, sf001, "events")
      .filter("event_type = 'purchase'").select("user_id").distinct().count()
    val rows = Analytics.rfmSegments(spark, sf001).collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[Long]("users")))
    assert(rows.map(_._2).sum == buyers)
    // per-dimension marginal counts: standard ntile balance (sizes differ
    // by at most 1 when buyers >= 5)
    for (dim <- 0 to 2) {
      val marginal = rows.groupBy(_._1.split("-")(dim))
        .map { case (b, xs) => (b.toInt, xs.map(_._2).sum) }
      assert(marginal.keySet.subsetOf((1 to 5).toSet))
      if (buyers >= 5) {
        assert(marginal.size == 5)
        assert(marginal.values.max - marginal.values.min <= 1)
      }
    }
  }

  test("ohlc candles bound open/close within [low, high] and match firsts/lasts") {
    val ev = Tables(spark, sf001, "events")
      .selectExpr("event_type", "unix_micros(date_trunc('hour', ts)) AS h",
        "unix_micros(ts) AS t", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = ev.groupBy(e => (e._1, e._2)).map { case (k, xs) =>
      val o = xs.sortBy(e => (e._3, e._4))
      k -> ((r6(o.head._5), r6(o.map(_._5).max), r6(o.map(_._5).min),
        r6(o.last._5), o.length.toLong))
    }
    val got = Analytics.ohlc(spark, sf001).collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6)))
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"candle $k: ${got(k)} vs $v")
      val (open, high, low, close, _) = got(k)
      assert(low <= open && open <= high && low <= close && close <= high)
    }
  }

  test("gini_revenue matches a plain-Scala computation and stays in [0, 1)") {
    val cust = Tables(spark, sf001, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rev = Tables(spark, sf001, "events")
      .filter("event_type = 'purchase'")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.sum("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filter(t => cust.contains(t._1))
    val expected = rev.groupBy(t => cust(t._1)).map { case (seg, xs) =>
      val sorted = xs.map { case (id, x) => (r6(x), id) }.sortBy(identity)
      val n = sorted.length
      val sx = sorted.map(_._1).sum
      val sxi = sorted.zipWithIndex.map { case ((x, _), i) => x * (i + 1) }.sum
      seg -> r6(2.0 * sxi / (n * sx) - (n + 1.0) / n)
    }
    val got = Analytics.giniRevenue(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (seg, g) =>
      assert(math.abs(got(seg) - g) < 1e-6, s"$seg: ${got(seg)} vs $g")
      assert(got(seg) >= 0.0 && got(seg) < 1.0)
    }
    spark.catalog.clearCache()
  }

  test("weekly_churn counts users absent the following week; final week = 1.0") {
    val rows = Analytics.weeklyChurn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, act, ch, rate) =>
      assert(ch <= act)
      assert(math.abs(rate - ch.toDouble / act) < 1e-6)
    }
    assert(rows.last._4 == 1.0) // no week follows the last one
    spark.catalog.clearCache()
  }

  test("kaplan_meier survival is a non-increasing product matching Scala") {
    val e = Tables(spark, sf001, "events")
      .selectExpr("user_id", "unix_micros(date_trunc('day', ts)) AS d",
        "unix_micros(date_trunc('week', ts)) AS w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lastwk = e.map(_._3).max
    val dayUs = 86400000000L
    val life = e.groupBy(_._1).map { case (_, xs) =>
      val d0 = xs.map(_._2).min; val d1 = xs.map(_._2).max
      (((d1 - d0) / dayUs).toInt, if (d1 < lastwk) 1 else 0)
    }.toSeq
    val grouped = life.groupBy(_._1).map { case (t, xs) =>
      (t, xs.map(_._2).sum, xs.size)
    }.toSeq.sortBy(_._1)
    var atRisk = life.size
    var surv = 1.0
    val expected = grouped.map { case (t, d, m) =>
      val s = if (d == atRisk) 0.0
              else { surv *= 1.0 - d.toDouble / atRisk; surv }
      val row = (t, s)
      atRisk -= m
      row
    }.toMap
    val got = Analytics.kaplanMeier(spark, sf001).collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("survival")).toMap
    assert(got.keySet == expected.keySet)
    var prev = 1.0
    got.toSeq.sortBy(_._1).foreach { case (t, s) =>
      assert(s >= 0.0 && s <= prev + 1e-9, s"survival rises at t=$t")
      prev = s
      assert(math.abs(s - expected(t)) < 1e-5, s"t=$t: $s vs ${expected(t)}")
    }
  }

  test("top_supplier returns exactly the argmax of quarterly revenue") {
    val li = Tables(spark, sf001, "lineitem")
      .filter("l_shipdate >= TIMESTAMP '1996-01-01' AND " +
        "l_shipdate < TIMESTAMP '1996-04-01'")
      .selectExpr("l_suppkey",
        "l_extendedprice * (1 - l_discount) AS rev").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    def r2(x: Double) = BigDecimal(x)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bySupp = li.groupBy(_._1).map { case (k, xs) =>
      k -> r2(xs.map(_._2).sum) }
    val mx = bySupp.values.max
    val got = Relational.topSupplier(spark, sf001).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Double]("total_rev") == mx))
    assert(got.length == bySupp.values.count(_ == mx))
  }

  test("psi_drift terms are non-negative and reference shares sum to 1") {
    val rows = Analytics.psiDrift(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, _, _, term) => assert(term >= 0.0) }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
  }

  test("conversion_mi sums to a non-negative MI with probabilities closing") {
    val rows = Analytics.conversionMi(spark, sf001).collect()
      .map(r => (r.getAs[Double]("p_xy"), r.getAs[Double]("mi_term")))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-4)
    assert(rows.map(_._2).sum >= -1e-9) // MI is a KL divergence
  }

  test("kl_divergence satisfies Gibbs' inequality and a Scala recompute") {
    val docsL = Tables(spark, sf001, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val corpus = docsL.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toDouble }
    val n = corpus.values.sum
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docsL.groupBy(_._1).map { case (src, ds) =>
      val cnt = ds.flatMap(_._2).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toDouble }
      val ns = cnt.values.sum
      val kl = cnt.map { case (t, c) =>
        (c / ns) * math.log((c / ns) / (corpus(t) / n)) }.sum
      src -> kl
    }
    val got = TextOps.klDivergence(spark, sf001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("kl_div"), r.getAs[Double]("entropy"))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (src, (kl, ent)) =>
      assert(kl >= 0.0, s"Gibbs violated for $src")
      assert(ent >= 0.0)
      assert(math.abs(kl - r6(expected(src))) < 1e-5, s"$src kl")
    }
  }
}
