package graft

import org.apache.spark.sql.Row

import graft.ops.{Analytics, Curation, EventOps, TextOps}

/** Semantics pins for the round-7 statistics/retrieval/graph batch. The
  * DuckDB oracle proves engine parity; these prove the DEFINITIONS by
  * independent recomputation — plain-Scala BM25 / MAD / triangle-brute-force
  * over the same fixture, and the CUSUM closed form against the textbook
  * recursion it replaces.
  */
class BatchStatsSpec extends SparkSpec {

  test("CUSUM closed form equals the sequential recursion") {
    // S_n = max(0, S_{n-1} + x_n - k)  vs  P_n - min(0, min_{j<=n} P_j)
    // for P_n = prefix sum of (x - k) — the identity the window-function
    // plan relies on. Adversarial series: bursts, zeros, deep negatives.
    val series = Seq(0.0, 5.0, 1.0, 0.0, 0.0, 9.0, 9.0, 0.0, 2.0, 0.0,
      7.0, 0.0, 0.0, 0.0, 11.0, 3.0)
    for (k <- Seq(0.5, 2.0, 3.7)) {
      var sRec = 0.0
      var p = 0.0
      var minP = 0.0
      series.foreach { x =>
        sRec = math.max(0.0, sRec + x - k)
        p += x - k
        minP = math.min(minP, p)
        val closed = p - math.min(0.0, minP)
        assert(math.abs(closed - sRec) < 1e-12,
          s"closed=$closed recursive=$sRec at x=$x k=$k")
      }
    }
  }

  test("cusum_changepoint alarms are positive and above the 4-sigma gate") {
    val out = Analytics.cusumChangepoint(spark, sf001).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("cusum_stat") > 0.0))
  }

  test("mad_outliers matches a plain-Scala recomputation") {
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val ev = Tables(spark, sf001, "events")
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = ev.groupBy(_._2)
    val expected: Map[Long, Double] = byType.toSeq.flatMap { case (_, rows) =>
      val med = median(rows.map(_._3).toSeq)
      val mad = median(rows.map(r => math.abs(r._3 - med)).toSeq)
      rows.toSeq.flatMap { case (id, _, v) =>
        val z = BigDecimal(0.6745 * (v - med) / mad)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (math.abs(z) > 3.5) Some(id -> z) else None
      }
    }.toMap
    val got = EventOpsSpecHelpers.rowsToMap(
      Analytics.madOutliers(spark, sf001).collect())
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, z) =>
      assert(math.abs(got(id) - z) < 1e-9, s"event $id: ${got(id)} vs $z")
    }
  }

  test("ab_test z-statistic is self-consistent with its reported counts") {
    Analytics.abTest(spark, sf001).collect().foreach { r =>
      val na = r.getAs[Long]("n_a").toDouble
      val ca = r.getAs[Long]("conv_a").toDouble
      val nb = r.getAs[Long]("n_b").toDouble
      val cb = r.getAs[Long]("conv_b").toDouble
      val pool = (ca + cb) / (na + nb)
      val z = (cb / nb - ca / na) /
        math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
      assert(math.abs(r.getAs[Double]("z_stat") - z) < 1e-3)
      assert(r.getAs[Boolean]("significant") == (math.abs(
        BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) > 1.96))
    }
  }

  test("event_patterns counts the vc*p motif exactly as Java regex does") {
    val out = Analytics.eventPatterns(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val seq = r.getAs[String]("seq")
      assert(r.getAs[Int]("seq_len") == seq.length)
      assert(r.getAs[Int]("n_conversions") ==
        "vc*p".r.findAllMatchIn(seq).size)
    }
  }

  test("bm25 scores match a plain-Scala inverted-index recomputation") {
    val qset = Set("spark", "window", "join", "hash")
    val docsL = Tables(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val n = docsL.length.toDouble
    val avgdl = docsL.map(_._2.length).sum.toDouble / n
    val df = qset.map(t =>
      t -> docsL.count(_._2.contains(t)).toDouble).toMap
    val scores = docsL.map { case (id, toks) =>
      val dl = toks.length.toDouble
      val sc = qset.toSeq.sorted.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) *
          tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
      id -> sc
    }.filter(_._2 > 0)
    val top = scores.sortBy { case (id, sc) => (-sc, id) }.take(10)
    val got = TextOps.bm25(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25")))
    assert(got.map(_._1).toSeq == top.map(_._1).toSeq)
    got.zip(top).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-5)
    }
  }

  test("triangle_count equals brute force over the derived graph") {
    val n = Tables(spark, sf001, "documents").count()
    val edges = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i + 2) % n), (i, (i * 31 + 7) % n))
    }.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      (a, b) <- edges
      c <- nodes if c > b
      if edges.contains((a, c)) && edges.contains((b, c))
    } {
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
    }
    val expected = triPerNode.toSeq
      .sortBy { case (node, cnt) => (-cnt, node) }.take(20)
    val got = Curation.triangleCount(spark, sf001).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("tri_cnt"))).toSeq
    assert(got == expected)
  }

  test("graph_bfs hop counts equal a plain-Scala BFS") {
    val n = Tables(spark, sf001, "documents").count()
    val und = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i + 2) % n), (i, (i * 31 + 7) % n))
    }.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val adj = und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2) }
    val dist = scala.collection.mutable.Map(0L -> 0)
    var level = Seq(0L); var hop = 0
    while (level.nonEmpty) {
      hop += 1
      level = level.flatMap(adj.getOrElse(_, Nil))
        .filterNot(dist.contains).distinct
      level.foreach(v => dist(v) = hop)
    }
    val got = Curation.graphBfs(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == dist.toMap)
    spark.catalog.clearCache()
  }

  test("wow_growth is self-consistent with its own revenue series") {
    val rows = Analytics.wowGrowth(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, xs) =>
      val o = xs.sortBy(_._2).toSeq
      assert(o.head._4.isEmpty) // first week has no prior
      o.sliding(2).foreach {
        case Seq((_, _, prev, _), (_, _, cur, Some(g))) =>
          val want = (cur - prev) / prev
          assert(math.abs(g - want) < 1e-4)
        case _ =>
      }
    }
  }

  test("incremental_agg merge reproduces the from-scratch aggregate") {
    val rows = EventOps.incrementalAgg(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("matches_full")))
  }

  test("interval_overlap emits each (session, window) once with sane bounds") {
    val rows = EventOps.intervalOverlap(spark, sf001).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("sid"), r.getAs[String]("window_id")))
    assert(keys.distinct.length == keys.length)
    assert(rows.forall { r =>
      val o = r.getAs[Double]("overlap_s"); o >= 0.0 && o <= 7200.0
    })
  }

  test("cooccur_pmi is support-floored and rank-ordered") {
    val rows = TextOps.cooccurPmi(spark, sf001).collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getAs[Long]("c_ab") >= 5L))
    val pmis = rows.map(_.getAs[Double]("pmi")).toSeq
    assert(pmis == pmis.sorted.reverse)
  }
}

private object EventOpsSpecHelpers {
  def rowsToMap(rows: Array[Row]): Map[Long, Double] =
    rows.map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("robust_z"))
      .toMap
}
