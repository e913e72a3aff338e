package graft

import graft.ops.AffineSketch

/** Pins the affine-hash oracle twins against literals computed by an
  * INDEPENDENT implementation (DuckDB SQL over the same parquet, run
  * offline) — so the Spark pipeline is checked against something other
  * than itself even before the driver's oracle gate runs. */
class AffineSketchSpec extends SparkSpec {

  test("minhash affine twin reproduces the independent 30-pair set") {
    val rows = AffineSketch.minhashAffine(spark, sf001).collect()
    assert(rows.length == 30)
    val asTuples = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(asTuples.head == ((0L, 50L, 1.0)))
    assert(asTuples.last == ((474L, 498L, 1.0)))
    assert(asTuples.contains((33L, 436L, 0.90625)))
    assert(asTuples.contains((54L, 275L, 0.5)))
    // estimates are exact multiples of 1/32 in [0.5, 1] by construction
    assert(asTuples.forall { case (_, _, e) =>
      e >= 0.5 && e <= 1.0 && (e * 32).isWhole
    })
  }

  test("edit-verify composes sketch candidates with the exact thresholded DP") {
    val df = AffineSketch.editVerify(spark, sf001)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getDouble(4)))
    assert(rows.length == 28)
    assert(rows.head == ((0L, 50L, 1.0, 4, 0.03125)))
    assert(rows.contains((0L, 82L, 1.0, 4, 0.030303)))
    assert(rows.last == ((474L, 498L, 1.0, 4, 0.007737)))
    assert(rows.map(_._4).sum == 132)
    // every survivor is a true near-dup: rel <= 0.3 and the thresholded
    // DP never emitted its -1 early-exit sentinel
    assert(rows.forall { case (a, b, e, d, rel) =>
      a < b && e >= 0.0 && d >= 0 && rel <= 0.3
    })
    // candidate generation stays the banded equi join; the DP join is equi
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
    spark.catalog.clearCache()
  }

  test("simhash affine twin reproduces the independent pair set") {
    val rows = AffineSketch.simhashAffine(spark, sf001).collect()
    assert(rows.length == 95)
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(m((0L, 50L)) == 1)
    assert(m((0L, 82L)) == 0) // exact-duplicate text => identical signature
    assert(m((1L, 16L)) == 6)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1) && r.getInt(2) <= 6))
  }

  test("winnowing affine twin reproduces per-doc counts and checksums") {
    val rows = AffineSketch.winnowAffine(spark, sf001).collect()
    assert(rows.length == 500)
    val byDoc = rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byDoc(0L) == ((51L, 3199229096L)))
    assert(byDoc(1L) == ((173L, 11147162652L)))
    assert(rows.map(_.getLong(1)).sum == 60283L)
    assert(rows.map(_.getLong(2)).sum == 4195014534778L)
  }

  test("srp affine twin reproduces the independent pair set") {
    val rows = AffineSketch.srpAffine(spark, sf001).collect()
    assert(rows.length == 33)
    val asTuples = rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(asTuples.head == ((6L, 434L, 6)))
    assert(asTuples.contains((24L, 379L, 5)))
    assert(asTuples.forall { case (a, b, h) => a < b && h <= 6 })
  }

  test("affine candidate generation stays a banded equi join (no BNLJ/cartesian)") {
    Seq(AffineSketch.minhashAffine(spark, sf001),
        AffineSketch.simhashAffine(spark, sf001),
        AffineSketch.srpAffine(spark, sf001)).foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
      assert(!p.contains("CartesianProduct"), p.take(3000))
    }
    spark.catalog.clearCache()
  }

  test("winnow pair detection reproduces the independent 133-pair set") {
    val rows = AffineSketch.winnowPairs(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 133)
    assert(rows.head == ((0L, 50L, 3L)))
    assert(rows.last == ((474L, 498L, 28L)))
    assert(rows.contains((8L, 12L, 26L)))
    assert(rows.forall { case (a, b, n) => a < b && n >= 3 })
  }

  test("affine twins agree with DuckDB on adversarial edge inputs") {
    // The oracle gate proves cross-engine agreement on the real corpus,
    // which contains no adversarial strings. This fixture pins the edge
    // semantics against values computed by the independent DuckDB
    // implementation offline: empty text, single-word text (no shingle),
    // consecutive spaces (empty tokens in BOTH engines' split), texts of
    // length 8..10 (grams exist but no full winnowing window), exact
    // duplicates, and multi-byte UTF-8 (md5 over utf-8 bytes, substr over
    // characters — identical in both engines).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("affine_edge").toString
    Seq(
      (0L, "a"),
      (1L, ""),
      (2L, "a  b"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "the quick brown fox jumps over the lazy dog again and again"),
      (5L, "Ünïcödé tèxt with àccents répéated Ünïcödé tèxt with àccents"),
      (6L, "abcdefghij") // 10 chars: grams exist, no full window
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val mh = AffineSketch.minhashAffine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(mh.toSeq == Seq((3L, 4L, 1.0))) // exact dup; no-shingle docs absent

    val sh = AffineSketch.simhashAffine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sh.toSeq == Seq((3L, 4L, 0)))

    val wn = AffineSketch.winnowAffine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical text => identical fingerprints (the winnowing guarantee);
    // docs 0-2 and 6 produce no full window and are absent on BOTH engines
    assert(wn.toSeq == Seq(
      (3L, 22L, 1525963514L), (4L, 22L, 1525963514L), (5L, 19L, 1836006563L)))
  }

  test("hll affine twin reproduces the independent estimates") {
    val rows = AffineSketch.hllAffine(spark, sf001).collect()
    val m = rows.map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(m.keySet == Set("all", "click", "error", "purchase", "signup", "view"))
    assert(m("all") == ((1000L, 1040.8, 0.0408)))
    assert(m("click") == ((210L, 202.6, 0.0350)))
    assert(m("view") == ((188L, 191.8, 0.0204)))
    // every scope within ~2.3 sigma of the m=256 standard error (6.5%)
    assert(m.values.forall(_._3 <= 0.15))
  }

  test("kmv affine twin reproduces the independent estimates") {
    val rows = AffineSketch.kmvAffine(spark, sf001).collect()
    val m = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m.keySet == Set("all", "click", "error", "purchase", "signup", "view"))
    assert(m("all") == ((1000L, 982.2)))
    assert(m("signup") == ((199L, 166.2)))
    assert(m("view") == ((188L, 180.9)))
  }

  test("cosine LSH affine twin reproduces the independent pair set") {
    val df = AffineSketch.cosineLshAffine(spark, sf001)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 194)
    assert(rows.head._1 == 1L && rows.head._2 == 129L &&
      math.abs(rows.head._3 - 0.351480929788176) < 1e-12)
    assert(math.abs(rows.last._3 - 0.41015414162578445) < 1e-12)
    assert(math.abs(rows.map(_._3).max - 0.4790154024684951) < 1e-12)
    assert(rows.forall { case (a, b, c) => a < b && c >= 0.35 })
    // candidate generation must stay the banded equi self-join
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
    spark.catalog.clearCache()
  }

  test("kmv user-day twin reproduces per-type and set-algebra estimates") {
    val rows = AffineSketch.kmvUsersAffine(spark, sf001).collect()
    val m = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m.keySet == Set("click", "click&view", "click|view",
      "error", "purchase", "signup", "view"))
    assert(m("click")._1 == 165L &&
      math.abs(m("click")._2 - 168.38771566101107) < 1e-9)
    assert(m("click|view")._1 == 265L &&
      math.abs(m("click|view")._2 - 251.5458341985841) < 1e-9)
    assert(m("click&view")._1 == 53L &&
      math.abs(m("click&view")._2 - 62.88645854964602) < 1e-9)
    // union ≥ max side, intersection ≤ min side — estimator sanity
    assert(m("click|view")._2 >= m("click")._2.max(m("view")._2) * 0.8)
    assert(m("click&view")._2 <= m("click")._2.min(m("view")._2))
    spark.catalog.clearCache()
  }

  test("exact-integer PQ twin: codes, SSE checksum, full codebook usage") {
    val rows = AffineSketch.pqAffine(spark, sf001).collect()
    assert(rows.length == 500)
    val byId = rows.map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // init vectors stay nearest their own (updated) centroid in every subspace
    assert(byId(0L)._1 == "0,0,0,0,0,0,0,0")
    assert(byId(499L)._1 == "6,1,4,6,0,1,3,5")
    assert(rows.map(_.getLong(2)).sum == 381543802416842L)
    assert(rows.forall(_.getLong(2) > 0L))
    // all 8 centroids of the codebook are actually used
    val used = rows.flatMap(_.getString(1).split(",")).toSet
    assert(used == (0 to 7).map(_.toString).toSet)
    spark.catalog.clearCache()
  }

  test("PQ-ADC twin: per-query top-3 by exact integer estimated distance") {
    val rows = AffineSketch.pqAdcAffine(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 15)
    assert(rows.head == ((0L, 1, 453L, 805853937240L)))
    // adc is monotone in rank within each query; self never appears
    rows.groupBy(_._1).foreach { case (q, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1, 2, 3))
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq)
      assert(g.forall(_._3 != q))
    }
    spark.catalog.clearCache()
  }

  test("dedup PR funnel: verification only ever raises precision, never recall") {
    val r = AffineSketch.dedupPr(spark, sf001).collect().head
    def l(n: String) = r.getLong(r.fieldIndex(n))
    def d(n: String) = r.getDouble(r.fieldIndex(n))
    // pred ⊆ cand ⇒ the verified stage cannot beat banding's recall, and
    // dropping low-agreement candidates cannot lower precision
    assert(l("n_pred") <= l("n_cand"))
    assert(l("tp_pred") <= l("tp_cand"))
    assert(d("recall_pred") <= d("recall_cand"))
    assert(d("prec_pred") >= d("prec_cand"))
    // near-exact planted dups: the sketch should recover the truth set
    assert(l("n_truth") > 0)
    assert(d("recall_cand") == 1.0, "banding must not lose a true pair here")
    // a 32-hash estimate has ±1/32 granularity at the threshold, so one
    // borderline pair may survive (measured 14/15 at sf0.001) — but the
    // verification stage must still remove the bulk of the band noise
    assert(d("prec_pred") >= 0.9, s"prec_pred ${d("prec_pred")}")
    assert(d("prec_pred") >= 2 * d("prec_cand"),
      "verification must deliver a real precision lift")
    spark.catalog.clearCache()
  }
}
