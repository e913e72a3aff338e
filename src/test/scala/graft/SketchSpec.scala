package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.ops.Analytics

/** Pins the Misra–Gries heavy-hitters guarantees the query path relies on
  * (see `functions.MisraGries` scaladoc):
  *
  *  1. Under counter overflow, estimates never overcount, undercount by at
  *     most n/(capacity+1), and every key with true frequency above
  *     n/(capacity+1) survives — asserted on a skewed stream aggregated
  *     across 8 partitions (so the merge path, not just reduce, is
  *     exercised).
  *  2. With distinct keys <= capacity the sketch is exact — the mode
  *     `q_heavy_hitters` runs in, cross-checked against groupBy counts.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries guarantee on a skewed stream across 8 partitions") {
    val capacity = 8
    // 1000×hot + 300×warm + 50 rare keys ×4 = n=1500; bound n/(cap+1)=166.66
    val data = Seq.fill(1000)("hot") ++ Seq.fill(300)("warm") ++
      (0 until 50).flatMap(i => Seq.fill(4)(s"rare_$i"))
    val n = data.length
    val bound = n.toDouble / (capacity + 1)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val mg = udaf(new MisraGries(capacity), Encoders.STRING)
    val est = spark.createDataset(scala.util.Random.shuffle(data))
      .repartition(8)
      .agg(mg(col("value")).as("hh"))
      .select(explode(col("hh")).as(Seq("key", "est")))
      .as[(String, Long)].collect().toMap

    assert(est.size <= capacity, s"summary exceeded capacity: ${est.size}")
    est.foreach { case (k, e) =>
      assert(e <= truth(k), s"$k overcounted: est=$e true=${truth(k)}")
      assert(truth(k) - e <= bound,
        s"$k undercounted past bound: est=$e true=${truth(k)} bound=$bound")
    }
    truth.filter(_._2 > bound).keys.foreach { k =>
      assert(est.contains(k), s"frequent key $k (true=${truth(k)}) missing")
    }
  }

  test("property: MG guarantee holds for ANY stream, capacity, and merge tree") {
    // pure-Scala ScalaCheck property over the Aggregator's own
    // zero/reduce/merge — random skewed streams, random chunking into
    // partitions, fold-merge of partials (the worst-case left-deep merge
    // tree) — estimates never overcount, undercount is bounded by
    // n/(cap+1), and no key above the bound goes missing
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      capacity <- Gen.choose(2, 12)
      keys <- Gen.nonEmptyListOf(Gen.frequency(
        8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
        3 -> Gen.choose(0, 30).map(i => s"mid_$i"),
        2 -> Gen.choose(0, 500).map(i => s"rare_$i")))
      nChunks <- Gen.choose(1, 8)
    } yield (capacity, keys, nChunks)
    val prop = Prop.forAll(gen) { case (capacity, keys, nChunks) =>
      val mg = new MisraGries(capacity)
      val chunks = keys.grouped(math.max(1, keys.size / nChunks)).toList
      val partials = chunks.map(_.foldLeft(mg.zero)(mg.reduce))
      val est = mg.finish(partials.foldLeft(mg.zero)(mg.merge))
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = keys.size.toDouble / (capacity + 1)
      est.size <= capacity &&
        est.forall { case (k, e) =>
          e <= truth(k) && truth(k) - e <= bound } &&
        truth.forall { case (k, t) => t <= bound || est.contains(k) }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("exact when distinct keys fit capacity; q_heavy_hitters matches groupBy") {
    val hh = Analytics.queries("q_heavy_hitters")(spark, sf001)
      .as[(String, Long)].collect()
    val exact = Tables(spark, sf001, "events")
      .groupBy(concat_ws(":", col("event_type"),
        pmod(col("user_id"), lit(20))).as("key"))
      .agg(count(lit(1)).as("est"))
      .orderBy(col("est").desc, col("key"))
      .as[(String, Long)].collect()
    assert(hh.toSeq === exact.toSeq)
  }

  test("KmvSketch: merge of partial sketches equals the single-pass sketch") {
    // mergeability is what makes the sketch shuffle-safe: reduce over two
    // halves then merge must give byte-identical state to one full pass
    val kmv = new graft.functions.KmvSketch(32)
    val xs = (1 to 500).map(i => (i.toLong * 2654435761L) ^ (i * 97L))
    val (h1, h2) = xs.splitAt(250)
    val s1 = h1.foldLeft(kmv.zero)(kmv.reduce)
    val s2 = h2.foldLeft(kmv.zero)(kmv.reduce)
    val whole = xs.foldLeft(kmv.zero)(kmv.reduce)
    assert(kmv.merge(s1, s2).toSeq === whole.toSeq)
    // duplicates must not distort the sketch (distinct semantics)
    val dup = (xs ++ xs).foldLeft(kmv.zero)(kmv.reduce)
    assert(dup.toSeq === whole.toSeq)
    assert(whole.length === 32 && whole.toSeq === whole.sorted.toSeq)
  }

  test("KMV estimates: per-group, union, and intersection within 20% of exact") {
    val rows = Analytics.kmvUsers(spark, sf001).collect()
    assert(rows.length >= 7)
    val scopes = rows.map(_.getString(0))
    assert(scopes.contains("click|view union") && scopes.contains("click&view intersect"))
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("rel_err")) <= 0.2,
        s"${r.getString(0)}: rel_err ${r.getDouble(r.fieldIndex("rel_err"))}")
    }
  }

  test("CMS never underestimates and stays within the epsilon-N error bound") {
    val rows = Analytics.cmsFreq(spark, sf001).collect()
    assert(rows.nonEmpty)
    val n = graft.Tables(spark, sf001, "events").count()
    // one-sided error: exact <= est <= exact + N*e/w (w=32, here with 4
    // rows the bound holds deterministically on the fixture — structural
    // >= is the CMS guarantee, the upper bound is the accuracy check)
    val epsN = math.E / 32.0 * n
    rows.foreach { r =>
      val over = r.getLong(r.fieldIndex("overest"))
      assert(over >= 0L, s"user ${r.getLong(0)} underestimated")
      assert(over <= epsN, s"user ${r.getLong(0)} overest $over > eps*N $epsN")
    }
  }

  test("Bloom filter: zero false negatives; false positives measured, bounded") {
    val rows = Analytics.bloomAudit(spark, sf001).collect()
    val byKey = rows.map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // every true member must hit — (member, !hit) bucket cannot exist
    assert(!byKey.contains((true, false)), s"false negatives: $byKey")
    val members = graft.Tables(spark, sf001, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(byKey.getOrElse((true, true), 0L) === members)
    // measured FP share among non-members stays under ~3x the analytic
    // (1 - e^(-kn/m))^k bound for k=3, m=1024 at the fixture's n
    val fp = byKey.getOrElse((false, true), 0L)
    val nonMembers = (1000L - members).toDouble
    val analytic = math.pow(1.0 - math.exp(-3.0 * members / 1024.0), 3)
    assert(fp.toDouble / nonMembers <= math.max(3 * analytic, 0.01),
      s"fp rate ${fp / nonMembers} vs analytic $analytic")
  }
}
