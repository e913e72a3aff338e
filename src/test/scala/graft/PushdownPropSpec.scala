package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck pins for the DSv2 source's pushdown COMPOSITION (VERDICT r10
  * task 6): for random ranges, filters, limits, orderings, and aggregate
  * shapes, the pushed plan must agree with the same query over a
  * no-pushdown twin (`spark.range` + the generator's pure per-id
  * functions). This guards the partial/complete flags semantically — a
  * wrongly-"complete" push surfaces here as a value mismatch on some
  * generated case, not just as a plan-shape drift. */
class PushdownPropSpec extends SparkSpec {

  private def events(rows: Long): DataFrame =
    spark.read.format("graft.sources.EventsSource")
      .option("rows", rows).option("partitions", 4).load()

  /** The same relation with no pushdown capability in sight: a plain
    * range scan plus EventsSource's pure derivations. */
  private def twin(rows: Long): DataFrame =
    spark.range(rows).selectExpr(
      "id AS event_id",
      "id * 2654435761 % 1000 AS user_id",
      "element_at(array('view','click','purchase','signup','error'), " +
        "CAST(id * 31 % 5 AS INT) + 1) AS event_type",
      "1700000000000000 + id * 250000 AS ts_us",
      // CAST, not a 100.0 literal: decimal literals in SQL TEXT are
      // DecimalType and would make the twin's column dtype diverge
      "CAST(id * 7919 % 10000 AS DOUBLE) / CAST(100 AS DOUBLE) AS value")

  private def check(p: Prop, n: Int = 25): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val genRows: Gen[Long] = Gen.choose(0L, 3000L)
  private def genBound(rows: Long): Gen[Long] = Gen.choose(-50L, rows + 50L)
  private val genLimit: Gen[Int] = Gen.choose(1, 60)

  test("filter pushdown: any range conjunction equals the twin row-for-row") {
    check(Prop.forAll(genRows.flatMap(r =>
      genBound(r).flatMap(a => genBound(r).map(b => (r, a, b))))) {
      case (rows, a, b) =>
        def q(df: DataFrame) =
          df.filter(col("event_id") >= a && col("event_id") < b)
            .orderBy(col("event_id")).collect().toSeq
        q(events(rows)) == q(twin(rows))
    })
  }

  test("filter→limit: pushed count is exactly min(n, surviving range)") {
    check(Prop.forAll(genRows.flatMap(r =>
      genBound(r).flatMap(a => genLimit.map(n => (r, a, n))))) {
      case (rows, a, n) =>
        val got = events(rows).filter(col("event_id") >= a).limit(n)
          .collect().map(_.getLong(0))
        val avail = math.max(0L, rows - math.max(a, 0L))
        // LIMIT over an unordered relation may pick ANY n rows — pin the
        // count and that every returned id is from the surviving range
        got.length == math.min(n.toLong, avail) &&
          got.forall(id => id >= a && id < rows) && got.distinct.length == got.length
    })
  }

  test("filter→topN asc/desc: pushed (complete or partial) equals the twin") {
    check(Prop.forAll(genRows.flatMap(r => genBound(r).flatMap(a =>
      genLimit.flatMap(n => Gen.oneOf(true, false).map(d => (r, a, n, d)))))) {
      case (rows, a, n, desc) =>
        def q(df: DataFrame) = {
          val f = df.filter(col("event_id") >= a)
          val o = if (desc) f.orderBy(col("event_id").desc)
                  else f.orderBy(col("event_id"))
          o.limit(n).collect().map(_.getLong(0)).toSeq
        }
        q(events(rows)) == q(twin(rows))
    })
  }

  test("filter→aggregate: complete O(1) pushdown equals the twin exactly") {
    check(Prop.forAll(genRows.flatMap(r =>
      genBound(r).flatMap(a => genBound(r).map(b => (r, a, b))))) {
      case (rows, a, b) =>
        def q(df: DataFrame) =
          df.filter(col("event_id") >= a && col("event_id") <= b)
            .agg(count(lit(1)), min(col("event_id")), max(col("event_id")))
            .collect().toSeq
        q(events(rows)) == q(twin(rows))
    })
  }

  test("filter→grouped aggregate: residue-arithmetic groups equal the twin") {
    check(Prop.forAll(genRows.flatMap(r => genBound(r).flatMap(a =>
      Gen.oneOf("event_type", "user_id").map(g => (r, a, g))))) {
      case (rows, a, g) =>
        def q(df: DataFrame) =
          df.filter(col("event_id") >= a).groupBy(col(g))
            .agg(count(lit(1)), min(col("event_id")), max(col("event_id")))
            .orderBy(col(g)).collect().toSeq
        q(events(rows)) == q(twin(rows))
    })
  }

  test("limit below aggregate: the limit pushes, the aggregate must NOT") {
    // Aggregate(Limit(Scan)): the source sees pushLimit first; a later
    // pushAggregation must decline (aggKinds-after-limit is not planned)
    // and vice versa — pin the composed VALUE, which only the engine-side
    // aggregate over the truncated range can produce
    check(Prop.forAll(genRows.flatMap(r => genLimit.map(n => (r, n)))) {
      case (rows, n) =>
        val c = events(rows).limit(n).agg(count(lit(1))).head().getLong(0)
        c == math.min(n.toLong, rows)
    })
  }
}
