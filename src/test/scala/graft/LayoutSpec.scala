package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** File-layout / data-skipping posture: a range-partitioned, sorted write
  * produces files whose per-file key ranges are pairwise DISJOINT, so a
  * point or range predicate on the layout key prunes to O(1) files via
  * parquet row-group min/max stats — the single cheapest lever for
  * repeated scans of a 100 TB fact table (the Snowflake/Delta clustering
  * idea, done with nothing but repartitionByRange + sortWithinPartitions).
  *
  * The spec measures the property the optimizer relies on (disjoint file
  * min/max), not the engine's pruning implementation — pruning itself is
  * pinned separately in PartitionPruningSpec/PlanSpec.
  */
class LayoutSpec extends SparkSpec {

  test("range-partitioned sorted write yields disjoint per-file key ranges") {
    val dir = Files.createTempDirectory("graft_layout").toFile
    dir.deleteOnExit()
    val out = s"${dir.getAbsolutePath}/orders_by_price"

    Tables(spark, sf001, "orders")
      .repartitionByRange(8, col("o_totalprice"))
      .sortWithinPartitions(col("o_totalprice"))
      .write.mode("overwrite").parquet(out)

    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 8, s"expected 8 range files, got ${files.length}")

    // per-file [min, max] of the layout key, read file-by-file
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_totalprice")), max(col("o_totalprice")))
        .head()
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)

    ranges.sliding(2).foreach {
      case Array((_, prevMax), (curMin, _)) =>
        assert(curMin >= prevMax,
          s"overlapping file ranges: prev max $prevMax > next min $curMin")
      case _ =>
    }

    // nothing lost in the re-layout
    val n = spark.read.parquet(out).count()
    assert(n == Tables(spark, sf001, "orders").count())

    // and a selective range predicate must reach the scan as a pushed filter
    val plan = spark.read.parquet(out)
      .filter(col("o_totalprice") < 1000.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), LessThan(o_totalprice,1000.0)]"),
      s"range filter not pushed to parquet scan:\n$plan")
  }

  test("z-order layout bounds per-file span in BOTH dimensions; 1-D sort does not") {
    import graft.ops.Layout
    val dir = Files.createTempDirectory("graft_zorder").toFile
    dir.deleteOnExit()

    // bucket both keys to a 64×64 grid
    val grid = Tables(spark, sf001, "orders")
      .withColumn("ca", pmod(col("o_custkey"), lit(64)).cast("long"))
      .withColumn("pb", least(floor(col("o_totalprice") / 7813.0), lit(63)).cast("long"))

    def spans(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      val perFile = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col("ca")) - min(col("ca")), max(col("pb")) - min(col("pb")))
          .head()
        (r.getLong(0).toDouble, r.getLong(1).toDouble)
      }
      (perFile.map(_._1).sum / perFile.length, perFile.map(_._2).sum / perFile.length)
    }

    // 1-D layout on price bucket: tight on pb, blind on ca
    val oneD = s"${dir.getAbsolutePath}/oned"
    grid.repartitionByRange(16, col("pb")).sortWithinPartitions(col("pb"))
      .write.mode("overwrite").parquet(oneD)
    val (oneDCa, oneDPb) = spans(oneD)

    // z-order layout: bounded on BOTH
    val zed = s"${dir.getAbsolutePath}/zed"
    Layout.zorderBy(grid, 16, col("ca"), col("pb"), bits = 6)
      .write.mode("overwrite").parquet(zed)
    val (zCa, zPb) = spans(zed)

    // 16 files over a 64×64 grid: a contiguous z-range of ~256 cells spans
    // ≲ 32 per axis (+ragged boundaries); the 1-D layout leaves the
    // off-sort dimension at full 64-wide span in every file.
    assert(oneDCa > 55.0, s"1-D layout unexpectedly clustered ca: $oneDCa")
    assert(zCa < 48.0, s"z-order did not bound custkey span: $zCa")
    assert(zPb < 48.0, s"z-order did not bound price span: $zPb")
    assert(oneDPb < 16.0, s"1-D layout should be tight on its own key: $oneDPb")
  }

  test("withHilbert on a full 64×64 grid: bijection, 16×16 aligned zones, unit steps") {
    import graft.ops.Layout
    val grid = spark.range(4096)
      .withColumn("a", expr("id div 64"))
      .withColumn("b", expr("id % 64"))
    val cells = Layout.withHilbert(grid, col("a"), col("b"), 6, "d")
      .select("a", "b", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // bijection onto [0, 4096)
    val ds = cells.map(_._3)
    assert(ds.distinct.length === 4096)
    assert(ds.min === 0L && ds.max === 4095L)

    // every aligned 256-cell range is an exact 16×16 square (quadtree
    // traversal property — same min/max-skipping guarantee as Morton)
    cells.groupBy(_._3 / 256).foreach { case (z, cs) =>
      val (as, bs) = (cs.map(_._1), cs.map(_._2))
      assert(as.max - as.min === 15L, s"zone $z a-span")
      assert(bs.max - bs.min === 15L, s"zone $z b-span")
    }

    // the property Morton lacks: EVERY curve step is Manhattan distance 1
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Array((a0, b0, _), (a1, b1, _)) =>
      assert(math.abs(a1 - a0) + math.abs(b1 - b0) === 1L)
    }
  }

  test("q_hilbert_zones: occupied-cell zones stay inside 16×16 squares") {
    val rows = graft.ops.Audit.hilbertZones(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= 16L && r.getLong(3) <= 16L,
        s"hilbert zone ${r.getLong(0)} spans ${r.getLong(2)}×${r.getLong(3)}")
    }
    // zones partition the occupied cells exactly once
    val nCells = Tables(spark, sf001, "events")
      .select((col("user_id") % 64).as("a"), (col("event_id") % 64).as("b"))
      .distinct().count()
    assert(rows.map(_.getLong(1)).sum === nCells)
  }

  test("q_zorder_zones: aligned Morton zones bound BOTH spans, 1-D zones don't") {
    val rows = graft.ops.Audit.zorderZones(spark, sf001).collect()
    val (m, b) = rows.partition(_.getString(0) == "morton")
    assert(m.nonEmpty && b.nonEmpty)
    // an aligned 256-cell z-range is a 16×16 Morton square
    m.foreach { r =>
      assert(r.getLong(3) <= 16L && r.getLong(4) <= 16L,
        s"morton zone ${r.getLong(1)} spans ${r.getLong(3)}×${r.getLong(4)}")
    }
    // the b-sorted layout is tight on b but spans the whole a-domain
    // (at sf0.001 only 15 users exist, so the domain is 15 wide, not 64)
    val aSpan = Tables(spark, sf001, "events")
      .agg(max(col("user_id") % 64) - min(col("user_id") % 64) + 1)
      .head().getLong(0)
    assert(b.forall(_.getLong(4) <= 4L))
    assert(b.exists(_.getLong(3) === aSpan))
    // both layouts cover every row exactly once
    assert(m.map(_.getLong(2)).sum === b.map(_.getLong(2)).sum)
  }
}
