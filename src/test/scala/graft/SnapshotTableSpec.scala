package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** The versioned-snapshot table's ACID contract (r12 verdict task 5):
  * optimistic concurrency (two racing writers, exactly one winner per
  * version, loser rebases and both commits land), snapshot isolation /
  * time travel (older versions unchanged by later commits), and the
  * commit-log invariants. The oracle-facing MERGE/DELETE semantics are
  * hash-gated by `q_time_travel`; these are the races and failure modes
  * SQL can't express. */
class SnapshotTableSpec extends SparkSpec {

  private def freshTable(tag: String): String = {
    val d = s"${sys.props("user.dir")}/target/oracle_inputs/p${ProcessHandle.current().pid()}/snapspec_$tag"
    // fresh per run: specs must not see a previous run's commits
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).iterator().forEachRemaining(rm)
      Files.deleteIfExists(p)
    }
    rm(Paths.get(d))
    d
  }

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toSeq.toDF("id")
  }

  test("append/read round-trip and monotone versions") {
    val t = freshTable("basic")
    assert(SnapshotTable.latestVersion(t) === 0)
    assert(SnapshotTable.append(spark, t, df(1, 2, 3)) === 1)
    assert(SnapshotTable.append(spark, t, df(4, 5)) === 2)
    assert(SnapshotTable.latestVersion(t) === 2)
    val got = SnapshotTable.read(spark, t).orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("time travel: older versions are immutable under later commits") {
    val t = freshTable("tt")
    SnapshotTable.append(spark, t, df(1, 2, 3))
    val v1Before = SnapshotTable.read(spark, t, Some(1))
      .collect().map(_.getLong(0)).sorted.toSeq
    SnapshotTable.transact(spark, t, "delete") { cur =>
      cur.get.filter(col("id") =!= 2)
    }
    SnapshotTable.append(spark, t, df(9))
    // VERSION AS OF 1 still returns the pre-delete state
    val v1After = SnapshotTable.read(spark, t, Some(1))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(v1After === v1Before && v1After === Seq(1L, 2L, 3L))
    val v2 = SnapshotTable.read(spark, t, Some(2))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(v2 === Seq(1L, 3L))
    val latest = SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(latest === Seq(1L, 3L, 9L))
  }

  test("missing version and empty table fail loudly") {
    val t = freshTable("missing")
    intercept[IllegalArgumentException](SnapshotTable.read(spark, t))
    SnapshotTable.append(spark, t, df(1))
    intercept[IllegalArgumentException](
      SnapshotTable.read(spark, t, Some(7)))
  }

  test("OCC race: two concurrent appends — one winner, loser rebases, both land") {
    val t = freshTable("race")
    SnapshotTable.append(spark, t, df(0))
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    def task(id: Long) = new java.util.concurrent.Callable[Int] {
      def call(): Int = { start.await(); SnapshotTable.append(spark, t, df(id)) }
    }
    // both writers stage, then race for v2 on the same latch; the loser's
    // commit loop re-reads latest and lands on v3 with BOTH file lists
    val fa = pool.submit(task(100))
    val fb = pool.submit(task(200))
    start.countDown()
    val (va, vb) = (fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(Set(va, vb) === Set(2, 3),
      s"expected exactly versions 2 and 3, got $va/$vb")
    // serializable outcome: latest contains every committed row once
    val latest = SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(latest === Seq(0L, 100L, 200L))
    // and version 2 (the race winner alone) holds exactly one of the two
    val v2 = SnapshotTable.read(spark, t, Some(2))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(v2 === Seq(0L, 100L) || v2 === Seq(0L, 200L), s"v2 = $v2")
  }

  test("OCC race: many concurrent writers all commit distinct versions") {
    val t = freshTable("many")
    val n = 6
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val fs = (1 to n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = {
          start.await(); SnapshotTable.append(spark, t, df(i.toLong))
        }
      })
    }
    start.countDown()
    val versions = fs.map(_.get(180, TimeUnit.SECONDS)).sorted
    pool.shutdown()
    assert(versions === (1 to n).toVector,
      s"every writer must win exactly one distinct version: $versions")
    val latest = SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(latest === (1 to n).map(_.toLong))
  }

  test("compact collapses the snapshot to one group; history stays readable") {
    val t = freshTable("compact")
    SnapshotTable.append(spark, t, df(1, 2))
    SnapshotTable.append(spark, t, df(3))
    SnapshotTable.append(spark, t, df(4))
    assert(SnapshotTable.manifest(t, 3).files.size === 3)
    val before = SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq
    val v = SnapshotTable.compact(spark, t)
    assert(v === 4)
    // layout changed, content identical
    assert(SnapshotTable.manifest(t, 4).files.size === 1)
    val after = SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after === before && after === Seq(1L, 2L, 3L, 4L))
    // compaction is not destructive: every pre-compaction version reads
    assert(SnapshotTable.read(spark, t, Some(2)).count() === 3)
    assert(SnapshotTable.read(spark, t, Some(1)).count() === 2)
  }

  test("vacuum reclaims unreferenced groups; latest intact, history gone loudly") {
    val t = freshTable("vacuum")
    SnapshotTable.append(spark, t, df(1, 2))
    SnapshotTable.append(spark, t, df(3))
    SnapshotTable.compact(spark, t) // v3, one fresh group
    val victims = SnapshotTable.vacuum(t, retainLast = 1)
    // the two original append groups are gone; the compacted group stays
    assert(victims.size === 2, s"victims: $victims")
    val latest = SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(latest === Seq(1L, 2L, 3L))
    // retired versions fail the loud missing-version path, not a
    // missing-file read
    val e = intercept[IllegalArgumentException](
      SnapshotTable.read(spark, t, Some(1)))
    assert(e.getMessage.contains("does not exist"))
    // vacuum is idempotent once clean
    assert(SnapshotTable.vacuum(t, retainLast = 1).isEmpty)
  }

  test("manifest key stats prune reads; statless groups are never pruned") {
    val t = freshTable("prune")
    SnapshotTable.append(spark, t, df(1, 2, 3), statsCol = Some("id"))
    SnapshotTable.append(spark, t, df(10, 11), statsCol = Some("id"))
    SnapshotTable.append(spark, t, df(100)) // no stats: must always be read
    val v = SnapshotTable.latestVersion(t)
    // range [10, 12] intersects group 2's bounds + the statless group
    val kept = SnapshotTable.prunedFiles(t, v, 10L, 12L)
    assert(kept.size === 2, s"kept: $kept")
    val got = SnapshotTable.readPruned(spark, t, 10L, 12L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(10L, 11L, 100L)) // superset; caller filters rows
    // stats round-trip the manifest JSON exactly
    val m = SnapshotTable.manifest(t, v)
    assert(m.stats.values.toSet === Set((1L, 3L), (10L, 11L)))
    // compaction derives merged bounds only when EVERY group has stats
    SnapshotTable.compact(spark, t)
    assert(SnapshotTable.manifest(t, v + 1).stats.isEmpty)
    // even a nothing-intersects range must read the statless group —
    // stats are an optimization, never a correctness gate
    val none = SnapshotTable.readPruned(spark, t, -5L, -1L, Some(v))
      .collect().map(_.getLong(0)).toSeq
    assert(none === Seq(100L))
  }

  test("compacting an all-stats table merges bounds without a data scan") {
    val t = freshTable("prunecompact")
    SnapshotTable.append(spark, t, df(1, 2), statsCol = Some("id"))
    SnapshotTable.append(spark, t, df(50), statsCol = Some("id"))
    SnapshotTable.compact(spark, t)
    val m = SnapshotTable.manifest(t, 3)
    assert(m.files.size === 1 && m.stats(m.files.head) === ((1L, 50L)))
    // the merged bounds still prune correctly; on an ALL-stats table a
    // nothing-intersects range reads an empty relation with the schema
    assert(SnapshotTable.prunedFiles(t, 3, 60L, 99L).isEmpty)
    assert(SnapshotTable.prunedFiles(t, 3, 40L, 99L).size === 1)
    assert(SnapshotTable.readPruned(spark, t, 60L, 99L).count() === 0)
  }

  test("manifests list complete snapshots; data files are immutable") {
    val t = freshTable("manifest")
    SnapshotTable.append(spark, t, df(1))
    SnapshotTable.append(spark, t, df(2))
    val m1 = SnapshotTable.manifest(t, 1)
    val m2 = SnapshotTable.manifest(t, 2)
    assert(m1.files.size === 1 && m2.files.size === 2)
    // append reuses v1's group untouched — the no-rewrite fast path
    assert(m1.files.toSet.subsetOf(m2.files.toSet))
    // a rewrite lists ONLY its new group, old groups stay for time travel
    SnapshotTable.transact(spark, t, "rewrite")(c => c.get.filter(col("id") === 1))
    val m3 = SnapshotTable.manifest(t, 3)
    assert(m3.files.size === 1 && m3.files.toSet.intersect(m2.files.toSet).isEmpty)
    assert(SnapshotTable.read(spark, t, Some(2)).count() === 2)
  }
}
