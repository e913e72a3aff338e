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
    // graceMs = 0: this spec IS the external write exclusion (sequential)
    val victims = SnapshotTable.vacuum(t, retainLast = 1, graceMs = 0L)
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
    assert(SnapshotTable.vacuum(t, retainLast = 1, graceMs = 0L).isEmpty)
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

  test("vacuum grace window protects young unreferenced groups") {
    val t = freshTable("grace")
    SnapshotTable.append(spark, t, df(1))
    SnapshotTable.transact(spark, t, "rewrite")(c => c.get) // v1 group now unreferenced-by-latest... still referenced by v1
    SnapshotTable.append(spark, t, df(2))
    // retainLast = 1 unreferences v1's and v2's groups — but they were
    // written seconds ago, so a graceful vacuum must NOT touch them (the
    // in-flight-writer protection: staged-but-uncommitted groups look
    // exactly like this)
    assert(SnapshotTable.vacuum(t, retainLast = 1).isEmpty)
    assert(SnapshotTable.read(spark, t).count() === 2)
    // drop the grace window → v1's original group (the only group no
    // retained manifest references) is reclaimed
    val aged = SnapshotTable.vacuum(t, retainLast = 1, graceMs = 0L)
    assert(aged.size === 1, s"aged victims: $aged")
    assert(SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("appendOnce: replaying a committed txn is a no-op, even racing") {
    val t = freshTable("txn")
    val v1 = SnapshotTable.appendOnce(spark, t, df(1, 2), txn = "q1:0")
    assert(v1 === Some(1))
    // the at-least-once replay: same batch id delivered again
    assert(SnapshotTable.appendOnce(spark, t, df(1, 2), txn = "q1:0").isEmpty)
    assert(SnapshotTable.appendOnce(spark, t, df(3), txn = "q1:1") === Some(2))
    // a different query's batch 0 is a different transaction
    assert(SnapshotTable.appendOnce(spark, t, df(9), txn = "q2:0") === Some(3))
    assert(SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 9L))
    // N racing replayers of ONE txn: exactly one commit lands
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(4)
    val fs = (1 to 4).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Option[Int]] {
        def call(): Option[Int] = {
          start.await()
          SnapshotTable.appendOnce(spark, t, df(50), txn = "q1:2")
        }
      })
    }
    start.countDown()
    val results = fs.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(results.flatten.size === 1, s"exactly one winner: $results")
    assert(SnapshotTable.read(spark, t).filter(col("id") === 50).count() === 1)
    // no double-applied version: every committed txn tag appears once
    val txns = (1 to SnapshotTable.latestVersion(t))
      .flatMap(v => SnapshotTable.manifest(t, v).txn)
    assert(txns.distinct === txns, s"duplicated txn in log: $txns")
    // and the losers' staged orphan groups were cleaned up by appendOnce
    assert(SnapshotTable.vacuum(t, retainLast = 99, graceMs = 0L).isEmpty)
  }

  test("merge rewrites only touched partitions; untouched groups kept by name") {
    import spark.implicits._
    val t = freshTable("merge")
    val base = Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"),
      (4L, 40L, "b"), (5L, 50L, "c")).toDF("k", "v", "pt")
    SnapshotTable.appendPartitioned(spark, t, base, "pt")
    val m1 = SnapshotTable.manifest(t, 1)
    assert(m1.files.size === 3) // one group per partition value
    assert(m1.files.flatMap(SnapshotTable.partitionOf).sorted === Seq("a", "b", "c"))
    // merge touches partitions b (update k=3, insert k=6) and d (new)
    val updates = Seq((3L, 333L, "b"), (6L, 60L, "b"), (7L, 70L, "d"))
      .toDF("k", "v", "pt")
    SnapshotTable.merge(spark, t, updates, keyCol = "k", partCol = "pt")
    val m2 = SnapshotTable.manifest(t, 2)
    // untouched partitions a and c: the SAME group names re-listed —
    // their data was never opened, let alone rewritten
    val untouched1 = m1.files.filter(f =>
      Set("a", "c")(SnapshotTable.partitionOf(f).get)).toSet
    val untouched2 = m2.files.filter(f =>
      Set("a", "c")(SnapshotTable.partitionOf(f).get)).toSet
    assert(untouched1 === untouched2)
    // touched partition b: new group, old group NOT in the new manifest
    assert(m1.files.filter(f => SnapshotTable.partitionOf(f).contains("b"))
      .toSet.intersect(m2.files.toSet).isEmpty)
    val got = SnapshotTable.read(spark, t)
      .select("k", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 10L), (2L, 20L), (3L, 333L), (4L, 40L),
      (5L, 50L), (6L, 60L), (7L, 70L)))
    // v1 is untouched history
    assert(SnapshotTable.read(spark, t, Some(1)).count() === 5)
    // merging into a non-partition-grouped table fails loudly
    val t2 = freshTable("mergeflat")
    SnapshotTable.append(spark, t2, base)
    intercept[IllegalArgumentException](
      SnapshotTable.merge(spark, t2, updates, "k", "pt"))
  }

  test("compactPartitions rewrites only fragmented partitions; merge survives") {
    import spark.implicits._
    val t = freshTable("optpart")
    val b1 = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "pt")
    val b2 = Seq((4L, 40L, "a"), (5L, 50L, "b")).toDF("k", "v", "pt")
    SnapshotTable.appendPartitioned(spark, t, b1, "pt")
    SnapshotTable.appendPartitioned(spark, t, b2, "pt")
    val m2 = SnapshotTable.manifest(t, 2)
    assert(m2.files.size === 5) // a:2, b:2, c:1
    SnapshotTable.compactPartitions(spark, t, "pt")
    val m3 = SnapshotTable.manifest(t, 3)
    // one group per partition; partition c's single group kept BY NAME
    assert(m3.files.size === 3)
    assert(m3.files.flatMap(SnapshotTable.partitionOf).sorted === Seq("a", "b", "c"))
    val cGroup = m2.files.filter(f => SnapshotTable.partitionOf(f).contains("c"))
    assert(cGroup.toSet.subsetOf(m3.files.toSet), "clean partition untouched")
    // fragmented partitions got NEW groups
    assert(m2.files.filter(f => SnapshotTable.partitionOf(f).exists(Set("a", "b")))
      .toSet.intersect(m3.files.toSet).isEmpty)
    // content identical
    val got = SnapshotTable.read(spark, t)
      .select("k", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L)))
    // and — the point vs plain compact — the table is still merge-able
    SnapshotTable.merge(spark, t,
      Seq((1L, 111L, "a")).toDF("k", "v", "pt"), "k", "pt")
    assert(SnapshotTable.read(spark, t).filter(col("v") === 111).count() === 1)
    // plain compact on a mixed/untagged table is still available, but
    // compactPartitions on an untagged table fails loudly
    val t2 = freshTable("optflat")
    SnapshotTable.append(spark, t2, df(1))
    intercept[IllegalArgumentException](
      SnapshotTable.compactPartitions(spark, t2, "id"))
  }

  test("zone-map stats survive the partitioned lifecycle: append, merge, compact") {
    import spark.implicits._
    val t = freshTable("ptstats")
    val b1 = Seq((1L, "a"), (2L, "a"), (10L, "b")).toDF("k", "pt")
    val b2 = Seq((3L, "a"), (20L, "b")).toDF("k", "pt")
    SnapshotTable.appendPartitioned(spark, t, b1, "pt", statsCol = Some("k"))
    SnapshotTable.appendPartitioned(spark, t, b2, "pt", statsCol = Some("k"))
    val m2 = SnapshotTable.manifest(t, 2)
    // every partitioned group carries its own key bounds
    assert(m2.files.size === 4 && m2.files.forall(m2.stats.contains))
    assert(m2.stats.values.toSet ===
      Set((1L, 2L), (10L, 10L), (3L, 3L), (20L, 20L)))
    // merge keeps untouched stats and records the rewritten partition's
    SnapshotTable.merge(spark, t, Seq((11L, "b")).toDF("k", "pt"),
      "k", "pt", statsCol = Some("k"))
    val m3 = SnapshotTable.manifest(t, 3)
    assert(m3.files.forall(m3.stats.contains))
    val bStats = m3.files.filter(f => SnapshotTable.partitionOf(f).contains("b"))
      .map(m3.stats)
    assert(bStats === Seq((10L, 20L))) // merged b: rows 10, 11, 20
    // compactPartitions derives merged bounds from the manifest (no scan)
    SnapshotTable.compactPartitions(spark, t, "pt")
    val m4 = SnapshotTable.manifest(t, 4)
    assert(m4.files.size === 2 && m4.files.forall(m4.stats.contains))
    assert(m4.stats.values.toSet === Set((1L, 3L), (10L, 20L)))
    // ...and the pruned read plans from them: [15, 25] opens only b
    assert(SnapshotTable.prunedFiles(t, 4, 15L, 25L).size === 1)
    assert(SnapshotTable.readPruned(spark, t, 15L, 25L)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(10L, 11L, 20L))
  }

  test("readAdded: per-version increments; rewrites re-deliver their groups") {
    import spark.implicits._
    val t = freshTable("incr")
    SnapshotTable.append(spark, t, df(1, 2))
    SnapshotTable.append(spark, t, df(3))
    // append increments are exactly the appended rows
    assert(SnapshotTable.readAdded(spark, t, 1)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(SnapshotTable.readAdded(spark, t, 2)
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
    // a rewrite commit surfaces its restaged groups (ignoreChanges
    // semantics): the whole post-rewrite state re-delivers
    SnapshotTable.transact(spark, t, "rewrite")(c => c.get.filter(col("id") =!= 2))
    assert(SnapshotTable.readAdded(spark, t, 3)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    // Σ increments over an append-only prefix ≡ the v2 snapshot
    val incr = SnapshotTable.readAdded(spark, t, 1)
      .unionByName(SnapshotTable.readAdded(spark, t, 2))
      .collect().map(_.getLong(0)).sorted.toSeq
    val full = SnapshotTable.read(spark, t, Some(2))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(incr === full)
  }

  test("schema evolution: add-column appends; type changes fail loudly") {
    import spark.implicits._
    val t = freshTable("evolve")
    SnapshotTable.append(spark, t, Seq((1L, "x"), (2L, "y")).toDF("id", "s"))
    // add-column append evolves the snapshot schema
    SnapshotTable.append(spark, t,
      Seq((3L, "z", 7L)).toDF("id", "s", "extra"))
    val latest = SnapshotTable.read(spark, t)
    assert(latest.columns.toSeq === Seq("id", "s", "extra"))
    // old group's rows read null for the new column
    val rows = latest.orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(rows.toSeq === Seq((1L, -1L), (2L, -1L), (3L, 7L)))
    // an older version reads under ITS schema: no `extra` column
    assert(SnapshotTable.read(spark, t, Some(1)).columns.toSeq === Seq("id", "s"))
    // a batch may omit an existing column (reads back null in its group)
    SnapshotTable.append(spark, t, Seq(4L).toDF("id"))
    val v3 = SnapshotTable.read(spark, t).filter(col("id") === 4).head()
    assert(v3.isNullAt(1) && v3.isNullAt(2))
    // an incompatible type change fails loudly
    val e = intercept[RuntimeException](SnapshotTable.append(spark, t,
      Seq((5L, 99L)).toDF("id", "s"))) // s: STRING -> BIGINT
    assert(e.getMessage.contains("incompatible schema change"))
    // ... but a full rewrite may change types (it owns every row)
    SnapshotTable.transact(spark, t, "retype") { cur =>
      cur.get.select(col("id"), col("s").cast("string").as("s"))
    }
    assert(SnapshotTable.read(spark, t).columns.toSeq === Seq("id", "s"))
  }

  test("chaos: racing appends and compactions serialize; history replays exactly") {
    import spark.implicits._
    val t = freshTable("chaos")
    SnapshotTable.appendPartitioned(spark, t,
      Seq((0L, "p0")).toDF("id", "pt"), "pt")
    val nWriters = 4
    val perWriter = 3
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nWriters + 1)
    val appenders = (1 to nWriters).map { w =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          start.await()
          (0 until perWriter).foreach { j =>
            SnapshotTable.appendPartitioned(spark, t,
              Seq((w * 1000L + j, s"p$w")).toDF("id", "pt"), "pt")
          }
        }
      })
    }
    val compactor = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = {
        start.await()
        SnapshotTable.compactPartitions(spark, t, "pt")
        SnapshotTable.compactPartitions(spark, t, "pt")
      }
    })
    start.countDown()
    (appenders :+ compactor).foreach(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    val latest = SnapshotTable.latestVersion(t)
    // every committed op won exactly one version — the log is dense
    assert(latest === 1 + nWriters * perWriter + 2)
    // serializable history: each version's row count is its op's exact
    // effect applied to its predecessor (appends +1 row, compactions +0)
    val counts = (1 to latest).map(v =>
      SnapshotTable.read(spark, t, Some(v)).count())
    val ops = (1 to latest).map(v => SnapshotTable.manifest(t, v).op)
    (1 until latest).foreach { i =>
      val expected = counts(i - 1) + (if (ops(i).startsWith("append")) 1 else 0)
      assert(counts(i) === expected,
        s"v${i + 1} (${ops(i)}) count ${counts(i)} != $expected: $ops")
    }
    // final content: every appended id exactly once, nothing lost
    val ids = SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = (0L +: (for (w <- 1 to nWriters; j <- 0 until perWriter)
      yield w * 1000L + j)).sorted
    assert(ids === want)
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

  test("deleteWhere: merge-on-read tombstones with sequence scoping") {
    val t = freshTable("delete")
    SnapshotTable.append(spark, t, df(1, 2, 3, 4, 5))
    val m1Files = SnapshotTable.manifest(t, 1).files.toSet
    SnapshotTable.deleteWhere(spark, t, df(2, 3, 7), "id") // 7: no such key, harmless
    // delete opened NO data group: v2 = v1's groups plus one tombstone
    val m2 = SnapshotTable.manifest(t, 2)
    assert(m1Files.subsetOf(m2.files.toSet))
    val dels = m2.files.filter(SnapshotTable.isDeleteGroup)
    assert(dels.size === 1 && SnapshotTable.deleteKeyOf(dels.head) === Some("id"))
    assert(SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 4L, 5L))
    // v1 still reads the FULL pre-delete state
    assert(SnapshotTable.read(spark, t, Some(1)).count() === 5)
    // sequence scoping: a LATER append re-inserts a deleted key and wins
    SnapshotTable.append(spark, t, df(3, 9))
    assert(SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 4L, 5L, 9L))
    // a second delete postdates the re-insert and hits it
    SnapshotTable.deleteWhere(spark, t, df(3), "id")
    assert(SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 4L, 5L, 9L))
  }

  test("compact purges tombstones; readAdded of a delete commit is silent") {
    val t = freshTable("purge")
    SnapshotTable.append(spark, t, df(1, 2, 3, 4))
    SnapshotTable.deleteWhere(spark, t, df(2, 4), "id")
    // ignoreDeletes: the delete commit delivers NOTHING incrementally
    assert(SnapshotTable.readAdded(spark, t, 2).count() === 0)
    val before = SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq
    SnapshotTable.compact(spark, t)
    val m3 = SnapshotTable.manifest(t, 3)
    assert(m3.files.size === 1 && !m3.files.exists(SnapshotTable.isDeleteGroup))
    val after = SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after === before && after === Seq(1L, 3L))
  }

  test("readPruned applies tombstones on the kept groups") {
    val t = freshTable("delprune")
    SnapshotTable.append(spark, t, df(1, 2, 3), Some("id"))
    SnapshotTable.append(spark, t, df(10, 11, 12), Some("id"))
    SnapshotTable.deleteWhere(spark, t, df(2, 11), "id")
    // range hits only the second group; its tombstoned key must not leak
    assert(SnapshotTable.readPruned(spark, t, 10, 12)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(10L, 12L))
    // tombstone groups are never pruning candidates
    val keep = SnapshotTable.prunedFiles(t, 3, 10, 12)
    assert(keep.size === 1 && !keep.exists(SnapshotTable.isDeleteGroup))
  }

  test("updateWhere: one-commit tombstone + rewrite, row-level, no group rewritten") {
    val t = freshTable("update")
    import spark.implicits._
    SnapshotTable.append(spark, t,
      Seq((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "a")).toDF("id", "v", "tag"))
    SnapshotTable.append(spark, t,
      Seq((2L, 21L, "b"), (4L, 40L, "b")).toDF("id", "v", "tag"))
    val preFiles = SnapshotTable.manifest(t, 2).files.toSet
    // pred matches only the 'a' copy of the duplicated key 2: its 'b'
    // twin must re-stage value-equal (the touched-KEY rewrite)
    val v3 = SnapshotTable.updateWhere(spark, t, "id",
      col("id") === 2 && col("tag") === "a", Map("v" -> (col("v") + 100)))
    assert(v3 === 3)
    val m3 = SnapshotTable.manifest(t, 3)
    // merge-on-read: every pre-existing group re-listed by name, plus
    // exactly one tombstone and one rewrite group
    assert(preFiles.subsetOf(m3.files.toSet))
    assert(m3.files.count(SnapshotTable.isDeleteGroup) === 1)
    assert(m3.files.size === preFiles.size + 2)
    def state(asOf: Option[Int]) =
      SnapshotTable.read(spark, t, asOf).orderBy("id", "tag")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(state(None) === Seq((1L, 10L, "a"), (2L, 120L, "a"),
      (2L, 21L, "b"), (3L, 30L, "a"), (4L, 40L, "b")))
    // the pre-update snapshot is untouched (an update cannot leak back)
    assert(state(Some(2)) === Seq((1L, 10L, "a"), (2L, 20L, "a"),
      (2L, 21L, "b"), (3L, 30L, "a"), (4L, 40L, "b")))
    // a LATER delete postdates the rewrite group and hits it; compact
    // then purges every tombstone with the state preserved
    SnapshotTable.deleteWhere(spark, t, Seq(2L).toDF("id"), "id")
    assert(SnapshotTable.read(spark, t).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 4L))
    SnapshotTable.compact(spark, t)
    val mC = SnapshotTable.manifest(t, SnapshotTable.latestVersion(t))
    assert(!mC.files.exists(SnapshotTable.isDeleteGroup))
    assert(SnapshotTable.read(spark, t).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 4L))
  }

  test("updateWhere: empty table and unknown SET column fail loudly") {
    val t = freshTable("updfail")
    import spark.implicits._
    intercept[RuntimeException] {
      SnapshotTable.updateWhere(spark, t, "id", col("id") > 0,
        Map("v" -> lit(1L)))
    }
    SnapshotTable.append(spark, t, Seq((1L, 10L)).toDF("id", "v"))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.updateWhere(spark, t, "id", col("id") > 0,
        Map("nope" -> lit(1L)))
    }
    assert(e.getMessage.contains("unknown column"))
    // the failed attempts committed nothing
    assert(SnapshotTable.latestVersion(t) === 1)
  }

  test("transactOnce: a replayed tagged rewrite is a no-op") {
    val t = freshTable("txnrw")
    def bump(tag: String) =
      SnapshotTable.transactOnce(spark, t, "bump", tag) { cur =>
        cur.fold(df(1))(d => d.withColumn("id", col("id") + 1))
      }
    assert(bump("b:0") === Some(1))
    assert(bump("b:1") === Some(2))
    // the redelivery every restarted maintenance job produces
    assert(bump("b:1") === None)
    assert(bump("b:0") === None)
    assert(SnapshotTable.latestVersion(t) === 2)
    assert(SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("model check: random op sequences match an in-memory reference at every version") {
    // seeded randomized sequences over the FULL op set — append,
    // deleteWhere (tombstones + sequence scoping), restore, compact
    // (purge), transact (rewrite), updateWhere (one-commit
    // tombstone+rewrite, incl. KEY-mutating updates and no-match
    // no-op versions) — verified against a trivial multiset
    // model: after the run, EVERY committed version must read as exactly
    // the model state it froze. This is the cross-feature interaction
    // net (e.g. restore INTO a tombstoned state, delete after compact,
    // re-insert after restore) that single-feature tests cannot weave.
    val rnd = new scala.util.Random(42)
    var states = Vector.empty[Map[Long, Int]] // version v -> state (1-based)
    def cur: Map[Long, Int] = states.lastOption.getOrElse(Map.empty)
    def draw(n: Int): Seq[Long] = Seq.fill(n)(rnd.nextInt(20).toLong)
    def record(m: Map[Long, Int]): Unit = { states :+= m; () }
    val t2 = freshTable("model")
    record {
      val ids = draw(6)
      SnapshotTable.append(spark, t2, df(ids: _*))
      ids.groupBy(identity).view.mapValues(_.size).toMap
    }
    for (_ <- 1 to 24) {
      rnd.nextInt(6) match {
        case 0 => // append (may re-insert tombstoned ids — must win)
          val ids = draw(1 + rnd.nextInt(5))
          SnapshotTable.append(spark, t2, df(ids: _*))
          record(ids.foldLeft(cur)((m, i) => m + (i -> (m.getOrElse(i, 0) + 1))))
        case 1 => // deleteWhere: removes ALL rows with those keys, now
          val keys = draw(1 + rnd.nextInt(4)).distinct
          SnapshotTable.deleteWhere(spark, t2, df(keys: _*), "id")
          record(cur -- keys)
        case 2 => // restore to a uniformly drawn past version
          val v = 1 + rnd.nextInt(states.size)
          SnapshotTable.restore(t2, v)
          record(states(v - 1))
        case 3 => // compact: content identical, tombstones purged
          SnapshotTable.compact(spark, t2)
          record(cur)
        case 4 => // transact rewrite: drop odd ids
          SnapshotTable.transact(spark, t2, "drop-odd") { c =>
            c.get.filter(col("id") % 2 === 0)
          }
          record(cur.filter { case (k, _) => k % 2 == 0 })
        case 5 => // updateWhere: KEY-mutating rewrite of one residue
          // class (id → id + 100 where id % 3 = r); when nothing
          // matches, the commit is a no-op version re-listing the
          // current files — the model state is unchanged either way
          val r = rnd.nextInt(3)
          SnapshotTable.updateWhere(spark, t2, "id",
            col("id") % 3 === r, Map("id" -> (col("id") + 100)))
          record(cur.foldLeft(Map.empty[Long, Int]) { case (m, (k, n)) =>
            val nk = if (k % 3 == r) k + 100 else k
            m + (nk -> (m.getOrElse(nk, 0) + n))
          })
      }
    }
    assert(SnapshotTable.latestVersion(t2) === states.size)
    for (v <- 1 to states.size) {
      val got = SnapshotTable.read(spark, t2, Some(v))
        .groupBy(col("id")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got === states(v - 1), s"version $v diverged from the model")
    }
    // vacuum to the last 3 versions: latest still reads the model state,
    // pre-horizon versions fail the loud missing-manifest path
    SnapshotTable.vacuum(t2, retainLast = 3, graceMs = 0)
    val latest = SnapshotTable.read(spark, t2)
      .groupBy(col("id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(latest === states.last)
    intercept[IllegalArgumentException](
      SnapshotTable.read(spark, t2, Some(1)))
  }

  test("restore re-lists an old version: metadata only, history preserved") {
    val t = freshTable("restore")
    SnapshotTable.append(spark, t, df(1, 2))
    SnapshotTable.append(spark, t, df(3))
    SnapshotTable.restore(t, 1)
    val (m1, m2, m3) = (SnapshotTable.manifest(t, 1),
      SnapshotTable.manifest(t, 2), SnapshotTable.manifest(t, 3))
    // the restore staged NOTHING: v3's names are exactly v1's
    assert(m3.files.toSet === m1.files.toSet)
    assert(SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // the rolled-back version stays readable for the post-mortem
    assert(SnapshotTable.read(spark, t, Some(2)).count() === 3)
    // a vacuum AFTER the restore keeps the restored groups (referenced by
    // the latest manifest) while reclaiming the rolled-back commit's group
    val victims = SnapshotTable.vacuum(t, retainLast = 1, graceMs = 0)
    assert(victims.toSet === m2.files.toSet.diff(m1.files.toSet))
    assert(SnapshotTable.read(spark, t)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }
}
