package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.sources.SnapshotTable

/** The failure half of stream → SnapshotTable exactly-once (r13 verdict
  * task 1; `q_stream_snapshot` gates the happy path + a simulated
  * redelivery under the hash oracle): a checkpointed query committing
  * every micro-batch through [[SnapshotTable.appendOnce]] is KILLED as
  * soon as its first batch commits — possibly mid-batch, the interruption
  * a real failure produces — more data arrives while it is down, and a
  * second instance restarts from the same checkpoint and drains. Proven:
  * no version was double-applied (every txn tag appears at most once in
  * the commit log), and the final snapshot equals the relational truth
  * exactly once — the at-least-once redelivery across the restart (the
  * engine re-offers any batch whose sink effect it cannot prove) is
  * swallowed by the txn check, never by luck. */
class SnapshotSinkSpec extends SparkSpec {

  private def fresh(tag: String): String = {
    val d = s"${sys.props("user.dir")}/target/oracle_inputs/p${ProcessHandle.current().pid()}/snapsink_$tag"
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).iterator().forEachRemaining(rm)
      Files.deleteIfExists(p)
    }
    rm(Paths.get(d))
    d
  }

  test("kill mid-drain, restart: no double-applied version, exactly-once content") {
    val p = fresh("resume")
    val table = s"$p/table"
    val replay = s"$p/replay"
    val chk = s"$p/chk"
    import spark.implicits._

    val all = (1L to 4000L).map(i => (i, i % 97))
    def shard(k: Int): Unit = {
      all.filter(_._1 % 4 == k).toDF("id", "key")
        .coalesce(1)
        .write.mode(if (k == 0) "overwrite" else "append").parquet(replay)
      // strictly increasing synthetic mtimes: FileStreamSource orders
      // files by mtime (ms resolution) — same discipline as
      // StreamQueries.stampStage
      val d = new java.io.File(replay)
      for (f <- Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
           if f.getName.startsWith("part-") && f.lastModified() > 1750000000000L)
        f.setLastModified(1700000000000L + k * 60000L)
    }
    (0 to 1).foreach(shard)

    def start() = spark.readStream
      .schema(StructType(Seq(
        StructField("id", LongType), StructField("key", LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(replay)
      .writeStream
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        SnapshotTable.appendOnce(
          batch.sparkSession, table, batch, txn = s"sink:$bid")
        ()
      }
      .start()

    val q1 = start()
    // interrupt the moment the first batch has committed (AvailableNow
    // bounds the race: if the drain outruns the poll, q1 simply finished
    // and the appended shards still force q2 to resume from checkpoint)
    while (q1.isActive && q1.lastProgress == null) Thread.sleep(25)
    q1.stop()
    q1.awaitTermination()
    (2 to 3).foreach(shard)
    val q2 = start()
    q2.awaitTermination()

    // exactly-once content: every row once, none lost, none doubled
    val got = SnapshotTable.read(spark, table)
      .agg(count(lit(1)), sum(col("id")), countDistinct(col("id"))).head()
    assert(got.getLong(0) === 4000L, "row count (a lost batch undercounts)")
    assert(got.getLong(2) === 4000L, "distinct ids (a replayed batch duplicates)")
    assert(got.getLong(1) === 4000L * 4001L / 2, "sum of ids")

    // no double-applied version: each committed txn tag appears ONCE
    val latest = SnapshotTable.latestVersion(table)
    val txns = (1 to latest).flatMap(v => SnapshotTable.manifest(table, v).txn)
    assert(txns.size === latest, s"every version carries its txn: $txns")
    assert(txns.distinct === txns, s"duplicated txn in commit log: $txns")
    // 4 shards at maxFilesPerTrigger=1 ⇒ exactly 4 distinct batches landed
    assert(latest === 4, s"expected 4 committed batches, got $latest: $txns")
  }

  test("medallion pair: a crash between bronze and silver heals on replay") {
    import org.apache.spark.sql.functions._
    import graft.sources.SnapshotTable
    val base = s"${sys.props("user.dir")}/target/oracle_inputs/p${ProcessHandle.current().pid()}"
    val (bronze, silver) = (s"$base/medspec_bronze", s"$base/medspec_silver")
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).iterator().forEachRemaining(rm)
      java.nio.file.Files.deleteIfExists(p)
      ()
    }
    Seq(bronze, silver).foreach(d => rm(java.nio.file.Paths.get(d)))
    import spark.implicits._
    def batch(ids: Long*) = ids.toSeq.toDF("id")
    def applyPair(rows: org.apache.spark.sql.DataFrame, bid: Long,
        crashBeforeSilver: Boolean): Unit = {
      SnapshotTable.appendOnce(spark, bronze, rows, s"mb:$bid")
      if (crashBeforeSilver) return // the simulated crash
      SnapshotTable.transactOnce(spark, silver, s"sv-$bid", s"ms:$bid") { cur =>
        val delta = rows.agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
        cur.fold(delta)(_.unionByName(delta)
          .agg(sum(col("n")).as("n"), sum(col("s")).as("s")))
      }
      ()
    }
    applyPair(batch(1, 2), 0, crashBeforeSilver = false)
    applyPair(batch(3, 4), 1, crashBeforeSilver = true) // bronze lands, silver lost
    assert(SnapshotTable.latestVersion(bronze) === 2)
    assert(SnapshotTable.latestVersion(silver) === 1)
    // the at-least-once redelivery after the "restart" heals the pair:
    // bronze swallows, silver applies exactly once
    applyPair(batch(3, 4), 1, crashBeforeSilver = false)
    applyPair(batch(3, 4), 1, crashBeforeSilver = false) // and a second replay no-ops
    assert(SnapshotTable.latestVersion(bronze) === 2)
    assert(SnapshotTable.latestVersion(silver) === 2)
    val r = SnapshotTable.read(spark, silver).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 10L,
      "silver must hold exactly one application of every batch")
  }
}
