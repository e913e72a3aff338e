package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.sources.{SnapshotStreamProvider, SnapshotTable}

/** The snapshot table as a streaming SOURCE ([[SnapshotStreamProvider]])
  * — the policy half the `q_stream_table_read` gate can't express: the
  * incremental exactly-once arithmetic (versions as offsets, restart
  * resumes from the checkpoint, a post-drain append delivers alone) is
  * hash-gated there; HERE live the non-append commit policies (fail
  * loudly by default, `ignoreDeletes` / `ignoreChanges` opt-outs — the
  * Delta streaming-source contract) and the `startingVersion` seed. */
class SnapshotStreamSpec extends SparkSpec {

  private def fresh(tag: String): String = {
    val d = s"${sys.props("user.dir")}/target/oracle_inputs/p${ProcessHandle.current().pid()}/snapstream_$tag"
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

  /** Drains the table's stream into (row count, id sum) via a
    * complete-mode global aggregate; returns the final state. */
  private def drain(table: String, tag: String,
      opts: Map[String, String] = Map.empty): (Long, Long) = {
    val chk = s"${table}_chk_$tag"
    val out = s"${table}_out_$tag"
    var reader = spark.readStream
      .format(classOf[SnapshotStreamProvider].getName)
      .option("path", table)
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load()
      .groupBy()
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.coalesce(1).write.mode("overwrite").parquet(out)
      }
      .start()
    q.awaitTermination()
    val r = spark.read.parquet(out).head()
    (r.getLong(0), r.getLong(1))
  }

  test("startingVersion seeds the first offset: the prefix never delivers") {
    val t = fresh("startver")
    SnapshotTable.append(spark, t, df(1, 2, 3))
    SnapshotTable.append(spark, t, df(10))
    assert(drain(t, "all") === ((4L, 16L)))
    // versions <= 1 are treated as consumed: only v2's group delivers
    assert(drain(t, "from1", Map("startingVersion" -> "1")) === ((1L, 10L)))
  }

  test("a delete commit fails the stream by default; ignoreDeletes skips it") {
    val t = fresh("delpolicy")
    SnapshotTable.append(spark, t, df(1, 2, 3))
    SnapshotTable.deleteWhere(spark, t, df(2), "id")
    val e = intercept[StreamingQueryException] { drain(t, "fail") }
    assert(e.toString.contains("delete vector"))
    // opted in: appends-only view — the tombstone neither fails nor
    // retracts (reconciliation is the consumer's job, via the CDF read)
    assert(drain(t, "skip", Map("ignoreDeletes" -> "true")) === ((3L, 6L)))
  }

  test("change-feed mode: deletes render as before-image rows; rewrites still fail") {
    val t = fresh("cdf")
    SnapshotTable.append(spark, t, df(1, 2, 3))
    SnapshotTable.deleteWhere(spark, t, df(2), "id")
    // 3 inserts (1,2,3) + 1 delete before-image (2): 4 change rows, Σid 8
    assert(drain(t, "cdf", Map("readChangeFeed" -> "true")) === ((4L, 8L)))
    SnapshotTable.transact(spark, t, "rw") { cur =>
      cur.get.filter(col("id") =!= 1)
    }
    val e = intercept[StreamingQueryException] {
      drain(t, "cdfrw", Map("readChangeFeed" -> "true"))
    }
    assert(e.toString.contains("rewrote"))
  }

  test("a rewrite commit fails by default; ignoreChanges re-delivers restaged groups") {
    val t = fresh("rwpolicy")
    SnapshotTable.append(spark, t, df(1, 2, 3))
    SnapshotTable.transact(spark, t, "rewrite") { cur =>
      cur.get.filter(col("id") =!= 2)
    }
    val e = intercept[StreamingQueryException] { drain(t, "fail") }
    assert(e.toString.contains("rewrote"))
    // opted in: v1's group delivers (1,2,3) and v2's restaged group
    // re-delivers (1,3) — the documented at-least-once trade
    assert(drain(t, "redeliver", Map("ignoreChanges" -> "true")) === ((5L, 10L)))
  }
}
