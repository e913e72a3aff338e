package graft.sources

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

/** The [[SnapshotTable]] as a Structured-Streaming SOURCE — the other
  * half of the lake loop next to the exactly-once foreachBatch sink
  * (`q_stream_snapshot`): committed versions are the stream offsets, and
  * each micro-batch reads exactly the file-groups its version range
  * ADDED — cost ∝ the increment, never the table. This is the public
  * Delta-source shape (a DSv1 `Source` whose `getBatch` plans a batch
  * DataFrame over the commit log; Spark's own file source is the same
  * API), so restarts resume from the checkpointed version offset and an
  * append landing between two runs is delivered exactly once.
  *
  * Contract (the Delta streaming-source semantics, reduced):
  *   - APPEND commits stream their staged groups, in commit order.
  *   - DELETE commits (tombstone-only) deliver nothing but FAIL the
  *     stream by default — silently skipping a retraction would let a
  *     downstream aggregate diverge from the table. `ignoreDeletes=true`
  *     opts into skipping them (the consumer owns reconciliation, e.g.
  *     via the CDF read).
  *   - REWRITE commits (transact / merge / compact / restore — any
  *     commit that REMOVES a group) fail by default; `ignoreChanges=true`
  *     delivers the restaged groups instead (rows of rewritten
  *     partitions re-deliver — at-least-once for those keys, the
  *     documented Delta `ignoreChanges` trade; dedup downstream by key).
  *   - `startingVersion=k` starts the stream AFTER version k (default 0:
  *     from the beginning of the log). The option seeds the FIRST offset
  *     only; a checkpoint always wins thereafter.
  *
  * Schema is pinned at source creation (latest manifest's DDL): versions
  * are read under the source schema, so an add-column commit mid-stream
  * neither breaks the plan nor silently widens it (new columns arrive on
  * restart — the Delta restart-on-schema-change contract, minus the
  * error). At 100 TB `getBatch` is manifest metadata + a parquet scan of
  * the added groups; nothing else is touched.
  */
class SnapshotStreamProvider extends StreamSourceProvider {

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val t = SnapshotStreamSource.tableSchema(SnapshotStreamSource.pathOf(parameters))
    ("graft-snapshot-stream", schema.getOrElse(
      if (parameters.get("readChangeFeed").exists(_.toBoolean))
        SnapshotStreamSource.cdfSchema(t)
      else t))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val table = SnapshotStreamSource.pathOf(parameters)
    val cdf = parameters.get("readChangeFeed").exists(_.toBoolean)
    val tableSchema = SnapshotStreamSource.tableSchema(table)
    val srcSchema = schema.getOrElse(
      if (cdf) SnapshotStreamSource.cdfSchema(tableSchema) else tableSchema)
    new SnapshotStreamSource(ctx.sparkSession, table, srcSchema,
      startingVersion = parameters.get("startingVersion").map(_.toInt).getOrElse(0),
      ignoreDeletes = parameters.get("ignoreDeletes").exists(_.toBoolean),
      ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean),
      changeFeed = cdf)
  }
}

object SnapshotStreamSource {
  private[sources] def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("snapshot stream source requires .option(\"path\", <table dir>)"))

  /** The change-feed schema: table columns plus the Delta CDF metadata
    * pair (`_change_type`, `_commit_version`). */
  private[sources] def cdfSchema(table: StructType): StructType =
    StructType(table.fields.toSeq :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.IntegerType, nullable = false))

  private[sources] def tableSchema(table: String): StructType = {
    val v = SnapshotTable.latestVersion(table)
    require(v > 0, s"table $table has no committed versions to infer a schema from")
    StructType.fromDDL(SnapshotTable.manifest(table, v).schema.getOrElse(
      sys.error(s"table $table carries no schema DDL in its manifest")))
  }
}

class SnapshotStreamSource(spark: SparkSession, table: String,
    override val schema: StructType, startingVersion: Int,
    ignoreDeletes: Boolean, ignoreChanges: Boolean,
    changeFeed: Boolean = false) extends Source {

  private def ver(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case s: SerializedOffset => LongOffset(s).offset.toInt
    case other => sys.error(s"unexpected offset type: $other")
  }

  /** Latest committed version, as the stream's end offset; None while the
    * log is empty (or wholly below `startingVersion`). */
  override def getOffset: Option[Offset] = {
    val v = SnapshotTable.latestVersion(table)
    if (v <= startingVersion) None else Some(LongOffset(v.toLong))
  }

  /** CHANGE-FEED batch: versions (lo, hi] rendered as row-level change
    * events — added data groups become `insert` rows; an added tombstone
    * becomes `delete` rows carrying the full BEFORE-image (the keys
    * semi-joined against the predecessor snapshot — cost ∝ the touched
    * keys' data, prunable by manifest stats at scale, never the table).
    * An [[SnapshotTable.updateWhere]] commit therefore renders as its
    * delete + insert pair — the standard CDF reduction of an update.
    * Rewrite commits still fail loudly: a transact/merge/compact diff
    * is a snapshot-diff job (`q_snapshot_cdf`), not a log read. */
  private def cdfBatch(lo: Int, hi: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val tableCols = schema.fields.dropRight(2).map(f => col(f.name))
    val changes = ((lo + 1) to hi).flatMap { v =>
      val m = SnapshotTable.manifest(table, v)
      val prev = if (v == 1) Set.empty[String]
        else SnapshotTable.manifest(table, v - 1).files.toSet
      val removed = prev.diff(m.files.toSet)
      if (removed.nonEmpty) sys.error(
        s"version $v of $table rewrote ${removed.size} file-group(s); a " +
          "change feed renders appends, deletes, and updates — diff a " +
          "rewrite offline via two snapshot reads instead.")
      val (delAdds, dataAdds) =
        m.files.filterNot(prev).partition(SnapshotTable.isDeleteGroup)
      val inserts = if (dataAdds.isEmpty) Nil else Seq(
        spark.read.schema(StructType(schema.fields.dropRight(2)))
          .parquet(dataAdds.map(f => s"$table/$f"): _*)
          .select(tableCols: _*)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(v)))
      val deletes = delAdds.groupBy(d => SnapshotTable.deleteKeyOf(d).get)
        .toSeq.sortBy(_._1).map { case (keyCol, groups) =>
          val keys = spark.read
            .parquet(groups.map(f => s"$table/$f"): _*).distinct()
          SnapshotTable.read(spark, table, asOf = Some(v - 1))
            .join(keys, Seq(keyCol), "left_semi")
            .select(tableCols: _*)
            .withColumn("_change_type", lit("delete"))
            .withColumn("_commit_version", lit(v))
        }
      inserts ++ deletes
    }
    if (changes.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    else changes.reduce(_ unionByName _)
  }

  /** The data groups versions (start, end] ADDED, read under the source
    * schema — with the non-append commit policy applied per version. */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(ver).getOrElse(startingVersion)
    val hi = ver(end)
    if (changeFeed) {
      val b = cdfBatch(lo, hi)
      return GraftSqlBridge.streamingDf(spark, b.queryExecution.toRdd, b.schema)
    }
    val added = ((lo + 1) to hi).flatMap { v =>
      val m = SnapshotTable.manifest(table, v)
      val prev = if (v == 1) Set.empty[String]
        else SnapshotTable.manifest(table, v - 1).files.toSet
      val removed = prev.diff(m.files.toSet)
      if (removed.nonEmpty && !ignoreChanges) sys.error(
        s"version $v of $table rewrote ${removed.size} file-group(s) " +
          "(transact/merge/compact/restore). A streaming read of a rewrite " +
          "would re-deliver or lose rows silently; pass " +
          ".option(\"ignoreChanges\", \"true\") to stream the restaged " +
          "groups (at-least-once for rewritten keys) or start a fresh " +
          "stream from a snapshot read.")
      val (delAdds, dataAdds) =
        m.files.filterNot(prev).partition(SnapshotTable.isDeleteGroup)
      if (delAdds.nonEmpty && !ignoreDeletes) sys.error(
        s"version $v of $table committed ${delAdds.size} delete vector(s). " +
          "Appends-only streaming cannot represent a retraction; pass " +
          ".option(\"ignoreDeletes\", \"true\") to skip delete commits " +
          "(reconcile downstream via the CDF read).")
      dataAdds
    }
    val batch =
      if (added.isEmpty)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      else
        spark.read.schema(schema).parquet(added.map(f => s"$table/$f"): _*)
          .selectExpr(schema.fieldNames.map(n => s"`$n`").toSeq: _*)
    GraftSqlBridge.streamingDf(spark, batch.queryExecution.toRdd, batch.schema)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"SnapshotStreamSource[$table, from=$startingVersion]"
}
