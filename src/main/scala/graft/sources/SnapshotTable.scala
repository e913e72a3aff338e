package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, when}
import org.apache.spark.sql.types.StructType

/** Minimal versioned-snapshot table — the lakehouse ACID surface (r12
  * verdict task 5: `q_merge_upsert`/`q_stream_cdc` already implement MERGE
  * and CDC *semantics* over versioned parquet state, but a real lake user
  * hits snapshot isolation, time travel, and concurrent writers on day
  * one). Same commit-log design as the public Delta/Iceberg protocols,
  * reduced to the invariants that make them work:
  *
  *   - A table is a directory: immutable data file-groups under `data/`
  *     plus an append-only commit log `_commits/v%05d.json`. A manifest is
  *     the COMPLETE list of file-groups forming that version's snapshot
  *     (the Iceberg snapshot model; data files are never mutated or
  *     reused across rewrites, only re-listed).
  *   - Readers resolve ONE manifest, then read exactly its files: snapshot
  *     isolation by construction — a concurrent commit writes v+1 and can
  *     never change what an in-flight reader sees. `VERSION AS OF k` is
  *     the same read against an older manifest, so time travel is free
  *     until a vacuum deletes unreferenced file-groups.
  *   - Writers are optimistic: stage data files (invisible until
  *     committed — the log is the source of truth), then publish with an
  *     atomic claim of the next manifest name. Exactly one of N racing
  *     writers wins a version; losers see FileAlreadyExistsException,
  *     re-read the new latest, REBASE (their snapshot function is re-run
  *     against the winner's state), and retry. That is serializable
  *     commit ordering with no locks and no coordinator —
  *     SnapshotTableSpec race-proves it.
  *   - Exactly-once sinks: a manifest may carry a transaction tag
  *     (`txn = "appId:batchId"`, the Delta txn-action shape). A committer
  *     that finds its tag already in the log no-ops — so an at-least-once
  *     replayer (foreachBatch after a crash) never double-applies a
  *     batch. [[appendOnce]] is that contract; StreamQueries'
  *     `q_stream_snapshot` runs it under the hash oracle.
  *
  * 100 TB shape: manifests carry file NAMES, never data — commit cost is
  * O(changed file-groups), independent of table size; `append` stages only
  * the new rows. [[transact]] here rewrites the full snapshot
  * (copy-on-write at fixture scale); [[merge]] is the production MERGE:
  * partition-grouped staging ([[appendPartitioned]]) gives every
  * file-group a partition tag, and the upsert rewrites ONLY the groups of
  * partitions the batch touches — cost ∝ touched partitions, untouched
  * groups re-listed by name (byte-identical, spec-pinned). Vacuum =
  * delete file-groups referenced by no retained manifest (with an mtime
  * grace window so in-flight writers' staged-but-uncommitted groups
  * survive a concurrent vacuum); never required for correctness.
  */
object SnapshotTable {

  /** One committed version: the complete file-group list of the snapshot,
    * plus optional per-group (min, max) stats over one designated int64
    * key column — the manifest-level zone map that lets a reader plan
    * which groups to open WITHOUT touching data (Iceberg's column
    * bounds / Delta's file stats, reduced to the key column). `schema` is
    * the snapshot's DDL (the Delta metaData action): the read-time source
    * of truth, so add-column evolution needs no parquet footer merging at
    * plan time. `txn` is the idempotence tag of the committing streaming
    * batch, if any. `op` is a human-readable audit tag, not protocol
    * state. */
  final case class Manifest(version: Int, op: String, files: Seq[String],
      stats: Map[String, (Long, Long)] = Map.empty,
      schema: Option[String] = None,
      txn: Option[String] = None)

  private def commitsDir(table: String): Path = Paths.get(table, "_commits")

  private def manifestPath(table: String, v: Int): Path =
    commitsDir(table).resolve(f"v$v%05d.json")

  /** Files.list with the DirectoryStream CLOSED after iteration (ADVICE
    * r13: the bare iterator leaks an fd per call — and [[latestVersion]]
    * sits inside the hot OCC retry loop, so the leak compounds under
    * contention). */
  private def listDir(d: Path): Seq[Path] = {
    val st = Files.list(d)
    try st.iterator().asScala.toList finally st.close()
  }

  /** Largest committed version, or 0 if the log is empty (version numbers
    * start at 1; "version 0" reads as the empty table). */
  def latestVersion(table: String): Int = {
    val d = commitsDir(table)
    if (!Files.isDirectory(d)) 0
    else listDir(d)
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  // Hand-rolled single-line JSON, mirroring graft.Verify's discipline (the
  // library keeps zero JSON deps). File-group names are paths we mint
  // (uuid, or stage-uuid/_pt=<value> for partition-grouped data), so the
  // character set is closed; the renderer rejects anything else loudly.
  // A group WITH key stats serializes as "name|min|max" inside the same
  // array — flat, order-stable, and groups without stats stay plain names
  // (stats are an optimization, never required for correctness). `schema`
  // is a Spark DDL string (backticked names — never a quote or
  // backslash, which the renderer also rejects loudly).
  private def render(m: Manifest): String = {
    require(m.files.forall(f => f.matches("[A-Za-z0-9/_.=-]+")),
      s"unexpected characters in file-group name: ${m.files}")
    m.schema.foreach(d => require(!d.exists(c => c == '"' || c == '\\'),
      s"unsupported characters in schema DDL: $d"))
    m.txn.foreach(t => require(t.matches("[A-Za-z0-9:_-]+"),
      s"unexpected characters in txn tag: $t"))
    val fs = m.files.sorted.map { f =>
      m.stats.get(f) match {
        case Some((lo, hi)) => "\"" + f + "|" + lo + "|" + hi + "\""
        case None => "\"" + f + "\""
      }
    }.mkString("[", ",", "]")
    val schemaField = m.schema.fold("")(d => s""","schema":"$d"""")
    val txnField = m.txn.fold("")(t => s""","txn":"$t"""")
    s"""{"version":${m.version},"op":"${m.op}","files":$fs$schemaField$txnField}"""
  }

  private def parse(v: Int, s: String): Manifest = {
    val op = """"op":"([^"]*)"""".r.findFirstMatchIn(s)
      .getOrElse(sys.error(s"malformed manifest v$v: $s")).group(1)
    val files = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .getOrElse(sys.error(s"malformed manifest v$v: $s")).group(1)
    val schema = """"schema":"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
    val txn = """"txn":"([^"]*)"""".r.findFirstMatchIn(s).map(_.group(1))
    val entries =
      if (files.isEmpty) Seq.empty[String]
      else files.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
    val (fs, st) = entries.foldLeft(
      (Vector.empty[String], Map.empty[String, (Long, Long)])) {
      case ((f, m), e) => e.split('|') match {
        case Array(name, lo, hi) => (f :+ name, m + (name -> (lo.toLong, hi.toLong)))
        case Array(name) => (f :+ name, m)
        case _ => sys.error(s"malformed file-group entry in v$v: $e")
      }
    }
    Manifest(v, op, fs, st, schema, txn)
  }

  def manifest(table: String, version: Int): Manifest = {
    val p = manifestPath(table, version)
    require(Files.exists(p),
      s"version $version does not exist (latest: ${latestVersion(table)})")
    parse(version, Files.readString(p))
  }

  /** Reads a set of file-groups under the snapshot's recorded schema when
    * one exists (missing columns in older parquet groups come back null —
    * add-column evolution with O(1) plan cost, no footer merging), else
    * by parquet inference (pre-schema manifests). */
  private def readGroups(s: SparkSession, table: String, groups: Seq[String],
      schemaDdl: Option[String]): DataFrame = {
    val reader = schemaDdl.fold(s.read)(d => s.read.schema(StructType.fromDDL(d)))
    reader.parquet(groups.map(f => s"$table/$f"): _*)
  }

  /** Snapshot read. `asOf = Some(k)` is `VERSION AS OF k`; None reads the
    * latest committed version. Version 0 / an empty log is an error — the
    * caller owns schema knowledge we don't have for an empty table. Each
    * version reads under ITS OWN manifest schema, so a later add-column
    * commit never changes what an older version returns. */
  def read(s: SparkSession, table: String, asOf: Option[Int] = None): DataFrame = {
    val v = asOf.getOrElse(latestVersion(table))
    require(v > 0, s"table $table has no committed versions")
    snapshotDf(s, table, manifest(table, v))
  }

  /** Delete-vector groups are recognized by NAME (`data/del-<keyCol>-…`,
    * minted by [[deleteWhere]]) — the manifest format is unchanged and a
    * table that never deletes never pays a thing. */
  def isDeleteGroup(group: String): Boolean =
    group.startsWith("data/del-")

  /** The key column a delete-vector group tombstones on (encoded in its
    * name by [[deleteWhere]]). */
  def deleteKeyOf(group: String): Option[String] =
    if (!isDeleteGroup(group)) None
    else Some(group.stripPrefix("data/del-").takeWhile(_ != '-'))

  /** First version each file-group of version `v`'s manifest appeared in —
    * the commit SEQUENCE that scopes delete vectors (an Iceberg data
    * sequence number, re-derived from the log). A delete group tombstones
    * only data groups added STRICTLY BEFORE it, so a later append may
    * re-insert a deleted key and win. O(versions) manifest reads, metadata
    * only; production carries the sequence in the manifest itself. */
  private def firstAppearance(table: String, v: Int): Map[String, Int] =
    (1 to v).foldLeft(Map.empty[String, Int]) { (acc, i) =>
      manifest(table, i).files.foldLeft(acc)(
        (a, f) => if (a.contains(f)) a else a + (f -> i))
    }

  /** The snapshot relation of manifest `m`, with delete vectors applied
    * under sequence scoping (merge-on-read): data groups are grouped into
    * cohorts by WHICH deletes postdate them, each cohort anti-joins the
    * union of its applicable tombstone keys, cohorts union back. A table
    * with no delete groups takes the plain multi-group scan — the
    * unchanged fast path every existing gate query reads through.
    * `keep` filters DATA groups only (the [[readPruned]] hook); delete
    * groups always apply. At 100 TB each anti-join is one shuffle on the
    * key (broadcast when the tombstone set is small — AQE decides), and
    * the cohort count is bounded by the number of delete COMMITS, not
    * data size. */
  private def snapshotDf(s: SparkSession, table: String, m: Manifest,
      keep: String => Boolean = _ => true): DataFrame = {
    val (dels, datas0) = m.files.partition(isDeleteGroup)
    val datas = datas0.filter(keep)
    if (datas.isEmpty)
      readGroups(s, table, datas0, m.schema).limit(0)
    else if (dels.isEmpty)
      readGroups(s, table, datas, m.schema)
    else {
      val fa = firstAppearance(table, m.version)
      val cohorts = datas.groupBy(g => dels.filter(d => fa(d) > fa(g)).sorted)
        .toSeq.sortBy { case (_, gs) => gs.map(fa).min }
      cohorts.map { case (applicable, gs) =>
        val df = readGroups(s, table, gs, m.schema)
        applicable.groupBy(d => deleteKeyOf(d).get).foldLeft(df) {
          case (acc, (keyCol, groups)) =>
            // tombstones read by parquet inference: a delete group is the
            // key column alone, never under the table schema
            acc.join(readGroups(s, table, groups, None).distinct(),
              Seq(keyCol), "left_anti")
        }
      }.reduce(_ unionByName _)
    }
  }

  /** Row-level DELETE as a delete vector (Iceberg equality-delete /
    * Delta deletion-vector shape, merge-on-read): stages the DISTINCT
    * keys as a tombstone group and commits prev ∪ tombstone — NO data
    * group is opened, let alone rewritten, so delete cost is O(keys),
    * independent of table size. Readers apply tombstones under sequence
    * scoping ([[snapshotDf]]): the delete hits every row committed
    * before it, and a LATER append may re-insert a deleted key. Every
    * pre-delete version still reads its full state (time travel is
    * unaffected — the tombstone is just another group a newer manifest
    * lists). [[compact]] purges: it materializes the delete-applied
    * snapshot and drops the tombstones. */
  def deleteWhere(s: SparkSession, table: String, keys: DataFrame,
      keyCol: String): Int = {
    require(keyCol.matches("[A-Za-z0-9_]+"),
      s"delete key column must be a plain identifier: $keyCol")
    val (staged, _) =
      stage(keys.select(col(keyCol)).distinct(), table, None, s"del-$keyCol-")
    commitLoop(table, "delete", None, 10) { cur =>
      val m = cur.getOrElse(sys.error(s"cannot delete from empty table $table"))
      (m.files :+ staged, m.stats, m.schema)
    }.get
  }

  /** Row-level UPDATE as ONE commit (merge-on-read — the third leg of
    * the DML triad next to [[deleteWhere]] and [[merge]]): tombstone the
    * touched keys AND stage their re-written rows, publishing both
    * groups in the SAME manifest version. Sequence scoping makes the
    * pair atomic-by-construction: both groups first appear at the new
    * version, and a tombstone applies only to groups STRICTLY older
    * ([[snapshotDf]]), so the re-written rows survive their own
    * tombstone while every pre-update copy of the touched keys
    * disappears. Cost ∝ rows of the touched KEYS (a key whose rows span
    * several groups is re-written whole, which is what keeps the
    * semantics row-level even when `pred` matches only one of the key's
    * rows), never the table — no existing group is opened beyond the
    * snapshot read that finds the matches, and none is rewritten.
    *
    * `set` columns must already exist (UPDATE mutates, it never widens —
    * widening is [[append]]-evolution's job); unmatched rows of a
    * touched key are re-staged byte-equal. Runs inside the OCC loop:
    * a rebase re-reads the winner's snapshot and re-stages (the
    * serializable contract); a lost attempt's staged groups are
    * orphans, reclaimed by [[vacuum]]'s grace path like any
    * uncommitted stage. Returns the committed version. */
  def updateWhere(s: SparkSession, table: String, keyCol: String,
      pred: Column, set: Map[String, Column]): Int = {
    require(keyCol.matches("[A-Za-z0-9_]+"),
      s"update key column must be a plain identifier: $keyCol")
    require(set.nonEmpty, "UPDATE with an empty SET list is a no-op by definition")
    commitLoop(table, "update", None, 10) { curOpt =>
      val m = curOpt.getOrElse(sys.error(s"cannot update empty table $table"))
      val schemaCols = m.schema.map(d => StructType.fromDDL(d).fieldNames.toSet)
        .getOrElse(Set.empty[String])
      set.keys.foreach(c => require(schemaCols.isEmpty || schemaCols(c),
        s"UPDATE SET references unknown column '$c' (schema: $schemaCols)"))
      val cur = snapshotDf(s, table, m)
      val touchedKeys = cur.filter(pred).select(col(keyCol)).distinct()
      if (touchedKeys.isEmpty)
        // nothing matched: a no-op version re-listing the current files
        // (an EMPTY tombstone group would break the schema-inference
        // read every later snapshot takes, so it must never be staged)
        (m.files, m.stats, m.schema)
      else {
        val touched = cur.join(touchedKeys, Seq(keyCol), "left_semi")
        val rewritten = set.foldLeft(touched) { case (df, (c, e)) =>
          df.withColumn(c, when(pred, e).otherwise(col(c)))
        }
        val (delG, _) =
          stage(touchedKeys, table, None, s"del-$keyCol-")
        val (updG, _) = stage(rewritten, table, None)
        (m.files :+ delG :+ updG, m.stats, m.schema)
      }
    }.get
  }

  private def ddlOf(df: DataFrame): String = {
    val d = df.schema.toDDL
    require(!d.exists(c => c == '"' || c == '\\'),
      s"unsupported characters in schema DDL: $d")
    d
  }

  /** Add-column-only schema evolution (the `q_schema_merge` mergeSchema
    * semantics carried to the ACID surface): a common column keeping its
    * exact type is fine, a type change fails LOUDLY (rewriting history is
    * [[transact]]'s job, not append's), and new columns are admitted by
    * appending them to the recorded schema — old groups then read as null
    * for them. A batch may also omit existing columns (they read as null
    * in its group), the Delta nullable-append contract. */
  private def evolve(cur: Option[String], df: DataFrame): String = cur match {
    case None => ddlOf(df)
    case Some(ddl) =>
      val curSt = StructType.fromDDL(ddl)
      val curTypes = curSt.map(f => f.name -> f.dataType).toMap
      df.schema.foreach { f =>
        curTypes.get(f.name).foreach { t =>
          if (t != f.dataType) sys.error(
            s"incompatible schema change for column '${f.name}': $t -> " +
              s"${f.dataType} (only add-column evolution is supported; use " +
              "transact for a full rewrite)")
        }
      }
      val extras = df.schema.filterNot(f => curTypes.contains(f.name))
      if (extras.isEmpty) ddl else StructType(curSt ++ extras).toDDL
  }

  /** Stage a DataFrame as a new immutable file-group; returns its
    * table-relative name plus (min, max) of `statsCol` when one is
    * designated (computed on the staged data — one cheap agg — and
    * carried in the manifest so readers can prune without opening the
    * group). Staged groups are invisible to every reader until a
    * manifest lists them. `prefix` lets [[deleteWhere]] mint
    * delete-vector groups (`del-<keyCol>-<uuid>`) that readers recognize
    * by NAME — the manifest format is unchanged. */
  private def stage(df: DataFrame, table: String,
      statsCol: Option[String], prefix: String = ""): (String, Option[(Long, Long)]) = {
    val name = s"data/$prefix${java.util.UUID.randomUUID().toString}"
    df.write.parquet(s"$table/$name")
    val st = statsCol.map { c =>
      val r = df.sparkSession.read.parquet(s"$table/$name")
        .agg(org.apache.spark.sql.functions.min(c).cast("long"),
          org.apache.spark.sql.functions.max(c).cast("long")).head()
      (r.getLong(0), r.getLong(1))
    }
    (name, st)
  }

  /** Stage a DataFrame as one file-group PER VALUE of `partCol` — a single
    * distributed partitioned write (`partitionBy` on a duplicated string
    * key, so the data files keep the original column), each leaf directory
    * registered as its own group named `data/stage-<uuid>/_pt=<value>`.
    * The partition tag rides in the group NAME, which is what lets
    * [[merge]] plan touched-partitions-only rewrites from the manifest
    * alone. Partition values must render to a filesystem-safe token;
    * anything else fails loudly (hash your key into buckets first — at
    * 100 TB a partition key is a curated low-cardinality column anyway). */
  private def stagePartitioned(df: DataFrame, table: String, partCol: String,
      statsCol: Option[String] = None): (Seq[String], Map[String, (Long, Long)]) = {
    val stageName = s"data/stage-${java.util.UUID.randomUUID().toString}"
    df.withColumn("_pt", col(partCol).cast("string"))
      .write.partitionBy("_pt").parquet(s"$table/$stageName")
    val dirs = listDir(Paths.get(table, stageName))
      .filter(p => Files.isDirectory(p))
      .map(_.getFileName.toString)
      .filter(_.startsWith("_pt="))
    require(dirs.nonEmpty, s"no partitions staged from column $partCol")
    dirs.foreach(d => require(d.stripPrefix("_pt=").matches("[A-Za-z0-9_.-]+"),
      s"partition value does not render to a filesystem-safe token: $d"))
    val groups = dirs.sorted.map(d => s"$stageName/$d")
    // per-group (min, max) of the designated key in ONE grouped scan of
    // the staged data (partition discovery on the stage root recovers
    // _pt), so a partitioned write keeps the same prunability an
    // [[append]] gets from `statsCol`
    val stats = statsCol.fold(Map.empty[String, (Long, Long)]) { c =>
      val byPt = df.sparkSession.read.parquet(s"$table/$stageName")
        .groupBy(col("_pt").cast("string").as("_pt"))
        .agg(org.apache.spark.sql.functions.min(col(c)).cast("long").as("lo"),
          org.apache.spark.sql.functions.max(col(c)).cast("long").as("hi"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      groups.flatMap(g => partitionOf(g).flatMap(byPt.get).map(g -> _)).toMap
    }
    (groups, stats)
  }

  /** The partition tag of a file-group, if it was staged partitioned. */
  def partitionOf(group: String): Option[String] = {
    val i = group.lastIndexOf("_pt=")
    if (i < 0) None else Some(group.substring(i + 4))
  }

  /** The one atomic primitive: publish `m` as version `m.version` iff no
    * other writer got there first. The manifest is written COMPLETE to a
    * private temp file first, then claimed with `Files.createLink` — a
    * hard link is atomic, fails with FileAlreadyExistsException when the
    * target exists (the POSIX analogue of an object store's
    * put-if-absent), and the published name only ever points at fully
    * written bytes. (NOT CREATE_NEW+write on the final name: that makes
    * the CLAIM atomic but not the CONTENT — a concurrent reader listing
    * the log could open the claimed name before its bytes land, ADVICE
    * r13. And NOT tmp-file + Files.move: Java's no-replace move is a
    * check-then-rename — two racers can both pass the check and the POSIX
    * rename silently replaces, losing a committed version.) */
  private def tryCommit(table: String, m: Manifest): Boolean = {
    Files.createDirectories(commitsDir(table))
    val tmp = commitsDir(table)
      .resolve(s".tmp-${java.util.UUID.randomUUID().toString}")
    Files.writeString(tmp, render(m))
    try {
      Files.createLink(manifestPath(table, m.version), tmp)
      true
    } catch { case _: FileAlreadyExistsException => false }
    finally { Files.deleteIfExists(tmp); () }
  }

  /** Optimistic-concurrency commit loop: compute the next snapshot FROM
    * the current latest version, try to publish as latest+1, rebase and
    * retry on conflict. `next` receives the current manifest (None on an
    * empty table) and returns the complete new file list, stats, and
    * schema DDL; it re-runs on every retry, so losers always rebase onto
    * the winner's state. When `txn` is set, a manifest already carrying
    * the same tag anywhere in the log makes the commit a NO-OP (returns
    * None) — checked against every version the loop has not yet scanned,
    * including versions that land between retries, so an at-least-once
    * replayer can never double-apply. Production keeps a per-appId
    * high-water batchId in snapshot state instead of scanning (batchIds
    * are monotone per query); the log scan here is the same contract at
    * fixture scale. */
  private def commitLoop(table: String, op: String, txn: Option[String],
      maxRetries: Int)(
      next: Option[Manifest] => (Seq[String], Map[String, (Long, Long)], Option[String])): Option[Int] = {
    var scanned = 0
    var attempt = 0
    while (attempt <= maxRetries) {
      val base = latestVersion(table)
      if (txn.isDefined) {
        var v = scanned + 1
        while (v <= base) {
          if (manifest(table, v).txn == txn) return None
          v += 1
        }
        scanned = base
      }
      val cur = if (base == 0) None else Some(manifest(table, base))
      val (files, stats, schema) = next(cur)
      val m = Manifest(base + 1, op, files, stats, schema, txn)
      if (tryCommit(table, m)) return Some(m.version)
      attempt += 1
    }
    sys.error(s"commit of '$op' to $table lost $maxRetries OCC races; giving up")
  }

  /** Public OCC commit (no txn tag): `next` returns the complete file
    * list + stats; the current schema is carried forward unchanged.
    * Returns the committed version. */
  def commit(table: String, op: String, maxRetries: Int = 10)(
      next: Option[Manifest] => (Seq[String], Map[String, (Long, Long)])): Int =
    commitLoop(table, op, None, maxRetries) { cur =>
      val (files, stats) = next(cur)
      (files, stats, cur.flatMap(_.schema))
    }.get

  /** Append: stage the new rows once, then commit prev ∪ new. The staged
    * group never depends on the base version, so OCC retries re-run only
    * the O(1) manifest step — the production fast path. Pass `statsCol`
    * to record the group's (min, max) of that int64 column in the
    * manifest for [[readPruned]]. Add-column schema evolution is admitted
    * per [[evolve]]; a type change fails loudly. */
  def append(s: SparkSession, table: String, df: DataFrame,
      statsCol: Option[String] = None): Int = {
    val (staged, st) = stage(df, table, statsCol)
    commitLoop(table, "append", None, 10) { cur =>
      (cur.map(_.files).getOrElse(Nil) :+ staged,
        cur.map(_.stats).getOrElse(Map.empty) ++ st.map(staged -> _),
        Some(evolve(cur.flatMap(_.schema), df)))
    }.get
  }

  /** Exactly-once append for at-least-once replayers (the foreachBatch
    * sink contract): `txn` is the batch's identity — conventionally
    * `"<queryId>:<batchId>"` — and a replay of an already-committed batch
    * is a NO-OP returning None (the staged duplicate group is deleted;
    * it was never visible). This is what makes `stream → SnapshotTable`
    * exactly once end-to-end: the streaming engine guarantees each batch
    * is delivered AT LEAST once across restarts, and this commit
    * guarantees each delivered batch lands AT MOST once. */
  def appendOnce(s: SparkSession, table: String, df: DataFrame, txn: String,
      statsCol: Option[String] = None): Option[Int] = {
    // cheap pre-check: a committed tag skips the staging write entirely
    val latest = latestVersion(table)
    if ((1 to latest).exists(v => manifest(table, v).txn.contains(txn)))
      return None
    val (staged, st) = stage(df, table, statsCol)
    val committed = commitLoop(table, "append-once", Some(txn), 10) { cur =>
      (cur.map(_.files).getOrElse(Nil) :+ staged,
        cur.map(_.stats).getOrElse(Map.empty) ++ st.map(staged -> _),
        Some(evolve(cur.flatMap(_.schema), df)))
    }
    if (committed.isEmpty) { // lost the txn race after staging: orphan group
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) listDir(p).foreach(rm)
        Files.deleteIfExists(p)
        ()
      }
      rm(Paths.get(table, staged))
    }
    committed
  }

  /** Append as one file-group PER VALUE of `partCol` (see
    * [[stagePartitioned]]): the layout that makes [[merge]] and a
    * production compaction touch only the partitions a batch names.
    * Staged once outside the OCC loop (groups are base-independent). */
  def appendPartitioned(s: SparkSession, table: String, df: DataFrame,
      partCol: String, statsCol: Option[String] = None): Int = {
    val (groups, st) = stagePartitioned(df, table, partCol, statsCol)
    commitLoop(table, "append-partitioned", None, 10) { cur =>
      (cur.map(_.files).getOrElse(Nil) ++ groups,
        cur.map(_.stats).getOrElse(Map.empty) ++ st,
        Some(evolve(cur.flatMap(_.schema), df)))
    }.get
  }

  /** MERGE INTO on a partition-grouped table: upsert `updates` by
    * `keyCol` — matched rows replaced, unmatched inserted — rewriting
    * ONLY the file-groups whose partition tag appears in the batch.
    * Untouched partitions' groups are re-listed BY NAME (their bytes are
    * never opened, let alone rewritten — SnapshotTableSpec pins the
    * byte-identity), so at 100 TB the merge cost is ∝ the touched
    * partitions' data plus the batch, never the table. New partition
    * values insert naturally (no current group carries their tag). Runs
    * inside the OCC loop: a rebase re-reads the winner's touched groups
    * and re-stages, the serializable contract. Requires every current
    * group to be partition-tagged (mixing un-partitioned appends into a
    * merged table would make "untouched" undecidable — fail loudly). */
  def merge(s: SparkSession, table: String, updates: DataFrame,
      keyCol: String, partCol: String, statsCol: Option[String] = None): Int =
    commitLoop(table, "merge", None, 10) { curOpt =>
      val m = curOpt.getOrElse(sys.error(s"cannot merge into empty table $table"))
      require(m.files.forall(f => partitionOf(f).isDefined),
        s"merge requires a fully partition-grouped table (use appendPartitioned); " +
          s"untagged groups: ${m.files.filter(f => partitionOf(f).isEmpty)}")
      val schema = evolve(m.schema, updates)
      val touchedVals = updates.select(col(partCol).cast("string"))
        .distinct().collect().map(_.getString(0)).toSet
      val (touched, untouched) =
        m.files.partition(f => touchedVals(partitionOf(f).get))
      val merged =
        if (touched.isEmpty) updates
        else updates.unionByName(
          readGroups(s, table, touched, m.schema)
            .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti"),
          allowMissingColumns = true)
      val (newGroups, st) = stagePartitioned(merged, table, partCol, statsCol)
      (untouched ++ newGroups,
        m.stats.filter { case (g, _) => untouched.contains(g) } ++ st,
        Some(schema))
    }.get

  /** RESTORE: make version `v`'s state the latest again by committing a
    * manifest that RE-LISTS v's file-groups, stats, and schema — metadata
    * only, zero data written or read (the Delta RESTORE shape). The
    * rolled-back versions stay in the log and remain readable (`VERSION
    * AS OF` over the bad deploy still works for the post-mortem); vacuum
    * retention decides when their groups are reclaimed — and the restored
    * groups are referenced by the NEW latest manifest, so a vacuum after
    * the restore keeps them by construction. Runs through the OCC loop
    * like any writer. */
  def restore(table: String, v: Int): Int = {
    val old = manifest(table, v)
    commitLoop(table, s"restore-v$v", None, 10) { _ =>
      (old.files, old.stats, old.schema)
    }.get
  }

  /** Full-rewrite transaction (MERGE / DELETE / UPDATE at fixture scale):
    * the new snapshot is `f(current snapshot)`, staged as one new group.
    * Re-stages on OCC retry — the rebase a serializable rewrite needs.
    * On an empty table `f` receives None. A rewrite owns the schema
    * outright (it replaces every row), so type changes are legal HERE. */
  def transact(s: SparkSession, table: String, op: String,
      statsCol: Option[String] = None)(
      f: Option[DataFrame] => DataFrame): Int =
    commitLoop(table, op, None, 10) { cur =>
      val in = cur.filter(_.files.nonEmpty)
        .map(m => snapshotDf(s, table, m))
      val result = f(in)
      val (staged, st) = stage(result, table, statsCol)
      (Seq(staged), st.map(staged -> _).toMap, Some(ddlOf(result)))
    }.get

  /** Exactly-once full-rewrite transaction — [[transact]] with a txn tag
    * (the incremental-materialized-view maintenance contract: each source
    * version's delta is applied as ONE tagged rewrite of the derived
    * table, so an at-least-once replayer — a restarted maintenance job
    * re-walking the source log — can never double-apply an increment).
    * Returns None when the tag is already in the log. A retry that loses
    * the txn race after staging leaves an orphan group, reclaimed by
    * vacuum's grace path like any uncommitted stage. */
  def transactOnce(s: SparkSession, table: String, op: String, txn: String,
      statsCol: Option[String] = None)(
      f: Option[DataFrame] => DataFrame): Option[Int] =
    commitLoop(table, op, Some(txn), 10) { cur =>
      val in = cur.filter(_.files.nonEmpty)
        .map(m => snapshotDf(s, table, m))
      val result = f(in)
      val (staged, st) = stage(result, table, statsCol)
      (Seq(staged), st.map(staged -> _).toMap, Some(ddlOf(result)))
    }

  /** Compaction (OPTIMIZE): rewrite the current snapshot's file-groups
    * into ONE group and commit a manifest listing only it — content
    * identical (`q_snapshot_compact` hash-proves it against the same
    * relational truth as the uncompacted read), per-read file fan-out
    * collapsed. Runs through the same OCC loop as any write, so a
    * concurrent append simply wins or loses a version like any other
    * committer. The merged group's key stats need NO data scan: when
    * every input group carried stats, the union's bounds are the
    * min-of-mins / max-of-maxes straight from the previous manifest.
    * Old groups stay on disk — every pre-compaction version remains
    * readable — until [[vacuum]] reclaims them. Production compacts per
    * size-tiered partition bins (q_compaction_plan is that planner),
    * not the whole table. */
  def compact(s: SparkSession, table: String): Int =
    commitLoop(table, "compact", None, 10) { curOpt =>
      val m = curOpt.filter(_.files.nonEmpty).getOrElse(
        sys.error(s"cannot compact empty table $table"))
      val in = snapshotDf(s, table, m)
      val (staged, _) = stage(in, table, None)
      // manifest-only bounds derivation holds only when no tombstones
      // narrowed the data (post-delete bounds could be loose; loose is
      // SAFE for pruning but we stay conservative and drop them)
      val merged =
        if (m.files.forall(m.stats.contains) && !m.files.exists(isDeleteGroup))
          Map(staged -> (m.stats.values.map(_._1).min,
            m.stats.values.map(_._2).max))
        else Map.empty[String, (Long, Long)]
      (Seq(staged), merged, m.schema)
    }.get

  /** Partition-preserving compaction (the production OPTIMIZE for a
    * partition-grouped table — [[compact]] would collapse everything to
    * ONE untagged group, silently making the table un-[[merge]]-able):
    * partitions holding MORE than one file-group are rewritten into one
    * group each — all fragmented partitions in a single distributed
    * partitioned write — while single-group partitions are re-listed by
    * name, bytes untouched. Cost ∝ fragmented partitions' data, never
    * the table: exactly the bin-packing cost model `q_compaction_plan`
    * plans with, carried to the ACID surface. Runs through the OCC loop
    * like any writer. */
  def compactPartitions(s: SparkSession, table: String, partCol: String): Int =
    commitLoop(table, "compact-partitions", None, 10) { curOpt =>
      val m = curOpt.filter(_.files.nonEmpty).getOrElse(
        sys.error(s"cannot compact empty table $table"))
      require(m.files.forall(f => partitionOf(f).isDefined),
        s"compactPartitions requires a fully partition-grouped table; " +
          s"untagged groups: ${m.files.filter(f => partitionOf(f).isEmpty)}")
      val byPart = m.files.groupBy(f => partitionOf(f).get)
      val (frag, fine) = byPart.partition(_._2.size > 1)
      val (newGroups, _) =
        if (frag.isEmpty) (Seq.empty[String], Map.empty[String, (Long, Long)])
        else stagePartitioned(
          readGroups(s, table, frag.values.flatten.toSeq, m.schema),
          table, partCol)
      val kept = fine.values.flatten.toSeq
      // a rewritten partition's merged key bounds need NO data scan when
      // every input group carried stats: min-of-mins / max-of-maxes per
      // partition, straight from the previous manifest (the [[compact]]
      // derivation, per partition)
      val mergedStats = newGroups.flatMap { g =>
        val p = partitionOf(g).get
        val olds = frag.getOrElse(p, Seq.empty)
        if (olds.nonEmpty && olds.forall(m.stats.contains)) {
          val ss = olds.map(m.stats)
          Some(g -> (ss.map(_._1).min, ss.map(_._2).max))
        } else None
      }.toMap
      (kept ++ newGroups,
        m.stats.filter { case (g, _) => kept.contains(g) } ++ mergedStats,
        m.schema)
    }.get

  /** The file-groups version `v` ADDED over version `v−1` — the
    * incremental-consumption contract (a streaming source over the
    * table: offsets are versions, each micro-batch reads exactly the
    * groups its version staged, cost ∝ the increment, never the table).
    * For append commits this is precisely the appended data; a rewrite
    * commit (transact / merge / compact) surfaces its restaged groups —
    * the Delta `ignoreChanges` semantics, where a rewritten partition's
    * rows re-deliver and the consumer dedups by key downstream.
    * Returns an empty relation with v's schema when nothing was added. */
  def readAdded(s: SparkSession, table: String, v: Int): DataFrame = {
    require(v > 0, "version numbers start at 1")
    val m = manifest(table, v)
    val prev = if (v == 1) Set.empty[String] else manifest(table, v - 1).files.toSet
    // a delete commit adds only tombstone groups: it DELIVERS NOTHING
    // (the Delta ignoreDeletes contract — an incremental consumer that
    // must observe deletes diffs snapshots via the CDF read instead)
    val added = m.files.filterNot(prev).filterNot(isDeleteGroup)
    if (added.isEmpty)
      readGroups(s, table, m.files.filterNot(isDeleteGroup), m.schema).limit(0)
    else readGroups(s, table, added, m.schema)
  }

  /** Manifest-level zone-map pruning: the file-groups of version `v`
    * whose recorded key range intersects [lo, hi] — groups without stats
    * are always kept (stats are an optimization, never a correctness
    * gate). Planning-only: touches no data. */
  def prunedFiles(table: String, v: Int, lo: Long, hi: Long): Seq[String] = {
    val m = manifest(table, v)
    m.files.filterNot(isDeleteGroup).filter(f => m.stats.get(f).forall {
      case (mn, mx) => mx >= lo && mn <= hi
    })
  }

  /** Snapshot read of only the file-groups whose manifest key range
    * intersects [lo, hi] — the production shape for selective MERGE /
    * CDF / point-lookup reads: at 100 TB the manifest (file names +
    * bounds) is the only thing consulted before the matching groups'
    * parquet scan, so the read cost is proportional to the MATCHING
    * data, not the table. The caller still applies its own row-level
    * predicate; pruning only guarantees a superset. Returns an empty
    * relation with the snapshot's schema when nothing intersects. */
  def readPruned(s: SparkSession, table: String, lo: Long, hi: Long,
      asOf: Option[Int] = None): DataFrame = {
    val v = asOf.getOrElse(latestVersion(table))
    require(v > 0, s"table $table has no committed versions")
    val keep = prunedFiles(table, v, lo, hi).toSet
    snapshotDf(s, table, manifest(table, v), keep)
  }

  /** Every file-group directory currently on disk (committed or staged):
    * plain groups are direct children of `data/`; partition-grouped
    * stages are one level deeper (`data/stage-<uuid>/_pt=<v>`). */
  private def groupsOnDisk(table: String): Seq[String] = {
    val dataDir = Paths.get(table, "data")
    if (!Files.isDirectory(dataDir)) Seq.empty
    else listDir(dataDir).flatMap { p =>
      val n = p.getFileName.toString
      if (n.startsWith("stage-") && Files.isDirectory(p))
        listDir(p).filter(Files.isDirectory(_))
          .map(q => s"data/$n/${q.getFileName}")
      else Seq(s"data/$n")
    }
  }

  private def newestMtime(p: Path): Long =
    if (Files.isDirectory(p))
      (Files.getLastModifiedTime(p).toMillis +: listDir(p).map(newestMtime)).max
    else Files.getLastModifiedTime(p).toMillis

  /** Vacuum: retire history. Keeps the newest `retainLast` versions;
    * deletes every manifest below the horizon and every file-group no
    * retained manifest references — EXCEPT groups whose newest mtime is
    * within `graceMs` of now (ADVICE r13: an in-flight writer's
    * staged-but-uncommitted group is unreferenced by construction; the
    * Delta-style retention window keeps a concurrent vacuum from
    * deleting it out from under the commit). Pass `graceMs = 0` only
    * when external write exclusion is guaranteed (a sequential harness).
    * Never needed for correctness — purely a storage-reclaim policy, and
    * the ONLY operation that makes a `VERSION AS OF` unreadable (it then
    * fails the loud "does not exist" path, not a missing-file read).
    * Returns the deleted group names. */
  def vacuum(table: String, retainLast: Int,
      graceMs: Long = 15L * 60L * 1000L): Seq[String] = {
    require(retainLast >= 1, "must retain at least the latest version")
    val latest = latestVersion(table)
    require(latest > 0, s"table $table has no committed versions")
    val horizon = math.max(1, latest - retainLast + 1)
    val retained = (horizon to latest).flatMap(v => manifest(table, v).files).toSet
    // drop pre-horizon manifests first: readers resolve manifests before
    // files, so a version either resolves fully or fails the loud check
    (1 until horizon).foreach(v => Files.deleteIfExists(manifestPath(table, v)))
    val cutoff = System.currentTimeMillis() - graceMs
    val victims = groupsOnDisk(table)
      .filterNot(retained)
      .filter(g => newestMtime(Paths.get(table, g)) <= cutoff)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) listDir(p).foreach(rm)
      Files.deleteIfExists(p)
      ()
    }
    victims.foreach(g => rm(Paths.get(table, g)))
    // sweep stage dirs left empty once all their partition groups are gone
    val dataDir = Paths.get(table, "data")
    if (Files.isDirectory(dataDir))
      listDir(dataDir)
        .filter(p => p.getFileName.toString.startsWith("stage-") &&
          Files.isDirectory(p) && listDir(p).isEmpty)
        .foreach(p => Files.deleteIfExists(p))
    victims.sorted
  }
}
