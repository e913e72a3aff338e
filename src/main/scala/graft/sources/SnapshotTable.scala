package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *     ATOMIC create of the next manifest (`Files.createFile`, the POSIX
  *     O_EXCL analogue of S3 put-if-absent / HDFS rename). Exactly one of
  *     N racing writers wins a version; losers see
  *     FileAlreadyExistsException, re-read the new latest, REBASE (their
  *     snapshot function is re-run against the winner's state), and
  *     retry. That is serializable commit ordering with no locks and no
  *     coordinator — SnapshotTableSpec race-proves it.
  *
  * 100 TB shape: manifests carry file NAMES, never data — commit cost is
  * O(changed file-groups), independent of table size; `append` stages only
  * the new rows. [[transact]] here rewrites the full snapshot
  * (copy-on-write at fixture scale); a production MERGE prunes to the
  * touched file-groups first (join the batch against per-file min/max
  * zone maps — the same pruning `q_zone_map` measures) and rewrites only
  * those, which this log format already supports since a manifest may mix
  * old and new file-groups. Vacuum = delete file-groups referenced by no
  * retained manifest; never required for correctness.
  */
object SnapshotTable {

  /** One committed version: the complete file-group list of the snapshot,
    * plus optional per-group (min, max) stats over one designated int64
    * key column — the manifest-level zone map that lets a reader plan
    * which groups to open WITHOUT touching data (Iceberg's column
    * bounds / Delta's file stats, reduced to the key column). `op` is a
    * human-readable audit tag, not protocol state. */
  final case class Manifest(version: Int, op: String, files: Seq[String],
      stats: Map[String, (Long, Long)] = Map.empty)

  private def commitsDir(table: String): Path = Paths.get(table, "_commits")

  private def manifestPath(table: String, v: Int): Path =
    commitsDir(table).resolve(f"v$v%05d.json")

  /** Largest committed version, or 0 if the log is empty (version numbers
    * start at 1; "version 0" reads as the empty table). */
  def latestVersion(table: String): Int = {
    val d = commitsDir(table)
    if (!Files.isDirectory(d)) 0
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  // Hand-rolled single-line JSON, mirroring graft.Verify's discipline (the
  // library keeps zero JSON deps). File-group names are UUIDs we mint, so
  // no escaping is ever needed; the parser rejects anything else loudly.
  // A group WITH key stats serializes as "name|min|max" inside the same
  // array — flat, order-stable, and groups without stats stay plain names
  // (stats are an optimization, never required for correctness).
  private def render(m: Manifest): String = {
    require(m.files.forall(f => f.matches("[A-Za-z0-9/_.-]+")),
      s"unexpected characters in file-group name: ${m.files}")
    val fs = m.files.sorted.map { f =>
      m.stats.get(f) match {
        case Some((lo, hi)) => "\"" + f + "|" + lo + "|" + hi + "\""
        case None => "\"" + f + "\""
      }
    }.mkString("[", ",", "]")
    s"""{"version":${m.version},"op":"${m.op}","files":$fs}"""
  }

  private def parse(v: Int, s: String): Manifest = {
    val op = """"op":"([^"]*)"""".r.findFirstMatchIn(s)
      .getOrElse(sys.error(s"malformed manifest v$v: $s")).group(1)
    val files = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(s)
      .getOrElse(sys.error(s"malformed manifest v$v: $s")).group(1)
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
    Manifest(v, op, fs, st)
  }

  def manifest(table: String, version: Int): Manifest = {
    val p = manifestPath(table, version)
    require(Files.exists(p),
      s"version $version does not exist (latest: ${latestVersion(table)})")
    parse(version, Files.readString(p))
  }

  /** Snapshot read. `asOf = Some(k)` is `VERSION AS OF k`; None reads the
    * latest committed version. Version 0 / an empty log is an error — the
    * caller owns schema knowledge we don't have for an empty table. */
  def read(s: SparkSession, table: String, asOf: Option[Int] = None): DataFrame = {
    val v = asOf.getOrElse(latestVersion(table))
    require(v > 0, s"table $table has no committed versions")
    val m = manifest(table, v)
    s.read.parquet(m.files.map(f => s"$table/$f"): _*)
  }

  /** Stage a DataFrame as a new immutable file-group; returns its
    * table-relative name plus (min, max) of `statsCol` when one is
    * designated (computed on the staged data — one cheap agg — and
    * carried in the manifest so readers can prune without opening the
    * group). Staged groups are invisible to every reader until a
    * manifest lists them. */
  private def stage(df: DataFrame, table: String,
      statsCol: Option[String]): (String, Option[(Long, Long)]) = {
    val name = s"data/${java.util.UUID.randomUUID().toString}"
    df.write.parquet(s"$table/$name")
    val st = statsCol.map { c =>
      val r = df.sparkSession.read.parquet(s"$table/$name")
        .agg(org.apache.spark.sql.functions.min(c).cast("long"),
          org.apache.spark.sql.functions.max(c).cast("long")).head()
      (r.getLong(0), r.getLong(1))
    }
    (name, st)
  }

  /** The one atomic primitive: publish `m` as version `m.version` iff no
    * other writer got there first — open(O_CREAT|O_EXCL) via CREATE_NEW,
    * the POSIX analogue of an object store's put-if-absent on the manifest
    * key. (NOT tmp-file + Files.move: Java's no-replace move is a
    * check-then-rename — two racers can both pass the check and the POSIX
    * rename silently replaces, losing a committed version.) The claim is
    * atomic; the one-page content lands in the same call, and a reader
    * only ever resolves a manifest version it saw in a directory listing
    * or as latestVersion, after the claim. */
  private def tryCommit(table: String, m: Manifest): Boolean = {
    Files.createDirectories(commitsDir(table))
    try {
      Files.writeString(manifestPath(table, m.version), render(m),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      true
    } catch { case _: FileAlreadyExistsException => false }
  }

  /** Optimistic-concurrency commit loop: compute the next snapshot's
    * file-group list FROM the current latest version, try to publish as
    * latest+1, rebase and retry on conflict. `next` receives the current
    * manifest (None on an empty table) and returns the complete new file
    * list; it re-runs on every retry, so losers always rebase onto the
    * winner's state. Returns the committed version. */
  def commit(table: String, op: String, maxRetries: Int = 10)(
      next: Option[Manifest] => (Seq[String], Map[String, (Long, Long)])): Int = {
    var attempt = 0
    while (attempt <= maxRetries) {
      val base = latestVersion(table)
      val cur = if (base == 0) None else Some(manifest(table, base))
      val (files, stats) = next(cur)
      val m = Manifest(base + 1, op, files, stats)
      if (tryCommit(table, m)) return m.version
      attempt += 1
    }
    sys.error(s"commit of '$op' to $table lost $maxRetries OCC races; giving up")
  }

  /** Append: stage the new rows once, then commit prev ∪ new. The staged
    * group never depends on the base version, so OCC retries re-run only
    * the O(1) manifest step — the production fast path. Pass `statsCol`
    * to record the group's (min, max) of that int64 column in the
    * manifest for [[readPruned]]. */
  def append(s: SparkSession, table: String, df: DataFrame,
      statsCol: Option[String] = None): Int = {
    val (staged, st) = stage(df, table, statsCol)
    commit(table, "append") { cur =>
      (cur.map(_.files).getOrElse(Nil) :+ staged,
        cur.map(_.stats).getOrElse(Map.empty) ++ st.map(staged -> _))
    }
  }

  /** Full-rewrite transaction (MERGE / DELETE / UPDATE at fixture scale):
    * the new snapshot is `f(current snapshot)`, staged as one new group.
    * Re-stages on OCC retry — the rebase a serializable rewrite needs.
    * On an empty table `f` receives None. */
  def transact(s: SparkSession, table: String, op: String,
      statsCol: Option[String] = None)(
      f: Option[DataFrame] => DataFrame): Int =
    commit(table, op) { cur =>
      val in = cur.filter(_.files.nonEmpty)
        .map(m => s.read.parquet(m.files.map(f => s"$table/$f"): _*))
      val (staged, st) = stage(f(in), table, statsCol)
      (Seq(staged), st.map(staged -> _).toMap)
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
    commit(table, "compact") { cur =>
      val m = cur.filter(_.files.nonEmpty).getOrElse(
        sys.error(s"cannot compact empty table $table"))
      val in = s.read.parquet(m.files.map(f => s"$table/$f"): _*)
      val (staged, _) = stage(in, table, None)
      val merged =
        if (m.files.forall(m.stats.contains))
          Map(staged -> (m.stats.values.map(_._1).min,
            m.stats.values.map(_._2).max))
        else Map.empty[String, (Long, Long)]
      (Seq(staged), merged)
    }

  /** Manifest-level zone-map pruning: the file-groups of version `v`
    * whose recorded key range intersects [lo, hi] — groups without stats
    * are always kept (stats are an optimization, never a correctness
    * gate). Planning-only: touches no data. */
  def prunedFiles(table: String, v: Int, lo: Long, hi: Long): Seq[String] = {
    val m = manifest(table, v)
    m.files.filter(f => m.stats.get(f).forall {
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
    val keep = prunedFiles(table, v, lo, hi)
    if (keep.isEmpty)
      read(s, table, Some(v)).limit(0)
    else s.read.parquet(keep.map(f => s"$table/$f"): _*)
  }

  /** Vacuum: retire history. Keeps the newest `retainLast` versions;
    * deletes every manifest below the horizon and every file-group no
    * retained manifest references. Never needed for correctness — purely
    * a storage-reclaim policy, and the ONLY operation that makes a
    * `VERSION AS OF` unreadable (it then fails the loud "does not exist"
    * path, not a missing-file read). Returns the deleted group names. */
  def vacuum(table: String, retainLast: Int): Seq[String] = {
    require(retainLast >= 1, "must retain at least the latest version")
    val latest = latestVersion(table)
    require(latest > 0, s"table $table has no committed versions")
    val horizon = math.max(1, latest - retainLast + 1)
    val retained = (horizon to latest).flatMap(v => manifest(table, v).files).toSet
    // drop pre-horizon manifests first: readers resolve manifests before
    // files, so a version either resolves fully or fails the loud check
    (1 until horizon).foreach(v => Files.deleteIfExists(manifestPath(table, v)))
    val dataDir = Paths.get(table, "data")
    val victims =
      if (!Files.isDirectory(dataDir)) Seq.empty[String]
      else Files.list(dataDir).iterator().asScala
        .map(p => s"data/${p.getFileName}")
        .filterNot(retained)
        .toSeq
    victims.foreach { g =>
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p))
          Files.list(p).iterator().asScala.toSeq.foreach(rm)
        Files.deleteIfExists(p)
        ()
      }
      rm(Paths.get(table, g))
    }
    victims.sorted
  }
}
