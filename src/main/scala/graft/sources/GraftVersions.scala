package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Snapshot-version log for the warehouse personality — the missing
  * "catalog transaction log" the write path's Scaladoc notes
  * ([[GraftDocsBatchWrite]]): an Iceberg/Delta-shaped manifest layer that
  * makes every committed table state a durable, named, time-travelable
  * SNAPSHOT.
  *
  * Opt-in per table (`TBLPROPERTIES('versioned'='true')` at CREATE, or
  * [[GraftVersions.enable]] on an existing directory). Once enabled:
  *
  *  - every commit (append, overwrite, TRUNCATE, and the per-file
  *    copy-on-write MERGE/UPDATE/DELETE rewrites) writes manifest
  *    `_versions/v%05d.manifest` listing the part files that constitute
  *    the new snapshot — and physically deletes NOTHING: superseded
  *    files stay on disk for older snapshots until [[vacuum]];
  *  - the scan resolves its file list from a manifest (latest, or a
  *    pinned version for `VERSION AS OF` / `TIMESTAMP AS OF`) instead of
  *    the directory listing, so concurrent readers get manifest-level
  *    snapshot isolation: a scan planned mid-commit sees either the old
  *    or the new snapshot, never a half-committed file mix;
  *  - [[vacuum]] (snapshot retention) expires all but the last N
  *    manifests and deletes exactly the part files no retained snapshot
  *    references — commit work and cleanup both proportional to #files,
  *    never a data rewrite.
  *
  * Why this matters for a training-data pipeline: "which exact bytes did
  * run X train on" is answerable forever as `VERSION AS OF n` — the
  * reproducibility contract Delta/Iceberg give a 100 TB corpus, here in
  * its minimal complete form. The reference notebook
  * (/root/reference/Assignment-python.py:134) reads plain immutable
  * files and has no mutation story at all; this is the face its pipeline
  * would need the day the corpus starts being curated in place.
  *
  * Manifest format (one text file per version, written once, never
  * rewritten): line 1 `ts=<epochMicros>\top=<operation>`, then one part
  * file name per line. Commit protocol: version numbers are claimed
  * under a per-table JVM lock (single-driver deployment, matching
  * local[*]); the manifest lands via write-to-temp + ATOMIC_MOVE so a
  * concurrent reader never observes a partial manifest. Cross-driver
  * commits would need a CAS-capable catalog (Iceberg) or a LogStore
  * with putIfAbsent (Delta) — documented out of scope, loudly.
  */
object GraftVersions {
  /** A data file in a snapshot, with optional per-file doc_id min/max —
    * the Iceberg/Delta file-statistics idea in its minimal form: the
    * scan prunes files whose range is disjoint from a pushed doc_id
    * predicate, so a selective query over a range-clustered 100 TB
    * table plans a handful of files instead of all of them. `stats =
    * None` (no rows observed, or a pre-stats manifest line) means the
    * file can never be pruned — absence of stats must always widen,
    * never narrow. An EMPTY file carries `Some((0, -1))` (min > max):
    * prunable by every predicate, readable by none the less. */
  final case class FileEntry(name: String, stats: Option[(Long, Long)]) {
    /** Can a row with doc_id in [lo, hi] possibly live in this file? */
    def mayContain(lo: Long, hi: Long): Boolean = stats match {
      case Some((mn, mx)) => mn <= hi && mx >= lo
      case None => true
    }
  }

  /** `dataChange = false` marks a commit that rearranged FILES without
    * changing ROWS (compaction): time travel and live reads treat it
    * like any snapshot, but the change feed emits nothing for it —
    * Delta's dataChange=false contract. Absent in a manifest header
    * (pre-stats logs) it defaults to true. */
  final case class VersionInfo(version: Long, tsMicros: Long, op: String,
      entries: Seq[FileEntry], dataChange: Boolean = true) {
    def files: Seq[String] = entries.map(_.name)
  }

  class NoSuchVersionException(msg: String)
      extends IllegalArgumentException(msg)

  private val DIR = "_versions"
  private val ManifestName = "v(\\d{5,})\\.manifest".r

  private def versionsDir(root: Path): Path = root.resolve(DIR)

  def isVersioned(root: Path): Boolean = Files.isDirectory(versionsDir(root))

  /** Per-table commit lock (normalized absolute path, interned so every
    * writer in this JVM synchronizes on the same object). */
  private def lockFor(root: Path): AnyRef =
    root.toAbsolutePath.normalize().toString.intern()

  /** Turn versioning on: snapshot the CURRENT directory contents as v0
    * (op `enable`). Idempotent — enabling an already-versioned table is
    * a no-op, so CREATE-with-property and a later explicit call
    * compose. */
  def enable(root: Path): Unit = lockFor(root).synchronized {
    if (isVersioned(root)) return
    Files.createDirectories(versionsDir(root))
    // pre-existing files enter the log without stats (never prunable —
    // absence of stats widens, it can't lose rows)
    val current = listPartFiles(root).map(FileEntry(_, None))
    writeManifest(root, 0L, "enable", current)
  }

  private def listPartFiles(root: Path): Seq[String] = {
    if (!Files.isDirectory(root)) return Nil
    val s = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches(GraftFiles.partFileRegex)).toSeq.sorted
    } finally s.close()
  }

  private def writeManifest(root: Path, version: Long, op: String,
      entries: Seq[FileEntry], dataChange: Boolean = true): VersionInfo = {
    // strictly-increasing timestamps: TIMESTAMP AS OF floor semantics
    // need an unambiguous order even when two commits share a clock tick
    val prevTs = latest(root).map(_.tsMicros).getOrElse(Long.MinValue)
    val ts = math.max(System.currentTimeMillis() * 1000L, prevTs + 1L)
    val lines = entries.map { e =>
      e.stats match {
        case Some((mn, mx)) => s"${e.name}\t$mn\t$mx"
        case None => e.name
      }
    }
    val body = (s"ts=$ts\top=$op\tdataChange=$dataChange" +: lines)
      .mkString("", "\n", "\n")
    val target = versionsDir(root).resolve(f"v$version%05d.manifest")
    if (Files.exists(target))
      throw new IllegalStateException(
        s"version $version already committed at $target")
    val tmp = Files.createTempFile(versionsDir(root), s"v$version-", ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    VersionInfo(version, ts, op, entries, dataChange)
  }

  private def readManifest(root: Path, version: Long): VersionInfo = {
    val p = versionsDir(root).resolve(f"v$version%05d.manifest")
    val lines = Files.readAllLines(p, StandardCharsets.UTF_8)
    require(!lines.isEmpty, s"empty manifest $p")
    val header = lines.get(0).split("\t", -1).map { kv =>
      val i = kv.indexOf('='); kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap
    import scala.jdk.CollectionConverters._
    val entries = lines.asScala.toSeq.tail.filter(_.nonEmpty).map { l =>
      l.split("\t", -1) match {
        case Array(n, mn, mx) => FileEntry(n, Some((mn.toLong, mx.toLong)))
        case Array(n) => FileEntry(n, None) // pre-stats manifest line
        case other => throw new IllegalStateException(
          s"malformed manifest line '${l}' in $p")
      }
    }
    VersionInfo(version, header("ts").toLong, header("op"), entries,
      header.get("dataChange").forall(_.toBoolean))
  }

  def listVersionNumbers(root: Path): Seq[Long] = {
    val vd = versionsDir(root)
    if (!Files.isDirectory(vd)) return Nil
    val s = Files.list(vd)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).collect {
        case ManifestName(n) => n.toLong
      }.toSeq.sorted
    } finally s.close()
  }

  def listVersions(root: Path): Seq[VersionInfo] =
    listVersionNumbers(root).map(readManifest(root, _))

  def latest(root: Path): Option[VersionInfo] =
    listVersionNumbers(root).lastOption.map(readManifest(root, _))

  /** Resolve a pinned version, with available-range errors a user can
    * act on (mirrors Delta's `versionAsOf` error shape). */
  def manifest(root: Path, version: Long): VersionInfo = {
    val have = listVersionNumbers(root)
    if (!have.contains(version))
      throw new NoSuchVersionException(
        s"no version $version for table at $root; available: " +
          (if (have.isEmpty) "none (table is not versioned?)"
           else s"[${have.head}, ${have.last}]" +
             (if (have.length != (have.last - have.head + 1))
                s" minus vacuumed ${((have.head to have.last).toSet -- have.toSet).toSeq.sorted.mkString(",")}"
              else "")))
    readManifest(root, version)
  }

  /** `TIMESTAMP AS OF` floor semantics: the newest snapshot committed at
    * or before `tsMicros`. */
  def asOfTimestamp(root: Path, tsMicros: Long): VersionInfo = {
    val all = listVersions(root)
    all.filter(_.tsMicros <= tsMicros).lastOption.getOrElse {
      throw new NoSuchVersionException(
        s"timestamp $tsMicros predates the oldest retained snapshot of " +
          s"table at $root" +
          all.headOption.map(v => s" (v${v.version} at ts=${v.tsMicros})")
            .getOrElse(" (no snapshots)"))
    }
  }

  /** Advance the log by one commit: new snapshot = (latest − removed) +
    * added. `removed = None` means remove-all (overwrite / TRUNCATE
    * semantics); the per-file COW rewrites pass their matched-file
    * scope. Runs under the table lock so concurrent disjoint-scope
    * commits serialize into consecutive versions, each rebased on the
    * other's outcome — the manifest analog of the connector's
    * disjoint-file concurrency promise. */
  def advance(root: Path, op: String, removed: Option[Set[String]],
      added: Seq[FileEntry], dataChange: Boolean = true): VersionInfo =
    lockFor(root).synchronized {
      val base = latest(root).getOrElse(
        throw new IllegalStateException(s"advance on unversioned table $root"))
      val kept = removed match {
        case Some(scope) => base.entries.filterNot(e => scope(e.name))
        case None => Nil
      }
      writeManifest(root, base.version + 1, op,
        (kept ++ added).sortBy(_.name), dataChange)
    }

  /** OPTIMIZE-style small-file compaction: rewrite the LIVE snapshot's
    * rows into `targetFiles` part files and commit them as a
    * `dataChange = false` snapshot — time travel to every prior version
    * still reads the original files (nothing is deleted until vacuum),
    * live reads plan the few compacted files, and the change feed skips
    * the commit entirely (no rows changed, nothing to re-emit). The
    * compacted files are written and moved in BEFORE the manifest
    * advance, so a crash mid-compaction leaves only unreferenced files
    * (vacuum reclaims them), never a corrupted snapshot. Cost is one
    * read + one write of the live rows — the classic nightly OPTIMIZE
    * a 100 TB table runs per partition, never a log rewrite. */
  def compact(spark: org.apache.spark.sql.SparkSession, root: Path,
      targetFiles: Int = 1,
      // range-cluster by doc_id: files get DISJOINT sorted id ranges, so
      // the per-file min/max stats prune selective scans to one or two
      // files — the Z-order-lite layout a 100 TB table compacts into
      clusterByDocId: Boolean = false): VersionInfo = {
    require(isVersioned(root), s"compact needs a versioned table: $root")
    val n = math.max(targetFiles, 1)
    val df = spark.read.format("graft.sources.GraftDocsSource")
      .option("path", root.toString).load()
    val live =
      if (clusterByDocId)
        df.repartitionByRange(n, org.apache.spark.sql.functions.col("doc_id"))
          .sortWithinPartitions("doc_id")
      else df.coalesce(n)
    val tmp = Files.createTempDirectory(root, "_compact")
    try {
      // the rewrite lands in a VERSIONED scratch dir so its commit
      // records per-file min/max stats; those stats ride along into the
      // compact manifest under the files' final names
      enable(tmp)
      live.write.format("graft.sources.GraftDocsSource")
        .option("path", tmp.toString).mode("append").save()
      val staged = latest(tmp).map(_.entries).getOrElse(Nil)
      // land beside the originals under collision-free names
      val tag = java.util.UUID.randomUUID.toString.replace("-", "")
      val landed = staged.zipWithIndex.map { case (e, i) =>
        val name = f"part-$i%05d-$tag.tsv"
        Files.move(tmp.resolve(e.name), root.resolve(name),
          StandardCopyOption.ATOMIC_MOVE)
        FileEntry(name, e.stats)
      }
      advance(root, "compact", removed = None, added = landed,
        dataChange = false)
    } finally {
      try org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      catch { case _: java.io.IOException => () }
    }
  }

  /** Delta-style RESTORE: make snapshot `version` the live state again
    * via a NEW commit whose file set is the old snapshot's (zero data
    * movement — manifests share files; vacuum's union-of-retained
    * reference counting already handles sharing). History is preserved:
    * the bad commits stay time-travelable until vacuumed, and the
    * restore itself is an auditable `restore` entry. A dataChange
    * commit: downstream feeds fail (or re-consume under ignoreChanges)
    * exactly as they would for any rewrite — silently rewinding a
    * consumed stream would corrupt consumers. */
  def restore(root: Path, version: Long): VersionInfo = {
    val target = manifest(root, version) // throws if vacuumed/absent
    advance(root, "restore", removed = None, added = target.entries)
  }

  final case class VacuumStats(expiredVersions: Seq[Long],
      deletedFiles: Seq[String])

  /** Snapshot retention: keep the newest `keepLast` snapshots, expire
    * the rest, and delete exactly the part files no retained snapshot
    * references. Retained snapshots stay byte-identically readable;
    * expired ones fail with the available-range error. */
  def vacuum(root: Path, keepLast: Int): VacuumStats =
    lockFor(root).synchronized {
      require(keepLast >= 1, s"vacuum must keep at least 1 snapshot")
      val versions = listVersionNumbers(root)
      val (expire, retain) =
        versions.splitAt(math.max(versions.length - keepLast, 0))
      val retainedFiles =
        retain.flatMap(readManifest(root, _).files).toSet
      val expiredFiles =
        expire.flatMap(readManifest(root, _).files).toSet -- retainedFiles
      // delete manifests first: a crash mid-vacuum must never leave a
      // readable snapshot whose files are gone
      expire.foreach { v =>
        Files.deleteIfExists(versionsDir(root).resolve(f"v$v%05d.manifest"))
      }
      expiredFiles.toSeq.sorted.foreach { f =>
        Files.deleteIfExists(root.resolve(f))
      }
      VacuumStats(expire, expiredFiles.toSeq.sorted)
    }
}
