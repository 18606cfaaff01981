package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Merge-on-read row-level operations — the deletion-vector half of
  * the row-level story, via Spark's native delta-write contract
  * ([[SupportsDelta]]):
  *
  *  - the row id is `(_file, _pos)` — the two metadata columns the scan
  *    already produces (Iceberg's position-delete row id, exactly);
  *  - DELETE plans a `WriteDelta`: the operation's scan reads candidate
  *    files (manifest stats/blooms still prune), the WHERE selects the
  *    doomed rows, and each one reaches [[GraftDeltaWriter.delete]] as
  *    a row id — no data column ever travels;
  *  - UPDATE (`representUpdateAsDeleteAndInsert`) splits each matched
  *    row into a DELETE of its row id plus a REINSERT of the updated
  *    row: the old version is masked in place, the new version lands
  *    in a (tiny) fresh part file — Iceberg's MOR update, exactly;
  *  - commit folds the collected positions into the snapshot's
  *    deletion vectors and appends the replacement files in ONE
  *    manifest advance ([[GraftVersions.applyDelta]]): a scattered
  *    UPDATE over a 100 TB table that copy-on-write would turn into a
  *    rewrite of every touched gigabyte-file commits KBs of masks plus
  *    only the changed rows' bytes; readers pay a sorted-mask skip;
  *    OPTIMIZE materializes masks away.
  *
  * Chosen per-table and per-command: `delete.mode` / `update.mode` =
  * `merge-on-read` on a versioned table; MERGE stays copy-on-write
  * (its multi-action matrix is the rewrite reference point), and the
  * metadata-only fast path ([[GraftMetaDelete]]) still wins when stats
  * prove whole files.
  */
class GraftMorOperation(path: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {
  // optimistic concurrency: the snapshot the scan planned against;
  // the UPDATE/MERGE commit refuses to land over a racer that touched
  // the same files (two MOR updates masking the same row would
  // otherwise BOTH land replacements — a duplicate). Pure deletes
  // merge commutatively and skip the check.
  @volatile private var readVersion: Option[Long] = None

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String =
    s"GraftDocs MOR $cmd (deletion vectors)"
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty
  override def representUpdateAsDeleteAndInsert(): Boolean = true
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFilesScanBuilder(path,
      onSnapshotResolved = Some(v => readVersion = Some(v)))
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new GraftDvBatchWrite(path, info.queryId(), info.schema(),
            cmd.toString.toLowerCase, () => readVersion)
      }
    }
}

/** Per-task result: deleted positions grouped by file, plus the staged
  * replacement file (UPDATE's rewritten rows), if any. Tasks see whole
  * files (one file = one input partition), so the maps of distinct
  * tasks touch distinct files unless speculation retries a task — the
  * driver-side union in commit() is idempotent either way. */
case class GraftDvCommitMessage(deletes: Map[String, Array[Long]],
    inserted: Option[WriterCommitMessage]) extends WriterCommitMessage

class GraftDvBatchWrite(path: String, queryId: String,
    writeSchema: StructType, opName: String,
    readVersion: () => Option[Long] = () => None) extends DeltaBatchWrite {
  private def root = Paths.get(path)
  private def staging = root.resolve("_staging").resolve(queryId)
  // same collision-free naming contract as the COW rewrites: staged
  // replacement parts must land beside files every older snapshot
  // still references
  private val suffix = "-" + queryId.toLowerCase.replaceAll("[^0-9a-f]", "")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    val idx =
      if (writeSchema.isEmpty) Array.empty[Int] // pure DELETE: no data rows
      else Array("doc_id", "title", "fp", "n_words")
        .map(writeSchema.fieldIndex)
    val guards = GraftWriteGuards.forTable(root, writeSchema,
      numPartitions = Option(info).map(_.numPartitions()).getOrElse(1),
      // MOR row-level ops rewrite existing rows (plus MERGE inserts):
      // generated cells recompute, identity cells pass through (fresh
      // rows arrive with NULL identity cells and allocate normally)
      insertOp = false)
    val added =
      if (writeSchema.isEmpty) Nil
      else GraftSchemas.writerAdded(root, writeSchema)
    val stagingDir = staging.toString
    val sfx = suffix
    new DeltaWriterFactory {
      override def createWriter(partitionId: Int,
          taskId: Long): DeltaWriter[InternalRow] =
        new GraftDeltaWriter(stagingDir, partitionId, taskId, idx, sfx,
          guards, added)
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val merged = scala.collection.mutable.Map.empty[String, Set[Long]]
    val entries = scala.collection.mutable.ArrayBuffer
      .empty[GraftVersions.FileEntry]
    messages.foreach { case GraftDvCommitMessage(ds, ins) =>
      ds.foreach { case (f, ps) =>
        merged(f) = merged.getOrElse(f, Set.empty) ++ ps
      }
      ins.foreach(m => entries ++= GraftDocsCommits.land(staging, root, m))
    }
    GraftWriteGuards.catchUpIdentityHwm(root, entries.toSeq)
    // delete targets arrive as `_file` BASENAMES; the live manifest may
    // reference fork files as `../../name` (branches) — resolve each
    // target to its entry name so the mask lands instead of failing the
    // live-snapshot membership check
    val liveByBase = GraftVersions.latest(root)
      .map(_.entries.map(_.name)).getOrElse(Nil)
      .map(n => GraftFiles.baseName(n) -> n).toMap
    val resolved = merged.map { case (f, ps) =>
      liveByBase.getOrElse(GraftFiles.baseName(f), f) -> ps.toSeq
    }.toMap
    // one atomic manifest advance for both halves: masks + replacements
    // (a no-op statement still commits an observable snapshot, matching
    // the COW path's empty replacement scope)
    GraftVersions.applyDelta(root, resolved, entries.toSeq, opName,
      readVersion = readVersion())
    cleanupStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging()

  private def cleanupStaging(): Unit = {
    try org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
    catch { case _: java.io.IOException => () }
    try Files.deleteIfExists(root.resolve("_staging")) catch {
      case _: java.nio.file.DirectoryNotEmptyException => ()
    }
  }
}

/** Accumulates (file, pos) row ids for the masked half; UPDATE's
  * rewritten rows stream into a LAZILY-created data writer (a pure
  * DELETE task never creates a file at all). CHECK constraints run on
  * the inserted halves through the shared writer — a violating UPDATE
  * fails its task before commit, so neither its masks nor its rows
  * land (atomicity proven in DeletionVectorSpec). */
class GraftDeltaWriter(stagingDir: String, partitionId: Int, taskId: Long,
    idx: Array[Int], fileSuffix: String, guards: GraftWriteGuards.Guards,
    added: Seq[(String, String, Int)] = Nil)
    extends DeltaWriter[InternalRow] {
  private val acc =
    scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[Long]]
  private var dataWriter: DataWriter[InternalRow] = _

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(0).toString
    val pos = id.getLong(1)
    acc.getOrElseUpdate(file,
      scala.collection.mutable.ArrayBuffer.empty[Long]) += pos
  }
  override def insert(row: InternalRow): Unit = {
    if (dataWriter == null) {
      require(idx.nonEmpty,
        "GraftDocs delta write received a data row without a write schema")
      Files.createDirectories(Paths.get(stagingDir))
      dataWriter = new GraftDocsWriterFactory(stagingDir, idx, fileSuffix,
        guards, added).createWriter(partitionId, taskId)
    }
    dataWriter.write(row)
  }
  override def reinsert(meta: InternalRow, row: InternalRow): Unit =
    insert(row)
  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "GraftDocs delta writes split updates (representUpdateAsDeleteAndInsert)")

  override def commit(): WriterCommitMessage =
    GraftDvCommitMessage(acc.view.mapValues(_.toArray).toMap,
      Option(dataWriter).map(_.commit()))
  override def abort(): Unit = if (dataWriter != null) dataWriter.abort()
  override def close(): Unit = if (dataWriter != null) dataWriter.close()
}

/** Metadata-only DELETE: the fastest of the three delete paths. When
  * every live file is PROVABLY all-match or all-miss under the DELETE's
  * predicates — per-file min/max stats against simple comparison
  * conjuncts — the whole operation is one manifest advance dropping the
  * all-match files: no scan job, no rewrite, no deletion vector. Spark
  * drives this through `SupportsDeleteV2` + its
  * `OptimizeMetadataOnlyDeleteFromTable` rule: `canDeleteWhere` answers
  * the provability question; a partial file anywhere returns false and
  * Spark falls back to the table's row-level path (COW or MOR) with
  * identical semantics. This is Delta/Iceberg's metadata-delete fast
  * path: `DELETE WHERE date < retention` on a date-clustered 100 TB
  * table finishes in one log write. */
object GraftMetaDelete {
  /** Allowed [lo, hi] interval per conjunct; None = shape we can't
    * reason about (reject → row-level fallback, never guess). */
  def interval(p: V2Predicate): Option[(String, Long, Long)] = {
    def ref(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames.length == 1 =>
        Some(r.fieldNames.head)
      case _ => None
    }
    def lit(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[Long] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        l.value() match {
          case n: java.lang.Number => Some(n.longValue())
          case _ => None
        }
      case _ => None
    }
    p.children().toSeq match {
      case Seq(a, b) =>
        (ref(a), lit(b), ref(b), lit(a)) match {
          case (Some(c), Some(v), _, _) => forward(p.name(), c, v)
          case (_, _, Some(c), Some(v)) => mirrored(p.name(), c, v)
          case _ => None
        }
      case _ => None
    }
  }
  private def forward(op: String, c: String, v: Long) = op match {
    case "=" => Some((c, v, v))
    case "<" => Some((c, Long.MinValue, v - 1))
    case "<=" => Some((c, Long.MinValue, v))
    case ">" => Some((c, v + 1, Long.MaxValue))
    case ">=" => Some((c, v, Long.MaxValue))
    case _ => None
  }
  private def mirrored(op: String, c: String, v: Long) = op match {
    case "=" => Some((c, v, v))
    case ">" => Some((c, Long.MinValue, v - 1)) // v > col
    case ">=" => Some((c, Long.MinValue, v))
    case "<" => Some((c, v + 1, Long.MaxValue))
    case "<=" => Some((c, v, Long.MaxValue))
    case _ => None
  }

  /** Some(true) = every LIVE row of the file matches all conjuncts;
    * Some(false) = none does; None = can't prove either (partial).
    * File stats bound all physical rows, so both proofs stay sound for
    * deletion-vector-masked files too. */
  def classify(e: GraftVersions.FileEntry,
      conjuncts: Seq[(String, Long, Long)]): Option[Boolean] = {
    val verdicts = conjuncts.map { case (c, plo, phi) =>
      e.stats.get(c) match {
        case Some((mn, mx)) if mn > mx => Some(false) // empty file
        case Some((mn, mx)) =>
          if (mn >= plo && mx <= phi) Some(true)
          else if (mx < plo || mn > phi) Some(false)
          else None
        case None => None // no stats: never prove, never guess
      }
    }
    if (verdicts.contains(Some(false))) Some(false)
    else if (verdicts.forall(_.contains(true))) Some(true)
    else None
  }

  /** The all-match file names IF the whole predicate set is decidable
    * for every live file; None = some file is partial (or a conjunct
    * is untranslatable) → caller must answer canDeleteWhere=false. */
  def provableScope(entries: Seq[GraftVersions.FileEntry],
      predicates: Array[V2Predicate]): Option[Set[String]] = {
    val conjuncts = predicates.toSeq.map(interval)
    if (conjuncts.exists(_.isEmpty)) return None
    val cs = conjuncts.flatten
    val classified = entries.map(e => e.name -> classify(e, cs))
    if (classified.exists(_._2.isEmpty)) None
    else Some(classified.collect { case (n, Some(true)) => n }.toSet)
  }
}

/** EQUALITY DELETE predicate recognition (Iceberg v2's second delete
  * format, gated by `delete.mode=equality`): the whole predicate set
  * must reduce to doc_id ∈ {values} — a single `doc_id = v`, a
  * `doc_id IN (...)`, or a conjunction of such (intersected). Values
  * must be non-negative longs ([[GraftDV]] is the value-set codec).
  * Anything else → None → the ordinary row-level path. */
object GraftEqDelete {
  private def ref(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 =>
      Some(r.fieldNames.head)
    case _ => None
  }
  private def lit(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[Long] = e match {
    case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
      l.value() match {
        case n: java.lang.Number => Some(n.longValue())
        case _ => None
      }
    case _ => None
  }
  private def valueSet(p: V2Predicate): Option[Set[Long]] = p.name() match {
    case "=" => p.children().toSeq match {
      case Seq(a, b) =>
        (ref(a), lit(b), ref(b), lit(a)) match {
          case (Some("doc_id"), Some(v), _, _) => Some(Set(v))
          case (_, _, Some("doc_id"), Some(v)) => Some(Set(v))
          case _ => None
        }
      case _ => None
    }
    case "IN" => p.children().toSeq match {
      case head +: rest if ref(head).contains("doc_id") && rest.nonEmpty =>
        val vs = rest.map(lit)
        if (vs.forall(_.isDefined)) Some(vs.flatten.toSet) else None
      case _ => None
    }
    case _ => None
  }
  /** The doc_id values the conjunction deletes, if every conjunct is an
    * equality shape on doc_id and all values are valid; None otherwise. */
  def values(predicates: Array[V2Predicate]): Option[Seq[Long]] = {
    if (predicates.isEmpty) return None
    val sets = predicates.toSeq.map(valueSet)
    if (sets.exists(_.isEmpty)) return None
    val vs = sets.flatten.reduce(_ intersect _)
    if (vs.nonEmpty && vs.forall(_ >= 0)) Some(vs.toSeq.sorted) else None
  }
}
