package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Merge-on-read DELETE — the deletion-vector half of the row-level
  * story, via Spark's native delta-write contract ([[SupportsDelta]]):
  *
  *  - the row id is `(_file, _pos)` — the two metadata columns the scan
  *    already produces (Iceberg's position-delete row id, exactly);
  *  - Spark plans a `WriteDelta`: the operation's scan reads candidate
  *    files (manifest stats/blooms still prune), the WHERE selects the
  *    doomed rows, and each one reaches [[GraftDvWriter.delete]] as a
  *    row id — no data column ever travels;
  *  - commit folds the collected positions into the snapshot's
  *    deletion vectors ([[GraftVersions.applyDeletes]]): ONE manifest
  *    line per touched file, ZERO data bytes moved. A scattered DELETE
  *    over a 100 TB table that copy-on-write would turn into a rewrite
  *    of every touched gigabyte-file commits in milliseconds; readers
  *    pay a sorted-mask skip; OPTIMIZE materializes masks away.
  *
  * Chosen per-table: `TBLPROPERTIES('delete.mode'='merge-on-read')` on
  * a versioned table; UPDATE and MERGE stay copy-on-write (the
  * reference point for rewrite semantics), and the metadata-only fast
  * path ([[GraftMetaDelete]]) still wins when stats prove whole files.
  */
class GraftMorDeleteOperation(path: String) extends RowLevelOperation
    with SupportsDelta {
  override def command(): RowLevelOperation.Command =
    RowLevelOperation.Command.DELETE
  override def description(): String = "GraftDocs MOR DELETE (deletion vectors)"
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFilesScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = new GraftDvBatchWrite(path)
      }
    }
}

/** Per-task result: deleted positions grouped by file. Tasks see whole
  * files (one file = one input partition), so the maps of distinct
  * tasks touch distinct files unless speculation retries a task — the
  * driver-side union in commit() is idempotent either way. */
case class GraftDvCommitMessage(deletes: Map[String, Array[Long]])
    extends WriterCommitMessage

class GraftDvBatchWrite(path: String) extends DeltaBatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    new DeltaWriterFactory {
      override def createWriter(partitionId: Int,
          taskId: Long): DeltaWriter[InternalRow] = new GraftDvWriter
    }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val merged = scala.collection.mutable.Map.empty[String, Set[Long]]
    messages.foreach { case GraftDvCommitMessage(ds) =>
      ds.foreach { case (f, ps) =>
        merged(f) = merged.getOrElse(f, Set.empty) ++ ps
      }
    }
    if (merged.nonEmpty)
      GraftVersions.applyDeletes(Paths.get(path),
        merged.view.mapValues(_.toSeq).toMap)
    else
      // a DELETE matching nothing still commits a (no-op) snapshot so
      // the operation is observable in history — mirrors the COW path,
      // which commits its (empty) replacement scope
      GraftVersions.applyDeletes(Paths.get(path), Map.empty)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Accumulates (file, pos) row ids; no bytes are written anywhere —
  * the "write" IS the commit message. */
class GraftDvWriter extends DeltaWriter[InternalRow] {
  private val acc =
    scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[Long]]

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(0).toString
    val pos = id.getLong(1)
    acc.getOrElseUpdate(file,
      scala.collection.mutable.ArrayBuffer.empty[Long]) += pos
  }
  override def insert(row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "GraftDocs delta writes serve DELETE only")
  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "GraftDocs delta writes serve DELETE only")

  override def commit(): WriterCommitMessage =
    GraftDvCommitMessage(acc.view.mapValues(_.toArray).toMap)
  override def abort(): Unit = ()
  override def close(): Unit = ()
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
    * deletion-vector-masked files. */
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
