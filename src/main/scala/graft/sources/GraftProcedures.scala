package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable maintenance procedures (`CALL cat.system.<proc>(...)`)
  * via Spark 4's DSv2 procedure contract — the operational surface a
  * lakehouse table needs beyond DML, shaped like Iceberg's `system.*`
  * procedures:
  *
  *  - `vacuum(table, keep_last)` — snapshot retention
  *    ([[GraftVersions.vacuum]]): expire all but the newest snapshots,
  *    delete exactly the files no retained snapshot references;
  *  - `optimize(table, target_files, zorder_by)` — compaction
  *    ([[GraftVersions.compact]]): rewrite the live rows into
  *    `target_files` files, optionally clustered (one column: range
  *    sort; several: Z-order), committed `dataChange=false`;
  *  - `restore(table, version)` — [[GraftVersions.restore]]: make an
  *    old snapshot live again via a new commit, history preserved.
  *
  * Each returns a one-row result set (a [[LocalScan]]) with the
  * operation's audit numbers — CALL results compose with SQL, so the
  * nightly maintenance job IS a SQL script. Procedures are
  * side-effecting, hence `isDeterministic = false`.
  */
object GraftProcedures {
  val names: Seq[String] =
    Seq("vacuum", "optimize", "restore", "clone", "tag", "drop_tag",
      "branch", "fast_forward", "merge_branch", "drop_branch",
      "expire_snapshots", "remove_orphan_files", "analyze",
      "create_mv", "create_join_mv", "create_chain_mv", "refresh_mv",
      "vacuum_dry_run", "optimize_where")

  /** `resolve` maps a table name to its EXISTING directory (throws for
    * absent tables); `resolveNew` maps a name to the directory it WOULD
    * occupy (containment-checked, existence not required) — what
    * clone's target needs. */
  def apply(name: String, resolve: String => Path,
      resolveNew: String => Path): UnboundProcedure =
    name match {
      case "vacuum" => vacuum(resolve)
      case "vacuum_dry_run" => vacuumDryRun(resolve)
      case "optimize" => optimize(resolve)
      case "optimize_where" => optimizeWhere(resolve)
      case "restore" => restore(resolve)
      case "clone" => clone(resolve, resolveNew)
      case "tag" => tag(resolve)
      case "drop_tag" => dropTag(resolve)
      case "branch" => branch(resolve)
      case "fast_forward" => fastForward(resolve)
      case "merge_branch" => mergeBranch(resolve)
      case "drop_branch" => dropBranch(resolve)
      case "analyze" => analyzeTable(resolve)
      case "create_mv" => createMv(resolve, resolveNew)
      case "create_join_mv" => createJoinMv(resolve, resolveNew)
      case "create_chain_mv" => createChainMv(resolve, resolveNew)
      case "refresh_mv" => refreshMv(resolve)
      case "expire_snapshots" => expireSnapshots(resolve)
      case "remove_orphan_files" => removeOrphanFiles(resolve)
      case other => throw new IllegalArgumentException(
        s"unknown procedure '$other' (have: ${names.mkString(", ")})")
    }

  private def param(n: String, t: DataType) =
    ProcedureParameter.in(n, t).build()

  private def result(schema: StructType, values: Any*)
      : java.util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] =
        Array(InternalRow.fromSeq(values))
      override def description(): String = "graft procedure result"
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  private abstract class Proc(procName: String,
      params: Array[ProcedureParameter]) extends UnboundProcedure
      with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
  }

  private def vacuum(resolve: String => Path): UnboundProcedure =
    new Proc("vacuum", Array(
      param("table", StringType), param("keep_last", IntegerType))) {
      override def description(): String =
        "expire all but the newest keep_last snapshots and reclaim " +
          "files no retained snapshot references"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val stats = GraftVersions.vacuum(dir, input.getInt(1))
        result(StructType(Seq(
          StructField("expired_versions", LongType, nullable = false),
          StructField("deleted_files", LongType, nullable = false),
          StructField("oldest_retained", LongType, nullable = false))),
          stats.expiredVersions.length.toLong,
          stats.deletedFiles.length.toLong,
          GraftVersions.listVersionNumbers(dir).headOption.getOrElse(-1L))
      }
    }

  private def vacuumDryRun(resolve: String => Path): UnboundProcedure =
    new Proc("vacuum_dry_run", Array(
      param("table", StringType), param("keep_last", IntegerType))) {
      override def description(): String =
        "preflight a vacuum: report the versions it would expire, the " +
          "files it would delete, and the bytes it would reclaim — " +
          "same retention math and pins as the real run, nothing " +
          "touched"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val stats =
          GraftVersions.vacuum(dir, input.getInt(1), dryRun = true)
        val bytes = stats.deletedFiles.map { f =>
          try java.nio.file.Files.size(dir.resolve(f))
          catch { case _: java.io.IOException => 0L }
        }.sum
        result(StructType(Seq(
          StructField("would_expire_versions", LongType, nullable = false),
          StructField("would_delete_files", LongType, nullable = false),
          StructField("would_reclaim_bytes", LongType, nullable = false))),
          stats.expiredVersions.length.toLong,
          stats.deletedFiles.length.toLong, bytes)
      }
    }

  private def optimize(resolve: String => Path): UnboundProcedure =
    new Proc("optimize", Array(
      param("table", StringType), param("target_files", IntegerType),
      param("zorder_by", StringType))) {
      override def description(): String =
        "compact the live snapshot into target_files files, optionally " +
          "clustered by the comma-separated zorder_by columns " +
          "(dataChange=false commit; '' = no clustering)"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val before = GraftVersions.latest(dir).map(_.files.length).getOrElse(0)
        val cols = input.getUTF8String(2).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val info = GraftVersions.compact(
          org.apache.spark.sql.SparkSession.active, dir,
          targetFiles = input.getInt(1), clusterBy = cols)
        result(StructType(Seq(
          StructField("files_before", LongType, nullable = false),
          StructField("files_after", LongType, nullable = false),
          StructField("version", LongType, nullable = false))),
          before.toLong, info.entries.length.toLong, info.version)
      }
    }


  private def optimizeWhere(resolve: String => Path): UnboundProcedure =
    new Proc("optimize_where", Array(
      param("table", StringType), param("column", StringType),
      param("value", LongType), param("target_files", IntegerType))) {
      override def description(): String =
        "scoped compaction (Iceberg rewrite_data_files with a filter): " +
          "rewrite ONLY the live files provably single-valued at " +
          "column = value into target_files files; every other file " +
          "is untouched — partition-granular maintenance"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val column = input.getUTF8String(1).toString
        val value = input.getLong(2)
        def scopedCount: Long = GraftVersions.latest(dir)
          .map(_.entries.count(_.stats.get(column)
            .contains((value, value))).toLong).getOrElse(0L)
        val before = scopedCount
        val total = GraftVersions.latest(dir)
          .map(_.entries.length.toLong).getOrElse(0L)
        val info = GraftVersions.compactScoped(
          org.apache.spark.sql.SparkSession.active, dir, column, value,
          targetFiles = input.getInt(3))
        result(StructType(Seq(
          StructField("scoped_before", LongType, nullable = false),
          StructField("scoped_after", LongType, nullable = false),
          StructField("untouched", LongType, nullable = false),
          StructField("version", LongType, nullable = false))),
          before, scopedCount, total - before, info.version)
      }
    }

  private def clone(resolve: String => Path,
      resolveNew: String => Path): UnboundProcedure =
    new Proc("clone", Array(
      param("source", StringType), param("target", StringType),
      param("version", LongType))) {
      override def description(): String =
        "zero-copy SHALLOW CLONE: create `target` whose v0 references " +
          "`source`'s snapshot files in place (version -1 = latest); " +
          "the tables then diverge freely, and the clone's vacuum " +
          "never touches source files"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val src = resolve(input.getUTF8String(0).toString)
        val dst = resolveNew(input.getUTF8String(1).toString)
        val pin = Some(input.getLong(2)).filter(_ >= 0L)
        val info = GraftVersions.cloneShallow(src, dst, pin)
        result(StructType(Seq(
          StructField("source_version", LongType, nullable = false),
          StructField("files_referenced", LongType, nullable = false),
          StructField("bytes_copied", LongType, nullable = false))),
          pin.getOrElse(
            GraftVersions.latest(src).map(_.version).getOrElse(-1L)),
          info.entries.length.toLong, 0L)
      }
    }

  private def tag(resolve: String => Path): UnboundProcedure =
    new Proc("tag", Array(
      param("table", StringType), param("name", StringType),
      param("version", LongType))) {
      override def description(): String =
        "name snapshot `version` (-1 = latest): the tag resolves in " +
          "VERSION AS OF '<name>' and pins the snapshot against vacuum"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        // validate-and-set under the table lock so a racing vacuum
        // cannot expire the version between the check and the pin
        val v = GraftVersions.withTableLock(dir) {
          val v0 = Some(input.getLong(2)).filter(_ >= 0L).getOrElse(
            GraftVersions.latest(dir).map(_.version).getOrElse(
              throw new IllegalStateException(
                s"tag on unversioned table $dir")))
          GraftVersions.manifest(dir, v0) // throws for absent/vacuumed
          GraftTableMeta.setTag(dir, name, v0)
          v0
        }
        result(StructType(Seq(
          StructField("tag_name", StringType, nullable = false),
          StructField("version", LongType, nullable = false))),
          UTF8String.fromString(name), v)
      }
    }

  private def dropTag(resolve: String => Path): UnboundProcedure =
    new Proc("drop_tag", Array(
      param("table", StringType), param("name", StringType))) {
      override def description(): String =
        "remove a snapshot tag; the snapshot stays readable by number " +
          "until retention expires it"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val existed = GraftVersions.withTableLock(dir) {
          GraftTableMeta.dropTag(dir, name)
        }
        if (!existed) throw new IllegalArgumentException(
          s"no tag '$name' on table at $dir; tags: " +
            (GraftTableMeta.tags(dir).keys.toSeq.sorted match {
              case Nil => "none"
              case ts => ts.mkString(", ")
            }))
        result(StructType(Seq(
          StructField("tag_name", StringType, nullable = false),
          StructField("dropped", BooleanType, nullable = false))),
          UTF8String.fromString(name), true)
      }
    }

  private def expireSnapshots(resolve: String => Path): UnboundProcedure =
    new Proc("expire_snapshots", Array(
      param("table", StringType), param("older_than_micros", LongType))) {
      override def description(): String =
        "age-based retention (Iceberg's expire_snapshots): expire " +
          "snapshots committed strictly before the cutoff — the " +
          "latest snapshot and every tagged snapshot always survive — " +
          "and reclaim files no retained snapshot references"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val stats = GraftVersions.vacuum(dir, keepLast = 1,
          olderThanMicros = Some(input.getLong(1)))
        result(StructType(Seq(
          StructField("expired_versions", LongType, nullable = false),
          StructField("deleted_files", LongType, nullable = false),
          StructField("oldest_retained", LongType, nullable = false))),
          stats.expiredVersions.length.toLong,
          stats.deletedFiles.length.toLong,
          GraftVersions.listVersionNumbers(dir).headOption.getOrElse(-1L))
      }
    }

  private def removeOrphanFiles(resolve: String => Path): UnboundProcedure =
    new Proc("remove_orphan_files", Array(
      param("table", StringType), param("older_than_micros", LongType))) {
      override def description(): String =
        "reclaim files NO manifest references (crashed compactions, " +
          "abandoned staging) whose mtime predates the cutoff — the " +
          "debris vacuum cannot see because vacuum only walks the log; " +
          "use a cutoff older than the longest running job, never " +
          "'now', on a table with live writers"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val stats = GraftVersions.removeOrphans(dir, input.getLong(1))
        result(StructType(Seq(
          StructField("removed_files", LongType, nullable = false),
          StructField("removed_bytes", LongType, nullable = false))),
          stats.removed.length.toLong, stats.bytes)
      }
    }

  private def branch(resolve: String => Path): UnboundProcedure =
    new Proc("branch", Array(
      param("table", StringType), param("name", StringType),
      param("version", LongType))) {
      override def description(): String =
        "fork a writable branch at snapshot `version` (-1 = latest): " +
          "DML lands on `<table>.branch_<name>` in full isolation " +
          "until fast_forward publishes it (write-audit-publish)"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val pin = Some(input.getLong(2)).filter(_ >= 0L)
        val info = GraftVersions.createBranch(dir, name, pin)
        result(StructType(Seq(
          StructField("branch_name", StringType, nullable = false),
          StructField("forked_at", LongType, nullable = false),
          StructField("files_referenced", LongType, nullable = false))),
          UTF8String.fromString(name),
          pin.getOrElse(GraftVersions.latest(dir)
            .map(_.version).getOrElse(-1L)),
          info.entries.length.toLong)
      }
    }

  private def fastForward(resolve: String => Path): UnboundProcedure =
    new Proc("fast_forward", Array(
      param("table", StringType), param("name", StringType))) {
      override def description(): String =
        "publish branch `name` onto main as one commit — only while " +
          "main still sits at the branch's fork point (straight line); " +
          "branch-local files promote by rename, the branch is consumed"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val info = GraftVersions.fastForward(dir, name)
        result(StructType(Seq(
          StructField("branch_name", StringType, nullable = false),
          StructField("published_version", LongType, nullable = false),
          StructField("n_files", LongType, nullable = false))),
          UTF8String.fromString(name), info.version,
          info.entries.length.toLong)
      }
    }

  private def analyzeTable(resolve: String => Path): UnboundProcedure =
    new Proc("analyze", Array(param("table", StringType))) {
      override def description(): String =
        "backfill manifest statistics for files that predate them: " +
          "min/max envelopes + row counts for pre-stats entries, NDV " +
          "sketches for files written before ndv.columns — one " +
          "distributed pass over exactly the needy files, one " +
          "dataChange=false commit; idempotent"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val r = GraftAnalyze.analyze(
          org.apache.spark.sql.SparkSession.active, dir)
        result(StructType(Seq(
          StructField("analyzed_files", LongType, nullable = false),
          StructField("new_version", LongType, nullable = false))),
          r.analyzedFiles.toLong, r.newVersion.getOrElse(-1L))
      }
    }

  private def createMv(resolve: String => Path,
      resolveNew: String => Path): UnboundProcedure =
    new Proc("create_mv", Array(
      param("view", StringType), param("source", StringType),
      param("key_expr", StringType), param("sum_expr", StringType),
      param("auto", BooleanType),
      // aggregate kind: 'sum' (default; signed-fold maintained),
      // 'min'/'max' (insert fast path + delete-scoped group recompute)
      ProcedureParameter.in("agg", StringType)
        .defaultValue("'sum'").build(),
      // second key column for COMPOSITE-key views ('' = single-key);
      // the view then maintains GROUP BY key_expr, key2_expr
      ProcedureParameter.in("key2_expr", StringType)
        .defaultValue("''").build())) {
      override def description(): String =
        "CREATE MATERIALIZED VIEW: seed `view` with SELECT key_expr, " +
          "AGG(sum_expr), COUNT(*) FROM source GROUP BY key_expr at " +
          "the source's current version (agg: sum|min|max; a " +
          "non-empty key2_expr makes the key composite — GROUP BY " +
          "key_expr, key2_expr, sum only), ledger the watermark as a " +
          "txn record; auto=true registers the view for inline " +
          "refresh on every source data commit. DECIMAL(p<=18) sum " +
          "expressions are maintained exactly (unscaled storage)"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val view = input.getUTF8String(0).toString
        val srcName = input.getUTF8String(1).toString
        val key2 = input.getUTF8String(6).toString
        val info = GraftMv.create(
          org.apache.spark.sql.SparkSession.active,
          srcName, resolve(srcName), resolveNew(view), view,
          input.getUTF8String(2).toString,
          input.getUTF8String(3).toString,
          auto = input.getBoolean(4),
          agg = input.getUTF8String(5).toString,
          key2Expr = if (key2.isEmpty) None else Some(key2))
        result(StructType(Seq(
          StructField("source_version", LongType, nullable = false),
          StructField("groups", LongType, nullable = false),
          StructField("mv_version", LongType, nullable = false))),
          info.sourceVersion, info.groups, info.mvVersion)
      }
    }

  private def createJoinMv(resolve: String => Path,
      resolveNew: String => Path): UnboundProcedure =
    new Proc("create_join_mv", Array(
      param("view", StringType), param("fact", StringType),
      param("dim", StringType), param("fact_key", StringType),
      param("dim_key", StringType), param("key_expr", StringType),
      param("sum_expr", StringType), param("auto", BooleanType))) {
      override def description(): String =
        "CREATE JOIN MATERIALIZED VIEW (SPJG): seed `view` with " +
          "SELECT key_expr, SUM(sum_expr), COUNT(*) FROM fact f " +
          "JOIN dim d ON fact_key = dim_key GROUP BY key_expr; all " +
          "expressions f./d.-qualified. Fact deltas fold " +
          "incrementally; dim movement triggers a full reseed at the " +
          "next refresh. auto=true registers on BOTH tables: fact " +
          "commits fold and dim commits reseed inline"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val view = input.getUTF8String(0).toString
        val factName = input.getUTF8String(1).toString
        val dimName = input.getUTF8String(2).toString
        val info = GraftMv.createJoin(
          org.apache.spark.sql.SparkSession.active,
          factName, resolve(factName), dimName, resolve(dimName),
          resolveNew(view), view,
          input.getUTF8String(3).toString,
          input.getUTF8String(4).toString,
          input.getUTF8String(5).toString,
          input.getUTF8String(6).toString,
          auto = input.getBoolean(7))
        result(StructType(Seq(
          StructField("fact_version", LongType, nullable = false),
          StructField("groups", LongType, nullable = false),
          StructField("mv_version", LongType, nullable = false))),
          info.sourceVersion, info.groups, info.mvVersion)
      }
    }

  private def createChainMv(resolve: String => Path,
      resolveNew: String => Path): UnboundProcedure =
    new Proc("create_chain_mv", Array(
      param("view", StringType), param("fact", StringType),
      param("dim1", StringType), param("dim2", StringType),
      param("j1_left", StringType), param("j1_right", StringType),
      param("j2_left", StringType), param("j2_right", StringType),
      param("key_expr", StringType), param("sum_expr", StringType),
      param("auto", BooleanType))) {
      override def description(): String =
        "CREATE CHAIN JOIN MATERIALIZED VIEW (3-way snowflake): seed " +
          "`view` with SELECT key_expr, SUM(sum_expr), COUNT(*) FROM " +
          "fact f JOIN dim1 d1 ON j1_left = j1_right JOIN dim2 d2 ON " +
          "j2_left = j2_right GROUP BY key_expr; expressions " +
          "f./d1./d2.-qualified (condition i may reference f and " +
          "earlier dims). Fact deltas fold incrementally; any dim " +
          "movement reseeds. auto=true registers on all three tables. " +
          "Deeper chains: GraftMv.createChain"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val view = input.getUTF8String(0).toString
        val factName = input.getUTF8String(1).toString
        val d1 = input.getUTF8String(2).toString
        val d2 = input.getUTF8String(3).toString
        val info = GraftMv.createChain(
          org.apache.spark.sql.SparkSession.active,
          factName, resolve(factName),
          Seq(d1 -> resolve(d1), d2 -> resolve(d2)),
          Seq((input.getUTF8String(4).toString,
            input.getUTF8String(5).toString),
            (input.getUTF8String(6).toString,
              input.getUTF8String(7).toString)),
          resolveNew(view), view,
          input.getUTF8String(8).toString,
          input.getUTF8String(9).toString,
          auto = input.getBoolean(10))
        result(StructType(Seq(
          StructField("fact_version", LongType, nullable = false),
          StructField("groups", LongType, nullable = false),
          StructField("mv_version", LongType, nullable = false))),
          info.sourceVersion, info.groups, info.mvVersion)
      }
    }

  private def refreshMv(resolve: String => Path): UnboundProcedure =
    new Proc("refresh_mv", Array(param("view", StringType))) {
      override def description(): String =
        "REFRESH MATERIALIZED VIEW: fold the source commits since the " +
          "ledgered watermark into the view via the change feed — " +
          "exactly-once (txn-record idempotence), cost proportional " +
          "to the changed rows, no source scan; already-fresh views " +
          "no-op. Reseeds (join views after dim movement) always " +
          "report applied_changes=0 — any fact deltas in the window " +
          "are subsumed — and recomputed_groups carries the work"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val info = GraftMv.refresh(
          org.apache.spark.sql.SparkSession.active, dir, resolve)
        result(StructType(Seq(
          StructField("source_version", LongType, nullable = false),
          StructField("applied_changes", LongType, nullable = false),
          StructField("groups", LongType, nullable = false),
          StructField("mv_version", LongType, nullable = false),
          StructField("refreshed", BooleanType, nullable = false),
          // MIN/MAX views: delete-touched groups recomputed from the
          // source this refresh (0 on the append-only fast path)
          StructField("recomputed_groups", LongType, nullable = false))),
          info.sourceVersion, info.applied, info.groups, info.mvVersion,
          info.refreshed, info.recomputed)
      }
    }

  private def mergeBranch(resolve: String => Path): UnboundProcedure =
    new Proc("merge_branch", Array(
      param("table", StringType), param("name", StringType))) {
      override def description(): String =
        "publish branch `name` onto a main that MOVED since the fork: " +
          "metadata three-way merge with file-granular conflict " +
          "detection — disjoint scopes compose into one merge-branch " +
          "commit, overlapping-scope divergence rejects loudly"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val info = GraftVersions.mergeBranch(dir, name)
        result(StructType(Seq(
          StructField("branch_name", StringType, nullable = false),
          StructField("published_version", LongType, nullable = false),
          StructField("n_files", LongType, nullable = false))),
          UTF8String.fromString(name), info.version,
          info.entries.length.toLong)
      }
    }

  private def dropBranch(resolve: String => Path): UnboundProcedure =
    new Proc("drop_branch", Array(
      param("table", StringType), param("name", StringType))) {
      override def description(): String =
        "delete a branch without publishing (abandon the audit)"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val name = input.getUTF8String(1).toString
        val existed = GraftVersions.dropBranch(dir, name)
        if (!existed) throw new IllegalArgumentException(
          s"no branch '$name' on table at $dir; branches: " +
            (GraftVersions.listBranches(dir) match {
              case Nil => "none"
              case bs => bs.mkString(", ")
            }))
        result(StructType(Seq(
          StructField("branch_name", StringType, nullable = false),
          StructField("dropped", BooleanType, nullable = false))),
          UTF8String.fromString(name), true)
      }
    }

  private def restore(resolve: String => Path): UnboundProcedure =
    new Proc("restore", Array(
      param("table", StringType), param("version", LongType))) {
      override def description(): String =
        "make snapshot `version` live again via a new restore commit " +
          "(zero data movement; history preserved)"
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = resolve(input.getUTF8String(0).toString)
        val info = GraftVersions.restore(dir, input.getLong(1))
        result(StructType(Seq(
          StructField("restored_version", LongType, nullable = false),
          StructField("new_version", LongType, nullable = false),
          StructField("n_files", LongType, nullable = false))),
          input.getLong(1), info.version, info.entries.length.toLong)
      }
    }
}
