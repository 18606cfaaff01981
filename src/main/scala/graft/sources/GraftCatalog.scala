package graft.sources

import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 `TableCatalog` + `FunctionCatalog` over the graft_docs corpus,
  * serving two table personalities:
  *
  * 1. **Virtual bucketed tables** (round 8, q136): `docs` (20000 rows,
  *    8 buckets) or `docs_<rows>_<buckets>` — the generative corpus with
  *    a declared bucket layout. This is the missing half of the
  *    storage-partitioned-join story: Spark resolves a scan-reported
  *    `bucket(n, doc_id)` transform into a catalyst expression ONLY
  *    through the function catalog of the table's own catalog (a bare
  *    `TableProvider` has none, so its reported `KeyGroupedPartitioning`
  *    silently degrades to `UnknownPartitioning` — measured, not
  *    guessed). Exactly how Iceberg/Delta wire layout-aware joins: the
  *    catalog serves the table AND the function that defines its layout.
  *
  * 2. **Warehouse-backed mutable tables** (round 12): any other
  *    identifier maps to `<warehouse>/<ns...>/<name>`, holding the
  *    path-backed TSV personality — readable, writable (staged commit),
  *    and supporting SQL row-level commands (`MERGE INTO` / `UPDATE` /
  *    `DELETE`) via [[GraftRlTable]]'s copy-on-write operation. Row-level
  *    SQL requires a catalog-qualified target; this is the piece that
  *    makes the connector's tables mutable by name.
  *
  * Function: `bucket(numBuckets, id) = id % numBuckets` — the SAME
  * mapping [[GraftBucketPartition]] uses for its partition values, which
  * is the whole contract: the catalog's function is the executable
  * definition of the layout the scan declares. Register with
  * `spark.sql.catalog.<name> = graft.sources.GraftCatalog` (add
  * `spark.sql.catalog.<name>.warehouse = <dir>` for personality 2) and
  * read `spark.table("<name>.docs")`. */
class GraftCatalog extends TableCatalog with FunctionCatalog
    with ProcedureCatalog {
  private var catalogName = "graft"
  private var warehouse: Option[java.nio.file.Path] = None

  /** DDL-level capabilities: `DEFAULT` clauses on ADD COLUMN are
    * accepted (the analyzer gates the syntax on this), persisted in
    * the evolution registry, and served back through the schema's
    * CURRENT_DEFAULT/EXISTS_DEFAULT field metadata. */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      // CREATE TABLE may declare extra columns beyond the fixed base
      // schema when each is GENERATED ALWAYS AS (expr) or an IDENTITY
      // column — the analyzer gates the syntax on these and hands the
      // expression / identity spec through Column; the catalog
      // registers them as evolved columns and the shared writer
      // computes/enforces them (see the Column[] createTable below)
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  /** `CALL <cat>.system.<proc>(...)` — the maintenance surface
    * ([[GraftProcedures]]: vacuum / optimize / restore), namespaced
    * `system` like Iceberg's. The table argument is a warehouse table
    * name (optionally namespace-qualified), resolved with the same
    * containment checks as loadTable. */
  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    GraftProcedures.names.map(n =>
      Identifier.of(Array("system"), n)).toArray
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!(ident.namespace().isEmpty ||
        ident.namespace().toSeq == Seq("system")))
      throw new IllegalArgumentException(
        s"procedures live in the 'system' namespace: $ident")
    GraftProcedures(ident.name(), tableName => {
      val parts = tableName.split('.')
      val dir = dirFor(Identifier.of(parts.init, parts.last))
      // maintenance composes with branches: `optimize('t.branch_dev')`
      // compacts the branch before its audit/publish
      val resolved =
        if (!Files.isDirectory(dir) && parts.last.startsWith("branch_") &&
            parts.init.nonEmpty && Files.isDirectory(dir.getParent))
          GraftVersions.branchDir(dir.getParent,
            parts.last.stripPrefix("branch_"))
        else dir
      if (!Files.isDirectory(resolved))
        throw new NoSuchTableException(
          Identifier.of(parts.init, parts.last))
      resolved
    }, tableName => {
      // clone's TARGET: containment-checked like any ident, existence
      // NOT required (the procedure creates it)
      val parts = tableName.split('.')
      dirFor(Identifier.of(parts.init, parts.last))
    })
  }

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(Paths.get(_))
  }
  override def name(): String = catalogName

  private def isVirtual(name: String): Boolean =
    name == "docs" || name.startsWith("docs_")

  /** Resolve an identifier under the warehouse, rejecting any component
    * that could escape it. Backquoted SQL identifiers may contain
    * arbitrary characters (including `..` and `/`), and `dirFor` feeds
    * create/drop/rename — so without this check a `DROP TABLE
    * rl.`..`.`..`.etc` would delete directories outside the warehouse. */
  private def dirFor(ident: Identifier): java.nio.file.Path = {
    val wh = warehouse.getOrElse(throw new NoSuchTableException(ident))
    val parts = ident.namespace().toSeq :+ ident.name()
    parts.foreach { p =>
      if (p.isEmpty || p == "." || p == ".." || p.contains('/') ||
          p.contains('\\'))
        throw new IllegalArgumentException(
          s"illegal table identifier component '$p' in ${ident}")
    }
    val dir = parts.foldLeft(wh)(_ resolve _).normalize()
    if (!dir.startsWith(wh.normalize()))
      throw new IllegalArgumentException(
        s"resolved table path $dir escapes warehouse $wh")
    dir
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val virtual =
      if (namespace.isEmpty) Array(Identifier.of(Array.empty, "docs"))
      else Array.empty[Identifier]
    val stored = warehouse.toArray.flatMap { wh =>
      val ns = namespace.foldLeft(wh)(_ resolve _)
      if (!Files.isDirectory(ns)) Array.empty[Identifier]
      else {
        val s = Files.list(ns)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(Files.isDirectory(_))
            .map(p => Identifier.of(namespace, p.getFileName.toString))
            .toArray
        } finally s.close()
      }
    }
    virtual ++ stored
  }

  override def loadTable(ident: Identifier): Table = ident.name() match {
    case "docs" => new GraftDocsTable(20000L, 8, None, 8)
    case s if s.startsWith("docs_") =>
      s.stripPrefix("docs_").split('_') match {
        case Array(rows, buckets) =>
          new GraftDocsTable(rows.toLong, 8, None, buckets.toInt)
        case _ => throw new NoSuchTableException(ident)
      }
    case meta @ ("history" | "files" | "partitions" | "refs")
        if ident.namespace().nonEmpty &&
        Files.isDirectory(dirFor(ident).getParent) &&
        !Files.isDirectory(dirFor(ident)) =>
      // Iceberg-style METADATA TABLES: `SELECT * FROM cat.t.history`
      // (the commit log as a relation) and `cat.t.files` (the live
      // manifest as a relation) resolve here as Identifier(
      // ns=[...,"t"], name=<meta>). Only for versioned parents; a real
      // directory with the metadata name keeps winning above.
      val parent = dirFor(ident).getParent
      if (!GraftVersions.isVersioned(parent))
        throw new NoSuchTableException(ident)
      meta match {
        case "history" => new GraftHistoryTable(parent.toString)
        case "files" => new GraftFilesMetaTable(parent.toString)
        case "refs" => new GraftRefsMetaTable(parent.toString)
        case _ => new GraftPartitionsMetaTable(parent.toString)
      }
    case b if b.startsWith("branch_") && ident.namespace().nonEmpty &&
        Files.isDirectory(dirFor(ident).getParent) &&
        !Files.isDirectory(dirFor(ident)) =>
      // BRANCH FACES: `cat.t.branch_dev` reads/writes branch `dev` of
      // table `t` — a full table in its own right (DML, MOR masks,
      // OPTIMIZE, constraints), isolated from main until fast_forward
      // publishes it (the write-audit-publish workflow).
      val bdir = GraftVersions.branchDir(dirFor(ident).getParent,
        b.stripPrefix("branch_"))
      if (!Files.isDirectory(bdir)) throw new NoSuchTableException(ident)
      new GraftRlTable(bdir.toString)
    case _ =>
      val dir = dirFor(ident)
      if (!Files.isDirectory(dir)) throw new NoSuchTableException(ident)
      new GraftRlTable(dir.toString)
  }

  /** `VERSION AS OF <v>` — load a warehouse table pinned to snapshot v
    * (read-only). Spark routes SQL time-travel through this overload;
    * the pin rides the Table into its ScanBuilder. Non-numeric
    * identifiers resolve through the table's TAG registry
    * ([[GraftTableMeta.tags]]): `VERSION AS OF 'run-2026-08-14'` is the
    * named-snapshot face of the same pin (Iceberg's ref syntax). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (isVirtual(ident.name()))
      throw new UnsupportedOperationException(
        s"${ident.name()}: the virtual docs tables keep no version history")
    val dir = dirFor(ident)
    if (!Files.isDirectory(dir)) throw new NoSuchTableException(ident)
    val v = version.toLongOption
      .orElse(GraftTableMeta.tags(dir).get(version))
      .getOrElse {
        val have = GraftTableMeta.tags(dir).keys.toSeq.sorted
        throw new IllegalArgumentException(
          s"'$version' is neither a numeric version nor a tag of " +
            s"${ident.name()}; tags: " +
            (if (have.isEmpty) "none (CALL <cat>.system.tag to create one)"
             else have.mkString(", ")))
      }
    // resolve NOW for a load-time error on a bad/vacuumed version
    GraftVersions.manifest(dir, v)
    new GraftRlTable(dir.toString, Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` (micros since epoch, per the DSv2 contract):
    * floor to the newest snapshot committed at or before ts. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (isVirtual(ident.name()))
      throw new UnsupportedOperationException(
        s"${ident.name()}: the virtual docs tables keep no version history")
    val dir = dirFor(ident)
    if (!Files.isDirectory(dir)) throw new NoSuchTableException(ident)
    val v = GraftVersions.asOfTimestamp(dir, timestamp).version
    new GraftRlTable(dir.toString, Some(v))
  }

  /** CREATE TABLE with generated / identity columns (Spark 4's
    * SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS / _IDENTITY_COLUMNS
    * contract — Delta's core idiom for derived partitioning columns
    * and surrogate keys). The fixed 4-column base schema stays the
    * physical truth; every EXTRA column must be
    * `GENERATED ALWAYS AS (expr)` (expr over base columns only,
    * deterministic) or `GENERATED ALWAYS / BY DEFAULT AS IDENTITY
    * (START WITH s INCREMENT BY k)`, and registers as an evolved
    * column (since=0, so it exists from birth) plus its
    * generation/identity attribute in the registry. The shared writer
    * then computes omitted cells and enforces explicit ones; identity
    * values allocate block-wise from a high-water mark under the
    * commit lock, so concurrent writers draw disjoint ranges.
    *
    * `PARTITIONED BY (<generated col>)` persists a VALUE layout
    * (`layout.values`): the writer fans each task's rows into one file
    * per distinct generated value and records min=max stats for it, so
    * the existing manifest stats-skipping gives partition pruning —
    * the Delta "partition by date(ts)" idiom, at manifest cost. */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val baseNames = GraftDocsSource.schema.fieldNames.toSeq
    val names = columns.map(_.name).toSeq
    val extras: Seq[org.apache.spark.sql.connector.catalog.Column] =
      if (names.length > 4 && names.take(4) == baseNames)
        columns.toSeq.drop(4)
      else Nil
    val extraNames = extras.map(_.name)
    // split PARTITIONED BY: a plain column reference naming an extra
    // generated column declares the value layout; everything else
    // (bucket transforms) goes through the base CREATE path untouched
    val (valueParts, baseParts) = partitions.partition { t =>
      t.name() == "identity" && t.references().length == 1 &&
        t.references()(0).fieldNames().length == 1 &&
        extraNames.contains(t.references()(0).fieldNames().head)
    }
    val baseSchema = StructType(columns.toSeq.take(
        if (extras.nonEmpty) 4 else columns.length)
      .map(c => StructField(c.name, c.dataType, c.nullable)))
    val table = createTable(ident, baseSchema, baseParts, properties)
    if (extras.isEmpty) return table
    val dir = dirFor(ident)
    try {
      extras.zipWithIndex.foreach { case (c, i) =>
        val isGen = c.generationExpression() != null
        val isId = c.identityColumnSpec() != null
        if (!isGen && !isId)
          throw new UnsupportedOperationException(
            s"graft_docs tables have the fixed base schema " +
              s"(${baseNames.mkString(", ")}); extra column '${c.name}' " +
              "must be GENERATED ALWAYS AS (...) or an IDENTITY column")
        require(c.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
          s"column name '${c.name}' must be a plain identifier " +
            "(the registry encoding reserves ':' and ',')")
        if (baseNames.contains(c.name) ||
            extraNames.indexOf(c.name) != i ||
            Set("_file", "_pos", "_change_type", "_commit_version",
              "_row_id", "_row_commit_version")(c.name))
          throw new IllegalArgumentException(
            s"column '${c.name}' already exists on ${ident.name()}")
        val tpe = c.dataType() match {
          case LongType => "long"
          // Identity allocation is block-wise (IdentityStride = 2^33
          // units per task): the FIRST reserved block already exceeds
          // Int.MaxValue, so an INT identity column would mint values
          // its own type cannot hold after one write. Delta has the
          // same rule: identity columns must be BIGINT.
          case IntegerType if isId =>
            throw new UnsupportedOperationException(
              s"identity column '${c.name}' must be BIGINT: block-wise " +
                "allocation (2^33 values per task) overflows INT after " +
                "the first write")
          case IntegerType => "int"
          case StringType if isGen => "string"
          case other => throw new UnsupportedOperationException(
            s"column '${c.name}' type ${other.simpleString} " +
              "unsupported; generated: bigint/int/string, " +
              "identity: bigint")
        }
        GraftTableMeta.appendAddedColumn(dir,
          GraftSchemas.AddedColumn(c.name, tpe, since = 0L))
        if (isGen) {
          val sql = c.generationExpression()
          // analyze against the BASE schema only: generation
          // expressions may reference base columns exclusively (base
          // columns can never be renamed/dropped, so the persisted SQL
          // text stays resolvable forever), must be deterministic, and
          // must cast to the declared type
          val spark = org.apache.spark.sql.SparkSession.active
          val analyzed =
            try spark.createDataFrame(
                new java.util.ArrayList[org.apache.spark.sql.Row](),
                GraftDocsSource.schema)
              .select(org.apache.spark.sql.functions.expr(sql)
                .cast(c.dataType()))
              .queryExecution.analyzed
            catch {
              case e: org.apache.spark.sql.AnalysisException =>
                throw new IllegalArgumentException(
                  s"generation expression of '${c.name}' ($sql) must " +
                    "resolve against the base columns " +
                    s"(${baseNames.mkString(", ")}): ${e.getMessage}")
            }
          require(analyzed.expressions.forall(_.deterministic),
            s"generation expression of '${c.name}' ($sql) must be " +
              "deterministic")
          GraftTableMeta.appendGenerated(dir, i, sql)
        } else {
          val spec = c.identityColumnSpec()
          require(spec.getStep != 0,
            s"identity column '${c.name}' INCREMENT must be nonzero")
          GraftTableMeta.appendIdentity(dir, i, spec.getStart,
            spec.getStep, spec.isAllowExplicitInsert)
        }
      }
      valueParts.toSeq match {
        case Nil => ()
        case Seq(t) =>
          val colName = t.references()(0).fieldNames().head
          val i = extraNames.indexOf(colName)
          if (extras(i).generationExpression() == null ||
              extras(i).dataType() == StringType)
            throw new UnsupportedOperationException(
              s"PARTITIONED BY ($colName): value layouts need a " +
                "numeric GENERATED column (the writer derives the " +
                "partition value from the expression)")
          GraftTableMeta.write(dir,
            GraftTableMeta.read(dir) + ("layout.values" -> colName))
        case many => throw new UnsupportedOperationException(
          "at most one generated-column value partition is supported; " +
            s"got ${many.mkString(", ")}")
      }
    } catch {
      case e: Throwable =>
        // CREATE is atomic: roll the half-registered table back
        try dropTable(ident) catch { case _: Throwable => () }
        throw e
    }
    loadTable(ident)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (isVirtual(ident.name()))
      throw new UnsupportedOperationException(
        s"${ident.name()}: the docs/docs_* tables are virtual")
    if (warehouse.isEmpty)
      throw new UnsupportedOperationException(
        s"catalog $catalogName has no 'warehouse' option; only the " +
          "virtual docs tables are available")
    val dir = dirFor(ident)
    if (Files.isDirectory(dir))
      throw new TableAlreadyExistsException(Seq(ident.name()))
    // the connector's schema is fixed; an explicit CREATE must match it
    if (schema.nonEmpty && schema.fieldNames.toSeq !=
        GraftDocsSource.schema.fieldNames.toSeq)
      throw new IllegalArgumentException(
        s"graft_docs tables have the fixed schema " +
          s"${GraftDocsSource.schema.simpleString}; got ${schema.simpleString}")
    Files.createDirectories(dir)
    // TBLPROPERTIES('versioned'='true') / .tableProperty("versioned", …):
    // snapshot-version the table from birth (v0 = the empty table)
    if ("true".equalsIgnoreCase(properties.getOrDefault("versioned", "")))
      GraftVersions.enable(dir)
    // PARTITIONED BY (bucket(n, doc_id)): persist the declared layout —
    // every subsequent write fans rows into per-bucket files and the
    // scan reports KeyGroupedPartitioning, so two such tables join
    // storage-partitioned (no exchange). Other transforms are rejected:
    // a layout the writer can't enforce would be a lie to the planner.
    val layout: Option[(String, Int)] = partitions.toSeq match {
      case Nil => None
      case Seq(t) if t.name() == "bucket" =>
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }
        val col = t.arguments().collectFirst {
          case r: org.apache.spark.sql.connector.expressions.NamedReference
              if r.fieldNames.length == 1 => r.fieldNames.head
        }
        (n, col) match {
          case (Some(b), Some("doc_id")) if b > 0 => Some(("doc_id", b))
          case _ => throw new UnsupportedOperationException(
            s"graft_docs bucket layouts take bucket(n, doc_id); got $t")
        }
      case other => throw new UnsupportedOperationException(
        s"graft_docs tables support a single bucket(n, doc_id) transform; " +
          s"got ${other.mkString(", ")}")
    }
    // persist the declarative quality/behavior properties (CHECK
    // constraints, bloom-index config, delete/update modes) plus the
    // CREATE-only physical layout — everything else in `properties` is
    // either a CREATE-time command (versioned) or Spark-internal
    // bookkeeping
    import scala.jdk.CollectionConverters._
    val kept = properties.asScala.filter { case (k, _) =>
      GraftCatalog.isPersistedProperty(k)
    }.toMap ++ layout.map { case (c, n) => "layout.bucket" -> s"$c:$n" }
    kept.foreach { case (k, v) => GraftCatalog.validateProperty(k, v) }
    GraftTableMeta.write(dir, kept)
    new GraftRlTable(dir.toString)
  }

  /** `ALTER TABLE ... SET/UNSET TBLPROPERTIES` over the persisted
    * property store ([[GraftTableMeta]]): CHECK constraints, bloom
    * config, and the delete mode are mutable table STATE, not
    * create-time constants — a production table tightens its quality
    * gates and switches delete strategies without recreation. Delta
    * parity on the sharp edge: ADDING a CHECK constraint validates the
    * existing live rows first (one scan, aggregate-sized result) and
    * refuses if any row violates — otherwise the constraint would lie
    * about the data already in the table. Schema changes stay
    * rejected: the connector's schema is fixed by design. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirFor(ident)
    if (isVirtual(ident.name()) || !Files.isDirectory(dir))
      throw new UnsupportedOperationException(
        s"${ident.name()}: only warehouse tables support ALTER")
    import org.apache.spark.sql.connector.catalog.TableChange._
    // The whole ALTER is one critical section under the table's commit
    // lock: the registry appends (ADD/RENAME/DROP COLUMN) are
    // read-modify-writes of `_table.properties`, and the final
    // replaceAll below writes back the fold's accumulator — a
    // concurrent DDL statement interleaving between our read and that
    // write would be silently lost otherwise. Manifest advances nest
    // fine (the lock is reentrant), so DDL serializes with data
    // commits too.
    GraftVersions.lockFor(dir).synchronized {
    val current = GraftTableMeta.read(dir)
    val updated = changes.foldLeft(current) { (props, change) =>
      change match {
        case s: SetProperty if GraftCatalog.isPersistedProperty(s.property()) =>
          GraftCatalog.validateProperty(s.property(), s.value())
          if (s.property().startsWith("check."))
            GraftCatalog.validateExistingRows(dir,
              s.property().stripPrefix("check."), s.value())
          props + (s.property() -> s.value())
        case r: RemoveProperty
            if GraftCatalog.isPersistedProperty(r.property()) =>
          props - r.property()
        case s: SetProperty if s.property() == "versioned" =>
          throw new UnsupportedOperationException(
            "versioning cannot be toggled by ALTER; enable it at CREATE " +
              "(TBLPROPERTIES('versioned'='true')) or via GraftVersions.enable")
        case s: SetProperty if s.property() == "layout.bucket" =>
          // PARTITION-SPEC EVOLUTION (Iceberg's evolve-the-spec,
          // surfaced through the layout property): re-declare
          // bucket(n, doc_id) with a new n. Metadata-only — no file is
          // rewritten; new writes fan and stamp under the new spec id,
          // old files keep their old spec, and the scan's layout gate
          // degrades mixed-spec snapshots to unknown partitioning
          // until an OPTIMIZE rewrite migrates them. Versioned tables
          // record the evolution as its own dataChange=false commit so
          // the history shows WHEN the layout changed.
          val (col, n) = {
            val v = s.value(); val i = v.lastIndexOf(':')
            if (i <= 0) throw new IllegalArgumentException(
              s"layout.bucket takes '<col>:<n>'; got '$v'")
            (v.substring(0, i), v.substring(i + 1).toIntOption.getOrElse(
              throw new IllegalArgumentException(
                s"layout.bucket bucket count must be an int; got '$v'")))
          }
          if (col != "doc_id" || n <= 0)
            throw new UnsupportedOperationException(
              s"graft_docs bucket layouts take bucket(n, doc_id) with " +
                s"n > 0; got '$col:$n'")
          if (GraftTableMeta.bucketLayout(dir).contains((col, n)))
            throw new IllegalArgumentException(
              s"layout.bucket is already '$col:$n' — spec evolution " +
                "needs a different bucket count")
          if (!GraftVersions.isVersioned(dir))
            throw new UnsupportedOperationException(
              "partition-spec evolution needs a versioned table: old " +
                "files' spec ids live in the manifest")
          GraftTableMeta.evolveBucketLayout(dir, col, n)
          GraftVersions.advance(dir, "set-layout",
            removed = Some(Set.empty), added = Nil, dataChange = false)
          // evolveBucketLayout already persisted; fold the new values
          // into the accumulator so the final replaceAll keeps them
          props + ("layout.bucket" -> s"$col:$n") +
            ("layout.spec.history" ->
              GraftTableMeta.read(dir)("layout.spec.history"))
        case s: SetProperty if s.property() == "layout.values" =>
          // VALUE-PARTITION SPEC EVOLUTION: declare (or re-declare)
          // the value layout on a live table as a metadata-only
          // commit, mirroring layout.bucket's evolution story. No file
          // is rewritten — FUTURE writes fan one file per distinct
          // value of the generated column (min = max stats), files
          // written before the evolution keep their multi-value stat
          // envelope. Dynamic partition pruning composes per FILE, not
          // per spec: a runtime value whitelist prunes via each file's
          // own min=max stat, so post-evolution files prune exactly
          // while pre-evolution files degrade to a scan (read, never
          // wrong) until an OPTIMIZE rewrite migrates them — the same
          // old-spec-degrades / new-spec-prunes contract as bucket
          // evolution, on the DPP axis.
          val colName = s.value()
          val generated = GraftTableMeta.generatedExprs(dir).keySet
          val ok = GraftSchemas.effectiveAdded(dir).exists(c =>
            c.visible && c.name == colName && generated(c.idx) &&
              c.tpe != "string")
          if (!ok) throw new UnsupportedOperationException(
            s"layout.values needs a live numeric GENERATED column " +
              s"(the writer derives the partition value from the " +
              s"expression); '$colName' is not one")
          if (GraftTableMeta.read(dir).get("layout.values")
              .contains(colName))
            throw new IllegalArgumentException(
              s"layout.values is already '$colName' — spec evolution " +
                "needs a different column")
          if (!GraftVersions.isVersioned(dir))
            throw new UnsupportedOperationException(
              "partition-spec evolution needs a versioned table: value " +
                "pruning reads per-file stats from the manifest")
          GraftVersions.advance(dir, "set-layout",
            removed = Some(Set.empty), added = Nil, dataChange = false)
          props + ("layout.values" -> colName)
        case a: AddColumn =>
          // Schema EVOLUTION, not schema change: strictly-appended
          // nullable columns of the codec-supported types. Old files
          // are never rewritten — a missing trailing cell IS the NULL
          // backfill — and on a versioned table the evolution itself is
          // a commit (dataChange=false, nothing for the change feed),
          // whose version stamps the column's `since` so time travel
          // below it presents the pre-evolution shape.
          require(a.fieldNames().length == 1,
            s"ADD COLUMN supports top-level columns only; got " +
              a.fieldNames().mkString("."))
          val colName = a.fieldNames().head
          require(colName.matches("[A-Za-z_][A-Za-z0-9_]*"),
            s"added column name '$colName' must be a plain identifier " +
              "(the registry encoding reserves ':' and ',')")
          val tpe = a.dataType() match {
            case org.apache.spark.sql.types.LongType => "long"
            case org.apache.spark.sql.types.IntegerType => "int"
            case org.apache.spark.sql.types.StringType => "string"
            case other => throw new UnsupportedOperationException(
              s"ADD COLUMN type ${other.simpleString} unsupported; " +
                "evolvable types: bigint, int, string")
          }
          if (!a.isNullable)
            throw new UnsupportedOperationException(
              s"added column '$colName' must be nullable: rows written " +
                "before the evolution are NULL-backfilled")
          val taken = GraftSchemas.tableSchema(dir).fieldNames.toSet
          if (taken(colName) ||
              Set("_file", "_pos", "_change_type", "_commit_version",
                "_row_id", "_row_commit_version")(colName))
            throw new IllegalArgumentException(
              s"column '$colName' already exists on ${ident.name()}")
          // DEFAULT clause: the analyzer has already folded and cast
          // the expression to the column type (the catalog declares
          // SUPPORT_COLUMN_DEFAULT_VALUE), so only the literal VALUE
          // is persisted — it becomes the exists-default short rows
          // read AND the current-default the analyzer fills into
          // INSERTs that omit the column. `DEFAULT NULL` is the same
          // as no default on a nullable column.
          val default = Option(a.defaultValue())
            .flatMap(dv => Option(dv.getValue))
            .flatMap(l => Option(l.value())).map {
              case s: org.apache.spark.unsafe.types.UTF8String => s.toString
              case v => v.toString
            }
          val since =
            if (GraftVersions.isVersioned(dir))
              GraftVersions.advance(dir, "add-column",
                removed = Some(Set.empty), added = Nil,
                dataChange = false).version
            else 0L
          GraftTableMeta.appendAddedColumn(dir,
            GraftSchemas.AddedColumn(colName, tpe, since, default))
          // re-read: appendAddedColumn persisted directly; keep the
          // fold's accumulator in sync for any subsequent change
          GraftTableMeta.read(dir)
        case r: RenameColumn =>
          // RENAME is metadata-only on an EVOLVED column: the column's
          // registry index (its field id, hence its TSV position) is
          // permanent — only the display name layered on top changes,
          // so no file is touched and old manifests stay valid. Time
          // travel below the rename commit presents the old name.
          val idx = GraftCatalog.resolveEvolved(dir, ident.name(),
            r.fieldNames(), "RENAME")
          val newName = r.newName()
          require(newName.matches("[A-Za-z_][A-Za-z0-9_]*"),
            s"renamed column name '$newName' must be a plain " +
              "identifier (the registry encoding reserves ':' and ',')")
          val taken = GraftSchemas.tableSchema(dir).fieldNames.toSet
          if (taken(newName) ||
              Set("_file", "_pos", "_change_type", "_commit_version",
                "_row_id", "_row_commit_version")(newName))
            throw new IllegalArgumentException(
              s"column '$newName' already exists on ${ident.name()}")
          GraftCatalog.rejectConstraintReference(dir,
            r.fieldNames().head, "RENAME")
          GraftTableMeta.appendMutation(dir, GraftSchemas.ColumnMutation(
            "rename", idx, newName,
            GraftCatalog.mutationCommit(dir, "rename-column")))
          GraftTableMeta.read(dir)
        case d: DeleteColumn =>
          // DROP is metadata-only on an EVOLVED column: the registry
          // slot stays (positions of later columns never move), the
          // column just becomes invisible — live reads exclude it,
          // writers NULL its cell, and time travel below the drop
          // commit still presents it with its data intact. Its name
          // returns to the pool (a later ADD COLUMN may reuse it at a
          // NEW position).
          val idx = GraftCatalog.resolveEvolved(dir, ident.name(),
            d.fieldNames(), "DROP")
          GraftCatalog.rejectConstraintReference(dir,
            d.fieldNames().head, "DROP")
          GraftTableMeta.appendMutation(dir, GraftSchemas.ColumnMutation(
            "drop", idx, "",
            GraftCatalog.mutationCommit(dir, "drop-column")))
          GraftTableMeta.read(dir)
        case u: UpdateColumnType =>
          // Type WIDENING only, and only on evolved columns: INT →
          // BIGINT is value-preserving in the TSV codec (every cell an
          // int writer produced parses as long), so the change is
          // metadata-only like rename/drop. Time travel below the
          // widen commit presents the old type — safe, because cells
          // outside int range can only live in files added after the
          // widen, which a pre-widen snapshot never references.
          val idx = GraftCatalog.resolveEvolved(dir, ident.name(),
            u.fieldNames(), "WIDEN")
          val cur = GraftSchemas.effectiveAdded(dir).find(_.idx == idx).get
          (cur.tpe, u.newDataType()) match {
            case ("int", org.apache.spark.sql.types.LongType) =>
              GraftTableMeta.appendMutation(dir,
                GraftSchemas.ColumnMutation("widen", idx, "long",
                  GraftCatalog.mutationCommit(dir, "widen-column")))
              GraftTableMeta.read(dir)
            case (t, other) => throw new UnsupportedOperationException(
              s"cannot change evolved column '${cur.name}' from $t to " +
                s"${other.simpleString}: only the value-preserving " +
                "widening INT -> BIGINT is supported — any other change " +
                "would reinterpret files written under the old schema")
          }
        case _: UpdateColumnDefaultValue =>
          // The frozen literal is BOTH faces: pre-ADD rows re-read the
          // exists-default on every scan (it is not baked into files),
          // so changing it later would retroactively rewrite what old
          // rows say. Delta freezes existsDefault the same way.
          throw new UnsupportedOperationException(
            "column defaults are frozen at ADD COLUMN time: pre-ADD " +
              "rows read the default live from the registry, so " +
              "changing it would rewrite history — add a fresh column " +
              "with the new default instead")
        case _: UpdateColumnNullability | _: UpdateColumnPosition =>
          throw new UnsupportedOperationException(
            "graft_docs schema evolution supports ADD COLUMN (nullable " +
              "bigint/int/string, optional DEFAULT), RENAME/DROP of " +
              "those evolved columns, and INT -> BIGINT widening; " +
              "nullability changes and reordering are rejected — files " +
              "written under the old schema would be reinterpreted " +
              "wrongly")
        case s: SetProperty =>
          // a non-persisted key is a PROPERTY problem, not a schema one
          // — name the keys this store actually persists so the user
          // can fix the spelling instead of chasing a phantom schema
          // restriction
          throw new UnsupportedOperationException(
            s"table property '${s.property()}' is not persisted by " +
              "graft_docs tables; settable properties: check.<name>, " +
              "bloom.columns, bloom.bits, delete.mode, update.mode, " +
              "merge.mode, row.tracking, eq.materialize.threshold, " +
              "compact.threshold, ndv.columns, retention.versions")
        case r: RemoveProperty =>
          throw new UnsupportedOperationException(
            s"table property '${r.property()}' is not persisted by " +
              "graft_docs tables; removable properties: check.<name>, " +
              "bloom.columns, bloom.bits, delete.mode, update.mode, " +
              "merge.mode, row.tracking, eq.materialize.threshold, " +
              "compact.threshold, ndv.columns, retention.versions")
        case other =>
          throw new UnsupportedOperationException(
            s"graft_docs tables have a fixed schema; unsupported change: " +
              other.getClass.getSimpleName)
      }
    }
    GraftTableMeta.replaceAll(dir, updated)
    }
    new GraftRlTable(dir.toString)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (isVirtual(ident.name()) || warehouse.isEmpty) return false
    val dir = dirFor(ident)
    if (!Files.isDirectory(dir)) return false
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (isVirtual(oldIdent.name()) || isVirtual(newIdent.name()))
      throw new UnsupportedOperationException(
        "the docs/docs_* tables are virtual")
    // resolve (and containment-check) BOTH idents before touching disk
    val from = dirFor(oldIdent)
    val to = dirFor(newIdent)
    if (!Files.isDirectory(from)) throw new NoSuchTableException(oldIdent)
    if (Files.isDirectory(to))
      throw new TableAlreadyExistsException(Seq(newIdent.name()))
    Files.createDirectories(to.getParent)
    Files.move(from, to)
    ()
  }

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))
  override def loadFunction(ident: Identifier): UnboundFunction =
    ident.name() match {
      case "bucket" => GraftBucketFunction
      case _ => throw new NoSuchFunctionException(ident)
    }
}

object GraftCatalog {
  /** Properties that live in `_table.properties` and are settable by
    * ALTER: quality gates (check.*), index config (bloom.*), and the
    * delete strategy. */
  def isPersistedProperty(k: String): Boolean =
    k.startsWith("check.") || k.startsWith("bloom.") ||
      RowLevelModeKeys(k) || k == "row.tracking" ||
      k == "eq.materialize.threshold" ||
      k == "compact.threshold" || k == "ndv.columns" ||
      k == "retention.versions" || k == "write.distribution"

  /** The three row-level strategy selectors, and their only legal
    * values. Validated at CREATE and ALTER: a typo like
    * 'merge_on_read' must fail loudly THEN, not silently fall back to
    * copy-on-write at the first MERGE. `delete.mode` additionally
    * accepts 'equality' — Iceberg v2's equality-delete format: a
    * key-equality DELETE commits the VALUES into the manifest without
    * reading a data byte; non-equality predicates under that mode fall
    * back to copy-on-write. */
  val RowLevelModeKeys: Set[String] =
    Set("delete.mode", "update.mode", "merge.mode")
  val RowLevelModeValues: Set[String] =
    Set("copy-on-write", "merge-on-read")
  def validateProperty(k: String, v: String): Unit = {
    val legal =
      if (k == "delete.mode") RowLevelModeValues + "equality"
      else RowLevelModeValues
    if (RowLevelModeKeys(k) && !legal(v))
      throw new IllegalArgumentException(
        s"invalid value '$v' for table property '$k'; legal values: " +
          legal.toSeq.sorted.mkString(", "))
    if (k == "row.tracking" && v != "true" && v != "false")
      throw new IllegalArgumentException(
        s"invalid value '$v' for table property 'row.tracking'; legal " +
          "values: true, false")
    if (k == "eq.materialize.threshold" &&
        !v.toLongOption.exists(_ > 0))
      throw new IllegalArgumentException(
        s"invalid value '$v' for table property " +
          "'eq.materialize.threshold'; expected a positive integer " +
          "(pending equality-delete values that trigger auto-" +
          "materialization)")
    if (k == "compact.threshold" && !v.toIntOption.exists(_ >= 1))
      throw new IllegalArgumentException(
        s"invalid value '$v' for table property 'compact.threshold'; " +
          "expected a positive integer (max live files before a data " +
          "commit triggers bin-packing auto-compaction)")
    if (k == "write.distribution" && v != "hash" && v != "none")
      throw new IllegalArgumentException(
        s"invalid value '$v' for table property 'write.distribution'; " +
          "legal values: hash (demand bucket-clustered, doc_id-sorted " +
          "input from the engine — one file per bucket per write), none")
    if (k == "ndv.columns" && v.split(",").map(_.trim).exists(c =>
        !c.matches("[A-Za-z_][A-Za-z0-9_]*")))
      throw new IllegalArgumentException(
        s"invalid value '$v' for table property 'ndv.columns'; " +
          "expected a comma-separated list of column identifiers")
    if (k == "retention.versions" && !v.toIntOption.exists(_ >= 1))
      throw new IllegalArgumentException(
        s"invalid value '$v' for table property 'retention.versions'; " +
          "expected a positive integer (snapshots retained after each " +
          "data commit)")
  }

  /** ADD CONSTRAINT validation (Delta parity): a new CHECK must hold
    * on the rows already in the table, or it is rejected with the
    * violation count. One scan through the path-backed source; SQL
    * CHECK semantics (NULL passes), so the violation predicate is
    * `NOT coalesce(expr, true)`. */
  def validateExistingRows(dir: java.nio.file.Path, name: String,
      sqlText: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    val violations = spark.read.format("graft.sources.GraftDocsSource")
      .option("path", dir.toString).load()
      .filter(org.apache.spark.sql.functions.expr(
        s"not coalesce(($sqlText), true)"))
      .count()
    if (violations > 0)
      throw new IllegalStateException(
        s"cannot add CHECK constraint '$name' ($sqlText): $violations " +
          s"existing row(s) violate it")
  }

  /** Resolve a RENAME/DROP target to its permanent registry index.
    * Only EVOLVED columns mutate: the four base columns are the
    * table's physical identity (the TSV codec, the row-id scheme, the
    * stats and bloom machinery all address them by name — Delta
    * without column mapping makes the same cut), and metadata columns
    * are reserved. */
  private[sources] def resolveEvolved(dir: java.nio.file.Path,
      table: String, fieldNames: Array[String], verb: String): Int = {
    require(fieldNames.length == 1,
      s"$verb COLUMN supports top-level columns only; got " +
        fieldNames.mkString("."))
    val name = fieldNames.head
    if (GraftDocsSourceSchema.base.fieldNames.contains(name))
      throw new UnsupportedOperationException(
        s"cannot $verb base column '$name' of $table: the base schema " +
          "(doc_id, title, fp, n_words) is the table's physical " +
          "identity; only columns added by ALTER TABLE ADD COLUMN " +
          "can be renamed, dropped, or widened")
    GraftSchemas.visibleAdded(dir, None).find(_.name == name) match {
      case Some(c) => c.idx
      case None => throw new IllegalArgumentException(
        s"cannot $verb column '$name' of $table: no such evolved " +
          "column (live evolved columns: " +
          GraftSchemas.visibleAdded(dir, None).map(_.name)
            .mkString(", ") + ")")
    }
  }

  /** Refuse to mutate a column a CHECK constraint references: the
    * constraint text would no longer resolve at the next write,
    * breaking the table loudly but too late. Word-boundary match over
    * the stored expressions — conservative (a false positive costs
    * re-stating the constraint first, never a broken table). */
  private[sources] def rejectConstraintReference(dir: java.nio.file.Path,
      name: String, verb: String): Unit = {
    val hits = GraftTableMeta.checkConstraints(dir).collect {
      case (cName, sqlText)
          if ("\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
            .findFirstIn(sqlText).isDefined => cName
    }
    if (hits.nonEmpty)
      throw new IllegalStateException(
        s"cannot $verb column '$name': CHECK constraint(s) " +
          s"${hits.mkString(", ")} reference it — drop or restate the " +
          "constraint(s) first")
    // the value layout references its generated column by NAME: a
    // rename would orphan the layout (every write fans through it) and
    // a drop would leave the writer with no expression to fan by
    if (GraftTableMeta.read(dir).get("layout.values").contains(name))
      throw new IllegalStateException(
        s"cannot $verb column '$name': it is the table's value-" +
          "partitioning column (PARTITIONED BY at CREATE)")
  }

  /** A rename/drop on a versioned table is its own metadata-only
    * commit (dataChange=false — nothing for the change feed), whose
    * version stamps the mutation's `since` so time travel below it
    * replays the pre-mutation shape. Unversioned tables mutate in
    * place (since=0). */
  private[sources] def mutationCommit(dir: java.nio.file.Path,
      op: String): Long =
    if (GraftVersions.isVersioned(dir))
      GraftVersions.advance(dir, op, removed = Some(Set.empty),
        added = Nil, dataChange = false).version
    else 0L
}

/** The `history` metadata table of a versioned warehouse table — the
  * commit log as a relation (Iceberg's `t.history` / Delta's DESCRIBE
  * HISTORY, DSv2-native): one row per retained snapshot. Reading is a
  * single-partition executor-side scan of the manifests; the log is
  * #versions-sized (audit-sized), never data-sized. Read-only. */
class GraftHistoryTable(tableDir: String) extends Table with SupportsRead {
  import org.apache.spark.sql.connector.read._
  override def name(): String = s"graft_docs(path=$tableDir).history"
  override def schema(): StructType = GraftHistoryTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required = GraftHistoryTable.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = required
        override def toBatch: Batch = this
        override def description(): String =
          s"GraftDocs history log of $tableDir"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftHistoryPartition(tableDir))
        override def createReaderFactory(): PartitionReaderFactory =
          new GraftHistoryReaderFactory(required.fieldNames)
      }
    }
}

object GraftHistoryTable {
  val schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("ts_micros", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("data_change", BooleanType, nullable = false),
    StructField("n_files", IntegerType, nullable = false)))
}

case class GraftHistoryPartition(tableDir: String)
    extends org.apache.spark.sql.connector.read.InputPartition

class GraftHistoryReaderFactory(cols: Array[String])
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dir = Paths.get(p.asInstanceOf[GraftHistoryPartition].tableDir)
    new PartitionReader[InternalRow] {
      private val it = GraftVersions.listVersions(dir).iterator
      private var cur: GraftVersions.VersionInfo = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow.fromSeq(cols.toSeq.map {
        case "version" => cur.version
        case "ts_micros" => cur.tsMicros
        case "op" =>
          org.apache.spark.unsafe.types.UTF8String.fromString(cur.op)
        case "data_change" => cur.dataChange
        case "n_files" => cur.files.length
      })
      override def close(): Unit = ()
    }
  }
}

/** The `files` metadata table of a versioned warehouse table — the
  * LIVE snapshot's manifest as a relation (Iceberg's `t.files`, DSv2-
  * native): one row per data file with its layout bucket, physical
  * row/byte counters, deletion-vector cardinality, recorded doc_id
  * min/max, and bloom presence. What an operator (or an audit query)
  * reads to answer "is this table healthy" — skew across buckets,
  * mask buildup that wants an OPTIMIZE, stats coverage — without
  * touching one data file: the scan is a manifest read, #files-sized.
  * Read-only. */
class GraftFilesMetaTable(tableDir: String) extends Table with SupportsRead {
  import org.apache.spark.sql.connector.read._
  override def name(): String = s"graft_docs(path=$tableDir).files"
  override def schema(): StructType = GraftFilesMetaTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required = GraftFilesMetaTable.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = required
        override def toBatch: Batch = this
        override def description(): String =
          s"GraftDocs files manifest of $tableDir"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftHistoryPartition(tableDir))
        override def createReaderFactory(): PartitionReaderFactory =
          new GraftFilesMetaReaderFactory(required.fieldNames)
      }
    }
}

object GraftFilesMetaTable {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("bucket", IntegerType, nullable = true),
    StructField("rows", LongType, nullable = true),
    StructField("bytes", LongType, nullable = true),
    StructField("masked", LongType, nullable = false),
    // equality-delete VALUES attached to this file (cardinality of the
    // value set — how many physical rows they hide is not a manifest
    // fact, which is why live-row math declines under it)
    StructField("eq_deletes", LongType, nullable = false),
    StructField("min_doc_id", LongType, nullable = true),
    StructField("max_doc_id", LongType, nullable = true),
    StructField("has_bloom", BooleanType, nullable = false),
    // value-layout tables (PARTITIONED BY a generated column): the
    // file's single partition value — NULL when the table has no value
    // layout or the file predates it / is not single-valued
    StructField("partition_value", LongType, nullable = true)))
}

class GraftFilesMetaReaderFactory(cols: Array[String])
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dir = Paths.get(p.asInstanceOf[GraftHistoryPartition].tableDir)
    new PartitionReader[InternalRow] {
      private val valueCol = GraftTableMeta.read(dir).get("layout.values")
      private val it = GraftVersions.latest(dir)
        .map(_.entries).getOrElse(Nil).iterator
      private var cur: GraftVersions.FileEntry = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow.fromSeq(cols.toSeq.map {
        case "file" =>
          org.apache.spark.unsafe.types.UTF8String.fromString(cur.name)
        case "bucket" => cur.bucket.map(Int.box).orNull
        case "rows" => cur.rows.map(Long.box).orNull
        case "bytes" => cur.bytes.map(Long.box).orNull
        case "masked" => cur.dv.map(_.cardinality.toLong).getOrElse(0L)
        case "eq_deletes" => cur.eq.map(_.cardinality.toLong).getOrElse(0L)
        case "min_doc_id" =>
          cur.stats.get("doc_id").map(s => Long.box(s._1)).orNull
        case "max_doc_id" =>
          cur.stats.get("doc_id").map(s => Long.box(s._2)).orNull
        case "has_bloom" => cur.bloom.isDefined
        case "partition_value" =>
          valueCol.flatMap(c => cur.stats.get(c))
            .collect { case (lo, hi) if lo == hi => Long.box(lo) }
            .orNull
      })
      override def close(): Unit = ()
    }
  }
}

/** The `partitions` metadata table of a versioned warehouse table —
  * Iceberg's `t.partitions`: the live manifest ROLLED UP to one row per
  * (partition-spec id, bucket value), with file/row/mask counters. The
  * layout-health face the per-file `t.files` relation can't give
  * directly: bucket skew at a glance, and — because files are stamped
  * with the spec they were written under — exactly how much of the
  * table still sits on an OLD spec after a partition-spec evolution
  * (the number an operator reads to decide when to run the OPTIMIZE
  * migration that restores storage-partitioned joins). The rollup is
  * computed from manifest entries alone: #files work, zero data files
  * opened, regardless of table size. Read-only. */
class GraftPartitionsMetaTable(tableDir: String) extends Table
    with SupportsRead {
  import org.apache.spark.sql.connector.read._
  override def name(): String = s"graft_docs(path=$tableDir).partitions"
  override def schema(): StructType = GraftPartitionsMetaTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required = GraftPartitionsMetaTable.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = required
        override def toBatch: Batch = this
        override def description(): String =
          s"GraftDocs partitions rollup of $tableDir"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftHistoryPartition(tableDir))
        override def createReaderFactory(): PartitionReaderFactory =
          new GraftPartitionsMetaReaderFactory(required.fieldNames)
      }
    }
}

object GraftPartitionsMetaTable {
  val schema: StructType = StructType(Seq(
    // spec id the group's files were written under (absent stamp =
    // spec 0, the CREATE-time layout); bucket NULL = unbucketed files
    StructField("spec", IntegerType, nullable = false),
    StructField("bucket", IntegerType, nullable = true),
    StructField("files", LongType, nullable = false),
    // physical rows may be unknown for pre-stats manifest lines; the
    // rollup reports NULL for a group containing any such file rather
    // than a wrong number
    StructField("rows", LongType, nullable = true),
    StructField("masked", LongType, nullable = false),
    StructField("live_rows", LongType, nullable = true)))
}

class GraftPartitionsMetaReaderFactory(cols: Array[String])
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dir = Paths.get(p.asInstanceOf[GraftHistoryPartition].tableDir)
    // the rollup is #files-sized work over the in-memory manifest; the
    // groups are emitted in (spec, bucket) order for a stable relation
    val groups = GraftVersions.latest(dir)
      .map(_.entries).getOrElse(Nil)
      .groupBy(e => (e.spec.getOrElse(0), e.bucket))
      .toSeq
      .sortBy { case ((spec, bucket), _) => (spec, bucket.getOrElse(-1)) }
      .map { case ((spec, bucket), es) =>
        val rows: Option[Long] =
          if (es.forall(_.rows.isDefined)) Some(es.flatMap(_.rows).sum)
          else None
        val masked = es.map(_.dv.map(_.cardinality.toLong).getOrElse(0L)).sum
        // equality deletes make the group's live count unknowable from
        // the manifest (value masks hide an unknown number of rows) —
        // NULL, never a wrong number
        val live =
          if (es.exists(_.eq.exists(_.cardinality > 0))) None
          else rows.map(_ - masked)
        (spec, bucket, es.length.toLong, rows, masked, live)
      }
    new PartitionReader[InternalRow] {
      private val it = groups.iterator
      private var cur: (Int, Option[Int], Long, Option[Long], Long,
        Option[Long]) = _
      override def next(): Boolean =
        { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow.fromSeq(cols.toSeq.map {
        case "spec" => cur._1
        case "bucket" => cur._2.map(Int.box).orNull
        case "files" => cur._3
        case "rows" => cur._4.map(Long.box).orNull
        case "masked" => cur._5
        case "live_rows" => cur._6.map(Long.box).orNull
      })
      override def close(): Unit = ()
    }
  }
}

/** The `refs` metadata table of a versioned warehouse table — Iceberg's
  * `t.refs`: every NAMED REFERENCE into the snapshot log as a relation.
  * One row for `main` (the table's own head), one per writable branch
  * under `_branches/` (its own head plus the main version it forked
  * from), one per tag (the version it pins). The face an operator reads
  * to answer "what can time-travel or fast_forward still reach" — and
  * the retention input: vacuum keeps every snapshot a ref names. All
  * rows come from properties + manifest headers; #refs-sized, zero data
  * files opened. Read-only. */
class GraftRefsMetaTable(tableDir: String) extends Table with SupportsRead {
  import org.apache.spark.sql.connector.read._
  override def name(): String = s"graft_docs(path=$tableDir).refs"
  override def schema(): StructType = GraftRefsMetaTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required = GraftRefsMetaTable.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = required
        override def toBatch: Batch = this
        override def description(): String =
          s"GraftDocs refs of $tableDir"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftHistoryPartition(tableDir))
        override def createReaderFactory(): PartitionReaderFactory =
          new GraftRefsMetaReaderFactory(required.fieldNames)
      }
    }
}

object GraftRefsMetaTable {
  val schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    // 'branch' (a writable head) or 'tag' (an immutable pin)
    StructField("type", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    // for a branch: the MAIN version it forked from (fast_forward's
    // required publish point); NULL for main itself and for tags
    StructField("base_version", LongType, nullable = true)))
}

class GraftRefsMetaReaderFactory(cols: Array[String])
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader}
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dir = Paths.get(p.asInstanceOf[GraftHistoryPartition].tableDir)
    val main = ("main", "branch",
      GraftVersions.latest(dir).map(_.version).getOrElse(0L),
      Option.empty[Long])
    val branches = GraftVersions.listBranches(dir).map { b =>
      val bdir = GraftVersions.branchDir(dir, b)
      (b, "branch",
        GraftVersions.latest(bdir).map(_.version).getOrElse(0L),
        GraftTableMeta.read(bdir).get("branch.base").flatMap(_.toLongOption))
    }
    val tags = GraftTableMeta.tags(dir).toSeq.sortBy(_._1).map {
      case (t, v) => (t, "tag", v, Option.empty[Long])
    }
    val refs = (main +: branches) ++ tags
    new PartitionReader[InternalRow] {
      private val it = refs.iterator
      private var cur: (String, String, Long, Option[Long]) = _
      override def next(): Boolean =
        { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow.fromSeq(cols.toSeq.map {
        case "name" =>
          org.apache.spark.unsafe.types.UTF8String.fromString(cur._1)
        case "type" =>
          org.apache.spark.unsafe.types.UTF8String.fromString(cur._2)
        case "version" => cur._3
        case "base_version" => cur._4.map(Long.box).orNull
      })
      override def close(): Unit = ()
    }
  }
}

/** `bucket(numBuckets, doc_id)` — the layout function behind the bucketed
  * scan's `KeyGroupedPartitioning`. `canonicalName` is what the engine
  * compares across the two sides of a join to decide the partitionings
  * are THE SAME function, so it is pinned to a stable string. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, id): id mod numBuckets — the graft_docs layout"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, id), got $inputType")
    Bound
  }
  object Bound extends ScalarFunction[Int] {
    override def inputTypes(): Array[DataType] =
      Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    // floored mod, NOT Java's truncated `%`: the writer fans rows with
    // `(((id % n) + n) % n)`, and the engine may evaluate THIS function
    // to shuffle an unbucketed join side against the scan's reported
    // KeyGroupedPartitioning — a negative doc_id under truncated mod
    // would land in a partition that doesn't match the stored layout
    // and silently drop join matches. Function and layout must agree
    // for ALL long values.
    override def produceResult(input: InternalRow): Int = {
      val n = input.getInt(0)
      (((input.getLong(1) % n) + n) % n).toInt
    }
  }
}

/** The warehouse personality's table: the path-backed TSV table plus
  * `SupportsRowLevelOperations` — `MERGE INTO`/`UPDATE`/`DELETE` plan a
  * GROUP-BASED (copy-on-write) rewrite through it.
  *
  * `SupportsMetadataColumns` (`_file`: the part file a row came from,
  * the Iceberg-style provenance column) is not decorative: Spark's
  * `ReplaceDataExec.writingTask` applies its row projection — the one
  * that strips the internal `__row_operation` dispatch column off the
  * rewrite rows — only on the metadata path
  * (`DataAndMetadataWritingSparkTask`); an operation that requests no
  * metadata attributes gets the raw 5-field rows handed to its
  * `DataWriter` and writes garbage. Found empirically (UnsafeRow hex
  * dump: leading word constant 6 = `RowDeltaUtils
  * .WRITE_WITH_METADATA_OPERATION`); the connector therefore always
  * requests `_file` for row-level operations. */
class GraftRlTable(val path: String,
    // Some(v): a `VERSION/TIMESTAMP AS OF` load — a READ-ONLY view of
    // snapshot v (Spark rejects writes to time-travel relations at
    // analysis; the capability set makes the contract explicit)
    val versionPin: Option[Long] = None) extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations
    with SupportsMetadataColumns with SupportsDeleteV2 {
  override def name(): String =
    s"graft_docs(path=$path${versionPin.map(v => s", version=$v").getOrElse("")})"

  /** SQL `TRUNCATE TABLE` — metadata-only: on a versioned table, one
    * empty-snapshot manifest (files stay for time travel); otherwise
    * delete of every part file (no scan, no rewrite; the row-level
    * DELETE path is for predicated deletes). */
  override def truncateTable(): Boolean = {
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) return false
    if (GraftVersions.isVersioned(dir)) {
      GraftVersions.advance(dir, "truncate", None, Nil)
      return true
    }
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val f = it.next()
        val n = f.getFileName.toString
        if (n.matches(GraftFiles.partFileRegex) || n == "_SUCCESS")
          Files.deleteIfExists(f)
      }
    } finally s.close()
    true
  }
  override def schema(): StructType =
    // evolved shape (base + ADD COLUMN tail); a version-pinned read
    // older than a column's `since` presents the PRE-evolution schema
    GraftSchemas.tableSchema(Paths.get(path), versionPin)

  /** DESCRIBE / SHOW CREATE TABLE face: generated and identity columns
    * surface their declared metadata back out through the V2 Column
    * API — the derivation is inspectable, not write-only. Plain
    * columns go through the standard StructType conversion (which
    * preserves DEFAULT metadata). */
  override def columns()
      : Array[org.apache.spark.sql.connector.catalog.Column] = {
    val dir = Paths.get(path)
    // Table's default columns() runs the standard StructType
    // conversion (DEFAULT metadata preserved)
    val base = super.columns()
    val gen = GraftTableMeta.generatedExprs(dir)
    val ident = GraftTableMeta.identitySpecs(dir)
    if (gen.isEmpty && ident.isEmpty) return base
    val idxOf = GraftSchemas.visibleAdded(dir, versionPin)
      .map(c => c.name -> c.idx).toMap
    base.map { c =>
      idxOf.get(c.name) match {
        case Some(i) if gen.contains(i) =>
          org.apache.spark.sql.connector.catalog.Column.create(
            c.name, c.dataType, c.nullable, null, gen(i), null)
        case Some(i) if ident.contains(i) =>
          val (st, sp, e) = ident(i)
          org.apache.spark.sql.connector.catalog.Column.create(
            c.name, c.dataType, c.nullable, null,
            new org.apache.spark.sql.connector.catalog
              .IdentityColumnSpec(st, sp, e), null)
        case _ => c
      }
    }
  }

  override def partitioning(): Array[org.apache.spark.sql.connector.expressions.Transform] = {
    val dir = Paths.get(path)
    // the value layout (PARTITIONED BY a generated column) reports as
    // an identity transform — DESCRIBE shows the declared partitioning
    GraftTableMeta.bucketLayout(dir).map { case (c, n) =>
      org.apache.spark.sql.connector.expressions.Expressions.bucket(n, c)
        : org.apache.spark.sql.connector.expressions.Transform
    }.toArray ++
      GraftTableMeta.read(dir).get("layout.values").map(c =>
        org.apache.spark.sql.connector.expressions.Expressions.identity(c)
          : org.apache.spark.sql.connector.expressions.Transform)
  }
  /** `SHOW TBLPROPERTIES` / `DESCRIBE TABLE EXTENDED` surface: the
    * persisted property store plus the versioning state — table
    * metadata is INSPECTABLE, not just settable. */
  override def properties(): util.Map[String, String] = {
    val dir = Paths.get(path)
    val m = new util.HashMap[String, String]()
    GraftTableMeta.read(dir).foreach { case (k, v) => m.put(k, v) }
    m.put("versioned", GraftVersions.isVersioned(dir).toString)
    m
  }
  override def capabilities(): util.Set[TableCapability] =
    if (versionPin.isDefined) util.EnumSet.of(TableCapability.BATCH_READ)
    else if (GraftVersions.isVersioned(Paths.get(path)))
      // versioned tables additionally stream their commit log
      // (GraftVersionFeed): readStream.table(...) tails the history —
      // and accept streams (GraftDocsStreamingWrite): the same log is
      // the sink's exactly-once txn ledger.
      // AUTOMATIC_SCHEMA_EVOLUTION: `MERGE ... WITH SCHEMA EVOLUTION`
      // routes source-only columns through the SAME AddColumn DDL as
      // ALTER TABLE (Spark's ResolveMergeIntoSchemaEvolution calls
      // alterTable, then reloads) — the registry's append-only rules
      // still gate every change, so an unsupported type fails the
      // MERGE loudly instead of evolving wrongly
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
        TableCapability.TRUNCATE,
        TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "part file this row was read from"
    },
    new MetadataColumn {
      override def name(): String = "_pos"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "physical row position within its part file — with _file, the " +
          "stable row id deletion vectors address"
    },
    new MetadataColumn {
      override def name(): String = "_row_id"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = true
      override def comment(): String =
        "stable row id (row.tracking tables): assigned once at the " +
          "row's birth commit from the table's id high-water mark, " +
          "preserved across MOR deletes and bin-packing OPTIMIZE; " +
          "NULL on untracked rows"
    },
    new MetadataColumn {
      override def name(): String = "_row_commit_version"
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = true
      override def comment(): String =
        "dataChange commit that created this row version (row.tracking " +
          "tables); NULL on untracked rows"
    })
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFilesScanBuilder(path, versionPin = versionPin,
      options = options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(versionPin.isEmpty, s"$name is a read-only snapshot view")
    new GraftDocsWriteBuilder(path, info)
  }
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(versionPin.isEmpty, s"$name is a read-only snapshot view")
    // DELETE (delete.mode), UPDATE (update.mode), and MERGE
    // (merge.mode) on a versioned table with the property set to
    // merge-on-read take the deletion-vector path (GraftMorOperation):
    // masks for the old rows, tiny files for the new ones — MERGE's
    // matched updates split into delete+reinsert, its not-matched
    // inserts are plain inserts. Everything else (and everything on
    // unversioned tables) stays copy-on-write.
    val dir = Paths.get(path)
    val modeKey = info.command() match {
      case RowLevelOperation.Command.DELETE => Some("delete.mode")
      case RowLevelOperation.Command.UPDATE => Some("update.mode")
      case RowLevelOperation.Command.MERGE => Some("merge.mode")
      case _ => None
    }
    val mor = GraftVersions.isVersioned(dir) &&
      modeKey.exists(k => GraftTableMeta.read(dir).get(k)
        .exists(_.equalsIgnoreCase("merge-on-read")))
    if (mor) () => new GraftMorOperation(path, info.command())
    else () => new GraftCowOperation(path, info.command())
  }

  /** Metadata-only DELETE fast path ([[GraftMetaDelete]]): answer yes
    * ONLY when the manifest stats prove every live file wholly in or
    * wholly out of the predicate region — then `deleteWhere` is a
    * single manifest advance dropping the all-match files, no scan, no
    * rewrite, no mask. Any partial file → false → Spark falls back to
    * this table's row-level path (COW or MOR). Versioned tables only:
    * dropping whole files from an unversioned directory would break
    * its (listing-defined) snapshot for concurrent readers. */
  override def canDeleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean = {
    val dir = Paths.get(path)
    GraftVersions.isVersioned(dir) &&
      (GraftVersions.latest(dir).exists(v =>
        GraftMetaDelete.provableScope(v.entries, predicates).isDefined) ||
        // equality-delete tier (delete.mode=equality): a key-equality
        // predicate commits VALUES into the manifest — zero data IO
        (GraftTableMeta.read(dir).get("delete.mode").contains("equality")
          && GraftEqDelete.values(predicates).isDefined))
  }

  override def deleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val dir = Paths.get(path)
    val live = GraftVersions.latest(dir).getOrElse(
      throw new IllegalStateException(
        s"metadata delete on unversioned table $path"))
    // cheapest provable tier first: whole-file drops (no mask at all);
    // then the equality tier (value mask, zero data IO)
    GraftMetaDelete.provableScope(live.entries, predicates) match {
      case Some(scope) =>
        GraftVersions.advance(dir, "delete-metadata", Some(scope), Nil)
      case None =>
        val vals =
          if (GraftTableMeta.read(dir).get("delete.mode")
              .contains("equality"))
            GraftEqDelete.values(predicates)
          else None
        vals match {
          case Some(vs) =>
            GraftVersions.applyEqualityDelete(dir, vs)
            // size-triggered mask materialization: value masks are
            // cheap to WRITE but accumulate in every subsequent
            // manifest and tax every read — past the table's pending
            // threshold, fold them away with a rewrite scoped to the
            // masked files only
            GraftVersions.maybeMaterializeEq(
              org.apache.spark.sql.SparkSession.active, dir)
          case None => throw new IllegalStateException(
            s"deleteWhere called with unprovable predicates on $path — " +
              "canDeleteWhere must gate this path")
        }
    }
  }
}

/** Copy-on-write row-level operation at per-FILE group granularity —
  * the Iceberg-shaped COW pipeline, end to end:
  *
  *  1. Spark's runtime group filtering (`RowLevelOperationRuntimeGroup
  *     Filtering`, on by default) runs a group-discovery subquery and
  *     hands this operation's scan an `_file IN (...)` predicate;
  *  2. the scan ([[GraftFilesScan]], `SupportsRuntimeV2Filtering`)
  *     reads ONLY the matched files, so the rewrite query touches
  *     exactly the groups with matching rows;
  *  3. the write stages replacement parts under collision-free suffixed
  *     names and, at commit, atomically deletes exactly the matched
  *     files and moves the replacements in — untouched files are never
  *     read, rewritten, or deleted. A MERGE touching 1 of 10⁶ files
  *     rewrites 1 file.
  *
  * If no runtime filter arrives (conf off, or a plan shape the
  * discovery rule declines), `matched` stays None and the commit scope
  * degrades to the whole table — correct, just not minimal. Failed
  * rewrites leave the table untouched (staged commit); a replayed
  * commit is idempotent (same scope, same staged names).
  */
class GraftCowOperation(path: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  // set by the scan's runtime group filter (driver-side), read by the
  // write's commit — the handshake that scopes replacement to the files
  // actually rewritten
  @volatile private var matched: Option[Set[String]] = None
  // the snapshot the operation's scan planned against — its commit
  // validates conflicts against this (optimistic concurrency): a racer
  // that rewrote one of OUR files in between fails us loudly instead of
  // us silently undoing its change
  @volatile private var readVersion: Option[Long] = None

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"GraftDocs COW $cmd"
  // see GraftRlTable: requesting _file routes the rewrite through
  // DataAndMetadataWritingSparkTask, whose row projection strips the
  // __row_operation column before rows reach the DataWriter
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFilesScanBuilder(path, Some(fs => matched = Some(fs)),
      onSnapshotResolved = Some(v => readVersion = Some(v)))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // staged replacement parts carry a per-write suffix so they can land
    // beside the retained files of untouched groups; the full queryId
    // (UUID) as hex keeps names unique across ALL commits — on a
    // versioned table a truncated-hash collision would silently overwrite
    // a file an older snapshot still references
    val suffix = "-" + info.queryId().toLowerCase.replaceAll("[^0-9a-f]", "")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftDocsBatchWrite(
          path, info.queryId(), info.schema(), truncate = true,
          replaceScope = () => matched, fileSuffix = suffix,
          opName = cmd.toString.toLowerCase,
          readVersion = () => readVersion)
      }
    }
  }
}
