package graft.sources

import java.util
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 batch connector (`TableProvider` → `Table` →
  * `ScanBuilder` → `Batch` → `PartitionReader`) for a deterministic
  * synthetic document corpus — the connector surface a user implements to
  * plug a custom storage system into Spark (the reference reaches its
  * engine's sources through exactly this kind of registered format;
  * `/root/reference/Assignment-python.py:134` uses the built-in ones).
  *
  * Scale-relevant contracts implemented, not just stubbed:
  *  - SupportsPushDownRequiredColumns: the reader materializes ONLY the
  *    pruned columns (a `select(n_words)` never computes md5 title/fp).
  *  - SupportsPushDownFilters: doc_id range predicates clamp the global
  *    [0, rows) range BEFORE partition planning, so out-of-range input
  *    partitions are never created at all — the DSv2 analog of partition
  *    pruning (file sources prune at listing time, q87).
  *  - planInputPartitions: the surviving range splits into `partitions`
  *    independent readers — executor-parallel like any file scan.
  *
  * Every column is an md5/arithmetic function of doc_id, so a SQL oracle
  * can regenerate the exact table from range(lo, hi).
  */
class GraftDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("path")) match {
      case Some(p) =>
        val base = GraftSchemas.tableSchema(Paths.get(p),
          Option(options.get("versionAsOf")).map(_.toLong))
        if (options.getBoolean("readChangeFeed", false))
          StructType(base.fields.toSeq ++ GraftDocsSource.cdfFields)
        else base
      case None => GraftDocsSource.schema
    }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt,
      Option(properties.get("path")),
      properties.getOrDefault("buckets", "0").toInt,
      properties.getOrDefault("streamBatchRows", "32").toLong,
      cdf = "true".equalsIgnoreCase(
        properties.getOrDefault("readChangeFeed", "false")),
      versionAsOf = Option(properties.get("versionAsOf")).map(_.toLong))
}

object GraftDocsSource {
  // canonical 4-column base shape (fp = 60-bit md5 fingerprint); the
  // single definition lives in GraftDocsSourceSchema so the schema-
  // evolution layer (GraftSchemas) can reference it without a circular
  // initialization dependency
  val schema: StructType = GraftDocsSourceSchema.base

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Column generators, shared by reader and tests. Mirrored in the q88
    * oracle SQL: fp = ('0x'||substr(md5(i),1,15))::BIGINT,
    * n_words = i % 91 + 9, title = 'doc-' || i. */
  def fp(id: Long): Long =
    java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 15), 16)
  def nWords(id: Long): Int = (id % 91 + 9).toInt
  def title(id: Long): String = s"doc-$id"

  /** Change-feed columns appended by `option("readChangeFeed", true)`:
    * Delta's CDF shape — the CDC type of each emitted row and the
    * commit it belongs to. */
  val cdfFields: Seq[StructField] = Seq(
    StructField("_change_type", StringType, nullable = false),
    StructField("_commit_version", LongType, nullable = false))

  private[sources] def metaCol(colName: String, colType: DataType,
      nullable: Boolean, colComment: String): MetadataColumn = {
    val n = nullable
    new MetadataColumn {
      override def name(): String = colName
      override def dataType(): DataType = colType
      override def isNullable: Boolean = n
      override def comment(): String = colComment
    }
  }
}

/** Two personalities behind one provider, selected by the `path` option:
  *  - no path: the generative read-only table (q88) — every column a
  *    function of doc_id.
  *  - path set: a FILE-BACKED table over `part-*.tsv` in that directory,
  *    readable AND writable — the full connector lifecycle
  *    (`WriteBuilder` → `BatchWrite` → `DataWriter` with staged files,
  *    idempotent task commit, and a driver-side finalize) that a real
  *    storage system plugs in through, plus the read path back over the
  *    committed files (q94 round-trips through both).
  */
class GraftDocsTable(rows: Long, parts: Int, val path: Option[String],
    buckets: Int = 0, streamBatchRows: Long = 32L,
    // change-feed personality (`option("readChangeFeed", true)` on a
    // path-backed read): the schema gains _change_type/_commit_version
    // and the stream emits row-level CDC instead of snapshot rows
    cdf: Boolean = false,
    // DataFrame-API time travel (`option("versionAsOf", v)` — Delta's
    // reader option): pins schema AND file set to snapshot v; the SQL
    // face routes the same pin through the catalog ([[GraftRlTable]])
    versionAsOf: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite
    with SupportsMetadataColumns {
  require(versionAsOf.isEmpty || !cdf,
    "versionAsOf pins one snapshot; the change feed is a version RANGE " +
      "read — use startingVersion/endingVersion instead")
  override def name(): String =
    path.map(p => s"graft_docs(path=$p)").getOrElse(s"graft_docs(rows=$rows)")
  /** Path-backed reads expose the same provenance/lineage metadata
    * columns as the catalog face ([[GraftRlTable]]) — in CDF mode this
    * is what makes a delete image name the exact row id it retires.
    * The generative personality has no files, hence no metadata. */
  override def metadataColumns(): Array[MetadataColumn] =
    if (path.isEmpty) Array.empty
    else Array(
      GraftDocsSource.metaCol("_file", StringType, nullable = false,
        "part file this row was read from"),
      GraftDocsSource.metaCol("_pos", LongType, nullable = false,
        "physical row position within its part file"),
      GraftDocsSource.metaCol("_row_id", LongType, nullable = true,
        "stable row id (row.tracking tables); NULL on untracked rows"),
      GraftDocsSource.metaCol("_row_commit_version", LongType,
        nullable = true,
        "dataChange commit that created this row version"))
  override def schema(): StructType = path match {
    // a file-backed table may have been evolved (ADD COLUMN) — its
    // shape is base + the registry tail; the generative personality
    // is always the fixed base
    case Some(p) =>
      val base = GraftSchemas.tableSchema(Paths.get(p), versionAsOf)
      if (cdf) StructType(base.fields.toSeq ++ GraftDocsSource.cdfFields)
      else base
    case None => GraftDocsSource.schema
  }
  override def capabilities(): util.Set[TableCapability] =
    if (path.isEmpty)
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
    else
      // STREAMING_WRITE is declared statically but only versioned
      // tables accept a stream (the _versions log is the exactly-once
      // txn ledger) — unversioned targets fail loudly at stream start;
      // MICRO_BATCH_READ likewise gates on versioning at stream start
      // (the commit log is the offset axis)
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_WRITE,
        TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    path match {
      case Some(p) => new GraftFilesScanBuilder(p, options = options,
        versionPin = versionAsOf)
      case None    => new GraftDocsScanBuilder(rows, parts, buckets,
        streamBatchRows)
    }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val p = path.getOrElse(throw new IllegalArgumentException(
      "graft_docs: writes need the 'path' option (the generative table is read-only)"))
    require(versionAsOf.isEmpty,
      "cannot write to a versionAsOf-pinned read (time travel is read-only)")
    new GraftDocsWriteBuilder(p, info)
  }
}

class GraftDocsScanBuilder(rows: Long, parts: Int, buckets: Int = 0,
    streamBatchRows: Long = 32L)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = GraftDocsSource.schema
  private var lo = 0L
  private var hi = rows
  private var accepted = Array.empty[Filter]
  private var pushedAggs: Seq[String] = Nil

  // ----- aggregate pushdown (COMPLETE): COUNT/MIN/MAX over doc_id are
  // closed-form on the clamped [lo, hi) range — count = hi−lo, min = lo,
  // max = hi−1 — so the "scan" emits ONE pre-aggregated row and never
  // enumerates a single document. This is what makes a count() over a
  // trillion-row virtual table O(1); Spark calls pushAggregation only
  // AFTER every filter was pushed, so the range is final here.
  private def isDocId(e: V2Expression): Boolean = e match {
    case r: NamedReference => r.fieldNames.sameElements(Array("doc_id"))
    case _ => false
  }
  private def recognize(a: Aggregation): Option[Seq[String]] =
    // Decline the EMPTY aggregation (no grouping, no aggregate exprs):
    // it arises when an outer count() makes ColumnPruning drop every
    // unreferenced inner aggregate — `forall` on the empty list is
    // vacuously true, so without this guard we'd claim complete
    // pushdown while build() (pushedAggs.isEmpty) planned the ordinary
    // row scan, and Spark would fail optimization with "data source
    // returns unexpected number of columns" (hidden for rounds by the
    // bench's swallowed Throwables; surfaced by its new errors field).
    if (a.groupByExpressions.nonEmpty || a.aggregateExpressions.isEmpty) None
    else {
      val rec: Seq[Option[String]] = a.aggregateExpressions.toSeq.map {
        case _: CountStar => Some("count")
        // non-distinct COUNT(doc_id) ≡ COUNT(*): doc_id is never null
        case c: Count if !c.isDistinct && isDocId(c.column) => Some("count")
        case m: Min if isDocId(m.column) => Some("min")
        case m: Max if isDocId(m.column) => Some("max")
        case _ => None
      }
      if (rec.forall(_.isDefined)) Some(rec.flatten) else None
    }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    // decline the empty range: MIN/MAX of zero rows is NULL, which the
    // ordinary (unpushed) aggregate handles; completeness only where the
    // closed form is total
    recognize(agg).isDefined && math.min(hi, rows) > math.max(lo, 0L)
  override def pushAggregation(agg: Aggregation): Boolean =
    recognize(agg) match {
      case Some(kinds) if math.min(hi, rows) > math.max(lo, 0L) =>
        pushedAggs = kinds; true
      case _ => false
    }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark passes the subset of our schema it actually references (it
    // can be empty for a bare count()).
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val rest = filters.filterNot {
      case GreaterThan("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue + 1); true
      case GreaterThanOrEqual("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue); true
      case LessThan("doc_id", v: Number) =>
        hi = math.min(hi, v.longValue); true
      case LessThanOrEqual("doc_id", v: Number) =>
        hi = math.min(hi, v.longValue + 1); true
      case EqualTo("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1); true
      case IsNotNull("doc_id") => true // nothing is null here
      case _ => false // anything else runs post-scan
    }
    accepted = filters.diff(rest)
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    if (pushedAggs.nonEmpty)
      new GraftDocsAggScan(math.max(lo, 0L), math.min(hi, rows), pushedAggs)
    else if (buckets > 0)
      new GraftDocsBucketedScan(
        math.max(lo, 0L), math.min(hi, rows), buckets, required)
    else
      new GraftDocsScan(math.max(lo, 0L), math.min(hi, rows), parts, required,
        streamBatchRows)
}

/** Bucketed personality: the storage system DECLARES its layout to the
  * engine via `SupportsReportPartitioning` — partitions are the classes of
  * doc_id mod `buckets`, reported as a `KeyGroupedPartitioning` over
  * `bucket(buckets, doc_id)` with each input split carrying its bucket
  * value (`HasPartitionKey`). With `spark.sql.sources.v2.bucketing
  * .enabled`, two such scans joined on doc_id plan a STORAGE-PARTITIONED
  * JOIN: bucket i joins bucket i with NO exchange on either side — the
  * DSv2 successor of q29's CLUSTERED BY tables and the Iceberg/Delta
  * layout-aware join that keeps a 100 TB fact⋈fact off the wire entirely.
  * The filter-clamped [lo, hi) range still applies inside every bucket
  * (pushdown composes with the layout; both sides may clamp differently
  * and the bucket-to-bucket match stays correct because membership is a
  * pure function of doc_id). */
class GraftDocsBucketedScan(lo: Long, hi: Long, buckets: Int,
    required: StructType)
    extends Scan with Batch with SupportsReportPartitioning {
  import org.apache.spark.sql.connector.expressions.Expressions
  import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftDocs bucketed range=[$lo,$hi) buckets=$buckets " +
      s"cols=${required.fieldNames.mkString(",")}"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(buckets, "doc_id")), buckets)

  override def planInputPartitions(): Array[InputPartition] =
    // every bucket is planned even if its clamped range is empty, so the
    // two sides of a storage-partitioned join always see aligned
    // partition-value sets
    (0 until buckets)
      .map(b => GraftBucketPartition(lo, hi, b, buckets): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftBucketReaderFactory(required.fieldNames)
}

case class GraftBucketPartition(lo: Long, hi: Long, bucket: Int, buckets: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

class GraftBucketReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val bp = p.asInstanceOf[GraftBucketPartition]
    new PartitionReader[InternalRow] {
      // first id ≥ lo with id ≡ bucket (mod buckets), then stride by
      // buckets — the reader enumerates exactly its residue class
      private val first =
        bp.lo + ((bp.bucket - bp.lo % bp.buckets + bp.buckets) % bp.buckets)
      private var i = first - bp.buckets
      override def next(): Boolean = { i += bp.buckets; i < bp.hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "doc_id" => i
          case "title" => UTF8String.fromString(GraftDocsSource.title(i))
          case "fp" => GraftDocsSource.fp(i)
          case "n_words" => GraftDocsSource.nWords(i)
        })
      override def close(): Unit = ()
    }
  }
}

/** Result scan of a COMPLETELY pushed aggregation: one partition, one row,
  * each output column the closed-form value of its pushed AggregateFunc.
  * Spark maps the columns to the query's aggregate expressions
  * positionally, so the schema carries synthetic names. */
class GraftDocsAggScan(lo: Long, hi: Long, aggs: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(aggs.zipWithIndex.map { case (k, i) =>
      StructField(s"pushed_${k}_$i", LongType, nullable = false) })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftDocs COMPLETE-agg-pushdown range=[$lo,$hi) aggs=${aggs.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftDocsPartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsAggReaderFactory(lo, hi, aggs)
}

class GraftDocsAggReaderFactory(lo: Long, hi: Long, aggs: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val first = !emitted; emitted = true; first }
      override def get(): InternalRow = InternalRow.fromSeq(aggs.map {
        case "count" => hi - lo
        case "min"   => lo
        case "max"   => hi - 1
      })
      override def close(): Unit = ()
    }
}

class GraftDocsScan(lo: Long, hi: Long, parts: Int, required: StructType,
    streamBatchRows: Long = 32L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftDocs range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    if (n == 0L) return Array.empty
    val k = math.min(parts.toLong, n).toInt
    // contiguous ranges; filters already clamped [lo, hi), so pruned
    // ranges simply never appear here
    (0 until k).map { i =>
      GraftDocsPartition(lo + i * n / k, lo + (i + 1) * n / k)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory(required.fieldNames)

  /** The STREAMING personality of the same scan: doc_id is the offset
    * axis (an append-only table's natural high-water mark). Column
    * pruning and the pushed doc_id clamps compose unchanged — the
    * micro-batch readers are the SAME readers the batch scan plans,
    * over [max(lo, start), min(hi, end)). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftDocsMicroBatchStream(lo, hi, parts, streamBatchRows, required)
}

case class GraftDocsPartition(start: Long, end: Long) extends InputPartition

/** Offset = "every doc_id below `v` has been emitted". */
case class GraftDocsOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

/** Micro-batch stream over the generative table: offsets advance along
  * doc_id in `streamBatchRows` admission-controlled increments (so a
  * backlog drains as bounded micro-batches, not one giant batch), each
  * batch splitting into the same contiguous-range readers as the batch
  * scan. Implements [[SupportsTriggerAvailableNow]] so
  * `Trigger.AvailableNow` pins the target at start and terminates —
  * the cron-resumable drain — and restart re-enters at the committed
  * offset from the checkpoint (spec-proven with a grown table). */
class GraftDocsMicroBatchStream(lo: Long, hi: Long, parts: Int,
    batchRows: Long, required: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = GraftDocsOffset(lo)
  override def deserializeOffset(json: String): Offset =
    GraftDocsOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(hi)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the API")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = math.max(start.asInstanceOf[GraftDocsOffset].v, lo)
    val target = availableNowTarget.getOrElse(hi)
    val step = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _              => target - s // ReadAllAvailable
    }
    GraftDocsOffset(math.min(s + math.max(step, 0L), target))
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = math.max(start.asInstanceOf[GraftDocsOffset].v, lo)
    val e = math.min(end.asInstanceOf[GraftDocsOffset].v, hi)
    val n = math.max(e - s, 0L)
    if (n == 0L) return Array.empty
    val k = math.min(parts.toLong, n).toInt
    (0 until k).map { i =>
      GraftDocsPartition(s + i * n / k, s + (i + 1) * n / k)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory(required.fieldNames)
}

class GraftDocsReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftDocsPartition]
    new PartitionReader[InternalRow] {
      private var i = gp.start - 1
      override def next(): Boolean = { i += 1; i < gp.end }
      override def get(): InternalRow =
        // only the pruned columns are ever computed (no md5 for a
        // doc_id/n_words-only projection)
        InternalRow.fromSeq(cols.toSeq.map {
          case "doc_id" => i
          case "title" => UTF8String.fromString(GraftDocsSource.title(i))
          case "fp" => GraftDocsSource.fp(i)
          case "n_words" => GraftDocsSource.nWords(i)
        })
      override def close(): Unit = ()
    }
  }
}

// ---------------------------------------------------------------------------
// Path-backed read: scan the committed part-*.tsv files, one independent
// reader per file (executor-parallel like any file scan). Column pruning
// applies — unreferenced fields of each parsed line are never materialized
// into row values. Row-level filters are left to Spark post-scan (a file
// format would add min/max pruning here; out of scope for the TSV demo).
// ---------------------------------------------------------------------------

class GraftFilesScanBuilder(path: String,
    onGroupFilter: Option[Set[String] => Unit] = None,
    versionPin: Option[Long] = None,
    // readStream options (ignoreChanges) ride in via the scan builder
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty(),
    // row-level operations register here to learn which snapshot their
    // scan planned against — the readVersion their commit validates
    // conflicts with (optimistic concurrency)
    onSnapshotResolved: Option[Long => Unit] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = {
    val base = GraftSchemas.tableSchema(Paths.get(path), versionPin)
    if (options.getBoolean("readChangeFeed", false))
      StructType(base.fields.toSeq ++ GraftDocsSource.cdfFields)
    else base
  }
  // per-column pushed bounds, intersected across filters; only columns
  // present here can prune (the writer records stats for exactly
  // these: the base numerics plus generated/identity numeric columns
  // — the latter are what make a `layout.values` table's value
  // predicates prune whole files, i.e. partition pruning)
  private val statCols: Set[String] = Set("doc_id", "fp", "n_words") ++ {
    val dir = Paths.get(path)
    val computed = GraftTableMeta.generatedExprs(dir).keySet ++
      GraftTableMeta.identitySpecs(dir).keySet
    GraftSchemas.effectiveAdded(dir)
      .filter(c => c.visible && computed(c.idx) && c.tpe != "string")
      .map(_.name)
  }
  private val lo = scala.collection.mutable.Map.empty[String, Long]
  private val hi = scala.collection.mutable.Map.empty[String, Long]
  // exact-equality literals (any column, incl. strings) for Bloom
  // probing — rendered exactly as the writer keys them
  private val eqLit = scala.collection.mutable.Map.empty[String, String]
  private def tightenLo(c: String, v: Long): Unit =
    lo(c) = math.max(lo.getOrElse(c, Long.MinValue), v)
  private def tightenHi(c: String, v: Long): Unit =
    hi(c) = math.min(hi.getOrElse(c, Long.MaxValue), v)
  private var accepted = Array.empty[Filter]
  // static `_file` whitelist (basenames) from IN/= predicates: plan-
  // time file pruning for self-scoping maintenance passes
  private var fileList: Option[Set[String]] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Range predicates on any stats-bearing numeric column (doc_id, fp,
    * n_words) drive FILE SKIPPING against the manifest's per-file
    * min/max stats (versioned tables only). Unlike the generative
    * scan's exact clamps, file stats are file-level, not row-exact —
    * so every filter is returned as RESIDUAL for Spark to re-evaluate
    * per row, and `pushedFilters` reports the ranges only for EXPLAIN
    * visibility. This is precisely how parquet min/max pruning
    * composes: prune units early, still filter rows. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case GreaterThan(c, v: Number) if statCols(c) =>
        tightenLo(c, v.longValue + 1)
      case GreaterThanOrEqual(c, v: Number) if statCols(c) =>
        tightenLo(c, v.longValue)
      case LessThan(c, v: Number) if statCols(c) =>
        tightenHi(c, v.longValue - 1)
      case LessThanOrEqual(c, v: Number) if statCols(c) =>
        tightenHi(c, v.longValue)
      case EqualTo(c, v: Number) if statCols(c) =>
        tightenLo(c, v.longValue); tightenHi(c, v.longValue)
      case _ => ()
    }
    filters.foreach {
      case EqualTo(c, v: Number) => eqLit(c) = v.longValue.toString
      case EqualTo(c, v: String) => eqLit(c) = v
      case EqualTo(c, v: UTF8String) => eqLit(c) = v.toString
      case _ => ()
    }
    // STATIC `_file` predicates prune at plan time (the maintenance
    // pattern: analyze/repair passes scope themselves to the needy
    // files — the scan must not open the rest of a 100 TB table). The
    // filter stays residual; Spark re-applies it row-wise.
    filters.foreach {
      case In("_file", vs) =>
        fileList = Some(fileList.getOrElse(
          vs.map(String.valueOf(_)).toSet)
          .intersect(vs.map(String.valueOf(_)).toSet))
      case EqualTo("_file", v) =>
        val s = Set(String.valueOf(v))
        fileList = Some(fileList.map(_.intersect(s)).getOrElse(s))
      case _ => ()
    }
    accepted = filters.filter {
      case GreaterThan(c, _: Number) => statCols(c)
      case GreaterThanOrEqual(c, _: Number) => statCols(c)
      case LessThan(c, _: Number) => statCols(c)
      case LessThanOrEqual(c, _: Number) => statCols(c)
      case EqualTo(c, _: Number) => statCols(c)
      case _ => false
    }
    filters // all residual: stats prune files, Spark filters rows
  }
  override def pushedFilters(): Array[Filter] = accepted

  // ----- aggregate pushdown (COMPLETE) from the MANIFEST: an
  // unfiltered COUNT(*) over a versioned table is the sum of the live
  // snapshot's `rows=` counters minus deletion-vector cardinalities —
  // exact even under masks — and MIN/MAX over a stats-tracked column
  // is the fold of the per-file min/max (exact only while NO file is
  // masked: a mask could hide the extremum, so any DV declines those).
  // Spark offers aggregate pushdown only when no post-scan filter
  // remains (ours are always residual), so a WHERE keeps the ordinary
  // path. At 100 TB this answers `SELECT COUNT(*)` — the first query
  // anyone runs — in O(#files) driver work with ZERO data files opened,
  // exactly how Iceberg/Delta answer it from manifest statistics.
  private var pushedAggs: Seq[(String, String)] = Nil // (kind, column)
  private def manifestEntries(): Option[Seq[GraftVersions.FileEntry]] = {
    val dir = Paths.get(path)
    if (!GraftVersions.isVersioned(dir)) None
    else versionPin.map(e => Some(GraftVersions.manifest(dir, e)))
      .getOrElse(GraftVersions.latest(dir)).map(_.entries)
  }
  private def recognizeAggs(a: Aggregation): Option[Seq[(String, String)]] =
    if (a.groupByExpressions.nonEmpty || a.aggregateExpressions.isEmpty) None
    else {
      def col(e: V2Expression): Option[String] = e match {
        case r: NamedReference if r.fieldNames.length == 1 =>
          Some(r.fieldNames.head).filter(GraftDocsSource.schema.fieldNames.contains)
        case _ => None
      }
      val statCols = Set("doc_id", "fp", "n_words")
      val rec = a.aggregateExpressions.toSeq.map {
        case _: CountStar => Some(("count", ""))
        // every column of the schema is non-nullable, so COUNT(col)
        // ≡ COUNT(*)
        case c: Count if !c.isDistinct && col(c.column).isDefined =>
          Some(("count", ""))
        case m: Min if col(m.column).exists(statCols) =>
          Some(("min", col(m.column).get))
        case m: Max if col(m.column).exists(statCols) =>
          Some(("max", col(m.column).get))
        case _ => None
      }
      if (rec.forall(_.isDefined)) Some(rec.flatten) else None
    }
  /** Can the manifest answer these aggregates EXACTLY? */
  private def answerable(kinds: Seq[(String, String)]): Boolean =
    // never answer aggregates from the LIVE manifest for a change-feed
    // read: COUNT over changes is not COUNT over the table
    !options.getBoolean("readChangeFeed", false) &&
    (accepted.isEmpty && lo.isEmpty && hi.isEmpty && eqLit.isEmpty) &&
      manifestEntries().exists { es =>
        es.forall(_.rows.isDefined) && kinds.forall {
          // COUNT folds rows minus DV cardinality; an EQUALITY delete
          // makes the live count unknowable from the manifest (how many
          // rows match a VALUE is not a manifest fact) → decline
          case ("count", _) => es.forall(_.eq.isEmpty)
          case (_, c) =>
            // min/max: every non-empty file tracks c, none is masked
            // (by positions OR values — either could hide the
            // extremum), and at least one live row exists (else the
            // answer is NULL — leave that to the ordinary aggregate)
            es.forall(e => e.dv.isEmpty && e.eq.isEmpty &&
              (e.rows.contains(0L) || e.stats.contains(c))) &&
              es.exists(_.rows.exists(_ > 0L))
        }
      }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    recognizeAggs(agg).exists(answerable)
  override def pushAggregation(agg: Aggregation): Boolean =
    recognizeAggs(agg).filter(answerable) match {
      case Some(kinds) => pushedAggs = kinds; true
      case None => false
    }

  override def build(): Scan = {
    if (pushedAggs.nonEmpty) {
      val es = manifestEntries().get
      val nonEmpty = es.filter(_.rows.exists(_ > 0L))
      val values: Seq[(Long, DataType)] = pushedAggs.map {
        case ("count", _) => (es.flatMap(_.liveRows).sum, LongType)
        case (kind, c) =>
          val t = GraftDocsSource.schema(c).dataType
          val folded =
            if (kind == "min") nonEmpty.map(_.stats(c)._1).min
            else nonEmpty.map(_.stats(c)._2).max
          (folded, t)
      }
      return new GraftManifestAggScan(path, values)
    }
    val ranges = (lo.keySet ++ hi.keySet).map { c =>
      c -> (lo.getOrElse(c, Long.MinValue), hi.getOrElse(c, Long.MaxValue))
    }.toMap
    new GraftFilesScan(path, required, onGroupFilter, versionPin,
      ignoreChanges = options.getBoolean("ignoreChanges", false),
      ignoreDeletes = options.getBoolean("ignoreDeletes", false),
      startingVersion = Option(options.get("startingVersion")).map(_.toLong),
      endingVersion = Option(options.get("endingVersion")).map(_.toLong),
      colRanges = ranges, eqLiterals = eqLit.toMap,
      onSnapshotResolved = onSnapshotResolved,
      cdf = options.getBoolean("readChangeFeed", false),
      fileWhitelist = fileList)
  }
}

/** Result of a COMPLETELY pushed manifest aggregation: one partition,
  * one pre-computed row — the values were folded from the manifest at
  * PLAN time, no data file is ever opened. */
class GraftManifestAggScan(path: String, values: Seq[(Long, DataType)])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(values.zipWithIndex.map { case ((_, t), i) =>
      StructField(s"pushed_manifest_$i", t, nullable = false) })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftDocs manifest-agg path=$path values=${values.map(_._1).mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftManifestAggPartition(values.map {
      case (v, IntegerType) => Int.box(v.toInt)
      case (v, _) => Long.box(v)
    }))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition)
          : PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = {
            val first = !emitted; emitted = true; first
          }
          override def get(): InternalRow = InternalRow.fromSeq(
            p.asInstanceOf[GraftManifestAggPartition].values)
          override def close(): Unit = ()
        }
    }
}

case class GraftManifestAggPartition(values: Seq[Any]) extends InputPartition

/** `part-*.tsv` names: plain writes use `part-NNNNN.tsv`; bucketed
  * writes insert the bucket id (`part-NNNNN-b<k>.tsv`); row-level
  * rewrites and versioned commits suffix a write id
  * (`part-NNNNN[-b<k>]-<hex>.tsv`) so replacement files can land next
  * to retained ones without colliding. */
object GraftFiles {
  // plain | bucketed (-b<k>) | z-fanned (-z<id>, compaction staging) |
  // write-id-suffixed (row-level rewrites, versioned commits)
  val partFileRegex = "part-\\d+(-b\\d+)?(-z\\d+)?(-[0-9a-f]+)?\\.tsv"

  /** A manifest entry's FILE-IDENTITY key. Branch manifests reference
    * their fork's root files through `../../`-relative names while the
    * `_file` metadata column (hence every runtime group filter, COW
    * replace scope, and MOR delete target derived from it) carries the
    * bare file name — matching on anything but the basename silently
    * no-ops row-level operations against fork-referenced files.
    * Basenames are unique within a snapshot: versioned writes suffix
    * every file with the commit's UUID. */
  def baseName(n: String): String = {
    val i = n.lastIndexOf('/')
    if (i < 0) n else n.substring(i + 1)
  }
}

class GraftFilesScan(path: String, required: StructType,
    onGroupFilter: Option[Set[String] => Unit] = None,
    // Some(v): a time-travel read pinned to snapshot v; None: the live
    // table (manifest-latest when versioned, directory listing otherwise)
    versionPin: Option[Long] = None,
    // streaming only: tolerate rewrite commits (see GraftVersionFeed)
    ignoreChanges: Boolean = false,
    // streaming only: tolerate deletion-vector-only commits (MOR
    // deletes) — Delta's ignoreDeletes contract
    ignoreDeletes: Boolean = false,
    // streaming: start tailing AT this commit instead of taking the
    // initial snapshot — Delta's startingVersion contract. Batch CDF:
    // the first commit whose changes are emitted (required there).
    startingVersion: Option[Long] = None,
    // batch CDF only: the last commit whose changes are emitted
    // (default: the latest commit at plan time)
    endingVersion: Option[Long] = None,
    // pushed per-column bounds: prune files by manifest min/max stats
    colRanges: Map[String, (Long, Long)] = Map.empty,
    // pushed equality literals: prune files by their manifest blooms
    eqLiterals: Map[String, String] = Map.empty,
    // reports the snapshot version this scan resolved at plan time
    // (row-level operations' optimistic-concurrency readVersion)
    onSnapshotResolved: Option[Long => Unit] = None,
    // change-feed personality: row-level CDC (insert/delete/
    // update_preimage/update_postimage) instead of snapshot rows —
    // streamed one commit per micro-batch, or BATCH-read over
    // [startingVersion, endingVersion] (Delta's table_changes)
    cdf: Boolean = false,
    // static `_file IN (...)` whitelist (basenames): plan-time file
    // pruning for maintenance passes that scope themselves
    fileWhitelist: Option[Set[String]] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportOrdering
    with SupportsReportPartitioning {
  /** The table directory this scan reads (materialized-view rewrite
    * uses it to locate the source's registered views). */
  def tablePath: String = path

  /** Per-partition SORT ORDER, reported only when the manifest PROVES
    * it: every planned file carries the writer-observed `sorted=`
    * fact, and each input partition emits a single such file — one
    * file per partition on unbucketed tables by construction, one
    * SORTED file per bucket class on bucketed ones (two sorted files
    * concatenated are not sorted, so a multi-file class withholds the
    * claim). With `write.distribution = 'hash'` every write lands
    * exactly that shape, and a sort-merge join over two such tables
    * plans with NO exchange and NO sort — the full sorted-bucket-merge
    * story at manifest cost. Masks only drop rows (order survives MOR
    * and equality deletes); CDF reads interleave commits and never
    * claim an order. False claims are worse than no claims: every
    * gate here defaults to withholding. */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    val provable = !cdf && required.fieldNames.contains("doc_id") && {
      val entries = liveEntries()
      entries.nonEmpty && entries.forall(_.sorted) &&
        (bucketedLayout.isEmpty ||
          entries.groupBy(_.bucket).forall(_._2.size == 1))
    }
    if (!provable) Array.empty
    else Array(org.apache.spark.sql.connector.expressions.Expressions
      .sort(
        org.apache.spark.sql.connector.expressions.Expressions
          .column("doc_id"),
        org.apache.spark.sql.connector.expressions.SortDirection
          .ASCENDING))
  }
  /** True when this scan is the plain LIVE snapshot — no time-travel
    * pin, no pushed predicates, no CDC personality, no file scoping.
    * The ONLY shape a materialized-view rewrite may substitute: any of
    * these would change the row set the aggregate was declared over. */
  def isBareLiveSnapshot: Boolean =
    versionPin.isEmpty && bareSnapshotPin.isDefined
  /** Like [[isBareLiveSnapshot]] but ADMITTING a time-travel pin:
    * Some(pin) when the scan is bare apart from an optional version
    * pin. This is the shape the materialized-view rewrite's HISTORICAL
    * substitution accepts — a pinned aggregate can be answered from
    * the MV state whose refresh watermark equals the pinned source
    * version (the MV's own history replays refresh states). */
  def bareSnapshotPin: Option[Option[Long]] =
    if (startingVersion.isEmpty && endingVersion.isEmpty &&
        colRanges.isEmpty && eqLiterals.isEmpty && !cdf &&
        fileWhitelist.isEmpty) Some(versionPin)
    else None
  /** Like [[bareSnapshotPin]] but ADMITTING pushed file-pruning state
    * (colRanges / eqLiterals / fileWhitelist). Every pushed filter in
    * this source is RESIDUAL — `pushFilters` returns its whole input,
    * so Spark always re-evaluates the full predicate in a retained
    * Filter above the scan — which means the pruning state only
    * narrows which FILES are opened, never which rows survive the
    * plan's own predicate. A consumer that accounts for that retained
    * Filter (the MV rewrite's FILTERED substitution) therefore sees
    * the same row set as a bare snapshot + the predicate. CDC
    * personalities and streaming offsets still disqualify: they change
    * the row set itself, not just the files opened. */
  def residualSnapshotPin: Option[Option[Long]] =
    if (startingVersion.isEmpty && endingVersion.isEmpty && !cdf)
      Some(versionPin)
    else None
  // files surviving runtime group filtering; None = no filter arrived
  @volatile private var keep: Option[Set[String]] = None
  // value-partition whitelist from a DPP runtime filter; None = none
  @volatile private var keepValues: Option[Set[Long]] = None

  /** The declared bucket layout IF this scan can honor it: the table
    * persists `layout.bucket` (bucketed CREATE), the resolved snapshot's
    * every live file carries a recorded bucket id, and the read schema
    * still contains the bucketing column (the engine resolves the
    * reported transform against the relation OUTPUT — same lesson as
    * the `_file` runtime-filter attribute). Files predating the layout
    * degrade the whole scan to unknown partitioning: a partial grouping
    * would be a lie to the planner. Decided once per scan, so
    * outputPartitioning and planInputPartitions always agree. */
  private lazy val bucketedLayout: Option[Int] = {
    val dir = Paths.get(path)
    if (!GraftVersions.isVersioned(dir)) None
    else if (!required.fieldNames.contains("doc_id")) None
    else GraftTableMeta.bucketLayout(dir).map(_._2).filter { n =>
      val entries = versionPin.map(GraftVersions.manifest(dir, _))
        .orElse(GraftVersions.latest(dir)).map(_.entries).getOrElse(Nil)
      // partition-spec evolution: a bucket id is only meaningful under
      // the spec it was computed with, so every live file must carry
      // the CURRENT spec (absent = spec 0) — a mixed-spec snapshot
      // degrades to unknown partitioning until OPTIMIZE migrates it
      val cur = GraftTableMeta.currentSpecId(dir)
      entries.forall(e => e.bucket.exists(b => b >= 0 && b < n) &&
        e.spec.getOrElse(0) == cur)
    }
  }

  /** Storage-partitioned-join face of the WAREHOUSE tables: a bucketed
    * table's files group into one input partition per bucket class
    * (`HasPartitionKey`), reported as `KeyGroupedPartitioning` over
    * `bucket(n, doc_id)` — two such tables joined on doc_id plan with
    * NO exchange on either side (the Iceberg/Delta layout-aware join;
    * the virtual docs tables' q136 story, now on real written data
    * that MERGE/UPDATE/DELETE and OPTIMIZE keep bucketed). */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    bucketedLayout match {
      case Some(n) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .bucket(n, "doc_id")), n)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
          planInputPartitions().length)
    }

  /** Manifest-resident statistics for the COST-BASED optimizer: the
    * planner sees this scan's true size (post-pruning, DV-adjusted)
    * without opening a single data file, so a small curated table on
    * the build side of a join gets auto-broadcast exactly like a small
    * parquet table would — at 100 TB, the difference between a
    * broadcast hash join and an accidental 100 TB shuffle. Row counts
    * come from the writer's `rows=` manifest counters minus each
    * file's deletion-vector cardinality; byte sizes from `bytes=`,
    * falling back to a driver-side Files.size for pre-stats entries
    * (a few syscalls, still no data read). Statistics may only
    * OVERCOUNT on masked files' bytes — safe for planning. */
  override def estimateStatistics(): Statistics = {
    val dir = Paths.get(path)
    val entries = liveEntries()
    val bytes = entries.map { e =>
      e.bytes.getOrElse {
        try Files.size(dir.resolve(e.name)) catch {
          case _: java.io.IOException => 0L
        }
      }
    }.sum
    val rows: java.util.OptionalLong =
      if (entries.forall(_.rows.isDefined))
        java.util.OptionalLong.of(entries.flatMap(_.liveRows).sum)
      else java.util.OptionalLong.empty()
    // Column-level NDV (ndv.columns tables): fold the live entries'
    // per-file distinct sketches — exact under the per-file cap, HLL
    // beyond — into DSv2 ColumnStatistics. All-or-nothing per scan: a
    // single sketch-less live file (pre-property writes) withholds the
    // map rather than reporting a count that can undercount. Physical-
    // row sketches may OVERCOUNT live distinct on masked files — the
    // safe direction for planning, same as the byte overcount above.
    val ndvStats: Map[String, Long] =
      if (entries.isEmpty || entries.exists(_.ndv.isEmpty)) Map.empty
      else entries.flatMap(_.ndv).reduce(_ merge _).cols
        .filter { case (c, _) => required.fieldNames.contains(c) }
        .map { case (c, s) => c -> s.estimate }
    // Column MIN/MAX: the same per-file envelopes that drive manifest
    // pruning fold into table-level bounds for Catalyst's FILTER
    // estimation — a selective range predicate then shrinks the
    // estimated row count BEFORE join planning, which is what flips a
    // filtered build side to broadcast. All-or-nothing per column (a
    // pre-stats file withholds the bound rather than narrowing it
    // wrongly); DV/eq-masked files can only WIDEN the range — the safe
    // direction for planning. Empty-file markers (lo > hi) constrain
    // nothing and are skipped, not failed.
    val minMax: Map[String, (Long, Long)] =
      if (entries.isEmpty) Map.empty
      else required.fields.toSeq.collect {
        case f if f.dataType == org.apache.spark.sql.types.LongType ||
            f.dataType == org.apache.spark.sql.types.IntegerType => f.name
      }.flatMap { c =>
        val perFile = entries.map(_.stats.get(c))
        if (perFile.contains(None)) None
        else {
          val boxes = perFile.flatten.filter { case (lo, hi) => lo <= hi }
          if (boxes.isEmpty) None
          else Some(c -> (boxes.map(_._1).min, boxes.map(_._2).max))
        }
      }.toMap
    def boxed(c: String, v: Long): AnyRef =
      required.fields.find(_.name == c).map(_.dataType) match {
        case Some(org.apache.spark.sql.types.IntegerType) =>
          java.lang.Integer.valueOf(v.toInt)
        case _ => java.lang.Long.valueOf(v)
      }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = rows
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        (ndvStats.keySet ++ minMax.keySet).foreach { c =>
          // nullCount rides along for the NOT NULL base columns (a
          // schema fact, no counter needed) — Catalyst's aggregate/join
          // estimation only uses a column's NDV when BOTH counts are
          // known (ColumnStat.hasCountStats), and filter range
          // estimation similarly keys off hasMinMaxStats; evolved
          // columns keep distinctCount alone
          val nonNullBySchema = Set("doc_id", "fp", "n_words")(c)
          m.put(
            org.apache.spark.sql.connector.expressions.Expressions.column(c),
            new org.apache.spark.sql.connector.read.colstats
                .ColumnStatistics {
              override def distinctCount(): java.util.OptionalLong =
                ndvStats.get(c).map(java.util.OptionalLong.of)
                  .getOrElse(java.util.OptionalLong.empty())
              override def min(): java.util.Optional[Object] =
                minMax.get(c).map(b => java.util.Optional.of(
                  boxed(c, b._1))).getOrElse(java.util.Optional.empty())
              override def max(): java.util.Optional[Object] =
                minMax.get(c).map(b => java.util.Optional.of(
                  boxed(c, b._2))).getOrElse(java.util.Optional.empty())
              override def nullCount(): java.util.OptionalLong =
                if (nonNullBySchema) java.util.OptionalLong.of(0L)
                else java.util.OptionalLong.empty()
            })
        }
        m
      }
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftDocsFiles path=$path cols=${required.fieldNames.mkString(",")}"

  /** Runtime (dynamic) filtering on the `_file` metadata column — what
    * turns a whole-table row-level rewrite into a per-FILE one: Spark
    * first runs the group-discovery subquery, then hands this scan an
    * `_file IN (...)` predicate, and only the named files are read (and
    * therefore only they are replaced — see [[GraftCowOperation]]).
    * Unrecognized predicate shapes are ignored: reading more than
    * necessary is correct, just not minimal. */
  /** The table's value-partition column (PARTITIONED BY a generated
    * column), eligible for DYNAMIC PARTITION PRUNING: a join against a
    * filtered dimension on this column makes Spark run the dim side
    * first and hand this scan an `IN (values)` runtime predicate — the
    * manifest's min=max stats then drop whole partitions before a fact
    * byte is read (Spark's DPP, at manifest cost instead of a
    * directory tree). */
  private lazy val valuePartitionCol: Option[String] = {
    val dir = Paths.get(path)
    if (!GraftVersions.isVersioned(dir)) None
    else GraftTableMeta.read(dir).get("layout.values")
      .filter(required.fieldNames.contains)
  }

  override def filterAttributes(): Array[NamedReference] = {
    // advertise `_file` (row-level group filtering) or the value-
    // partition column (DPP) ONLY when this scan actually produces
    // them: Spark's dynamic-pruning rule resolves filterAttributes
    // against the relation OUTPUT and throws on a miss — a plain
    // query's scan (no metadata columns) must therefore advertise
    // nothing, or any broadcast-join plan over this table fails
    // analysis (surfaced when manifest statistics made these tables
    // broadcast-able). The two are EXCLUSIVE by design: a scan that
    // produces `_file` is a row-level operation's, and its group
    // filter must arrive as `_file IN (...)` — advertising the value
    // column too made Spark build the group filter on IT instead,
    // which pruned the scan correctly but never delivered the replace
    // SCOPE, so the COW commit degraded to remove-all (caught as a
    // 10-row data loss in q261's lifecycle; plain DPP queries never
    // request `_file`).
    val col =
      if (required.fieldNames.contains("_file")) Some("_file")
      else valuePartitionCol
    col.map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray
  }
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    def refTo(col: String)(e: V2Expression): Boolean = e match {
      case r: NamedReference => r.fieldNames.toSeq == Seq(col)
      case _ => false
    }
    def litString(e: V2Expression): Option[String] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        Option(l.value()).map(_.toString)
      case _ => None
    }
    // IN / = sets per runtime-filterable attribute; unrecognized
    // predicate shapes are ignored (reading more than necessary is
    // correct, just not minimal)
    def matchedSets(col: String): Seq[Set[String]] =
      predicates.toSeq.flatMap { p =>
        (p.name(), p.children().toSeq) match {
          case ("IN", ref +: vals) if refTo(col)(ref) &&
              vals.forall(litString(_).isDefined) =>
            Some(vals.flatMap(litString).toSet)
          case ("=", Seq(a, b)) if refTo(col)(a) &&
              litString(b).isDefined =>
            Some(litString(b).toSet)
          case ("=", Seq(a, b)) if refTo(col)(b) &&
              litString(a).isDefined =>
            Some(litString(a).toSet)
          case _ => None
        }
      }
    val fileSets = matchedSets("_file")
    if (fileSets.nonEmpty) {
      // multiple predicates on _file intersect
      val files = fileSets.reduce(_ intersect _)
      keep = Some(files)
      onGroupFilter.foreach(_(files))
    }
    // DPP on the value-partition column: the runtime values intersect
    // into a partition whitelist applied against each file's min=max
    // stat in liveEntries (a file without the stat is never pruned)
    valuePartitionCol.foreach { c =>
      val vs = matchedSets(c)
      if (vs.nonEmpty)
        keepValues =
          Some(vs.reduce(_ intersect _).flatMap(_.toLongOption))
    }
  }

  /** File entries this scan will read, after every planning-time prune
    * (snapshot resolution, min/max stats, blooms, runtime group
    * filter). Versioned tables resolve from a snapshot manifest (the
    * pin, or latest — resolved at plan time, so a scan observes one
    * committed snapshot even if a commit lands mid-query) and SKIP
    * files whose recorded min/max on ANY pushed column is disjoint from
    * that column's range — planning work proportional to the files a
    * selective query can actually touch. Unversioned tables keep the
    * original directory listing (no stats, no pruning, no masks). */
  private def liveEntries(): Seq[GraftVersions.FileEntry] = {
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) return Nil
    val entries: Seq[GraftVersions.FileEntry] =
      if (GraftVersions.isVersioned(dir)) {
        // bloom probes apply only to columns the table indexes
        // (GraftTableMeta) — probing a never-inserted column would
        // wrongly prove absence
        val bloomCols = eqLiterals.keySet
          .intersect(GraftTableMeta.bloomColumns(dir).toSet)
        val snapshot = versionPin.map(GraftVersions.manifest(dir, _))
          .orElse(GraftVersions.latest(dir))
        snapshot.foreach(s => onSnapshotResolved.foreach(_(s.version)))
        snapshot.map(_.entries).getOrElse(Nil)
          .filter(e => colRanges.forall { case (c, (l, h)) =>
            e.mayContain(c, l, h)
          })
          .filter(e => bloomCols.forall(c =>
            e.mayContainValue(c, eqLiterals(c))))
      }
      else {
        val s = Files.list(dir)
        try s.iterator().asScala
          .map(_.getFileName.toString)
          .filter(_.matches(GraftFiles.partFileRegex)).toSeq.sorted
          .map(GraftVersions.FileEntry(_, GraftVersions.FileEntry.NoStats))
        finally s.close()
      }
    // match by basename: `_file` (the group filter's source) carries
    // bare names, branch manifests carry `../../`-relative ones
    entries.filter(e =>
      keep.forall(_.contains(GraftFiles.baseName(e.name))))
      .filter(e =>
        fileWhitelist.forall(_.contains(GraftFiles.baseName(e.name))))
      .filter { e =>
        // DPP partition whitelist: prune a file only when its value-
        // partition stat PROVES a single value outside the set — a
        // missing or widened stat keeps the file (never lose rows)
        keepValues.forall { vs =>
          valuePartitionCol.flatMap(e.stats.get) match {
            case Some((lo, hi)) if lo == hi => vs.contains(lo)
            case _ => true
          }
        }
      }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (cdf) {
      // BATCH change feed — Delta's `table_changes(t, v1, v2)` shape:
      // every commit of [startingVersion, endingVersion] diffed and
      // labeled in ONE scan, same taxonomy and row-level images as the
      // streaming face (GraftChangeFeed is the one implementation).
      // startingVersion is required: an unbounded batch CDF read has no
      // checkpoint to anchor "since when", so silence would mean "the
      // whole history", which is what time travel is for.
      val d = Paths.get(path)
      if (!GraftVersions.isVersioned(d))
        throw new UnsupportedOperationException(
          s"readChangeFeed needs a versioned table: $path has no " +
            "_versions commit log")
      val sv = startingVersion.getOrElse(
        throw new IllegalArgumentException(
          "batch readChangeFeed needs option(\"startingVersion\", v): " +
            "changes are emitted for commits [startingVersion, " +
            "endingVersion] (endingVersion defaults to the latest " +
            "commit); use spark.readStream to tail the feed instead"))
      val latest = GraftVersions.latest(d).map(_.version).getOrElse(-1L)
      val ev = endingVersion.getOrElse(latest)
      require(sv >= 0 && sv <= ev && ev <= latest,
        s"batch readChangeFeed range [$sv, $ev] must satisfy 0 <= " +
          s"startingVersion <= endingVersion <= latest ($latest) for " +
          path)
      return GraftChangeFeed.partitions(path, sv - 1, ev, cdf = true,
        ignoreChanges, ignoreDeletes).map(p => p: InputPartition).toArray
    }
    val dir = Paths.get(path)
    val entries = liveEntries()
    bucketedLayout match {
      case Some(n) =>
        // one partition per bucket CLASS, every class planned even when
        // empty after pruning — the two sides of a storage-partitioned
        // join must see aligned partition-value sets
        val byBucket = entries.groupBy(_.bucket.get)
        (0 until n).map { b =>
          GraftBucketFilesPartition(b,
            byBucket.getOrElse(b, Nil).map(e =>
              (dir.resolve(e.name).toString,
                e.dv.map(_.positions).getOrElse(Array.empty[Long]),
                e.lineage.flatMap(t => Seq(t._1, t._2, t._3)).toArray,
                e.eq.map(_.positions).getOrElse(Array.empty[Long])))
          ): InputPartition
        }.toArray
      case None =>
        entries
          .map(e => GraftFilePartition(dir.resolve(e.name).toString,
            e.dv.map(_.positions).getOrElse(Array.empty),
            lineage = e.lineage.flatMap(t =>
              Seq(t._1, t._2, t._3)).toArray,
            eqSkip = e.eq.map(_.positions)
              .getOrElse(Array.empty)): InputPartition)
          .toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFilesReaderFactory(required.fieldNames,
      GraftSchemas.readerAdded(Paths.get(path), versionPin))

  /** Streaming personality of a VERSIONED warehouse table: the commit
    * log is the offset axis — see [[GraftVersionFeed]]. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    if (!GraftVersions.isVersioned(Paths.get(path)))
      throw new UnsupportedOperationException(
        s"streaming reads of $path need a versioned table: the _versions " +
          "commit log is the stream's offset axis (enable versioning with " +
          "TBLPROPERTIES('versioned'='true') or GraftVersions.enable)")
    new GraftVersionFeed(path, required, ignoreChanges, ignoreDeletes,
      startingVersion, cdf)
  }
}

/** Offset = "every commit up to and including version `v` has been
  * emitted"; -1 = nothing consumed yet. */
case class GraftVersionOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

/** Change feed over a versioned table's commit log — the readStream
  * personality of the warehouse tables, shaped like Delta's table
  * streaming:
  *
  *  - the OFFSET AXIS is the version number; each micro-batch consumes
  *    EXACTLY ONE commit (admission unit = commit), so batch contents
  *    are deterministic, bounded by what a single commit wrote, and
  *    align 1:1 with the history q217 audits;
  *  - a batch emits the rows of the files the commit ADDED (manifest
  *    diff vs its predecessor) — exact row-level CDC for append-only
  *    workloads. A REWRITE commit (update/delete/merge/overwrite/
  *    truncate) fails the stream by default — silently treating a
  *    rewritten file's full contents as "new rows" would double-count
  *    its carried-over rows; `option("ignoreChanges", true)` opts into
  *    exactly Delta's documented ignoreChanges semantics (re-emission
  *    of rewritten files, consumers dedupe by key);
  *  - a restart whose checkpointed offset predates VACUUMed history
  *    fails loudly (the diff base is gone — silently restreaming the
  *    full snapshot would duplicate everything already consumed); a
  *    FRESH stream on a vacuumed table starts from the oldest retained
  *    snapshot as its initial batch, then follows diffs — Delta's
  *    initial-snapshot-then-tail semantics;
  *  - `Trigger.AvailableNow` pins the target version at start and
  *    terminates — the cron-resumable drain, same as the generative
  *    stream's ([[GraftDocsMicroBatchStream]]).
  *
  * Column pruning composes (the same pruned readers as the batch scan).
  */
class GraftVersionFeed(path: String, required: StructType,
    ignoreChanges: Boolean, ignoreDeletes: Boolean = false,
    // Delta's startingVersion: begin tailing AT this commit (its own
    // files are the first batch) instead of materializing the initial
    // snapshot — the consumer that already holds a copy up to v-1
    // resumes without re-reading the table. Checkpointed restarts keep
    // their stored offset; this only seeds a FRESH stream.
    startingVersion: Option[Long] = None,
    // change-feed mode: emit row-level CDC with _change_type/
    // _commit_version labels. MOR commits are row-EXACT by
    // construction: the positions a commit newly masked are its
    // delete/update preimages, read back out of the immutable base
    // files; its added files are the postimages/inserts. File-granular
    // rewrites (COW update/merge, overwrite, restore) stay rejected in
    // CDF mode — fabricating row images from whole-file diffs would
    // mislabel carried-over rows as changes.
    cdf: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private def dir = Paths.get(path)
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = startingVersion match {
    case None => GraftVersionOffset(-1L)
    case Some(v) =>
      val retained = GraftVersions.listVersionNumbers(dir)
      // the first batch is commit v AS A DIFF against v-1, so both must
      // be reconstructable: v retained, and its base retained (or v=0,
      // whose base is the empty table). A vacuumed base cannot yield
      // the commit's changes — fail loudly rather than re-emit carried
      // rows (Delta's startingVersion raises the same way).
      require(retained.contains(v) && (v == 0 || retained.contains(v - 1)),
        s"startingVersion $v needs snapshots $v and ${v - 1} retained " +
          s"in $path (have: ${retained.mkString(",")})")
      // offset semantics: "every commit ≤ offset emitted" — starting AT
      // v means the stored offset is v-1
      GraftVersionOffset(v - 1)
  }
  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget =
      Some(GraftVersions.latest(dir).map(_.version).getOrElse(-1L))

  // admission unit is one COMMIT per micro-batch; row-based limits
  // don't apply (a commit is indivisible in the offset axis)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the API")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftVersionOffset].v
    val target = availableNowTarget.getOrElse(
      GraftVersions.latest(dir).map(_.version).getOrElse(-1L))
    // a FRESH stream on vacuumed history jumps straight to the oldest
    // retained snapshot (its full contents are the initial batch); a
    // resumed stream advances one commit at a time — a resumed offset
    // inside vacuumed history is the stale-checkpoint error, raised
    // with context in planInputPartitions
    val oldest = GraftVersions.listVersionNumbers(dir).headOption.getOrElse(0L)
    val next = if (s < 0) math.max(oldest, 0L) else s + 1
    GraftVersionOffset(math.min(next, target))
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].v
    val e = end.asInstanceOf[GraftVersionOffset].v
    if (e <= s) return Array.empty
    GraftChangeFeed.partitions(path, s, e, cdf, ignoreChanges,
      ignoreDeletes).map(p => p: InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFilesReaderFactory(required.fieldNames,
      GraftSchemas.readerAdded(Paths.get(path)))
}

/** Commit-log diffing shared by the change feed's two faces: the
  * streaming source above (one commit per micro-batch) and the BATCH
  * `option("readChangeFeed", true).option("startingVersion", v)` read
  * (Delta's `table_changes` shape — all commits of a version range in
  * one scan). Identical taxonomy, identical row-level images, one
  * implementation. */
object GraftChangeFeed {
  /** Partitions for the changes of commits (s, e] — `s` is the last
    * ALREADY-CONSUMED version (-1 = nothing; the oldest retained
    * snapshot then materializes whole as inserts). */
  def partitions(path: String, s: Long, e: Long, cdf: Boolean,
      ignoreChanges: Boolean, ignoreDeletes: Boolean)
      : Seq[GraftFilePartition] = {
    val dir = Paths.get(path)
    val retained = GraftVersions.listVersionNumbers(dir).toSet
    if (s >= 0 && !retained.contains(s) && s < e)
      throw new IllegalStateException(
        s"change-feed start at version $s predates the retained history " +
          s"of $path after vacuum (oldest retained: " +
          s"v${retained.toSeq.sorted.headOption.getOrElse(-1L)}); restart " +
          "the stream from scratch to take a fresh initial snapshot")
    // partition builders: `fileRows` reads a file's rows minus a skip
    // mask; `imageRows` reads EXACTLY the named positions (CDF images).
    // Both carry the file's row lineage so change rows on a tracked
    // table are id-addressable — a delete image names the exact row id
    // it retires.
    def flatLineage(en: GraftVersions.FileEntry): Array[Long] =
      en.lineage.flatMap(t => Seq(t._1, t._2, t._3)).toArray
    def fileRows(v: Long, label: String, en: GraftVersions.FileEntry)
        : GraftFilePartition =
      GraftFilePartition(dir.resolve(en.name).toString,
        en.dv.map(_.positions).getOrElse(Array.empty),
        changeType = if (cdf) label else null, commitVersion = v,
        lineage = flatLineage(en),
        eqSkip = en.eq.map(_.positions).getOrElse(Array.empty))
    def imageRows(v: Long, label: String, en: GraftVersions.FileEntry,
        positions: Array[Long]): GraftFilePartition =
      GraftFilePartition(dir.resolve(en.name).toString, positions.sorted,
        changeType = label, commitVersion = v, emitOnlyPositions = true,
        lineage = flatLineage(en))
    // equality-delete images: rows matching the commit's NEW values
    // that were live in the BASE entry (base dv + base eq skip)
    def imageEqRows(v: Long, label: String,
        base: GraftVersions.FileEntry, newValues: Array[Long])
        : GraftFilePartition =
      GraftFilePartition(dir.resolve(base.name).toString,
        base.dv.map(_.positions).getOrElse(Array.empty),
        changeType = label, commitVersion = v,
        lineage = flatLineage(base),
        eqSkip = base.eq.map(_.positions).getOrElse(Array.empty),
        emitEqValues = newValues.sorted)

    // Retention holes mid-range are NOT skippable: tag-pinning vacuum /
    // expire_snapshots can retain a non-contiguous set (e.g. [1, 4]),
    // and a consumer crossing the hole would both lose the expired
    // commit's changes and (if the next commit's v-1 base is also gone)
    // mis-read the full snapshot as fresh inserts at the wrong
    // commit_version. Any missing version in the requested range — or a
    // missing v-1 base anywhere but the fresh-stream entry point — fails
    // with the same restart-from-scratch error as an expired start.
    def expiredFail(v: Long): Nothing = throw new IllegalStateException(
      s"change-feed range ($s, $e] of $path crosses version $v whose " +
        "commit or base snapshot is no longer retained after vacuum/" +
        "expire_snapshots (an expired commit's changes are " +
        "unrecoverable); restart the stream from scratch to take a " +
        "fresh initial snapshot")
    // Fresh stream (s < 0): the initial snapshot materializes at the
    // OLDEST retained version — versions below it are subsumed by that
    // snapshot, so skipping them is correct, not a hole.
    val startAt: Long =
      if (s >= 0) s + 1
      else if (retained.isEmpty) e + 1 // unversioned/empty: nothing to emit
      else math.max(0L, retained.min)
    val parts: Seq[GraftFilePartition] =
      (startAt to e).flatMap { v =>
        if (!retained.contains(v)) expiredFail(v)
        val info = GraftVersions.manifest(dir, v)
        val base: Option[GraftVersions.VersionInfo] =
          if (retained.contains(v - 1))
            Some(GraftVersions.manifest(dir, v - 1))
          else if (v == startAt && s < 0)
            None // fresh stream's initial batch: the full snapshot
          else if (v == 0)
            None // v0 has no base by construction
          else expiredFail(v)
        base match {
          // dataChange=false commits (compaction) rearranged files
          // without changing rows: nothing to emit, nothing to reject.
          // A fresh stream's initial snapshot (base=None) still
          // materializes even if the latest commit was a compaction.
          case Some(_) if !info.dataChange => Nil
          case Some(b) =>
            val bf = b.files.toSet
            // Commit taxonomy along two independent axes — does it ADD
            // files (new rows the feed could emit) and does it REMOVE
            // rows (files dropped from the snapshot, or deletion-vector
            // growth on retained files)? Delta's contract, which this
            // mirrors exactly:
            //  - append        (adds, removes nothing)  → emit, always;
            //  - delete        (removes, adds NOTHING)  → nothing to
            //    emit; `ignoreDeletes` opts into skipping it (that is
            //    precisely what the option exists for — metadata
            //    deletes, fully-masked-file drops, MOR mask-only
            //    deletes all land here);
            //  - rewrite/update (adds AND removes)      → the added
            //    files carry rows that REPLACE removed ones; emitting
            //    them as plain appends duplicates downstream state, so
            //    this demands `ignoreChanges` — `ignoreDeletes` alone
            //    must NOT admit it (a MOR UPDATE grows DVs on retained
            //    base files and adds replacement files: under the old
            //    subset test it looked like "just deletes").
            // CDF mode upgrades the two MOR shapes to row-level images
            // instead of refusing: the newly-masked positions ARE the
            // delete/update preimages (read back out of the immutable
            // base files), the added files are the postimages.
            val addedEntries = info.entries.filterNot(en => bf.contains(en.name))
            val removedEntries =
              b.entries.filterNot(en => info.files.toSet.contains(en.name))
            val baseByName = b.entries.map(e2 => e2.name -> e2).toMap
            // (retained file, its newly-masked positions)
            val grown = info.entries
              .filter(en => bf.contains(en.name))
              .map { en =>
                val before = baseByName.get(en.name).flatMap(_.dv)
                  .map(_.positions.toSet).getOrElse(Set.empty[Long])
                en -> en.dv.map(_.positions.filterNot(before))
                  .getOrElse(Array.empty[Long])
              }
              .filter(_._2.nonEmpty)
            // equality-delete growth on retained files: (BASE entry,
            // the values this commit newly attached)
            val eqGrown = info.entries
              .filter(en => bf.contains(en.name))
              .flatMap { en =>
                baseByName.get(en.name).map { be =>
                  val before = be.eq.map(_.positions.toSet)
                    .getOrElse(Set.empty[Long])
                  be -> en.eq.map(_.positions.filterNot(before))
                    .getOrElse(Array.empty[Long])
                }
              }
              .filter(_._2.nonEmpty)
            val removesRows = removedEntries.nonEmpty || grown.nonEmpty ||
              eqGrown.nonEmpty
            if (cdf) {
              val isDelete =
                info.op == "delete" || info.op == "delete-metadata" ||
                  info.op == "delete-equality"
              if (!removesRows)
                addedEntries.map(fileRows(v, "insert", _))
              else if (isDelete && addedEntries.isEmpty)
                // mask growth → exactly the deleted rows; value-mask
                // growth → the base-live rows matching the new values;
                // dropped files (metadata delete, fully-masked drop) →
                // their base-live rows (the base entry's masks skip
                // already-dead rows)
                grown.map { case (en, ps) =>
                  imageRows(v, "delete", en, ps)
                } ++ eqGrown.map { case (be, vals) =>
                  imageEqRows(v, "delete", be, vals)
                } ++ removedEntries.map(fileRows(v, "delete", _))
              else if (info.op == "update" && (grown.nonEmpty ||
                  GraftTableMeta.read(dir).get("update.mode")
                    .exists(_.equalsIgnoreCase("merge-on-read"))))
                // MOR update: partial files' newly-masked positions are
                // exact preimages; a file the commit FULLY masked drops
                // from the snapshot — its preimages are its base-live
                // rows (the base entry's mask skips already-dead ones).
                // The grown-or-mode test matters: a tiny update can
                // fully mask every file it touches, leaving no DV
                // growth to witness the mechanism.
                grown.map { case (en, ps) =>
                  imageRows(v, "update_preimage", en, ps)
                } ++ removedEntries.map(fileRows(v, "update_preimage", _)) ++
                  addedEntries.map(fileRows(v, "update_postimage", _))
              else throw new IllegalStateException(
                s"commit v$v of $path (${info.op}) is file-granular: " +
                  "the change feed cannot derive row-level images from " +
                  "whole-file rewrites. Use merge-on-read delete/update " +
                  "modes for CDF-exact commits, or time-travel the " +
                  "snapshots")
            } else {
              if (removesRows && addedEntries.nonEmpty && !ignoreChanges)
                throw new IllegalStateException(
                  s"commit v$v of $path is a ${info.op} rewrite/update: its " +
                    "new files replace rows it removed, so re-emitting them " +
                    "as appends would duplicate downstream state. Set " +
                    "option(\"ignoreChanges\", true) to stream them anyway " +
                    "(consumers must dedupe by key), or time-travel the exact " +
                    "snapshots instead")
              if (removesRows && addedEntries.isEmpty &&
                  !ignoreDeletes && !ignoreChanges)
                throw new IllegalStateException(
                  s"commit v$v of $path deleted rows (${info.op}): this " +
                    "append-only change feed cannot represent row removal. " +
                    "Set option(\"ignoreDeletes\", true) to skip delete " +
                    "commits (downstream keeps the deleted rows), or " +
                    "time-travel the exact snapshots")
              addedEntries.map(fileRows(v, null, _))
            }
          case None =>
            // fresh stream's initial batch: the full snapshot as inserts
            info.entries.map(fileRows(v, "insert", _))
        }
      }
    parts
  }
}

case class GraftFilePartition(file: String,
    // deletion-vector positions for this file (empty = no mask): the
    // snapshot's mask rides into the executor with the split, so the
    // reader needs no manifest access
    dvPositions: Array[Long] = Array.empty,
    // change-feed labeling: the row-level CDC type of every row this
    // partition emits (null outside CDF mode) and the commit it
    // belongs to — surfaced via the _change_type/_commit_version
    // columns
    changeType: String = null,
    commitVersion: Long = -1L,
    // false: dvPositions are a SKIP mask (read the file's live rows);
    // true: dvPositions are the EXACT positions to emit — how delete
    // preimages and update preimages are read back out of immutable
    // base files (the positions a MOR commit newly masked)
    emitOnlyPositions: Boolean = false,
    // row-lineage segments of this file, flattened as (base, physRows,
    // sinceCommit) triples — the manifest fact the _row_id /
    // _row_commit_version metadata columns are computed from. Empty =
    // untracked file (both columns read NULL).
    lineage: Array[Long] = Array.empty,
    // EQUALITY-DELETE values (sorted doc_ids): rows matching one are
    // dropped as the file streams — the value-mask complement of the
    // positional dvPositions skip
    eqSkip: Array[Long] = Array.empty,
    // CDF image mode by VALUES: when non-empty, emit EXACTLY the rows
    // whose doc_id is in this set and that were live BEFORE the commit
    // (dvPositions/eqSkip then carry the BASE masks to skip) — how an
    // equality-delete commit's delete images are read back
    emitEqValues: Array[Long] = Array.empty) extends InputPartition

/** All live files of one bucket class of a bucketed table (possibly
  * none after pruning), carrying the class id as the partition key the
  * storage-partitioned join aligns on. */
case class GraftBucketFilesPartition(bucket: Int,
    // per file: (path, dv skip mask, flattened lineage triples,
    // equality-delete value skips)
    files: Seq[(String, Array[Long], Array[Long], Array[Long])])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

class GraftFilesReaderFactory(cols: Array[String],
    // schema-evolution tail, already resolved to the scan's version
    // pin: (display name, type, TSV position, default). Positions come
    // from the permanent registry index — visibility and renames prune
    // and relabel, position math never moves
    added: Seq[(String, String, Int, Option[String])] = Nil)
    extends PartitionReaderFactory {
  // display name -> (tsv position, type, exists-default) — the default
  // pre-converted to its typed Catalyst value so the row path does no
  // per-row parsing
  private val addedAt: Map[String, (Int, String, Any)] =
    added.map { case (n, t, at, d) =>
      n -> (at, t, d.map {
        case v if t == "long" => v.toLong
        case v if t == "int" => v.toInt
        case v => UTF8String.fromString(v)
      }.orNull)
    }.toMap
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val files: Seq[(String, Array[Long], Array[Long], Array[Long])] =
      p match {
        case fp: GraftFilePartition =>
          Seq((fp.file, fp.dvPositions, fp.lineage, fp.eqSkip))
        case bp: GraftBucketFilesPartition => bp.files
      }
    val (changeTypeU, commitVersion, emitOnly, emitEq) = p match {
      case fp: GraftFilePartition =>
        (Option(fp.changeType).map(UTF8String.fromString).orNull,
          fp.commitVersion, fp.emitOnlyPositions, fp.emitEqValues)
      case _ => (null: UTF8String, -1L, false, Array.empty[Long])
    }
    new PartitionReader[InternalRow] {
      private val fileIt = files.iterator
      private var lines: java.util.Iterator[String] = _
      private var curFileName: String = _
      private var cur: Array[String] = _
      // physical position of `cur` within the CURRENT file (0-based).
      // The mask and the cursor advance together — positions are
      // sorted, the lines stream in order, so skipping is a two-pointer
      // walk, not a per-row set probe.
      private var pos = -1L
      private var dv: Array[Long] = Array.empty
      private var dvIdx = 0
      // equality-delete value mask of the CURRENT file (sorted doc_ids)
      private var eqv: Array[Long] = Array.empty
      private def eqHit(vals: Array[Long], line: String): Boolean = {
        // value masks need the row's doc_id regardless of the read
        // schema; the TSV's first cell is doc_id by writer contract
        val tab = line.indexOf('\t')
        val id = (if (tab < 0) line else line.substring(0, tab)).toLong
        java.util.Arrays.binarySearch(vals, id) >= 0
      }
      // lineage cursor: flattened (base, rows, since) triples of the
      // CURRENT file plus the running segment index and its starting
      // physical position — positions stream in order, so the lookup
      // is a monotone advance, never a per-row search
      private var lin: Array[Long] = Array.empty
      private var linIdx = 0
      private var linStart = 0L
      private def linAdvance(): Unit =
        while (linIdx * 3 < lin.length &&
            pos >= linStart + lin(linIdx * 3 + 1)) {
          linStart += lin(linIdx * 3 + 1); linIdx += 1
        }
      private def rowId: Any = {
        linAdvance()
        if (linIdx * 3 >= lin.length || lin(linIdx * 3) < 0) null
        else java.lang.Long.valueOf(lin(linIdx * 3) + (pos - linStart))
      }
      private def rowCommit: Any = {
        linAdvance()
        if (linIdx * 3 >= lin.length || lin(linIdx * 3 + 2) < 0) null
        else java.lang.Long.valueOf(lin(linIdx * 3 + 2))
      }
      override def next(): Boolean = {
        while (true) {
          if (lines == null || !lines.hasNext) {
            if (!fileIt.hasNext) return false
            val (f, d, lg, ev) = fileIt.next()
            lines = Files.readAllLines(Paths.get(f),
              StandardCharsets.UTF_8).iterator()
            curFileName = Paths.get(f).getFileName.toString
            dv = d; dvIdx = 0; pos = -1L
            eqv = ev
            lin = lg; linIdx = 0; linStart = 0L
          }
          while (lines.hasNext) {
            val line = lines.next(); pos += 1
            if (emitEq.nonEmpty) {
              // CDF image mode by VALUES (equality-delete commit): emit
              // exactly the rows the commit newly deleted — matching a
              // new value AND live before the commit (base dv/eq skip)
              val baseDead = {
                if (dvIdx < dv.length && dv(dvIdx) == pos) {
                  dvIdx += 1; true
                } else eqv.nonEmpty && eqHit(eqv, line)
              }
              if (!baseDead && eqHit(emitEq, line)) {
                cur = line.split("\t", -1); return true
              }
            } else if (emitOnly) {
              // CDF image mode: dv holds the EXACT positions to emit
              // (sorted) — everything else streams past
              if (dvIdx < dv.length && dv(dvIdx) == pos) {
                dvIdx += 1; cur = line.split("\t", -1); return true
              }
            } else if (dvIdx < dv.length && dv(dvIdx) == pos) dvIdx += 1 // masked
            else if (eqv.nonEmpty && eqHit(eqv, line)) () // value-masked
            else { cur = line.split("\t", -1); return true }
          }
        }
        false
      }
      override def get(): InternalRow =
        // canonical TSV order: doc_id, title, fp, n_words (the writer's
        // order, independent of the query's write-projection order);
        // _file is the metadata column (row provenance + the handle
        // row-level operations group by); _pos is the physical row
        // ordinal — together they are the stable row id deletion
        // vectors address (the file is never edited in place, so
        // neither component ever shifts)
        InternalRow.fromSeq(cols.toSeq.map {
          case "doc_id" => cur(0).toLong
          case "title" => UTF8String.fromString(cur(1))
          case "fp" => cur(2).toLong
          case "n_words" => cur(3).toInt
          case "_file" => UTF8String.fromString(curFileName)
          case "_pos" => pos
          case "_change_type" => changeTypeU
          case "_commit_version" => commitVersion
          case "_row_id" => rowId
          case "_row_commit_version" => rowCommit
          case evolved =>
            // ADD COLUMN tail: a file written before the column existed
            // is SHORTER than the current schema — the missing cell IS
            // the backfill (the column's exists-default if one was
            // declared, NULL otherwise; no rewrite ever happens). A
            // present cell holding the `\N` sentinel is an
            // explicitly-written NULL — post-ADD writers always pad to
            // full registry width, so a declared default can never
            // shadow a deliberate NULL.
            val (at, tpe, dflt) = addedAt(evolved)
            if (at >= cur.length) dflt
            else if (cur(at) == "\\N") null
            else tpe match {
              case "long" => cur(at).toLong
              case "int" => cur(at).toInt
              case _ => UTF8String.fromString(cur(at))
            }
        })
      override def close(): Unit = ()
    }
  }
}

// ---------------------------------------------------------------------------
// Write path: WriteBuilder -> BatchWrite -> DataWriter with the classic
// staged-file commit protocol —
//   task attempt  : writes to _staging/<queryId>/part-<pid>.tsv.attempt-<tid>
//   task commit   : atomic rename to _staging/<queryId>/part-<pid>.tsv
//                   (REPLACE_EXISTING — a retried or speculative attempt of
//                   the same partition collapses onto one file, and partition
//                   content is deterministic, so task commit is idempotent)
//   driver commit : clears old part files when truncating, then atomically
//                   moves every staged file into the table root and stamps
//                   _SUCCESS; a failed job leaves the root untouched
//   abort         : deletes the staging directory only
// This is FileOutputCommitter-style v1 semantics on a plain directory — the
// shape a 100 TB sink needs (commit work proportional to #files, no data
// rewrite, safe re-runs), minus only a catalog transaction log.
// ---------------------------------------------------------------------------

class GraftDocsWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  /** `write.distribution = 'hash'` on a bucketed table: DEMAND the
    * engine cluster the incoming rows by the declared bucket function
    * and sort them by doc_id within tasks, BEFORE any writer runs —
    * Iceberg's `write.distribution-mode = hash`. Each bucket's rows
    * then land in exactly one task, so a write produces ONE file per
    * bucket (sorted, tight min/max envelope) no matter how the input
    * was partitioned; without the demand a W-task write fans up to
    * W×buckets small files and immediately leans on auto-compaction.
    * The clustering expression is the same V2 `bucket` function the
    * scan's KeyGroupedPartitioning reports ([[GraftBucketFunction]] —
    * floored mod), resolved through the catalog, so read and write
    * layouts agree by construction. Rewrites are exempt: OPTIMIZE
    * plans its own layout (z-order fan / concat bins). */
  private def clusteredBuckets: Option[Int] = {
    val dir = Paths.get(path)
    if (Option(info.options.get("graftRewrite")).contains("true")) None
    else GraftTableMeta.read(dir).get("write.distribution") match {
      case Some("hash") => GraftTableMeta.bucketLayout(dir).map(_._2)
      case _ => None
    }
  }

  override def build(): Write = clusteredBuckets match {
    case Some(n) =>
      new GraftDocsWrite(path, info, doTruncate)
        with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          org.apache.spark.sql.connector.distributions.Distributions
            .clustered(Array(
              org.apache.spark.sql.connector.expressions.Expressions
                .bucket(n, "doc_id")))
        // one task per bucket-hash slot: bounds files at exactly the
        // bucket count and pins AQE coalescing out of the exchange
        override def requiredNumPartitions(): Int = n
        override def requiredOrdering(): Array[
            org.apache.spark.sql.connector.expressions.SortOrder] =
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .sort(
              org.apache.spark.sql.connector.expressions.Expressions
                .column("doc_id"),
              org.apache.spark.sql.connector.expressions.SortDirection
                .ASCENDING))
      }
    case None => new GraftDocsWrite(path, info, doTruncate)
  }
}

class GraftDocsWrite(path: String, info: LogicalWriteInfo,
    doTruncate: Boolean) extends Write {
    override def toBatch: BatchWrite =
      new GraftDocsBatchWrite(path, info.queryId(), info.schema(), doTruncate,
        // graftRewrite: the write CARRIES existing rows (OPTIMIZE /
        // eq-mask materialization landing a scratch copy) — generated
        // cells recompute and identity cells pass through instead of
        // enforcing/allocating, exactly like the MOR row-level writers.
        // Without it a rewrite of a GENERATED ALWAYS AS IDENTITY table
        // would trip the explicit-values guard on its own rows.
        opName =
          if (Option(info.options.get("graftRewrite")).contains("true"))
            "rewrite"
          else if (doTruncate) "overwrite" else "append",
        zfan = Option(info.options.get("zorderFanout"))
          .map(GraftVersions.GraftZOrderFan.parse))
    override def toStreaming: StreamingWrite = {
      if (!GraftVersions.isVersioned(Paths.get(path)))
        throw new UnsupportedOperationException(
          s"streaming writes to $path need a versioned table: the " +
            "_versions commit log is the sink's exactly-once txn ledger " +
            "(enable versioning with TBLPROPERTIES('versioned'='true') " +
            "or GraftVersions.enable)")
      // txnAppId: the idempotence key recorded per epoch commit. The
      // default is Spark's streaming queryId, which is persisted in the
      // checkpoint and stable across restarts — exactly the appId
      // contract Delta's idempotent writes use; override it to share
      // one ledger across distinct queries (e.g. blue/green restarts
      // with fresh checkpoints replaying the same upstream).
      val appId = Option(info.options.get("txnAppId")).getOrElse(info.queryId())
      new GraftDocsStreamingWrite(path, info.schema(), doTruncate, appId)
    }
}

/** Streaming personality of the warehouse write path — exactly-once by
  * construction on a VERSIONED table:
  *
  *  - each micro-batch stages its part files under an (appId, epoch)
  *    staging dir, then commits them as one manifest advance carrying
  *    `txn=appId:epoch`;
  *  - a REPLAYED epoch (driver died after the sink committed but
  *    before the engine advanced its offset log — the at-least-once
  *    gap every streaming sink must close) is detected in
  *    [[GraftVersions.commitTxn]] by `epoch <= last recorded epoch`
  *    and skipped atomically under the table lock: rows land exactly
  *    once no matter how many times the batch is retried;
  *  - Append mode advances the snapshot additively; Complete mode
  *    (`truncate`) replaces the live file set each epoch — both are
  *    ordinary manifest commits, so time travel, the change feed, and
  *    vacuum compose with streamed-in data unchanged.
  *
  * Commit work is proportional to the files of one micro-batch —
  * the property that lets a 100 TB table absorb a continuous stream
  * without ever rewriting history. */
class GraftDocsStreamingWrite(path: String, writeSchema: StructType,
    truncate: Boolean, appId: String) extends StreamingWrite {
  private def root = Paths.get(path)
  private val appHex = GraftDocsStreamingWrite.hex(appId)
  private def staging(epochId: Long) =
    root.resolve("_staging").resolve(s"stream-$appHex-$epochId")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val idx = Array("doc_id", "title", "fp", "n_words")
      .map(writeSchema.fieldIndex)
    new GraftDocsStreamingWriterFactory(
      root.resolve("_staging").toString, appId, idx,
      GraftWriteGuards.forTable(root, writeSchema,
        numPartitions = Option(info).map(_.numPartitions()).getOrElse(1)),
      GraftSchemas.writerAdded(root, writeSchema))
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val stg = staging(epochId)
    // Replay fast-path BEFORE any file move: a replayed epoch must not
    // touch the already-committed files (a non-deterministic upstream
    // could have produced different bytes this time — overwriting
    // would silently change a committed snapshot's content).
    if (GraftVersions.lastTxnEpoch(root, appId).exists(_ >= epochId)) {
      cleanup(stg)
      return
    }
    // Files first, manifest second (the batch path's order): the
    // epoch-suffixed names are referenced by no manifest yet, so a
    // reader can never plan a file that isn't fully in place.
    val entries = messages.flatMap(GraftDocsCommits.land(stg, root, _))
    // commitTxn re-checks the ledger under the table lock — if a racing
    // replay won in between, this returns None and the just-moved files
    // stay unreferenced (vacuum reclaims them); rows still land once.
    val committed = GraftVersions.commitTxn(root,
      op = if (truncate) "streaming-complete" else "streaming-append",
      removed = if (truncate) None else Some(Set.empty),
      added = entries.toSeq, appId = appId, epoch = epochId).isDefined
    cleanup(stg)
    if (committed) Files.write(root.resolve("_SUCCESS"), Array.empty[Byte])
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = cleanup(staging(epochId))

  private def cleanup(stg: Path): Unit = {
    try org.apache.commons.io.FileUtils.deleteDirectory(stg.toFile)
    catch { case _: java.io.IOException => () }
    try Files.deleteIfExists(root.resolve("_staging")) catch {
      case _: java.nio.file.DirectoryNotEmptyException => ()
    }
  }
}

object GraftDocsStreamingWrite {
  def hex(s: String): String = s.toLowerCase.replaceAll("[^0-9a-f]", "")
}

/** Stages each epoch's files under `_staging/stream-<appHex>-<epoch>`
  * with epoch-unique final names (`part-NNNNN-<appHex><epochHex>.tsv`)
  * so streamed commits never collide with each other or with batch
  * writes across the table's whole history. Delegates row encoding and
  * per-file stats to the batch [[GraftDocsWriterFactory]] writer. */
class GraftDocsStreamingWriterFactory(stagingBase: String, appId: String,
    idx: Array[Int],
    guards: GraftWriteGuards.Guards = GraftWriteGuards.none,
    added: Seq[(String, String, Int)] = Nil)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val appHex = GraftDocsStreamingWrite.hex(appId)
    val dir = Paths.get(stagingBase).resolve(s"stream-$appHex-$epochId")
    Files.createDirectories(dir)
    val suffix = s"-$appHex${java.lang.Long.toHexString(epochId)}"
    new GraftDocsWriterFactory(dir.toString, idx, suffix, guards, added)
      .createWriter(partitionId, taskId)
  }
}

class GraftDocsBatchWrite(path: String, queryId: String, writeSchema: StructType,
    truncate: Boolean,
    // row-level rewrites: which part files the replacement covers —
    // evaluated at COMMIT time (after the scan's runtime group filter has
    // fired); None = the whole table (plain truncate semantics)
    replaceScope: () => Option[Set[String]] = () => None,
    // suffix for staged file names so replacement parts never collide
    // with retained ones ("" for plain writes)
    fileSuffix: String = "",
    // operation label recorded in the version log of a versioned table
    opName: String = "write",
    // snapshot the planning scan resolved (row-level rewrites):
    // the commit's optimistic-concurrency readVersion; () => None for
    // plain appends/overwrites, which carry no stale-content risk
    readVersion: () => Option[Long] = () => None,
    // Z-ORDER compaction fan: split each task's rows into per-file-id
    // staged files by the shared file-assignment function (the write
    // option the compact rewrite sets — see GraftVersions.compact)
    zfan: Option[GraftVersions.GraftZOrderFan] = None) extends BatchWrite {
  private def root = Paths.get(path)
  private def staging = root.resolve("_staging").resolve(queryId)
  private def versioned = GraftVersions.isVersioned(root)

  // On a VERSIONED table every commit's files must be unique forever —
  // an unsuffixed second append would land a second part-00000.tsv on
  // top of the one an older snapshot still references. The queryId (a
  // UUID) as hex suffix makes names collision-free across all commits;
  // unversioned tables keep their original plain names.
  private def effSuffix: String =
    if (fileSuffix.nonEmpty || !versioned) fileSuffix
    else "-" + queryId.toLowerCase.replaceAll("[^0-9a-f]", "")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    // field positions of the canonical TSV columns within the incoming
    // write schema (Spark has already validated it against the table)
    val idx = Array("doc_id", "title", "fp", "n_words")
      .map(writeSchema.fieldIndex)
    new GraftDocsWriterFactory(staging.toString, idx, effSuffix,
      GraftWriteGuards.forTable(root, writeSchema,
        // specs drive the writer lifecycle with a null info
        numPartitions = Option(info).map(_.numPartitions()).getOrElse(1),
        // row-level rewrites (update/merge/delete, compaction) carry
        // existing rows: generated cells recompute, identity cells
        // pass through; plain writes enforce/allocate instead
        insertOp = Set("write", "append", "overwrite")(opName)),
      GraftSchemas.writerAdded(root, writeSchema), zfan)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    Files.createDirectories(root)
    // A versioned table never deletes data at commit: superseded files
    // stay for their snapshots (vacuum reclaims them); the manifest
    // advance below is what removes them from the LIVE view.
    if (truncate && !versioned) {
      val scope = replaceScope()
      val s = Files.list(root)
      try {
        val it = s.iterator()
        while (it.hasNext) {
          val f = it.next()
          val n = f.getFileName.toString
          val inScope = scope match {
            case Some(files) => files.contains(n)
            case None => n.matches(GraftFiles.partFileRegex)
          }
          if (inScope || n == "_SUCCESS") Files.deleteIfExists(f)
        }
      } finally s.close()
    }
    val added = messages.flatMap(GraftDocsCommits.land(staging, root, _))
    GraftWriteGuards.catchUpIdentityHwm(root, added.toSeq)
    if (versioned) {
      val removed =
        if (!truncate) Some(Set.empty[String]) // append: remove nothing
        else replaceScope() match {
          // COW rewrite: its file scope — resolved from `_file`
          // BASENAMES to the snapshot's entry names (a branch
          // references fork files as `../../name`; dropping the raw
          // basename from such a manifest would silently no-op)
          case Some(scope) =>
            val live = GraftVersions.latest(root)
              .map(_.entries.map(_.name)).getOrElse(Nil)
            Some(live.filter(n => scope(GraftFiles.baseName(n))).toSet)
          case None => None               // overwrite: remove-all
        }
      GraftVersions.advance(root, opName, removed, added.toSeq,
        readVersion = readVersion())
    }
    Files.write(root.resolve("_SUCCESS"), Array.empty[Byte])
    cleanupStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging()

  private def cleanupStaging(): Unit = {
    try org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
    catch { case _: java.io.IOException => () }
    // remove _staging itself when this was the last writer
    try Files.deleteIfExists(root.resolve("_staging")) catch {
      case _: java.nio.file.DirectoryNotEmptyException => ()
    }
  }
}

/** Task-commit message: the staged file plus its observed per-column
  * min/max for every numeric column — the per-file statistics a
  * versioned commit records in its manifest for scan-time file
  * skipping — and the file's Bloom filter when the table enables one.
  * An empty file reports (0, -1) (min > max) per column: prunable by
  * every predicate. */
case class GraftDocsCommitMessage(fileName: String,
    stats: Map[String, (Long, Long)] = Map.empty,
    bloom: Option[GraftBloom] = None,
    // physical row/byte counts for the manifest (scan statistics and
    // the fully-deleted-file drop in the MOR delete path)
    rows: Long = 0L, bytes: Long = 0L,
    // per-column distinct sketches (ndv.columns tables)
    ndv: Option[GraftNdv] = None,
    // rows arrived non-decreasing by doc_id (observed per row)
    sorted: Boolean = false) extends WriterCommitMessage

/** Driver-side preparation of the write-time quality guards persisted
  * in `_table.properties` ([[GraftTableMeta]]):
  *
  *  - CHECK constraints compile through the full analyzer (an empty
  *    DataFrame of the table schema + `filter(expr(...))`) so implicit
  *    casts and function resolution behave exactly as in a query, then
  *    bind to writeSchema ordinals — the bound Catalyst expressions
  *    serialize to the executors and evaluate per row with no codegen
  *    dependency. SQL CHECK semantics: a row fails only when the
  *    condition is definitively FALSE (NULL passes).
  *  - Bloom config is just (columns, bits) — the writer builds one
  *    filter per file with `col:value` keys.
  */
object GraftWriteGuards {
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, Expression}

  /** One generated column's write plan: the expression (bound to the
    * write schema's ordinals), where the incoming write supplies the
    * column (-1 = omitted), and whether an explicit value is ENFORCED
    * against the expression (insert ops) or recomputed (row-level
    * rewrites, where a SET on a base input legitimately changes the
    * derived value — Delta's update semantics). The written cell is
    * ALWAYS the computed value. */
  final case class GenPlan(name: String, tpe: String, ordinal: Int,
      expr: Expression, enforce: Boolean) extends Serializable

  /** One identity column's write plan for THIS write: a block of
    * values [base, base + numPartitions*stride*step) was reserved from
    * the table's high-water mark under the commit lock at write
    * planning, so concurrent writers draw disjoint ranges; task t
    * allocates base + (t*stride + j)*step for its j-th computed row
    * (loud overflow past stride rows — 2^33 rows per task). Explicit
    * values: passed through on row-level rewrites (an UPDATE must
    * preserve ids), accepted on inserts only when the column is
    * GENERATED BY DEFAULT (`allowExplicit`). */
  final case class IdPlan(name: String, tpe: String, ordinal: Int,
      base: Long, step: Long, stride: Long, allowExplicit: Boolean,
      passThrough: Boolean) extends Serializable

  final case class Guards(constraints: Seq[(String, Expression)],
      bloomCols: Seq[String], bloomBits: Int,
      // declared bucket layout (doc_id mod n): the writer fans rows
      // into per-bucket files so the scan can report the layout
      bucketN: Option[Int] = None,
      generated: Seq[GenPlan] = Nil,
      identity: Seq[IdPlan] = Nil,
      // PARTITIONED BY (<generated col>): fan each task's rows into
      // one file per distinct computed value (min=max stats make the
      // manifest prune them — partition pruning at manifest cost)
      valueFan: Option[String] = None,
      // ndv.columns: per-file distinct sketches for CBO column stats
      ndvCols: Seq[String] = Nil) extends Serializable
  val none: Guards = Guards(Nil, Nil, 0)

  /** Identity block size per (write, task): generous enough that no
    * real task exhausts it, small enough that the hwm survives ~2^25
    * writes before Long exhaustion. */
  val IdentityStride: Long = 1L << 33

  def forTable(root: Path, writeSchema: StructType,
      numPartitions: Int = 1, insertOp: Boolean = true): Guards = {
    val cs = GraftTableMeta.checkConstraints(root)
    val compiled = if (cs.isEmpty) Nil else {
      val spark = org.apache.spark.sql.SparkSession.active
      cs.map { case (name, sqlText) =>
        val analyzed = spark
          .createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            GraftSchemas.tableSchema(root)) // evolved shape: constraints may name added columns
          .filter(org.apache.spark.sql.functions.expr(sqlText))
          .queryExecution.analyzed
        val cond = analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }.getOrElse(throw new IllegalArgumentException(
          s"CHECK constraint '$name' ($sqlText) did not analyze to a filter"))
        // RuntimeReplaceable nodes (BETWEEN, some string/date sugar)
        // only exist pre-optimization — swap in their replacements
        // bottom-up, then INLINE the `With` common-subexpression form
        // those replacements use (normally the optimizer's
        // RewriteWithExpression does this); evaluating a shared def
        // more than once is fine here, constraints are tiny
        val runnable = cond.transformUp {
          case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
            r.replacement
        }.transformUp {
          case w: org.apache.spark.sql.catalyst.expressions.With =>
            val defs = w.defs.map(d => d.id -> d.child).toMap
            w.child.transformUp {
              case ref: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
                defs(ref.id)
            }
        }
        val bound = runnable.transform {
          case a: AttributeReference =>
            BoundReference(writeSchema.fieldIndex(a.name), a.dataType,
              a.nullable)
        }
        name -> bound
      }
    }
    // generated / identity columns (CREATE-time registry): compile the
    // generation expressions exactly like constraints and bind them to
    // the write schema; reserve identity blocks under the commit lock.
    // A pure-DELETE write (empty schema) writes no rows: skip both.
    val genSpecs = GraftTableMeta.generatedExprs(root)
    val idSpecs = GraftTableMeta.identitySpecs(root)
    val (gens, ids) =
      if (writeSchema.isEmpty || (genSpecs.isEmpty && idSpecs.isEmpty))
        (Nil, Nil)
      else {
        val eff = GraftSchemas.effectiveAdded(root)
        def ordinalOf(name: String): Int =
          if (writeSchema.fieldNames.contains(name))
            writeSchema.fieldIndex(name)
          else -1
        val g = eff.filter(_.visible).flatMap { c =>
          genSpecs.get(c.idx).map { sql =>
            GenPlan(c.name, c.tpe, ordinalOf(c.name),
              compileExpr(root, sql, writeSchema,
                GraftSchemas.AddedColumn(c.name, c.tpe, 0L).dataType),
              enforce = insertOp)
          }
        }
        val i = eff.filter(_.visible).flatMap { c =>
          idSpecs.get(c.idx).map { case (start, step, allowExplicit) =>
            val block = IdentityStride * math.max(numPartitions, 1)
            val base = reserveIdentityBlock(root, c.idx, start, step, block)
            IdPlan(c.name, c.tpe, ordinalOf(c.name), base, step,
              IdentityStride, allowExplicit, passThrough = !insertOp)
          }
        }
        (g, i)
      }
    Guards(compiled, GraftTableMeta.bloomColumns(root),
      GraftTableMeta.bloomBits(root),
      GraftTableMeta.bucketLayout(root).map(_._2),
      generated = gens, identity = ids,
      valueFan = GraftTableMeta.read(root).get("layout.values"),
      ndvCols = GraftTableMeta.ndvColumns(root))
  }

  // -------------------------------------------------------------------
  // Identity block claims: CROSS-PROCESS-safe allocation. The ground
  // truth is a set of per-block claim files under `<table>/_identity`
  // (name `c<idx>-<base>`, content the exclusive end value), each
  // created with the same hard-link create-new primitive the manifest
  // commit claim uses — two drivers that race the same base value get
  // exactly one winner, the loser rescans and claims the next block.
  // The `identity.hwm.<idx>` table property survives as a best-effort
  // HINT only (it seeds the scan on legacy tables and rides clones,
  // which copy properties but not claim files); losing a property
  // update can no longer mint duplicate keys. Claim files are one per
  // write JOB (tiny); vacuum folds old ones, always keeping each
  // column's furthest claim (see GraftVersions.vacuum).
  // -------------------------------------------------------------------

  private[sources] def identityClaimDir(root: Path): Path =
    root.resolve("_identity")

  /** Parse every claim of column `idx`: (base, exclusive end). */
  private[sources] def listIdentityClaims(root: Path, idx: Int)
      : Seq[(Long, Long)] = {
    val dir = identityClaimDir(root)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      val prefix = s"c$idx-"
      s.iterator().asScala.toSeq.flatMap { p =>
        val n = p.getFileName.toString
        if (!n.startsWith(prefix) || n.endsWith(".tmp")) None
        else {
          val base = n.substring(prefix.length).toLong
          val end = new String(Files.readAllBytes(p),
            StandardCharsets.UTF_8).trim.toLong
          Some((base, end))
        }
      }
    } finally s.close()
  }

  /** Atomically create the claim `[base, end)` for column `idx`;
    * false when another writer (any process) already claimed `base`.
    * Content lands via temp-file + hard link, so a visible claim is
    * never torn. */
  private def tryIdentityClaim(root: Path, idx: Int, base: Long,
      end: Long): Boolean = {
    val dir = identityClaimDir(root)
    Files.createDirectories(dir)
    val target = dir.resolve(s"c$idx-$base")
    if (Files.exists(target)) return false
    val tmp = Files.createTempFile(dir, "claim-", ".tmp")
    try {
      Files.write(tmp, end.toString.getBytes(StandardCharsets.UTF_8))
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  /** Reserve `units` identity values for column `idx`: returns the
    * block base; the caller owns `[base, base + units*step)` (in step
    * direction). Safe across drivers in different processes. */
  private[sources] def reserveIdentityBlock(root: Path, idx: Int,
      start: Long, step: Long, units: Long): Long =
    GraftVersions.lockFor(root).synchronized {
      var attempts = 0
      while (attempts < 64) {
        val frontier = identityFrontier(root, idx, start, step)
        val end = frontier + units * step
        if (tryIdentityClaim(root, idx, frontier, end)) {
          GraftTableMeta.setIdentityHwm(root, idx, end) // hint only
          return frontier
        }
        attempts += 1
      }
      throw new IllegalStateException(
        s"identity column #$idx of $root: lost the block claim 64 " +
          "times to concurrent writers; retry the write")
    }

  /** The furthest allocated value frontier: max (step>0) / min (step<0)
    * over the claim ends and the legacy/clone property hint. */
  private def identityFrontier(root: Path, idx: Int, start: Long,
      step: Long): Long = {
    val ends = listIdentityClaims(root, idx).map(_._2) :+
      GraftTableMeta.identityHwm(root, idx).getOrElse(start)
    if (step > 0) ends.max else ends.min
  }

  /** Explicit-identity catch-up at commit (BY DEFAULT columns): claim
    * past any explicitly inserted value so later block reservations
    * can never collide with it. The landed entries' min/max stats
    * carry the per-file extremes; step sign decides which end matters.
    * No-op when nothing exceeded the frontier (in particular, values
    * the writer allocated from its own block never trigger a claim —
    * their block's end is already at or past them). */
  def catchUpIdentityHwm(root: Path,
      added: Seq[GraftVersions.FileEntry]): Unit = {
    val specs = GraftTableMeta.identitySpecs(root)
    if (specs.isEmpty || added.isEmpty) return
    val eff = GraftSchemas.effectiveAdded(root)
    GraftVersions.lockFor(root).synchronized {
      specs.foreach { case (idx, (start, step, _)) =>
        eff.lift(idx).foreach { c =>
          val ext = added.flatMap(_.stats.get(c.name))
            .filter { case (lo, hi) => lo <= hi } // skip empty sentinels
          if (ext.nonEmpty) {
            val cand =
              if (step > 0) ext.map(_._2).max + step
              else ext.map(_._1).min + step
            var attempts = 0
            var done = false
            while (!done && attempts < 64) {
              val frontier = identityFrontier(root, idx, start, step)
              val covered =
                if (step > 0) frontier >= cand else frontier <= cand
              if (covered) done = true
              else if (tryIdentityClaim(root, idx, frontier, cand)) {
                GraftTableMeta.setIdentityHwm(root, idx, cand)
                done = true
              } else attempts += 1
            }
            if (!done) throw new IllegalStateException(
              s"identity column #$idx of $root: explicit-value " +
                "catch-up lost the claim 64 times; retry the write")
          }
        }
      }
    }
  }

  /** Analyze `sql` against the BASE schema (generation expressions may
    * reference base columns only), normalize RuntimeReplaceable/With
    * the same way constraints do, cast to the column type, and bind to
    * `writeSchema` ordinals. */
  private def compileExpr(root: Path, sql: String,
      writeSchema: StructType,
      target: org.apache.spark.sql.types.DataType): Expression = {
    val spark = org.apache.spark.sql.SparkSession.active
    val analyzed = spark
      .createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        GraftDocsSource.schema)
      .select(org.apache.spark.sql.functions.expr(sql).cast(target))
      .queryExecution.analyzed
    val projected = analyzed.collectFirst {
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
        pr.projectList.head
    }.getOrElse(throw new IllegalStateException(
      s"generation expression '$sql' did not analyze to a projection"))
    val child = projected match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
    val runnable = child.transformUp {
      case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
        r.replacement
    }.transformUp {
      case w: org.apache.spark.sql.catalyst.expressions.With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case ref: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
            defs(ref.id)
        }
    }
    runnable.transform {
      case a: AttributeReference =>
        BoundReference(writeSchema.fieldIndex(a.name), a.dataType,
          a.nullable)
    }
  }
}

/** One staged file per (bucket, task) of a BUCKETED table: rows fan
  * out to per-bucket inner writers, created lazily — a task that sees
  * no row of bucket b never creates b's file. The commit message nests
  * the inner messages with their bucket ids so the manifest records
  * every file's bucket. */
case class GraftBucketedCommitMessage(
    parts: Seq[(Int, GraftDocsCommitMessage)]) extends WriterCommitMessage

/** One staged file per Z file id of a Z-ORDER compaction task — like
  * the bucketed fan, but the ids are layout-free (no manifest bucket
  * tag: Z files are a clustering, not a join layout). */
case class GraftFanCommitMessage(
    parts: Seq[GraftDocsCommitMessage]) extends WriterCommitMessage

/** Driver-side landing shared by every commit path (batch, streaming,
  * delta): move a task's staged files into the table root and build
  * their manifest entries (bucket ids from nested bucketed messages). */
object GraftDocsCommits {
  def land(staging: Path, root: Path,
      m: WriterCommitMessage): Seq[GraftVersions.FileEntry] = m match {
    case GraftDocsCommitMessage(name, stats, bloom, rows, bytes, ndv,
        sorted) =>
      Files.move(staging.resolve(name), root.resolve(name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      Seq(GraftVersions.FileEntry(name, stats, bloom, Some(rows),
        Some(bytes), ndv = ndv, sorted = sorted))
    case GraftBucketedCommitMessage(parts) =>
      // bucket ids are only meaningful under the layout the writer
      // fanned with — stamp the file with the CURRENT spec id so an
      // evolved table never confuses old-layout ids with new ones
      val specId = GraftTableMeta.currentSpecId(root)
      parts.flatMap { case (b, msg) =>
        land(staging, root, msg).map(_.copy(bucket = Some(b),
          spec = if (specId > 0) Some(specId) else None))
      }
    case GraftFanCommitMessage(parts) =>
      parts.flatMap(land(staging, root, _))
    case other => throw new IllegalStateException(
      s"unexpected commit message: $other")
  }
}

class GraftDocsWriterFactory(stagingDir: String, idx: Array[Int],
    fileSuffix: String = "",
    guards: GraftWriteGuards.Guards = GraftWriteGuards.none,
    // schema-evolution tail: (name, type, ordinal in the incoming write
    // schema, or -1 when the writer must NULL-fill). EVERY added column
    // is written for every row — TSV positions are registry positions,
    // so the cells must line up even when a query supplies only some
    added: Seq[(String, String, Int)] = Nil,
    // Z-ORDER fan: split this task's rows into one staged file per
    // Z file id (the exchange co-located each id here; recomputing the
    // shared function row-side keeps every file quadrant-pure)
    zfan: Option[GraftVersions.GraftZOrderFan] = None)
    extends DataWriterFactory {

  /** Per-TASK identity allocator (shared by every inner writer of a
    * fan, so ids stay unique within the task): the j-th computed row
    * gets base + (partitionId*stride + j)*step. Task retries replay
    * the same sequence — only one attempt commits. */
  final class IdAlloc(val plan: GraftWriteGuards.IdPlan,
      partitionId: Int) {
    private var used = 0L
    def alloc(): Long = {
      if (used >= plan.stride)
        throw new IllegalStateException(
          s"identity column '${plan.name}': task wrote more than " +
            s"${plan.stride} rows — raise the identity block size")
      val v = plan.base +
        (partitionId.toLong * plan.stride + used) * plan.step
      used += 1; v
    }
  }

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val idAlloc: Map[String, IdAlloc] =
      guards.identity.map(p => p.name -> new IdAlloc(p, partitionId)).toMap
    guards.valueFan match {
      case Some(colName) if guards.bucketN.isEmpty && zfan.isEmpty =>
        // PARTITIONED BY (<generated col>): one staged file per
        // distinct computed value this task sees — with the column's
        // min=max stats recorded, the manifest prunes whole files on
        // value predicates (partition pruning at manifest cost)
        val plan = guards.generated.find(_.name == colName).getOrElse(
          throw new IllegalStateException(
            s"value layout column '$colName' has no generation plan"))
        return new DataWriter[InternalRow] {
          private val inner = scala.collection.mutable.Map
            .empty[Option[Long], DataWriter[InternalRow]]
          override def write(row: InternalRow): Unit = {
            val v: Option[Long] = plan.expr.eval(row) match {
              case null => None
              case n: java.lang.Long => Some(n.longValue)
              case n: java.lang.Integer => Some(n.longValue)
              case other => throw new IllegalStateException(
                s"value layout column '$colName' computed non-numeric " +
                  s"$other")
            }
            val tag = v.map(k =>
              if (k < 0) s"m${k.abs}" else k.toString).getOrElse("null")
            inner.getOrElseUpdate(v,
              fileWriter(partitionId, taskId, s"-v$tag", idAlloc))
              .write(row)
          }
          override def commit(): WriterCommitMessage =
            GraftFanCommitMessage(inner.toSeq
              .sortBy(_._1.getOrElse(Long.MinValue)).map {
                case (_, w) =>
                  w.commit().asInstanceOf[GraftDocsCommitMessage]
              })
          override def abort(): Unit = inner.values.foreach(_.abort())
          override def close(): Unit = inner.values.foreach(_.close())
        }
      case _ => ()
    }
    guards.bucketN match {
      case None if zfan.isDefined => new DataWriter[InternalRow] {
        private val fan = zfan.get
        private val getters: Array[InternalRow => Long] =
          fan.cols.map { case (c, _, _) =>
            c match {
              case "doc_id" => (r: InternalRow) => r.getLong(idx(0))
              case "fp" => (r: InternalRow) => r.getLong(idx(2))
              case "n_words" => (r: InternalRow) => r.getInt(idx(3)).toLong
              case other => throw new IllegalArgumentException(
                "Z-order clustering supports the numeric base columns " +
                  s"(doc_id, fp, n_words); got '$other'")
            }
          }.toArray
        private val vals = new Array[Long](fan.k)
        private val inner =
          scala.collection.mutable.Map.empty[Int, DataWriter[InternalRow]]
        override def write(row: InternalRow): Unit = {
          var j = 0
          while (j < fan.k) { vals(j) = getters(j)(row); j += 1 }
          val fid = fan.fileId(vals)
          inner.getOrElseUpdate(fid,
            fileWriter(partitionId, taskId, s"-z$fid", idAlloc)).write(row)
        }
        override def commit(): WriterCommitMessage =
          GraftFanCommitMessage(inner.toSeq.sortBy(_._1).map {
            case (_, w) => w.commit().asInstanceOf[GraftDocsCommitMessage]
          })
        override def abort(): Unit = inner.values.foreach(_.abort())
        override def close(): Unit = inner.values.foreach(_.close())
      }
      case None => fileWriter(partitionId, taskId, "", idAlloc)
      case Some(n) => new DataWriter[InternalRow] {
        private val inner =
          scala.collection.mutable.Map.empty[Int, DataWriter[InternalRow]]
        override def write(row: InternalRow): Unit = {
          val id = row.getLong(idx(0))
          val b = (((id % n) + n) % n).toInt
          inner.getOrElseUpdate(b,
            fileWriter(partitionId, taskId, s"-b$b", idAlloc)).write(row)
        }
        override def commit(): WriterCommitMessage =
          GraftBucketedCommitMessage(inner.toSeq.sortBy(_._1).map {
            case (b, w) =>
              (b, w.commit().asInstanceOf[GraftDocsCommitMessage])
          })
        override def abort(): Unit = inner.values.foreach(_.abort())
        override def close(): Unit = inner.values.foreach(_.close())
      }
    }
  }

  private val genByName: Map[String, GraftWriteGuards.GenPlan] =
    guards.generated.map(g => g.name -> g).toMap

  private def fileWriter(partitionId: Int, taskId: Long,
      nameInfix: String,
      idAlloc: Map[String, IdAlloc]): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val finalName = f"part-$partitionId%05d$nameInfix$fileSuffix.tsv"
      private val attempt =
        Paths.get(stagingDir).resolve(s"$finalName.attempt-$taskId")
      private val out = Files.newBufferedWriter(attempt, StandardCharsets.UTF_8)
      // per-column min/max over this file's rows, for the manifest's
      // file-skipping stats (all three numeric columns of the schema)
      private val mins = Array.fill(3)(Long.MaxValue)
      private val maxs = Array.fill(3)(Long.MinValue)
      // per-column distinct sketches (ndv.columns, opt-in): fed from
      // the same single-call observation points as min/max — one
      // bounded-memory sketch per (file, tracked column)
      private val ndvAcc: Map[String, GraftNdvSketch] =
        guards.ndvCols.map(c => c -> GraftNdvSketch.empty).toMap
      private val slotNames = Array("doc_id", "fp", "n_words")
      private def observe(slot: Int, v: Long): Unit = {
        if (v < mins(slot)) mins(slot) = v
        if (v > maxs(slot)) maxs(slot) = v
        if (ndvAcc.nonEmpty) ndvAcc.get(slotNames(slot)).foreach(_.add(v))
      }
      // min/max for generated/identity numeric columns: the manifest
      // facts behind value-layout partition pruning and explicit-id
      // hwm catch-up (base columns keep their fixed slots above)
      private val extraStats =
        scala.collection.mutable.Map.empty[String, (Long, Long)]
      private def observeExtra(name: String, v: Long): Unit = {
        extraStats.get(name) match {
          case Some((lo, hi)) =>
            extraStats(name) = (math.min(lo, v), math.max(hi, v))
          case None => extraStats(name) = (v, v)
        }
        if (ndvAcc.nonEmpty) ndvAcc.get(name).foreach(_.add(v))
      }
      private val bloom =
        if (guards.bloomCols.isEmpty) None
        else Some(GraftBloom.empty(guards.bloomBits))
      private var nRows = 0L
      private var nBytes = 0L
      // observed doc_id monotonicity → the manifest's `sorted=` fact
      private var lastId = Long.MinValue
      private var monotonic = true
      override def write(row: InternalRow): Unit = {
        // CHECK constraints gate the row BEFORE any bytes land: a
        // violating write fails the task, the job aborts, and the
        // staged commit never reaches the table (Delta's constraint
        // contract — bad data cannot enter, no quarantine pass needed)
        guards.constraints.foreach { case (name, cond) =>
          if (cond.eval(row) == false)
            throw new IllegalStateException(
              s"CHECK constraint '$name' violated by row " +
                s"(doc_id=${row.getLong(idx(0))})")
        }
        val id = row.getLong(idx(0))
        if (id < lastId) monotonic = false
        lastId = id
        val title = row.getUTF8String(idx(1)).toString
        val fp = row.getLong(idx(2))
        val nw = row.getInt(idx(3))
        // evolved tail: NULL (or a column the write didn't supply)
        // encodes as the `\N` sentinel so the cell count stays equal to
        // the registry width; a string value that would collide with
        // the codec is rejected up front — silently corrupting it on
        // read-back would be worse than a failed write. Generated
        // columns always land their COMPUTED value (explicit inserts
        // are enforced against it); identity columns allocate from the
        // task's reserved block, pass rewritten rows' ids through, and
        // gate explicit inserts on BY DEFAULT.
        def encodeStr(name: String, v: String): String = {
          if (v == "\\N" || v.contains('\t') || v.contains('\n'))
            throw new IllegalStateException(
              s"value of evolved column '$name' collides with the " +
                s"TSV codec (tab/newline/literal \\N): '$v'")
          v
        }
        val addedVals = added.map { case (name, tpe, i) =>
          genByName.get(name) match {
            case Some(g) =>
              val computed = g.expr.eval(row)
              if (g.enforce && i >= 0 && !row.isNullAt(i)) {
                val ok = (computed, tpe) match {
                  case (null, _) => false
                  case (c: java.lang.Long, "long") =>
                    row.getLong(i) == c.longValue
                  case (c: java.lang.Integer, "int") =>
                    row.getInt(i) == c.intValue
                  case (c, "string") =>
                    row.getUTF8String(i).toString == c.toString
                  case _ => false
                }
                if (!ok) throw new IllegalStateException(
                  s"generated column '$name': explicit value does not " +
                    s"match its GENERATED ALWAYS AS expression " +
                    s"(expected $computed); omit the column or supply " +
                    "the expression's value")
              }
              computed match {
                case null => "\\N"
                case c: java.lang.Long =>
                  observeExtra(name, c.longValue); c.toString
                case c: java.lang.Integer =>
                  observeExtra(name, c.longValue); c.toString
                case c => encodeStr(name, c.toString)
              }
            case None if idAlloc.contains(name) =>
              val a = idAlloc(name)
              val v: Long =
                if (i >= 0 && !row.isNullAt(i)) {
                  if (!a.plan.passThrough && !a.plan.allowExplicit)
                    throw new IllegalStateException(
                      s"identity column '$name' is GENERATED ALWAYS: " +
                        "explicit values are not allowed (omit the " +
                        "column, or declare it GENERATED BY DEFAULT)")
                  row.getLong(i)
                } else a.alloc()
              observeExtra(name, v)
              v.toString
            case None =>
              if (i < 0 || row.isNullAt(i)) "\\N"
              else tpe match {
                case "long" => row.getLong(i).toString
                case "int" => row.getInt(i).toString
                case _ => encodeStr(name, row.getUTF8String(i).toString)
              }
          }
        }
        observe(0, id); observe(1, fp); observe(2, nw.toLong)
        bloom.foreach { b =>
          guards.bloomCols.foreach { c =>
            val v = c match {
              case "doc_id" => id.toString
              case "title" => title
              case "fp" => fp.toString
              case "n_words" => nw.toString
              case other => throw new IllegalArgumentException(
                s"bloom.columns names unknown column '$other'")
            }
            b.add(GraftBloom.key(c, v))
          }
        }
        val line = (s"$id\t$title\t$fp\t$nw" +: addedVals)
          .mkString("", "\t", "\n")
        out.write(line)
        nRows += 1
        nBytes += line.getBytes(StandardCharsets.UTF_8).length
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        Files.move(attempt, Paths.get(stagingDir).resolve(finalName),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        val cols = Array("doc_id", "fp", "n_words")
        val stats = cols.indices.map { s =>
          if (mins(s) > maxs(s)) cols(s) -> (0L, -1L) // empty file
          else cols(s) -> (mins(s), maxs(s))
        }.toMap ++ extraStats
        GraftDocsCommitMessage(finalName, stats, bloom, nRows, nBytes,
          ndv = if (ndvAcc.isEmpty) None else Some(GraftNdv(ndvAcc)),
          sorted = monotonic)
      }
      override def abort(): Unit = { out.close(); Files.deleteIfExists(attempt) }
      override def close(): Unit = ()
    }
}
