package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
    GraftDocsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt)
}

object GraftDocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("fp", LongType, nullable = false), // 60-bit md5 fingerprint
    StructField("n_words", IntegerType, nullable = false)))

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
}

class GraftDocsTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_docs(rows=$rows)"
  override def schema(): StructType = GraftDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDocsScanBuilder(rows, parts)
}

class GraftDocsScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = GraftDocsSource.schema
  private var lo = 0L
  private var hi = rows
  private var accepted = Array.empty[Filter]

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
    new GraftDocsScan(math.max(lo, 0L), math.min(hi, rows), parts, required)
}

class GraftDocsScan(lo: Long, hi: Long, parts: Int, required: StructType)
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
}

case class GraftDocsPartition(start: Long, end: Long) extends InputPartition

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
