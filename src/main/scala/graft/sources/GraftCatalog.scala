package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 `TableCatalog` + `FunctionCatalog` over the graft_docs corpus —
  * the missing half of the storage-partitioned-join story: Spark resolves
  * a scan-reported `bucket(n, doc_id)` transform into a catalyst
  * expression ONLY through the function catalog of the table's own
  * catalog (a bare `TableProvider` has none, so its reported
  * `KeyGroupedPartitioning` silently degrades to `UnknownPartitioning` —
  * measured, not guessed). This is exactly how Iceberg/Delta wire
  * layout-aware joins: the catalog serves the table AND the function that
  * defines its layout.
  *
  * Tables: `docs` (20000 rows, 8 buckets) or `docs_<rows>_<buckets>`.
  * Function: `bucket(numBuckets, id) = id % numBuckets` — the SAME
  * mapping [[GraftBucketPartition]] uses for its partition values, which
  * is the whole contract: the catalog's function is the executable
  * definition of the layout the scan declares. Register with
  * `spark.sql.catalog.<name> = graft.sources.GraftCatalog` and read
  * `spark.table("<name>.docs")`. */
class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName = "graft"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "docs"))

  override def loadTable(ident: Identifier): Table = ident.name() match {
    case "docs" => new GraftDocsTable(20000L, 8, None, 8)
    case s if s.startsWith("docs_") =>
      s.stripPrefix("docs_").split('_') match {
        case Array(rows, buckets) =>
          new GraftDocsTable(rows.toLong, 8, None, buckets.toInt)
        case _ => throw new NoSuchTableException(ident)
      }
    case _ => throw new NoSuchTableException(ident)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog tables are virtual")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog tables are virtual")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog tables are virtual")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))
  override def loadFunction(ident: Identifier): UnboundFunction =
    ident.name() match {
      case "bucket" => GraftBucketFunction
      case _ => throw new NoSuchFunctionException(ident)
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
    override def produceResult(input: InternalRow): Int =
      (input.getLong(1) % input.getInt(0)).toInt
  }
}
