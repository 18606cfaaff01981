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
  val names: Seq[String] = Seq("vacuum", "optimize", "restore")

  def apply(name: String, resolve: String => Path): UnboundProcedure =
    name match {
      case "vacuum" => vacuum(resolve)
      case "optimize" => optimize(resolve)
      case "restore" => restore(resolve)
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
