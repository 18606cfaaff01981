package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for oracle-parity-safe aggregation.
  *
  * Doubles summed in different orders differ in the last ulp between Spark
  * and DuckDB, which breaks hash-compared correctness (SURVEY.md §7.3 risk
  * item 1). Money columns in the test data carry ≤2 decimals, so casting to
  * DECIMAL before summing makes the aggregate exact and order-independent
  * on both engines; the final cast back to DOUBLE is then deterministic.
  */
object OpsUtil {
  type Q = (SparkSession, String) => DataFrame

  /** Exact money representation (values have ≤2 fractional digits). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Order-independent SUM of a ≤2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(money(c)).cast("double")

  /** Matching DuckDB fragment for [[dsum]]. */
  def dsumSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"

  /** Exact per-row revenue l_extendedprice * (1 - l_discount): decimal×decimal
    * stays exact (scale 4), so the sum is order-independent. */
  def revenueExpr: Column =
    money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))

  val revenueSql: String =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"

  /** Materialize a SMALL (≤ a few hundred rows — profile/audit-sized)
    * result on the driver and rebuild it as a local DataFrame with the
    * identical schema. Lets a query unpersist its corpus-sized caches
    * before returning, so no cached blocks survive the call (the q131
    * self-containment rule); the caller must unpersist between collect
    * and return. Values and schema are bit-identical to the distributed
    * result, so oracle hashes are unchanged. */
  def driverLiteral(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }
}
