package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver test tables (`/root/testdata/sf0.001` etc).
  *
  * Schema-on-read parquet, mirroring the reference's source pattern
  * (`/root/reference/Assignment-python.py:134` `spark.read.parquet`).
  * Parquet embeds the schema, so no explicit StructType is needed
  * (the reference only hand-writes schemas for CSV, `:38-52`).
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = p(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = p(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = p(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = p(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = p(spark, dir, "lineitem")
  /** events.ts is nanosecond-precision parquet (TESTDATA: timestamp[ns]),
    * which Spark's vectorized reader rejects outright. Read it as a raw
    * ns-since-epoch long, then rebuild a µs TimestampType column with
    * integer division (a double division would lose precision at 1e18 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "embeddings")
}
