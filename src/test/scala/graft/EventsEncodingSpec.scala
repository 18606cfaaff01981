package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Encoding-robustness fixture (r11 verdict task 5): the driver's
  * testdata generator has shipped events.ts as BOTH `timestamp[ns]`
  * (rounds ≤10, read as a raw long) and `timestamp[us]` (round 11+,
  * read as TIMESTAMP_NTZ). q60's ML matrix derives its labels
  * (month/hour/weekday/peak) from ts, so ML determinism must not
  * depend on the generator's choice. This spec writes the SAME sample
  * under three physical encodings, round-trips each through
  * `Tables.events`, and asserts the loaded instants and every derived
  * label column are bit-identical.
  */
class EventsEncodingSpec extends SparkSpec {

  test("events.ts loads identically under ns-long, µs-NTZ, and µs-LTZ parquet encodings (incl. q60's derived ML labels)") {
    val base = Tables.events(spark, sf).limit(200)
    val root = Files.createTempDirectory("graft-events-enc").toFile
    val dir = root.getAbsolutePath

    // rounds ≤10: INT64 ns-since-epoch (plain long column named ts)
    base.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(s"$dir/ns/events.parquet")
    // round 11+: timestamp[us], isAdjustedToUTC=false → TIMESTAMP_NTZ
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/us_ntz/events.parquet")
    // µs adjusted-to-UTC → TimestampType pass-through branch
    base.write.mode("overwrite").parquet(s"$dir/us_ltz/events.parquet")

    // exactly the q60 label derivation (ml/Pipelines.scala results())
    def derived(d: String): Seq[org.apache.spark.sql.Row] =
      Tables.events(spark, d).select(
          col("event_id"),
          expr("unix_micros(ts)").as("epoch_us"),
          month(col("ts")).cast("double").as("month_label"),
          hour(col("ts")).cast("double").as("hour_label"),
          (dayofweek(col("ts")) - 1).cast("double").as("weekday_label"),
          when(hour(col("ts")).between(8, 18), 1.0).otherwise(0.0).as("peak_label"))
        .orderBy("event_id").collect().toSeq

    val ns = derived(s"$dir/ns")
    val ntz = derived(s"$dir/us_ntz")
    val ltz = derived(s"$dir/us_ltz")
    assert(ns.nonEmpty, "fixture sample is empty")
    assert(ns == ntz, "ns-long vs µs-NTZ: derived labels differ")
    assert(ns == ltz, "ns-long vs µs-LTZ: derived labels differ")

    // and each loads as exactly TimestampType (the normalized contract)
    for (variant <- Seq("ns", "us_ntz", "us_ltz")) {
      val dt = Tables.events(spark, s"$dir/$variant").schema("ts").dataType
      assert(dt == org.apache.spark.sql.types.TimestampType,
        s"$variant: ts loaded as $dt")
    }

    // best-effort cleanup
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(root)
  }
}
