package graft.ops

import java.io.File
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import OpsUtil._

/** Text-format source surface (SURVEY.md §2.1): the reference reads CSV
  * with an explicit StructType schema, header, and a non-default `|`
  * separator (`/root/reference/Assignment-python.py:38-52`) and JSON-Lines
  * with inferred schema (`:711`). The test corpus is parquet-only, so each
  * query round-trips a table through the text format into a scratch dir
  * and aggregates what was read back — proving the reader surface against
  * the parquet-direct oracle. Doubles survive exactly: Spark writes
  * shortest-repr decimal strings, which parse back to the identical bits.
  */
object Sources {

  private def scratch(dir: String, tag: String): String =
    new File(sys.props("java.io.tmpdir"),
      s"graft_${tag}_${new File(dir).getName}").getAbsolutePath

  /** S1: CSV round-trip with explicit schema + header + `|` separator. */
  val q27CsvSource: Q = (spark, dir) => {
    import spark.implicits._
    val out = scratch(dir, "csv")
    Tables.customer(spark, dir)
      .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal", $"c_mktsegment")
      .write.mode("overwrite").option("header", true).option("sep", "|")
      .csv(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    spark.read.schema(schema).option("header", true).option("sep", "|")
      .csv(out)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("total_bal"))
      .orderBy($"c_mktsegment")
  }

  /** S3: JSON-Lines round-trip with inferred schema. */
  val q28JsonSource: Q = (spark, dir) => {
    import spark.implicits._
    val out = scratch(dir, "json")
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .write.mode("overwrite").json(out)
    spark.read.json(out)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"lang")
  }

  /** Bucketed co-located join (the builder prompt's "bucketing for
    * co-located joins"): lineitem and orders are written as 8-bucket
    * tables on their order keys, after which the join needs NO shuffle on
    * either side — the only Exchange left in the plan is the final
    * aggregation's (asserted by OperatorsSpec). At 100 TB this is the
    * difference between re-shuffling the fact table per query and reading
    * co-partitioned buckets. */
  val q29BucketedJoin: Q = (spark, dir) => {
    import spark.implicits._
    val wh = scratch(dir, "bucketed")
    // Bucket layout is write-once: once the bucketed files exist on disk,
    // later sessions re-attach them as external CLUSTERED BY tables instead
    // of re-shuffling and re-writing the fact table every invocation.
    // The scratch path is VERSIONED by a layout tag (hash of columns, key,
    // and bucket count) and the parquet footer schema is compared before
    // attaching — a stale directory from an older layout lands on a
    // different path or fails the schema check and is rewritten, instead
    // of being silently trusted by the bucket-aware join.
    // Table names carry the sf-dir tag: one session may touch several
    // data dirs (e.g. a small-SF warmup before the timed run), and a
    // catalog name shared across dirs would silently reuse the wrong data.
    val dirTag = new File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
    def ensure(tbl: String, sub: String, cols: String, key: String,
               write: String => Unit): Unit = {
      val layout = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$cols|$key|8".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val path = s"$wh/${sub}_$layout"
      if (!spark.catalog.tableExists(tbl)) {
        val onDiskOk = new File(path, "_SUCCESS").exists() && {
          val expected = org.apache.spark.sql.types.StructType.fromDDL(cols)
          val actual = spark.read.parquet(path).schema
          actual.map(f => (f.name, f.dataType)) ==
            expected.map(f => (f.name, f.dataType))
        }
        if (onDiskOk)
          spark.sql(s"""CREATE TABLE $tbl ($cols) USING parquet
            |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
            |LOCATION '$path'""".stripMargin)
        else write(path)
      }
    }
    val liTbl = s"graft_lineitem_b_$dirTag"
    val ordTbl = s"graft_orders_b_$dirTag"
    ensure(liTbl, "lineitem",
      "l_orderkey BIGINT, l_extendedprice DOUBLE, l_discount DOUBLE",
      "l_orderkey",
      path => Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
        .write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", path).mode("overwrite")
        .saveAsTable(liTbl))
    ensure(ordTbl, "orders",
      "o_orderkey BIGINT, o_orderstatus STRING", "o_orderkey",
      path => Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_orderstatus")
        .write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", path).mode("overwrite")
        .saveAsTable(ordTbl))
    spark.table(liTbl)
      .join(spark.table(ordTbl), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_items"), sum(revenueExpr).cast("double").as("revenue"))
      .orderBy($"o_orderstatus")
  }

  /** S8 extension: ORC round-trip — the columnar sibling of the parquet
    * path (predicate pushdown + column pruning work the same way), read
    * back with schema-on-read and aggregated against the parquet-direct
    * oracle. */
  val q78OrcSource: Q = (spark, dir) => {
    import spark.implicits._
    val out = scratch(dir, "orc")
    Tables.part(spark, dir)
      .select($"p_partkey", $"p_brand", $"p_size", $"p_retailprice")
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .filter($"p_size" >= 10)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"), dsum($"p_retailprice").as("total_price"))
      .orderBy($"p_brand")
  }

  val queries: Map[String, Q] = Map(
    "q27_csv_source" -> q27CsvSource,
    "q28_json_source" -> q28JsonSource,
    "q29_bucketed_join" -> q29BucketedJoin,
    "q78_orc_source" -> q78OrcSource,
  )

  val oracle: Map[String, String] = Map(
    "q27_csv_source" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
         |  ${dsumSql("c_acctbal")} AS total_bal
         |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q28_json_source" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q29_bucketed_join" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_items,
         |  CAST(SUM($revenueSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q78_orc_source" ->
      s"""SELECT p_brand, COUNT(*) AS n_parts,
         |  ${dsumSql("p_retailprice")} AS total_price
         |FROM part WHERE p_size >= 10
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
