package graft.ops

import java.io.File
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.Tables
import OpsUtil._

/** Round-3 coverage queries: string→date parsing with an explicit pattern
  * (the reference's very first transform, `/root/reference/
  * Assignment-python.py:58`), a real `binaryFile`-format scan feeding the
  * multimodal decode path (reference reads a PNG directory at `:710`), and
  * the reference's driver-splice lifecycle — `collect()[0][0]` feeding the
  * next query as a literal (`:65-70`).
  */
object Round3 {

  /** X1: parse a "dd-MM-yyyy" formatted STRING back into a date with an
    * explicit pattern, then extract fields from the parsed value. The
    * formatted column is synthesized from o_orderdate so the oracle can
    * reproduce it; the round-trip proves the parse (a wrong pattern would
    * scramble day/month and change every group). */
  val q72DateParse: Q = (spark, dir) => {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("date_str", date_format($"o_orderdate", "dd-MM-yyyy"))
      .withColumn("parsed", to_date($"date_str", "dd-MM-yyyy"))
      .groupBy(
        year($"parsed").as("y"),
        month($"parsed").as("m"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(dayofmonth($"parsed")).as("n_days"),
        dsum($"o_totalprice").as("revenue"))
      .orderBy($"y", $"m")
  }

  /** S4 via Spark's built-in `binaryFile` source: a deterministic fixture
    * directory of .bin files (the first 20 documents' md5 digests — the
    * same 16-byte payload q61 synthesizes in-plan) is scanned with
    * `format("binaryFile")`, ids recovered from the file PATH column, and
    * the `content` bytes run through the same typed per-partition decode
    * as q61. Scan columns (path, length, content) all participate, so the
    * plan proves the real file-based binary source, not a synthesized
    * column. */
  val q73BinaryFiles: Q = (spark, dir) => {
    import spark.implicits._
    val out = new File(sys.props("java.io.tmpdir"),
      s"graft_binfiles_${new File(dir).getName}").getAbsolutePath
    // Fixture: write-once per sf dir; 20 tiny files, driver-side (this is
    // test-input creation, not query work — a real deployment reads an
    // existing media directory).
    val marker = Paths.get(out, "_ready")
    if (!Files.exists(marker)) {
      Files.createDirectories(Paths.get(out))
      val docs = Tables.documents(spark, dir)
        .filter($"doc_id" < 20).select($"doc_id", $"text")
        .collect()
      val md = MessageDigest.getInstance("MD5")
      docs.foreach { r =>
        md.reset()
        Files.write(Paths.get(out, f"doc_${r.getLong(0)}%03d.bin"),
          md.digest(r.getString(1).getBytes("UTF-8")))
      }
      Files.write(marker, Array.emptyByteArray)
    }
    val media = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(out)
      .select(
        regexp_extract($"path", "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
        lit("binfile").as("source"),
        $"content".as("payload"),
        lit(4).as("width"), lit(2).as("height"), lit(2).as("channels"))
      .as[graft.multimodal.Multimodal.MediaRow]
    media.mapPartitions(_.map(graft.multimodal.Multimodal.FakeDecoder.decode))
      .toDF()
      .select($"doc_id", $"n_bytes", $"byte_sum", $"max_byte")
      .orderBy($"doc_id")
  }

  /** The reference's driver-splice lifecycle: a scalar is collected on the
    * driver (`collect()[0][0]`) and spliced into the NEXT query as a
    * literal — here max(o_orderdate) → an equality filter. The oracle
    * expresses the same thing as a scalar subquery. (q02/q03 already cover
    * the fully-relational rewrite; this proves the two-step entry-point
    * shape itself.) */
  val q74DriverSplice: Q = (spark, dir) => {
    import spark.implicits._
    // collect()[0][0]; Spark 4 surfaces TIMESTAMP_NTZ as LocalDateTime,
    // and lit() round-trips it back into a literal of the same type.
    val maxDate = Tables.orders(spark, dir)
      .agg(max($"o_orderdate")).head().get(0)
    Tables.orders(spark, dir)
      .filter($"o_orderdate" === lit(maxDate))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"o_orderpriority")
  }

  val queries: Map[String, Q] = Map(
    "q72_date_parse" -> q72DateParse,
    "q73_binary_files" -> q73BinaryFiles,
    "q74_driver_splice" -> q74DriverSplice,
  )

  val oracle: Map[String, String] = Map(
    "q72_date_parse" ->
      s"""SELECT CAST(year(parsed) AS INT) AS y,
         |  CAST(month(parsed) AS INT) AS m,
         |  COUNT(*) AS n_orders,
         |  CAST(COUNT(DISTINCT day(parsed)) AS BIGINT) AS n_days,
         |  ${dsumSql("o_totalprice")} AS revenue
         |FROM (SELECT CAST(strptime(strftime(o_orderdate, '%d-%m-%Y'),
         |        '%d-%m-%Y') AS DATE) AS parsed, o_totalprice
         |      FROM orders)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q73_binary_files" ->
      """SELECT doc_id, 16 AS n_bytes,
        |  CAST(list_reduce(list_prepend(0, bs), (a, b) -> a + b) AS BIGINT)
        |    AS byte_sum,
        |  CAST(list_reduce(list_prepend(0, bs),
        |    (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS INT) AS max_byte
        |FROM (
        |  SELECT doc_id,
        |    list_transform(range(0, 16),
        |      i -> CAST(('0x' || substr(md5(text), i * 2 + 1, 2)) AS INT)) AS bs
        |  FROM documents WHERE doc_id < 20
        |) ORDER BY doc_id""".stripMargin,
    "q74_driver_splice" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS revenue
         |FROM orders
         |WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
