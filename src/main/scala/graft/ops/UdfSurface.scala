package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import OpsUtil._

/** Re-architecture of the reference's Python-UDF image surface
  * (`/root/reference/Assignment-python.py:654-841`: toPixels / toColorName /
  * most-common-colors) as fully native Catalyst expressions.
  *
  * The reference pays a JVM↔Python serialization boundary per row batch
  * (SURVEY.md §3.3 boundary 3); here the same byte-level logic — split a
  * binary blob into 4-byte BGRA pixels, quantize each channel to a color
  * lattice, alpha<128 ⇒ "None" — runs inside whole-stage codegen, so it
  * vectorizes and scales with the fact table.
  *
  * No PNGs exist in the test data, so the pixel source is synthesized
  * deterministically: md5(text) = 16 bytes = four BGRA pixels per document
  * (SURVEY.md §7.3 risk item 4 — oracle-checkable on both engines).
  */
object UdfSurface {

  /** Channel quantization from the reference (`:682-687`):
    * <85 ⇒ 0, <170 ⇒ 128, else 255. */
  private def quant(c: Column): Column =
    when(c < 85, 0).when(c < 170, 128).otherwise(255)

  private val quantSql = (c: String) =>
    s"CASE WHEN $c < 85 THEN 0 WHEN $c < 170 THEN 128 ELSE 255 END"

  /** Hex-pair → 0..255 int (the native stand-in for byte indexing). */
  private def hexByte(p: Column, pos: Int): Column =
    conv(substring(p, pos, 2), 16, 10).cast("int")

  private def hexByteSql(p: String, pos: Int) =
    s"CAST(('0x' || substr($p, $pos, 2)) AS INT)"

  /** BGRA pixel (8 hex chars) → color name; mirrors toColorName
    * (`:667-701`): byte order B,G,R,A; alpha<128 ⇒ "None".
    * private[ops]: Round5's q93 runs the same pipeline over REAL
    * `format("image")` bytes instead of synthesized hex. */
  private[ops] def colorName(p: Column): Column = {
    val b = quant(hexByte(p, 1))
    val g = quant(hexByte(p, 3))
    val r = quant(hexByte(p, 5))
    val a = hexByte(p, 7)
    when(a < 128, "None").otherwise(
      when(r === 0 && g === 0 && b === 0, "Black")
        .when(r === 255 && g === 255 && b === 255, "White")
        .when(r === 255 && g === 0 && b === 0, "Red")
        .when(r === 0 && g === 255 && b === 0, "Green")
        .when(r === 0 && g === 0 && b === 255, "Blue")
        .when(r === 255 && g === 255 && b === 0, "Yellow")
        .when(r === 255 && g === 0 && b === 255, "Magenta")
        .when(r === 0 && g === 255 && b === 255, "Cyan")
        .otherwise(concat_ws("-", lit("Gray"), r, g, b)))
  }

  private[ops] def colorNameSql(p: String): String = {
    val b = quantSql(hexByteSql(p, 1))
    val g = quantSql(hexByteSql(p, 3))
    val r = quantSql(hexByteSql(p, 5))
    val a = hexByteSql(p, 7)
    s"""CASE WHEN $a < 128 THEN 'None'
       | WHEN $r = 255 AND $g = 255 AND $b = 255 THEN 'White'
       | WHEN $r = 0 AND $g = 0 AND $b = 0 THEN 'Black'
       | WHEN $r = 255 AND $g = 0 AND $b = 0 THEN 'Red'
       | WHEN $r = 0 AND $g = 255 AND $b = 0 THEN 'Green'
       | WHEN $r = 0 AND $g = 0 AND $b = 255 THEN 'Blue'
       | WHEN $r = 255 AND $g = 255 AND $b = 0 THEN 'Yellow'
       | WHEN $r = 255 AND $g = 0 AND $b = 255 THEN 'Magenta'
       | WHEN $r = 0 AND $g = 255 AND $b = 255 THEN 'Cyan'
       | ELSE concat_ws('-', 'Gray', $r, $g, $b) END""".stripMargin
  }

  /** U1/U2 native: synthesize 4 BGRA pixels per doc from md5(text), map to
    * color names, explode, global color frequency (reference `:726-746`
    * pipeline shape + A13 Counter rewrite). */
  val q25PixelColors: Q = (spark, dir) => {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("hex", md5($"text"))
      .withColumn("pixels",
        transform(sequence(lit(0), lit(3)), i => substring_nth($"hex", i)))
      .select(explode(transform($"pixels", colorName _)).as("color"))
      .groupBy($"color")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"color")
  }

  /** substring(hex, i*8+1, 8) for a dynamic index column. */
  private def substring_nth(hex: Column, i: Column): Column =
    hex.substr(i * 8 + 1, lit(8))

  /** U3 native rewrite: per-source ordered top-3 colors as an array +
    * equality test against a target palette (reference
    * get_most_common_colors `:799-813`: explode → count → rank →
    * ordered collect — no per-row Python Counter). */
  val q26TopColors: Q = (spark, dir) => {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .withColumn("hex", md5($"text"))
      .withColumn("pixels",
        transform(sequence(lit(0), lit(3)), i => substring_nth($"hex", i)))
      .select($"source", explode(transform($"pixels", colorName _)).as("color"))
      .groupBy($"source", $"color")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"source").orderBy($"n".desc, $"color")))
      .filter($"rnk" <= 3)
      .groupBy($"source")
      .agg(array_sort(collect_list(struct($"rnk", $"color"))).as("ranked"))
      .select($"source",
        transform($"ranked", r => r.getField("color")).as("top3arr"))
      // Joined string, not ArrayType: the driver's pandas hash-compare
      // cannot hash ndarray cells (r01: q26 comparison crashed).
      .withColumn("top3", concat_ws("|", $"top3arr"))
      .withColumn("is_target",
        $"top3arr" === array(lit("Gray-255-128-128"), lit("Gray-128-128-128"),
          lit("Gray-128-255-128")))
      .select($"source", $"top3", $"is_target")
      .orderBy($"source")
  }

  /** The same pixel pipeline through an explicit Scala `udf()` — the
    * reference's registration surface (`:726-727`) re-expressed. Unlike
    * the reference's Python UDFs this stays in the JVM (no per-batch
    * serialization boundary), but it still exits codegen, so the native
    * q25 is the performance path; q36 exists to prove UDF parity (same
    * oracle SQL as q25). */
  /** Pure pixel decoding for the UDF path (exposed for property tests). */
  private[graft] def colorNamesOf(hex: String): Seq[String] = {
    def quant(x: Int): Int = if (x < 85) 0 else if (x < 170) 128 else 255
    (0 until hex.length / 8).map { i =>
      val p = hex.substring(i * 8, i * 8 + 8)
      def byte(o: Int) = Integer.parseInt(p.substring(o, o + 2), 16)
      val (b, g, r, a) = (quant(byte(0)), quant(byte(2)), quant(byte(4)), byte(6))
      if (a < 128) "None"
      else (r, g, b) match {
        case (0, 0, 0)       => "Black"
        case (255, 255, 255) => "White"
        case (255, 0, 0)     => "Red"
        case (0, 255, 0)     => "Green"
        case (0, 0, 255)     => "Blue"
        case (255, 255, 0)   => "Yellow"
        case (255, 0, 255)   => "Magenta"
        case (0, 255, 255)   => "Cyan"
        case _               => s"Gray-$r-$g-$b"
      }
    }
  }

  private val toColorNamesUdf = udf(colorNamesOf _)

  val q36UdfPixels: Q = (spark, dir) => {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(toColorNamesUdf(md5($"text"))).as("color"))
      .groupBy($"color")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"color")
  }

  val queries: Map[String, Q] = Map(
    "q25_pixel_colors" -> q25PixelColors,
    "q26_top_colors" -> q26TopColors,
    "q36_udf_pixels" -> q36UdfPixels,
  )

  private val pixelCte =
    s"""WITH px AS (
       |  SELECT source, ${colorNameSql("p")} AS color
       |  FROM (
       |    SELECT source, unnest([substr(hex,1,8), substr(hex,9,8),
       |      substr(hex,17,8), substr(hex,25,8)]) AS p
       |    FROM (SELECT source, md5(text) AS hex FROM documents)
       |  )
       |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q25_pixel_colors" ->
      s"""$pixelCte
         |SELECT color, COUNT(*) AS n FROM px
         |GROUP BY 1 ORDER BY n DESC, color""".stripMargin,
    "q36_udf_pixels" ->
      s"""$pixelCte
         |SELECT color, COUNT(*) AS n FROM px
         |GROUP BY 1 ORDER BY n DESC, color""".stripMargin,
    "q26_top_colors" ->
      s"""$pixelCte, counts AS (
         |  SELECT source, color, COUNT(*) AS n FROM px GROUP BY 1, 2
         |), ranked AS (
         |  SELECT source, color,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, color) AS rnk
         |  FROM counts
         |)
         |SELECT source,
         |  array_to_string(list(color ORDER BY rnk), '|') AS top3,
         |  list(color ORDER BY rnk) =
         |    ['Gray-255-128-128', 'Gray-128-128-128', 'Gray-128-255-128']
         |    AS is_target
         |FROM ranked WHERE rnk <= 3 GROUP BY source ORDER BY source""".stripMargin,
  )
}
