package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (builder prompt): media as opaque binary
  * columns with typed metadata, decoded / feature-extracted via a typed
  * per-partition pass.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[FakeDecoder.decode]]) — but the
  * Spark-side plumbing is real: binary column synthesis, a metadata
  * struct, a `Dataset[T]` mapPartitions decode (the Scala analog of
  * `mapInPandas` batch UDFs: one decoder instantiation per partition, not
  * per row), and a relational aggregate over the extracted features.
  *
  * The byte-sum feature is chosen so the DuckDB oracle can recompute it
  * from the md5 hex string — the binary path itself stays oracle-checked.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, source: String, payload: Array[Byte],
    width: Int, height: Int, channels: Int)
  final case class MediaFeatures(doc_id: Long, source: String, n_bytes: Int,
    byte_sum: Long, max_byte: Int)

  /** STUB decoder: a real deployment would decode image/audio here (e.g.
    * javax.imageio / ffmpeg bindings). This fake is deterministic on the
    * payload bytes so the pipeline stays testable end-to-end. */
  object FakeDecoder {
    def decode(r: MediaRow): MediaFeatures = {
      val unsigned = r.payload.map(b => b & 0xff)
      MediaFeatures(r.doc_id, r.source, r.payload.length,
        unsigned.map(_.toLong).sum, if (unsigned.isEmpty) 0 else unsigned.max)
    }
  }

  /** Synthesize the media table: 16-byte binary payload (md5 digest of the
    * text — the fake "image") + typed metadata struct. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"source", unhex(md5($"text")).as("payload"))
      .withColumn("meta", struct(
        lit(4).as("width"), lit(2).as("height"), lit(2).as("channels"),
        lit("fake/bgra16").as("format")))
  }

  /** Binary decode via typed mapPartitions + per-source feature rollup.
    * Partition-wise decode keeps one decoder per partition (the batch-UDF
    * shape that scales: no per-row setup, no driver collect). */
  val q61MultimodalFeatures: (SparkSession, String) => DataFrame =
    (spark, dir) => {
      import spark.implicits._
      val media = mediaTable(spark, dir)
        .select($"doc_id", $"source", $"payload",
          $"meta.width".as("width"), $"meta.height".as("height"),
          $"meta.channels".as("channels"))
        .as[MediaRow]
      val feats = media.mapPartitions { it =>
        // one decoder context per partition (stub has none, real ones do)
        it.map(FakeDecoder.decode)
      }
      feats.toDF()
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_media"),
          sum($"n_bytes").as("total_bytes"),
          sum($"byte_sum").as("total_byte_sum"),
          max($"max_byte").as("global_max_byte"))
        .orderBy($"source")
    }

  final case class FrameFeature(doc_id: Long, source: String, frame_idx: Int,
    frame_sum: Long, resized_sum: Long)

  /** STUB frame sampler + resizer: treats the payload as `height` frames
    * of width*channels bytes. A real deployment would seek keyframes /
    * rescale pixels; the stub keeps the exact batch shape (flatMap: one
    * media row → N frame rows) and derives "resize" as a stride-2 byte
    * subsample, deterministic on the payload. */
  object FakeFrameSampler {
    def sample(r: MediaRow): Iterator[FrameFeature] = {
      val frameBytes = r.width * r.channels
      val unsigned = r.payload.map(b => (b & 0xff).toLong)
      (0 until r.height).iterator.map { f =>
        val frame = unsigned.slice(f * frameBytes, (f + 1) * frameBytes)
        FrameFeature(r.doc_id, r.source, f, frame.sum,
          frame.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v }.sum)
      }
    }
  }

  /** Frame sampling + resize over the binary column: media → per-frame
    * rows via a typed flatMap (the one-to-many batch-UDF shape), then a
    * per-(source, frame) rollup. No shuffle until the final aggregate. */
  val q67FrameSample: (SparkSession, String) => DataFrame =
    (spark, dir) => {
      import spark.implicits._
      val media = mediaTable(spark, dir)
        .select($"doc_id", $"source", $"payload",
          $"meta.width".as("width"), $"meta.height".as("height"),
          $"meta.channels".as("channels"))
        .as[MediaRow]
      media.mapPartitions(_.flatMap(FakeFrameSampler.sample))
        .toDF()
        .groupBy($"source", $"frame_idx")
        .agg(
          count(lit(1)).as("n_frames"),
          sum($"frame_sum").as("total_frame_sum"),
          sum($"resized_sum").as("total_resized_sum"))
        .orderBy($"source", $"frame_idx")
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_multimodal_features" -> q61MultimodalFeatures,
    "q67_frame_sample" -> q67FrameSample,
  )

  /** The byte-level features are recomputable from the md5 hex string. */
  val oracle: Map[String, String] = Map(
    "q61_multimodal_features" ->
      """WITH bytes AS (
        |  SELECT doc_id, source,
        |    list_transform(range(0, 16),
        |      i -> CAST(('0x' || substr(md5(text), i * 2 + 1, 2)) AS INT)) AS bs
        |  FROM documents
        |)
        |SELECT source, COUNT(*) AS n_media,
        |  CAST(SUM(16) AS BIGINT) AS total_bytes,
        |  CAST(SUM(list_reduce(list_prepend(0, bs), (a, b) -> a + b)) AS BIGINT)
        |    AS total_byte_sum,
        |  CAST(MAX(list_reduce(list_prepend(0, bs),
        |    (a, b) -> CASE WHEN b > a THEN b ELSE a END)) AS INT)
        |    AS global_max_byte
        |FROM bytes GROUP BY 1 ORDER BY 1""".stripMargin,
    "q67_frame_sample" ->
      """WITH bytes AS (
        |  SELECT doc_id, source,
        |    list_transform(range(0, 16),
        |      i -> CAST(('0x' || substr(md5(text), i * 2 + 1, 2)) AS INT)) AS bs
        |  FROM documents
        |), frames AS (
        |  SELECT source, CAST(f AS INT) AS frame_idx,
        |    list_reduce(list_prepend(0,
        |      bs[CAST(f * 8 + 1 AS INT):CAST(f * 8 + 8 AS INT)]),
        |      (a, b) -> a + b) AS frame_sum,
        |    bs[CAST(f * 8 + 1 AS INT)] + bs[CAST(f * 8 + 3 AS INT)]
        |      + bs[CAST(f * 8 + 5 AS INT)] + bs[CAST(f * 8 + 7 AS INT)]
        |      AS resized_sum
        |  FROM bytes, range(0, 2) t(f)
        |)
        |SELECT source, frame_idx, COUNT(*) AS n_frames,
        |  CAST(SUM(frame_sum) AS BIGINT) AS total_frame_sum,
        |  CAST(SUM(resized_sum) AS BIGINT) AS total_resized_sum
        |FROM frames GROUP BY 1, 2 ORDER BY source, frame_idx""".stripMargin,
  )
}
