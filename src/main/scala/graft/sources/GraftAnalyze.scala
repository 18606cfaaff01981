package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Per-file facts computed by one ANALYZE pass over a file's LIVE rows
  * (encoder-friendly: the sketch bundle travels base64-serialized). */
final case class GraftFileFacts(file: String, rows: Long,
    mins: Map[String, Long], maxs: Map[String, Long], ndvB64: String)

/** `CALL cat.system.analyze('t')` — statistics BACKFILL for files that
  * predate a statistics feature: min/max envelopes and row counts for
  * pre-stats entries (a table that was `enable()`d over existing
  * files), and NDV sketches for files written before `ndv.columns` was
  * set. Iceberg's `compute_table_stats` / Delta's `ANALYZE TABLE`
  * shape, manifest-resident like everything else here.
  *
  * Scale shape: ONE distributed pass over exactly the needy files (the
  * `_file IN (...)` filter prunes everything already analyzed),
  * `groupByKey(_file).mapGroups` with bounded per-group state (a
  * min/max pair and one bounded sketch per column), one manifest
  * advance (dataChange=false — rows unchanged) to land the facts.
  * Re-running is a no-op: analyze is idempotent by construction.
  *
  * Semantics notes, chosen deliberately:
  *  - facts are computed over LIVE rows (the scan applies dv/eq
  *    masks), so backfilled envelopes may be TIGHTER than the
  *    writer's physical ones — still conservative for skipping: the
  *    masked rows they exclude are dead;
  *  - `rows=` is only backfilled on mask-free entries (it means
  *    PHYSICAL rows — the fully-masked-drop arithmetic depends on it);
  *  - a needy file with zero live rows still gets an (empty) sketch
  *    bundle, so table-level NDV reporting is never withheld by a
  *    drained file. */
object GraftAnalyze {
  final case class Result(analyzedFiles: Int, newVersion: Option[Long])

  def analyze(spark: SparkSession, root: Path): Result = {
    require(GraftVersions.isVersioned(root),
      s"analyze needs a versioned table: $root")
    val snap = GraftVersions.latest(root).getOrElse(return Result(0, None))
    val ndvCols = GraftTableMeta.ndvColumns(root)
    val needy = snap.entries.filter { e =>
      e.stats.isEmpty || e.rows.isEmpty || e.bytes.isEmpty ||
        (ndvCols.nonEmpty && e.ndv.isEmpty)
    }
    if (needy.isEmpty) return Result(0, None)
    // numeric columns the pass observes: the writers' fixed stat trio
    // plus any declared NDV column that resolves to a numeric field of
    // the CURRENT schema (strings have no envelope/sketch here)
    val schema = GraftSchemas.tableSchema(root)
    val numeric = schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType => f.name
    }.toSet
    val cols = (Seq("doc_id", "fp", "n_words") ++ ndvCols)
      .distinct.filter(numeric)
    val sketchCols = ndvCols.filter(numeric)
    val baseToName = needy
      .map(e => GraftFiles.baseName(e.name) -> e.name).toMap
    val df = spark.read.format("graft.sources.GraftDocsSource")
      .option("path", root.toString).load()
    val selected = df
      .select((col("_file") +: cols.map(c => col(c).cast("long"))): _*)
      .filter(col("_file").isin(baseToName.keys.toSeq: _*))
    import org.apache.spark.sql.{Encoders, Row}
    implicit val factsEnc = Encoders.product[GraftFileFacts]
    val facts: Map[String, GraftFileFacts] = selected
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .mapGroups { (file: String, rows: Iterator[Row]) =>
        val mins = Array.fill(cols.length)(Long.MaxValue)
        val maxs = Array.fill(cols.length)(Long.MinValue)
        val sketches = sketchCols.map(_ => GraftNdvSketch.empty)
        val sketchIdx = sketchCols.map(cols.indexOf)
        var n = 0L
        rows.foreach { r =>
          var i = 0
          while (i < cols.length) {
            if (!r.isNullAt(i + 1)) {
              val v = r.getLong(i + 1)
              if (v < mins(i)) mins(i) = v
              if (v > maxs(i)) maxs(i) = v
            }
            i += 1
          }
          var s = 0
          while (s < sketchIdx.length) {
            if (!r.isNullAt(sketchIdx(s) + 1))
              sketches(s).add(r.getLong(sketchIdx(s) + 1))
            s += 1
          }
          n += 1
        }
        val observed = cols.indices.filter(i => mins(i) <= maxs(i))
        GraftFileFacts(file, n,
          observed.map(i => cols(i) -> mins(i)).toMap,
          observed.map(i => cols(i) -> maxs(i)).toMap,
          GraftNdv(sketchCols.zip(sketches).toMap).toBase64)
      }
      .collect() // bounded: one row per needy FILE, never per data row
      .map(f => baseToName(f.file) -> f).toMap
    val emptyNdv =
      GraftNdv(sketchCols.map(_ -> GraftNdvSketch.empty).toMap)
    val updated = needy.map { e =>
      val f = facts.get(e.name)
      e.copy(
        stats =
          if (e.stats.nonEmpty) e.stats
          else f.map(x => x.mins.map { case (c, lo) =>
            c -> (lo, x.maxs(c))
          }).getOrElse(e.stats),
        rows =
          if (e.rows.isDefined) e.rows
          else if (e.dv.isEmpty && e.eq.isEmpty) Some(f.map(_.rows)
            .getOrElse(0L))
          else e.rows,
        bytes = e.bytes.orElse(
          try Some(Files.size(root.resolve(e.name)))
          catch { case _: java.io.IOException => None }),
        ndv =
          if (ndvCols.isEmpty || e.ndv.isDefined) e.ndv
          else Some(f.map(x => GraftNdv.fromBase64(x.ndvB64))
            .getOrElse(emptyNdv)))
    }
    val info = GraftVersions.advance(root, "analyze",
      removed = Some(needy.map(_.name).toSet), added = updated,
      dataChange = false, readVersion = Some(snap.version))
    Result(needy.size, Some(info.version))
  }
}
