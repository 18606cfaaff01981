package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Base64

/** Per-table metadata for the warehouse personality, beyond the version
  * log: a `_table.properties` key=value store (written once at CREATE,
  * read by the write/scan paths) carrying the two write-time quality
  * faces a curated 100 TB corpus needs:
  *
  *  - `check.<name> = <boolean SQL expr>` — CHECK constraints enforced
  *    on every row of every write (batch, streaming, and the COW
  *    row-level rewrites all funnel through the same writer), Delta's
  *    constraint contract: a violating WRITE fails as a unit and the
  *    staged commit never lands, so bad data cannot enter the table at
  *    all — cheaper than quarantining it after the fact;
  *  - `bloom.columns = c1,c2` (+ optional `bloom.bits`) — per-file
  *    Bloom filters over the named columns' values, recorded in the
  *    commit manifest next to the min/max stats. Blooms answer the
  *    query min/max can't: point lookups on HIGH-CARDINALITY columns a
  *    file is NOT clustered by (a doc_id-clustered file spans the whole
  *    fp domain, so fp min/max prunes nothing; its fp bloom prunes it
  *    in O(1)). False positives only cost a scanned file; a bloom miss
  *    is a proof of absence — pruning stays exact.
  *
  * The blooms live inline in the manifest (base64) — the minimal
  * complete form. At 100 TB they would move to sidecar files keyed by
  * part-file name (Iceberg's puffin / Delta's index folder) with the
  * manifest holding offsets; the probe-side logic is unchanged.
  */
object GraftTableMeta {
  private val FILE = "_table.properties"

  /** Persist CREATE-time table properties (minus the ones that are
    * commands, not state). Written via temp+ATOMIC_MOVE like the
    * manifests; absent file = no properties. */
  def write(root: Path, props: Map[String, String]): Unit = {
    if (props.isEmpty) return
    props.foreach { case (k, v) =>
      require(!k.contains('=') && !(k + v).exists(c => c == '\n' || c == '\t'),
        s"table property '$k' must be single-line and '='-free in the key")
    }
    Files.createDirectories(root)
    val body = props.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(root, "props-", ".tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, root.resolve(FILE), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Replace the property store wholesale (ALTER TABLE): unlike
    * [[write]], an empty map is meaningful here — it clears every
    * property (UNSET of the last one). */
  def replaceAll(root: Path, props: Map[String, String]): Unit =
    if (props.isEmpty) Files.deleteIfExists(root.resolve(FILE))
    else write(root, props)

  def read(root: Path): Map[String, String] = {
    val f = root.resolve(FILE)
    if (!Files.isRegularFile(f)) return Map.empty
    import scala.jdk.CollectionConverters._
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .map(_.trim).filter(_.nonEmpty).map { l =>
        val i = l.indexOf('=')
        require(i > 0, s"malformed table property line '$l' in $f")
        l.substring(0, i) -> l.substring(i + 1)
      }.toMap
  }

  /** `check.<name>` constraint expressions, keyed by name. */
  def checkConstraints(root: Path): Seq[(String, String)] =
    read(root).toSeq.collect {
      case (k, v) if k.startsWith("check.") => k.stripPrefix("check.") -> v
    }.sortBy(_._1)

  /** Declared CURRENT bucket layout, persisted at CREATE from a
    * `PARTITIONED BY (bucket(n, col))` transform as
    * `layout.bucket=<col>:<n>`, and evolvable by ALTER through
    * [[evolveBucketLayout]] (Iceberg's partition-spec evolution): each
    * evolution appends to `layout.spec.history`, whose INDEX is the
    * spec id manifest entries record (`spec=` token; absent = spec 0).
    * A file's bucket id is only meaningful under the spec it was
    * written with, so the scan honors the layout only while every live
    * file carries the CURRENT spec — mixed-spec snapshots degrade to
    * unknown partitioning (never a wrong grouping), and a full
    * OPTIMIZE rewrite migrates everything to the current spec. */
  def bucketLayout(root: Path): Option[(String, Int)] =
    read(root).get("layout.bucket").map(parseLayout)

  private def parseLayout(v: String): (String, Int) = {
    val i = v.lastIndexOf(':')
    require(i > 0, s"malformed bucket layout '$v'")
    (v.substring(0, i), v.substring(i + 1).toInt)
  }

  /** Every layout this table has ever declared, indexed by spec id.
    * A pre-evolution table (no history key) has its CREATE layout as
    * spec 0; an unbucketed table has no specs at all. */
  def specHistory(root: Path): Seq[(String, Int)] = {
    val p = read(root)
    p.get("layout.spec.history") match {
      case Some(h) => h.split(";").toSeq.filter(_.nonEmpty).map(parseLayout)
      case None => p.get("layout.bucket").map(parseLayout).toSeq
    }
  }

  /** Current spec id = the last index of the history. */
  def currentSpecId(root: Path): Int = specHistory(root).length - 1

  /** Append a new bucket layout as the next spec (ALTER-time; caller
    * validates shape and holds the table lock). */
  def evolveBucketLayout(root: Path, col: String, n: Int): Int = {
    val hist = specHistory(root) :+ (col, n)
    write(root, read(root) +
      ("layout.bucket" -> s"$col:$n") +
      ("layout.spec.history" ->
        hist.map { case (c, b) => s"$c:$b" }.mkString(";")))
    hist.length - 1
  }

  /** Named snapshot refs (Iceberg-style TAGS): `ref.tag.<name> =
    * <version>`. A tag is (a) a human-readable time-travel pin —
    * `VERSION AS OF 'name'` resolves through here — and (b) a
    * retention pin: [[GraftVersions.vacuum]] never expires a tagged
    * snapshot. The reproducibility contract for a training run:
    * `tag('corpus', 'run-2026-08-14', v)` makes "the exact bytes run X
    * trained on" addressable forever, immune to retention. Managed by
    * the `tag`/`drop_tag` procedures (not ALTER — a tag names a
    * version, validation needs the log). */
  def tags(root: Path): Map[String, Long] =
    read(root).collect {
      case (k, v) if k.startsWith("ref.tag.") =>
        k.stripPrefix("ref.tag.") -> v.toLong
    }

  def setTag(root: Path, name: String, version: Long): Unit = {
    require(name.nonEmpty && !name.exists(c =>
      c == '=' || c == '\n' || c == '\t'),
      s"tag name must be non-empty and free of '='/tabs/newlines: '$name'")
    require(name.toLongOption.isEmpty,
      s"tag name '$name' would shadow numeric version identifiers")
    write(root, read(root) + (s"ref.tag.$name" -> version.toString))
  }

  /** Returns true if the tag existed. */
  def dropTag(root: Path, name: String): Boolean = {
    val cur = read(root)
    val k = s"ref.tag.$name"
    if (!cur.contains(k)) false
    else { replaceAll(root, cur - k); true }
  }

  /** Columns to build per-file blooms for (empty = blooms off). */
  def bloomColumns(root: Path): Seq[String] = {
    val p = read(root)
    p.get("bloom.columns").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
  }
  def bloomBits(root: Path): Int =
    read(root).get("bloom.bits").flatMap(_.toIntOption).getOrElse(32768)

  /** NDV statistics columns (`ndv.columns = a,b,c`): the writers keep
    * a per-file distinct sketch ([[GraftNdvSketch]]) for each listed
    * numeric column, and the scan folds them into DSv2 column
    * statistics for the cost-based optimizer. Opt-in like blooms —
    * write-path work must be asked for. */
  def ndvColumns(root: Path): Seq[String] = {
    val p = read(root)
    p.get("ndv.columns").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
  }

  /** Schema-evolution registry: `schema.added = name:type:since,...` —
    * the ordered list of columns appended to the base schema by
    * `ALTER TABLE ... ADD COLUMN`, each stamped with the table version
    * at which it appeared (`since`), so time travel to an earlier
    * snapshot presents the PRE-evolution shape. Append-only by
    * construction: a column's list index is its permanent TSV position
    * (4 + index), which is what lets files written under ANY schema
    * version coexist — an old file simply has fewer columns, and the
    * reader NULL-backfills the missing tail. Managed exclusively by
    * the catalog's AddColumn path (the key is not ALTER-settable). */
  def addedColumns(root: Path): Seq[GraftSchemas.AddedColumn] =
    read(root).get("schema.added").toSeq.flatMap(_.split(",", -1))
      .filter(_.nonEmpty).map { tok =>
        tok.split(":", -1) match {
          case Array(n, t, s) => GraftSchemas.AddedColumn(n, t, s.toLong)
          case Array(n, t, s, d) =>
            // 4th segment: base64 of the column's DEFAULT value (the
            // value itself, not SQL text — base64 keeps the registry's
            // ':'/',' encoding safe for any string default)
            GraftSchemas.AddedColumn(n, t, s.toLong,
              Some(new String(Base64.getDecoder.decode(d),
                StandardCharsets.UTF_8)))
          case _ => throw new IllegalStateException(
            s"malformed schema.added token '$tok' at $root")
        }
      }

  def appendAddedColumn(root: Path, c: GraftSchemas.AddedColumn): Unit = {
    val cur = read(root)
    val tok = s"${c.name}:${c.tpe}:${c.since}" +
      c.default.map(d => ":" + Base64.getEncoder.encodeToString(
        d.getBytes(StandardCharsets.UTF_8))).getOrElse("")
    val joined = cur.get("schema.added").map(_ + "," + tok).getOrElse(tok)
    write(root, cur + ("schema.added" -> joined))
  }

  /** Column-mutation registry: `schema.mutations = kind:idx:arg:since,
    * ...` — the append-only log of RENAME/DROP/WIDEN operations on
    * EVOLVED columns, each addressed by its permanent `schema.added`
    * index (the column's field id — the TSV position never moves; the
    * name, visibility, and read type layered on top of it do). A
    * rename's `arg` is the new display name, a widen's the new type,
    * a drop's is empty. Time travel replays the log only up to the
    * pinned version, so a `VERSION AS OF` below a rename presents the
    * old name, below a drop still presents the column, and below a
    * widen the old type. Managed exclusively by the catalog's
    * RenameColumn/DeleteColumn/UpdateColumnType paths (the key is not
    * ALTER-settable). */
  def mutations(root: Path): Seq[GraftSchemas.ColumnMutation] =
    read(root).get("schema.mutations").toSeq.flatMap(_.split(","))
      .filter(_.nonEmpty).map { tok =>
        tok.split(":", -1) match {
          case Array(k, i, a, s) =>
            GraftSchemas.ColumnMutation(k, i.toInt, a, s.toLong)
          case _ => throw new IllegalStateException(
            s"malformed schema.mutations token '$tok' at $root")
        }
      }

  def appendMutation(root: Path, m: GraftSchemas.ColumnMutation): Unit = {
    val cur = read(root)
    val tok = s"${m.kind}:${m.idx}:${m.arg}:${m.since}"
    val joined =
      cur.get("schema.mutations").map(_ + "," + tok).getOrElse(tok)
    write(root, cur + ("schema.mutations" -> joined))
  }

  /** Generated columns (`GENERATED ALWAYS AS (expr)`, CREATE-time
    * only): `schema.generated = <idx>:<b64 sql>,...` — the generation
    * expression SQL keyed by the column's permanent `schema.added`
    * index. The writer computes the expression for omitted/NULL cells
    * and enforces explicit values against it (Delta's contract);
    * base64 keeps arbitrary SQL safe in the ':'/',' registry encoding.
    * Managed exclusively by the catalog's CREATE path. */
  def generatedExprs(root: Path): Map[Int, String] =
    read(root).get("schema.generated").toSeq.flatMap(_.split(","))
      .filter(_.nonEmpty).map { tok =>
        val i = tok.indexOf(':')
        require(i > 0, s"malformed schema.generated token '$tok' at $root")
        tok.substring(0, i).toInt -> new String(
          Base64.getDecoder.decode(tok.substring(i + 1)),
          StandardCharsets.UTF_8)
      }.toMap

  def appendGenerated(root: Path, idx: Int, sql: String): Unit = {
    val cur = read(root)
    val tok = s"$idx:" + Base64.getEncoder.encodeToString(
      sql.getBytes(StandardCharsets.UTF_8))
    val joined =
      cur.get("schema.generated").map(_ + "," + tok).getOrElse(tok)
    write(root, cur + ("schema.generated" -> joined))
  }

  /** Identity columns (`GENERATED ALWAYS/BY DEFAULT AS IDENTITY`,
    * CREATE-time only): `schema.identity = <idx>:<start>:<step>:<e>,
    * ...` — e=1 allows explicit inserts (BY DEFAULT), e=0 rejects them
    * (ALWAYS). Values are allocated block-wise from the high-water
    * mark ([[identityHwm]]) under the table's commit lock. */
  def identitySpecs(root: Path): Map[Int, (Long, Long, Boolean)] =
    read(root).get("schema.identity").toSeq.flatMap(_.split(","))
      .filter(_.nonEmpty).map { tok =>
        tok.split(":", -1) match {
          case Array(i, st, sp, e) =>
            i.toInt -> ((st.toLong, sp.toLong, e == "1"))
          case _ => throw new IllegalStateException(
            s"malformed schema.identity token '$tok' at $root")
        }
      }.toMap

  def appendIdentity(root: Path, idx: Int, start: Long, step: Long,
      allowExplicit: Boolean): Unit = {
    val cur = read(root)
    val tok = s"$idx:$start:$step:${if (allowExplicit) 1 else 0}"
    val joined =
      cur.get("schema.identity").map(_ + "," + tok).getOrElse(tok)
    write(root, cur + ("schema.identity" -> joined))
  }

  /** Identity high-water mark: the next UNUSED value of the column
    * (in `start + k*step` units). Absent = nothing allocated yet —
    * allocation starts at `start`. Written only under the table's
    * commit lock (block reservation at write planning; explicit-value
    * catch-up at commit). */
  def identityHwm(root: Path, idx: Int): Option[Long] =
    read(root).get(s"identity.hwm.$idx").map(_.toLong)

  def setIdentityHwm(root: Path, idx: Int, v: Long): Unit =
    write(root, read(root) + (s"identity.hwm.$idx" -> v.toString))
}

/** The evolved-schema view of a warehouse table: fixed base columns
  * plus the `ALTER TABLE ADD COLUMN` tail from [[GraftTableMeta]],
  * optionally filtered to a pinned snapshot's shape (a `VERSION AS OF`
  * read older than a column's `since` does not see it — Delta's
  * time-travel-to-old-schema behavior). */
object GraftSchemas {
  import org.apache.spark.sql.types._

  /** Evolvable column types — the TSV codec and NULL backfill are
    * implemented for exactly these. */
  val Types: Set[String] = Set("long", "int", "string")

  final case class AddedColumn(name: String, tpe: String, since: Long,
      default: Option[String] = None) {
    def dataType: DataType = tpe match {
      case "long" => LongType
      case "int" => IntegerType
      case "string" => StringType
      case other => throw new IllegalStateException(
        s"unsupported evolved column type '$other' for '$name'")
    }
    def field: StructField = StructField(name, dataType, nullable = true)
  }

  /** The SQL-literal rendering of a stored default value — what rides
    * in the `CURRENT_DEFAULT`/`EXISTS_DEFAULT` field metadata so
    * Spark's analyzer fills omitted columns on INSERT and resolves the
    * `DEFAULT` keyword. */
  def defaultSql(tpe: String, value: String): String =
    if (tpe == "string") "'" + value.replace("'", "''") + "'" else value

  /** One RENAME or DROP of an evolved column, addressed by its
    * permanent `schema.added` index (`idx` — the field id). */
  final case class ColumnMutation(kind: String, idx: Int, arg: String,
      since: Long)

  /** The effective view of one `schema.added` entry at a version pin:
    * its CURRENT display name (latest rename at or below the pin, else
    * the ADD-time name), its permanent index, whether it is visible
    * (added at or below the pin and not yet dropped), and its DEFAULT
    * value (frozen at ADD time). The full registry keeps its indices —
    * position math never depends on the pin, only names and visibility
    * do. */
  final case class EffectiveColumn(name: String, tpe: String, idx: Int,
      visible: Boolean, default: Option[String] = None,
      // generated/identity columns: the analyzer fills INSERT
      // omissions with NULL (the writer recognizes the NULL cell and
      // computes the value), so users can INSERT without naming them
      fillNull: Boolean = false) {
    def tsvPos: Int = 4 + idx
    def field: StructField = {
      val plain = AddedColumn(name, tpe, 0L).field
      default match {
        case Some(d) =>
          // both metadata faces carry the same frozen literal: the
          // analyzer fills INSERT omissions from CURRENT_DEFAULT, and
          // EXISTS_DEFAULT documents what pre-ADD rows read as (the
          // reader applies it to short rows itself)
          val sql = GraftSchemas.defaultSql(tpe, d)
          plain.copy(metadata = new MetadataBuilder()
            .putString("CURRENT_DEFAULT", sql)
            .putString("EXISTS_DEFAULT", sql).build())
        case None if fillNull =>
          // CURRENT_DEFAULT only: generated/identity columns exist
          // from CREATE, so no pre-existing short rows need a default
          plain.copy(metadata = new MetadataBuilder()
            .putString("CURRENT_DEFAULT", "NULL").build())
        case None => plain
      }
    }
  }

  def effectiveAdded(root: Path,
      versionPin: Option[Long] = None): Seq[EffectiveColumn] = {
    val muts = GraftTableMeta.mutations(root)
      .filter(m => versionPin.forall(_ >= m.since))
    val computed = GraftTableMeta.generatedExprs(root).keySet ++
      GraftTableMeta.identitySpecs(root).keySet
    GraftTableMeta.addedColumns(root).zipWithIndex.map { case (c, i) =>
      val mine = muts.filter(_.idx == i)
      EffectiveColumn(
        mine.filter(_.kind == "rename").lastOption.map(_.arg)
          .getOrElse(c.name),
        mine.filter(_.kind == "widen").lastOption.map(_.arg)
          .getOrElse(c.tpe),
        i,
        visible = versionPin.forall(_ >= c.since) &&
          !mine.exists(_.kind == "drop"),
        default = c.default,
        fillNull = computed(i))
    }
  }

  /** Added columns visible at `versionPin` (None = live shape), under
    * their pin-current display names. */
  def visibleAdded(root: Path,
      versionPin: Option[Long]): Seq[EffectiveColumn] =
    effectiveAdded(root, versionPin).filter(_.visible)

  def tableSchema(root: Path, versionPin: Option[Long] = None): StructType =
    StructType(GraftDocsSourceSchema.base.fields.toSeq ++
      visibleAdded(root, versionPin).map(_.field))

  /** Writer-side plan for the added tail: every registry position is
    * ALWAYS written (in registry order, so TSV positions stay stable —
    * a DROPPED column keeps its slot and writes NULL forever); a live
    * column is matched to the incoming write schema by its CURRENT
    * display name, and one absent from the write schema writes NULL. */
  def writerAdded(root: Path,
      writeSchema: StructType): Seq[(String, String, Int)] =
    effectiveAdded(root).map { c =>
      (c.name, c.tpe,
        if (c.visible && writeSchema.fieldNames.contains(c.name))
          writeSchema.fieldIndex(c.name)
        else -1)
    }

  /** Reader-side plan at a version pin: (display name, type, TSV
    * position, default) for each VISIBLE evolved column — a dropped
    * column's name resolves to nothing (its cells are unreachable), a
    * renamed column resolves under the pin-current name, and a short
    * row (written before the column existed) reads the default instead
    * of NULL when one is declared. */
  def readerAdded(root: Path, versionPin: Option[Long] = None)
      : Seq[(String, String, Int, Option[String])] =
    visibleAdded(root, versionPin)
      .map(c => (c.name, c.tpe, c.tsvPos, c.default))
}

/** Base schema indirection so this file stays import-light: the
  * canonical 4-column shape lives in GraftDocsSource; mirrored here to
  * avoid a circular val-initialization order dependency. */
object GraftDocsSourceSchema {
  import org.apache.spark.sql.types._
  val base: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("fp", LongType, nullable = false),
    StructField("n_words", IntegerType, nullable = false)))
}

/** A plain blocked Bloom-free Bloom filter (k=5 double-hashed probes
  * over an m-bit array). Keys are strings of the form `col:value` so
  * one filter per file serves every bloom-enabled column; both hashes
  * are FNV-1a variants over the UTF-8 bytes — stable across JVMs,
  * no dependency on JVM hashCode. */
final class GraftBloom(val bits: Array[Long]) extends Serializable {
  private def m: Int = bits.length * 64

  private def h1(key: String): Long = {
    var h = 0xcbf29ce484222325L
    val b = key.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }
  private def h2(key: String): Long = {
    var h = 0x9e3779b97f4a7c15L
    val b = key.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xffL)) * 0xff51afd7ed558ccdL
      h ^= (h >>> 33); i += 1
    }
    h | 1L // odd stride so probes cover the array
  }

  def add(key: String): Unit = {
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < GraftBloom.K) {
      val bit = java.lang.Long.remainderUnsigned(a + i * b, m).toInt
      bits(bit >> 6) |= (1L << (bit & 63)); i += 1
    }
  }

  /** false = DEFINITELY absent (safe to skip the file). */
  def mightContain(key: String): Boolean = {
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < GraftBloom.K) {
      val bit = java.lang.Long.remainderUnsigned(a + i * b, m).toInt
      if ((bits(bit >> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBase64: String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    Base64.getEncoder.encodeToString(bb.array())
  }
}

object GraftBloom {
  val K = 5
  def empty(mBits: Int): GraftBloom = {
    require(mBits >= 64 && mBits % 64 == 0, s"bloom bits must be a " +
      s"positive multiple of 64: $mBits")
    new GraftBloom(new Array[Long](mBits / 64))
  }
  def fromBase64(s: String): GraftBloom = {
    val bytes = Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val arr = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < arr.length) { arr(i) = bb.getLong; i += 1 }
    new GraftBloom(arr)
  }
  def key(col: String, value: String): String = s"$col:$value"
}
