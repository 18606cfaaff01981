package graft.sources

import java.util.Base64

/** A deletion vector: the sorted set of PHYSICAL row positions masked
  * out of one immutable data file — the merge-on-read half of the
  * row-level-operation story (Delta's deletion vectors / Iceberg's
  * position deletes). A scattered DELETE that copy-on-write would turn
  * into a rewrite of every touched gigabyte instead commits a few
  * hundred bytes of mask per file; readers skip masked positions while
  * streaming the file; OPTIMIZE (compaction) materializes the masks
  * away by rewriting only live rows.
  *
  * Encoding: positions sorted ascending, delta-compressed (gap to the
  * predecessor), each gap LEB128-varint encoded, base64 inline in the
  * manifest line — clustered deletes cost ~1 byte per row. Like the
  * inline blooms ([[GraftTableMeta]]), the 100 TB layout moves large
  * vectors to sidecar files (Delta keeps them in the table's deletion
  * vector directory, Iceberg in puffin files) with the manifest holding
  * a pointer; the mask semantics and the reader's skip loop are
  * unchanged. Positions are 0-based physical row ordinals — they never
  * shift, because the underlying file is never edited in place.
  */
final class GraftDV private (val positions: Array[Long]) extends Serializable {
  def cardinality: Int = positions.length
  def contains(pos: Long): Boolean =
    java.util.Arrays.binarySearch(positions, pos) >= 0
  /** Mask union — a second DELETE on an already-masked file composes. */
  def union(more: Iterable[Long]): GraftDV = GraftDV.of(positions ++ more)

  def toBase64: String = {
    val out = new java.io.ByteArrayOutputStream(positions.length + 8)
    var prev = -1L
    positions.foreach { p =>
      var gap = p - prev // ≥ 1: positions strictly increase
      while ((gap & ~0x7fL) != 0L) {
        out.write(((gap & 0x7f) | 0x80).toInt); gap >>>= 7
      }
      out.write(gap.toInt)
      prev = p
    }
    Base64.getEncoder.encodeToString(out.toByteArray)
  }

  override def toString: String = s"GraftDV(${positions.length} positions)"
}

object GraftDV {
  /** Canonicalize: sorted, distinct, non-negative. */
  def of(ps: Iterable[Long]): GraftDV = {
    val arr = ps.toArray.distinct.sorted
    require(arr.isEmpty || arr.head >= 0,
      s"deletion-vector positions must be non-negative: ${arr.head}")
    new GraftDV(arr)
  }

  def fromBase64(s: String): GraftDV = {
    val bytes = Base64.getDecoder.decode(s)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prev = -1L
    var i = 0
    while (i < bytes.length) {
      var gap = 0L; var shift = 0
      var b = 0
      do {
        b = bytes(i) & 0xff; i += 1
        gap |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      prev += gap
      buf += prev
    }
    new GraftDV(buf.toArray)
  }
}
