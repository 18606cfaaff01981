package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

/** Per-file, per-column DISTINCT-count sketch — the manifest-resident
  * input to DSv2 column statistics (`Statistics.columnStats`), the NDV
  * half of cost-based optimization: join/aggregate cardinality
  * estimates need distinct counts, not just the row/byte totals the
  * scan already reports.
  *
  * Two modes, Iceberg-puffin-style:
  *
  *  - **exact** while a file's column holds at most [[GraftNdv.ExactCap]]
  *    distinct values: the sorted values themselves ride the sketch, so
  *    cross-file UNION (the table-level NDV) is exact — and a DuckDB
  *    oracle can reproduce it bit-for-bit on test data;
  *  - **dense** beyond the cap: a 256-register HyperLogLog (splitmix64
  *    value hash, max-rank registers). Registers union losslessly, so
  *    per-FILE sketches written once keep composing as files compact,
  *    and the estimate is row-order-independent and deterministic.
  *
  * Scale shape: one sketch per (file, column) is written ONCE by the
  * task that wrote the file (O(1) state per column: a bounded set or
  * 256 bytes) and never recomputed; table-level NDV is a driver-side
  * fold over the live manifest — no data file is ever re-read to keep
  * statistics fresh, the same lifecycle as the min/max stats beside it.
  *
  * Capability extension beyond the reference: the notebook
  * (/root/reference/Assignment-python.py) recomputes `countDistinct`
  * per query; here distinctness is a TABLE fact the optimizer reads
  * for free. */
final class GraftNdvSketch private (
    // exact mode: the distinct values (sorted on serialize); null in
    // dense mode
    private var set: scala.collection.mutable.HashSet[Long],
    // dense mode: HLL max-rank registers; null in exact mode
    private var regs: Array[Byte]) extends Serializable {

  def add(v: Long): Unit =
    if (regs != null) addHash(GraftNdvSketch.mix(v))
    else {
      set += v
      if (set.size > GraftNdvSketch.ExactCap) degrade()
    }

  private def degrade(): Unit = {
    regs = new Array[Byte](GraftNdvSketch.M)
    set.foreach(v => addHash(GraftNdvSketch.mix(v)))
    set = null
  }

  private def addHash(h: Long): Unit = {
    val idx = (h >>> 56).toInt // top 8 bits pick the register (M=256)
    val w = h << 8             // rank of the remaining 56 bits
    val rank =
      (if (w == 0L) 57 else java.lang.Long.numberOfLeadingZeros(w) + 1)
        .toByte
    if (regs(idx) < rank) regs(idx) = rank
  }

  def isExact: Boolean = regs == null

  /** Lossless union (exact∪exact stays exact under the cap; anything
    * else unions registers). Does not mutate either side. */
  def merge(o: GraftNdvSketch): GraftNdvSketch =
    if (isExact && o.isExact && (set.size + o.set.size
        <= 2 * GraftNdvSketch.ExactCap)) {
      val s = scala.collection.mutable.HashSet.empty[Long]
      s ++= set; s ++= o.set
      if (s.size <= GraftNdvSketch.ExactCap) new GraftNdvSketch(s, null)
      else {
        val m = new GraftNdvSketch(s, null); m.degrade(); m
      }
    } else {
      val a = toDenseRegs; val b = o.toDenseRegs
      val r = new Array[Byte](GraftNdvSketch.M)
      var i = 0
      while (i < r.length) {
        r(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1
      }
      new GraftNdvSketch(null, r)
    }

  private def toDenseRegs: Array[Byte] =
    if (regs != null) regs
    else {
      val r = new Array[Byte](GraftNdvSketch.M)
      set.foreach { v =>
        val h = GraftNdvSketch.mix(v)
        val idx = (h >>> 56).toInt
        val w = h << 8
        val rank =
          (if (w == 0L) 57
           else java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
        if (r(idx) < rank) r(idx) = rank
      }
      r
    }

  def estimate: Long =
    if (isExact) set.size.toLong
    else {
      val m = GraftNdvSketch.M.toDouble
      var sum = 0.0; var zeros = 0; var i = 0
      while (i < regs.length) {
        sum += math.pow(2.0, -regs(i).toDouble)
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val e = alpha * m * m / sum
      val corrected =
        if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros.toDouble)
        else e
      math.round(corrected)
    }

  /** `e:<base64 longs, sorted>` or `h:<base64 registers>` — canonical
    * (sorted exact values) so identical contents serialize identically. */
  def toToken: String =
    if (isExact) {
      val vs = set.toArray; java.util.Arrays.sort(vs)
      val bb = java.nio.ByteBuffer.allocate(vs.length * 8)
      vs.foreach(bb.putLong)
      "e:" + Base64.getEncoder.encodeToString(bb.array())
    } else "h:" + Base64.getEncoder.encodeToString(regs)
}

object GraftNdvSketch {
  /** Exact-mode bound: past this many distinct values the sketch
    * degrades to HLL registers. 1024 longs = 8 KiB worst case, which
    * the manifest's sidecar spill keeps off the log lines. */
  val ExactCap = 1024
  /** HLL register count (2^8): ~6.5% standard error — join-order
    * estimation needs the magnitude, not the third digit. */
  val M = 256

  def empty: GraftNdvSketch =
    new GraftNdvSketch(scala.collection.mutable.HashSet.empty[Long], null)

  /** splitmix64 finalizer (public-domain mixing constants): the value
    * hash behind register selection — deterministic across JVMs. */
  def mix(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def fromToken(t: String): GraftNdvSketch = {
    require(t.length >= 2 && t.charAt(1) == ':',
      s"malformed ndv sketch token '$t'")
    val payload = Base64.getDecoder.decode(t.substring(2))
    t.charAt(0) match {
      case 'e' =>
        val s = scala.collection.mutable.HashSet.empty[Long]
        val bb = java.nio.ByteBuffer.wrap(payload)
        while (bb.remaining() >= 8) s += bb.getLong
        new GraftNdvSketch(s, null)
      case 'h' =>
        require(payload.length == M, s"ndv register block of " +
          s"${payload.length} bytes (want $M)")
        new GraftNdvSketch(null, payload)
      case other =>
        throw new IllegalStateException(s"unknown ndv mode '$other'")
    }
  }
}

/** The per-FILE bundle: one sketch per tracked column. Travels in the
  * manifest as the `ndv=` blob token (sidecar-spilled past the inline
  * bound, like blooms). */
final case class GraftNdv(cols: Map[String, GraftNdvSketch])
    extends Serializable {
  /** Column-wise union; columns missing on EITHER side drop out — an
    * absent sketch must widen to "unknown", never to a wrong count. */
  def merge(o: GraftNdv): GraftNdv =
    GraftNdv((cols.keySet intersect o.cols.keySet).map { c =>
      c -> cols(c).merge(o.cols(c))
    }.toMap)

  def toBase64: String = {
    val text = cols.toSeq.sortBy(_._1)
      .map { case (c, s) => s"$c:${s.toToken}" }.mkString(";")
    Base64.getEncoder.encodeToString(text.getBytes(StandardCharsets.UTF_8))
  }
}

object GraftNdv {
  def fromBase64(b64: String): GraftNdv = {
    val text = new String(Base64.getDecoder.decode(b64),
      StandardCharsets.UTF_8)
    GraftNdv(text.split(";").filter(_.nonEmpty).map { tok =>
      val i = tok.indexOf(':')
      require(i > 0, s"malformed ndv column token '$tok'")
      tok.substring(0, i) -> GraftNdvSketch.fromToken(tok.substring(i + 1))
    }.toMap)
  }
}
