package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The DISTINCT character-n-gram keys of a string, as one array of longs —
  * the gram fan-out primitive of the n-gram Jaccard dedup (q43), moved
  * from "explode every position, then DISTINCT corpus-wide" into a single
  * per-document evaluation.
  *
  * Why an Expression beats the composed form twice over:
  *  - the per-document dedup happens in a local hash set DURING the scan,
  *    so the corpus-wide `.distinct()` exchange (the largest shuffle of
  *    the composed q43 plan — one row per character position) disappears:
  *    the explode emits only each document's distinct grams;
  *  - the key is the n gram BYTES packed big-endian into the long
  *    (n ≤ 8), which is INJECTIVE — unlike xxhash64(substr), two distinct
  *    grams can never merge, so the downstream Jaccard is exact by
  *    construction rather than exact-with-negligible-collision-probability.
  *
  * One eval per document with a tight hand-written loop (CodegenFallback —
  * the interpreted boundary is crossed once per row, not once per gram,
  * which is the HOF-lambda pitfall this codebase avoids everywhere).
  * Output order is first-occurrence (LinkedHashSet), deterministic for
  * identical text regardless of partitioning.
  */
case class DistinctGramKeys(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1 && n <= 8, "gram length must fit a packed long (1..8 bytes)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "distinct_gram_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val m = bytes.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      var k = 0L
      var j = 0
      while (j < n) { k = (k << 8) | (bytes(i + j) & 0xffL); j += 1 }
      seen.add(k)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
    newChild: Expression): DistinctGramKeys = copy(child = newChild)
}


/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Spark has no built-in normalizer, and the usual fallback — a Scala
  * `udf()` — breaks whole-stage codegen around every operator that uses
  * it. `java.text.Normalizer` is one static JDK call, so the generated
  * code stays inside the codegen'd stage (same rationale as
  * [[DistinctGramKeys]]: the built-ins genuinely can't express it, the
  * custom expression keeps the pipeline fused). NFC is the canonical
  * composition a text pipeline applies before hashing/dedup — the SAME
  * visible string in composed and decomposed form must dedup together,
  * which is exactly what q157 audits. DuckDB's `nfc_normalize` is the
  * oracle twin. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

/** The DISTINCT word-n-grams of a string, space-joined, as one array of
  * strings — the word-gram sibling of [[DistinctGramKeys]], and the
  * fan-out primitive behind the decontamination/novelty/containment
  * family (q167/q174/q181).
  *
  * Semantics are EXACTLY the composed form
  * `array_distinct(transform(sequence(0, size(w)-n),
  * i -> array_join(slice(w, i+1, n), ' ')))` with
  * `w = filter(split(text, " "), length > 0)` — tokenization splits on
  * the single space byte (0x20 never occurs inside a multi-byte UTF-8
  * sequence, so byte scanning is codepoint-safe) and empty runs vanish.
  * Replacing the chain wins twice: the HOF chain crosses the
  * interpreted-lambda boundary once per POSITION and allocates a slice
  * array plus a joined string per position, while this walks the bytes
  * once per document; and per-document dedup happens DURING the scan,
  * so a downstream per-document `.distinct()` exchange (one row per
  * gram position) disappears entirely. One interpreted call per row
  * (CodegenFallback), first-occurrence output order. */
case class DistinctWordGrams(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "gram length must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_word_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // token spans: maximal runs of non-space bytes
    var nTok = 0
    var i = 0
    val len = bytes.length
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    while (i < len) {
      if (bytes(i) != ' ') {
        starts(nTok) = i
        while (i < len && bytes(i) != ' ') i += 1
        ends(nTok) = i
        nTok += 1
      } else i += 1
    }
    val m = nTok - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    i = 0
    while (i < m) {
      var glen = n - 1
      var j = 0
      while (j < n) { glen += ends(i + j) - starts(i + j); j += 1 }
      val g = new Array[Byte](glen)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { g(p) = ' '; p += 1 }
        val tl = ends(i + j) - starts(i + j)
        System.arraycopy(bytes, starts(i + j), g, p, tl)
        p += tl
        j += 1
      }
      seen.add(UTF8String.fromBytes(g))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
    newChild: Expression): DistinctWordGrams = copy(child = newChild)
}

object TextExprs {
  /** Column API for [[DistinctGramKeys]]. */
  def distinctGramKeys(s: Column, n: Int): Column =
    GraftBridge.column(DistinctGramKeys(GraftBridge.expression(s), n))

  /** Column API for [[NfcNormalize]]. */
  def nfcNormalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))

  /** Column API for [[DistinctWordGrams]]. */
  def distinctWordGrams(s: Column, n: Int): Column =
    GraftBridge.column(DistinctWordGrams(GraftBridge.expression(s), n))
}
