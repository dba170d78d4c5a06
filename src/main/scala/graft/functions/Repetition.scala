package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.CatalystBridge

/** Repetition-based quality signals (the Gopher filters, Rae et al.
  * 2021 §A1.1): excessive within-document repetition — one n-gram
  * dominating the text, or large stretches covered by repeated
  * n-grams — is the strongest cheap signal of boilerplate/spam, and
  * every production curation stack filters on it.
  *
  * The whole computation is PER-DOCUMENT — at 100 TB it must be a
  * projection, never a shuffle. Exploding (doc, n-gram) pairs and
  * re-aggregating would shuffle O(corpus tokens) rows to compute a
  * doc-local statistic, so the counting runs as one codegen'd static
  * call over the token array (the [[ArrayOps]] pattern): hash the
  * doc's n-grams, find the modal gram and the duplicated set, and
  * measure character coverage — O(tokens × n) per document, zero
  * allocation outside the call.
  *
  * Fractions are returned in integer MICRO-units with the division
  * done last (`chars × 1e6 div totalChars`), so SQL oracles replay the
  * exact value with no float drift.
  */
object Repetition {

  /** Kernel: `[topCoverMicro, dupCoverMicro]` for word n-grams of
    * `toks`.
    *
    *  - topCoverMicro — characters in token positions covered by any
    *    occurrence of THE most frequent n-gram (ties broken toward the
    *    lexicographically smallest space-joined gram), ×1e6 div total
    *    token characters;
    *  - dupCoverMicro — same, for positions covered by any n-gram
    *    occurring ≥ 2 times in the document.
    *
    * Coverage is positional (a token inside two duplicated windows
    * counts once), so both fractions are ≤ 1. Documents shorter than
    * `n` tokens, or with zero total characters, return `[0, 0]`.
    */
  // Character counts and the modal tie-break are CODE-POINT semantics,
  // matching the SQL oracle (DuckDB length() counts code points and its
  // binary collation orders by UTF-8 bytes == code-point order).
  // String.length / String.compareTo would diverge on supplementary-
  // plane text: UTF-16 counts them as 2 units and orders surrogates
  // below [U+E000,U+FFFF].
  private def cpLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def ngramCoverStats(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val zero = () =>
      UnsafeArrayData.fromPrimitiveArray(Array(0L, 0L))
    if (m < n) return zero()
    val ts = new Array[String](m)
    var totalChars = 0L
    var i = 0
    while (i < m) {
      val s = if (toks.isNullAt(i)) "" else toks.getUTF8String(i).toString
      ts(i) = s
      totalChars += cpLen(s)
      i += 1
    }
    if (totalChars == 0L) return zero()
    val nGrams = m - n + 1
    val grams = new Array[String](nGrams)
    val counts = new java.util.HashMap[String, Integer](nGrams * 2)
    var s = 0
    while (s < nGrams) {
      val sb = new java.lang.StringBuilder(ts(s))
      var j = 1
      while (j < n) { sb.append(' ').append(ts(s + j)); j += 1 }
      val g = sb.toString
      grams(s) = g
      counts.merge(g, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      s += 1
    }
    var top: String = null
    var topC = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue
      if (c > topC || (c == topC && cpCompare(e.getKey, top) < 0)) {
        top = e.getKey; topC = c
      }
    }
    val topCov = new Array[Boolean](m)
    val dupCov = new Array[Boolean](m)
    s = 0
    while (s < nGrams) {
      val isTop = grams(s) == top
      val isDup = counts.get(grams(s)).intValue >= 2
      if (isTop || isDup) {
        var j = 0
        while (j < n) {
          if (isTop) topCov(s + j) = true
          if (isDup) dupCov(s + j) = true
          j += 1
        }
      }
      s += 1
    }
    var topChars = 0L
    var dupChars = 0L
    i = 0
    while (i < m) {
      if (topCov(i)) topChars += cpLen(ts(i))
      if (dupCov(i)) dupChars += cpLen(ts(i))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(
      topChars * 1000000L / totalChars, dupChars * 1000000L / totalChars))
  }

  /** Column form of [[ngramCoverStats]]: `array<bigint>` of
    * `[topCoverMicro, dupCoverMicro]`.
    */
  def ngramCoverStatsF(toks: Column, n: Int): Column =
    CatalystBridge.column(
      StaticInvoke(
        Repetition.getClass, ArrayType(LongType, containsNull = false),
        "ngramCoverStats",
        Seq(CatalystBridge.expression(toks),
          CatalystBridge.expression(lit(n))),
        Seq(ArrayType(StringType), IntegerType),
        returnNullable = false))
}
