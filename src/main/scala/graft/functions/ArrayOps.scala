package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.{Literal, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.CatalystBridge

/** Set algebra over SORTED long arrays via a single codegen'd static call.
  *
  * `array_intersect`/`array_union` build a hash set per invocation; on an
  * all-pairs similarity join that is millions of transient hash sets. A
  * linear merge over pre-sorted arrays is allocation-free and ~an order of
  * magnitude faster — the arrays are sorted ONCE per document on the build
  * side, then every pair comparison is O(|a|+|b|) sequential reads. This is
  * the difference between the pairwise stage dominating a 100 TB dedup run
  * and it being bandwidth-bound.
  */
object ArrayOps {

  /** Jaccard of two sorted, deduplicated long arrays, rounded to 6 decimals
    * with the same HALF_UP rule as Spark's `round`. Returns 0.0 for an
    * empty union.
    */
  def jaccardSortedLongs(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0
    else java.math.BigDecimal.valueOf(inter.toDouble / union)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  def jaccardSorted(a: Column, b: Column): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, DoubleType, "jaccardSortedLongs",
      Seq(CatalystBridge.expression(a), CatalystBridge.expression(b)),
      Seq(ArrayType(LongType), ArrayType(LongType)),
      returnNullable = false))

  /** Sorted, deduplicated 64-bit hashes of a string array — the compact
    * pair-comparison representation (hash collisions across a document's
    * shingle set are ~2^-64·n² — negligible against the exact-string
    * oracle).
    */
  def sortedHashSet(strings: Column): Column =
    array_sort(array_distinct(transform(strings, s => xxhash64(s))))

  /** Sorted, deduplicated 64-bit hashes of the word n-grams of a token
    * array, computed in one static call. Spark's higher-order functions
    * (`transform`/`aggregate`) are CodegenFallback — every lambda element
    * evaluation is interpreted with boxing. Shingling a 100 TB corpus that
    * way spends more time in the interpreter than in hashing; this loop
    * hashes each token once (FNV-1a 64) and combines n at a time with no
    * intermediate strings or boxing.
    */
  def ngramHashSet(tokens: ArrayData, n: Int): ArrayData = {
    val nt = tokens.numElements()
    if (nt < n) return ArrayData.toArrayData(Array.emptyLongArray)
    val word = new Array[Long](nt)
    var i = 0
    while (i < nt) {
      word(i) = if (tokens.isNullAt(i)) 0L else fnv(tokens.getUTF8String(i))
      i += 1
    }
    val out = new Array[Long](nt - n + 1)
    i = 0
    while (i <= nt - n) {
      var h = 0xCBF29CE484222325L
      var j = 0
      while (j < n) {
        h = (h ^ word(i + j)) * 0x100000001B3L
        j += 1
      }
      out(i) = mix(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    // dedupe in place
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    ArrayData.toArrayData(if (w == out.length) out else out.take(w))
  }

  /** Word n-gram STRINGS of a token array in one static pass — the
    * string twin of [[ngramHashSet]] and the kernel behind
    * `Text.shingles`. The HOF form (`transform(sequence, i =>
    * concat_ws(slice))`) is CodegenFallback: every gram pays an
    * interpreted lambda, a slice allocation, and boxed arithmetic —
    * measured as the dominant cost of every shingle-verified operator
    * at sf0.1. Here each gram is one `UTF8String.concatWs` over a
    * reused token window. NULL tokens are skipped by concatWs exactly
    * as SQL `concat_ws` skips them, so the output is byte-identical to
    * the HOF form it replaces.
    */
  def ngramStrings(tokens: ArrayData,
      n: Int): ArrayData = {
    val nt = tokens.numElements()
    if (nt < n)
      return ArrayData.toArrayData(
        Array.empty[org.apache.spark.unsafe.types.UTF8String])
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](nt)
    var i = 0
    while (i < nt) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](nt - n + 1)
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    i = 0
    while (i <= nt - n) {
      System.arraycopy(toks, i, window, 0, n)
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(
        sep, window: _*)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  def ngramStringsF(tokens: Column, n: Int): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, ArrayType(StringType, containsNull = false),
      "ngramStrings",
      Seq(CatalystBridge.expression(tokens),
        CatalystBridge.expression(lit(n))),
      Seq(ArrayType(StringType), IntegerType),
      returnNullable = false))

  /** Intra-document repeated-span scrub kernel: keep the tokens NOT
    * covered by any duplicate n-gram — a gram (by positional FNV hash,
    * [[ngramHashSet]]'s identity; 2^-64-per-pair collision caveat, the
    * q27 convention) whose value already occurred at an earlier
    * position in the SAME document marks its whole n-token window
    * dropped; the first occurrence's window stays. Tokens past the
    * last gram start are kept unless a duplicate window covers them.
    * One pass, one HashMap of gram→first-position, zero shuffles —
    * the per-row twin of the corpus-wide q139 span removal.
    */
  def dropRepeatedSpanTokens(tokens: ArrayData, n: Int): ArrayData = {
    val nt = tokens.numElements()
    if (nt < n + 1) return tokens // 0 or 1 grams: nothing can repeat
    val word = new Array[Long](nt)
    var i = 0
    while (i < nt) {
      word(i) = if (tokens.isNullAt(i)) 0L else fnv(tokens.getUTF8String(i))
      i += 1
    }
    val first = new java.util.HashMap[java.lang.Long, Integer]()
    val drop = new Array[Boolean](nt)
    var any = false
    var p = 0
    while (p <= nt - n) {
      var h = 0xCBF29CE484222325L
      var j = 0
      while (j < n) {
        h = (h ^ word(p + j)) * 0x100000001B3L
        j += 1
      }
      val hm = mix(h)
      if (first.putIfAbsent(hm, p) != null) {
        any = true
        var t = p
        while (t < p + n) { drop(t) = true; t += 1 }
      }
      p += 1
    }
    if (!any) return tokens
    var kept = 0
    i = 0
    while (i < nt) { if (!drop(i)) kept += 1; i += 1 }
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](kept)
    var w = 0
    i = 0
    while (i < nt) {
      if (!drop(i)) {
        out(w) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
        w += 1
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  def dropRepeatedSpansF(tokens: Column, n: Int): Column =
    CatalystBridge.column(
      StaticInvoke(
        ArrayOps.getClass, ArrayType(StringType, containsNull = true),
        "dropRepeatedSpanTokens",
        Seq(CatalystBridge.expression(tokens),
          CatalystBridge.expression(lit(n))),
        Seq(ArrayType(StringType), IntegerType),
        returnNullable = false))

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003, the
    * MOSS local document-fingerprinting algorithm): positional k-gram
    * FNV hashes, then the minimum hash VALUE of every window of w
    * consecutive gram positions, returned as a sorted distinct set.
    * Detection guarantee (the reason winnowing beats random sampling):
    * two token sequences sharing a verbatim run of ≥ w+k−1 tokens share
    * ≥ w consecutive equal gram hashes, so some window lies entirely
    * inside the run in both documents and selects the same minimum —
    * they ALWAYS share a fingerprint value, while only ~2/(w+1) of gram
    * positions are ever emitted. One pass, monotonic-deque window min,
    * no boxing. Documents with fewer than w gram positions select their
    * global minimum (their only "window").
    */
  def winnowFingerprints(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val nt = tokens.numElements()
    if (nt < k) return ArrayData.toArrayData(Array.emptyLongArray)
    val word = new Array[Long](nt)
    var i = 0
    while (i < nt) {
      word(i) = if (tokens.isNullAt(i)) 0L else fnv(tokens.getUTF8String(i))
      i += 1
    }
    val m = nt - k + 1
    val g = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0xCBF29CE484222325L
      var j = 0
      while (j < k) { h = (h ^ word(i + j)) * 0x100000001B3L; j += 1 }
      g(i) = mix(h)
      i += 1
    }
    val ww = if (w < m) w else m
    val sel = new Array[Long](m)
    var selN = 0
    val dq = new Array[Int](m) // indices with increasing hash values
    var head = 0
    var tail = 0
    i = 0
    while (i < m) {
      // >= pops equal values: the surviving index is the rightmost
      // minimum (the classic winnowing tie-break; immaterial to the
      // VALUE set but it keeps the deque O(m) amortized)
      while (tail > head && g(dq(tail - 1)) >= g(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - ww) head += 1
      if (i >= ww - 1) { sel(selN) = g(dq(head)); selN += 1 }
      i += 1
    }
    val out = java.util.Arrays.copyOf(sel, selN)
    java.util.Arrays.sort(out)
    var wp = 0
    i = 0
    while (i < out.length) {
      if (wp == 0 || out(i) != out(wp - 1)) { out(wp) = out(i); wp += 1 }
      i += 1
    }
    ArrayData.toArrayData(if (wp == out.length) out else out.take(wp))
  }

  def winnow(tokens: Column, k: Int, w: Int): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, ArrayType(LongType, containsNull = false),
      "winnowFingerprints",
      Seq(CatalystBridge.expression(tokens),
        CatalystBridge.expression(lit(k)),
        CatalystBridge.expression(lit(w))),
      Seq(ArrayType(StringType), IntegerType, IntegerType),
      returnNullable = false))

  /** k-permutation MinHash signature of a 64-bit hash set, one tight loop.
    * Permutation coefficients derive from `seed` via splitmix64 (31-bit
    * bounded so a·x+b never overflows a long).
    */
  def minhashSig(hashes: ArrayData, k: Int, seed: Long): ArrayData = {
    val m31 = (1L << 31) - 1
    val out = new Array[Long](k)
    val n = hashes.numElements()
    var j = 0
    while (j < k) {
      val a = (Math.floorMod(mix(seed + 2L * j), m31)) | 1L
      val b = Math.floorMod(mix(seed + 2L * j + 1), m31)
      var mn = m31
      var i = 0
      while (i < n) {
        val x = Math.floorMod(hashes.getLong(i), m31)
        val v = Math.floorMod(a * x + b, m31)
        if (v < mn) mn = v
        i += 1
      }
      out(j) = mn
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  private def fnv(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Cosine similarity of two float vectors, accumulated in double in
    * index order — the exact same arithmetic as the
    * `zip_with`+`aggregate` expression form (and DuckDB's
    * `list_cosine_similarity` over `::DOUBLE[]`), minus the interpreted
    * lambda evaluation per element.
    */
  def cosineFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineF(a: Column, b: Column): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, DoubleType, "cosineFloat",
      Seq(CatalystBridge.expression(a), CatalystBridge.expression(b)),
      Seq(ArrayType(FloatType), ArrayType(FloatType)),
      returnNullable = false))

  /** Cosine over int8 quantization codes (`Quantization.int8`) — the
    * integer ANN scoring kernel: dot and norms accumulate in LONG
    * (exact — 64-dim worst case 64·127² ≈ 2²⁰ per term, nowhere near
    * overflow), one double division at the end. Reads 8× less memory
    * than the float kernel per pair (byte codes vs float32) — at 100 TB
    * the candidate-scoring stage is bandwidth-bound, so that ratio is
    * the speedup. Symmetric quantization has no zero-point, so the
    * scales cancel in cosine and never need to ride along. Zero-code
    * vectors (only all-zero embeddings produce them) yield NaN — filter
    * them out upstream.
    */
  def cosineInt8Codes(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getByte(i).toLong
      val y = b.getByte(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  def cosineInt8(a: Column, b: Column): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, DoubleType, "cosineInt8Codes",
      Seq(CatalystBridge.expression(a), CatalystBridge.expression(b)),
      Seq(ArrayType(ByteType), ArrayType(ByteType)),
      returnNullable = false))

  /** Random-hyperplane bucket id over a float vector — the static twin of
    * [[Vectors.hyperplaneBucket]] (identical ±1 weights derived from
    * splitmix64(seed + plane·1000003 + dim)), one call per row instead of
    * planes×dim interpreted lambda steps.
    */
  def hyperplaneBucketFloat(v: ArrayData, nPlanes: Int, seed: Long): Long = {
    val dim = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var i = 0
      while (i < dim) {
        val w = if (mixPub(seed + p * 1000003L + i) < 0) -1.0 else 1.0
        proj += v.getFloat(i).toDouble * w
        i += 1
      }
      if (proj >= 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }

  def hyperplaneBucketF(v: Column, nPlanes: Int,
      seed: Long = 42L): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, LongType, "hyperplaneBucketFloat",
      Seq(CatalystBridge.expression(v),
        CatalystBridge.expression(lit(nPlanes)),
        CatalystBridge.expression(lit(seed))),
      Seq(ArrayType(FloatType), IntegerType, LongType),
      returnNullable = false))

  /** A float-array literal backed by [[UnsafeArrayData]]: element reads
    * compile to primitive `Platform.getFloat` offsets. `typedLit` encodes
    * the same array as a GenericArrayData of BOXED floats, so a per-row
    * kernel like [[nearestCentroid]] would unbox nCells×dim
    * `java.lang.Float`s per input row — at 100 TB that is billions of
    * allocations-worth of pointer chasing in the hottest loop. The packed
    * literal ships with the plan exactly like any literal (broadcast to
    * every executor once), no driver-side static state involved.
    */
  def packedFloatLit(values: Array[Float]): Column = CatalystBridge.column(
    Literal(UnsafeArrayData.fromPrimitiveArray(values),
      ArrayType(FloatType, containsNull = false)))

  /** Cosine of `v` against every centroid of a flat row-major centroid
    * matrix; returns the index of the best (ties → lowest index). One
    * static call per row keeps the nCells×dim loop inside codegen.
    */
  def nearestCentroid(v: ArrayData, centroids: ArrayData, dim: Int): Long = {
    val n = centroids.numElements() / dim
    var best = 0L
    var bestCos = Double.MinValue
    var c = 0
    while (c < n) {
      val cos = centroidCos(v, centroids, c * dim, dim)
      if (cos > bestCos) { bestCos = cos; best = c.toLong }
      c += 1
    }
    best
  }

  /** The `nProbe` centroid indices nearest to `v`, best first (ties →
    * lower index first) — the query-side cell fan-out of IVF search.
    */
  def topCentroids(v: ArrayData, centroids: ArrayData, dim: Int,
      nProbe: Int): ArrayData = {
    val n = centroids.numElements() / dim
    val cos = new Array[Double](n)
    var c = 0
    while (c < n) { cos(c) = centroidCos(v, centroids, c * dim, dim); c += 1 }
    val idx = Array.tabulate(n)(identity)
    val out = new Array[Long](math.min(nProbe, n))
    var i = 0
    while (i < out.length) {
      var best = -1
      var j = 0
      while (j < n) {
        if (idx(j) >= 0 && (best < 0 || cos(j) > cos(best))) best = j
        j += 1
      }
      out(i) = best.toLong
      idx(best) = -1
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  private def centroidCos(v: ArrayData, centroids: ArrayData, off: Int,
      dim: Int): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble
      val y = centroids.getFloat(off + i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) -1.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def nearestCentroidF(v: Column, centroids: Column, dim: Int): Column =
    CatalystBridge.column(
      StaticInvoke(
        ArrayOps.getClass, LongType, "nearestCentroid",
        Seq(CatalystBridge.expression(v),
          CatalystBridge.expression(centroids),
          CatalystBridge.expression(lit(dim))),
        Seq(ArrayType(FloatType), ArrayType(FloatType), IntegerType),
        returnNullable = false))

  def topCentroidsF(v: Column, centroids: Column, dim: Int,
      nProbe: Int): Column =
    CatalystBridge.column(
      StaticInvoke(
        ArrayOps.getClass, ArrayType(LongType, containsNull = false),
        "topCentroids",
        Seq(CatalystBridge.expression(v),
          CatalystBridge.expression(centroids),
          CatalystBridge.expression(lit(dim)),
          CatalystBridge.expression(lit(nProbe))),
        Seq(ArrayType(FloatType), ArrayType(FloatType), IntegerType,
          IntegerType),
        returnNullable = false))

  def packedLongLit(values: Array[Long]): Column = CatalystBridge.column(
    Literal(UnsafeArrayData.fromPrimitiveArray(values),
      ArrayType(LongType, containsNull = false)))

  /** Exact integer L2² of a quantized vector against every row of a flat
    * row-major centroid matrix; returns [bestIndex, bestDist] with ties
    * going to the lowest index. One static call per row keeps the k×dim
    * loop on primitive longs — the fixed-point k-means assignment kernel
    * (the composed zip_with/aggregate form allocates a zipped array per
    * centroid per row; this allocates nothing but the 2-long result).
    */
  def nearestCentroidL2(v: ArrayData, centroids: ArrayData,
      dim: Int): ArrayData = {
    val n = centroids.numElements() / dim
    var best = 0L
    var bestD = Long.MaxValue
    var c = 0
    while (c < n) {
      val off = c * dim
      var d = 0L
      var i = 0
      while (i < dim) {
        val t = v.getLong(i) - centroids.getLong(off + i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c.toLong }
      c += 1
    }
    ArrayData.toArrayData(Array(best, bestD))
  }

  def nearestCentroidL2F(v: Column, centroids: Column, dim: Int): Column =
    CatalystBridge.column(
      StaticInvoke(
        ArrayOps.getClass, ArrayType(LongType, containsNull = false),
        "nearestCentroidL2",
        Seq(CatalystBridge.expression(v),
          CatalystBridge.expression(centroids),
          CatalystBridge.expression(lit(dim))),
        Seq(ArrayType(LongType), ArrayType(LongType), IntegerType),
        returnNullable = false))

  /** splitmix64 (shared with the hyperplane weights in [[Vectors]]). */
  def mixPub(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def ngramHashes(tokens: Column, n: Int): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, ArrayType(LongType, containsNull = false),
      "ngramHashSet",
      Seq(CatalystBridge.expression(tokens),
        CatalystBridge.expression(lit(n))),
      Seq(ArrayType(StringType), IntegerType),
      returnNullable = false))

  def minhash(hashes: Column, k: Int, seed: Long = 42L): Column =
    CatalystBridge.column(
      StaticInvoke(
        ArrayOps.getClass, ArrayType(LongType, containsNull = false),
        "minhashSig",
        Seq(CatalystBridge.expression(hashes),
          CatalystBridge.expression(lit(k)),
          CatalystBridge.expression(lit(seed))),
        Seq(ArrayType(LongType), IntegerType, LongType),
        returnNullable = false))

  // --- product quantization (PQ) kernels ------------------------------------
  // Codebook layout everywhere: flat row-major floats, subspace j's
  // centroid c starting at (j*ksub + c)*subDim. The vector is
  // L2-NORMALIZED once per call (cosine metric → inner-product PQ), so
  // callers hand in raw embeddings and the codebooks are trained on
  // normalized subvectors.

  /** PQ encode: per subspace, the index (ties → lowest) of the nearest
    * codebook centroid by squared L2 over the normalized subvector —
    * m bytes per vector (ksub ≤ 128). A zero vector normalizes to zero
    * and encodes deterministically like any other point.
    */
  def pqEncode(v: ArrayData, codebooks: ArrayData, m: Int, ksub: Int,
      subDim: Int): ArrayData = {
    val dim = m * subDim
    var n2 = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble; n2 += x * x; i += 1
    }
    val inv = if (n2 == 0.0) 0.0 else 1.0 / math.sqrt(n2)
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * subDim
        var d = 0.0
        var t = 0
        while (t < subDim) {
          val e = v.getFloat(j * subDim + t).toDouble * inv -
            codebooks.getFloat(off + t).toDouble
          d += e * e
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Query-side ADC lookup table: inner products of the normalized
    * query's subvector j against every centroid of subspace j — m·ksub
    * doubles. `Σ_j lut[j·ksub + code_j]` then approximates
    * cosine(query, corpus vector) without touching the corpus floats.
    */
  def pqLut(v: ArrayData, codebooks: ArrayData, m: Int, ksub: Int,
      subDim: Int): ArrayData = {
    val dim = m * subDim
    var n2 = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble; n2 += x * x; i += 1
    }
    val inv = if (n2 == 0.0) 0.0 else 1.0 / math.sqrt(n2)
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * subDim
        var dot = 0.0
        var t = 0
        while (t < subDim) {
          dot += v.getFloat(j * subDim + t).toDouble * inv *
            codebooks.getFloat(off + t).toDouble
          t += 1
        }
        lut(j * ksub + c) = dot
        c += 1
      }
      j += 1
    }
    ArrayData.toArrayData(lut)
  }

  /** ADC score: `Σ_j lut[j·ksub + codes[j]]` — m additions + m table
    * reads per candidate, never the floats. This is the PQ scan kernel:
    * at 100 TB the candidate stage reads m bytes/vector (32× less than
    * float32 at m=8, dim=64) and the LUT rides in cache.
    */
  def pqAdc(lut: ArrayData, codes: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getDouble(j * ksub + codes.getByte(j))
      j += 1
    }
    s
  }

  def pqEncodeF(v: Column, codebooks: Column, m: Int, ksub: Int,
      subDim: Int): Column =
    CatalystBridge.column(
      StaticInvoke(
        ArrayOps.getClass, ArrayType(ByteType, containsNull = false),
        "pqEncode",
        Seq(CatalystBridge.expression(v),
          CatalystBridge.expression(codebooks),
          CatalystBridge.expression(lit(m)),
          CatalystBridge.expression(lit(ksub)),
          CatalystBridge.expression(lit(subDim))),
        Seq(ArrayType(FloatType), ArrayType(FloatType), IntegerType,
          IntegerType, IntegerType),
        returnNullable = false))

  def pqLutF(v: Column, codebooks: Column, m: Int, ksub: Int,
      subDim: Int): Column =
    CatalystBridge.column(
      StaticInvoke(
        ArrayOps.getClass, ArrayType(DoubleType, containsNull = false),
        "pqLut",
        Seq(CatalystBridge.expression(v),
          CatalystBridge.expression(codebooks),
          CatalystBridge.expression(lit(m)),
          CatalystBridge.expression(lit(ksub)),
          CatalystBridge.expression(lit(subDim))),
        Seq(ArrayType(FloatType), ArrayType(FloatType), IntegerType,
          IntegerType, IntegerType),
        returnNullable = false))

  def pqAdcF(lut: Column, codes: Column, ksub: Int): Column =
    CatalystBridge.column(
      StaticInvoke(
        ArrayOps.getClass, DoubleType, "pqAdc",
        Seq(CatalystBridge.expression(lut),
          CatalystBridge.expression(codes),
          CatalystBridge.expression(lit(ksub))),
        Seq(ArrayType(DoubleType), ArrayType(ByteType), IntegerType),
        returnNullable = false))

  /** Exact integer L2² between two long vectors — the SemDeDup pair
    * kernel ([[graft.operators.Clustering.semanticDedup]]): one static
    * call per candidate pair instead of an interpreted
    * `aggregate(zip_with(...))` lambda walking the 64 elements. Same
    * arithmetic to the bit (long subtract/multiply/add), so the SQL
    * oracle replay is unaffected.
    */
  def l2sqLongs(a: ArrayData, b: ArrayData): java.lang.Long = {
    // NULL (not a truncated distance) for ragged or null-holding
    // vectors — exactly what the `aggregate(zip_with(...))` form this
    // kernel replaces (and the SQL oracle) yields, so a malformed
    // embedding drops out of the pair filter instead of silently
    // comparing a prefix (ArrayData.getLong reads null slots as 0)
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  def l2sqL(a: Column, b: Column): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, LongType, "l2sqLongs",
      Seq(CatalystBridge.expression(a), CatalystBridge.expression(b)),
      Seq(ArrayType(LongType), ArrayType(LongType)),
      returnNullable = true))

  /** Exact integer dot product between two long vectors — the
    * quantized-embedding ranking kernel
    * ([[graft.operators.Retrieval.quantizedDotTopK]]): rank order from
    * long multiply/add is bit-identical cross-engine, unlike float
    * cosine whose last-ulp ordering an SQL oracle cannot replay. Same
    * NULL contract as [[l2sqLongs]]: ragged or null-holding vectors
    * return NULL and drop out of the ranking rather than silently
    * scoring a prefix.
    */
  def dotLongs(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  def dotL(a: Column, b: Column): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, LongType, "dotLongs",
      Seq(CatalystBridge.expression(a), CatalystBridge.expression(b)),
      Seq(ArrayType(LongType), ArrayType(LongType)),
      returnNullable = true))

  /** Primitive-return twin of [[l2sqL]] for validated vectors: the
    * caller must guarantee equal-length, null-free arrays (hoist the
    * check to a once-per-ROW `vecCleanL` column instead of paying a
    * boxed nullable return on every O(n²/k) PAIR — `ArrayData.getLong`
    * silently reads a null slot as 0, which is why the guard is part of
    * the contract, not optional). Ragged inputs return Long.MaxValue
    * ("infinitely far": never within a real threshold, which is bounded
    * by dim·(2·scale)² « 2⁶³ for quantized embeddings).
    */
  def l2sqLongsRaw(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements()) return Long.MaxValue
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  def l2sqRawL(a: Column, b: Column): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, LongType, "l2sqLongsRaw",
      Seq(CatalystBridge.expression(a), CatalystBridge.expression(b)),
      Seq(ArrayType(LongType), ArrayType(LongType)),
      returnNullable = false))

  /** True iff a long-array column is present, null-free — the per-row
    * validity hoist that licenses [[l2sqRawL]] in a pair join.
    */
  def vecCleanL(a: Column): Column =
    a.isNotNull && !exists(a, _.isNull)

  /** Order-preserving bijection double → signed long, so a DOUBLE
    * ordering key can ride the long-typed [[TopK.TopKPairs]] heap:
    * `sortableDoubleBits(a) < sortableDoubleBits(b)` iff `a < b` under
    * IEEE total order. `-0.0` is normalized to `0.0` first, so the two
    * zeros map to ONE long and can't invert a (sim DESC, id ASC)
    * tie-break that double comparison would call a tie. The map is its
    * own inverse modulo the sign trick — [[bitsToDouble]] restores the
    * exact double (similarity scores survive the heap round-trip
    * bit-for-bit). NaN never reaches it on the ANN paths (zero vectors
    * are filtered / absent by construction).
    */
  def sortableDoubleBits(d: Double): Long = {
    val n = if (d == 0.0) 0.0 else d
    val b = java.lang.Double.doubleToLongBits(n)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  def bitsToDouble(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))

  def sortableDoubleBitsF(d: Column): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, LongType, "sortableDoubleBits",
      Seq(CatalystBridge.expression(d)), Seq(DoubleType),
      returnNullable = false))

  def bitsToDoubleF(s: Column): Column = CatalystBridge.column(
    StaticInvoke(
      ArrayOps.getClass, DoubleType, "bitsToDouble",
      Seq(CatalystBridge.expression(s)), Seq(LongType),
      returnNullable = false))
}
