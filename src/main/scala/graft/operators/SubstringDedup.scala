package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT substring-level deduplication (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better") — the dedup modality the
  * shingle/MinHash family ([[Dedup]]) cannot provide: find every MAXIMAL
  * substring of length ≥ `minLen` that occurs more than once ANYWHERE in
  * the corpus (any document, any offset, overlaps and self-repeats
  * included), exactly — no approximate membership, no hash-only
  * verdicts. This is the pass real pipelines run after document-level
  * dedup: boilerplate headers, licence blocks, and templated paragraphs
  * duplicate across otherwise-distinct documents, and only substring
  * spans catch them.
  *
  * (Beyond-reference operator; the reference flattens documents and has
  * no notion of content duplication.)
  *
  * Algorithm — the suffix-array result re-expressed as anchor grouping,
  * which distributes where a suffix array does not: a maximal duplicated
  * substring of length ≥ L is EXACTLY a maximal run of consecutive
  * positions whose length-L window ("anchor") occurs ≥ 2 times in the
  * corpus. So: enumerate anchors (one per character position), find the
  * duplicated ones, and merge consecutive duplicated positions per
  * document into spans (gaps-and-islands over the position sequence).
  *
  * Scale shape (what survives 100 TB):
  *  - anchors are never materialized with their text for the heavy
  *    first pass: stage 1 groups 8-byte `xxhash64(window)` values — a
  *    map-side-combined count whose shuffle carries one (hash, count)
  *    row per DISTINCT window, not L bytes per position (the naive
  *    group-by-substring shuffles L× the corpus);
  *  - only positions whose hash count is ≥ 2 (true duplicates plus the
  *    vanishing hash-collision false positives) re-extract their window
  *    text — via a doc-id join back to the text, so each document's
  *    text travels once, not once per position — and stage 2 re-groups
  *    those CANDIDATES by the actual window text for an exact verdict.
  *    Hashing therefore only ever prunes work; it can never change the
  *    result (same text ⇒ same hash, so no true duplicate escapes
  *    stage 1, and stage 2 discards collisions by comparing the text
  *    itself);
  *  - the islands pass is one per-document window function whose
  *    partition is bounded by document length — no cross-document
  *    state, no driver-side anything.
  * Corpus-wide cost: O(total chars) map work, a distinct-window-sized
  * shuffle, and candidate-sized everything after — never all-pairs
  * (spec + tools/SubstringDedupProfile pin the 10⁶-doc behavior).
  */
object SubstringDedup {

  /** All maximal duplicated regions: (idCol, span_start, span_end,
    * span_len), positions 1-based and inclusive. A position's window is
    * the `minLen` characters starting there; a window is duplicated
    * when it occurs ≥ 2 times corpus-wide (multiplicity counts every
    * occurrence, including overlapping self-repeats inside one
    * document). The spans are the canonical decomposition of the UNION
    * of all duplicated windows into maximal contiguous character
    * regions — so spans are disjoint AND non-adjacent per document
    * (each separated by ≥ 1 untouched character), which is what makes
    * [[removeSpans]] well-defined. (Merging on raw anchor-position
    * runs alone would emit overlapping spans whenever two duplicated
    * windows sit < minLen apart.) Every span has span_len ≥ minLen and
    * both its first and last `minLen` characters duplicated; interior
    * windows bridging two merged regions need not be.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen=$minLen must be >= 2")
    val L = minLen
    val base = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .filter(length(col("text")) >= L)
    // (id, i, h): every anchor position with its 8-byte window hash —
    // the window text itself stays map-side. The hashes come from ONE
    // linear pass per document ([[windowHashes]]): the expression form
    // `xxhash64(substr(text, i, L))` re-scans the string from byte 0 on
    // every call (UTF8String.substringSQL counts code points from the
    // start, so position i costs O(i)) — O(len²) per document, measured
    // as the dominant cost of this operator at sf0.1 (5.4 → 2.4 s warm
    // for the q138 query after the swap). The kernel only PRUNES —
    // stage 2 still verifies on text — so its hash function needs no
    // relationship to xxhash64, only equal-window ⇒ equal-hash.
    val slim = base
      .select(col("id"),
        posexplode(windowHashesCol(col("text"), L)).as(Seq("p", "h")))
      .select(col("id"), (col("p") + 1).as("i"), col("h"))
    val dupH = slim.groupBy("h")
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2).select("h")
    // candidates re-extract their window via the doc join (text moves
    // once per document); stage 2 then verifies on the TEXT, exactly.
    // MATERIALIZED (eager localCheckpoint): cand feeds both the exact
    // verify aggregation (dupG) and the verified join probe, and the
    // two consumers share no exchange — lazy, the whole anchor
    // pipeline (per-position explode + hash count) executes twice
    // (measured 2× the query at sf0.1). The candidate set is the
    // hash-PRUNED remainder — bounded by true duplicates + vanishing
    // collisions — so materializing it is scale-safe where
    // materializing slim (O(corpus chars) rows) is not; a local
    // checkpoint's blocks die with the RDD, so no caller unpersist
    // obligation (the distill precedent).
    val cand = slim.join(dupH, "h")
      .join(base, "id")
      .select(col("id"), col("i"),
        col("text").substr(col("i"), lit(L)).as("gram"))
      .localCheckpoint(true)
    val dupG = cand.groupBy("gram")
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2).select("gram")
    val dup = cand.join(dupG, "gram").select("id", "i")
    // interval union: two duplicated windows at positions p < p' overlap
    // or touch iff p' − p ≤ L, so a gap > L starts a new region; the
    // region id is the running count of such breaks (lag + cumsum —
    // one per-document window pass, partition bounded by doc length)
    val w = Window.partitionBy("id").orderBy("i")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dup.withColumn("brk",
        when(col("i") - lag("i", 1).over(w) <= L, lit(0)).otherwise(lit(1)))
      .withColumn("grp", sum("brk").over(cum))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("i")).as("s"), (max(col("i")) + (L - 1)).as("e"))
      .select(col("id").as(idCol),
        col("s").cast("long").as("span_start"),
        col("e").cast("long").as("span_end"),
        (col("e") - col("s") + 1).cast("long").as("span_len"))
  }

  /** 64-bit content hash of every length-`L` code-point window of
    * `text`, in position order (index p ↔ 1-based char position p+1) —
    * ONE pass: code-point start offsets are recorded once, then each
    * window hashes its UTF-8 byte slice (FNV-1a +
    * [[graft.functions.ArrayOps.mixPub]] finalizer, the ngramHashSet
    * convention). O(chars·L) bytes hashed per document, where the
    * substr-per-position expression form is O(chars²) character scans.
    * Equal windows hash equal by construction (same code points ⇒ same
    * byte slice); the caller treats collisions as candidates and
    * verifies on text.
    *
    * The offset walk is UTF8String's OWN
    * (`numBytesForFirstByte` strides, not a continuation-byte scan):
    * stage 2 re-extracts windows with `substr(text, i, L)`, so the
    * kernel's position i must mean exactly what Spark's code-point walk
    * means — including on MALFORMED UTF-8 (a lead byte followed by a
    * non-continuation byte), where the two walks count differently and
    * a misaligned index would silently prune true duplicates.
    */
  def windowHashes(text: org.apache.spark.unsafe.types.UTF8String,
      L: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // code-point start offsets; offs(nc) = n sentinel closes the last
    // window's byte range (a truncated trailing char clamps to n)
    val offs = new Array[Int](n + 1)
    var nc = 0
    var i = 0
    while (i < n) {
      offs(nc) = i
      nc += 1
      i += org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(bytes(i))
    }
    offs(nc) = n
    if (nc < L)
      return org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.emptyLongArray)
    val out = new Array[Long](nc - L + 1)
    var p = 0
    while (p <= nc - L) {
      var h = 0xCBF29CE484222325L
      var j = offs(p)
      val end = math.min(offs(p + L), n)
      while (j < end) {
        h ^= (bytes(j) & 0xFFL)
        h *= 0x100000001B3L
        j += 1
      }
      // finalizer: FNV alone is weak in the high bits, and stage 1
      // groups ON this value
      out(p) = graft.functions.ArrayOps.mixPub(h)
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  private def windowHashesCol(text: org.apache.spark.sql.Column,
      L: Int): org.apache.spark.sql.Column =
    graft.CatalystBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        SubstringDedup.getClass,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false),
        "windowHashes",
        Seq(graft.CatalystBridge.expression(text),
          org.apache.spark.sql.catalyst.expressions.Literal(L)),
        Seq(org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType),
        returnNullable = false))

  /** The removal pass: cut every duplicated span out of its document
    * (all copies — Lee et al.'s observed-safe policy for training data;
    * a keep-one policy is a filter on `spans` before this call). Output:
    * (idCol, clean_text) for EVERY input document. Spans are disjoint,
    * non-adjacent and in-bounds by [[duplicateSpans]]'s construction
    * (any caller-supplied span set must honor the same invariant); the
    * cut is one
    * codegen'd fold over the per-document span list (bounded by
    * doc length / minLen), no shuffle beyond the doc-id join.
    */
  def removeSpans(docs: DataFrame, spans: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val sp = spans.groupBy(col(idCol).as("id"))
      .agg(sort_array(collect_list(struct(
        col("span_start").as("s"), col("span_end").as("e")))).as("sp"))
    val text = col(textCol)
    // fold state: (next uncut position, accumulated kept text)
    val cut = aggregate(col("sp"),
      struct(lit(1L).as("pos"), lit("").as("acc")),
      (st, s) => struct(
        (s.getField("e") + 1L).as("pos"),
        concat(st.getField("acc"),
          text.substr(st.getField("pos").cast("int"),
            (s.getField("s") - st.getField("pos")).cast("int"))).as("acc")),
      st => concat(st.getField("acc"),
        text.substr(st.getField("pos").cast("int"),
          (length(text).cast("long") - st.getField("pos") + 1L).cast("int"))))
    docs.join(sp, docs(idCol) === sp("id"), "left")
      .select(docs(idCol),
        when(col("sp").isNull, text).otherwise(cut).as("clean_text"))
  }
}
