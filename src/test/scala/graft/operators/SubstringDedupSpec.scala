package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[SubstringDedup]]: exact duplicated-substring spans (Lee et al.
  * 2022 semantics) and the removal pass. Pinned: hand-built fixtures
  * with known span coordinates (cross-doc block, self-overlap runs,
  * short docs, island merging), removal arithmetic, and a property
  * test against an independent brute-force reference on random
  * corpora — hashing is a pruning detail that must never change the
  * answer.
  */
class SubstringDedupSpec extends AnyFunSuite {

  // deterministic sampling, no scalatest-scalacheck bridge (the
  // FlattenPropertySpec pattern): fixed seeds -> reproducible failures
  private def samples[T](g: org.scalacheck.Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)))

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], minLen: Int) =
    SubstringDedup.duplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", minLen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  /** Independent reference: literal definition — position i is
    * duplicated iff its length-L window occurs ≥ 2 times corpus-wide;
    * spans are the union of duplicated windows, decomposed into
    * maximal contiguous regions (computed here on a character MASK —
    * structurally unlike the operator's interval-gap logic, so a
    * merge-rule slip cannot hide in both).
    */
  private def bruteSpans(docs: Seq[(Long, String)],
      L: Int): Seq[(Long, Long, Long, Long)] = {
    val counts = collection.mutable.Map.empty[String, Int]
    for ((_, t) <- docs; i <- 0 to t.length - L)
      counts(t.substring(i, i + L)) = counts.getOrElse(t.substring(i, i + L), 0) + 1
    docs.flatMap { case (id, t) =>
      val mask = new Array[Boolean](t.length)
      for (i <- 0 to t.length - L if counts(t.substring(i, i + L)) >= 2;
           j <- i until i + L) mask(j) = true
      val runs = collection.mutable.Buffer.empty[(Int, Int)]
      var j = 0
      while (j < mask.length) {
        if (mask(j)) {
          var e = j
          while (e + 1 < mask.length && mask(e + 1)) e += 1
          runs += ((j, e))
          j = e + 1
        } else j += 1
      }
      runs.map { case (s, e) =>
        (id, s + 1L, e + 1L, (e - s + 1).toLong)
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("cross-document duplicated block yields one span per copy, exact bounds") {
    val block = "0123456789" * 4 // 40 chars
    val docs = Seq(
      (1L, "aaaa" + block + "bbbb"),   // span at [5, 44]
      (2L, "cc" + block + "d"),        // span at [3, 42]
      (3L, "completely unique text with no repeats at all here"))
    val got = spans(docs, 40)
    // the 40-char window inside doc1/doc2 matches at exactly one
    // position each (the repeated-decimal block only aligns with
    // itself at shift 0 for L=40 window... shifts by 10 also match!)
    // — use brute force as the arbiter and also sanity-check coverage
    assert(got === bruteSpans(docs, 40))
    assert(got.exists(s => s._1 == 1L && s._2 <= 5 && s._3 >= 44))
    assert(got.exists(s => s._1 == 2L && s._2 <= 3 && s._3 >= 42))
    assert(!got.exists(_._1 == 3L))
  }

  test("non-periodic cross-doc block: exact single span per doc") {
    val block = "the quick brown fox jumps over the lazy dog!"
    val docs = Seq(
      (1L, "XX" + block + "YY"),
      (2L, block + "ZZZZ"))
    val got = spans(docs, block.length)
    assert(got === Seq(
      (1L, 3L, 2L + block.length, block.length.toLong),
      (2L, 1L, block.length.toLong, block.length.toLong)))
  }

  test("self-overlapping repeat inside ONE document is a duplicate") {
    // "aaaa" with L=3: windows at 1 and 2 are both "aaa" → one span [1,4]
    val docs = Seq((7L, "aaaab"), (8L, "xyzw"))
    assert(spans(docs, 3) === Seq((7L, 1L, 4L, 4L)))
  }

  test("docs shorter than minLen contribute nothing and never crash") {
    val docs = Seq((1L, "ab"), (2L, "ab"), (3L, ""))
    assert(spans(docs, 3) === Seq.empty)
  }

  test("adjacent duplicated positions merge into one maximal island") {
    // two different duplicated 4-grams overlapping back-to-back: the
    // duplicated POSITIONS are consecutive → one span, not two
    val docs = Seq(
      (1L, "ABCDEFG"),  // windows ABCD..DEFG all duplicated vs doc 2
      (2L, "ABCDEFG"))
    assert(spans(docs, 4) === Seq((1L, 1L, 7L, 7L), (2L, 1L, 7L, 7L)))
  }

  test("removeSpans cuts every span, keeps everything else, all docs present") {
    val block = "the quick brown fox jumps over the lazy dog!"
    val docs = Seq(
      (1L, "XX" + block + "YY"),
      (2L, block + "ZZZZ"),
      (3L, "untouched document"))
    val df = docs.toDF("doc_id", "text")
    val sp = SubstringDedup.duplicateSpans(df, "doc_id", "text",
      block.length)
    val cleaned = SubstringDedup.removeSpans(df, sp, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(cleaned === Seq((1L, "XXYY"), (2L, "ZZZZ"),
      (3L, "untouched document")))
  }

  test("property: spans equal the brute-force definition on random corpora") {
    import org.scalacheck.Gen
    val word = Gen.oneOf("alpha ", "beta ", "gamma ", "delta ", "x")
    val doc = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString))
    val corpus = Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, doc).map(_.zipWithIndex.map {
        case (t, i) => (i.toLong, t)
      }))
    for (docs <- samples(corpus, 12))
      assert(spans(docs, 8) === bruteSpans(docs, 8), s"corpus $docs")
  }

  test("property: multi-byte text — spans equal brute force (code-point offsets)") {
    import org.scalacheck.Gen
    // BMP multi-byte words (2-3 UTF-8 bytes per char, 1 UTF-16 unit, so
    // Java-String positions in bruteSpans == code points): exercises the
    // windowHashes kernel's UTF-8 start-offset walk, where an off-by-one
    // would silently hash byte-misaligned windows
    val word = Gen.oneOf("héllo ", "wörld ", "日本語 ", "café ", "ñ")
    val doc = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString))
    val corpus = Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, doc).map(_.zipWithIndex.map {
        case (t, i) => (i.toLong, t)
      }))
    for (docs <- samples(corpus, 12))
      assert(spans(docs, 8) === bruteSpans(docs, 8), s"corpus $docs")
  }

  test("windowHashes: supplementary-plane windows hash by code point") {
    import org.apache.spark.unsafe.types.UTF8String
    // 𝕏 is 1 code point / 2 UTF-16 units / 4 UTF-8 bytes — the case
    // where byte- and UTF-16-based indexing both go wrong
    val s = "ab𝕏cd𝕏ab𝕏cd" // ab𝕏cd𝕏ab𝕏cd
    val L = 3
    val hs = SubstringDedup.windowHashes(UTF8String.fromString(s), L)
    val cps = s.codePoints().toArray
    assert(hs.numElements() === cps.length - L + 1)
    // reference windows by CODE POINT; equal windows ⇔ equal hashes
    def win(i: Int) = new String(cps, i, L)
    for (i <- 0 until hs.numElements(); j <- 0 until hs.numElements())
      assert((win(i) == win(j)) === (hs.getLong(i) == hs.getLong(j)),
        s"positions $i/$j: '${win(i)}' vs '${win(j)}'")
  }

  test("windowHashes: malformed UTF-8 walks exactly like Spark's code-point count") {
    import org.apache.spark.unsafe.types.UTF8String
    // a lead byte followed by a NON-continuation byte: Spark's
    // numBytesForFirstByte stride counts 0xC3 'a' as ONE char (the 'a'
    // is swallowed), a naive continuation-byte scan counts two — the
    // kernel must agree with Spark, or stage-1 positions misalign with
    // stage-2 substr extraction and true duplicates get pruned
    val malformed = Array[Byte](
      'x', 'y', 0xC3.toByte, 'a', 'z', 'w', 0xC3.toByte, 'a', 'z', 'w')
    val s = UTF8String.fromBytes(malformed)
    val L = 2
    val hs = SubstringDedup.windowHashes(s, L)
    assert(hs.numElements() === s.numChars() - L + 1,
      s"kernel char count disagrees with Spark (${s.numChars()} chars)")
    // the duplicated tail [0xC3 'a'] 'z' 'w' must hash equal at both
    // occurrences under Spark's walk
    val wins = (0 until hs.numElements()).map(hs.getLong)
    assert(wins.distinct.size < wins.size,
      s"duplicate malformed windows did not collide: $wins")
  }

  test("removeSpans over random corpora: kept text is the span complement") {
    import org.scalacheck.Gen
    val word = Gen.oneOf("lorem ", "ipsum ", "dolor ", "sit ")
    val doc = Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString))
    val corpus = Gen.chooseNum(2, 6).flatMap(n =>
      Gen.listOfN(n, doc).map(_.zipWithIndex.map {
        case (t, i) => (i.toLong, t)
      }))
    for (docs <- samples(corpus, 8)) {
      val df = docs.toDF("doc_id", "text")
      val sp = SubstringDedup.duplicateSpans(df, "doc_id", "text", 10)
      val got = SubstringDedup.removeSpans(df, sp, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      val ref = bruteSpans(docs, 10).groupBy(_._1)
      docs.foreach { case (id, t) =>
        val cut = ref.getOrElse(id, Seq.empty)
          .foldLeft((1, new StringBuilder)) { case ((pos, acc), (_, s, e, _)) =>
            ((e + 1).toInt, acc.append(t.substring(pos - 1, s.toInt - 1)))
          }
        val expect = cut._2.append(t.substring(cut._1 - 1)).toString
        assert(got(id) === expect, s"doc $id")
      }
    }
  }
}
