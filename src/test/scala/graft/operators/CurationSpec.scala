package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted per-stage drop reasons for the composite curation pipeline
  * (q105's operator). The sf corpora carry few natural duplicates — at
  * sf0.1, eight exact pairs and ZERO shingle-set groups survive stage 1
  * — so the driver oracle alone under-exercises the dedup stages; this
  * spec plants one representative per drop reason and pins exactly who
  * survives and why.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("each stage drops its own case; survivors and packs are exact") {
    import spark.implicits._
    val docs = Seq(
      // A/B: byte-identical AFTER normalization (punctuation/case only)
      (10L, "en", "The quick brown fox jumps over the lazy dog today"),
      (11L, "en", "the QUICK, brown fox; jumps over the lazy dog today!"),
      // C/D: different strings with EQUAL 3-gram shingle SETS (cyclic
      // repeats of one cycle share exactly the cycle's rotations):
      // both = {cat dog emu, dog emu cat, emu cat dog}
      (20L, "en", "cat dog emu cat dog emu cat dog"),
      (21L, "en", "cat dog emu cat dog"),
      // E: repetitive boilerplate — 12 grams, 3 distinct, rep 0.75 > 0.6
      (30L, "en", "buy now pay buy now pay buy now pay buy now pay buy now"),
      // F: too short (3 tokens < 5) → dropped
      (40L, "en", "too short doc"),
      // G: clean singleton → survives
      (50L, "de", "ein guter langer text mit sieben verschiedenen tokens"))
      .toDF("doc_id", "lang", "text")

    // maxRepetition = 0.6: shingle-set-equal docs are cyclic (rep 0.5 for
    // doc 20) by construction, so a tighter bar would let the quality
    // stage mask the dedup stage this test exists to exercise
    val survivors = Curation.curate(docs, "doc_id", "text", "lang",
        maxRepetition = 0.6)
      .select("doc_id").as[Long].collect().toSet
    // exact-dup group {10,11} → 10; shingle-set group {20,21} → 20;
    // 30 repetition-dropped; 40 length-dropped; 50 survives
    assert(survivors == Set(10L, 20L, 50L), survivors.toString)

    val packed = Curation.curateAndPack(docs, "doc_id", "text", "lang",
        budget = 8L, maxRepetition = 0.6)
      .select("doc_id", "lang", "n_tokens", "pack_id")
      .as[(Long, String, Long, Long)].collect().toSet
    // en stratum in doc_id order: doc 10 (10 tokens, cum_before 0 →
    // pack 0), doc 20 (8 tokens, cum_before 10 → 10 div 8 = pack 1);
    // de: doc 50 (8 tokens → pack 0)
    assert(packed == Set(
      (10L, "en", 10L, 0L),
      (20L, "en", 8L, 1L),
      (50L, "de", 8L, 0L)), packed.toString)
  }

  test("minTokens below the 3-gram floor is rejected, not silently wrong") {
    import spark.implicits._
    val docs = Seq((1L, "en", "two tokens")).toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      Curation.curate(docs, "doc_id", "text", "lang", minTokens = 2)
    }
    assert(e.getMessage.contains("minTokens"))
  }

  test("survivor identity is the group minimum regardless of row order") {
    import spark.implicits._
    val docs = Seq(
      (7L, "en", "same words in this exact duplicate sentence here"),
      (3L, "en", "same words in this exact duplicate sentence here"),
      (5L, "en", "same words in this exact duplicate sentence here"))
      .toDF("doc_id", "lang", "text")
    val survivors = Curation.curate(docs, "doc_id", "text", "lang")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(3L), survivors.toString)
  }

  test("perplexityBuckets: equal-depth per-lang bands, repetitive docs land in the head") {
    import spark.implicits._
    // 9 en docs: 3 made of one repeated bigram (high LM probability),
    // 3 of moderately common pairs, 3 of singleton pairs (surprising);
    // plus 2 fr docs to prove the partition is per-language
    val docs = (
      (1 to 3).map(i => (i.toLong, "en", "x y x y x y x y")) ++
      (4 to 6).map(i => (i.toLong, "en", s"common pair filler$i tail$i")) ++
      (7 to 9).map(i => (i.toLong, "en", s"uniq$i only$i here$i now$i")) ++
      Seq((10L, "fr", "un deux trois"), (11L, "fr", "quatre cinq six"))
    ).toDF("doc_id", "lang", "text")
    val out = Curation
      .perplexityBuckets(docs, "doc_id", "text", "lang", nBuckets = 3)
      .select("doc_id", "lang", "bucket").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    // equal depth: 9 en docs → 3 per bucket; 2 fr docs → buckets 1,2
    val enByBucket = out.collect { case (_, ("en", b)) => b }.toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(enByBucket === Map(1L -> 3, 2L -> 3, 3L -> 3), out.toString)
    assert(out.collect { case (_, ("fr", b)) => b }.toSeq.sorted ===
      Seq(1L, 2L))
    // the repeated-bigram docs are the least surprising → head
    assert(Seq(1L, 2L, 3L).forall(id => out(id)._2 == 1L), out.toString)
    // determinism under adversarial partitioning
    val re = Curation
      .perplexityBuckets(docs.repartition(7), "doc_id", "text", "lang")
      .select("doc_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(re === out.map { case (id, (_, b)) => id -> b })
  }

  test("scrubRepeatedSpans: duplicate windows dropped, first kept, exact hand cases") {
    import spark.implicits._
    val docs = Seq(
      // a a a a a with n=2: gram "a a" first at 0; dups at 1,2,3 cover
      // positions 1..4 -> kept = first token only
      (1L, "a a a a a"),
      // no repeats: untouched, n_dropped 0
      (2L, "one two three four"),
      // planted tail copy: "x1 x2 x3" then "x1 x2 x3" again — dup gram
      // at 3 covers 3..4? n=2 grams: (x1 x2)@0,(x2 x3)@1,(x3 x1)@2,
      // (x1 x2)@3 dup,(x2 x3)@4 dup -> covered 3,4,5 -> kept x1 x2 x3
      (3L, "x1 x2 x3 x1 x2 x3"),
      // exactly n tokens: single gram, cannot repeat
      (4L, "p q")
    ).toDF("doc_id", "text")
    val got = Curation.scrubRepeatedSpans(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === (("a", 5L, 4L)))
    assert(got(2L) === (("one two three four", 4L, 0L)))
    assert(got(3L) === (("x1 x2 x3", 6L, 3L)))
    assert(got(4L) === (("p q", 2L, 0L)))
  }
}
