package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial heavy-duplication corpus: the size-gated broadcast
  * fallbacks in [[Dedup.winnowedRunPairs]] and [[Dedup.dedupedCorpus]].
  *
  * The r12 review flagged both operators for broadcasting frames whose
  * size is proportional to REAL duplication (candidate pairs carrying
  * t-gram sets; the cluster loser set) — exactly the frames that are
  * O(corpus) on the crawl these operators exist for. The fix measures
  * (persist + count) and falls back to shuffled joins above a
  * threshold. This spec builds a corpus where half the docs have
  * verbatim twins, forces the shuffle path with a tiny threshold, and
  * pins (a) result equality with the broadcast path and (b) the join
  * strategies actually differing between the two paths.
  */
class HeavyDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** 2n docs: doc i and doc i+n are verbatim twins (distinct per-pair
    * text, long enough for t = w+k-1 = 8 token runs), so EVERY doc has
    * a duplicate — candidates ≈ O(corpus), the adversarial regime.
    */
  private def twinCorpus(n: Int) = {
    val base = (0 until n).map { i =>
      (i.toLong,
        (1 to 12).map(t => s"w${i}_$t").mkString(" "))
    }
    val twins = base.map { case (id, text) => (id + n, text) }
    (base ++ twins).toDF("doc_id", "text")
  }

  test("winnowedRunPairs: shuffle fallback result-identical to broadcast path") {
    val docs = twinCorpus(60)
    val viaBroadcast = Dedup.winnowedRunPairs(docs, "doc_id", "text",
        broadcastCandLimit = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val viaShuffle = Dedup.winnowedRunPairs(docs, "doc_id", "text",
        broadcastCandLimit = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // every twin pair found, with the full 12-token text's 5 distinct
    // 8-gram runs shared
    val expected = (0 until 60).map(i => (i.toLong, (i + 60).toLong, 5L)).toSet
    assert(viaBroadcast == expected,
      s"broadcast path wrong: ${viaBroadcast.take(5)}...")
    assert(viaShuffle == expected, s"shuffle path diverged from broadcast")
  }

  test("winnowedRunPairs: the gate actually switches the verify join strategy") {
    val docs = twinCorpus(20)
    def plan(limit: Long): String =
      Dedup.winnowedRunPairs(docs, "doc_id", "text",
        broadcastCandLimit = limit)
        .queryExecution.executedPlan.toString
    val b = plan(Long.MaxValue)
    val s = plan(1L)
    assert(b.contains("BroadcastHashJoin"),
      s"small-candidate path must broadcast:\n$b")
    assert(s.contains("SortMergeJoin"),
      s"over-limit path must sort-merge the verify joins:\n$s")
  }

  test("dedupedCorpus: shuffled anti-join equals broadcast anti-join on a half-duplicated corpus") {
    val docs = twinCorpus(100)
    val pairs = (0 until 100)
      .map(i => (i.toLong, (i + 100).toLong)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs)
    val viaBroadcast = Dedup.dedupedCorpus(docs, "doc_id", cl,
        broadcastLoserLimit = Long.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaShuffle = Dedup.dedupedCorpus(docs, "doc_id", cl,
        broadcastLoserLimit = 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = (0 until 100).map(_.toLong).toSet // survivors = min ids
    assert(viaBroadcast == expected)
    assert(viaShuffle == expected, "shuffle anti-join diverged")
    // and the strategies really differ
    val bPlan = Dedup.dedupedCorpus(docs, "doc_id", cl,
      broadcastLoserLimit = Long.MaxValue)
      .queryExecution.executedPlan.toString
    val sPlan = Dedup.dedupedCorpus(docs, "doc_id", cl,
      broadcastLoserLimit = 0L)
      .queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"), bPlan)
    assert(!sPlan.contains("BroadcastHashJoin"),
      s"over-limit anti-join must not broadcast:\n$sPlan")
  }

  test("crossSourceDupMatrix: source-cardinality contract fails loudly") {
    // one duplicated text spread across 30 distinct "URL" sources
    val docs = (0 until 30)
      .map(i => (i.toLong, "same text everywhere", s"http://u$i"))
      .toDF("doc_id", "text", "source")
    val ok = Dedup.crossSourceDupMatrix(docs, "doc_id", "text", "source",
      maxSources = 30)
    assert(ok.count() == 30L * 29 / 2)
    val guarded = Dedup.crossSourceDupMatrix(docs, "doc_id", "text",
      "source", maxSources = 10)
    val e = intercept[Exception](guarded.count())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("governance granule")),
      s"expected the named cardinality error, got: $e")
  }
}
