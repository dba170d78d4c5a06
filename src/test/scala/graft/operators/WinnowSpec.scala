package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArrayOps

/** Winnowing fingerprints + the verbatim-run pair report: the detection
  * guarantee (a shared run of w+k−1 tokens ALWAYS collides), the
  * below-threshold negative, exact shared-run counts, the compression
  * claim (far fewer fingerprints than gram positions), and the
  * ubiquitous-fingerprint guard.
  */
class WinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val K = 4
  private val W = 5
  private val T = W + K - 1 // 8

  private def fps(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        ArrayOps.winnow(split(col("text"), " "), K, W).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  test("guarantee: any shared run of exactly w+k-1 tokens produces a shared fingerprint") {
    val run = (1 to T).map(i => s"run$i").mkString(" ")
    val rnd = new scala.util.Random(7)
    def noise(n: Int, tag: String) =
      (1 to n).map(_ => s"$tag${rnd.nextInt(5000)}").mkString(" ")
    // 25 random placements of the run inside unrelated noise
    (1 to 25).foreach { trial =>
      val a = s"${noise(rnd.nextInt(30), "a")} $run ${noise(rnd.nextInt(30), "a")}".trim
      val b = s"${noise(rnd.nextInt(30), "b")} $run ${noise(rnd.nextInt(30), "b")}".trim
      val m = fps(Seq(a, b))
      assert((m(0L) & m(1L)).nonEmpty, s"trial $trial: guarantee violated")
    }
  }

  test("fingerprints are a genuine sample: far fewer than gram positions") {
    val n = 2000
    val text = (1 to n).map(i => s"tok${(i * 2654435761L) % 100000}").mkString(" ")
    val m = fps(Seq(text))(0L)
    val grams = n - K + 1
    // expectation ~ 2/(w+1) = 1/3 of positions, fewer after dedup
    assert(m.size < grams / 2, s"${m.size} of $grams grams selected — not a sample")
    assert(m.size > grams / 20, s"${m.size} of $grams — implausibly sparse")
  }

  test("short inputs: < k tokens -> no fingerprints; < w grams -> the global min") {
    val m = fps(Seq("a b c", "a b c d e f"))
    assert(m(0L).isEmpty, "3 tokens < k=4 must yield nothing")
    assert(m(1L).size == 1, "6 tokens = 3 gram positions < w: exactly the global min")
  }

  test("run pairs: planted quote found with exact count, 7-token overlap is below the bar") {
    val run8 = (1 to 8).map(i => s"r$i").mkString(" ")
    val run7 = (1 to 7).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $run8 delta epsilon zeta"),
      (2L, s"one two three four five $run8 six seven"),
      (3L, s"p q $run7 x y z"),   // shares only 7 consecutive tokens
      (4L, s"u v $run7 m n o"),   // with doc 3 -> must NOT pair
      (5L, "completely unrelated words here nothing shared at all")
    ).toDF("doc_id", "text")
    val got = Dedup.winnowedRunPairs(docs, "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1L)),
      s"expected exactly the 8-token-run pair with count 1, got ${got.toSeq}")
  }

  test("ubiquitous-fingerprint guard suppresses template-text pairs") {
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val docs = (1L to 6L).map(i => (i, s"$boiler unique$i words$i here$i"))
      .toDF("doc_id", "text")
    val open = Dedup.winnowedRunPairs(docs, "doc_id", "text", K, W,
      maxDocFreq = Long.MaxValue).count()
    val guarded = Dedup.winnowedRunPairs(docs, "doc_id", "text", K, W,
      maxDocFreq = 3L).count()
    assert(open == 15L, s"all 15 template pairs expected unguarded, got $open")
    assert(guarded == 0L, s"guard must drop ubiquitous-run pairs, got $guarded")
  }
}
