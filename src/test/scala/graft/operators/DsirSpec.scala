package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling: the fitted weights must pull
  * target-looking documents up, scoring must be exact-integer and
  * empty-safe, and the Gumbel top-k must be a deterministic sample —
  * reproducible across reruns and partitionings, yet different from
  * plain greedy top-score selection.
  */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // two disjoint vocabularies: "wiki-like" target words vs "spam" words
  private val wikiWords = Vector("history", "science", "theory",
    "century", "research", "physics", "culture", "language")
  private val spamWords = Vector("click", "winner", "free", "prize",
    "casino", "pills", "offer", "deal")

  private def doc(words: Vector[String], seed: Int, n: Int = 40): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
  }

  // raw corpus: 30 wiki-like docs (ids 0-29) + 30 spam docs (ids 100-129)
  private lazy val raw = {
    val rows = (0 until 30).map(i => (i.toLong, doc(wikiWords, i))) ++
      (0 until 30).map(i => (100L + i, doc(spamWords, 1000 + i)))
    rows.toDF("doc_id", "text")
  }
  // target: a SEPARATE wiki-like sample (different seeds — the fit must
  // generalize from distribution, not memorize documents)
  private lazy val target =
    (0 until 10).map(i => (500L + i, doc(wikiWords, 5000 + i)))
      .toDF("doc_id", "text")

  test("fit + score: target-distribution docs outscore off-target docs") {
    val wts = Dsir.fit(target, raw, "text", hexChars = 3)
    val scores = raw.select(col("doc_id"),
        Dsir.scoreCol(col("text"), wts).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wikiMin = (0 until 30).map(i => scores(i.toLong)).min
    val spamMax = (0 until 30).map(i => scores(100L + i)).max
    assert(wikiMin > spamMax,
      s"every wiki doc must outscore every spam doc ($wikiMin vs $spamMax)")
  }

  test("scoring is empty-safe and exact-integer") {
    val wts = Dsir.fit(target, raw, "text", hexChars = 3)
    val edge = Seq((1L, ""), (2L, null.asInstanceOf[String]),
      (3L, "history")).toDF("doc_id", "text")
    val got = edge.select(col("doc_id"),
        Dsir.scoreCol(col("text"), wts).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 0L && got(2L) === 0L)
    // a single-token doc scores exactly that token's bucket weight
    val b = Integer.parseInt(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("d:history")
        .substring(0, 3), 16)
    val dense = Array.fill(1 << 12)(wts.unseen)
    wts.byBucket.foreach { case (k, v) =>
      dense(Integer.parseInt(k, 16)) = v }
    assert(got(3L) === dense(b))
  }

  test("resample: deterministic, partitioning-invariant, k rows, keys ordered") {
    val wts = Dsir.fit(target, raw, "text", hexChars = 3)
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.resample(df, "doc_id", "text", wts, k = 20, seed = 42L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = run(raw)
    val b = run(raw.repartition(17))
    assert(a.toSeq === b.toSeq, "selection must not depend on layout")
    assert(a.length === 20)
    // keys non-increasing in output order (orderBy desc + limit)
    assert(a.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
    // key = score + gumbel(id, seed): replay one row by hand
    val (id0, s0, k0) = a(0)
    val u = {
      val P = 1000000007L
      val h1 = ((id0 % P) * 2654435761L + 42L) % P
      val h3 = ((h1 * h1 % P) * 2246822519L + 40503L) % P
      (h3 + 1).toDouble / (P + 1).toDouble
    }
    assert(k0 === s0 + Dsir.muGumbel(u))
  }

  test("gumbel selection is a sample, not greedy top-k by score") {
    val wts = Dsir.fit(target, raw, "text", hexChars = 3)
    val scored = raw.select(col("doc_id"),
        Dsir.scoreCol(col("text"), wts).as("s"))
      .orderBy(col("s").desc, col("doc_id")).limit(20)
      .collect().map(_.getLong(0)).toSet
    val sampled = Dsir.resample(raw, "doc_id", "text", wts,
        k = 20, seed = 42L)
      .collect().map(_.getLong(0)).toSet
    assert(sampled !== scored,
      "Gumbel top-k must differ from greedy top-score selection")
    // but the noise must not overwhelm the weights: the sample should
    // still be dominated by the high-importance (wiki) half
    assert(sampled.count(_ < 100L) >= 15, sampled.toString)
    // and a different seed draws a different sample
    val other = Dsir.resample(raw, "doc_id", "text", wts,
        k = 20, seed = 43L)
      .collect().map(_.getLong(0)).toSet
    assert(other !== sampled)
  }

  test("bigram features: edge-safe, deterministic, sharper separation") {
    // the bigram bucket list comes from zip_with over two slices — a
    // 0- or 1-token doc must yield NO bigram buckets (not a crash or a
    // phantom pair), and the feature space must stay disjoint from the
    // unigram "d:" space
    val wts = Dsir.fit(target, raw, "text", hexChars = 3, bigrams = true)
    val edge = Seq((1L, ""), (2L, "history"), (3L, "history science"))
      .toDF("doc_id", "text")
    val counts = edge.select(col("doc_id"),
        size(Dsir.bucketsCol(col("text"), 3, bigrams = true)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts === Map(1L -> 0, 2L -> 1, 3L -> 3),
      s"unigrams + bigrams per doc: $counts") // 2 uni + 1 bi for doc 3
    // deterministic fit + the wiki/spam margin still fully separates
    val scores = raw.select(col("doc_id"),
        Dsir.scoreCol(col("text"), wts).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wikiMin = (0 until 30).map(i => scores(i.toLong)).min
    val spamMax = (0 until 30).map(i => scores(100L + i)).max
    assert(wikiMin > spamMax, s"bigram-model overlap: $wikiMin vs $spamMax")
    val wts2 = Dsir.fit(target, raw, "text", hexChars = 3, bigrams = true)
    assert(wts2 === wts, "bigram fit must be deterministic")
  }

  test("muGumbel pins the JVM math.round convention") {
    // u = e^(-e^0) = e^-1 → -ln(-ln(u)) = 0 exactly
    assert(Dsir.muGumbel(math.exp(-1.0)) === 0L)
    assert(Dsir.muGumbel(0.9) > 0L && Dsir.muGumbel(0.1) < 0L)
  }
}
