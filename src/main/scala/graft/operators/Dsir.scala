package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Data selection via importance resampling (DSIR, Xie et al. 2023):
  * pick the raw-corpus documents that look most like a small TARGET
  * corpus, by importance weights under hashed bag-of-n-gram language
  * models — the published recipe for "give me the Wikipedia-like
  * slice of the crawl", and the standard learned alternative to
  * hand-written quality rules.
  *
  * (Beyond-reference operator; sibling of [[QualityModel]] — that one
  * distills a LABEL, this one matches a DISTRIBUTION.)
  *
  * Model: unigram (optionally + bigram) token OCCURRENCES hashed into
  * `16^hexChars` buckets (md5-prefix — the repo's engine-portable
  * hash), one Laplace-smoothed multinomial per corpus. The per-bucket
  * log importance ratio is one µln ([[QualityModel.muLn]]) of the
  * exact integer-count ratio, held as BIGINT MICRO-units — rounded
  * BEFORE any summation (the q124 rule), so per-document log weights
  * are integer sums: summation-order-independent, bit-identical under
  * any partitioning and in any SQL replay.
  *
  * Selection is Gumbel top-k — sampling WITHOUT replacement with
  * probability proportional to the importance weights, as the paper
  * prescribes (a plain top-k by weight collapses onto near-duplicate
  * high-scorers; the Gumbel noise trades that for a proper sample).
  * The "noise" is deterministic: a uniform draw derived from
  * [[Layout.shuffleHash]] of the document id, so the same documents
  * are selected on every rerun, any cluster size, and in the oracle.
  *
  * Scale shape (100 TB): fitting is TWO map-side-combined
  * aggregations whose shuffles carry ≤ 16^hexChars rows each; the
  * driver holds ≤ 2·16^hexChars longs (the k-means-centroids
  * convention). Scoring is a pure map-side projection — the weights
  * travel as a dense packed-array literal (O(1) lookup per token,
  * [[QualityModel.marginCol]]'s measured convention) — and selection
  * is `TakeOrderedAndProject`: each task keeps a k-heap, only k rows
  * per partition reach the driver. Nothing anywhere scans pairs or
  * collects the corpus.
  */
object Dsir {

  val Micro = 1000000L
  private val P = 1000000007L // Layout.shuffleHash modulus

  /** Hashed-model weights: per-observed-bucket µln importance ratios,
    * the ratio for buckets unseen in BOTH corpora, and the bucket
    * width they were fitted at.
    */
  final case class Weights(byBucket: Map[String, Long], unseen: Long,
      hexChars: Int, bigrams: Boolean)

  /** Bucket of one token occurrence — distinct "d:" hash-input prefix
    * so DSIR's feature space is independent of [[QualityModel]]'s.
    */
  def bucket(token: Column, hexChars: Int): Column =
    substring(md5(concat(lit("d:"), token)), 1, hexChars)

  private def bigramBucket(w1: Column, w2: Column, hexChars: Int): Column =
    substring(md5(concat(lit("e:"), w1, lit(" "), w2)), 1, hexChars)

  /** Every token occurrence's bucket, as an array column — occurrences,
    * NOT distinct presence: the model is multinomial (a word used ten
    * times is ten draws), unlike the Bernoulli [[QualityModel]].
    */
  def bucketsCol(text: Column, hexChars: Int,
      bigrams: Boolean): Column = {
    val toks = filter(Text.tokens(text), t => length(t) > 0)
    val uni = transform(toks, t => bucket(t, hexChars))
    val all =
      if (!bigrams) uni
      else concat(uni, zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => bigramBucket(a, b, hexChars)))
    coalesce(all, array().cast("array<string>"))
  }

  /** (bucket, occurrences) for one corpus: explode + ONE map-side-
    * combined aggregation — the shuffle carries ≤ 16^hexChars rows
    * whatever the corpus size.
    */
  private def bucketCounts(docs: DataFrame, textCol: String,
      hexChars: Int, bigrams: Boolean): DataFrame =
    docs.select(explode(bucketsCol(col(textCol), hexChars, bigrams))
        .as("b"))
      .groupBy("b").agg(count(lit(1)).as("n"))

  /** Fit the importance model: for every bucket observed in either
    * corpus,
    *
    *   w[b] = µln( ((t_b+1)·(R+B)) / ((r_b+1)·(T+B)) )
    *
    * with t/T the target counts/total, r/R the raw counts/total,
    * B = 16^hexChars (Laplace smoothing over the full hashed space) —
    * the log ratio of the two smoothed multinomials, one rounding per
    * bucket. `unseen` is the same formula at t_b = r_b = 0, for
    * scoring documents whose tokens appeared in neither corpus.
    */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
      hexChars: Int = 3, bigrams: Boolean = false): Weights = {
    require(hexChars >= 1 && hexChars <= 5,
      s"hexChars=$hexChars: the dense scoring literal caps at 16^5")
    val bD = (1L << (4 * hexChars)).toDouble
    def counts(df: DataFrame): Map[String, Long] =
      bucketCounts(df, textCol, hexChars, bigrams)
        .collect() // bounded: ≤ 16^hexChars rows
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = counts(target)
    val r = counts(raw)
    val tD = t.values.sum.toDouble
    val rD = r.values.sum.toDouble
    val w = (t.keySet ++ r.keySet).iterator.map { b =>
      val tb = t.getOrElse(b, 0L)
      val rb = r.getOrElse(b, 0L)
      b -> QualityModel.muLn(
        ((tb + 1.0) * (rD + bD)) / ((rb + 1.0) * (tD + bD)))
    }.toMap
    Weights(w, QualityModel.muLn((rD + bD) / (tD + bD)), hexChars,
      bigrams)
  }

  /** Per-document log importance weight (BIGINT micro): the sum of
    * w[bucket] over every token OCCURRENCE, map-side through a dense
    * packed-array literal pre-filled with the unseen-bucket ratio.
    * Empty/NULL text scores 0 tokens — weight 0.
    */
  def scoreCol(text: Column, wts: Weights): Column = {
    val dense = Array.fill(1 << (4 * wts.hexChars))(wts.unseen)
    wts.byBucket.foreach { case (k, v) =>
      dense(Integer.parseInt(k, 16)) = v
    }
    val arrLit = graft.functions.ArrayOps.packedLongLit(dense)
    aggregate(bucketsCol(text, wts.hexChars, wts.bigrams), lit(0L),
      (acc, b) => acc + element_at(arrLit, conv(b, 16, 10).cast("int") + 1))
  }

  /** Gumbel top-k resample: k documents drawn without replacement with
    * probability proportional to their importance weight, via the
    * Gumbel-max trick — key = log-weight + Gumbel(0,1), take the k
    * largest. The Gumbel draw is deterministic: u ∈ (0,1) from
    * [[Layout.shuffleHash]](id, seed), g = µ(−ln(−ln u)) — micro-
    * rounded once, like every other log in the engine, so the key is
    * a BIGINT and the selection replays exactly. Output:
    * (id, score_micro, key_micro), the k largest keys (ties — a
    * 1-in-10^6 micro-unit collision — break on ascending id).
    */
  def resample(docs: DataFrame, idCol: String, textCol: String,
      wts: Weights, k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"k=$k")
    val u = (Layout.shuffleHash(col(idCol), seed) + lit(1L))
      .cast("double") / lit((P + 1).toDouble)
    docs.select(col(idCol),
        scoreCol(col(textCol), wts).as("score_micro"))
      .withColumn("key_micro", col("score_micro") + muGumbelF(u))
      .orderBy(col("key_micro").desc, col(idCol).asc)
      .limit(k)
  }

  /** µ(−ln(−ln u)) as a JVM static, mirroring [[QualityModel.muLn]]'s
    * rounding convention (`math.round`, not Spark's HALF_UP `round` —
    * see muLn's scaladoc for why the distinction is pinned).
    */
  def muGumbel(u: Double): Long =
    math.round(-math.log(-math.log(u)) * Micro)

  private def muGumbelF(c: Column): Column = graft.CatalystBridge.column(
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      Dsir.getClass,
      org.apache.spark.sql.types.LongType, "muGumbel",
      Seq(graft.CatalystBridge.expression(c)),
      Seq(org.apache.spark.sql.types.DoubleType),
      returnNullable = false))
}
