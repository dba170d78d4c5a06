package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality filtering: distill a rule-based quality label into a
  * linear classifier over hashed bag-of-token features — the fasttext
  * pattern every production curation pipeline runs (train a cheap
  * linear model on weak labels, score the whole corpus with it), built
  * so training is DISTRIBUTED, DETERMINISTIC, and SQL-replayable.
  *
  * (Beyond-reference operator; the reference has no notion of document
  * quality — its pipeline flattens whatever the export returns.)
  *
  * Model: BERNOULLI Naive Bayes over `16^hexChars` hashed buckets —
  * presence AND absence both inform the margin:
  *
  *  - features(doc) = DISTINCT tokens, each hashed to a bucket id (the
  *    first `hexChars` hex chars of md5("f:" + token), the repo's
  *    engine-portable hash — CountMin/q51/q70 — so the DuckDB oracle
  *    replays bucketing verbatim);
  *  - the absent-bucket terms are CONSTANT per document, so they fold
  *    into an adjusted prior and the per-present-bucket weight
  *    collapses to one Laplace-smoothed log-ratio:
  *    `w[b] = round(1e6·ln((pos_b+1)(neg−neg_b+1) /
  *    ((neg_b+1)(pos−pos_b+1))))`, held as BIGINT MICRO-units (the
  *    q124 LM-scoring rule: round each term BEFORE summing so margins
  *    are summation-order-independent and bit-identical in SQL);
  *  - margin(doc) = adjustedPrior + Σ_{b ∈ features(doc)} w[b];
  *    predicted = margin > 0 (zero counts as negative). The model
  *    space is the buckets OBSERVED in training (an unseen bucket at
  *    scoring time contributes nothing — the standard convention).
  *
  * One-shot training — no iteration to tune or to oscillate. Two
  * designs were tried and measured first on a length-confounded label
  * over the real corpus: a batch perceptron OSCILLATES (full-batch
  * ±1-per-misclassified-doc updates flip the iterate between
  * all-positive and all-negative → majority-class accuracy), and
  * presence-ONLY log-odds predicts all-positive (longer docs raise
  * P(b|pos) for nearly every bucket, and without the absence terms
  * nothing pushes back). Full Bernoulli NB models both directions and
  * beats majority (spec-pinned).
  *
  * Scale shape (the part that must survive 100 TB):
  *  - the corpus is tokenized ONCE into per-doc distinct feature
  *    arrays (one distinct-shuffle), persisted across training and
  *    scoring;
  *  - training is ONE map-side-combined aggregation whose shuffle
  *    carries ≤ 16^hexChars + 1 rows; the driver holds the weight
  *    table (bounded by construction, like k-means centroids);
  *  - scoring is MAP-SIDE: weights travel to the data as a dense
  *    packed-array literal (O(1) lookup per feature — see
  *    [[marginCol]]), the margin is one `aggregate` over the feature
  *    array — no join, no shuffle.
  */
object QualityModel {

  /** 16⁴ = 65,536 hashed buckets. Chosen by the round-11 capacity
    * sweep at 10⁶ docs (`tools/QualityScaleProfile sweep`): accuracy
    * vs the weak label rises monotonically with capacity (hex 2/3/4 →
    * 0.9836/0.9864/0.9873) at indistinguishable train+score cost
    * (5–6 s for the full 10⁶-doc pipeline at every setting), and the
    * dense weight literal is 512 KB — broadcast-trivial. Bigram
    * features (opt-in via `bigrams = true`) doubled margin SEPARATION
    * (27.5 → 59.9 micro-units) but cost ~0.2 pp accuracy on the
    * random-word synthetic corpus, whose bigrams are pure noise —
    * on real text they carry phrase signal; off by default because
    * the measured corpus says so, available because real corpora
    * differ.
    */
  val DefaultHexChars = 4
  val Micro = 1000000L

  /** Bucket of one token — md5-prefix, portable (cf. CountMin.bucket). */
  def bucket(token: Column, hexChars: Int = DefaultHexChars): Column =
    substring(md5(concat(lit("f:"), token)), 1, hexChars)

  /** Bucket of one adjacent-token BIGRAM — distinct hash input prefix
    * ("g:", space-joined pair), SHARED output bucket space with the
    * unigrams (the fasttext convention: n-gram features hash into the
    * same table; collisions are the model's capacity knob, not an
    * error).
    */
  def bigramBucket(w1: Column, w2: Column,
      hexChars: Int = DefaultHexChars): Column =
    substring(md5(concat(lit("g:"), w1, lit(" "), w2)), 1, hexChars)

  /** Per-doc features: (id, label, feats ARRAY<STRING>) — the sorted
    * DISTINCT bucket set of the doc's whitespace tokens. Empty docs get
    * an empty array (margin = prior alone).
    */
  /** The feature-set expression alone — for scoring pipelines that
    * carry their own extra columns (e.g. a stream scored map-side next
    * to its grouping keys). NULL text → EMPTY feature set (margin =
    * prior), matching the SQL replay where unnest of a NULL split
    * yields no rows — not a NULL array that would poison the margin
    * aggregate. With `bigrams` on, adjacent-token pair buckets join
    * the set (presence semantics unchanged — the DISTINCT union).
    */
  def featsCol(text: Column, hexChars: Int = DefaultHexChars,
      bigrams: Boolean = false): Column = {
    val toks = filter(graft.functions.Text.tokens(text),
      t => length(t) > 0)
    val uni = transform(toks, t => bucket(t, hexChars))
    val all =
      if (!bigrams) uni
      else concat(uni, zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => bigramBucket(a, b, hexChars)))
    coalesce(array_sort(array_distinct(all)),
      array().cast("array<string>"))
  }

  def featurize(docs: DataFrame, idCol: String, textCol: String,
      label: Column, hexChars: Int = DefaultHexChars,
      bigrams: Boolean = false): DataFrame =
    docs.select(col(idCol).as("id"), label.as("y"),
      featsCol(col(textCol), hexChars, bigrams).as("feats"))

  private def micro(x: Double): Long = muLn(x)

  /** One-shot Bernoulli-NB training over a featurized frame:
    * (per-present-bucket weights, adjusted prior) in BIGINT
    * micro-units — at most 16^hexChars + 1 integers, exactly
    * reproducible under any partitioning (the counts are integer sums;
    * logs use java.lang.Math.log, the same libm as Spark's `ln`).
    *
    *  - weight:  w[b] = µln((pos_b+1)(neg−neg_b+1) /
    *                        ((neg_b+1)(pos−pos_b+1)))
    *  - adjusted prior = µln((pos+1)/(neg+1))
    *      + Σ_b µln(((pos−pos_b+1)(neg+2)) / ((neg−neg_b+1)(pos+2)))
    *    (the class prior plus every observed bucket's ABSENT term;
    *    each term micro-rounded before the sum — q124's rule)
    */
  def trainBernoulliNb(feats: DataFrame): (Map[String, Long], Long) = {
    val tot = feats.agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("neg"))
      .collect()(0)
    // sum over zero rows is NULL, not 0 — surface "empty corpus" as a
    // clear error instead of an NPE three lines later
    require(!tot.isNullAt(0) || !tot.isNullAt(1),
      "trainBernoulliNb: empty featurized corpus")
    val pos = if (tot.isNullAt(0)) 0L else tot.getLong(0)
    val neg = if (tot.isNullAt(1)) 0L else tot.getLong(1)
    val counts = feats
      .select(col("y"), explode(col("feats")).as("b"))
      .groupBy(col("b")).agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("pb"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("nb"))
      .collect() // bounded: ≤ 16^hexChars rows
    val weights = counts.map { r =>
      val (pb, nb) = (r.getLong(1), r.getLong(2))
      r.getString(0) -> micro(
        ((pb + 1.0) * (neg - nb + 1.0)) / ((nb + 1.0) * (pos - pb + 1.0)))
    }.toMap
    val absentSum = counts.map { r =>
      val (pb, nb) = (r.getLong(1), r.getLong(2))
      micro(((pos - pb + 1.0) * (neg + 2.0)) /
        ((neg - nb + 1.0) * (pos + 2.0)))
    }.sum
    val prior = micro((pos + 1.0) / (neg + 1.0)) + absentSum
    (weights, prior)
  }

  /** Integer margin of a feature array under the learned weights.
    * Buckets never observed in training contribute nothing (the model
    * space is the observed buckets).
    *
    * Lookup structure matters at capacity: Spark evaluates
    * `element_at` on a MAP literal by linearly scanning the key array,
    * so a 16^4-bucket map costs 65k string-compares per feature —
    * measured catastrophic at 10⁶ docs (the hexChars=4 sweep never
    * finished). The weights therefore travel as a DENSE packed long
    * array indexed by the bucket's hex value (16^hexChars entries,
    * absent buckets 0): one O(1) primitive array read per feature,
    * identical semantics. Dense is capped at 16^5 entries (8 MB
    * plan literal); past that a hashed-features model wants its
    * weights joined (broadcast), not inlined — enforce rather than
    * silently degrade.
    */
  def marginCol(feats: Column, weights: Map[String, Long],
      prior: Long): Column = {
    if (weights.isEmpty)
      return aggregate(feats, lit(prior), (acc, _) => acc)
    val hexLen = weights.keysIterator.next().length
    require(weights.keysIterator.forall(_.length == hexLen),
      "mixed bucket widths in weight table")
    require(hexLen <= 5,
      s"hexChars=$hexLen: dense weight literal would exceed 16^5 " +
        "entries — score via a broadcast join at this capacity")
    val dense = new Array[Long](1 << (4 * hexLen))
    weights.foreach { case (k, v) => dense(Integer.parseInt(k, 16)) = v }
    val arrLit = graft.functions.ArrayOps.packedLongLit(dense)
    aggregate(feats, lit(prior), (acc, b) =>
      acc + element_at(arrLit, conv(b, 16, 10).cast("int") + 1))
  }

  /** End-to-end distillation: featurize with the caller's weak label,
    * train, score every document with the learned model. Output: one
    * row per doc — (id, label, margin, predicted). The feature table is
    * persisted across training and the scoring pass (the corpus is
    * tokenized exactly once), then released.
    *
    * The result is materialized via an eager `localCheckpoint` rather
    * than `persist`: a persisted Dataset is pinned by the session's
    * CacheManager until someone calls unpersist, and distill has no
    * caller to hand that obligation to — repeated invocations (bench,
    * multi-scale sweeps) would accumulate cached partitions forever. A
    * local checkpoint's blocks are owned by the result's own RDD, so
    * the ContextCleaner reclaims them as soon as the caller drops the
    * returned DataFrame.
    */
  def distill(docs: DataFrame, idCol: String, textCol: String,
      label: Column, hexChars: Int = DefaultHexChars,
      bigrams: Boolean = false): DataFrame = {
    val f = featurize(docs, idCol, textCol, label, hexChars, bigrams)
      .persist()
    f.count(): Unit
    val (w, prior) = trainBernoulliNb(f)
    val out = f.select(col("id").as(idCol), col("y").as("label"),
        marginCol(col("feats"), w, prior).as("margin"))
      .withColumn("predicted", col("margin") > 0)
      .localCheckpoint(true)
    f.unpersist(blocking = false)
    out
  }

  /** µln as a JVM static — BOTH trainers round through this exact
    * function (`math.round(math.log(x) × 1e6)`), so the driver-side
    * and distributed weight tables are bit-identical by construction
    * (Spark's `round` is HALF_UP — away from zero on negative halves —
    * where `math.round` takes `floor(x + 0.5)`; ln values land on an
    * exact .5 only by double-rounding coincidence, but a model equality
    * contract must not hang on "unlikely").
    */
  def muLn(x: Double): Long = math.round(math.log(x) * Micro)

  private def muLnF(c: Column): Column = graft.CatalystBridge.column(
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      QualityModel.getClass,
      org.apache.spark.sql.types.LongType, "muLn",
      Seq(graft.CatalystBridge.expression(c)),
      Seq(org.apache.spark.sql.types.DoubleType),
      returnNullable = false))

  /** The distributed weight table: [[trainBernoulliNb]]'s exact model
    * ((bucket, w) rows + adjusted prior) with the weights NEVER
    * collected — the capacity regime past the 16⁵ dense-literal cap
    * (hexChars > 5, large bigram vocabularies), where the driver must
    * not hold the table. Only three scalars reach the driver: the two
    * class totals and the one-row absent-term sum.
    *
    * The per-bucket count aggregation is computed once into a cached
    * frame (the absent-term pass and every later scoring pass read it);
    * the caller owns that cache — `release()` when done scoring.
    */
  final case class NbModel(weights: DataFrame, prior: Long,
      release: () => Unit)

  def trainBernoulliNbDf(feats: DataFrame): NbModel = {
    val tot = feats.agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("neg"))
      .collect()(0)
    require(!tot.isNullAt(0) || !tot.isNullAt(1),
      "trainBernoulliNbDf: empty featurized corpus")
    val pos = if (tot.isNullAt(0)) 0L else tot.getLong(0)
    val neg = if (tot.isNullAt(1)) 0L else tot.getLong(1)
    val wa = feats
      .select(col("y"), explode(col("feats")).as("b"))
      .groupBy(col("b")).agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("pb"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("nb"))
      .select(col("b"),
        muLnF(((col("pb") + 1.0d) * (lit(neg) - col("nb") + 1.0d)) /
          ((col("nb") + 1.0d) * (lit(pos) - col("pb") + 1.0d))).as("w"),
        muLnF(((lit(pos) - col("pb") + 1.0d) * (neg + 2.0d)) /
          ((lit(neg) - col("nb") + 1.0d) * (pos + 2.0d))).as("a"))
      .persist()
    val absent = wa.agg(sum(col("a"))).collect()(0)
    val absentSum = if (absent.isNullAt(0)) 0L else absent.getLong(0)
    NbModel(wa.select(col("b"), col("w")),
      muLn((pos + 1.0) / (neg + 1.0)) + absentSum,
      () => { wa.unpersist(blocking = false); () })
  }

  /** Margin via explode + weight join — [[marginCol]]'s semantics at
    * distributed-weight capacity: absent buckets contribute 0, empty
    * feature sets score the bare prior. The weight side broadcasts by
    * default (10⁶ buckets ≈ 30 MB — broadcast-trivial; flip
    * `broadcastWeights` off past ~10⁸ and let the planner shuffle both
    * sides); the per-doc sum is one map-side-combined aggregation on
    * the id.
    */
  def scoreViaJoin(feats: DataFrame, model: NbModel,
      broadcastWeights: Boolean = true): DataFrame = {
    val w =
      if (broadcastWeights) broadcast(model.weights) else model.weights
    feats.select(col("id"), explode_outer(col("feats")).as("b"))
      .join(w, Seq("b"), "left")
      .groupBy(col("id"))
      .agg((lit(model.prior) + coalesce(sum(col("w")), lit(0L)))
        .as("margin"))
  }
}
