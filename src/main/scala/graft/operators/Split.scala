package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/valid/test assignment — split by GROUP, not by
  * row: every document of one group (domain, URL host, dedup cluster,
  * author) lands in the same split, so the near-duplicates and shared
  * context that live inside a group can never straddle the train/test
  * boundary and leak evaluation answers into training. Splitting rows
  * i.i.d. — `randomSplit`'s contract — is exactly the mistake this
  * operator exists to prevent on web-scale corpora, where intra-domain
  * duplication is the norm.
  *
  * (Beyond-reference operator: the reference ETL has no notion of
  * held-out data; this is the standard evaluation-hygiene step of a
  * training-data pipeline.)
  *
  * Scale shape: a pure PROJECTION — zero shuffles, no RNG state, no
  * group table. The split decision is a deterministic function of
  * (seed, group key): the first 6 hex chars of
  * `md5("split:<seed>:" + group)` read as a uniform draw in
  * [0, 16^6), compared against cumulative MILLI-fraction thresholds
  * precomputed as hex-string literals (equal-length lowercase hex
  * compares numerically, so the whole decision is string compares any
  * engine replays verbatim — the md5-order idiom of
  * [[Sampling.stratifiedQuota]]). Same corpus, any cluster size, any
  * engine → the same assignment.
  */
object Split {

  /** Width of the hex draw: 6 chars = 16^6 = 16,777,216 cells, so a
    * 1-milli fraction is ~16,777 cells — granular enough that the
    * quantization error of a threshold is < 0.006% of the corpus.
    */
  private val HexW = 6
  private val Cells = 1L << (4 * HexW)

  /** Assign every row a `split` label by hashing `groupCol`.
    * `fracsMilli` are (name, milli-fraction) pairs summing to 1000,
    * applied in order — e.g. `Seq("train" -> 800, "valid" -> 100,
    * "test" -> 100)`. A NULL group hashes as the empty string, so all
    * unknown-provenance rows travel together (into one split) rather
    * than scattering across the boundary.
    */
  def grouped(df: DataFrame, groupCol: String, seed: Long,
      fracsMilli: Seq[(String, Long)]): DataFrame = {
    require(fracsMilli.nonEmpty, "no splits")
    require(fracsMilli.map(_._1).distinct.size == fracsMilli.size,
      s"duplicate split names in ${fracsMilli.map(_._1)}")
    require(fracsMilli.forall(_._2 > 0L),
      s"split fractions must be positive milli-units: $fracsMilli")
    require(fracsMilli.map(_._2).sum == 1000L,
      s"split fractions must sum to 1000 milli: $fracsMilli")
    require(!df.columns.contains("split"),
      "input already has a 'split' column — rename it before grouped()")
    val u = draw(col(groupCol), seed)
    // cumulative thresholds as zero-padded lowercase hex literals; the
    // last split takes the remainder, so rounding never drops a row
    val cums = fracsMilli.map(_._2).scanLeft(0L)(_ + _).tail
    val label = fracsMilli.init.zip(cums.init)
      .foldLeft(when(lit(false), lit(null).cast("string"))) {
        case (acc, ((name, _), cum)) =>
          acc.when(u < lit(hexThreshold(cum)), name)
      }
      .otherwise(fracsMilli.last._1)
    df.withColumn("split", label)
  }

  /** The uniform draw: 6-hex-char md5 prefix of the seeded group key.
    * Exposed so oracles and audits can replay the exact decision.
    */
  def draw(group: Column, seed: Long): Column =
    substring(md5(concat(lit(s"split:$seed:"),
      coalesce(group.cast("string"), lit("")))), 1, HexW)

  /** `cumMilli`/1000 of the hex space as a zero-padded literal.
    * Domain is 0..999: at 1000 the threshold would be 16^6 — a
    * 7-hex-char literal that no longer compares correctly against the
    * 6-char draw ("ffffff" < "1000000" is lexicographically FALSE).
    * [[grouped]] never needs it (the last split is the `otherwise`
    * branch, so only strictly-interior cumulative fractions become
    * thresholds); an audit that wants "everything" should skip the
    * compare rather than encode it.
    */
  def hexThreshold(cumMilli: Long): String = {
    require(cumMilli >= 0L && cumMilli <= 999L,
      s"cumMilli=$cumMilli outside [0, 999] — a full-space threshold " +
        "does not encode as a comparable 6-hex-char literal")
    ("%0" + HexW + "x").format(cumMilli * Cells / 1000L)
  }
}
