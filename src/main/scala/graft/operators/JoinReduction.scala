package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Bloom

/** Semi-join reduction: kill probe-side rows BEFORE the join shuffle.
  *
  * The classic distributed-join optimization for "huge fact ⋈ selective
  * build side": when the build side is too large to hash-broadcast but
  * its KEY SET fits a Bloom filter (10 bits/key at ~1% false positives
  * vs 8+ bytes/key exact), broadcast the bits and filter the fact side
  * at the scan — at 100 TB this is the difference between shuffling the
  * whole fact table and shuffling only the ~matching slice (plus the FP
  * rate). Spark's AQE runtime bloom (`runtime.bloomFilter.enabled`)
  * makes the same move opportunistically; this operator is the
  * deterministic, tunable form — the filter is ALWAYS built, sized by
  * the caller, and visible in the plan as a Filter below the exchange.
  *
  * Correctness is unconditional: a Bloom filter has no false negatives,
  * so the pre-filter never drops a matching row, and every false
  * positive that survives it is eliminated by the real join — the
  * result provably equals the plain inner join (pinned by
  * BloomJoinSpec's planted-FP equivalence test and q111's full oracle).
  *
  * Like [[Similarity.ivfTopK]]'s training step, construction is EAGER:
  * building the bits runs one Spark job over the build side's keys
  * (map-side-combined to ≤ mBits/64 collected rows) at call time —
  * callers composing lazy pipelines should call this last.
  */
object JoinReduction {

  /** `probe ⋈ build` (inner, `probeKey = buildKey`) with a broadcast
    * Bloom pre-filter on the probe side. Both key columns must hash
    * identically (same type) — xxhash64 canonicalizes the value bytes.
    */
  def bloomReducedJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      mBits: Int = Bloom.DefaultBits,
      k: Int = Bloom.DefaultHashes): DataFrame = {
    val words = Bloom.build(build.select(col(buildKey)), buildKey, mBits, k)
    probe.filter(Bloom.mightContain(words, col(probeKey), mBits, k))
      .join(build, col(probeKey) === col(buildKey))
  }

  /** The reduction the pre-filter achieved: (probe rows, surviving rows,
    * truly matching rows) — surviving − matching = false positives that
    * rode the shuffle only to die in the join. Diagnostic / spec surface.
    */
  def reductionStats(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      mBits: Int = Bloom.DefaultBits,
      k: Int = Bloom.DefaultHashes): (Long, Long, Long) = {
    val words = Bloom.build(build.select(col(buildKey)), buildKey, mBits, k)
    val total = probe.count()
    val survived = probe
      .filter(Bloom.mightContain(words, col(probeKey), mBits, k)).count()
    val matching = probe
      .join(build, col(probeKey) === col(buildKey), "left_semi").count()
    (total, survived, matching)
  }
}
