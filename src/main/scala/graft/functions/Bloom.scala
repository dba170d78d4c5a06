package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Broadcast Bloom filter as a pure-column membership test — the scale
  * path for set-membership prefilters (decontamination, URL blocklists,
  * id lookups) when the exact set is too large to broadcast: 10 bits per
  * element at ~1% false positives versus 8+ bytes per exact key, a ~10×
  * smaller broadcast with NO false negatives. Pairs with an exact verify
  * on the (tiny) surviving candidate set, so pipeline output stays exact
  * (same two-phase shape as LSH → exact-Jaccard in `Dedup`).
  *
  * Representation: Array[Long] words. Construction is DISTRIBUTED — k
  * hash positions per item, positions fold into (word, or-mask) rows,
  * `bit_or` aggregation yields ≤ m/64 rows to collect, so the driver
  * materializes O(m) regardless of item count. Membership is shift/mask
  * arithmetic over an `element_at` of the broadcast word array —
  * codegen'd, no UDF in the corpus-side hot path.
  */
object Bloom {

  val DefaultBits = 1 << 16 // 65,536 bits = 1,024 words
  val DefaultHashes = 5

  private def position(seed: Int, item: Column, mBits: Int): Column =
    pmod(xxhash64(lit(seed), item), lit(mBits.toLong))

  /** Build the word array over `items(itemCol)` (any hashable column
    * type; xxhash64 canonicalizes). One map-side-combined aggregation of
    * at most m/64 groups.
    */
  def build(items: DataFrame, itemCol: String,
      mBits: Int = DefaultBits, k: Int = DefaultHashes): Array[Long] = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    val posCols = (0 until k).map(s => position(s, col(itemCol), mBits))
    val words = items
      .select(explode(array(posCols: _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int"))
          .as("mask"))
      .groupBy(col("w")).agg(bit_or(col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(r.fieldIndex("bits")))
    arr
  }

  /** The k bit positions of one item as an array column — the primitive
    * a COUNTING bloom needs: inserts/removals adjust per-position counts
    * by the item's full position multiset (a within-item position
    * collision contributes ±2 there, keeping insert/delete balanced),
    * which [[build]]'s or-fold cannot express. Same seeds as
    * [[build]]/[[mightContain]], so counts>0 collapses to exactly the
    * word array those functions agree on.
    */
  private[graft] def positions(item: Column, mBits: Int = DefaultBits,
      k: Int = DefaultHashes): Column =
    array((0 until k).map(s => position(s, item, mBits)): _*)

  /** Membership test: true if every one of the k bits is set. False
    * positives at the configured rate; false negatives never.
    */
  def mightContain(words: Array[Long], item: Column,
      mBits: Int = DefaultBits, k: Int = DefaultHashes): Column = {
    require(words.length == mBits / 64,
      s"word array length ${words.length} != mBits/64 = ${mBits / 64}")
    val lit_words = typedLit(words.toSeq)
    (0 until k).map { s =>
      val pos = position(s, item, mBits)
      val word = element_at(lit_words, (pos / 64).cast("int") + 1)
      // shift amount is a column → call_function (functions.shiftright
      // only takes a literal Int shift)
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
