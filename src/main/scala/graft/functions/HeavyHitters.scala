package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * custom-aggregate member of the engine's extension surface (partial
  * aggregation + merge are first-class, so Spark map-side-combines the
  * sketch exactly like a built-in agg).
  *
  * The summary keeps at most k-1 counters. GUARANTEE (Misra-Gries 1982;
  * merge rule per Agarwal et al., "Mergeable Summaries", PODS'12): after
  * summarizing n items, every item with true frequency > n/k is present,
  * and each stored count underestimates the true frequency by at most
  * n/k. At 100 TB this finds frequent tokens/URLs/licenses with a
  * fixed-size buffer per partition and a shuffle of one small map per
  * partition — where an exact groupBy would shuffle every distinct key.
  *
  * The buffer is a MUTABLE HashMap updated in place: Spark's typed-
  * aggregate path keeps the live buffer object per group and serializes
  * it only at partition boundaries, so per-row `reduce` must not allocate
  * — the previous immutable-`Map.updated` version rebuilt the map every
  * row and spent its runtime in GC. Immutable conversion happens once, in
  * `finish`.
  *
  * Survivor sets depend on partition merge order (only the true heavy
  * hitters are ORDER-INDEPENDENT members); deterministic driver checks
  * should intersect survivors with an exact count filter — see
  * q54_heavy_hitters, whose oracle is exactly that invariant.
  */
object HeavyHitters {

  final class MisraGries(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long],
        Map[String, Long]] {
    require(k >= 2, "k must be at least 2")

    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    override def reduce(b: mutable.HashMap[String, Long],
        item: String): mutable.HashMap[String, Long] = {
      val cur = b.getOrElse(item, Long.MinValue)
      if (cur != Long.MinValue) b.update(item, cur + 1)
      else if (b.size < k - 1) b.update(item, 1L)
      else {
        // all counters (and the implicit new one) decrement by 1, in place
        b.mapValuesInPlace((_, c) => c - 1)
        b.filterInPlace((_, c) => c > 0)
      }
      b
    }

    override def merge(x: mutable.HashMap[String, Long],
        y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      y.foreach { case (t, c) => x.update(t, x.getOrElse(t, 0L) + c) }
      if (x.size > k - 1) {
        // subtract the k-th largest count, drop non-positive (Agarwal et
        // al. merge: keeps the n/k error bound additive across merges)
        val counts = x.values.toArray
        java.util.Arrays.sort(counts)
        val kth = counts(counts.length - k)
        x.mapValuesInPlace((_, c) => c - kth)
        x.filterInPlace((_, c) => c > 0)
      }
      x
    }

    override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] =
      b.toMap

    // buffers cross JVM boundaries only at shuffle/spill (a handful per
    // partition), so plain Java serialization of the HashMap is fine; the
    // OUTPUT is a catalyst map so SQL can explode it.
    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.javaSerialization[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** The sketch as an untyped aggregate function usable in `agg(...)`. */
  def misraGries(k: Int): org.apache.spark.sql.expressions
      .UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
}
