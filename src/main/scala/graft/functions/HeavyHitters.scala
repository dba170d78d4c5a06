package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

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
  * Survivor sets depend on partition merge order (only the true heavy
  * hitters are ORDER-INDEPENDENT members); deterministic driver checks
  * should intersect survivors with an exact count filter — see
  * q54_heavy_hitters, whose oracle is exactly that invariant.
  */
object HeavyHitters {

  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, "k must be at least 2")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long],
        item: String): Map[String, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1)
        case None if b.size < k - 1 => b.updated(item, 1L)
        case None =>
          // all counters (and the implicit new one) decrement by 1
          b.flatMap { case (t, c) =>
            if (c > 1) Some(t -> (c - 1)) else None
          }
      }

    override def merge(x: Map[String, Long],
        y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k - 1) sum
      else {
        // subtract the k-th largest count, drop non-positive (Agarwal et
        // al. merge: keeps the n/k error bound additive across merges)
        val kth = sum.values.toSeq.sortBy(-_).apply(k - 1)
        sum.flatMap { case (t, c) =>
          if (c - kth > 0) Some(t -> (c - kth)) else None
        }
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** The sketch as an untyped aggregate function usable in `agg(...)`. */
  def misraGries(k: Int): org.apache.spark.sql.expressions
      .UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
}
