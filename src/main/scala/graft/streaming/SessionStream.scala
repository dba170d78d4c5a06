package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Stateful streaming sessionization: `flatMapGroupsWithState` over
  * per-user event groups — the custom-state member of the streaming
  * surface (the windowed-aggregation member is [[EventsStream]]).
  *
  * A session closes after `gapMinutes` of silence; each emitted row is one
  * closed session. State per key is one open session (id, last-seen, count,
  * sum) — constant-size, so 10^9 users cost ~decades of bytes each in the
  * state store, not event history.
  */
object SessionStream {

  /** `cents` is value scaled to an exact long (×100 after a decimal(14,2)
    * cast) — state accumulates integers, so the session sum is
    * order-independent and bit-identical to a decimal SQL oracle, with no
    * double summation-order noise.
    */
  final case class Ev(event_id: Long, ts: Long, user_id: Long, cents: Long)
  final case class Sess(user_id: Long, sess_id: Long, n_events: Long,
      sess_cents: Long)
  final case class Open(sessId: Long, lastTs: Long, n: Long, sumCents: Long)

  /** Session assembly for one user's new events (sorted here — state-store
    * group iterators carry no ordering guarantee). `e.ts` and `gapMillis`
    * are on the millisecond grid (strict `>` boundary).
    */
  def advance(userId: Long, events: Iterator[Ev], state: GroupState[Open],
      gapMillis: Long): Iterator[Sess] = {
    val sorted = events.toIndexedSeq.sortBy(e => (e.ts, e.event_id))
    var open = state.getOption.getOrElse(Open(0L, Long.MinValue, 0L, 0L))
    val closed = IndexedSeq.newBuilder[Sess]
    sorted.foreach { e =>
      if (open.n == 0L) {
        open = Open(open.sessId + 1, e.ts, 1L, e.cents)
      } else if (e.ts - open.lastTs > gapMillis) {
        closed += Sess(userId, open.sessId, open.n, open.sumCents)
        open = Open(open.sessId + 1, e.ts, 1L, e.cents)
      } else {
        open = Open(open.sessId, e.ts, open.n + 1, open.sumCents + e.cents)
      }
    }
    if (open.n > 0) state.update(open)
    closed.result().iterator
  }

  /** Run sessionization over the events table as a stream; emits BOTH the
    * sessions closed by a gap and, once input is exhausted, the still-open
    * final session per user (flushed via iterator end — single
    * AvailableNow batch), so the result equals batch sessionization.
    */
  def sessions(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // gap test runs on the MILLISECOND grid — the shared precision with
    // the DuckDB oracle's epoch_ms(ts); see q18/q46/q56. EventsSource
    // normalizes ts to micros TimestampType, so ms = unix_micros div 1e3.
    val gapMillis = gapMinutes * 60L * 1000L
    val name = "sessions_" + UUID.randomUUID().toString.replace("-", "")
    val evs = EventsSource.stream(spark, sfDir)
      .select(col("event_id"), expr("unix_micros(ts) div 1000").as("ts"),
        col("user_id"),
        (col("value").cast("decimal(14,2)") * 100).cast("long").as("cents"))
      .as[Ev]
    val out = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Ev], st: GroupState[Open]) => {
          val closedNow = advance(uid, it, st, gapMillis).toIndexedSeq
          // finite AvailableNow input arrives as one batch: flush the open
          // session so results match the batch semantics exactly
          val tail = st.getOption.filter(_.n > 0)
            .map(o => Sess(uid, o.sessId, o.n, o.sumCents)).toSeq
          st.remove()
          (closedNow ++ tail).iterator
        })
    val q = out.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable()
    finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    // Output contract is INTEGER-EXACT: the session sum leaves as cents
    // (BIGINT), never divided back to a double — `x/100.0` here vs the
    // oracle's DECIMAL→DOUBLE cast can differ by 1 ulp across engine
    // versions on non-terminating binary fractions. Consumers divide.
    spark.table(name)
      .select(col("user_id"), col("sess_id"), col("n_events"),
        col("sess_cents"))
  }
}
