package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.TimestampType

import graft.CatalystBridge

/** Timezone-exact timestamp conversions. */
object TimeOps {

  /** TIMESTAMP_NTZ whose wall-clock IS a UTC instant → TIMESTAMP (LTZ)
    * of that exact instant, independent of the session timezone.
    *
    * A bare `.cast(TimestampType)` interprets the wall-clock in the
    * SESSION zone (shifting every instant off-UTC), and re-rendering
    * via `convert_timezone('UTC', sessionTz, ts).cast(...)` — the
    * previous fix — round-trips through the session-tz wall-clock,
    * which is not injective across a DST fall-back: two UTC instants
    * an hour apart render to the same local wall-clock and the cast
    * resolves both to one offset. This constructs the Catalyst `Cast`
    * with an EXPLICIT UTC `timeZoneId`, so the NTZ micros are
    * reinterpreted as UTC micros directly — bijective (UTC has no
    * transitions), codegen'd, zero arithmetic.
    */
  def ntzUtcToInstant(c: Column): Column =
    CatalystBridge.column(
      Cast(CatalystBridge.expression(c), TimestampType, Option("UTC")))
}
