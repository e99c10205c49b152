package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Zone-free time helpers for TIMESTAMP_NTZ columns. */
object TimeFns {

  /** Epoch micros derived purely from WALL-CLOCK fields (date + h/m/s
    * .micros) — no session-timezone conversion anywhere, unlike
    * `unix_micros(ntz.cast("timestamp"))`, which goes through NTZ→LTZ and
    * shifts by the session zone offset (the round-1/2 q09 red driver row).
    * DuckDB's `epoch_us(ts)` on a naive TIMESTAMP matches. */
  def ntzEpochMicros(c: Column): Column =
    unix_date(c.cast("date")) * 86400000000L +
      hour(c) * 3600000000L + minute(c) * 60000000L +
      (date_part(lit("SECOND"), c) * 1000000).cast("long")

  /** The NTZ wall-clock as a SESSION-INDEPENDENT instant (wall-clock-as-
    * UTC): what `ntz.cast("timestamp")` gives only when the session zone
    * happens to be UTC. For event-time operators (watermarks require
    * TIMESTAMP, not NTZ) this keeps windows zone-free. */
  def ntzAsUtcInstant(c: Column): Column = timestamp_micros(ntzEpochMicros(c))

  /** Hour truncation that STAYS TIMESTAMP_NTZ. `date_trunc("hour", ntz)`
    * implicitly casts NTZ→LTZ (session-zone conversion on the way in, and
    * the result collects/writes as an instant) — the same failure mode as
    * the q09 cast, just hidden inside a builtin. Rebuilding the value from
    * wall-clock fields keeps both the arithmetic and the output type
    * zone-free; DuckDB's `date_trunc('hour', ts)` on a naive TIMESTAMP
    * matches bit-for-bit. */
  def ntzTruncHour(c: Column): Column =
    make_timestamp_ntz(year(c), month(c), dayofmonth(c), hour(c), lit(0), lit(0))
}
