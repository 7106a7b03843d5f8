package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Event-stream operators over the (event_id, ts, user_id, …) events
  * table — the clickstream/telemetry half of a web-scale ingest
  * pipeline that the windowed-count and as-of operators don't cover.
  */
object Events {

  /** Exact epoch microseconds for either timestamp flavor. Parquet
    * written without a timezone (the driver's events table) reads as
    * TIMESTAMP_NTZ, which `unix_micros` rejects; the cast interprets
    * the wall clock in the session time zone — UTC in every entrypoint
    * here — matching DuckDB's epoch_us on the same naive values. */
  private def epochUs(df: DataFrame, tsCol: String): Column = {
    val c = df.schema(tsCol).dataType match {
      case TimestampNTZType => col(tsCol).cast(TimestampType)
      case _                => col(tsCol)
    }
    unix_micros(c)
  }

  /** Gap-based sessionization — the classic sessionize: events of one
    * key belong to the same session while consecutive gaps stay within
    * `gapSeconds`; a larger gap starts a new session. Appends
    * `session_idx` (1-based per key, in time order) to every row.
    *
    * Scale shape: ONE hash shuffle on `keyCol`; both windows (the lag
    * and the running sum) share the same partitioning+ordering so
    * Catalyst plans a single sort, and partitions are per-user-stream
    * sized — bounded by a user's event count, never corpus-global. All
    * time math is exact integer microseconds (unix_micros), no float
    * drift between engines. Ties at one timestamp order by `idCol`
    * deterministically. The streaming analog of this op is
    * StreamIngest.domainStats' flatMapGroupsWithState shape with a
    * session-gap timeout.
    */
  def sessionize(events: DataFrame, keyCol: String, idCol: String,
      tsCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = epochUs(events, tsCol)
    val prev = lag(us, 1).over(w)
    val newSess = when(prev.isNull ||
      us - prev > lit(gapSeconds * 1000000L), 1L).otherwise(0L)
    events.withColumn("session_idx",
      sum(newSess).over(run).cast("long"))
  }

  /** Per-session rollup of `sessionize`: event count, first/last event
    * time, exact microsecond duration, and the value sum. The grouping
    * keys (key, session_idx) are a SUPERSET of the window partitioning
    * (key), so the existing hash partitioning satisfies the rollup's
    * clustering requirement — the whole stats query runs on the ONE
    * sessionize shuffle, no second exchange (gated in PlanSpec). */
  def sessionStats(events: DataFrame, keyCol: String, idCol: String,
      tsCol: String, valueCol: String, gapSeconds: Long): DataFrame = {
    val sess = sessionize(events, keyCol, idCol, tsCol, gapSeconds)
    val us = epochUs(sess, tsCol)
    sess.groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("sess_start"),
        max(col(tsCol)).as("sess_end"),
        (max(us) - min(us)).as("duration_us"),
        round(sum(col(valueCol)), 2).as("sum_value"))
  }
}
