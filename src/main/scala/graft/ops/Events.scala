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

  /** Funnel analysis: per key, how far through the ordered `steps`
    * sequence the event stream progresses — a greedy subsequence match
    * over events in (ts, id) order (greedy earliest-match is optimal
    * for subsequence containment, so this IS the max stage reachable).
    * Emits (key, stage_reached) for every key with ≥ 1 funnel-step
    * event; stage k means steps(0..k-1) were matched in order.
    *
    * Scale shape: events not in `steps` are dropped scan-side, then ONE
    * hash aggregation on the key collects each key's step numbers in
    * time order and a codegen'd array fold scores them — per-key state
    * is bounded by that key's funnel-event count, there is no self-join
    * per step (the naive k-way-join funnel shuffles k times and
    * explodes on hot keys). Ties at one timestamp break by event id. */
  def funnel(events: DataFrame, keyCol: String, idCol: String,
      tsCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    val us = epochUs(events, tsCol)
    val stepNo = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    events.select(col(keyCol), us.as("us"), col(idCol).as("eid"),
        stepNo.as("step"))
      .filter(col("step").isNotNull)
      .groupBy(col(keyCol))
      .agg(transform(
        sort_array(collect_list(struct(col("us"), col("eid"), col("step")))),
        e => e.getField("step")).as("seq"))
      .select(col(keyCol),
        aggregate(col("seq"), lit(0L),
          (acc, x) => when(x.cast("long") === acc + 1L, acc + 1L).otherwise(acc))
          .as("stage_reached"))
  }

  /** Classic retention-cohort matrix: each key's cohort is its first
    * active day; for every (cohort day, day offset) report how many
    * keys were active. Emits (cohort_day DATE, day_offset, n_users).
    *
    * Scale shape: ONE key-keyed aggregation builds each key's distinct
    * active-day set (bounded by the observation window's day count, not
    * the key's event count — collect_set dedups map-side), the cohort
    * is array_min of that set (no second pass, no join-back of a
    * cohort table), and the final rollup is days²-sized — map-side
    * partial aggregation makes the second exchange carry near-nothing. */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String): DataFrame =
    events.select(col(keyCol), to_date(col(tsCol)).as("day"))
      .groupBy(col(keyCol))
      .agg(collect_set(col("day")).as("days"))
      .select(col(keyCol), array_min(col("days")).as("cohort_day"),
        explode(col("days")).as("day"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
}
