package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: assign gap-based session ids per entity.
  *
  * The classic event-log transform (the batch twin of Structured Streaming's
  * `session_window` / `graft.streaming.StreamingJobs.sessionize`): order each
  * user's events by time, start a new session whenever the gap to the
  * previous event exceeds `gapSec`, number sessions with a running sum of the
  * boundary flags.
  *
  * Scale behavior: ONE shuffle, on the entity key; both window passes (lag +
  * running sum) share the same partitioning and sort, so Catalyst plans a
  * single Exchange + Sort with two Window operators on top. Per-entity data
  * must fit a task's window buffer — true for any bounded-activity entity
  * (users, devices); a pathological single-entity log would need the salted
  * two-level variant (cf. graft.core.Skew) or the streaming path.
  *
  * Determinism: ties on the timestamp are broken by `tieBreakCol`, so the
  * session numbering is total-order stable across engines and retries.
  */
object Sessionize {

  /** `events` plus a `session_id` column (0-based per entity). The gap
    * comparison is strict: a gap of exactly `gapSec` seconds stays in the
    * same session. `tsCol` must be a TIMESTAMP column. */
  def assign(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      tieBreakCol: String,
      gapSec: Long
  ): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieBreakCol))
    val us = unix_micros(col(tsCol))
    val newSession =
      when(us - lag(us, 1).over(w) > gapSec * 1000000L, 1L).otherwise(0L)
    events.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: event count and wall-clock duration in whole
    * seconds. All-integer output (hash-stable across engines). */
  def stats(sessioned: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    sessioned
      .groupBy(col(entityCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(us) - min(us)).as("__dur_us"))
      // integral DIV, not double division: a correctly-rounded double
      // quotient can land exactly on the next integer and break floor parity
      .withColumn("duration_sec", expr("__dur_us DIV 1000000"))
      .drop("__dur_us")
  }
}
