package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key sessionization and gap detection (SURVEY §7.3 extension ops —
  * the engine's first genuine analytic-window use; the reference has no
  * OVER-clause operators at all).
  *
  * Both operators shuffle exactly once, on the session key, then run
  * sorted window functions within each partition — at 100 TB the shuffle
  * is unavoidable (state must be co-located per key) and this is the
  * minimal movement. The same semantics run incrementally in streaming via
  * `session_window` / `flatMapGroupsWithState`.
  */
object Sessionize {

  /** Assign a session id per key: a new session starts when the gap to the
    * previous event exceeds `gapUs` microseconds. Adds `session_id`
    * (1-based, per key) next to the input columns.
    */
  def assign(df: DataFrame, keyCol: String, tsCol: String,
             tieBreak: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val newSession = when(prev.isNull || us - prev > gapUs, 1).otherwise(0)
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-key gap statistics: max inter-event gap + count of gaps over the
    * threshold.
    */
  def gapStats(df: DataFrame, keyCol: String, tsCol: String,
               tieBreak: String, thresholdUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    val us = unix_micros(col(tsCol))
    val gap = us - lag(us, 1).over(w)
    df.withColumn("gap_us", gap)
      .groupBy(col(keyCol))
      .agg(
        max(col("gap_us")).as("max_gap_us"),
        count(when(col("gap_us") > thresholdUs, 1)).as("gaps_over_threshold"))
  }
}
