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

  /** Ordered conversion funnel: for each key, the first time of stage 1,
    * the first stage-2 event STRICTLY AFTER it, the first stage-3 event
    * strictly after that, and so on — the standard product-analytics
    * funnel where later stages only count if they happen in order.
    * Emits `(keyCol, t1 … tN, stage_reached)` with the stage timestamps
    * null from the first unreached stage on.
    *
    * One conditional-min aggregate per stage over the SAME key-pinned
    * exchange — the `repartition(key)` pin makes every per-stage join a
    * co-located join plus an aggregate riding the existing
    * partitioning (ReusedExchange, not N corpus shuffles). N is the
    * funnel length (single digits by nature), never data-dependent.
    */
  def funnel(df: DataFrame, keyCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got $stages")
    val base = df.select(col(keyCol), col(typeCol), col(tsCol))
      .repartition(col(keyCol))
    var acc = base.groupBy(col(keyCol)).agg(
      min(when(col(typeCol) === stages.head, col(tsCol))).as("t1"))
    for (i <- 2 to stages.length) {
      val prevCols = (1 until i).map(j => max(col(s"t$j")).as(s"t$j"))
      val next = min(when(col(typeCol) === stages(i - 1)
        && col(tsCol) > col(s"t${i - 1}"), col(tsCol))).as(s"t$i")
      acc = base.join(acc, keyCol)
        .groupBy(col(keyCol))
        .agg(prevCols.head, (prevCols.tail :+ next): _*)
    }
    val reached = (1 to stages.length).foldLeft(lit(0L)) { (els, i) =>
      when(col(s"t$i").isNotNull, lit(i.toLong)).otherwise(els)
    }
    acc.withColumn("stage_reached", reached)
  }

  /** Cohort retention matrix: keys are cohorted by the day of their
    * first ANCHOR event (`anchorCol` — e.g. the signup), and each
    * (cohort, day-offset) cell counts the keys active (any event) that
    * many days after their cohort day — the standard retention triangle.
    * Emits `(cohort_day, day_offset, n_users)`; offset 0 is the cohort
    * day itself, pre-anchor activity is excluded.
    *
    * Shape: one distinct (key, day) aggregate, one anchor min-aggregate,
    * one key-equi-join, one tiny (cohort, offset) count — all key- or
    * cell-keyed shuffles, nothing collected; the output is bounded by
    * days², not by keys.
    */
  def cohortRetention(df: DataFrame, keyCol: String, tsCol: String,
                      anchorCol: Column): DataFrame = {
    val d = df.select(col(keyCol), to_date(col(tsCol)).as("__graft_day"),
      anchorCol.as("__graft_anchor"))
    val cohorts = d.filter(col("__graft_anchor"))
      .groupBy(col(keyCol))
      .agg(min(col("__graft_day")).as("__graft_cohort"))
    d.select(col(keyCol), col("__graft_day")).distinct()
      .join(cohorts, keyCol)
      .filter(col("__graft_day") >= col("__graft_cohort"))
      .groupBy(date_format(col("__graft_cohort"), "yyyy-MM-dd")
          .as("cohort_day"),
        datediff(col("__graft_day"), col("__graft_cohort")).cast("long")
          .as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
