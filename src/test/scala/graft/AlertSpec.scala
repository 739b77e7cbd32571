package graft

import org.apache.spark.sql.functions._

import graft.monitoring.Alerts
import graft.operators.{Anomaly, Quality}
import graft.operators.Anomaly.AnomalyRule

/** Alert emission (S9): reference thresholds over probe metrics, alert
  * rows only for breaches (`src/monitoring/alerting.py:56-64,403-425`).
  */
class AlertSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  private val now = lit("2024-01-31 00:00:00").cast("timestamp")
  private val rules = Seq(
    AnomalyRule("error_spike", col("event_type") === "error" && col("value") > 180.0, 1.0))

  /** 1000 rows in the final pre-now minute, all columns populated:
    * quality 1.0, liveness and throughput satisfied. `anomalous` of them
    * are error spikes.
    */
  private def window(anomalous: Int) = {
    val rows = (1 to 1000).map { i =>
      val err = i <= anomalous
      (i.toLong, f"2024-01-30 23:59:${i % 50}%02d",
        if (err) "error" else "click", if (err) 200.0 else 50.0, "{}")
    }
    val df = rows.toDF("event_id", "ts_s", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp"))
      .withColumn("user_id", col("event_id"))
    Quality(df, required = Seq("ts", "user_id", "event_type"),
        scored = Seq("ts", "user_id", "event_type", "value", "props"))
      .withColumn("anomaly_score", Anomaly.score(rules))
  }

  test("a healthy window with an anomaly burst trips exactly the anomaly probe") {
    val alerts = Alerts(window(anomalous = 100), now).collect()
    assert(alerts.length == 1)
    val a = alerts.head
    assert(a.getAs[String]("alert_id") == "high_anomaly_rate_20240131_000000")
    assert(a.getAs[String]("alert_type") == "anomaly")
    assert(a.getAs[String]("severity") == "warning")
    assert(a.getAs[Double]("metric_value") == 0.1) // 100 / 1000 > 0.05
    assert(a.getAs[Double]("threshold") == 0.05)
    assert(!a.getAs[Boolean]("resolved"))
  }

  test("a fully healthy window emits no alerts") {
    assert(Alerts(window(anomalous = 0), now).collect().isEmpty)
  }

  test("an empty window trips quality, liveness and throughput (reference nulls-as-breach)") {
    val empty = window(anomalous = 0).filter(lit(false))
    val got = Alerts(empty, now).collect()
      .map(r => (r.getAs[String]("alert_type"), r.getAs[String]("severity"))).toSet
    assert(got == Set(
      ("data_quality", "warning"),      // NULL avg quality coalesces to 0.0
      ("system_health", "critical"),    // no rows in 5 minutes
      ("performance", "warning")))      // 0 records/minute
  }

  test("latency probe trips only when a latency column is supplied and breached") {
    val healthy = window(anomalous = 0)
    val slow = Alerts(healthy, now, latencyUs = Some(lit(45e6))).collect()
    assert(slow.map(_.getAs[String]("alert_id")).toSeq ==
      Seq("high_latency_20240131_000000"))
    assert(slow.head.getAs[Double]("metric_value") == 45.0)
    val fast = Alerts(healthy, now, latencyUs = Some(lit(2e6))).collect()
    assert(fast.isEmpty)
  }
}
