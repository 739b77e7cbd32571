package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Anomaly, Quality}
import graft.operators.Anomaly.AnomalyRule
import graft.sources.Tables
import QueryDefs._

/** Q1–Q14 (SURVEY §2.11): the reference's operator inventory re-expressed
  * over the driver testdata. `events` plays the sensor-reading stream
  * (`ts`→timestamp, `user_id`→vehicle, `event_type`→sensor type, `value`→
  * measurement, `props`→semi-structured JSON payload); `customer` backs the
  * enrichment join (Q14).
  *
  * Every query is a declarative DataFrame plan — aggregations are Catalyst
  * hash-aggregates with map-side partials, sorts+limits plan as
  * TakeOrderedAndProject, and the single small-dimension join is an explicit
  * broadcast. Nothing here collects to the driver.
  */
object CoreQueries {

  /** Q1 — completeness filter + normalized quality score (P1/P2).
    * Nulls are injected deterministically (the testdata has none) so the
    * indicator arithmetic is actually exercised.
    */
  private def q01(spark: SparkSession, dir: String): DataFrame = {
    val injected = Tables.events(spark, dir)
      .withColumn("v", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      .withColumn("p", when(col("event_id") % 11 === 0, lit(null)).otherwise(col("props")))
      .withColumn("t", when(col("event_id") % 13 === 0, lit(null)).otherwise(col("event_type")))
    Quality(injected, required = Seq("t"), scored = Seq("v", "p", "t"))
      .select(col("event_id"), r6(col("quality_score")).as("quality_score"))
      .orderBy("event_id")
  }

  private val q01Sql =
    """WITH e AS (
      |  SELECT event_id,
      |         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
      |         CASE WHEN event_id % 11 = 0 THEN NULL ELSE props END AS p,
      |         CASE WHEN event_id % 13 = 0 THEN NULL ELSE event_type END AS t
      |  FROM events)
      |SELECT event_id,
      |       round(((CASE WHEN v IS NOT NULL THEN 1.0 ELSE 0.0 END)
      |            + (CASE WHEN p IS NOT NULL THEN 1.0 ELSE 0.0 END)
      |            + (CASE WHEN t IS NOT NULL THEN 1.0 ELSE 0.0 END)) / 3.0, 6) AS quality_score
      |FROM e WHERE t IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** Q2 — daily analytics (A2): count / distinct / min / max / avg / stddev. */
  private def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayStr(col("ts")).as("event_day"), col("event_type"))
      .agg(
        count(lit(1)).as("record_count"),
        countDistinct(col("user_id")).as("unique_users"),
        min(tsUs(col("ts"))).as("first_ts_us"),
        max(tsUs(col("ts"))).as("last_ts_us"),
        r6(avg(col("value"))).as("avg_value"),
        r6(stddev_samp(col("value"))).as("stddev_value"))
      .orderBy("event_day", "event_type")

  private val q02Sql =
    """SELECT strftime(ts, '%Y-%m-%d') AS event_day, event_type,
      |       count(*) AS record_count,
      |       count(DISTINCT user_id) AS unique_users,
      |       min(epoch_us(ts)) AS first_ts_us,
      |       max(epoch_us(ts)) AS last_ts_us,
      |       round(avg(value), 6) AS avg_value,
      |       round(stddev_samp(value), 6) AS stddev_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q3 — per-type conditional aggregates with casts (A3/P5), incl. a
    * semi-structured JSON field extraction (`props.k`).
    */
  private def q03(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayStr(col("ts")).as("event_day"))
      .agg(
        count(lit(1)).as("record_count"),
        r6(avg(when(col("event_type") === "purchase", col("value")))).as("avg_purchase_value"),
        max(when(col("event_type") === "error", col("value"))).as("max_error_value"),
        min(when(col("event_type") === "error", col("value"))).as("min_error_value"),
        count(when(col("event_type") === "click", 1)).as("click_count"),
        r6(avg(when(col("event_type") === "view",
          get_json_object(col("props"), "$.k").cast("int")))).as("avg_view_k"))
      .orderBy("event_day")

  private val q03Sql =
    """SELECT strftime(ts, '%Y-%m-%d') AS event_day,
      |       count(*) AS record_count,
      |       round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6) AS avg_purchase_value,
      |       max(CASE WHEN event_type = 'error' THEN value END) AS max_error_value,
      |       min(CASE WHEN event_type = 'error' THEN value END) AS min_error_value,
      |       count(CASE WHEN event_type = 'click' THEN 1 END) AS click_count,
      |       round(avg(CASE WHEN event_type = 'view'
      |                 THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END), 6) AS avg_view_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q4 — per-key (vehicle→user) analytics + coverage span (A4). */
  private def q04(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("record_count"),
        countDistinct(col("event_type")).as("unique_event_types"),
        countDistinct(dayStr(col("ts"))).as("active_days"),
        r6(avg(col("value"))).as("avg_value"),
        (max(tsUs(col("ts"))) - min(tsUs(col("ts")))).as("coverage_us"))
      .orderBy("user_id")

  private val q04Sql =
    """SELECT user_id,
      |       count(*) AS record_count,
      |       count(DISTINCT event_type) AS unique_event_types,
      |       count(DISTINCT strftime(ts, '%Y-%m-%d')) AS active_days,
      |       round(avg(value), 6) AS avg_value,
      |       max(epoch_us(ts)) - min(epoch_us(ts)) AS coverage_us
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q5 — quality/value bucketing with DECIMAL(5,2) percentage (A5). */
  private def q05(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayStr(col("ts")).as("event_day"))
      .agg(
        count(lit(1)).as("total_count"),
        count(when(col("value") >= 150.0, 1)).as("high_count"),
        count(when(col("value") >= 100.0 && col("value") < 150.0, 1)).as("mid_count"),
        count(when(col("value") < 100.0, 1)).as("low_count"),
        r6(avg(col("value"))).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        r6(stddev_samp(col("value"))).as("stddev_value"))
      .withColumn("high_pct",
        col("high_count") * 100.0 / col("total_count"))
      .orderBy("event_day")

  private val q05Sql =
    """WITH b AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS event_day,
      |         count(*) AS total_count,
      |         count(CASE WHEN value >= 150.0 THEN 1 END) AS high_count,
      |         count(CASE WHEN value >= 100.0 AND value < 150.0 THEN 1 END) AS mid_count,
      |         count(CASE WHEN value < 100.0 THEN 1 END) AS low_count,
      |         round(avg(value), 6) AS avg_value,
      |         min(value) AS min_value,
      |         max(value) AS max_value,
      |         round(stddev_samp(value), 6) AS stddev_value
      |  FROM events GROUP BY 1)
      |SELECT event_day, total_count, high_count, mid_count, low_count,
      |       avg_value, min_value, max_value, stddev_value,
      |       high_count * 100.0 / total_count AS high_pct
      |FROM b ORDER BY event_day""".stripMargin

  /** The Q6 rule set — declarative, folded to one CASE WHEN chain (P4). */
  def anomalyRules: Seq[AnomalyRule] = Seq(
    AnomalyRule("error_spike",  col("event_type") === "error"  && col("value") > 180.0, 1.0),
    AnomalyRule("signup_spike", col("event_type") === "signup" && col("value") > 190.0, 0.8))

  /** Q6 — rule-based anomaly score → presence filter → rollup (P4/P10/A6). */
  private def q06(spark: SparkSession, dir: String): DataFrame =
    Anomaly.detect(Tables.events(spark, dir), anomalyRules)
      .groupBy(dayStr(col("ts")).as("event_day"), col("event_type"))
      .agg(
        count(lit(1)).as("anomaly_count"),
        r6(avg(col("anomaly_score"))).as("avg_score"),
        max(col("anomaly_score")).as("max_score"),
        countDistinct(col("user_id")).as("unique_users"))
      .orderBy("event_day", "event_type")

  private val q06Sql =
    """WITH a AS (
      |  SELECT *,
      |         CASE WHEN event_type = 'error'  AND value > 180.0 THEN 1.0
      |              WHEN event_type = 'signup' AND value > 190.0 THEN 0.8
      |              ELSE 0.0 END AS anomaly_score
      |  FROM events)
      |SELECT strftime(ts, '%Y-%m-%d') AS event_day, event_type,
      |       count(*) AS anomaly_count,
      |       round(avg(anomaly_score), 6) AS avg_score,
      |       max(anomaly_score) AS max_score,
      |       count(DISTINCT user_id) AS unique_users
      |FROM a WHERE anomaly_score > 0.0
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q7 — single-row global summary with conditional count (A7/A9). */
  private def q07(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(
        count(lit(1)).as("total_records"),
        countDistinct(col("user_id")).as("unique_users"),
        countDistinct(col("event_type")).as("unique_event_types"),
        r6(avg(col("value"))).as("avg_value"),
        count(when(col("event_type") === "error" && col("value") > 180.0, 1)).as("anomaly_count"),
        r6(count(when(col("value") >= 150.0, 1)) * lit(1.0) / count(lit(1))).as("high_value_share"))
      .orderBy("total_records")

  private val q07Sql =
    """SELECT count(*) AS total_records,
      |       count(DISTINCT user_id) AS unique_users,
      |       count(DISTINCT event_type) AS unique_event_types,
      |       round(avg(value), 6) AS avg_value,
      |       count(CASE WHEN event_type = 'error' AND value > 180.0 THEN 1 END) AS anomaly_count,
      |       round(count(CASE WHEN value >= 150.0 THEN 1 END) * 1.0 / count(*), 6) AS high_value_share
      |FROM events ORDER BY total_records""".stripMargin

  /** Q8 — type distribution, ordered by count desc (A8/A10). */
  private def q08(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("record_count"),
        countDistinct(col("user_id")).as("unique_users"),
        r6(avg(col("value"))).as("avg_value"),
        r6(avg(get_json_object(col("props"), "$.k").cast("int"))).as("avg_k"))
      .orderBy(col("record_count").desc, col("event_type"))

  private val q08Sql =
    """SELECT event_type,
      |       count(*) AS record_count,
      |       count(DISTINCT user_id) AS unique_users,
      |       round(avg(value), 6) AS avg_value,
      |       round(avg(TRY_CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k
      |FROM events GROUP BY 1
      |ORDER BY record_count DESC, event_type""".stripMargin

  /** Q9 — top-N keys by reading count (A11/O2): TakeOrderedAndProject. */
  private def q09(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total_readings"),
        countDistinct(col("event_type")).as("unique_event_types"),
        r6(avg(col("value"))).as("avg_value"),
        r6((max(tsUs(col("ts"))) - min(tsUs(col("ts")))) / lit(3600.0e6)).as("coverage_hours"))
      .orderBy(col("total_readings").desc, col("user_id"))
      .limit(10)

  private val q09Sql =
    """SELECT user_id,
      |       count(*) AS total_readings,
      |       count(DISTINCT event_type) AS unique_event_types,
      |       round(avg(value), 6) AS avg_value,
      |       round((max(epoch_us(ts)) - min(epoch_us(ts))) / 3600000000.0, 6) AS coverage_hours
      |FROM events GROUP BY 1
      |ORDER BY total_readings DESC, user_id LIMIT 10""".stripMargin

  /** Q10 — multi-key sort + limit/offset pagination (O1/O3). */
  private def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), tsUs(col("ts")).as("ts_us"), col("event_type"), col("value"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .offset(50)
      .limit(100)

  private val q10Sql =
    """SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
      |FROM events
      |ORDER BY ts_us DESC, event_id DESC LIMIT 100 OFFSET 50""".stripMargin

  /** Q11 — per-day per-key summary view (V1/V2). */
  private def q11(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayStr(col("ts")).as("event_day"), col("user_id"))
      .agg(
        count(lit(1)).as("record_count"),
        countDistinct(col("event_type")).as("unique_event_types"),
        r6(avg(col("value"))).as("avg_value"),
        min(tsUs(col("ts"))).as("first_ts_us"),
        max(tsUs(col("ts"))).as("last_ts_us"))
      .orderBy("event_day", "user_id")

  private val q11Sql =
    """SELECT strftime(ts, '%Y-%m-%d') AS event_day, user_id,
      |       count(*) AS record_count,
      |       count(DISTINCT event_type) AS unique_event_types,
      |       round(avg(value), 6) AS avg_value,
      |       min(epoch_us(ts)) AS first_ts_us,
      |       max(epoch_us(ts)) AS last_ts_us
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q12 — 1-minute tumbling window aggregation (A1, batch replay of St2).
    * Uses Spark's `window()` grouping (epoch-aligned tumbling), the same
    * operator the Structured Streaming pipeline uses with a watermark.
    */
  private def q12(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(
        count(lit(1)).as("record_count"),
        countDistinct(col("user_id")).as("unique_users"),
        r6(avg(col("value"))).as("avg_value"))
      .select(
        tsUs(col("window.start")).as("ws_us"),
        col("event_type"), col("record_count"), col("unique_users"), col("avg_value"))
      .orderBy("ws_us", "event_type")

  private val q12Sql =
    """SELECT epoch_us(date_trunc('minute', ts)) AS ws_us, event_type,
      |       count(*) AS record_count,
      |       count(DISTINCT user_id) AS unique_users,
      |       round(avg(value), 6) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q13 — monitoring probes (A12–A16) at a pinned "now" so the sliding
    * time-horizon predicates are deterministic.
    */
  val pinnedNow = "2024-01-31 00:00:00"

  private def q13(spark: SparkSession, dir: String): DataFrame = {
    val now = lit(pinnedNow).cast("timestamp")
    val lastHour = col("ts") >= now - expr("INTERVAL 1 HOUR")
    val lastDay  = col("ts") >= now - expr("INTERVAL 24 HOURS")
    Tables.events(spark, dir)
      .agg(
        count(when(lastHour, 1)).as("events_last_hour"),
        count(when(lastDay, 1)).as("events_last_day"),
        count(when(lastDay && col("value") < 50.0, 1)).as("low_value_last_day"),
        r6(avg(when(lastDay, col("value")))).as("avg_value_last_day"),
        count(when(lastHour && col("event_type") === "error", 1)).as("errors_last_hour"),
        max(tsUs(col("ts"))).as("latest_ts_us"))
      .orderBy("events_last_hour")
  }

  private val q13Sql =
    s"""SELECT count(CASE WHEN ts >= TIMESTAMP '$pinnedNow' - INTERVAL 1 HOUR THEN 1 END) AS events_last_hour,
       |       count(CASE WHEN ts >= TIMESTAMP '$pinnedNow' - INTERVAL 24 HOURS THEN 1 END) AS events_last_day,
       |       count(CASE WHEN ts >= TIMESTAMP '$pinnedNow' - INTERVAL 24 HOURS AND value < 50.0 THEN 1 END) AS low_value_last_day,
       |       round(avg(CASE WHEN ts >= TIMESTAMP '$pinnedNow' - INTERVAL 24 HOURS THEN value END), 6) AS avg_value_last_day,
       |       count(CASE WHEN ts >= TIMESTAMP '$pinnedNow' - INTERVAL 1 HOUR AND event_type = 'error' THEN 1 END) AS errors_last_hour,
       |       max(epoch_us(ts)) AS latest_ts_us
       |FROM events ORDER BY events_last_hour""".stripMargin

  /** Q36 — alert emission (S9): quality+anomaly-score the events stream,
    * fold the reference's monitoring probes into one aggregate pass at
    * the pinned "now", and materialize every breached threshold as an
    * alert row (`src/monitoring/alerting.py:56-64,107-296,403-425`).
    * Graded columns are the portable subset of the stored-alert shape
    * (id/type/severity/title + metric/threshold doubles); description
    * text and the wall-clock-shaped timestamp stay in the operator
    * output but out of the hash.
    */
  private def q36(spark: SparkSession, dir: String): DataFrame = {
    val now = lit(pinnedNow).cast("timestamp")
    val scored = Quality(Tables.events(spark, dir),
        required = Seq("ts", "user_id", "event_type"),
        scored = Seq("ts", "user_id", "event_type", "value", "props"))
      .withColumn("anomaly_score", Anomaly.score(anomalyRules))
    graft.monitoring.Alerts(scored, now)
      .select(col("alert_id"), col("alert_type"), col("severity"),
        col("title"), col("metric_value"), col("threshold"))
      .orderBy("alert_id")
  }

  /** The alert-id stamp [[graft.monitoring.Alerts.evaluate]] derives from
    * the pinned now (`date_format(now, "yyyyMMdd_HHmmss")`).
    */
  private val pinnedStamp = java.time.LocalDateTime
    .parse(pinnedNow, java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))

  private lazy val q36Sql = {
    val hour = s"ts >= TIMESTAMP '$pinnedNow' - INTERVAL 1 HOUR"
    s"""WITH s AS (
       |  SELECT ts,
       |         ((CASE WHEN ts IS NOT NULL THEN 1.0 ELSE 0.0 END)
       |        + (CASE WHEN user_id IS NOT NULL THEN 1.0 ELSE 0.0 END)
       |        + (CASE WHEN event_type IS NOT NULL THEN 1.0 ELSE 0.0 END)
       |        + (CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END)
       |        + (CASE WHEN props IS NOT NULL THEN 1.0 ELSE 0.0 END)) / 5.0 AS q,
       |         CASE WHEN event_type = 'error'  AND value > 180.0 THEN 1.0
       |              WHEN event_type = 'signup' AND value > 190.0 THEN 0.8
       |              ELSE 0.0 END AS a
       |  FROM events
       |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL),
       |m AS (
       |  SELECT avg(CASE WHEN $hour THEN q END) AS avg_quality,
       |         count(CASE WHEN $hour THEN 1 END) AS total_records,
       |         count(CASE WHEN $hour AND q < 0.6 THEN 1 END) AS low_q,
       |         count(CASE WHEN $hour AND a > 0.0 THEN 1 END) AS anom,
       |         count(CASE WHEN ts >= TIMESTAMP '$pinnedNow' - INTERVAL 5 MINUTES THEN 1 END) AS recent,
       |         count(CASE WHEN ts >= TIMESTAMP '$pinnedNow' - INTERVAL 1 MINUTE THEN 1 END) AS thru
       |  FROM s),
       |r AS (
       |  SELECT 'data_quality_$pinnedStamp' AS alert_id, 'data_quality' AS alert_type,
       |         'warning' AS severity, 'Data Quality Below Threshold' AS title,
       |         round(coalesce(avg_quality, 0.0), 6)::DOUBLE AS metric_value,
       |         0.8::DOUBLE AS threshold
       |  FROM m WHERE coalesce(avg_quality, 0.0) < 0.8
       |  UNION ALL
       |  SELECT 'low_quality_rate_$pinnedStamp', 'data_quality', 'critical',
       |         'High Low Quality Data Rate',
       |         round(CASE WHEN total_records > 0 THEN low_q::DOUBLE / total_records ELSE 0.0 END, 6)::DOUBLE,
       |         0.1::DOUBLE
       |  FROM m WHERE CASE WHEN total_records > 0 THEN low_q::DOUBLE / total_records ELSE 0.0 END > 0.1
       |  UNION ALL
       |  SELECT 'no_data_$pinnedStamp', 'system_health', 'critical', 'No Data Received',
       |         recent::DOUBLE, 0.0::DOUBLE
       |  FROM m WHERE recent = 0
       |  UNION ALL
       |  SELECT 'low_throughput_$pinnedStamp', 'performance', 'warning', 'Low Throughput',
       |         thru::DOUBLE, 1000.0::DOUBLE
       |  FROM m WHERE thru < 1000
       |  UNION ALL
       |  SELECT 'high_anomaly_rate_$pinnedStamp', 'anomaly', 'warning', 'High Anomaly Rate',
       |         round(CASE WHEN total_records > 0 THEN anom::DOUBLE / total_records ELSE 0.0 END, 6)::DOUBLE,
       |         0.05::DOUBLE
       |  FROM m WHERE CASE WHEN total_records > 0 THEN anom::DOUBLE / total_records ELSE 0.0 END > 0.05)
       |SELECT * FROM r ORDER BY alert_id""".stripMargin
  }

  /** Q14 — enrichment join: events ⋈ customer dimension, grouped rollup.
    * The dimension is explicitly broadcast — at 100 TB the fact side never
    * shuffles for this join.
    */
  private def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("user_id") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("record_count"),
        countDistinct(col("user_id")).as("unique_users"),
        r6(avg(col("value"))).as("avg_value"),
        r6(avg(col("c_acctbal"))).as("avg_acctbal"))
      .orderBy("c_mktsegment")

  private val q14Sql =
    """SELECT c_mktsegment,
      |       count(*) AS record_count,
      |       count(DISTINCT user_id) AS unique_users,
      |       round(avg(value), 6) AS avg_value,
      |       round(avg(c_acctbal), 6) AS avg_acctbal
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q01_quality_score", q01, Some(q01Sql)),
    QueryDef("q02_daily_analytics", q02, Some(q02Sql)),
    QueryDef("q03_typed_conditional_agg", q03, Some(q03Sql)),
    QueryDef("q04_per_key_analytics", q04, Some(q04Sql)),
    QueryDef("q05_value_buckets", q05, Some(q05Sql)),
    QueryDef("q06_anomaly_rollup", q06, Some(q06Sql)),
    QueryDef("q07_global_summary", q07, Some(q07Sql)),
    QueryDef("q08_type_distribution", q08, Some(q08Sql)),
    QueryDef("q09_top_users", q09, Some(q09Sql)),
    QueryDef("q10_pagination", q10, Some(q10Sql)),
    QueryDef("q11_daily_user_view", q11, Some(q11Sql)),
    QueryDef("q12_minute_window", q12, Some(q12Sql)),
    QueryDef("q13_monitoring_probes", q13, Some(q13Sql)),
    QueryDef("q36_alerts", q36, Some(q36Sql)),
    QueryDef("q14_enrichment_join", q14, Some(q14Sql)))
}
