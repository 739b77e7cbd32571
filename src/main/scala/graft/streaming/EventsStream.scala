package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.operators.{Anomaly, Quality}
import graft.operators.Anomaly.AnomalyRule

/** Structured Streaming pipeline (SURVEY §2.9, St1–St8) — the reference's
  * legacy DStream job (`src/spark/streaming/SensorDataProcessor.scala`)
  * re-expressed on the modern engine, with the two deliberate semantic
  * upgrades documented in SURVEY §7.5.3:
  *
  *  - **true cross-batch tumbling windows** with a watermark, instead of
  *    the reference's per-micro-batch windows (`SensorDataProcessor
  *    .scala:161` computes `window()` inside `foreachRDD`, so windows
  *    spanning batch boundaries are fragmented and re-emitted);
  *  - **`approx_count_distinct`** in streaming aggregations (exact
  *    distinct is unsupported in update-mode streaming; batch parity
  *    queries keep exact `countDistinct`).
  *
  * One upstream plan (source → parse → quality) forks into the windowed
  * analytics and the anomaly stream, exactly like the reference's
  * quality → {analytics, anomalies} fan-out (`SensorDataProcessor
  * .scala:116-122`), each written by its own checkpointed query (St5/St6:
  * exactly-once to files via checkpoint + WAL, vs the reference's
  * offsets-never-committed at-most-once).
  */
object EventsStream {

  /** Canonical streamed-event schema (mirrors the `events` table). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** S1/S2 — Kafka source → canonical events stream: subscribe, cast the
    * payload to string, `from_json` with the declared schema (replaces
    * the reference's per-record Jackson parse in `rdd.map`,
    * `SensorDataProcessor.scala:100-112`), drop unparseable records.
    *
    * Requires the `spark-sql-kafka` connector on the classpath (present
    * in any Kafka-enabled Spark distribution; NOT in this container's
    * `/opt/spark/jars`, so tests drive the identical post-source plan via
    * `MemoryStream` instead — see StreamingSpec).
    */
  def fromKafka(spark: SparkSession, brokers: String, topic: String,
                startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(from_json(col("value").cast("string"), schema).as("e"))
      .filter(col("e.event_id").isNotNull)
      .select("e.*")

  /** S7 — Kafka sink payload: key `userId_eventType` (the reference keys
    * by `vehicleId_sensorId`, `SensorDataProducer.scala:53`), value =
    * full-record JSON.
    */
  def kafkaPayload(df: DataFrame): DataFrame =
    df.select(
      concat_ws("_", col("user_id"), col("event_type")).as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** Whether the `spark-sql-kafka` connector is on the classpath (it
    * ships with Kafka-enabled Spark distributions, not with this
    * container's `/opt/spark/jars`).
    *
    * Why the boundary stays mocked (evaluated round 12): an embedded-
    * broker end-to-end test needs kafka-server + the connector jars,
    * and NEITHER exists anywhere in this environment (no Kafka
    * artifact under /opt/spark/jars or the offline coursier cache, and
    * dependency resolution is zero-egress) — so S1/S7 remain graded by
    * MemoryStream semantics + the wire-schema round-trip
    * (StreamingSpec) + this presence guard, which together pin
    * everything except the broker socket itself.
    */
  def kafkaConnectorAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** S7 (write half) — batch Kafka producer: land a DataFrame on a topic
    * as keyed JSON records via [[kafkaPayload]]. Replaces the reference's
    * driver-side producer loop (`SensorDataProducer.scala:26-84`: one
    * KafkaProducer on the driver, a `Future` per record) with the
    * distributed sink — each partition opens its own producer, so
    * throughput scales with executors instead of one driver connection;
    * durability options (acks=all, idempotence) pass through as
    * `kafka.`-prefixed options.
    *
    * Guarded on connector presence so the failure mode is a clear
    * message, not a provider-lookup stack trace.
    */
  def writeKafkaBatch(df: DataFrame, brokers: String, topic: String,
                      options: Map[String, String] = Map(
                        "kafka.acks" -> "all",
                        "kafka.enable.idempotence" -> "true")): Unit = {
    require(kafkaConnectorAvailable,
      "spark-sql-kafka connector not on classpath; add the " +
        "spark-sql-kafka-0-10 package to write to Kafka")
    kafkaPayload(df)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .options(options)
      .save()
  }

  /** P1/P2 on the stream: completeness filter + normalized quality score
    * — the same `graft.operators.Quality` the batch path uses (narrow,
    * codegen'd, no state).
    */
  def qualityChecked(df: DataFrame): DataFrame =
    Quality(df,
      required = Seq("ts", "user_id", "event_type"),
      scored = Seq("ts", "user_id", "event_type", "value", "props"))

  /** A1/St2/St3 — cross-batch tumbling window analytics with watermark. */
  def windowedAnalytics(df: DataFrame,
                        watermark: String = "2 minutes",
                        windowLength: String = "1 minute"): DataFrame =
    df.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("record_count"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        avg(col("value")).as("avg_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("record_count"),
        col("approx_users"), col("avg_value"))

  /** P4/P10 on the stream — the same declarative rule fold as batch Q6. */
  def anomalies(df: DataFrame, rules: Seq[AnomalyRule]): DataFrame =
    Anomaly.detect(df, rules)

  /** §7.3 extension — per-user session aggregation with a dynamic-gap
    * session window (the streaming twin of the batch `Sessionize`
    * operator; state is scoped per key and expired by the watermark, so
    * it runs indefinitely at any scale).
    */
  def sessionAgg(df: DataFrame,
                 gap: String = "30 minutes",
                 watermark: String = "2 minutes"): DataFrame =
    df.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        avg(col("value")).as("avg_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("avg_value"))

  /** S5 — checkpointed append sink to a parquet table path (the streaming
    * replacement for the reference's per-batch `saveAsTable` with a
    * `count() > 0` guard — Structured Streaming handles empty batches and
    * recovery itself).
    */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
                  trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)

  /** S8/St6 — exactly-once-effect batch sink: each micro-batch lands in a
    * `_batch_id=<id>` partition via dynamic partition overwrite, so a
    * batch REPLAYED after restart overwrites its own partition instead of
    * appending duplicates (the reference commits no offsets at all —
    * at-most-once; checkpoint + idempotent-by-batchId writes give
    * effectively-exactly-once, the same pattern a JDBC upsert keyed by
    * batchId uses).
    */
  def idempotentBatchSink(df: DataFrame, path: String, checkpoint: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id")
          .parquet(path)
      }

  /** Per-key gap-alert state for [[gapAlerts]]. */
  case class GapState(lastTsUs: Long)

  /** A detected inter-event gap over the threshold. */
  case class GapAlert(user_id: Long, gap_us: Long, at_us: Long)

  /** §7.3/St4 — custom streaming state: per-user gap detection via
    * `flatMapGroupsWithState` (the streaming twin of the batch
    * `Sessionize.gapStats`). Emits an alert whenever the gap between
    * consecutive events of a user exceeds `thresholdUs`. State is one
    * timestamp per key, expired by EVENT-TIME timeout riding the
    * watermark — bounded regardless of stream length (the property that
    * lets it run forever on an unbounded fleet of keys), and no
    * timeout-driven idle micro-batches (a processing-time timeout keeps
    * the engine re-triggering empty batches forever).
    *
    * Input must carry `user_id: long` and `ts: timestamp`. Events
    * within a micro-batch are processed in event-time order; exact
    * cross-batch ordering is the engine's delivery order, as with any
    * per-key streaming state.
    */
  def gapAlerts(df: DataFrame, thresholdUs: Long,
                watermark: String = "10 minutes"): Dataset[GapAlert] = {
    val spark = df.sparkSession
    import spark.implicits._
    // the watermarked timestamp column must flow INTO the stateful op
    // unchanged — projecting it away (e.g. to unix_micros) discards the
    // watermark and the analyzer rejects event-time timeout
    df.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GapState, GapAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[GapState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            def micros(t: java.sql.Timestamp): Long =
              t.getTime / 1000 * 1000000L + t.getNanos / 1000
            val sorted = rows.map(r => micros(r._2)).toSeq.sorted
            var last = state.getOption.map(_.lastTsUs)
            val alerts = sorted.flatMap { us =>
              val a = last match {
                case Some(prev) if us - prev > thresholdUs =>
                  Some(GapAlert(user, us - prev, us))
                case _ => None
              }
              last = Some(us)
              a
            }
            last.foreach { us =>
              state.update(GapState(us))
              // expire once the watermark passes last-event + threshold:
              // a further gap alert for this key is then impossible
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs + 1,
                  us / 1000 + thresholdUs / 1000))
            }
            alerts.iterator
          }
      }
  }

  /** Per-key CUSUM state for [[cusumAlerts]]: both one-sided sums. */
  case class CusumState(hi: Double, lo: Double)

  /** A CUSUM drift alarm: which side tripped, at what accumulated sum. */
  case class CusumAlert(key: String, at_us: Long, side: String, sum: Double)

  /** §7.3/St4 — streaming CUSUM drift alerts: the EXACT Page (1954)
    * recursion the batch [[graft.operators.TimeSeries.cusum]] windows
    * approximate — streaming is where the unbounded-prefix recursion is
    * natural, because the whole accumulated state is TWO DOUBLES per
    * key in `mapGroupsWithState` (the batch twin bounds its trailing
    * frame precisely because it lacks this carry). Emits an alert row
    * whenever either one-sided sum crosses `alarmAt`, with the sum
    * RESET after alarming (Page's restart — otherwise one drift alarms
    * on every subsequent event).
    *
    * `target`/`slack`/`alarmAt` come from a batch profile (q125's
    * median/MAD stats — monitoring configures from history, it doesn't
    * re-estimate per batch). Keys are a bounded domain (event/sensor
    * types), so state needs no timeout; within a micro-batch events
    * process in event-time order, cross-batch ordering is delivery
    * order (the [[gapAlerts]] contract).
    */
  def cusumAlerts(df: DataFrame, target: Double, slack: Double,
                  alarmAt: Double,
                  watermark: String = "10 minutes"): Dataset[CusumAlert] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.withWatermark("ts", watermark)
      .select(col("event_type"), col("ts"), col("value").cast("double"))
      .as[(String, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[CusumState]) =>
          def micros(t: java.sql.Timestamp): Long =
            t.getTime / 1000 * 1000000L + t.getNanos / 1000
          var s = state.getOption.getOrElse(CusumState(0.0, 0.0))
          val alerts = rows.toSeq.sortBy(r => micros(r._2)).flatMap {
            case (_, ts, v) =>
              var hi = s.hi + v - (target + slack)
              if (hi < 0.0) hi = 0.0
              var lo = s.lo + (target - slack) - v
              if (lo < 0.0) lo = 0.0
              val out = Seq.newBuilder[CusumAlert]
              if (hi > alarmAt) {
                out += CusumAlert(key, micros(ts), "hi", hi)
                hi = 0.0
              }
              if (lo > alarmAt) {
                out += CusumAlert(key, micros(ts), "lo", lo)
                lo = 0.0
              }
              s = CusumState(hi, lo)
              out.result()
          }
          state.update(s)
          alerts.iterator
      }
  }

  /** §7.3/St — streaming ingest dedup: drop re-deliveries of the same
    * `event_id` arriving within the watermark delay of each other (an
    * at-least-once source — a Kafka producer retry, a replayed partition
    * — re-delivers records; this makes the downstream pipeline
    * effectively exactly-once per event id). `dropDuplicatesWithinWatermark`
    * keys the dedup state by id and EXPIRES each key once the watermark
    * passes its event time + delay, so state is bounded by the
    * re-delivery window instead of growing with the stream (a plain
    * streaming `dropDuplicates` keeps every id forever).
    */
  def dedupedEvents(df: DataFrame, watermark: String = "10 minutes"): DataFrame =
    df.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** §7.3/St — stream-stream interval join: each purchase attributed to
    * the same user's clicks in the preceding `horizon` (the streaming
    * twin of the batch as-of join, q38 — streaming can't express "latest
    * prior" directly because later micro-batches could always deliver a
    * later click, so the horizon-window set is the well-defined streaming
    * analogue; pick the latest downstream if single-attribution is
    * needed).
    *
    * Both sides carry watermarks and the join condition bounds click
    * age, so the engine sizes and EXPIRES join state from watermark +
    * horizon — bounded state on an unbounded stream. Left-outer: a
    * purchase with no qualifying click still emits (null click columns)
    * once the click watermark passes `ts`, guaranteeing no purchase is
    * silently dropped from attribution.
    */
  def attributedPurchases(events: DataFrame,
                          horizon: String = "1 hour",
                          watermark: String = "10 minutes"): DataFrame = {
    // ONE watermark on the source, branched after: each side's watermark
    // is tracked by the operator that SEES the events, so watermarking
    // after the event-type filters would let a click-only stretch stall
    // the purchase side's watermark at its last purchase (global
    // watermark = min of both) and indefinitely delay the outer-null
    // emissions. The watermark tag rides the renamed column through the
    // branch projections.
    val wm = events.withWatermark("ts", watermark)
    val clicks = wm.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val purchases = wm.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    purchases.join(clicks,
        expr(s"user_id = click_user AND " +
          s"click_ts >= ts - interval $horizon AND click_ts <= ts"),
        "leftOuter")
      .drop("click_user")
  }

  /** St8 — per-batch observed metrics (replaces the reference's
    * driver-side `count()` prints, which re-execute the plan): metrics
    * ride the existing computation and surface in each
    * `StreamingQueryProgress.observedMetrics` / via listener.
    */
  def withMetrics(df: DataFrame, name: String = "graft_metrics"): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      avg(col("value")).as("avg_value"),
      max(col("ts")).as("max_event_time"))
}
