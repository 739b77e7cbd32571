package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.monitoring.Alerts
import graft.operators.Anomaly
import graft.queries.CoreQueries
import graft.sources.JdbcSink
import graft.streaming.EventsStream

/** The reference's streaming processor
  * (`src/spark/streaming/SensorDataProcessor.scala:22-75`) as one
  * composed Structured Streaming job: source → quality → fork into
  * {windowed analytics, anomaly stream}, each checkpointed to its own
  * parquet table — the upstream plan is shared, windows aggregate across
  * micro-batches (unlike the reference's per-batch windows), and
  * recovery is exactly-once from the checkpoints.
  *
  * The source is pluggable so the identical pipeline runs from Kafka in
  * production ([[EventsStream.fromKafka]]) and from `MemoryStream` /
  * file sources in tests.
  */
object StreamingJob {

  /** Fork the two sink queries off one parsed+quality-checked stream.
    * Returns the running queries (caller awaits/stops).
    */
  def start(events: DataFrame, outDir: String): Seq[StreamingQuery] = {
    val quality = EventsStream.qualityChecked(events)
    val analytics = EventsStream
      .windowedAnalytics(quality)
    val anomalies = EventsStream
      .anomalies(quality, CoreQueries.anomalyRules)
    Seq(
      EventsStream.parquetSink(analytics, s"$outDir/windowed_analytics",
        s"$outDir/_ck/windowed_analytics")
        .outputMode("append").start(),
      EventsStream.parquetSink(anomalies, s"$outDir/anomalies",
        s"$outDir/_ck/anomalies")
        .outputMode("append").start())
  }

  /** The reference's serving deployment: the same forked pipeline
    * landing in the JDBC serving store instead of parquet tables —
    * `quality_checked`, `analytics` (watermark-finalized windows, so a
    * window lands exactly once), `anomalies` (the three tables of
    * `docker/init-db.sql:5-44`), plus per-batch alert evaluation into
    * `alerts` (`alerting.py`'s monitoring cycle, folded into the stream
    * at the batch's max event time). Every landing is the batchId-keyed
    * idempotent upsert, so restarts and replays converge to exactly one
    * copy of each row.
    */
  def startServing(events: DataFrame, url: String, ckDir: String)
      : Seq[StreamingQuery] = {
    val quality = EventsStream.qualityChecked(events)
    val scored = quality
      .withColumn("anomaly_score", Anomaly.score(CoreQueries.anomalyRules))
    Seq(
      JdbcSink.streamingSink(scored, url, "quality_checked", s"$ckDir/quality")
        .outputMode("append").start(),
      JdbcSink.streamingSink(EventsStream.windowedAnalytics(quality), url,
          "analytics", s"$ckDir/analytics")
        .outputMode("append").start(),
      JdbcSink.streamingSink(
          EventsStream.anomalies(quality, CoreQueries.anomalyRules), url,
          "anomalies", s"$ckDir/anomalies")
        .outputMode("append").start(),
      Alerts.streamingSink(scored, url, s"$ckDir/alerts")
        .outputMode("append").start())
  }

  /** Production entry: Kafka → pipeline.
    * `runMain graft.pipelines.StreamingJob <brokers> <topic> <outDir>`.
    */
  def main(args: Array[String]): Unit = {
    val Array(brokers, topic, outDir) = args.take(3)
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val queries = start(EventsStream.fromKafka(spark, brokers, topic), outDir)
    queries.foreach(_.awaitTermination())
  }
}
