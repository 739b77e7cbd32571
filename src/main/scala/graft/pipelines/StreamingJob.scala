package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.CoreQueries
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
