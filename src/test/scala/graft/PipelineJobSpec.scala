package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipelines.{BatchJob, StreamingJob}

/** End-to-end tests for the composed jobs (the reference's two mains). */
class PipelineJobSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  test("BatchJob writes all five aggregate tables with consistent counts") {
    val out = Files.createTempDirectory("graft_batchjob").toString
    val counts = BatchJob.run(spark, sf, out)
    assert(counts.keySet == Set("daily_analytics", "user_analytics",
      "value_buckets", "type_conditional", "anomaly_rollup"))
    assert(counts.values.forall(_ > 0))
    // cross-check one table against the raw data
    val days = graft.sources.Tables.events(spark, sf)
      .select(countDistinct(to_date(col("ts")))).collect().head.getLong(0)
    assert(counts("value_buckets") == days)
    // partition layout is by event_day (dynamic overwrite ready)
    val part = new java.io.File(s"$out/daily_analytics").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(part.nonEmpty && part.forall(_.startsWith("event_day=")))
  }

  test("StreamingJob forks analytics + anomalies off one stream") {
    implicit val ctx = spark.sqlContext
    val out = Files.createTempDirectory("graft_streamjob").toString
    val in = MemoryStream[Ev]
    val queries = StreamingJob.start(in.toDF(), out)
    try {
      in.addData(
        Ev(1, new java.sql.Timestamp(61000L), 1, "click", 10.0, "{}"),
        Ev(2, new java.sql.Timestamp(70000L), 2, "error", 200.0, "{}"),
        Ev(3, new java.sql.Timestamp(80000L), 1, "signup", 195.0, "{}"),
        // advance the watermark so the window closes and appends
        Ev(4, new java.sql.Timestamp(600000L), 3, "view", 1.0, "{}"))
      queries.foreach(_.processAllAvailable())
      val anomalies = spark.read.parquet(s"$out/anomalies")
        .select("event_id").as[Long].collect().sorted
      assert(anomalies.toSeq == Seq(2L, 3L)) // error>180 and signup>190 rules
      val win = spark.read.parquet(s"$out/windowed_analytics")
      assert(win.filter(col("window_start") === lit(new java.sql.Timestamp(60000L)))
        .agg(sum("record_count")).collect().head.getLong(0) == 3L)
    } finally queries.foreach(_.stop())
  }
}
