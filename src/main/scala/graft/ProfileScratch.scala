package graft

// Scratch plan inspector for the round-5 queries — NOT part of the
// library; deleted after use.
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names = args.headOption.map(_.split(",").toSet)
      .getOrElse(Set("q38_asof_join", "q39_interval_overlap", "q42_tfidf_topterms"))
    SparkEntry.registry.filter(q => names.contains(q.name)).foreach { q =>
      println(s"========== ${q.name} ==========")
      val df = q.spark(spark, dir)
      df.write.mode("overwrite").format("noop").save() // settle AQE
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
