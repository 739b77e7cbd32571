package graft

/** Plan-inspection utility: run one or more registry queries at a small
  * SF through the noop sink (so AQE settles) and print their physical
  * plans — the manual companion to PlanSpec's automated guards.
  *
  * Usage: `sbt 'runMain graft.ProfileScratch q38_asof_join,q42_tfidf_topterms'`
  * (defaults to the round-5 join/tf-idf trio). Note the printed tree is
  * the STATIC plan — runtime stage reuse (ReusedExchange under AQE) only
  * shows in the final adaptive plan; use PlanSpec's `finalNodes` helper
  * to assert on that.
  */
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
