package graft

// Scratch stage profiler for q21 — NOT part of the library; deleted
// after use.
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        System.gc(); val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${runs.min}%.2f s")
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    val n = 3; val threshold = 0.6
    val sh = docs.select(col("doc_id").as("id"),
        TextFns.shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .repartition(col("id"))
    val prefLen =
      (size(col("sh")) - ceil(round(lit(threshold) * size(col("sh")), 9)) + 1)
        .cast("int")
    val hashOrdered = transform(
      array_sort(transform(col("sh"), g => struct(xxhash64(g).as("h"), g.as("g")))),
      s => s.getField("g"))
    val prefix = sh.select(col("id"),
      explode(slice(hashOrdered, lit(1), prefLen)).as("g"))
    val hotKeys = prefix.groupBy(col("g"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 4096).select(col("g"))
    val small = prefix.join(broadcast(hotKeys), Seq("g"), "left_anti")
    val collected = small.groupBy(col("g"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairs = graft.operators.Dedup.candidatePairs(prefix, Seq("g"))
    val full = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", n, threshold)

    time("sh materialize")(noop(sh))
    time("prefix index")(noop(prefix))
    time("census hotKeys")(noop(hotKeys))
    time("collect_set buckets")(noop(collected))
    time("candidatePairs+distinct")(noop(pairs))
    time("full q21")(noop(full.orderBy("id_a", "id_b")))
    println("[profile] candidate pair count: " + pairs.count())
    println("[profile] bucket count: " + collected.count())
    spark.stop()
  }
}
