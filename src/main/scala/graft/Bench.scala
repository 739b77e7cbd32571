package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every registry query at SPARK_GRAFT_SF_DIR and
  * prints the one-line JSON contract the driver parses.
  *
  * Timing honesty: results are materialized through the `noop` sink, not
  * `count()` — counting lets Catalyst eliminate ORDER BY and prune every
  * column, so sort- and projection-heavy queries would time as cheaper
  * plans than the ones users run. Queries run in registry order after an
  * untimed warmup action so JIT/codegen/parquet-reader startup isn't
  * attributed to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // Untimed warmup at the smallest SF: generated code depends on plan
    // shape, not data size, so this compiles each query's codegen/JIT
    // once (worth ~9 s on the heaviest expression trees) without paying
    // full-size execution twice. Residual cold cost: AQE join-shape
    // differences between SFs.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.registry.foreach { q =>
      try materialize(q.spark(spark, warmDir)) catch { case _: Throwable => () }
    }
    val results = SparkEntry.registry.map { q =>
      val t0 = System.nanoTime()
      try materialize(q.spark(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
