package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.TableSink

/** Tests for the batch sinks (dynamic partition overwrite, bucketed
  * co-located joins) and the salted skew join.
  */
class SinkSkewSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  test("dynamic partition overwrite replaces only the written partitions") {
    val dir = Files.createTempDirectory("graft_dpo").toString
    val day1 = Seq((1L, "d1", 10.0), (2L, "d1", 20.0)).toDF("id", "day", "v")
    val day2 = Seq((3L, "d2", 30.0)).toDF("id", "day", "v")
    TableSink.overwritePartitions(day1.union(day2), dir, Seq("day"))
    // rewrite ONLY day2 with new content
    val day2b = Seq((4L, "d2", 99.0)).toDF("id", "day", "v")
    TableSink.overwritePartitions(day2b, dir, Seq("day"))
    val back = spark.read.parquet(dir)
    assert(back.filter($"day" === "d1").count() == 2) // untouched
    val d2 = back.filter($"day" === "d2").select("id").as[Long].collect()
    assert(d2.toSeq == Seq(4L)) // replaced
  }

  test("compacted: splintered partitions land as few files; rows intact") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val splintered = (1L to 2000L).toDF("id").repartition(32)
    TableSink.compacted(splintered).write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files == 1, s"2000 small rows must compact to 1 file, got $files")
    assert(spark.read.parquet(dir).count() == 2000)
  }

  test("overwriteSorted: files cover disjoint key ranges (min/max skipping)") {
    val dir = Files.createTempDirectory("graft_sorted").toString
    val df = (1L to 10000L).map(i => (i % 97, i)).toDF("k", "id")
      .repartition(8) // scrambled input layout
    TableSink.overwriteSorted(df, dir, Seq(col("k")), numFiles = Some(5))
    val parts = new java.io.File(dir).listFiles
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length > 1, "need multiple files to prove disjoint layout")
    val ranges = parts.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min($"k"), max($"k")).as[(Long, Long)].head()
      r
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"file ranges overlap: hi=$hi lo=$lo")
      case _ => ()
    }
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("bucketed tables join with no shuffle exchange on either side") {
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1L to 1000L).map(i => (i % 50, i.toDouble)).toDF("k", "v")
      val dims = (0L until 50L).map(i => (i, s"name_$i")).toDF("k", "name")
      TableSink.writeBucketed(facts, "graft_facts_b", "k", 8)
      TableSink.writeBucketed(dims, "graft_dims_b", "k", 8)
      val joined = spark.table("graft_facts_b").join(spark.table("graft_dims_b"), "k")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join should not shuffle:\n$physical")
      assert(joined.count() == 1000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("salted join equals the plain join (exactness under salting)") {
    val big = (1L to 500L).map(i => (if (i <= 450) 1L else i % 10, i))
      .toDF("k", "payload") // key 1 is hot: 450 of 500 rows
    val small = (0L until 10L).map(i => (i, s"dim_$i")).toDF("k", "name")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = canon(big.join(small, "k"))
    val salted = canon(Skew.saltedJoin(big, small, "k", salt = 8))
    assert(salted == plain && plain.nonEmpty)
  }

  test("salted join default salt skips unhashable map columns") {
    val big = (1L to 100L).map(i => (1L, i)).toDF("k", "payload")
      .withColumn("props", map(lit("a"), col("payload"))) // maps can't be hashed
    val small = Seq((1L, "dim")).toDF("k", "name")
    val got = Skew.saltedJoin(big, small, "k", salt = 4)
      .select("k", "payload", "name").collect()
    assert(got.length == 100) // would throw AnalysisException if maps were hashed
  }
}
