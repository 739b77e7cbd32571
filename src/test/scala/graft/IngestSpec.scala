package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.sources.Ingest

/** Wire-format ingest tests: schema-enforced JSONL/CSV reads split
  * cleanly into good rows and dead-letter rows, with the raw line
  * preserved for replay.
  */
class IngestSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("jsonl: good rows parse to the declared schema, bad rows dead-letter") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.jsonl"),
      """{"event_id": 1, "event_type": "click", "value": 1.5}
        |{"event_id": 2, "event_type": "view", "value": 2.0}
        |{broken json line
        |{"event_id": "not_a_number", "event_type": "view", "value": 3.0}
        |{"event_id": 5, "event_type": "error", "value": 9.9}
        |""".stripMargin)
    val (good, badDf) = Ingest.split(Ingest.jsonl(spark, s"$dir/in.jsonl", schema))
    assert(good.columns.toSeq == Seq("event_id", "event_type", "value"))
    assert(good.select($"event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 5L))
    val bad = badDf.select(Ingest.CorruptCol).as[String].collect()
    assert(bad.length == 2)
    assert(bad.exists(_.contains("broken json line")))
    assert(bad.exists(_.contains("not_a_number"))) // raw line kept for replay
  }

  test("csv: type-bad rows dead-letter, header respected") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      """event_id,event_type,value
        |1,click,1.5
        |oops,view,2.0
        |3,error,bad_double
        |4,view,4.25
        |""".stripMargin)
    val (good, badDf) = Ingest.split(Ingest.csv(spark, s"$dir/in.csv", schema))
    // row 3's type error is in `value` only — without the full-parse
    // cache, an event_id-pruned read would mis-classify it as good
    assert(good.select($"event_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    val bad = badDf.select(Ingest.CorruptCol).as[String].collect()
    assert(bad.length == 2 && bad.exists(_.startsWith("oops,")) &&
      bad.exists(_.contains("bad_double")))
  }
}
