package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.operators.{Anomaly, Quality}
import graft.operators.Anomaly.AnomalyRule

/** Unit tests for the row-level operators (SURVEY P1/P2/P4/P10) on
  * hand-written fixtures with known answers.
  */
class OperatorSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  test("P1 completeness filter keeps only fully-populated required fields") {
    val df = Seq(
      (Some("a"), Some(1.0)),
      (None: Option[String], Some(2.0)),
      (Some("c"), None: Option[Double])
    ).toDF("k", "v")
    assert(Quality.completenessFilter(df, Seq("k", "v")).count() === 1)
    assert(Quality.completenessFilter(df, Seq("k")).count() === 2)
  }

  test("P2 quality score is the non-null fraction, normalized to 0-1") {
    val df = Seq(
      (Some("a"), Some(1.0), Some("x")),
      (None: Option[String], Some(2.0), Some("y")),
      (None: Option[String], None: Option[Double], None: Option[String])
    ).toDF("a", "b", "c")
    val scores = df.select(Quality.qualityScore(Seq("a", "b", "c")).as("q"))
      .collect().map(_.getDouble(0)).sorted
    assert(scores.toSeq == Seq(0.0, 2.0 / 3.0, 1.0))
  }

  test("P4 anomaly rules: first match wins, boundary is strict >") {
    val rules = Seq(
      AnomalyRule("high", col("v") > 200.0, 1.0),
      AnomalyRule("mid", col("v") > 100.0, 0.5))
    val df = Seq(99.0, 100.0, 100.01, 200.0, 200.01, 300.0).toDF("v")
    val got = df.withColumn("s", Anomaly.score(rules))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(99.0) == 0.0 && got(100.0) == 0.0)
    assert(got(100.01) == 0.5 && got(200.0) == 0.5)
    assert(got(200.01) == 1.0 && got(300.0) == 1.0)
  }

  test("P10 presence filter drops score-0 rows") {
    val rules = Seq(AnomalyRule("r", col("v") > 1.0, 1.0))
    val df = Seq(0.5, 1.5, 2.5).toDF("v")
    assert(Anomaly.detect(df, rules).count() === 2)
  }
}
