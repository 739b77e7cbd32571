package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality operators: completeness filtering and quality scoring.
  *
  * Re-expresses the reference's quality stage
  * (`src/spark/streaming/SensorDataProcessor.scala:142-154`): a conjunctive
  * not-null filter over required fields (P1) followed by a quality score that
  * counts non-null indicator terms (P2). The reference computes a raw 0–5 sum
  * while every downstream consumer treats the score as 0–1
  * (`src/monitoring/alerting.py:56`, `docker/init-db.sql:14`); we emit the
  * normalized `sum/ n` form (SURVEY §7.5.2).
  *
  * Both operators are pure narrow projections/filters — no shuffle, fully
  * inside whole-stage codegen, and the not-null conjunction is pushed down to
  * the Parquet scan by Catalyst.
  */
object Quality {

  /** P1 — keep rows where every required column is non-null. */
  def completenessFilter(df: DataFrame, required: Seq[String]): DataFrame =
    df.filter(required.map(col(_).isNotNull).reduce(_ && _))

  /** P2 — normalized quality score: fraction of `scored` columns non-null. */
  def qualityScore(scored: Seq[String]): Column = {
    val n = scored.size.toDouble
    scored
      .map(c => when(col(c).isNotNull, 1.0).otherwise(0.0))
      .reduce(_ + _) / lit(n)
  }

  /** Filter on required columns, then attach the normalized quality score. */
  def apply(df: DataFrame, required: Seq[String], scored: Seq[String],
            scoreCol: String = "quality_score"): DataFrame =
    completenessFilter(df, required).withColumn(scoreCol, qualityScore(scored))
}
