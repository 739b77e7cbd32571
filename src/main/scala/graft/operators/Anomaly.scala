package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based anomaly scoring (reference P4,
  * `src/spark/streaming/SensorDataProcessor.scala:174-186`): a chained
  * `when(cond, score)` over declarative rules, `otherwise(0.0)`, then a
  * `score > 0` presence filter (P10).
  *
  * Rules are data (`AnomalyRule`), folded into one codegen'd `CASE WHEN`
  * chain — first matching rule wins, exactly like the reference's chained
  * `when`. Narrow op: no shuffle; the presence filter is a pushable
  * predicate.
  */
object Anomaly {

  /** One detection rule: boolean condition → anomaly score. */
  final case class AnomalyRule(name: String, cond: Column, score: Double)

  /** Fold rules into a single CASE WHEN … chain (first match wins). */
  def score(rules: Seq[AnomalyRule]): Column =
    rules
      .foldLeft(Option.empty[Column]) {
        case (None, r)      => Some(when(r.cond, lit(r.score)))
        case (Some(acc), r) => Some(acc.when(r.cond, lit(r.score)))
      }
      .map(_.otherwise(lit(0.0)))
      .getOrElse(lit(0.0))

  /** Attach the score column and keep only anomalous rows (P4 + P10). */
  def detect(df: DataFrame, rules: Seq[AnomalyRule],
             scoreCol: String = "anomaly_score"): DataFrame =
    df.withColumn(scoreCol, score(rules)).filter(col(scoreCol) > 0.0)
}
