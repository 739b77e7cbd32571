package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass table profiling — the "know your data before you curate
  * it" step (and the engine-side ANALYZE a serving layer runs before
  * choosing join strategies): per column, row count, null count, and
  * exact distinct count, in long form `(col_name, n_rows, n_nulls,
  * n_distinct)`.
  *
  * ONE aggregate over ONE scan: all per-column counts are computed as
  * sibling aggregates (Spark plans the multi-`countDistinct` through a
  * single Expand + two-level aggregate — k× row expansion, map-side
  * partials, one shuffle), then the one-row result melts to long form
  * with a narrow explode. Never k separate scans, nothing driver-side.
  * Exact distincts are the point at profile time; callers needing the
  * cheap estimate at 100 TB swap `approx_count_distinct` (or the KMV
  * sketch in [[graft.expressions.KMinValues]]) — noted rather than
  * defaulted because the exact/approx choice changes the contract.
  */
object Profile {

  /** Profile `cols` (default: every column) of `df`. */
  def table(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val target = if (cols.nonEmpty) cols else df.columns.toSeq
    require(target.nonEmpty, "nothing to profile")
    val aggs = target.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(target.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"))): _*)).as("p"))
      .select(col("p.*"))
  }
}
