package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Per-group quantiles, exact and approximate.
  *
  * `exact` uses Spark's sort-based `percentile` aggregate (linear
  * interpolation at rank p·(n-1), the same definition as ANSI
  * `percentile_cont` / DuckDB `quantile_cont`) — deterministic and
  * engine-portable, but it buffers every value of a group in one
  * aggregation buffer, so it is only safe when per-group cardinality is
  * bounded (dashboards over bounded key domains, correctness oracles).
  *
  * `approx` is the 100 TB path: `approx_percentile` (t-digest-style
  * QuantileSummaries) keeps a bounded sketch per group, merges map-side,
  * and guarantees rank error ≤ 1/accuracy — memory is O(accuracy·log n)
  * per group no matter how many rows. Spark's implementation is
  * deterministic for a given input multiset, but its compression
  * boundaries are implementation detail, so it is graded by tolerance
  * against `exact` in tests rather than by an external oracle.
  */
object Quantiles {

  /** Column label for a percentile: p50, p99, p99_9. Percentages are
    * snapped to 2 decimals first — p*100 alone is not exact in IEEE
    * doubles (0.29*100 = 28.999…996 would otherwise leak into the name).
    */
  private def label(p: Double): String = {
    val pct = math.rint(p * 10000) / 100.0
    if (pct == pct.floor) s"p${pct.toInt}" else s"p$pct".replace('.', '_')
  }

  /** Exact linear-interpolation quantiles per group, rounded to 6 places
    * (column per percentile: p50, p95, ...).
    */
  def exact(df: DataFrame, keyCol: String, valCol: String,
            ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    val aggs = ps.map(p => round(percentile(col(valCol), lit(p)), 6).as(label(p)))
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Bounded-memory approximate quantiles per group; rank error bounded
    * by 1/accuracy.
    */
  def approx(df: DataFrame, keyCol: String, valCol: String,
             ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    val aggs = ps.map(p =>
      approx_percentile(col(valCol), lit(p), lit(accuracy)).as(label(p)))
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Winsorize: clip `valCol` into its per-group [loP, hiP] quantile
    * range (the standard outlier treatment before computing means over
    * heavy-tailed pipeline metrics). Adds `<valCol>_w` next to the input
    * columns. Two passes — the quantile aggregate (a few rows per group)
    * broadcast-joined back onto the rows — which is the minimal movement
    * for a per-group data-dependent bound; the clip itself is narrow.
    * Bounds come from [[exact]] (rounded to 6), so the clipped values
    * are engine-reproducible. Null values stay null — Spark's
    * `greatest`/`least` SKIP nulls, so an unguarded clip would
    * fabricate the upper bound for every null metric.
    */
  /** Robust per-group outlier detection via the MODIFIED z-score
    * (Iglewicz & Hoaglin 1993): `med` = group median, `mad` = median of
    * `|v − med|`, `rob_z = 0.6745·(v − med)/mad`, outlier when
    * `|rob_z| > cut` (their recommended 3.5). Unlike the mean/stddev
    * z-score the reference's rule table approximates, the estimator has
    * a 50% breakdown point — the outliers themselves cannot inflate the
    * threshold and mask each other. Emits ONLY the outlier rows
    * (`idCols`, key, value, med, mad, rob_z — output bounded by the
    * outlier rate, not the corpus); groups with `mad = 0` are skipped
    * (the score is undefined on degenerate distributions).
    *
    * Two [[exact]]-median aggregates (per-group sort buffers — the
    * documented bounded-group caveat; the group domain here is a key
    * enum, and [[approx]] is the drop-in at unbounded cardinality),
    * each broadcast back onto the rows; the deviation and flag passes
    * are narrow. Medians and the score round to 6 before the
    * threshold compare, so the flag itself is engine-portable.
    */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
                  cut: Double = 3.5): DataFrame = {
    require(cut > 0.0, s"cut must be positive, got $cut")
    val med = exact(df, keyCol, valCol, Seq(0.5))
      .withColumnRenamed("p50", "med")
    val dev = df.join(broadcast(med), keyCol)
      .withColumn("__graft_ad", abs(col(valCol) - col("med")))
    val mad = exact(dev, keyCol, "__graft_ad", Seq(0.5))
      .withColumnRenamed("p50", "mad")
    dev.join(broadcast(mad), keyCol)
      .filter(col("mad") =!= 0.0)
      .withColumn("rob_z",
        round(lit(0.6745) * (col(valCol) - col("med")) / col("mad"), 6))
      .filter(abs(col("rob_z")) > cut)
      .drop("__graft_ad")
  }

  def winsorized(df: DataFrame, keyCol: String, valCol: String,
                 loP: Double, hiP: Double): DataFrame = {
    require(loP < hiP, s"need loP < hiP, got $loP >= $hiP")
    val bounds = exact(df, keyCol, valCol, Seq(loP, hiP))
      .withColumnRenamed(label(loP), "__w_lo")
      .withColumnRenamed(label(hiP), "__w_hi")
    df.join(broadcast(bounds), keyCol)
      .withColumn(s"${valCol}_w",
        when(col(valCol).isNotNull,
          greatest(col("__w_lo"), least(col("__w_hi"), col(valCol)))))
      .drop("__w_lo", "__w_hi")
  }

  /** Deterministic bottom-k hash-sample quantiles — the
    * ORACLE-GRADEABLE bounded-memory member of the family. [[exact]]
    * buffers whole groups (safe only on bounded key domains);
    * [[approx]] is bounded but its t-digest compression boundaries are
    * engine-private, so it can only ever be tolerance-graded. This one
    * keeps, per group, the `k` rows with the SMALLEST content hash
    * (`md5₆₀(squant:id)` — a uniform-without-replacement row sample,
    * the KMV bottom-k discipline) and takes exact TYPE-1 quantiles of
    * the sample: rank `max(1, ⌈p·m⌉)` in (value, hash, id) order, a
    * total order so ties can't float. Every selection step is
    * integer/compare arithmetic on top of the raw values, so an
    * external engine restates the result bit-for-bit; rank error is
    * the sampling error, O(1/√k) — k=512 gives ~±2 percentile points
    * at p50, tighter in the tails than the rank spacing suggests
    * because the sample is without replacement.
    *
    * Scale shape: the bottom-k filter is a rank-limited window
    * (`row_number ≤ k`), which Spark rewrites to `WindowGroupLimit` —
    * a map-side partial top-k per partition before the single
    * per-group merge, never a full-group sort/buffer; the second
    * window and the quantile pick run on the ≤ k-row-per-group sample
    * only. Bottom-k samples are mergeable (bottom-k of a union is the
    * bottom-k of the bottom-ks), so per-shard samples combine without
    * re-reading rows — the t-digest merge story with none of the
    * engine-private state. Emits `(keyCol, sample_n, p…)`.
    */
  def sampled(df: DataFrame, keyCol: String, valCol: String,
              idCol: String, k: Int, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    require(k >= 1, s"sample size must be >= 1, got $k")
    val wk = Window.partitionBy(col(keyCol))
    val smp = df.select(col(keyCol), col(valCol), col(idCol).as("__q_id"),
        TextFns.md5Hash60(concat(lit("squant:"), col(idCol))).as("__q_h"))
      .withColumn("__q_rn",
        row_number().over(wk.orderBy(col("__q_h"), col("__q_id"))))
      .filter(col("__q_rn") <= k)
    val ranked = smp
      .withColumn("__q_rq", row_number().over(
        wk.orderBy(col(valCol), col("__q_h"), col("__q_id"))))
      .withColumn("__q_m", count(lit(1)).over(wk))
    val aggs = ps.map { p =>
      max(when(col("__q_rq") ===
          greatest(lit(1L), ceil(lit(p) * col("__q_m"))),
        round(col(valCol), 6))).as(label(p))
    }
    ranked.groupBy(col(keyCol))
      .agg(max(col("__q_m")).as("sample_n"), aggs: _*)
  }
}
