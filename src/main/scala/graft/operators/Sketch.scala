package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketching — the approximate-count counterpart of
  * the KMV distinct sketch ([[graft.expressions.KMinValues]], q40): a
  * count-min sketch (Cormode & Muthukrishnan 2005) built as a BOUNDED
  * `depth × width` cell table, so corpus-scale term frequencies compress
  * to a fixed-size frame that broadcasts anywhere (heavy-hitter
  * monitoring, per-shard merge-and-query, stream accumulators).
  *
  * Both steps use the engine's portable md5-derived hash (row `i` salts
  * with `"cms<i>"`), so the sketch — and every estimate off it — is
  * reproducible cross-engine and across runs/partitionings, like every
  * hash in [[Splits]]. Estimates carry the classic one-sided guarantee:
  * `estimate ≥ true count`, within `ε·N` with probability `1 − δ` for
  * `width = e/ε`, `depth = ln(1/δ)`.
  */
object Sketch {

  /** The engine-wide 60-bit portable hash bucketed to `[0, width)` for
    * sketch row `i`. */
  private def cell(term: Column, i: Int, width: Int, salt: String): Column =
    pmod(Splits.portableHash(term, s"$salt$i"), lit(width))

  /** Build a count-min sketch over a term column: every term increments
    * one cell per sketch row (`depth` deterministic hashes), emitted as
    * the `(row, bucket, c)` cell frame — at most `depth × width` rows
    * REGARDLESS of corpus size, which is the entire point.
    *
    * One narrow projection (`depth`-way in-row fanout) + one keyed
    * aggregate with map-side combine over a key space of `depth × width`
    * — the partial aggregates saturate at sketch size per task, so the
    * shuffle moves at most `tasks × depth × width` rows no matter how
    * many terms flow in. Sketches over disjoint corpus shards merge by
    * summing cells (`groupBy(row, bucket).sum(c)`) — the CMS linearity
    * property.
    */
  def countMin(terms: DataFrame, termCol: String, depth: Int = 4,
               width: Int = 2048, salt: String = "cms"): DataFrame = {
    require(depth > 0 && width > 0,
      s"need positive depth and width, got depth=$depth width=$width")
    terms
      .select(posexplode(array((0 until depth).map(i =>
        cell(col(termCol), i, width, salt)): _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket")).agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimates for a candidate term set against a
    * [[countMin]] sketch: each candidate reads its `depth` cells and
    * takes the MIN (the CMS estimator — collisions only inflate cells,
    * so the least-inflated row is the tightest upper bound). Candidates
    * absent from the corpus read empty cells, which estimate as 0.
    * Emits `(termCol, cms_est)`.
    *
    * The sketch is bounded, so it joins BROADCAST; the candidate side
    * is one narrow `depth`-way fanout + one keyed min — no shuffle of
    * the sketch, no corpus access at all (estimation reads the sketch,
    * not the data — the reason to build one).
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame, termCol: String,
                  depth: Int = 4, width: Int = 2048,
                  salt: String = "cms"): DataFrame = {
    require(depth > 0 && width > 0,
      s"need positive depth and width, got depth=$depth width=$width")
    candidates
      .select(col(termCol), posexplode(array((0 until depth).map(i =>
        cell(col(termCol), i, width, salt)): _*)).as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }

  /** φ-heavy hitters via the sketch (Cormode & Muthukrishnan 2005 §4.2):
    * every term whose CMS estimate reaches `⌈φ·N⌉`. The one-sided
    * estimator makes the report one-sided too — every TRULY φ-frequent
    * term is guaranteed present (estimate ≥ exact), while
    * collision-inflated light terms may slip in (≤ ε·N over-count at
    * the sketch's width) — so the exact count and the `inflation`
    * over-estimate ride along as the audit columns a monitoring
    * consumer alarms on. Emits `(termCol, cms_est, n_exact,
    * inflation)`.
    *
    * Cost: [[countMin]]'s saturating cell aggregate + one exact term
    * count (map-side combine) + the broadcast-sketch estimate read —
    * the candidate set is the distinct-term frame, so the only
    * corpus-sized shuffle is the term-keyed count every exact top-k
    * already pays.
    */
  def heavyHitters(terms: DataFrame, termCol: String, phi: Double,
                   depth: Int = 4, width: Int = 2048,
                   salt: String = "cms"): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, s"phi must be in (0, 1], got $phi")
    val exact = terms.groupBy(col(termCol)).agg(count(lit(1)).as("n_exact"))
    val tot = exact.agg(sum(col("n_exact")).as("n_total"))
    cmsEstimate(countMin(terms, termCol, depth, width, salt),
        exact.select(col(termCol)), termCol, depth, width, salt)
      .join(exact, termCol)
      .crossJoin(broadcast(tot))
      .filter(col("cms_est") >= ceil(lit(phi) * col("n_total")))
      .select(col(termCol), col("cms_est"), col("n_exact"),
        (col("cms_est") - col("n_exact")).as("inflation"))
  }
}
