package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range / interval joins via bin bucketing — the equi-join reformulation
  * of `a.lo <= b.hi AND b.lo <= a.hi` (and of point-in-interval)
  * predicates that Spark would otherwise plan as a broadcast-nested-loop
  * (or, worse, a cartesian) join.
  *
  * Shape: the number line is cut into fixed-width bins; each interval is
  * exploded to the bins it covers, a point maps to exactly one bin, and
  * the join becomes an EQUI-join on the bin id with the true range
  * predicate re-checked as a post-filter. The bin id is a shuffle key, so
  * the work distributes across the cluster like any hash join; per-bin
  * work is quadratic only in the bin's occupancy, which the caller
  * controls via `binWidth` (pick ≈ the median interval length; a heavily
  * over-occupied bin is then a data-skew problem AQE's skew-join split
  * handles like any other hot key).
  *
  * Duplicate elimination is by CANONICAL BIN, not `distinct()`: a pair of
  * overlapping intervals shares every bin their intersection covers, so
  * the join keeps a pair only in the bin of `max(lLo, rLo)` — the first
  * bin of the intersection, provably covered by both sides — making the
  * output exact with zero dedup shuffle.
  *
  * Bin ids are exact integer floor-divisions (`(x - pmod(x, w)) / w`),
  * valid while |bin id| < 2^53; at microsecond resolution that is ~285
  * years of epoch time per unit bin width — not a practical limit.
  */
object RangeJoin {

  private def bin(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** All (left, right) row pairs whose closed intervals overlap:
    * `left[lLo, lHi] ∩ right[rLo, rHi] ≠ ∅`. Output: left.* ++ right.*
    * (column names must be disjoint — rename before calling). Each
    * qualifying pair appears exactly once.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   lLo: String, lHi: String, rLo: String, rHi: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val collisions = left.columns.toSet.intersect(right.columns.toSet)
    require(collisions.isEmpty,
      s"rename columns present on both sides: ${collisions.mkString(", ")}")
    val lb = left.withColumn("__rj_bin",
      explode(sequence(bin(col(lLo), binWidth), bin(col(lHi), binWidth))))
    val rb = right.withColumn("__rj_bin",
      explode(sequence(bin(col(rLo), binWidth), bin(col(rHi), binWidth))))
    lb.join(rb,
        lb("__rj_bin") === rb("__rj_bin") &&
          col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
          lb("__rj_bin") === bin(greatest(col(lLo), col(rLo)), binWidth))
      .drop("__rj_bin")
  }

  /** All (point, interval) pairs with `lo <= point <= hi`. A point covers
    * exactly one bin, so no canonical-bin condition is needed. Output:
    * points.* ++ intervals.* (names must be disjoint).
    */
  def pointJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, lo: String, hi: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty,
      s"rename columns present on both sides: ${collisions.mkString(", ")}")
    val pb = points.withColumn("__rj_bin", bin(col(pointCol), binWidth))
    val ib = intervals.withColumn("__rj_bin",
      explode(sequence(bin(col(lo), binWidth), bin(col(hi), binWidth))))
    pb.join(ib,
        pb("__rj_bin") === ib("__rj_bin") &&
          col(pointCol) >= col(lo) && col(pointCol) <= col(hi))
      .drop("__rj_bin")
  }
}
