package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the LATEST right row
  * whose timestamp is <= the left row's, within the same key. The
  * canonical attribution/enrichment join (trade↔quote, event↔config,
  * purchase↔last-click) that Spark has no built-in operator for.
  *
  * Implementation is the sort-merge formulation, not a nested-loop or
  * range-predicate join: both sides are UNIONed with a side tag, shuffled
  * ONCE on the key, sorted by (time, side, tie) within each key, and the
  * running `last(payload, ignoreNulls)` over the growing frame carries
  * the most recent right payload forward onto every left row. Cost is one
  * shuffle + one sort — the same movement a plain equi-join on the key
  * would pay — vs. the O(left × right-per-key) nested-loop a range
  * condition (`r.ts <= l.ts`) would plan, which is the difference between
  * minutes and never at 100 TB. Spark evaluates the growing-frame
  * aggregate incrementally, so the window pass is linear per key.
  *
  * The right payload travels as ONE struct column: `last(ignoreNulls)`
  * then skips only rows from the other side (struct is never null on
  * right rows), so genuinely-null payload FIELDS in a matched right row
  * are preserved rather than skipped past.
  */
object AsOf {

  /** Left rows enriched with the latest prior right payload.
    *
    * Semantics: for each left row, the right row with the greatest
    * (`rightTs`, `rightTie`) such that `rightTs` <= the left row's
    * `leftTs` and the key columns match; payload columns are null when no
    * such row exists. A right row at exactly the left timestamp DOES
    * match (<=, not <); among right rows tied on `rightTs`, the largest
    * `rightTie` (any numeric, e.g. an event id) wins — fully
    * deterministic under retries and re-partitioning.
    *
    * `forward = true` flips the direction: the EARLIEST following right
    * row (`rightTs` >= `leftTs`), ties broken by the SMALLEST
    * `rightTie`. Implemented by negating the sort axis — the plan is
    * identical.
    *
    * `toleranceUs` bounds staleness: a match further than this many
    * microseconds from the left timestamp is discarded (payload null) —
    * the matched row is always the CLOSEST one, so this is a pure
    * post-predicate on the window result, costing nothing extra.
    *
    * Output: all of `left`'s columns, then `right`'s non-key columns.
    * Right non-key column names must not collide with left's — rename
    * before calling (this keeps provenance explicit instead of silently
    * prefixing).
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTs: String, rightTs: String, rightTie: String,
           forward: Boolean = false,
           toleranceUs: Option[Long] = None): DataFrame = {
    val payload = right.columns.filterNot(keyCols.contains).toSeq
    require(payload.contains(rightTs), s"right is missing ts column $rightTs")
    require(payload.contains(rightTie), s"right is missing tie column $rightTie")
    require(toleranceUs.forall(_ >= 0), s"tolerance must be >= 0: $toleranceUs")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rename right columns that collide with left: ${collisions.mkString(", ")}")

    // the sort axis: negated for forward joins, so "last preceding" on
    // the axis is "first following" in event time
    def axis(c: Column): Column = if (forward) -c else c

    val r = right.select(
      keyCols.map(col) ++ Seq(
        axis(unix_micros(col(rightTs))).as("__asof_us"),
        lit(0).as("__asof_side"),
        axis(col(rightTie).cast("long")).as("__asof_tie"),
        struct(payload.map(col): _*).as("__asof_payload")): _*)
    val l = left
      .withColumn("__asof_us", axis(unix_micros(col(leftTs))))
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_tie", lit(0L))
    // allowMissingColumns: left rows get a null payload struct, right rows
    // get nulls for left-only columns (dropped by the side filter below).
    val u = l.unionByName(r, allowMissingColumns = true)

    // side 0 (right) sorts before side 1 (left) at equal timestamps, which
    // is exactly the <= (resp. >=) match semantics.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__asof_us"), col("__asof_side"), col("__asof_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched =
      u.withColumn("__asof_m", last(col("__asof_payload"), ignoreNulls = true).over(w))
        .filter(col("__asof_side") === 1)
    val gated = toleranceUs match {
      case Some(tol) => matched.withColumn("__asof_m",
        when(abs(unix_micros(col(leftTs)) -
          unix_micros(col(s"__asof_m.$rightTs"))) <= tol, col("__asof_m")))
      case None => matched
    }
    gated.select(left.columns.toSeq.map(col) ++
      payload.map(c => col(s"__asof_m.$c").as(c)): _*)
  }
}
