package graft

import org.apache.spark.sql.functions._

/** Smoke + algebraic-invariant tests for the declared query surface over
  * sf0.001 testdata. Exact value parity vs DuckDB is the driver's
  * correctness gate (tools/oracle_check.py locally); these tests pin the
  * invariants that must hold regardless of data scale.
  */
class QuerySpec extends SparkSpec {

  test("every declared query returns rows at sf0.001") {
    SparkEntry.registry.foreach { q =>
      val n = q.spark(spark, sf).count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("every query with an oracle has matching column names (sorted)") {
    // The driver's compare sorts columns by name before hashing — a name
    // mismatch between Spark and oracle results is an automatic fail.
    SparkEntry.registry.foreach { q =>
      val cols = q.spark(spark, sf).columns.sorted.toSeq
      assert(cols.distinct.size == cols.size, s"${q.name} duplicate column names")
    }
  }

  test("Q5 bucket counts partition the total (A5 invariant)") {
    val rows = SparkEntry.queries("q05_value_buckets")(spark, sf)
      .select(col("total_count"),
        (col("high_count") + col("mid_count") + col("low_count")).as("s"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("Q7 global summary is a single row consistent with raw counts") {
    val row = SparkEntry.queries("q07_global_summary")(spark, sf).collect()
    assert(row.length == 1)
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(row.head.getAs[Long]("total_records") == total)
  }

  test("Q12 window counts sum to the event count (window partition)") {
    val winSum = SparkEntry.queries("q12_minute_window")(spark, sf)
      .agg(sum("record_count")).collect().head.getLong(0)
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(winSum == total)
  }

  test("Q9 top users are ordered by count desc with key tiebreak") {
    val rows = SparkEntry.queries("q09_top_users")(spark, sf)
      .select("total_readings", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.sameElements(rows.sortBy { case (c, u) => (-c, u) }))
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
