package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical accessors for the engine's input tables.
  *
  * The driver testdata (`/root/repo/TESTDATA.md`) ships one Parquet file per
  * table. In production this would be a partitioned Parquet/Delta layout on
  * object storage; partition pruning then happens via partition-column
  * predicates instead of path strings (replaces the reference's manual
  * path-routing, `src/spark/batch/SensorDataAnalytics.scala:83-88`).
  *
  * All reads go through `spark.read.parquet` so Catalyst keeps full pushdown
  * (column pruning + predicate pushdown reach the vectorized Parquet reader).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * (no nanosecond TimestampType). Read it as raw nanos via the
    * `nanosAsLong` conf and floor to microseconds — the same ns→us
    * conversion DuckDB applies — so downstream everything is a regular
    * TimestampType column.
    *
    * The conf is also pinned at session construction in Verify/Bench/
    * SparkSpec; it is (re)set here only so the driver's own smoke session
    * (which we don't build) can read `events` too. It exclusively affects
    * TIMESTAMP(NANOS) parquet columns, which only this table has.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // floor division (not `div`, which truncates toward zero) so pre-epoch
    // nanos would still floor to the correct microsecond
    load(spark, dir, "events").withColumn(
      "ts",
      timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
