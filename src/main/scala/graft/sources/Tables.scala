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

  /** `events.ts` has shipped under multiple parquet encodings across
    * driver testdata generations: TIMESTAMP(NANOS) (reads as raw-nanos
    * LongType under the `nanosAsLong` conf), TIMESTAMP_MICROS with
    * `isAdjustedToUTC=0` (reads as TimestampNTZType), and plain
    * TIMESTAMP_MICROS UTC (reads as TimestampType). Branch on the READ
    * schema so the engine normalizes every encoding to a regular
    * TimestampType column instead of hard-assuming one of them.
    *
    * The `nanosAsLong` conf is also pinned at session construction in
    * Verify/Bench/SparkSpec; it is (re)set here only so the driver's own
    * smoke session (which we don't build) can read a nanos-encoded
    * `events` too. It exclusively affects TIMESTAMP(NANOS) columns.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // raw nanos: floor (not `div`, which truncates toward zero) so
        // pre-epoch nanos still floor to the correct microsecond — the
        // same ns→us conversion DuckDB applies
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType =>
        // micros, not UTC-adjusted: under a UTC session TZ the NTZ→TZ
        // cast is an exact relabeling (no wall-clock shift). Pin the TZ
        // here — like nanosAsLong above, an externally-built session
        // (the driver's) may not have set it, and a non-UTC session
        // would silently shift every timestamp in this branch.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType =>
        raw
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unsupported type $other — testdata encoding changed again; " +
            "extend Tables.events to normalize it")
    }
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
