package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Batch table sinks (SURVEY S5/S6) — the reference writes five analytics
  * tables per run with `mode("overwrite")` into hand-built `…/date=<d>`
  * path strings (`src/spark/batch/SensorDataAnalytics.scala:215-256`);
  * here the layout is declared and Spark routes the data:
  *
  *  - [[overwritePartitions]] uses *dynamic* partition overwrite: only
  *    the partitions present in the batch are replaced, so a daily job
  *    rewrites one `day=` directory of a 100 TB table instead of the
  *    table, with no path arithmetic to get wrong.
  *  - [[writeBucketed]] persists a table hash-bucketed (and sorted) by
  *    its join key; two tables bucketed the same way join with NO
  *    exchange on either side — the co-located-join layout for fact
  *    tables that are joined repeatedly.
  */
object TableSink {

  /** Overwrite only the partitions present in `df` (dynamic mode). */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Persist as a metastore table bucketed+sorted by `bucketCol`. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Small-files hygiene: repartition to ~`targetBytes` output files
    * using Catalyst's own plan-statistics size estimate (the same number
    * AQE plans with), so a filtered/aggregated frame that shrank to a
    * few MB does not land as `spark.sql.shuffle.partitions` splinter
    * files — the classic scan-time killer of incrementally-written
    * tables (every file is an open/seek/footer-parse at the next read).
    *
    * The estimate is pre-compression and pre-encoding, so actual parquet
    * files land smaller than `targetBytes` (often 3–5×) — tune the
    * target to taste; the point is ORDER-OF-MAGNITUDE file-count
    * control, not byte-exact sizing.
    *
    * The target count is clamped into [1, Int.MaxValue] BEFORE narrowing
    * (plan statistics are BigInt, and unknown-size plans report
    * Long.MaxValue-scale sentinels — an unclamped narrowing wraps
    * negative and would funnel a huge frame through one task).
    * Partition-count choice deliberately avoids probing `df.rdd`: under
    * AQE that materializes every upstream stage just to read a number,
    * running the query twice. Below the session's shuffle-partition
    * count it uses `coalesce` (no shuffle; a no-op if the frame already
    * has fewer partitions), above it a full `repartition`.
    */
  def compacted(df: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = (bytes / targetBytes).min(Int.MaxValue).max(1).toInt
    val shuffleParts =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (parts <= shuffleParts) df.coalesce(parts) else df.repartition(parts)
  }

  /** Sorted-layout write: globally range-sort by `layoutCols` before
    * writing, so parquet row-group min/max statistics become selective
    * for predicates on those columns (each file covers a narrow value
    * range → scans of `WHERE day = … AND user_id = …` skip most files).
    * The linear-order analogue of Z-ordering for the common
    * leading-column query pattern.
    */
  def overwriteSorted(df: DataFrame, path: String, layoutCols: Seq[Column],
                      numFiles: Option[Int] = None): Unit = {
    // an explicit file count pins the range split (AQE coalesces an
    // unpinned range repartition of a small frame down to one file);
    // default lets AQE size the partitions from the data
    val ranged = numFiles match {
      case Some(n) => df.repartitionByRange(n, layoutCols: _*)
      case None    => df.repartitionByRange(layoutCols: _*)
    }
    ranged.sortWithinPartitions(layoutCols: _*)
      .write.mode("overwrite").parquet(path)
  }
}
