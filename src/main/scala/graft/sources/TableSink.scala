package graft.sources

import org.apache.spark.sql.DataFrame

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
}
