package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus snapshot diff — the incremental-ingestion primitive: compare
  * two crawls/exports of the same id space and classify every id as
  * added / removed / changed / unchanged, with "changed" decided by the
  * normalized content fingerprint (whitespace/case-insensitive, same key
  * as exact dedup) rather than raw byte equality.
  *
  * Plan: fingerprints are computed narrowly on each side (64-bit-ish md5
  * key instead of shipping full documents), then ONE full-outer
  * sort-merge join on id — the minimal movement for a total diff; the
  * downstream incremental job processes only the added ∪ changed slice.
  */
object Snapshot {

  /** Row-level diff: (idCol, status) for every id in either snapshot. */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           idCol: String, contentCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("__snap_id"),
      TextFns.fingerprint(col(contentCol)).as("__snap_ofp"))
    val n = newDf.select(col(idCol).as("__snap_id"),
      TextFns.fingerprint(col(contentCol)).as("__snap_nfp"))
    o.join(n, Seq("__snap_id"), "full_outer")
      .select(col("__snap_id").as(idCol),
        when(col("__snap_ofp").isNull, "added")
          .when(col("__snap_nfp").isNull, "removed")
          .when(col("__snap_ofp") === col("__snap_nfp"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
