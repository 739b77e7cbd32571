package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** S8 — JDBC serving store: the reference lands every pipeline output in
  * Postgres for the serving API to read back (`docker/init-db.sql:5-44`
  * defines `sensor_quality_checked` / `sensor_analytics` /
  * `sensor_anomalies`, read back by `src/api/sensor_api.py:169-199`).
  * This sink provides that landing step as an idempotent, replay-safe
  * JDBC upsert keyed by batch id — the pattern that turns
  * `foreachBatch`'s at-least-once delivery into exactly-once EFFECTS on
  * the store (the reference commits nothing and can both lose and
  * duplicate rows on restart).
  *
  * Idempotence: every landed row carries the writing batch's `batch_id`;
  * an attempt first DELETEs the batch's rows (clearing any partial or
  * duplicate earlier attempt), then appends the batch. Replaying a batch
  * therefore converges to exactly one copy.
  *
  * Scale shape: the INSERT is a normal distributed
  * `df.write.format("jdbc")` — one connection per partition, cap with
  * `numPartitions` to respect the store's connection budget; only the
  * batch-scoped DELETE (a single indexed statement) runs driver-side.
  * The serving store is the pipeline's narrow end — at 100 TB what lands
  * here are the aggregated/filtered outputs (windowed analytics, anomaly
  * and alert rows), never the raw corpus. Tests run against embedded
  * Derby (in `/opt/spark/jars`); production points the same URL at any
  * networked store.
  */
object JdbcSink {

  /** The serving tables mirrored from the reference store, over our
    * event domain: quality-checked records, windowed analytics, anomaly
    * rows (`docker/init-db.sql:5-44`).
    */
  val ServingTables: Seq[String] =
    Seq("quality_checked", "analytics", "anomalies")

  private def withConnection[A](url: String)(f: java.sql.Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def tableExists(conn: java.sql.Connection, table: String): Boolean = {
    // unquoted identifiers are stored upper-case by Derby/H2, lower by
    // Postgres — probe both forms
    val meta = conn.getMetaData
    Seq(table.toUpperCase, table.toLowerCase, table).exists { t =>
      val rs = meta.getTables(null, null, t, null)
      try rs.next() finally rs.close()
    }
  }

  /** Idempotently land one (micro-)batch: delete any rows an earlier
    * attempt of this `batchId` wrote, then append the batch stamped with
    * `batch_id`. First-ever write creates the table (Spark JDBC append
    * semantics), so the delete is skipped until the table exists.
    */
  def upsertBatch(df: DataFrame, batchId: Long, url: String, table: String,
                  options: Map[String, String] = Map.empty): Unit = {
    withConnection(url) { conn =>
      if (tableExists(conn, table)) {
        // Spark's JDBC writer CREATEs columns as quoted (case-exact)
        // identifiers, so the predicate must quote too (ANSI double
        // quotes — Derby/H2/Postgres alike)
        val st = conn.prepareStatement(s"""DELETE FROM $table WHERE "batch_id" = ?""")
        try { st.setLong(1, batchId); st.executeUpdate() } finally st.close()
      }
    }
    df.withColumn("batch_id", lit(batchId))
      .write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .mode("append")
      .save()
  }

  /** St6/S8 — checkpointed streaming writer into the serving store:
    * checkpoint tracks which batches are committed, [[upsertBatch]]
    * makes each batch's effect idempotent — together, exactly-once
    * delivery to JDBC across restarts and replays.
    */
  def streamingSink(df: DataFrame, url: String, table: String,
                    checkpoint: String,
                    options: Map[String, String] = Map.empty)
      : DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(batch, batchId, url, table, options)
      }

  /** Read a serving table back (the API side of the reference's store). */
  def readTable(spark: org.apache.spark.sql.SparkSession, url: String,
                table: String,
                options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()
}
