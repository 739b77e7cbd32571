package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Batch file ingest for the text wire formats (JSONL — the same record
  * shape the Kafka path carries — and CSV drops), with EXPLICIT schemas
  * and dead-letter capture.
  *
  * Two rules a 100 TB ingest lives or dies by:
  *
  *  - **Never infer schemas.** Inference is a full extra pass over the
  *    data before the real read, and a maliciously-wide or drifting
  *    input silently changes downstream types. Schemas are declared.
  *  - **Never drop bad records silently.** Reads run PERMISSIVE with a
  *    corrupt-record column: [[good]] rows flow on, [[bad]] rows land
  *    in a dead-letter frame carrying the raw line for triage/replay.
  *
  * Spark quirk, handled by [[split]]: corrupt-record status is a
  * function of WHICH COLUMNS the parser materializes — column pruning
  * pushes into the text parser, so a query that reads only `event_id`
  * never parses `value`, a `value`-only type error then raises no
  * corrupt record, and the same row is "good" in one query and "bad" in
  * another (and a corrupt-column-only query is rejected outright:
  * UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN). `split`
  * therefore caches the FULL parse once and derives both halves from
  * that one materialization — the pattern Spark's own error message
  * prescribes.
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType))

  /** JSON-lines read: declared schema + corrupt-record column. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV read: declared schema, header, corrupt-record column. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .csv(path)

  /** (good, dead-letter) halves of a [[jsonl]]/[[csv]] parse: good rows
    * carry exactly the declared columns; dead-letter rows keep the raw
    * line (plus any fields that did parse) for triage and replay. The
    * full parse is cached — release with `unpersist()` on either half's
    * `sparkSession`-shared plan when the ingest batch is landed.
    */
  def split(parsed: DataFrame): (DataFrame, DataFrame) = {
    val cached = parsed.cache()
    (cached.filter(col(CorruptCol).isNull).drop(CorruptCol),
      cached.filter(col(CorruptCol).isNotNull))
  }
}
