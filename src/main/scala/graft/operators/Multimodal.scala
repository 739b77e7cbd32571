package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with a typed metadata struct, plus decode / feature-extract / frame-
  * sample stages.
  *
  * The Spark-side contract is real and tested — schema, batch shape,
  * partition-preserving narrow execution — while the actual media decode is
  * a clearly-marked deterministic STUB (`decodeFeaturesStub`): the image /
  * audio codec libraries are not in this container, and at cluster scale
  * the decode body would be swapped for the real codec call without
  * touching any of the plumbing (same `mapPartitions` shape, same schema).
  */
object Multimodal {

  /** Metadata carried next to every media payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** Pack a text column into the multimodal layout: opaque binary payload
    * + metadata struct. Purely narrow (no shuffle), codegen'd.
    */
  def packText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol),
      payload.as("payload"),
      struct(
        lit("text/plain").as("format"),
        length(payload).cast("long").as("n_bytes"),
        md5(payload).as("checksum")).as("meta"))
  }

  /** Feature schema produced by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("byte_mean", DoubleType, nullable = false)))

  /** STUB decode: deterministic fake feature extraction over the payload
    * bytes, standing in for an image/audio codec (not available in this
    * container). The `mapPartitions` shape — per-partition batch loop, no
    * shuffle, rows in/rows out — is exactly what the real decoder uses.
    */
  def decodeFeaturesStub(packed: DataFrame, idCol: String): DataFrame = {
    val session = packed.sparkSession
    val rdd = packed.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // STUB: derive pseudo-dimensions/statistics from the bytes; a real
        // implementation calls the codec here and keeps everything else.
        val w = 16 + (math.abs(bytes.headOption.getOrElse(0.toByte).toInt) % 64)
        val h = 16 + (math.abs(bytes.lastOption.getOrElse(0.toByte).toInt) % 64)
        val mean =
          if (bytes.isEmpty) 0.0
          else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
        Row(id, w, h, 3, mean)
      })
    session.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling plumbing: slice the payload into n fixed-width
    * "frames" (binary sub-blobs) — the shape a video pipeline uses, with
    * the slicing done by codegen'd `substring` on binary.
    *
    * Offsets use integer division throughout (`div`), never double
    * arithmetic: `cast(double AS int)` truncates in Spark but rounds in
    * other engines, so integer offsets are the only portable semantics.
    */
  def frameSample(packed: DataFrame, idCol: String, n: Int): DataFrame = {
    val frameCols = (0 until n).map { i =>
      expr(s"""substring(payload,
              | cast((meta.n_bytes div $n) * $i + 1 as int),
              | cast(greatest(meta.n_bytes div $n, 1L) as int))""".stripMargin)
    }
    packed.select(col(idCol), posexplode(array(frameCols: _*)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .withColumn("frame_bytes", length(col("frame")).cast("long"))
  }
}
