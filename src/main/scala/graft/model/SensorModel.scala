package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Anomaly.AnomalyRule

/** Canonical sensor-reading data model (SURVEY §1) — the reference's
  * record shape made explicit and consistent.
  *
  * The reference declares `measurements` three mutually-inconsistent ways
  * (MapType(String,String) in the streaming job —
  * `src/spark/streaming/SensorDataProcessor.scala:94` — but reads nested
  * paths like `measurements.acceleration.x` in the batch job —
  * `src/spark/batch/SensorDataAnalytics.scala:145-149` — and stores JSONB
  * in Postgres). The intended model is a per-sensor-type typed payload
  * with two-level nesting; here it is ONE union struct with all
  * per-type fields nullable (SURVEY §1.7), so every use-site in the
  * reference ( `measurements.distance` casts, `measurements
  * .acceleration.x`, JSONB `->>` extractions) becomes a plain typed
  * column path, and Catalyst prunes unused subfields at the scan.
  */
object SensorModel {

  /** `location` struct — `SensorDataProcessor.scala:90-93`. */
  val locationSchema: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)))

  private def xyz = StructType(Seq(
    StructField("x", DoubleType),
    StructField("y", DoubleType),
    StructField("z", DoubleType)))

  /** Union measurement payload: all per-sensor-type fields, nullable —
    * field set per type from the generator (source of truth,
    * `src/data_generator/sensor_data_generator.py:46-120`).
    */
  val measurementsSchema: StructType = StructType(Seq(
    // radar — sensor_data_generator.py:46-55
    StructField("distance", DoubleType),
    StructField("speed", DoubleType),
    StructField("angle", DoubleType),
    StructField("confidence", DoubleType),
    StructField("target_type", StringType),
    StructField("relative_velocity", DoubleType),
    // camera — sensor_data_generator.py:57-69 (nested lane_detection)
    StructField("object_count", IntegerType),
    StructField("traffic_signs", IntegerType),
    StructField("pedestrian_detection", IntegerType),
    StructField("image_quality", DoubleType),
    StructField("lane_detection", StructType(Seq(
      StructField("left_lane_confidence", DoubleType),
      StructField("right_lane_confidence", DoubleType),
      StructField("lane_width", DoubleType)))),
    // lidar — sensor_data_generator.py:71-79
    StructField("point_cloud_size", IntegerType),
    StructField("detected_objects", IntegerType),
    StructField("scan_frequency", IntegerType),
    StructField("range_accuracy", DoubleType),
    StructField("angular_resolution", DoubleType),
    // ultrasonic — sensor_data_generator.py:81-88
    StructField("detection_angle", DoubleType),
    StructField("signal_strength", DoubleType),
    StructField("temperature_compensation", DoubleType),
    // imu — sensor_data_generator.py:90-108 (nested xyz triples)
    StructField("acceleration", xyz),
    StructField("gyroscope", xyz),
    StructField("magnetometer", xyz),
    // gps — sensor_data_generator.py:110-120 (payload-local latitude/
    // longitude at 6 dp are FINER than the top-level location struct's
    // jitter and must not be dropped; `speed` is shared with radar)
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("altitude", DoubleType),
    StructField("heading", DoubleType),
    StructField("accuracy", DoubleType),
    StructField("satellites", IntegerType)))

  /** Uniform `metadata` map — `sensor_data_generator.py:129-138`. */
  val metadataSchema: MapType = MapType(StringType, StringType)

  /** Full wire-record schema (JSON): ISO-8601 timestamp string at ingest
    * (`SensorDataProcessor.scala:85-96`); converted to TimestampType by
    * [[parse]].
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType, nullable = false),
    StructField("sensorId", StringType, nullable = false),
    StructField("vehicleId", StringType, nullable = false),
    StructField("sensorType", StringType, nullable = false),
    StructField("location", locationSchema),
    StructField("measurements", measurementsSchema),
    StructField("metadata", metadataSchema)))

  /** The six sensor types — `sensor_data_generator.py:36`. */
  val sensorTypes: Seq[String] =
    Seq("radar", "camera", "lidar", "ultrasonic", "imu", "gps")

  /** Parse a JSON-string column into the canonical typed record:
    * `from_json` with the union schema (replaces the reference's
    * per-record Jackson parse, `SensorDataProcessor.scala:100-112`),
    * unparseable rows dropped, ISO timestamp → TimestampType, raw JSON
    * retained for fidelity (`raw_json`).
    */
  def parse(df: DataFrame, jsonCol: String): DataFrame =
    df.select(col(jsonCol).as("raw_json"),
        from_json(col(jsonCol), wireSchema).as("r"))
      .filter(col("r").isNotNull && col("r.timestamp").isNotNull)
      .select(
        to_timestamp(col("r.timestamp")).as("timestamp"),
        col("r.sensorId").as("sensorId"),
        col("r.vehicleId").as("vehicleId"),
        col("r.sensorType").as("sensorType"),
        col("r.location").as("location"),
        col("r.measurements").as("measurements"),
        col("r.metadata").as("metadata"),
        col("raw_json"))

  /** P1 required fields — `SensorDataProcessor.scala:142-148`. */
  val requiredFields: Seq[String] =
    Seq("timestamp", "sensorId", "vehicleId", "sensorType", "location")

  /** The reference's anomaly rule set, verbatim semantics
    * (`SensorDataProcessor.scala:174-186`): chained first-match-wins,
    * strict `>` comparisons, score 1.0 each.
    */
  def referenceAnomalyRules: Seq[AnomalyRule] = Seq(
    AnomalyRule("radar_distance",
      col("sensorType") === "radar" && col("measurements.distance") > 200.0, 1.0),
    AnomalyRule("camera_objects",
      col("sensorType") === "camera" && col("measurements.object_count") > 20, 1.0),
    AnomalyRule("gps_speed",
      col("sensorType") === "gps" && col("measurements.speed") > 200.0, 1.0))

  /** The reference's per-type conditional aggregates (A3,
    * `SensorDataAnalytics.scala:119-153`) as reusable columns.
    */
  def typeConditionalAggs: Seq[Column] = Seq(
    avg(when(col("sensorType") === "radar", col("measurements.distance"))).as("avg_radar_distance"),
    max(when(col("sensorType") === "radar", col("measurements.distance"))).as("max_radar_distance"),
    min(when(col("sensorType") === "radar", col("measurements.distance"))).as("min_radar_distance"),
    avg(when(col("sensorType") === "camera", col("measurements.object_count"))).as("avg_camera_objects"),
    max(when(col("sensorType") === "camera", col("measurements.object_count"))).as("max_camera_objects"),
    avg(when(col("sensorType") === "gps", col("measurements.speed"))).as("avg_gps_speed"),
    max(when(col("sensorType") === "gps", col("measurements.speed"))).as("max_gps_speed"),
    avg(when(col("sensorType") === "imu", col("measurements.acceleration.x"))).as("avg_accel_x"),
    avg(when(col("sensorType") === "imu", col("measurements.acceleration.y"))).as("avg_accel_y"),
    avg(when(col("sensorType") === "imu", col("measurements.acceleration.z"))).as("avg_accel_z"))
}
