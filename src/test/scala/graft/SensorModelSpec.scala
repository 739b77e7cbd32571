package graft

import org.apache.spark.sql.functions._

import graft.model.SensorModel
import graft.operators.{Anomaly, Quality}

/** Reference-parity tests for the canonical sensor data model (SURVEY §1):
  * JSON ingest with the union measurement schema, nested field access,
  * the reference's exact anomaly rules, and the quality stage on parsed
  * records.
  */
class SensorModelSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  private def record(sensorType: String, measurements: String,
                     ts: String = "2024-01-15T10:30:00+00:00",
                     vehicle: String = "VH_001", sensor: String = "SN_01") =
    s"""{"timestamp":"$ts","sensorId":"$sensor","vehicleId":"$vehicle",
       |"sensorType":"$sensorType",
       |"location":{"latitude":45.5,"longitude":-122.6},
       |"measurements":$measurements,
       |"metadata":{"firmware_version":"2.1.0","manufacturer":"acme",
       |"temperature":"21.5"}}""".stripMargin.replaceAll("\n", "")

  test("parse: every sensor type round-trips through the union schema") {
    val rows = Seq(
      record("radar", """{"distance":150.2,"speed":88.0,"angle":12.5,
        "confidence":0.97,"target_type":"vehicle","relative_velocity":-4.2}"""
        .replaceAll("\n\\s*", "")),
      record("camera", """{"object_count":7,"traffic_signs":2,
        "pedestrian_detection":1,"image_quality":0.88,
        "lane_detection":{"left_lane_confidence":0.91,
        "right_lane_confidence":0.86,"lane_width":3.6}}"""
        .replaceAll("\n\\s*", "")),
      record("imu", """{"acceleration":{"x":0.12,"y":-0.05,"z":9.81},
        "gyroscope":{"x":0.01,"y":0.02,"z":0.0},
        "magnetometer":{"x":22.0,"y":-4.0,"z":40.0}}"""
        .replaceAll("\n\\s*", "")),
      record("gps", """{"latitude":45.5,"longitude":-122.6,"altitude":80.0,
        "speed":61.2,"heading":182.0,"accuracy":1.4,"satellites":11}"""
        .replaceAll("\n\\s*", "")))
    val parsed = SensorModel.parse(rows.toDF("json"), "json")
    assert(parsed.count() == 4)
    // typed nested access — the paths the reference reads
    val radar = parsed.filter($"sensorType" === "radar")
      .select($"measurements.distance").as[Double].head()
    assert(radar == 150.2)
    val lane = parsed.filter($"sensorType" === "camera")
      .select($"measurements.lane_detection.left_lane_confidence")
      .as[Double].head()
    assert(lane == 0.91)
    val accelX = parsed.filter($"sensorType" === "imu")
      .select($"measurements.acceleration.x").as[Double].head()
    assert(accelX == 0.12)
    val meta = parsed.filter($"sensorType" === "gps")
      .select(element_at($"metadata", "manufacturer")).as[String].head()
    assert(meta == "acme")
    // gps payload lat/long are finer than the top-level location struct
    // and must survive the union schema (regression: review found them
    // missing from measurementsSchema)
    val gpsLat = parsed.filter($"sensorType" === "gps")
      .select($"measurements.latitude").as[Double].head()
    assert(gpsLat == 45.5)
    // ISO-8601 string became a real timestamp
    assert(parsed.schema("timestamp").dataType.typeName == "timestamp")
  }

  test("parse drops unparseable records like the reference's Jackson path") {
    val rows = Seq(record("radar", """{"distance":10.0}"""),
      "not json at all", """{"half": """)
    assert(SensorModel.parse(rows.toDF("json"), "json").count() == 1)
  }

  test("reference anomaly rules: radar>200 / camera>20 / gps>200, strict") {
    val rows = Seq(
      record("radar", """{"distance":200.0}"""),  // boundary — not anomalous
      record("radar", """{"distance":200.1}"""),  // anomalous
      record("camera", """{"object_count":21}"""), // anomalous
      record("gps", """{"speed":150.0}"""),        // not
      record("imu", """{"acceleration":{"x":99.0,"y":0,"z":0}}""")) // no rule
    val parsed = SensorModel.parse(rows.toDF("json"), "json")
    val anomalies = Anomaly.detect(parsed, SensorModel.referenceAnomalyRules)
      .select($"sensorType", $"anomaly_score").collect()
    assert(anomalies.length == 2)
    assert(anomalies.forall(_.getDouble(1) == 1.0))
    assert(anomalies.map(_.getString(0)).sorted.toSeq == Seq("camera", "radar"))
  }

  test("quality stage on parsed records: completeness + normalized score") {
    val rows = Seq(record("radar", """{"distance":10.0}"""))
    val parsed = SensorModel.parse(rows.toDF("json"), "json")
    val q = Quality(parsed, SensorModel.requiredFields, SensorModel.requiredFields)
    assert(q.select($"quality_score").as[Double].head() == 1.0)
  }

  test("VariantType alternative for semi-structured payloads (SURVEY §7.4)") {
    // Spark 4's VARIANT is the other encoding considered for the
    // semi-structured payload; the typed union struct stays the canonical
    // model (oracle comparability + schema-checked paths), but the engine
    // must interoperate: parse once, extract typed fields.
    val df = Seq("""{"k": 42, "nested": {"x": 1.5}}""").toDF("props")
      .select(parse_json(col("props")).as("v"))
    val r = df.select(
      try_variant_get(col("v"), "$.k", "int").as("k"),
      try_variant_get(col("v"), "$.nested.x", "double").as("x")).collect().head
    assert(r.getInt(0) == 42 && r.getDouble(1) == 1.5)
  }

  test("A3 conditional aggregates read the union struct paths") {
    val rows = Seq(
      record("radar", """{"distance":100.0}"""),
      record("radar", """{"distance":200.0}"""),
      record("imu", """{"acceleration":{"x":1.5,"y":0.0,"z":9.8}}"""))
    val parsed = SensorModel.parse(rows.toDF("json"), "json")
    val agg = parsed.agg(SensorModel.typeConditionalAggs.head,
      SensorModel.typeConditionalAggs.tail: _*).collect().head
    assert(agg.getAs[Double]("avg_radar_distance") == 150.0)
    assert(agg.getAs[Double]("avg_accel_x") == 1.5)
  }
}
