package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.sources.Tables

/** Schema-drift canary.
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed the `events.ts` parquet encoding once (TIMESTAMP(NANOS) →
  * TIMESTAMP_MICROS NTZ, 2026-08-13), which broke all 36 events queries at
  * analysis time with 15 scattered test failures. This suite exists to turn
  * the next such drift into ONE failure with a one-line message.
  *
  * Two layers:
  *   1. every live testdata table must materialize a row through its
  *      `Tables` accessor (catches any encoding/schema change at the source);
  *   2. `Tables.events` must normalize all three ts encodings the driver has
  *      shipped or could ship — raw-nanos LongType, TIMESTAMP_MICROS NTZ,
  *      TIMESTAMP_MICROS UTC — to identical TimestampType values (fixture
  *      files committed under src/test/resources/fixtures, generated from
  *      the same wall-clock instants).
  */
class SchemaCanarySpec extends SparkSpec {

  private val accessors: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "events"     -> Tables.events _,
      "lineitem"   -> Tables.lineitem _,
      "orders"     -> Tables.orders _,
      "customer"   -> Tables.customer _,
      "supplier"   -> Tables.supplier _,
      "part"       -> Tables.part _,
      "nation"     -> Tables.nation _,
      "region"     -> Tables.region _,
      "documents"  -> Tables.documents _,
      "embeddings" -> Tables.embeddings _
    )

  test("canary: every live testdata table materializes one row") {
    val broken = accessors.flatMap { case (name, acc) =>
      try { assert(acc(spark, sf).head() != null); None }
      catch {
        case e: Throwable =>
          Some(s"$name (${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString})")
      }
    }
    assert(
      broken.isEmpty,
      s"TESTDATA SCHEMA DRIFT — table(s) no longer readable through Tables accessors: ${broken.mkString("; ")}. " +
        "The driver likely regenerated /root/testdata with a new encoding; fix graft.sources.Tables first."
    )
  }

  test("canary: every table still carries the columns the registry depends on") {
    // the queries reference these names all over the registry — a driver
    // regeneration that renames or drops one should fail HERE with the
    // table and column named, not as dozens of scattered AnalysisExceptions
    val required: Map[String, Set[String]] = Map(
      "region"     -> Set("r_regionkey", "r_name"),
      "nation"     -> Set("n_nationkey", "n_name", "n_regionkey"),
      "customer"   -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier"   -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part"       -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders"     -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
      "lineitem"   -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "events"     -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents"  -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label")
    )
    val drifted = accessors.flatMap { case (name, acc) =>
      val actual = acc(spark, sf).schema.fieldNames.toSet
      val missing = required(name) -- actual
      if (missing.isEmpty) None
      else Some(s"$name is missing ${missing.mkString(", ")}")
    }
    assert(drifted.isEmpty,
      s"TESTDATA SCHEMA DRIFT — ${drifted.mkString("; ")}. The registry " +
        "references these columns; adapt the affected queries (new columns " +
        "appearing is fine, this only checks the required set).")
  }

  test("canary: embedding dimension is 64 (PcaDim / LSH plane model contract)") {
    // q133/q135 (PcaDim), the LSH plane model (128 planes x 64 dims) and
    // the PQ subspace split all hard-assume dim = 64; a regenerated
    // embeddings table with another width must fail HERE by name
    val dims = graft.sources.Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
      .selectExpr("size(embedding) AS d").distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(dims == Seq(64),
      s"TESTDATA SCHEMA DRIFT — embeddings.embedding dims $dims != 64; " +
        "update PcaDim (StatsQueries), the plane model (Similarity) and " +
        "the PQ subspace constants before anything else.")
  }

  test("canary: Tables.events normalizes all three ts encodings identically") {
    def fixtureDir(fixture: String): String = {
      val dir = Files.createTempDirectory(s"graft_canary_$fixture")
      dir.toFile.deleteOnExit()
      val in = getClass.getResourceAsStream(s"/fixtures/$fixture.parquet")
      assert(in != null, s"missing committed fixture src/test/resources/fixtures/$fixture.parquet")
      try Files.copy(in, Paths.get(dir.toString, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      dir.toString
    }

    val encodings = Seq("events_ts_nanos", "events_ts_micros_ntz", "events_ts_micros_utc")
    val frames = encodings.map { enc =>
      val df =
        try Tables.events(spark, fixtureDir(enc))
        catch {
          case e: Throwable =>
            fail(s"EVENTS TS ENCODING DRIFT — Tables.events cannot read the $enc fixture: ${e.getMessage}")
        }
      assert(
        df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
        s"$enc: Tables.events must normalize ts to TimestampType, got ${df.schema("ts").dataType}"
      )
      enc -> df.selectExpr("event_id", "unix_micros(ts) AS us").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    val (refName, refVals) = frames.head
    frames.tail.foreach { case (name, vals) =>
      assert(
        vals == refVals,
        s"ts normalization diverges between $refName and $name — the three parquet encodings of the " +
          "same instants must read back identical TimestampType values"
      )
    }
  }
}
