package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage attribution for the composed CurationJob under skew: rebuilds
  * the job's frames with explicit materialization BETWEEN stages and
  * times each on the benign vs templated ×k corpora (the SkewProbeX10
  * shapes), so a job-level ratio names the stage it lives in. The real
  * job fuses stages (cache + ReusedExchange), so these are COST
  * attributions, not exact wall fractions — the end-to-end number is
  * the SkewProbeX10 `curation_job` row.
  *
  * Prints one JSON line: `{"probe":"job_stages","k":...,"stages":{
  * "verdicts":{"benign":s,"skew":s},...}}`.
  */
object JobStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = sys.env.getOrElse("SPARK_GRAFT_SKEW_K", "20").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "text")
    def materialize(df: DataFrame): DataFrame = {
      val out = df.localCheckpoint(); out.count(); out
    }
    val benign = materialize(docs
      .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("copy"))
      .select((col("doc_id") * k + col("copy")).as("doc_id"), col("lang"),
        col("source"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("_"), col("copy")))).as("text"))
      .withColumn("n_chars", length(col("text"))))
    val templated = materialize(benign.select(
      col("doc_id"), col("lang"), col("source"),
      when(col("doc_id") % 2 === 0,
        concat(lit(SkewProbe.Template), lit(" "),
          concat_ws(" ", slice(split(col("text"), " "), 1, 40))))
        .otherwise(col("text")).as("text"))
      .withColumn("n_chars", length(col("text"))))

    def t(body: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def stages(corpus: DataFrame,
               extras: Boolean = false): Seq[(String, Double)] = {
      import graft.operators.{Curation, Dedup, Redact, Splits}
      val bench = corpus.filter(col("doc_id") < 25L)
      val raw = corpus.filter(col("doc_id") >= 25L)
      var scored: DataFrame = null
      val tVerd = t {
        scored = materialize(raw
          .join(graft.pipelines.CurationJob.fullVerdicts(raw,
            graft.pipelines.CurationJob.DefaultRules), "doc_id")
          .withColumn("n_tokens",
            graft.functions.TextFns.tokenCount(col("text"))))
      }
      val kept = scored.filter(col("keep") === 1L)
      var pairs: DataFrame = null
      val tPairs = t {
        pairs = materialize(Dedup.ngramJaccardPairsAuto(
          kept, "doc_id", "text", n = 3, threshold = 0.6))
      }
      var keepL: DataFrame = null
      val tKeep = t {
        keepL = materialize(Dedup.keepList(
          kept.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars",
          pairs))
      }
      val deduped = kept.join(
        keepL.filter(col("keep") === 1L).select("doc_id"), "doc_id")
      var clean: DataFrame = null
      val tDecon = t {
        val contaminated = Curation.decontaminate(deduped, bench,
          "doc_id", "text", n = 5).select("doc_id")
        clean = materialize(
          deduped.join(contaminated, Seq("doc_id"), "left_anti"))
      }
      var corpusClean: DataFrame = null
      val tMix = t {
        val weights = Curation.mixtureWeights(clean, "lang",
          col("n_tokens"), Seq("en" -> 0.6, "de" -> 0.2, "es" -> 0.1,
            "fr" -> 0.06, "zh" -> 0.04))
        corpusClean = materialize(Splits.withSplit(
          Curation.applyMixture(
            Redact.scrub(clean, "text")
              .select(col("doc_id"), col("lang"),
                col("scrubbed").as("text"), col("n_tokens")),
            "doc_id", "lang", weights),
          "doc_id"))
      }
      val tLayout = t {
        val sharded = Curation.shardAssign(
          corpusClean.filter(col("split") === "train")
            .withColumn("row_id",
              concat_ws(":", col("doc_id"), col("copy"))),
          "row_id", graft.pipelines.CurationJob.NumShards)
        val bins = Curation.packSequences(sharded, "pos", col("n_tokens"),
            "shard", graft.pipelines.CurationJob.PackBudget)
          .select(col("shard"), col("pos"), col("bin"))
        sharded.join(bins, Seq("shard", "pos"))
          .write.mode("overwrite").format("noop").save()
      }
      // extras (raw mode): price the round-14 census default in
      // isolation — the sampled hot-shingle census alone, and the pairs
      // stage with the census-free fixed hash order — so the
      // auto-vs-fixed delta is attributable to (census jobs + chosen
      // order), not guessed from the composed number
      val extra = if (!extras) Nil else {
        val tCensus = t {
          graft.operators.Dedup.hotShingleShare(kept, "doc_id", "text", 3)
        }
        val tFixed = t {
          materialize(Dedup.ngramJaccardPairs(
            kept, "doc_id", "text", n = 3, threshold = 0.6))
        }
        Seq("pairs_census_only" -> tCensus, "pairs_fixed_order" -> tFixed)
      }
      Seq("verdicts" -> tVerd, "dedup_pairs" -> tPairs,
        "keep_list" -> tKeep, "decontaminate" -> tDecon,
        "mixture_scrub_split" -> tMix, "train_layout" -> tLayout) ++ extra
    }
    // WRITE-DELTA mode (SPARK_GRAFT_JOB_WRITE_DELTA=1): price the five
    // parquet table writes by running the COMPLETE job twice in the
    // same session — once through the real parquet sink, once through
    // the noop sink (identical plans, no write path) — min-of-5 each
    // (the Bench job-row discipline; write noise needs the samples).
    // This turns the "bench ≈ 11 s vs stage-sum ≈ 6.6 s gap is the
    // writes" ATTRIBUTION into a measured number (VERDICT r15 #7).
    if (sys.env.get("SPARK_GRAFT_JOB_WRITE_DELTA").contains("1")) {
      def rmTree(p: java.nio.file.Path): Unit = {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
      def runJob(sink: String): Double = {
        System.gc()
        val out = java.nio.file.Files.createTempDirectory("graft_wdelta")
        val t0 = System.nanoTime()
        graft.pipelines.CurationJob.run(spark, sfDir, out.toString,
          sink = sink)
        val dt = (System.nanoTime() - t0) / 1e9
        rmTree(out)
        dt
      }
      runJob("noop") // untimed plan/JIT warmup
      val iters = 5
      val tNoop = (1 to iters).map(_ => runJob("noop")).min
      val tParquet = (1 to iters).map(_ => runJob("parquet")).min
      println(f"""{"probe":"job_write_delta","sf":"$sfDir","iters":$iters,""" +
        f""""parquet_sec":$tParquet%.3f,"noop_sec":$tNoop%.3f,""" +
        f""""write_delta_sec":${tParquet - tNoop}%.3f}""")
      spark.stop()
      return
    }
    // RAW mode (SPARK_GRAFT_JOB_RAW=1): decompose the job on the BENCH
    // corpus itself — the exact frame Bench's curation_job row times —
    // with the census/fixed-order extras, so a bench-total drift can be
    // pinned to a named stage (VERDICT r14 #3) instead of argued about.
    if (sys.env.get("SPARK_GRAFT_JOB_RAW").contains("1")) {
      val raw = materialize(graft.sources.Tables.documents(spark, sfDir)
        .select("doc_id", "lang", "source", "text", "n_chars"))
      stages(raw, extras = true) // untimed plan warmup
      val r = stages(raw, extras = true)
      val rows = r.map { case (n, tr) => f""""$n":$tr%.3f""" }.mkString(",")
      println(s"""{"probe":"job_stages_raw","sf":"$sfDir","stages":{$rows}}""")
      spark.stop()
      return
    }
    // untimed warmup of BOTH corpora's plan shapes: the skew side takes
    // the rarity-order plans the benign side never compiles, so a
    // benign-only warmup would charge the skew stages cold JIT/codegen
    // (measured 2.5x on the pairs stage)
    stages(benign); stages(templated)
    val b = stages(benign)
    val s = stages(templated)
    val rows = b.zip(s).map { case ((n, tb), (_, ts)) =>
      f""""$n":{"benign":$tb%.3f,"skew":$ts%.3f,"ratio":${ts / tb}%.2f}"""
    }.mkString(",")
    println(s"""{"probe":"job_stages","sf":"$sfDir","k":$k,"stages":{$rows}}""")
    spark.stop()
  }
}
