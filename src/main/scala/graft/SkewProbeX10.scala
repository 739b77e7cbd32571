package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ×10 extension of [[SkewProbe]] (VERDICT r13 #6): the documents-
  * family skew rows re-measured with the hot thing TEN times bigger
  * (k = 20 replicate → ~100k docs at sf0.1, 50% sharing the template
  * head) against a benign corpus of the same size. Only the MITIGATED
  * paths run — the unmitigated legs are quadratic in the hot-bucket
  * size BY DESIGN (that is what the k=2 probe demonstrates) and would
  * measure minutes of known-pathological work, so this probe answers
  * the one open question: do the mitigations' claims (drop is flat,
  * rarity is flat, the absorbed paths stay absorbed, the census-driven
  * job default holds) survive a decade of hot-bucket growth?
  *
  * Prints ONE JSON line:
  * `{"probe":"skew_x10","sf":...,"k":...,"queries":{"q22_minhash_drop":
  * {"benign":s,"skew":s,"ratio":r},...}}` — `ratio` compares the
  * MITIGATED skew time against the same-size benign corpus, the same
  * definition the k=2 probe uses, so the two artifacts are directly
  * comparable per path.
  */
object SkewProbeX10 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = sys.env.getOrElse("SPARK_GRAFT_SKEW_K", "20").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
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
    // the SkewProbe replicate: remapped ids, per-copy token suffixes —
    // copies share no shingles, so the only hot mass is the template
    val benign = materialize(docs
      .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("copy"))
      .select((col("doc_id") * k + col("copy")).as("doc_id"), col("lang"),
        col("source"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("_"), col("copy")))).as("text")))
    val templated = materialize(benign.select(
      col("doc_id"), col("lang"), col("source"),
      when(col("doc_id") % 2 === 0,
        concat(lit(SkewProbe.Template), lit(" "),
          concat_ws(" ", slice(split(col("text"), " "), 1, 40))))
        .otherwise(col("text")).as("text")))

    def time(df: => DataFrame, n: Int = iters): Double =
      (1 to n).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    // SPARK_GRAFT_SKEW_JOB_ONLY=1 restricts to the composed-job leg
    // (dev loop for job-level investigation at ×10)
    val jobOnly = sys.env.get("SPARK_GRAFT_SKEW_JOB_ONLY").exists(_ == "1")

    // q22 shape, hotBucketDrop: the boilerplate relief valve must stay
    // FLAT — drop removes the quadratic mass, so skew ≈ benign even
    // with the hot bucket 10× bigger
    def minhashDrop(c: DataFrame): DataFrame =
      graft.operators.Dedup.minHashPairs(c, "doc_id", "text", n = 3,
        threshold = 0.6, hotBucketDrop = 128)
    val (mhB, mhS) = if (jobOnly) (0.0, 0.0) else {
      minhashDrop(benign).write.mode("overwrite").format("noop").save()
      (time(minhashDrop(benign)), time(minhashDrop(templated)))
    }

    // q21 shape, rarity order: boilerplate shingles sort last and never
    // form prefix buckets — flat at any template mass, exactness kept
    def ngRarity(c: DataFrame): DataFrame =
      graft.operators.Dedup.ngramJaccardPairs(c, "doc_id", "text", n = 3,
        threshold = 0.6, rarityOrder = true)
    val (ngB, ngS) = if (jobOnly) (0.0, 0.0) else {
      ngRarity(benign).write.mode("overwrite").format("noop").save()
      (time(ngRarity(benign)), time(ngRarity(templated)))
    }

    // absorbed paths: BM25's term-keyed aggregates and winnowing's
    // dfCap excision must keep absorbing at 10× the hot mass
    val q = benign.filter(col("doc_id") < 10 * k)
      .select(col("doc_id"), col("text"))
    def bm25(c: DataFrame): DataFrame =
      graft.functions.Bm25.topK(c, "doc_id", "text", q, "doc_id", "text",
        k = 5)
    val (bmB, bmS) = if (jobOnly) (0.0, 0.0) else {
      bm25(benign).write.mode("overwrite").format("noop").save()
      (time(bm25(benign)), time(bm25(templated)))
    }
    def winnow(c: DataFrame): DataFrame =
      graft.operators.Dedup.winnowOverlap(c, "doc_id", "text", k = 3,
        w = 4, dfCap = 20, minShared = 2)
    val (wB, wS) = if (jobOnly) (0.0, 0.0) else {
      winnow(benign).write.mode("overwrite").format("noop").save()
      (time(winnow(benign)), time(winnow(templated)))
    }

    // the composed job with its census-driven defaults, at the ×10 hot
    // bucket: write both corpora as real tables, run end-to-end
    def rmTree(p: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
    def jobDir(frame: DataFrame): java.nio.file.Path = {
      val base = java.nio.file.Files.createTempDirectory("graft_skewx10")
      frame.withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$base/documents.parquet")
      base
    }
    val jbDir = jobDir(benign)
    val jsDir = jobDir(templated)
    def timeJob(dir: String): Double =
      (1 to iters).map { _ =>
        System.gc()
        val out = java.nio.file.Files.createTempDirectory("graft_skewx10_out")
        val t0 = System.nanoTime()
        graft.pipelines.CurationJob.run(spark, dir, out.toString)
        val dt = (System.nanoTime() - t0) / 1e9
        rmTree(out)
        dt
      }.min
    val jobB = timeJob(jbDir.toString)
    val jobS = timeJob(jsDir.toString)
    rmTree(jbDir); rmTree(jsDir)

    def j2(b: Double, s: Double) =
      f""""benign":$b%.3f,"skew":$s%.3f,"ratio":${s / b}%.2f"""
    println(s"""{"probe":"skew_x10","sf":"$sfDir","k":$k,"queries":{""" +
      s""""q22_minhash_drop":{${j2(mhB, mhS)}},""" +
      s""""q21_ngram_rarity":{${j2(ngB, ngS)}},""" +
      s""""q101_bm25":{${j2(bmB, bmS)}},""" +
      s""""q116_winnow_overlap":{${j2(wB, wS)}},""" +
      s""""curation_job":{${j2(jobB, jobS)}}}}""")
    spark.stop()
  }
}
