package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-20 measurement main — the two measurements VERDICT r19 asked
  * for, one JSON line per section:
  *
  *   - `sembudget` (r19 #1): the probe-volume budget's cost/recall
  *     trade at θ∈{0.4, 0.8} on the sign-flip ×100 corpus
  *     ([[SignFlipRecall]] — the reusable harness r19 #8 asked for).
  *     Three configurations per θ: the historical GOVERNED decision
  *     (recall cap, no budget — the measured 37× cliff at θ=0.4), the
  *     BUDGETED default ([[graft.operators.Similarity.SemProbeMaxCandidatesPerVector]]),
  *     and the terminal PLAIN fallback (volume width, no flips). The
  *     budgeted row must show bounded cost with its recall shortfall
  *     measured, not just predicted.
  *   - `decade` (r19 #6): the ×1000 store decade point — a 5M-row
  *     lexical index stored at [[graft.operators.Dedup.recommendedBucketCounts]]'
  *     rule counts, with one band-bucket neighbor each side of the
  *     n/1024 rule (bowl validation) and the id-bucket clamp probed
  *     both ways (5M is the first decade where the 1024 id clamp
  *     BINDS: n/2048 = 2441). Also the in-memory probe for the
  *     crossover curve's fourth point.
  *
  *   - `managed`: the managed-root pointer indirection priced — the
  *     same ×100 store probed as a plain path, a fresh managed root,
  *     and a three-version root, plus the pointer read
  *     microbenchmarked directly.
  *
  * `SPARK_GRAFT_R20` (csv of section names) restricts the run.
  * Run the decade section with `SPARK_DRIVER_MEM=64g` — the 5M-row
  * checkpointed index frame carries the shingle-set payload.
  */
object Round20Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val sections = sys.env.getOrElse("SPARK_GRAFT_R20", "sembudget,decade")
      .split(",").map(_.trim).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(df: => DataFrame, n: Int = iters): Double =
      (1 to n).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    def rmTree(p: String): Unit = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }

    // ------------------------------------------------------- sembudget
    if (sections("sembudget")) {
      import graft.operators.Similarity
      val k = 100
      val embK = SignFlipRecall.corpus(spark, sfDir, k)
      val nIdx = embK.count()
      val idx = Similarity.signatureFrame(embK, "vec_id", "embedding")
        .localCheckpoint()
      idx.count()
      val batch = SignFlipRecall.borderlineBatch(spark, sfDir)
      val nBatch = batch.count()
      val maxCos = SignFlipRecall.maxCosines(embK, batch)

      def decJson(d: Similarity.SemProbeDecision,
                  g: SignFlipRecall.GradedConfig): String =
        f""""w":${g.rowsPerBand},"flips":${g.flips},"degraded":${d.degraded},"est_cand_per_vec":${d.expectedCandidatesPerVector}%.0f,"predicted_recall":${d.predictedRecall}%.4f,"shortfall":${d.recallShortfall}%.4f,"sec":${g.sec}%.3f,"flagged":${g.flagged},"exact_flagged":${g.exactFlagged},"false_flags":${g.falseFlags},"borderline_n":${g.borderlineN},"borderline_recall":${g.borderlineRecall.map(r => f"$r%.4f").getOrElse("null")},"overall_recall":${g.overallRecall.map(r => f"$r%.4f").getOrElse("null")}"""

      def leg(theta: Double): String = {
        val governed = Similarity.recommendedSemDeltaProbeBudgeted(idx,
          theta, recallTarget = 0.9,
          maxCandidatesPerVector = Double.PositiveInfinity)
        val budgeted = Similarity.recommendedSemDeltaProbeBudgeted(idx,
          theta, recallTarget = 0.9)
        val plain = Similarity.recommendedSemDeltaProbeBudgeted(idx,
          theta, recallTarget = 0.9, maxCandidatesPerVector = 1.0)
        // grade each DISTINCT (w, flips) once; the governed θ=0.4 leg
        // is known-pathological (the measured 107 s), so its magnitude
        // runs once — jitter is not the measurement there
        val cache = scala.collection.mutable.Map
          .empty[(Int, Int), SignFlipRecall.GradedConfig]
        def graded(d: Similarity.SemProbeDecision, n: Int) =
          cache.getOrElseUpdate((d.rowsPerBand, d.flips),
            SignFlipRecall.gradeConfig(idx, batch, theta, d.rowsPerBand,
              d.flips, maxCos, n))
        val gGov = graded(governed, if (theta < 0.5) 1 else iters)
        val gBud = graded(budgeted, iters)
        val gPlain = graded(plain, iters)
        s""""theta_$theta":{"governed":{${decJson(governed, gGov)}},"budgeted":{${decJson(budgeted, gBud)}},"plain":{${decJson(plain, gPlain)}}}"""
      }
      val legs = Seq(0.8, 0.4).map(leg).mkString(",")
      println(s"""{"probe":"sem_budget_signflip","sf":"$sfDir","index_rows":$nIdx,"batch_rows":$nBatch,"budget_cands_per_vec":${Similarity.SemProbeMaxCandidatesPerVector.toInt},$legs}""")
      idx.unpersist(); embK.unpersist(); batch.unpersist()
    }

    // ---------------------------------------------------------- decade
    if (sections("decade")) {
      val k = sys.env.getOrElse("SPARK_GRAFT_R20_K", "1000").toInt
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      // disjoint-copy replication, copy 0 pristine (the replicate
      // convention — the fixed micro-batch keeps its real 1× match
      // workload at every scale)
      val rep = docs
        .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("copy"))
        .select((col("doc_id") * k + col("copy")).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => when(col("copy") === 0, t)
              .otherwise(concat(t, lit("_"), col("copy"))))).as("text"))
      val idx = graft.operators.Dedup.nearDupIndex(rep, "doc_id", "text",
        n = 3).localCheckpoint()
      val n = idx.count()
      val microBatch = docs.filter(col("doc_id") % 1000 === 999)
        .select((col("doc_id") + 2000000000L).as("doc_id"), col("text"))
      val microIds = microBatch.select("doc_id").localCheckpoint()
      val microIdx = graft.operators.Dedup.nearDupIndex(
        microBatch, "doc_id", "text", n = 3).localCheckpoint()
      microIds.count(); microIdx.count()
      def storeProbe(path: String): Double =
        time(graft.operators.Dedup.deltaNearDupFromStore(
          spark, path, microIds, microIdx, "doc_id", threshold = 0.6))
      val (ruleBB, ruleIB) = graft.operators.Dedup.recommendedBucketCounts(n)
      val unclampedIB = math.max(16L, n / 2048).toInt
      // band-bucket bowl: the rule point with one neighbor each side
      // (×/÷2), id buckets pinned at the rule; then the id clamp legs
      // at the rule band count — 1024 (clamped rule) vs n/2048
      // (unclamped) — 5M is the first decade where the clamp binds
      val legs = Seq(
        ("band_half", ruleBB / 2, ruleIB),
        ("band_rule", ruleBB, ruleIB),
        ("band_double", ruleBB * 2, ruleIB),
        ("id_unclamped", ruleBB, unclampedIB))
      val measured = legs.map { case (name, bb, ib) =>
        val p = java.nio.file.Files
          .createTempDirectory("graft_r20_store").toString
        val t0 = System.nanoTime()
        graft.operators.Dedup.writeNearDupIndexStore(idx, p, bands = 32,
          bandBuckets = bb, idBuckets = ib)
        val wSec = (System.nanoTime() - t0) / 1e9
        storeProbe(p) // warmup (listing caches cold)
        val s = storeProbe(p)
        rmTree(p)
        (name, bb, ib, wSec, s)
      }
      val memSec = {
        time(graft.operators.Dedup.deltaNearDupFromIndex(
          idx, microIds, microIdx, "doc_id", threshold = 0.6), n = 1) // warm
        time(graft.operators.Dedup.deltaNearDupFromIndex(
          idx, microIds, microIdx, "doc_id", threshold = 0.6))
      }
      val legsJson = measured.map { case (name, bb, ib, wSec, s) =>
        f""""$name":{"band_buckets":$bb,"id_buckets":$ib,"write_sec":$wSec%.1f,"probe_sec":$s%.3f}"""
      }.mkString(",")
      val ruleProbe = measured.find(_._1 == "band_rule").get._5
      println(f"""{"probe":"store_decade_x$k","sf":"$sfDir","rows":$n,"rule_band_buckets":$ruleBB,"rule_id_buckets":$ruleIB,"id_unclamped":$unclampedIB,"band_clamp_headroom":${8192.0 / ruleBB}%.2f,$legsJson,"mem_probe_sec":$memSec%.3f,"store_vs_mem":${ruleProbe / memSec}%.2f}""")
      idx.unpersist(); microIds.unpersist(); microIdx.unpersist()
    }

    // ------------------------------------------------------- semdecade
    // The lexical `decade` section's SEMANTIC twin: the signature
    // store ([[graft.operators.Similarity.writeSignatureStore]])
    // measured at ×100 (200k vectors) and ×2500 (5M — the decade the
    // lexical probe validated) under the SAME construction (sign-flip
    // replicas, fixed 480-vector borderline batch), store vs the
    // in-memory probe at the BUDGETED auto decision per scale. Sem
    // banded rows are (128/w)·n, not 32n, so bucket counts follow the
    // measured 32k-rows/bucket rule applied to the actual banded-row
    // count; the decision is the deployment default (budgeted), so a
    // scale where the recall-governed fanout exceeds the budget
    // records its explicit degradation alongside its cost.
    if (sections("semdecade")) {
      import graft.operators.Similarity
      val theta = 0.8
      val batch = SignFlipRecall.borderlineBatch(spark, sfDir)
      val bIds = batch.select(col("vec_id")).localCheckpoint()
      bIds.count()
      val bSig = Similarity.signatureFrame(batch, "vec_id", "embedding")
        .localCheckpoint()
      bSig.count()
      def leg(k: Int): String = {
        val emb = SignFlipRecall.corpus(spark, sfDir, k)
        val n = emb.count()
        val sigF = Similarity.signatureFrame(emb, "vec_id", "embedding")
          .localCheckpoint()
        sigF.count()
        emb.unpersist()
        val dec = Similarity.recommendedSemDeltaProbeBudgeted(sigF, theta)
        val bands = 128 / dec.rowsPerBand
        val bandedRows = n * bands
        val bb = math.min(8192L, math.max(16L, bandedRows / 32768L)).toInt
        val ib = math.min(1024L, math.max(16L, n / 2048L)).toInt
        val p = java.nio.file.Files
          .createTempDirectory("graft_r20_semstore").toString
        val t0 = System.nanoTime()
        Similarity.writeSignatureStore(sigF, p, dec.rowsPerBand, bb, ib)
        val wSec = (System.nanoTime() - t0) / 1e9
        def sProbe(): Double = time(Similarity.deltaSemNearDupFromStore(
          spark, p, bIds, bSig, "vec_id", theta, dec.flips))
        sProbe() // cold listing warmup, same discipline as the lex legs
        val sSec = sProbe()
        val mSec = {
          time(Similarity.deltaSemNearDupFromIndex(sigF, bIds, bSig,
            "vec_id", theta, dec.rowsPerBand, dec.flips), n = 1)
          time(Similarity.deltaSemNearDupFromIndex(sigF, bIds, bSig,
            "vec_id", theta, dec.rowsPerBand, dec.flips))
        }
        rmTree(p)
        sigF.unpersist()
        f""""x$k":{"rows":$n,"w":${dec.rowsPerBand},"flips":${dec.flips},"degraded":${dec.degraded},"shortfall":${dec.recallShortfall}%.4f,"band_buckets":$bb,"id_buckets":$ib,"write_sec":$wSec%.1f,"store_probe_sec":$sSec%.3f,"mem_probe_sec":$mSec%.3f,"store_vs_mem":${sSec / mSec}%.2f}"""
      }
      val legs = sys.env.getOrElse("SPARK_GRAFT_R20_SEMK", "100,2500")
        .split(",").map(_.trim.toInt).toSeq.map(leg).mkString(",")
      println(s"""{"probe":"sem_store_decade","sf":"$sfDir",$legs}""")
      bIds.unpersist(); bSig.unpersist()
    }

    // --------------------------------------------------------- managed
    // The managed-root protocol's PRICE: every store entry point
    // resolves the `CURRENT` pointer per call
    // ([[graft.operators.Dedup.resolveStoreDir]] — one small-file read),
    // so the indirection must be measured, not assumed free. Same store
    // content three ways — a plain path, a fresh managed root (v1), and
    // the same root after a no-op maintenance pair (all-keep compact +
    // same-counts reband → v3, the q192/q193 shape) — each probed by
    // the same fixed micro-batch. `managed_v1 − plain` is the pointer
    // price on an end-to-end probe; `managed_v3` confirms version
    // history adds nothing (probes read only the resolved version);
    // `resolve_ms` is the pointer read microbenchmarked directly, since
    // a per-call cost in the low ms drowns in probe-scale jitter.
    if (sections("managed")) {
      val k = sys.env.getOrElse("SPARK_GRAFT_R20_MK", "100").toInt
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      val rep = docs
        .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("copy"))
        .select((col("doc_id") * k + col("copy")).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => when(col("copy") === 0, t)
              .otherwise(concat(t, lit("_"), col("copy"))))).as("text"))
      val idx = graft.operators.Dedup.nearDupIndex(rep, "doc_id", "text",
        n = 3).localCheckpoint()
      val n = idx.count()
      val microBatch = docs.filter(col("doc_id") % 1000 === 999)
        .select((col("doc_id") + 2000000000L).as("doc_id"), col("text"))
      val microIds = microBatch.select("doc_id").localCheckpoint()
      val microIdx = graft.operators.Dedup.nearDupIndex(
        microBatch, "doc_id", "text", n = 3).localCheckpoint()
      microIds.count(); microIdx.count()
      val (bb, ib) = graft.operators.Dedup.recommendedBucketCounts(n)
      def probe(path: String): Double =
        time(graft.operators.Dedup.deltaNearDupFromStore(
          spark, path, microIds, microIdx, "doc_id", threshold = 0.6))
      val plain = java.nio.file.Files
        .createTempDirectory("graft_r20_plainroot").toString
      graft.operators.Dedup.writeNearDupIndexStore(idx, plain, bands = 32,
        bandBuckets = bb, idBuckets = ib)
      probe(plain) // cold-listing warmup, same discipline as decade legs
      val plainSec = probe(plain)
      val root = java.nio.file.Files
        .createTempDirectory("graft_r20_managedroot").toString
      graft.operators.Dedup.initManagedNearDupIndexStore(spark, root, idx,
        bands = 32, bandBuckets = bb, idBuckets = ib)
      probe(root)
      val v1Sec = probe(root)
      graft.operators.Dedup.compactManagedStore(spark, root,
        idx.select("id"))
      graft.operators.Dedup.rebandManagedStore(spark, root, newBands = 32,
        newBandBuckets = bb, newIdBuckets = ib)
      probe(root)
      val v3Sec = probe(root)
      val resolveMs = {
        (1 to 20).foreach(_ =>
          graft.operators.Dedup.resolveStoreDir(spark, root)) // warm
        val t0 = System.nanoTime()
        (1 to 200).foreach(_ =>
          graft.operators.Dedup.resolveStoreDir(spark, root))
        (System.nanoTime() - t0) / 200e6
      }
      rmTree(plain); rmTree(root)
      println(f"""{"probe":"managed_overhead","sf":"$sfDir","rows":$n,"band_buckets":$bb,"id_buckets":$ib,"plain_probe_sec":$plainSec%.3f,"managed_v1_probe_sec":$v1Sec%.3f,"managed_v3_probe_sec":$v3Sec%.3f,"resolve_ms":$resolveMs%.3f}""")
      idx.unpersist(); microIds.unpersist(); microIdx.unpersist()
    }

    spark.stop()
  }
}
