package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 measurement main — the four measurements rounds 17/18 left
  * open (VERDICT r18 #2/#4/#5), one JSON line per section:
  *
  *   - `sem100`: RECALL at the ×100 auto width for the recall-governed
  *     incremental semantic probe (the measured half of r17 #1, promised
  *     by q186's design). The ×100 rolled-embedding index resolves its
  *     `(rowsPerBand, flips)` via `recommendedSemDeltaProbe`; a fixed
  *     batch is classified at that configuration AND at flips=0, and
  *     both decision sets are graded against brute-force exact cosine —
  *     flagged decisions are exact-verified so approx ⊆ exact, making
  *     `|approx flags| / |exact flags|` the decision-level recall.
  *   - `hotstand`: the hot-STANDING-index skew legs at ×10 (the measured
  *     half of r17 #2): a template bucket `hot` docs deep inside the
  *     standing index, probed by a batch containing template hits, with
  *     `hotBucketDrop` engaged vs not — seconds both ways plus the
  *     decision trade (template batch docs flip dup→new when dropped;
  *     everything else must be identical).
  *   - `buckets`: the store bucket-count curve at ×100 and the
  *     in-memory↔store crossover re-measured with
  *     [[graft.operators.Dedup.recommendedBucketCounts]] maintained
  *     buckets at ×1/×10/×100 (r17 #4 — the r17 store rows used ad-hoc
  *     512/5120/8192 counts; the listing floor was the measured loss).
  *   - `parity`: the semantic batch↔stream parity SLO's miss attribution
  *     (r17 #6): the StreamingSpec coverage measurement re-run with
  *     `maxBucket` ∈ {64, 1024, ∞} — if coverage is flat in the bound,
  *     eviction is exonerated and the 0.948 is banding luck; if it
  *     rises, eviction dominates and representative-keeping eviction is
  *     the next lever.
  *
  * `SPARK_GRAFT_R19` (csv of section names) restricts the run.
  */
object Round19Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val sections = sys.env.getOrElse("SPARK_GRAFT_R19",
      "sem100,sem100b,hotstand,buckets,parity").split(",").map(_.trim).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

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

    // ---------------------------------------------------------- sem100
    if (sections("sem100")) {
      // ScaleProbe's dimension-rolled replica — but with ALL copies of
      // the BATCH docs EXCLUDED from the index: this testdata's
      // embeddings are nearly roll-invariant (cos(v, roll(v, c)) ≥
      // 0.95 measured), so any surviving copy of a batch doc is a
      // high-margin self-match banding can never miss and decision
      // recall reads 1.0000 at every configuration (two earlier cuts
      // of this probe did exactly that — the r17 empty-verify lesson's
      // mirror image: a probe must preserve the MISSABLE workload).
      // With the batch family fully excised, each batch doc's best
      // match is its organic nearest OTHER document, and the margin
      // buckets below populate where the banding curve actually
      // gambles.
      val embDim = 64
      val k2 = 100
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .filter(col("embedding").isNotNull).select("vec_id", "embedding")
      val embK2 = emb
        .select(col("*"), explode(sequence(lit(0), lit(k2 - 1))).as("copy"))
        .filter(col("vec_id") % 5 =!= 4)
        .select((col("vec_id") * k2 + col("copy")).as("vec_id"),
          transform(sequence(lit(0), lit(embDim - 1)), i =>
            element_at(col("embedding"),
              (pmod(i + col("copy"), lit(embDim)) + 1).cast("int")))
            .as("embedding"))
        .localCheckpoint()
      val nIdx = embK2.count()
      val idx = graft.operators.Similarity.signatureFrame(
        embK2, "vec_id", "embedding").localCheckpoint()
      idx.count()
      val batch = emb.filter(col("vec_id") % 5 === 4)
        .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
        .localCheckpoint()
      val nBatch = batch.count()

      def widen(df: DataFrame, id: String, e: String, n: String) =
        df.select(col("vec_id").as(id),
          graft.functions.VectorFns.toDouble(col("embedding")).as(e),
          graft.functions.VectorFns.norm(
            graft.functions.VectorFns.toDouble(col("embedding"))).as(n))
      val bW = widen(batch, "id_i", "e_i", "n_i").localCheckpoint()
      val cW = widen(embK2, "id_c", "e_c", "n_c")

      // every batch doc's TRUE max cosine against index ∪ smaller-id
      // batch — the margin above θ is what banding gambles on, so
      // recall is reported per margin bucket: a doc whose best match
      // sits at cos 0.95 is never missed by any width (its planes
      // almost all agree), and a saturated aggregate recall over such
      // docs would flatter any configuration (the first cut of this
      // probe read 1.0000 everywhere for exactly that reason)
      val maxCross = broadcast(bW).join(cW)
        .groupBy("id_i")
        .agg(max(graft.functions.VectorFns.dot(col("e_i"), col("e_c")) /
          (col("n_i") * col("n_c"))).as("mc"))
      val maxBatch = bW.select(col("id_i").as("id_a"), col("e_i").as("e_a"),
          col("n_i").as("n_a"))
        .crossJoin(bW.select(col("id_i").as("id_b"), col("e_i").as("e_b"),
          col("n_i").as("n_b")))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_b").as("id_i"))
        .agg(max(graft.functions.VectorFns.dot(col("e_a"), col("e_b")) /
          (col("n_a") * col("n_b"))).as("mb"))
      val maxCos = bW.select("id_i")
        .join(maxCross, Seq("id_i"), "left")
        .join(maxBatch, Seq("id_i"), "left")
        .select(col("id_i"),
          greatest(coalesce(col("mc"), lit(-1.0)),
            coalesce(col("mb"), lit(-1.0))).as("mx"))
        .as[(Long, Double)].collect().toMap

      def grade(theta: Double): String = {
        val (w, flips) = graft.operators.Similarity.recommendedSemDeltaProbe(
          idx, theta, recallTarget = 0.9)
        def probeFlags(fl: Int): (Double, Set[Long]) = {
          def run() = graft.operators.Similarity.deltaSemNearDup(
            idx, batch, "vec_id", "embedding", theta, rowsPerBand = w,
            flips = fl)
          val sec = time(run())
          (sec, run().filter(col("status") =!= "new").select("vec_id")
            .as[Long].collect().toSet)
        }
        val (secAuto, flagAuto) = probeFlags(flips)
        val (secPlain, flagPlain) = probeFlags(0)
        // margin buckets over the exactly-flagged docs (mx ≥ θ)
        val edges = Seq(theta, theta + 0.05, theta + 0.15, 2.0)
        // an empty bucket reports null, never 1.0 — a perfect-recall
        // reading manufactured from zero graded decisions is the
        // empty-verify trap this probe's own construction notes warn
        // about (round-19 review)
        val bucketJson = edges.sliding(2).zipWithIndex.map {
          case (Seq(lo, hi), i) =>
            val ids = maxCos.filter { case (_, mx) => mx >= lo && mx < hi }
              .keys.toSeq
            val n = ids.size
            def r(fl: Set[Long]) =
              if (n == 0) "null"
              else f"${ids.count(fl).toDouble / n}%.4f"
            val tag = if (i == 0) f"margin_lt_0.05"
              else if (i == 1) "margin_0.05_0.15" else "margin_ge_0.15"
            s""""$tag":{"n":$n,"auto_recall":${r(flagAuto)},"plain_recall":${r(flagPlain)}}"""
        }.mkString(",")
        val exactFlagged = maxCos.count(_._2 >= theta)
        val bogus = (flagAuto ++ flagPlain).count(d => maxCos(d) < theta)
        f""""theta_$theta":{"auto_width":$w,"auto_flips":$flips,"exact_flagged":$exactFlagged,"auto_flagged":${flagAuto.size},"plain_flagged":${flagPlain.size},"auto_sec":$secAuto%.3f,"plain_sec":$secPlain%.3f,"false_flags":$bogus,$bucketJson}"""
      }
      val legs = Seq(0.8, 0.4).map(grade).mkString(",")
      println(s"""{"probe":"sem100_recall","sf":"$sfDir","index_rows":$nIdx,"batch_rows":$nBatch,$legs}""")
      idx.unpersist(); embK2.unpersist(); bW.unpersist(); batch.unpersist()
    }

    // ---------------------------------------------------------- sem100b
    // The recall measurement sem100 could not make: rolled replicas of
    // this testdata saturate decision recall through match MULTIPLICITY
    // (~100 near-copies per organic match ≈ 100 banding draws). Here
    // the ×100 index uses SIGN-FLIP replicas — copy c multiplies each
    // dimension by a hash-derived ±1, so WITHIN-copy dot products are
    // preserved EXACTLY ((v⊙s)·(u⊙s) = v·u) while cross-copy cosines
    // decorrelate: every match has multiplicity ~1. The batch is
    // SYNTHETIC: one probe per target vector at a controlled angle
    // (d = cosα·t̂ + sinα·ŵ, ŵ a per-doc pseudo-random unit ⊥ t̂), one
    // angle per target so batch-batch cosines stay sub-threshold. The
    // margin buckets then measure the real banding-recall curve at the
    // governed width vs the plain one — ground truth stays the exact
    // brute-force max-cos, so construction error only moves a doc
    // between buckets, never mislabels it.
    if (sections("sem100b")) {
      val embDim = 64
      val k2 = 100
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .filter(col("embedding").isNotNull).select("vec_id", "embedding")
      val embK2 = emb
        .select(col("*"), explode(sequence(lit(0), lit(k2 - 1))).as("copy"))
        .select((col("vec_id") * k2 + col("copy")).as("vec_id"),
          transform(sequence(lit(0), lit(embDim - 1)), i =>
            element_at(col("embedding"), (i + 1).cast("int")) *
              when(col("copy") === 0, lit(1.0))
                .otherwise(when(pmod(xxhash64(col("copy"), i), lit(2)) === 0,
                  lit(1.0)).otherwise(lit(-1.0))))
            .as("embedding"))
        .localCheckpoint()
      val nIdx = embK2.count()
      val idx = graft.operators.Similarity.signatureFrame(
        embK2, "vec_id", "embedding").localCheckpoint()
      idx.count()

      // synthetic borderline batch: targets are copy-0 originals; the
      // planted cosines straddle each θ leg's margin buckets (plus a
      // sub-θ angle per leg as the false-flag control)
      val targets = emb.orderBy("vec_id").limit(480)
        .collect().map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray))
      val angles = Array(0.42, 0.47, 0.58, 0.35, 0.82, 0.87, 0.95, 0.72)
      val rnd = new scala.util.Random(42)
      val batchRows = targets.zipWithIndex.map { case ((tid, t), j) =>
        val tn = math.sqrt(t.map(x => x * x).sum)
        val th = t.map(_ / tn)
        val r = Array.fill(embDim)(rnd.nextDouble() * 2 - 1)
        val proj = th.zip(r).map(p => p._1 * p._2).sum
        val w0 = r.zip(th).map(p => p._1 - proj * p._2)
        val wn = math.sqrt(w0.map(x => x * x).sum)
        val w = w0.map(_ / wn)
        val a = angles(j % angles.length)
        val s = math.sqrt(1 - a * a)
        (1000000000L + j.toLong,
          th.zip(w).map(p => a * p._1 + s * p._2).toSeq)
      }.toSeq
      val batch = batchRows.toDF("vec_id", "embedding").localCheckpoint()
      val nBatch = batch.count()

      val bW = batch.select(col("vec_id").as("id_i"),
        graft.functions.VectorFns.toDouble(col("embedding")).as("e_i"),
        graft.functions.VectorFns.norm(
          graft.functions.VectorFns.toDouble(col("embedding"))).as("n_i"))
        .localCheckpoint()
      val cW = embK2.select(col("vec_id").as("id_c"),
        graft.functions.VectorFns.toDouble(col("embedding")).as("e_c"),
        graft.functions.VectorFns.norm(
          graft.functions.VectorFns.toDouble(col("embedding"))).as("n_c"))
      val maxCross = broadcast(bW).join(cW)
        .groupBy("id_i")
        .agg(max(graft.functions.VectorFns.dot(col("e_i"), col("e_c")) /
          (col("n_i") * col("n_c"))).as("mc"))
      val maxBatch = bW.select(col("id_i").as("id_a"), col("e_i").as("e_a"),
          col("n_i").as("n_a"))
        .crossJoin(bW.select(col("id_i").as("id_b"), col("e_i").as("e_b"),
          col("n_i").as("n_b")))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_b").as("id_i"))
        .agg(max(graft.functions.VectorFns.dot(col("e_a"), col("e_b")) /
          (col("n_a") * col("n_b"))).as("mb"))
      val maxCos = bW.select("id_i")
        .join(maxCross, Seq("id_i"), "left")
        .join(maxBatch, Seq("id_i"), "left")
        .select(col("id_i"),
          greatest(coalesce(col("mc"), lit(-1.0)),
            coalesce(col("mb"), lit(-1.0))).as("mx"))
        .as[(Long, Double)].collect().toMap

      def grade(theta: Double): String = {
        val (w, flips) = graft.operators.Similarity.recommendedSemDeltaProbe(
          idx, theta, recallTarget = 0.9)
        def probeFlags(fl: Int): (Double, Set[Long]) = {
          def run() = graft.operators.Similarity.deltaSemNearDup(
            idx, batch, "vec_id", "embedding", theta, rowsPerBand = w,
            flips = fl)
          val sec = time(run())
          (sec, run().filter(col("status") =!= "new").select("vec_id")
            .as[Long].collect().toSet)
        }
        val (secAuto, flagAuto) = probeFlags(flips)
        val (secPlain, flagPlain) = probeFlags(0)
        val edges = Seq(theta, theta + 0.05, theta + 0.15, 2.0)
        val bucketJson = edges.sliding(2).zipWithIndex.map {
          case (Seq(lo, hi), i) =>
            val ids = maxCos.filter { case (_, mx) => mx >= lo && mx < hi }
              .keys.toSeq
            val n = ids.size
            def r(fl: Set[Long]) =
              if (n == 0) "null"
              else f"${ids.count(fl).toDouble / n}%.4f"
            val tag = if (i == 0) f"margin_lt_0.05"
              else if (i == 1) "margin_0.05_0.15" else "margin_ge_0.15"
            s""""$tag":{"n":$n,"auto_recall":${r(flagAuto)},"plain_recall":${r(flagPlain)}}"""
        }.mkString(",")
        val exactFlagged = maxCos.count(_._2 >= theta)
        val bogus = (flagAuto ++ flagPlain).count(d => maxCos(d) < theta)
        f""""theta_$theta":{"auto_width":$w,"auto_flips":$flips,"exact_flagged":$exactFlagged,"auto_flagged":${flagAuto.size},"plain_flagged":${flagPlain.size},"auto_sec":$secAuto%.3f,"plain_sec":$secPlain%.3f,"false_flags":$bogus,$bucketJson}"""
      }
      val legs = Seq(0.8, 0.4).map(grade).mkString(",")
      println(s"""{"probe":"sem100b_recall_signflip","sf":"$sfDir","index_rows":$nIdx,"batch_rows":$nBatch,$legs}""")
      idx.unpersist(); embK2.unpersist(); bW.unpersist(); batch.unpersist()
    }

    // -------------------------------------------------------- hotstand
    if (sections("hotstand")) {
      val k = 10
      val hot = sys.env.getOrElse("SPARK_GRAFT_R19_HOT", "10000").toInt
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      // copy 0 stays PRISTINE (the replicate convention): the batch's
      // non-template docs carry original text, so they have real
      // standing matches and the zero-collateral check below can
      // actually catch a drop-induced dup→new flip outside the
      // template (round-19 review: a fully-suffixed replica made that
      // assertion vacuous — every benign batch doc was 'new' under
      // both legs)
      val benign = docs
        .select(col("*"), explode(sequence(lit(0), lit(k - 1))).as("copy"))
        .select((col("doc_id") * k + col("copy")).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => when(col("copy") === 0, t)
              .otherwise(concat(t, lit("_"), col("copy"))))).as("text"))
      val tpl = SkewProbe.Template
      val hotDocs = spark.range(hot)
        .select((col("id") + 500000000L).as("doc_id"), lit(tpl).as("text"))
      val standing = benign.unionByName(hotDocs)
      val idx = graft.operators.Dedup.nearDupIndex(
        standing, "doc_id", "text", n = 3).localCheckpoint()
      idx.count()
      // fixed micro-batch + 50 template hits probing the hot bucket
      val batch = docs.filter(col("doc_id") % 1000 === 999)
        .select((col("doc_id") + 2000000000L).as("doc_id"), col("text"))
        .unionByName(spark.range(50)
          .select((col("id") + 2100000000L).as("doc_id"), lit(tpl).as("text")))
      val batchIds = batch.select("doc_id").localCheckpoint()
      val batchIdx = graft.operators.Dedup.nearDupIndex(
        batch, "doc_id", "text", n = 3).localCheckpoint()
      batchIds.count(); batchIdx.count()
      def probe(drop: Int) = graft.operators.Dedup.deltaNearDupFromIndex(
        idx, batchIds, batchIdx, "doc_id", threshold = 0.6,
        hotBucketDrop = drop)
      // warm up on the MITIGATED leg (codegen/JIT are plan-shaped, not
      // drop-shaped); the unmitigated leg is known-pathological, so it
      // runs once timed + once for decisions — its magnitude, not its
      // jitter, is the measurement
      probe(128).write.mode("overwrite").format("noop").save()
      val tDropped = time(probe(128))
      val tUndropped = time(probe(0), n = 1)
      val d0 = probe(0).select("doc_id", "status").as[(Long, String)]
        .collect().toMap
      val d1 = probe(128).select("doc_id", "status").as[(Long, String)]
        .collect().toMap
      val flipped = d0.keys.count(k2 => d0(k2) != d1(k2))
      val flippedNonTpl = d0.keys.count(k2 =>
        d0(k2) != d1(k2) && k2 < 2100000000L)
      println(f"""{"probe":"hot_standing_x$k","sf":"$sfDir","hot_bucket_rows":$hot,"batch_rows":${d0.size},"undropped_sec":$tUndropped%.3f,"dropped_sec":$tDropped%.3f,"ratio":${tUndropped / tDropped}%.2f,"decisions_flipped":$flipped,"flipped_outside_template":$flippedNonTpl}""")
      idx.unpersist(); batchIds.unpersist(); batchIdx.unpersist()
    }

    // --------------------------------------------------------- buckets
    if (sections("buckets")) {
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .select("doc_id", "text")
      def replicate(times: Int): DataFrame =
        if (times == 1) docs
        else docs
          .select(col("*"), explode(sequence(lit(0), lit(times - 1))).as("copy"))
          .select((col("doc_id") * times + col("copy")).as("doc_id"),
            concat_ws(" ", transform(split(col("text"), " "),
              t => when(col("copy") === 0, t)
                .otherwise(concat(t, lit("_"), col("copy"))))).as("text"))
      val microBatch = docs.filter(col("doc_id") % 1000 === 999)
        .select((col("doc_id") + 2000000000L).as("doc_id"), col("text"))
      val microIds = microBatch.select("doc_id").localCheckpoint()
      val microIdx = graft.operators.Dedup.nearDupIndex(
        microBatch, "doc_id", "text", n = 3).localCheckpoint()
      microIds.count(); microIdx.count()
      def storeProbe(path: String): Double =
        time(graft.operators.Dedup.deltaNearDupFromStore(
          spark, path, microIds, microIdx, "doc_id", threshold = 0.6))
      def memProbe(idx: DataFrame): Double =
        time(graft.operators.Dedup.deltaNearDupFromIndex(
          idx, microIds, microIdx, "doc_id", threshold = 0.6))
      def writeStore(idx: DataFrame, bb: Int, ib: Int): String = {
        val p = java.nio.file.Files
          .createTempDirectory("graft_r19_store").toString
        graft.operators.Dedup.writeNearDupIndexStore(idx, p, bands = 32,
          bandBuckets = bb, idBuckets = ib)
        p
      }
      // curve at ×100: the same index, stores at four bucket counts
      val idx100 = graft.operators.Dedup.nearDupIndex(
        replicate(100), "doc_id", "text", n = 3).localCheckpoint()
      val n100 = idx100.count()
      val curve = Seq(64, 512, 2048, 8192).map { bb =>
        val p = writeStore(idx100, bb, math.max(16, bb / 8))
        storeProbe(p) // warmup (listing caches cold)
        val s = storeProbe(p)
        rmTree(p)
        bb -> s
      }
      // crossover with MAINTAINED (recommended) buckets at ×1/×10/×100
      val cross = Seq(1, 10, 100).map { t =>
        val idx = if (t == 100) idx100
          else {
            val i = graft.operators.Dedup.nearDupIndex(
              replicate(t), "doc_id", "text", n = 3).localCheckpoint()
            i.count(); i
          }
        val n = idx.count()
        val (bb, ib) = graft.operators.Dedup.recommendedBucketCounts(n)
        val p = writeStore(idx, bb, ib)
        memProbe(idx) // warmup
        val mem = memProbe(idx)
        storeProbe(p) // warmup
        val st = storeProbe(p)
        rmTree(p)
        if (t != 100) idx.unpersist()
        (t, n, bb, ib, mem, st)
      }
      val curveJson = curve.map { case (bb, s) =>
        f""""$bb":$s%.3f""" }.mkString("{", ",", "}")
      val crossJson = cross.map { case (t, n, bb, ib, mem, st) =>
        f""""x$t":{"rows":$n,"band_buckets":$bb,"id_buckets":$ib,"mem_sec":$mem%.3f,"store_sec":$st%.3f,"store_vs_mem":${st / mem}%.2f}""" }
        .mkString("{", ",", "}")
      println(s"""{"probe":"store_buckets","sf":"$sfDir","x100_rows":$n100,"x100_bucket_curve_sec":$curveJson,"crossover":$crossJson}""")
      idx100.unpersist(); microIds.unpersist(); microIdx.unpersist()
    }

    // ---------------------------------------------------------- parity
    if (sections("parity")) {
      // the StreamingSpec sem-parity SLO measurement (r17: 0.948),
      // re-run at three eviction bounds to attribute the misses
      import java.sql.Timestamp
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val ctx = spark.sqlContext
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val emb = graft.operators.Similarity.hashEmbedRowwise(
          docs, "doc_id", "text")
        .filter(col("embedding").isNotNull).localCheckpoint()
      val corpus = emb.filter(col("doc_id") % 5 =!= 4)
      val batch = emb.filter(col("doc_id") % 5 === 4)
      val idx = graft.operators.Similarity.signatureFrame(corpus, "doc_id",
        "embedding").localCheckpoint()
      val decisions = graft.operators.Similarity.deltaSemNearDup(idx, batch,
          "doc_id", "embedding", threshold = 0.8, rowsPerBand = 8)
        .filter(col("status") =!= "new")
        .select("doc_id", "dup_of").as[(Long, Long)].collect()
      val verified = graft.operators.Similarity.lshNearDupPairs(emb,
          "doc_id", "embedding", threshold = 0.8, rowsPerBand = 12)
        .select("id_a", "id_b").as[(Long, Long)].collect()
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
      val corpusRows = docs.filter(col("doc_id") % 5 =!= 4)
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      val batchRows = docs.filter(col("doc_id") % 5 === 4)
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      def coverage(maxBucket: Int, name: String): (Int, Double) = {
        val in = MemoryStream[(Long, Timestamp, String)]
        val df = in.toDF().toDF("doc_id", "ts", "text")
        val q = graft.streaming.NearDupStream.semanticCandidates(df,
            maxBucket = maxBucket)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          (corpusRows.grouped(500).toSeq ++ batchRows.grouped(500).toSeq)
            .zipWithIndex.foreach { case (chunk, i) =>
              in.addData(chunk.map { case (id, t) =>
                (id, new Timestamp(1000000L + i * 1000L), t) })
              q.processAllAvailable()
            }
          val cands = spark.table(name)
            .select("doc_id", "prior_id").as[(Long, Long)].collect()
            .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
          val covered = decisions.count { case (d, _) =>
            cands.getOrElse(d, Set.empty[Long]).exists(p =>
              verified.contains((math.min(d, p), math.max(d, p)))) }
          (covered, covered.toDouble / decisions.length)
        } finally q.stop()
      }
      // an UNBOUNDED sweep leg is not runnable: a hot bucket of m
      // members emits O(m²) candidates and maxBucket=∞ OOM'd the JVM —
      // the eviction bound is precisely what keeps the stream path
      // alive, so the attribution sweeps bounded values — ONE value per
      // JVM via SPARK_GRAFT_R19_MAXBUCKET (the default is a single
      // value for the same reason: the memory-sink candidate tables of
      // a multi-value sweep accumulate heap in one run)
      val mbs = sys.env.getOrElse("SPARK_GRAFT_R19_MAXBUCKET", "64")
        .split(",").map(_.trim.toInt).toSeq
      val sweep = mbs.map { mb =>
        val (cov, r) = coverage(mb, s"par$mb")
        spark.catalog.dropTempView(s"par$mb")
        f""""maxBucket_$mb":{"covered":$cov,"coverage":$r%.4f}"""
      }
      println(s"""{"probe":"sem_parity_attribution","sf":"$sfDir","flagged":${decisions.length},${sweep.mkString(",")}}""")
      idx.unpersist(); emb.unpersist()
    }

    spark.stop()
  }
}
