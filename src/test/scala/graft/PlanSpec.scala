package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Physical-plan regression guards: the scale claims in the dedup
  * scaladocs — "the hot path collapses to nothing when no bucket is
  * hot", "the index is scanned exactly census + small-path times" —
  * are asserted against the FINAL adaptive plan here instead of staying
  * unverified prose. A regression that silently reintroduces a full
  * third scan or a join in the steady-state path fails this suite, not
  * just the benchmark.
  */
class PlanSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  /** Execute and return every node of the final adaptive plan,
    * recursing through materialized query stages but NOT into reused
    * exchanges (their subtree executed once under the original node).
    */
  private def finalNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: QueryStageExec        => q +: walk(q.plan)
      case _: ReusedExchangeExec    => Seq(p)
      case _                        => p +: p.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def names(nodes: Seq[SparkPlan]): Seq[String] = nodes.map(_.nodeName)

  private lazy val indexPath: String = {
    val dir = Files.createTempDirectory("graft_plan_idx").toString
    Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"))
      .toDF("id", "g").write.mode("overwrite").parquet(dir)
    dir
  }

  test("no-hot-bucket candidatePairs: hot subtree collapses, no join, 1 index scan") {
    val index = spark.read.parquet(indexPath)
    val nodes = names(finalNodes(Dedup.candidatePairs(index, Seq("g"))))
    val joins = nodes.filter(_.contains("Join"))
    assert(joins.isEmpty,
      s"steady-state plan should contain no join at all (AQE collapses the " +
        s"broadcast anti/semi joins against the empty hot-key set); got $joins")
    // once AQE collapses both joins, the FINAL tree is exactly the
    // pre-census shape: one index scan feeding the bucket aggregate (the
    // census's own scan ran inside the already-materialized broadcast
    // stage, which leaves the final tree with the joins)
    val scans = nodes.count(_.startsWith("Scan parquet"))
    assert(scans == 1,
      s"expected exactly 1 index scan in the steady-state final plan, " +
        s"got $scans in $nodes")
  }

  test("all-hot candidatePairs (cap=1): pair join present, hot keys broadcast") {
    val index = spark.read.parquet(indexPath)
    val nodes = names(finalNodes(Dedup.candidatePairs(index, Seq("g"), cap = 1)))
    assert(nodes.exists(_.contains("Join")),
      s"hot path must enumerate pairs through a join; got $nodes")
    assert(nodes.exists(n => n.contains("BroadcastQueryStage") ||
        n.contains("BroadcastExchange")),
      s"hot-key set must reach the index sides via broadcast; got $nodes")
  }

  test("near-dup queries reuse one materialized shingle exchange") {
    // the shingle frame feeds the index, census and both verify sides;
    // the repartition(id) pin must manifest as ReusedExchange nodes, or
    // every consumer is re-running the shingling pipeline
    Seq("q21_ngram_jaccard", "q22_minhash_neardup")
      .foreach { name =>
        val nodes = names(finalNodes(SparkEntry.queries(name)(spark, sf)))
        assert(nodes.exists(_.contains("ReusedExchange")),
          s"$name: no ReusedExchange in final plan — the shared frame is " +
            "recomputed per consumer")
      }
    // q37 consumes the SharedFrames memo (localCheckpoint), so its
    // consumer plan starts from the materialized RDD — the exchange
    // reuse lives inside the one-time build; the BUILD plan keeps the
    // pinned-frame guarantee
    val buildNodes = names(finalNodes(Similarity.lshNearDupPairs(
      Tables.embeddings(spark, sf), "vec_id", "embedding", threshold = 0.4)))
    assert(buildNodes.exists(_.contains("ReusedExchange")),
      s"lshNearDupPairs build: no ReusedExchange — the widened embedding " +
        s"frame is recomputed per consumer side; got $buildNodes")
    val q37Nodes = names(finalNodes(
      SparkEntry.queries("q37_ann_lsh_pairs")(spark, sf)))
    assert(q37Nodes.exists(_.contains("Scan ExistingRDD")),
      s"q37 must read the shared checkpointed pair frame; got $q37Nodes")
  }

  test("q140 containment plan: one documents scan, shingle exchange reused") {
    val nodes = names(finalNodes(
      SparkEntry.queries("q140_containment_pairs")(spark, sf)))
    val scans = nodes.count(_.startsWith("Scan parquet"))
    assert(scans == 1,
      s"containment must scan documents once (index + both verify sides " +
        s"share the pinned shingle exchange), got $scans")
    assert(nodes.exists(_.contains("ReusedExchange")),
      s"pinned shingle frame not reused; got $nodes")
    assert(!nodes.exists(n => n.contains("CartesianProduct") ||
        n.contains("BroadcastNestedLoop")),
      s"no all-pairs path allowed; got $nodes")
  }

  test("q135 debias plan: pure narrow projection — no exchange, no join") {
    // the model (mean + top component) is collected driver-side by
    // construction; the debias itself must stay a single narrow pass so
    // it pipelines into downstream consumers at any scale
    val nodes = names(finalNodes(Similarity.debiasTopComponent(
      Tables.embeddings(spark, sf), "vec_id", "embedding", dim = 64)))
    assert(!nodes.exists(n => n.contains("Exchange") || n.contains("Join")),
      s"debias must be narrow (no exchange/join); got $nodes")
    val scans = nodes.count(_.startsWith("Scan parquet"))
    assert(scans == 1, s"debias must scan embeddings once, got $scans in $nodes")
  }

  test("q136 hubness plan: broadcast queries, rank-limited window") {
    val emb = Tables.embeddings(spark, sf)
    val nodes = names(finalNodes(Similarity.hubness(emb, "vec_id",
      "embedding", emb.filter(col("vec_id") < 8), "vec_id", k = 10)))
    assert(nodes.exists(n => n.contains("BroadcastExchange") ||
        n.contains("BroadcastQueryStage")),
      s"query batch must broadcast; got $nodes")
    assert(nodes.exists(_.contains("WindowGroupLimit")),
      s"top-k must plan as WindowGroupLimit (k-heap per query, not a " +
        s"full sort of the fanout); got $nodes")
  }

  test("q34 plan: signature frame materialized once (ReusedExchange)") {
    val nodes = names(finalNodes(SparkEntry.queries("q34_simhash_neardup")(spark, sf)))
    assert(nodes.exists(_.contains("ReusedExchange")),
      s"signature exchange not reused — the 60-sum aggregate runs per consumer; got $nodes")
  }

  test("q38 as-of plan: no join operator, filters pushed to both scans") {
    val nodes = finalNodes(SparkEntry.queries("q38_asof_join")(spark, sf))
    val joins = names(nodes).filter(_.contains("Join"))
    assert(joins.isEmpty,
      s"as-of must run as union+window (sort-merge), never a join; got $joins")
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(_.metadata("PushedFilters").contains("EqualTo")),
      "event_type filters must reach the parquet scans")
  }

  test("q39 interval plan: no nested-loop/cartesian join, session frame reused") {
    val nodes = names(finalNodes(SparkEntry.queries("q39_interval_overlap")(spark, sf)))
    assert(!nodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
      s"overlap join must be the binned equi-join, got $nodes")
    assert(nodes.exists(_.contains("ReusedExchange")),
      s"both interval sides must share one materialized session frame; got $nodes")
  }

  test("q42 tf-idf plan: corpus tokenized once, top-k via WindowGroupLimit") {
    val nodes = finalNodes(SparkEntry.queries("q42_tfidf_topterms")(spark, sf))
    // one data scan of documents (the n_docs count scan reads zero columns)
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(dataScans.size == 1,
      s"expected a single tokenizing scan of documents, got ${dataScans.size}")
    assert(names(nodes).exists(_.contains("WindowGroupLimit")),
      "per-doc top-k must prune through WindowGroupLimit before the shuffle")
  }

  test("q21 plan: shingle filter is pushed into the documents scan") {
    val q = SparkEntry.queries("q21_ngram_jaccard")(spark, sf)
    val scans = finalNodes(q).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // every documents scan must read only the columns the query needs
    scans.foreach { s =>
      val cols = s.schema.fieldNames.toSet
      assert(cols.subsetOf(Set("doc_id", "text")),
        s"scan reads more than it needs: $cols")
    }
  }

  test("q64 cross-entropy plan: one tokenizing scan, pinned tf exchange reused") {
    val nodes = finalNodes(SparkEntry.queries("q64_cross_entropy")(spark, sf))
    // the grand-total branch must aggregate the same pinned (doc, term)
    // exchange the corpus-count window consumes — not re-scan the text
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(dataScans.size == 1,
      s"expected a single tokenizing scan of documents, got ${dataScans.size}")
    assert(names(nodes).exists(_.contains("ReusedExchange")),
      s"total-tokens aggregate must reuse the tf exchange; got ${names(nodes)}")
  }

  test("q66 scrub plan: narrow — no join, no aggregate, one events scan") {
    val nodes = names(finalNodes(SparkEntry.queries("q66_payload_scrub")(spark, sf)))
    assert(!nodes.exists(n => n.contains("Join") || n.contains("Aggregate")),
      s"scrub must stay a per-row projection; got $nodes")
  }

  test("q72 profile plan: one scan feeds every per-column distinct (Expand)") {
    val nodes = finalNodes(SparkEntry.queries("q72_table_profile")(spark, sf))
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(dataScans.size == 1,
      s"profiling must not scan once per column; got ${dataScans.size} scans")
    assert(names(nodes).exists(_.contains("Expand")),
      s"multi-distinct must plan through Expand; got ${names(nodes)}")
  }

  test("q68 keep-list plan: no cartesian/nested-loop anywhere") {
    val nodes = names(finalNodes(SparkEntry.queries("q68_dedup_keeplist")(spark, sf)))
    assert(!nodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
      s"pairs + components + election must all be equi-joins/windows; got $nodes")
  }

  test("q99 semdedup plan: in-row cell assignment, no cartesian/nested-loop") {
    val nodes = names(finalNodes(SparkEntry.queries("q99_semdedup")(spark, sf)))
    assert(!nodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
      s"assignment is an in-row argmax and pairs/components/election are " +
        s"equi-joins/windows; got $nodes")
  }

  test("q104 image near-dup plan: pinned signature exchange reused, no cartesian") {
    val nodes = names(finalNodes(SparkEntry.queries("q104_image_neardup")(spark, sf)))
    assert(nodes.contains("ReusedExchange"),
      s"the hash frame feeds the blocked index and both verify joins " +
        s"through one pinned exchange; got $nodes")
    assert(!nodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
      s"pigeonhole + verify must stay equi-join only; got $nodes")
  }

  test("q167 delta near-dup plan: corpus side from the index, no re-banding") {
    // the standing corpus is represented by the checkpointed
    // nearDupIndex frame — the delta plan must shingle/band only the
    // INCOMING batch: exactly one text-reading scan, the corpus side
    // entering as RDD scans of the materialized index
    val nodes = finalNodes(SparkEntry.queries("q167_delta_neardup")(spark, sf))
    val textScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.fieldNames.contains("text") => f
    }
    assert(textScans.size == 1,
      s"only the incoming batch may be re-shingled; got ${textScans.size} " +
        "text scans")
    assert(names(nodes).exists(_.contains("ExistingRDD")),
      s"corpus side must come from the checkpointed index; got ${names(nodes)}")
    assert(!names(nodes).exists(n =>
        n.contains("NestedLoop") || n.contains("Cartesian")),
      s"delta path must stay equi-join only; got ${names(nodes)}")
  }

  test("q177 admit-then-probe plan: batch B is the only re-shingled text") {
    // the two-batch sequence persists everything a pipeline persists:
    // corpus index, batch A decisions, and the GROWN index are all
    // checkpointed, so the only text-reading file scans left are batch
    // B's own (its banding and verify legs — ≤ 2, batch-sized, and both
    // carrying B's partition predicate); every standing-corpus and
    // batch-A byte enters as a materialized RDD
    val nodes = finalNodes(
      SparkEntry.queries("q177_admit_probe_neardup")(spark, sf))
    val textScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.fieldNames.contains("text") => f
    }
    assert(textScans.nonEmpty && textScans.size <= 2,
      s"only batch B's own legs may read text; got ${textScans.size} scans")
    assert(textScans.forall(_.toString.contains("% 5) = 4")),
      s"every text scan must be batch-B-filtered (doc_id % 5 = 4); got\n" +
        textScans.map(_.toString.take(200)).mkString("\n"))
    assert(names(nodes).exists(_.contains("ExistingRDD")),
      s"index + batch-A decisions must come from checkpoints; got " +
        s"${names(nodes)}")
    assert(!names(nodes).exists(n =>
        n.contains("NestedLoop") || n.contains("Cartesian")),
      s"admit-then-probe must stay equi-join only; got ${names(nodes)}")
  }

  test("q173 delta sem near-dup plan: corpus from the index, no re-signature") {
    // the standing corpus is its checkpointed signatureFrame and the
    // batch signatures are materialized once inside the operator, so
    // the classification plan must contain NO embedding-reading file
    // scan at all: the index frame carries no raw `embedding` column,
    // so any corpus-sided signature recompute would necessarily surface
    // as an embeddings FileScan here
    val nodes = finalNodes(SparkEntry.queries("q173_delta_sem_neardup")(spark, sf))
    val embScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.fieldNames.contains("embedding") => f
    }
    assert(embScans.isEmpty,
      s"both sides enter as materialized signature frames; got " +
        s"${embScans.size} embedding scans")
    assert(names(nodes).exists(_.contains("ExistingRDD")),
      s"corpus side must come from the checkpointed index; got ${names(nodes)}")
    assert(!names(nodes).exists(n =>
        n.contains("NestedLoop") || n.contains("Cartesian")),
      s"delta path must stay equi-join only; got ${names(nodes)}")
  }

  test("q180 semantic admit-then-probe plan: zero embedding rescan") {
    // the two-batch sequence persists everything a pipeline persists:
    // corpus signatureFrame, batch A's signature rows + decisions, the
    // GROWN frame, and batch B's signatures (materialized inside the
    // operator) — so the final plan reads embedding BYTES nowhere: the
    // only file scans left are id-column probes (batch B's id universe),
    // and any corpus/batch-A signature recompute would surface as an
    // embedding FileScan here
    val nodes = finalNodes(
      SparkEntry.queries("q180_admit_probe_sem_neardup")(spark, sf))
    val embScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.fieldNames.contains("embedding") => f
    }
    assert(embScans.isEmpty,
      s"corpus, batch A, and batch B vectors all enter as materialized " +
        s"signature frames; got ${embScans.size} embedding scans")
    val fileScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(fileScans.forall(f => f.schema.fieldNames.sameElements(
        Array("vec_id")) && f.toString.contains("% 5) = 4")),
      s"only batch B's id-universe probe may touch the file; got\n" +
        fileScans.map(_.toString.take(200)).mkString("\n"))
    assert(names(nodes).exists(_.contains("ExistingRDD")),
      s"standing frame + batch A must come from checkpoints; got " +
        s"${names(nodes)}")
    assert(!names(nodes).exists(n =>
        n.contains("NestedLoop") || n.contains("Cartesian")),
      s"semantic admit-then-probe must stay equi-join only; got " +
        s"${names(nodes)}")
  }

  test("q81 duplicated-spans plan: one tokenizing scan, df via window on the tf frame") {
    val nodes = finalNodes(SparkEntry.queries("q81_duplicated_spans")(spark, sf))
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(dataScans.size == 1,
      s"expected a single tokenizing scan of documents, got ${dataScans.size}")
    assert(!names(nodes).exists(_.contains("Join")),
      s"document frequency must come from a window, not a join; " +
        s"got ${names(nodes)}")
  }

  test("q73 contamination plan: bench grams broadcast, corpus never shuffled wide") {
    val nodes = finalNodes(SparkEntry.queries("q73_contamination_score")(spark, sf))
    val ns = names(nodes)
    assert(ns.exists(_.contains("BroadcastHashJoin")),
      s"benchmark gram set must broadcast; got $ns")
    // the only sort-merge-join-shaped shuffle allowed is none: corpus rows
    // reach the per-doc aggregate keyed by id, never joined by shuffle
    assert(!ns.exists(_.contains("SortMergeJoin")),
      s"corpus side must not shuffle-join; got $ns")
  }

  test("q77 bpe plan: pair census runs on the distinct-word frame, one scan") {
    val nodes = finalNodes(SparkEntry.queries("q77_bpe_pairs")(spark, sf))
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(dataScans.size == 1,
      s"expected one tokenizing scan of documents, got ${dataScans.size}")
    // top-k must be a TakeOrderedAndProject (per-partition heaps), not a
    // global sort + limit
    assert(names(nodes).exists(_.contains("TakeOrderedAndProject")),
      s"top-k must plan as TakeOrderedAndProject; got ${names(nodes)}")
  }

  test("q78 batch top-k plan: queries broadcast, per-query WindowGroupLimit") {
    val nodes = names(finalNodes(SparkEntry.queries("q78_batch_topk")(spark, sf)))
    assert(nodes.exists(_.contains("BroadcastNestedLoopJoin")) ||
           nodes.exists(_.contains("BroadcastHashJoin")),
      s"query sample must broadcast (corpus side stays local); got $nodes")
    assert(nodes.exists(_.contains("WindowGroupLimit")),
      s"per-query top-k must prune through WindowGroupLimit; got $nodes")
  }

  test("q82 source-overlap plan: the distinct key index materializes once") {
    val nodes = finalNodes(SparkEntry.queries("q82_source_overlap")(spark, sf))
    // the (source, key) distinct feeds four consumers (sizes twice, both
    // self-join sides); its exchange subtree is identical in each, so
    // ReusedExchange must collapse them to ONE corpus tokenize+scan
    val textScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.fieldNames.contains("text") => f
    }
    assert(textScans.size == 1,
      s"expected one tokenizing scan of documents, got ${textScans.size}")
    assert(names(nodes).exists(_.contains("ReusedExchange")),
      s"distinct key index must be reused, not recomputed; got ${names(nodes)}")
  }

  test("q84 ivf batch plan: probe cells broadcast, per-query WindowGroupLimit") {
    val nodes = names(finalNodes(SparkEntry.queries("q84_ann_ivf_batch")(spark, sf)))
    assert(nodes.exists(_.contains("BroadcastHashJoin")),
      s"probe table must broadcast-join the cell-assigned corpus; got $nodes")
    assert(nodes.exists(_.contains("WindowGroupLimit")),
      s"per-query top-k must prune through WindowGroupLimit; got $nodes")
    assert(!nodes.exists(n => n.contains("SortMergeJoin") || n.contains("Cartesian")),
      s"no corpus-wide shuffle join allowed; got $nodes")
  }

  test("q85 curation pass plan: one corpus scan, no shuffle join, no aggregate") {
    val nodes = finalNodes(SparkEntry.queries("q85_curation_pass")(spark, sf))
    val ns = names(nodes)
    // the only join allowed is the broadcast of the one-row benchmark
    // gram array; the corpus side must stay a narrow projection
    assert(!ns.exists(_.contains("SortMergeJoin")),
      s"corpus must not shuffle-join; got $ns")
    val corpusScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.fieldNames.contains("text") => f
    }
    // two text scans: one for the corpus rows, one for the benchmark
    // gram aggregate — never more (no re-scan per stage)
    assert(corpusScans.size <= 2,
      s"expected at most corpus + benchmark text scans, got ${corpusScans.size}")
  }

  test("pq code assignment plan: narrow — no join, no exchange, one scan") {
    // the codebook is a plan CONSTANT (baked into the PqAssign
    // expression), so assignment must never join or shuffle — a
    // regression to a broadcast-centroid join would show here
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val cb = graft.operators.Similarity.pqCodebook(emb, "vec_id", "embedding")
    val nodes = finalNodes(emb.select(col("vec_id"),
      graft.expressions.PqAssign(col("embedding"), cb).as("codes")))
    val ns = names(nodes)
    assert(!ns.exists(_.contains("Join")), s"assignment must not join: $ns")
    assert(!ns.exists(_.contains("Exchange")),
      s"assignment must not shuffle: $ns")
    assert(ns.count(_.startsWith("Scan parquet")) == 1,
      s"assignment is one narrow pass over one scan: $ns")
  }

  test("q31 multimodal decode plan: narrow — no join, no exchange") {
    // pack + parse are both expressions over the row — the decode path
    // must stay a partition-preserving projection (no RDD drop-out, no
    // shuffle); the presentation orderBy is the only allowed exchange
    val packed = graft.operators.Multimodal.packBmp(
      graft.sources.Tables.documents(spark, sf), "doc_id", "text")
    val nodes = finalNodes(
      graft.operators.Multimodal.decodeImageFeatures(packed, "doc_id"))
    val ns = names(nodes)
    assert(!ns.exists(_.contains("Join")) && !ns.exists(_.contains("Exchange")),
      s"decode must be a narrow projection: $ns")
    assert(ns.count(_.startsWith("Scan parquet")) == 1,
      s"decode reads the documents scan once: $ns")
  }

  test("q93 excision plan: one tokenize reused, no cartesian/nested-loop") {
    // the occurrence stream and the token stream must share the single
    // pinned tokenize exchange — a diverged subtree would re-split the
    // whole corpus per consumer
    val nodes = finalNodes(SparkEntry.queries("q93_span_excision")(spark, sf))
    val ns = names(nodes)
    assert(!ns.exists(n => n.contains("Cartesian") || n.contains("NestedLoop")),
      s"excision must stay equi-join only: $ns")
    assert(ns.exists(_.contains("ReusedExchange")),
      s"tokenize exchange must be reused between occurrence and token " +
        s"streams: $ns")
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size <= 1, s"one documents scan expected, got ${scans.size}")
  }

  test("q95 decontam-excision plan: bench grams broadcast, no gram shuffle join") {
    val nodes = finalNodes(SparkEntry.queries("q95_decontam_excision")(spark, sf))
    val ns = names(nodes)
    assert(!ns.exists(n => n.contains("Cartesian") || n.contains("NestedLoop")),
      s"excision must stay equi-join only: $ns")
    // the gram membership test must be the broadcast semi-join — a
    // sort-merge join on the gram key would shuffle the corpus-side
    // occurrence stream wide
    val smj = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(!smj.exists(_.joinType.toString.contains("Semi")),
      s"bench grams must broadcast, not shuffle: $ns")
  }

  test("q97 dsir plan: corpus tokenized once, raw total reuses the pinned exchange") {
    val nodes = finalNodes(SparkEntry.queries("q97_dsir_weights")(spark, sf))
    val ns = names(nodes)
    // one tokenizing scan (the (doc, bucket) frame) + one narrow id scan
    // for the zero-gram left join; the target model was collected at
    // build time (≤ buckets rows — a model, not data) and is inlined
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(dataScans.size == 2,
      s"expected tokenize + id-list scans only, got ${dataScans.size}: $ns")
    // the corpus total must read the bucket-pinned exchange, not re-run
    // the tokenize subtree (column pruning split the plan into four
    // corpus scans before the frame was pinned)
    assert(ns.contains("ReusedExchange"),
      s"raw total must reuse the pinned (doc, bucket) exchange; got $ns")
    assert(!ns.exists(_.contains("SortMergeJoin")),
      s"bucket models are bounded — every join must broadcast; got $ns")
  }

  test("q101 bm25 plan: corpus tokenized once, broadcast-only joins, WindowGroupLimit") {
    val nodes = finalNodes(SparkEntry.queries("q101_bm25_topk")(spark, sf))
    val ns = names(nodes)
    // corpus tokenize + query tokenize — the (doc, term, tf) frame is
    // pinned on a term exchange and the totals aggregate reuses it
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(dataScans.size == 2,
      s"expected corpus + query tokenizing scans only, got ${dataScans.size}: $ns")
    assert(ns.contains("ReusedExchange"),
      s"corpus totals must reuse the pinned tf exchange; got $ns")
    assert(!ns.exists(_.contains("SortMergeJoin")),
      s"query terms and totals broadcast — no shuffle join; got $ns")
    assert(ns.exists(_.contains("WindowGroupLimit")),
      s"per-query top-k must prune through WindowGroupLimit; got $ns")
  }

  test("q108 ewma plan: one key exchange, no join, codegen'd fold") {
    val nodes = finalNodes(SparkEntry.queries("q108_ewma_smooth")(spark, sf))
    val ns = names(nodes)
    assert(!ns.exists(_.contains("Join")),
      s"smoothing is one windowed pass — no join allowed; got $ns")
    // one hash exchange for the series key + the presentation range sort
    val hashEx = nodes.count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
      case _ => false
    }
    assert(hashEx == 1,
      s"exactly one key shuffle expected, got $hashEx in $ns")
    // the fold is a codegen Expression, not an interpreted HOF: the
    // projection above the window must sit inside a WholeStageCodegen span
    assert(ns.exists(_.contains("WholeStageCodegen")),
      s"EwmaFold projection must stay codegen'd; got $ns")
  }

  test("q110 contrastive plan: anchors broadcast, k=1 WindowGroupLimit") {
    val nodes = names(finalNodes(
      SparkEntry.queries("q110_contrastive_pairs")(spark, sf)))
    assert(nodes.exists(n => n.contains("BroadcastNestedLoopJoin") ||
        n.contains("BroadcastHashJoin")),
      s"anchor batch must broadcast (corpus side stays local); got $nodes")
    assert(nodes.exists(_.contains("WindowGroupLimit")),
      s"per-(anchor, side) best row must prune via WindowGroupLimit; got $nodes")
    assert(!nodes.exists(n => n.contains("SortMergeJoin") ||
        n.contains("CartesianProduct")),
      s"no corpus-wide shuffle/cartesian join allowed; got $nodes")
  }

  test("q111 mmr plan: candidate fetch is broadcast, no per-step shuffle") {
    val nodes = finalNodes(SparkEntry.queries("q111_mmr_rerank")(spark, sf))
    val ns = names(nodes)
    assert(ns.exists(_.contains("BroadcastHashJoin")),
      s"candidate frame must broadcast into the vector fetch; got $ns")
    assert(!ns.exists(n => n.contains("SortMergeJoin") ||
        n.contains("CartesianProduct")),
      s"greedy steps run in-row — no shuffle join allowed; got $ns")
    // 3 scans by construction: topKBatch's corpus scan + its broadcast
    // query sample + the candidate-vector fetch; the greedy loop itself
    // must NOT add any more
    val scans = nodes.count {
      case _: org.apache.spark.sql.execution.FileSourceScanExec => true
      case _ => false
    }
    assert(scans == 3, s"expected exactly 3 scans, got $scans in $ns")
  }

  test("q114 prototypicality plan: no join, one key exchange, codegen'd") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val nodes = finalNodes(graft.operators.Similarity.prototypicality(
      emb, "vec_id", "embedding", keepFrac = 0.7, nCells = 8))
    val ns = names(nodes)
    assert(!ns.exists(_.contains("Join")),
      s"cell assignment is an in-row argmax over the inlined model — no " +
        s"join allowed; got $ns")
    val hashEx = nodes.count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
      case _ => false
    }
    assert(hashEx == 1,
      s"exactly the cell-window shuffle expected, got $hashEx in $ns")
    val scans = nodes.count {
      case _: org.apache.spark.sql.execution.FileSourceScanExec => true
      case _ => false
    }
    assert(scans == 1, s"one corpus scan expected, got $scans in $ns")
  }

  test("winnowFingerprints plan: narrow — no join, no exchange, one scan") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val nodes = finalNodes(
      Dedup.winnowFingerprints(docs, "doc_id", "text"))
    val ns = names(nodes)
    assert(!ns.exists(_.contains("Join")), s"no join allowed; got $ns")
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      s"fingerprint selection is purely narrow; got $ns")
    assert(ns.exists(_.contains("WholeStageCodegen")),
      s"the winnow kernel must stay inside a codegen span; got $ns")
  }

  test("q119 jsd plan: shared-term equi-join only, pair matrix broadcast") {
    val nodes = names(finalNodes(
      SparkEntry.queries("q119_source_jsd")(spark, sf)))
    assert(!nodes.exists(_.contains("CartesianProduct")),
      s"the only product is the broadcast source-pair matrix; got $nodes")
    assert(nodes.exists(n => n.contains("BroadcastNestedLoopJoin") ||
        n.contains("BroadcastHashJoin")),
      s"pair matrix / pair lookup must ride broadcast joins; got $nodes")
  }

  test("meanPool plan: no join, two keyed aggregates only") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(expr("vec_id div 10").as("grp"), col("vec_id"),
        col("embedding"))
    val nodes = finalNodes(
      graft.operators.Similarity.meanPool(emb, "grp", "embedding", "vec_id"))
    val ns = names(nodes)
    assert(!ns.exists(_.contains("Join")), s"no join allowed; got $ns")
    val hashEx = nodes.count {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
      case _ => false
    }
    assert(hashEx == 2,
      s"(group, dim) + group aggregates — exactly two key shuffles, " +
        s"got $hashEx in $ns")
  }

  test("shardAssign plan: exactly one exchange (the shard key shuffle)") {
    // the operator itself (q75 adds a presentation orderBy, which is a
    // second, range exchange by design)
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id")
    val nodes = finalNodes(
      graft.operators.Curation.shardAssign(docs, "doc_id", 8))
    val exchanges = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(exchanges == 1,
      s"shard assignment must shuffle once on the shard key, got $exchanges " +
        s"in ${names(nodes)}")
  }

  test("q142 sq8 plan: one corpus pass per side, WindowGroupLimit k-heap") {
    // the [min,max] model is collected before the plan is built, so the
    // retrieval plan itself must be topKBatch-shaped: corpus scan +
    // broadcast queries + rank-limited window — no stats join
    val nodes = finalNodes(SparkEntry.queries("q142_sq8_recall")(spark, sf))
    val ns = names(nodes)
    assert(ns.exists(_.contains("WindowGroupLimit")),
      s"per-query top-k must plan as WindowGroupLimit; got $ns")
    assert(!ns.exists(n => n.contains("NestedLoop") && !n.contains("Broadcast")),
      s"only broadcast query fanout allowed; got $ns")
    assert(!ns.exists(_.contains("SortMergeJoin")),
      s"no shuffled join belongs in the sq8 retrieval plan; got $ns")
  }

  test("q143 cdc plan: one documents scan, chunk ids stay in the id shuffle") {
    val nodes = finalNodes(SparkEntry.queries("q143_cdc_chunk_dedup")(spark, sf))
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(dataScans.size == 1,
      s"CDC census must tokenize documents once, got ${dataScans.size}")
    assert(!names(nodes).exists(_.contains("Join")),
      s"chunking + dup marking are windows/aggregates, never a join; " +
        s"got ${names(nodes)}")
  }

  test("q146 hash-embed plan: one scan, no join, two keyed aggregates") {
    val nodes = finalNodes(SparkEntry.queries("q146_hash_embed")(spark, sf))
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(dataScans.size == 1,
      s"hash-embed must tokenize documents once, got ${dataScans.size}")
    assert(!names(nodes).exists(_.contains("Join")),
      s"hashing-trick embedding is aggregate-only; got ${names(nodes)}")
  }

  test("q148 log-odds plan: one tokenizing scan, pinned term exchange reused") {
    // the q64/q144 discipline on three consumers: the corpus-count
    // window, the stratum totals and the (N, V) scalars must all ride
    // one tokenize
    val nodes = finalNodes(SparkEntry.queries("q148_log_odds_terms")(spark, sf))
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(dataScans.size == 1,
      s"expected a single tokenizing scan, got ${dataScans.size}")
    assert(names(nodes).count(_.contains("ReusedExchange")) >= 2,
      s"stratum-total and N/V branches must reuse the pinned term " +
        s"exchange; got ${names(nodes)}")
  }

  test("q149 sketch plan: corpus touched by the distinct only, no corpus join") {
    // everything after the (source, hv) distinct runs on S·k synopsis
    // rows; the pair joins must all be against broadcast (tiny) sides
    val nodes = finalNodes(
      SparkEntry.queries("q149_source_overlap_sketch")(spark, sf))
    val ns = names(nodes)
    val smj = ns.count(_.contains("SortMergeJoin"))
    assert(smj == 0,
      s"pair estimation must never shuffle-join corpus-sized frames; " +
        s"got $smj SortMergeJoins in $ns")
    assert(ns.exists(_.contains("WindowGroupLimit")),
      s"the per-source k-cut must plan as WindowGroupLimit; got $ns")
  }

  test("q154 semantic-text pairs plan: banded equi-join, no nested loop") {
    val nodes = names(
      finalNodes(SparkEntry.queries("q154_semantic_text_pairs")(spark, sf)))
    assert(!nodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
      s"candidates must come from the band equi-join, never all-pairs; " +
        s"got $nodes")
    assert(nodes.exists(_.contains("Join")),
      s"the banded candidate join must exist; got $nodes")
    // the tokenize + hash-embed + 128-plane signature pass is the shared
    // checkpointed frame (hashEmbSignatures) — read back, not re-derived
    assert(nodes.exists(_.contains("Scan ExistingRDD")),
      s"q154 must read the shared signature frame; got $nodes")
  }

  test("q155 jpeg plan: narrow codegen'd parse — no join, sort-only exchange") {
    // pack + marker-walk decode is one projection over one scan; the
    // only exchange allowed is the final presentation sort's range
    // partitioning
    val nodes = finalNodes(SparkEntry.queries("q155_jpeg_features")(spark, sf))
    val ns = names(nodes)
    assert(!ns.exists(_.contains("Join")),
      s"jpeg decode must not join: $ns")
    assert(ns.count(_.startsWith("Scan parquet")) == 1,
      s"one documents scan: $ns")
    assert(nodes.count(n => n.nodeName.contains("Exchange") &&
        !n.nodeName.contains("Reused")) <= 1,
      s"only the output sort may exchange: $ns")
  }

  test("q156 multi-probe plan: probe-key equi-join only, no nested loop") {
    // candidates come from the probe-key = index-key equi-join (the
    // oracle's all-pairs form is its prerogative, never the engine's)
    val nodes = names(
      finalNodes(SparkEntry.queries("q156_mplsh_pairs")(spark, sf)))
    assert(!nodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
      s"multi-probe candidates must come from the key equi-join: $nodes")
    assert(nodes.exists(_.contains("Join")),
      s"the probe-key join must exist; got $nodes")
    // the 128-plane signature pass is the shared checkpointed frame
    // (embSignatures, also feeding q37/q69) — read back, not re-derived
    assert(nodes.exists(_.contains("Scan ExistingRDD")),
      s"q156 must read the shared signature frame; got $nodes")
  }

  test("q160 auto-composite plan: probe-key equi-join, shared sig frame") {
    // the deployment default resolves 12-bit multi-probe on this corpus
    // (drift guard pins the resolution); its plan must look like q156's:
    // candidates from the probe-key equi-join, never all-pairs, reading
    // the shared signature frame back instead of re-deriving it
    val nodes = names(
      finalNodes(SparkEntry.queries("q160_neardup_auto")(spark, sf)))
    assert(!nodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
      s"auto-composite candidates must come from the key equi-join: $nodes")
    assert(nodes.exists(_.contains("Join")),
      s"the probe-key join must exist; got $nodes")
    assert(nodes.exists(_.contains("Scan ExistingRDD")),
      s"q160 must read the shared signature frame; got $nodes")
  }

  test("q157 rarity-prefix plan: df join is an equi-join, no nested loop") {
    // the rarity order pays a df aggregate + shingle-keyed equi-join —
    // never a broadcast of the corpus-sized df table, never all-pairs
    val nodes = finalNodes(SparkEntry.queries("q157_prefix_rarity")(spark, sf))
    val ns = names(nodes)
    assert(!ns.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
      s"rarity prefix must stay equi-join only: $ns")
    assert(ns.exists(_.contains("Join")), s"the df join must exist: $ns")
  }

  test("q158/q159 cluster-mixture plans: in-row argmax, broadcast weights only") {
    // the cell assignment is a k-row-literal argmax — nothing may grow
    // with the corpus but the strata aggregate (q158) and the broadcast
    // weights join + copy fanout (q159). The BroadcastNestedLoopJoins
    // in these plans are temperatureWeights' single-row scalar crosses
    // (total tokens, order-pinned normalizer) — broadcast by
    // construction; what must never appear is an UNBROADCAST nested
    // loop / cartesian or a shuffled corpus-side join
    for (name <- Seq("q158_cluster_mixture", "q159_cluster_mixture_apply",
        "q161_cluster_mixture_trained")) {
      val ns = names(finalNodes(SparkEntry.queries(name)(spark, sf)))
      assert(!ns.exists(n =>
          (n.contains("NestedLoop") && !n.contains("Broadcast")) ||
            n.contains("Cartesian")),
        s"$name must not build corpus-growing joins: $ns")
      assert(!ns.exists(_.contains("SortMergeJoin")),
        s"$name: any join must be broadcast, got $ns")
    }
  }

  test("q163 classifier-score plan: stateless projection, sort-only exchange") {
    // rocchioTrain's model collapses to a weight LITERAL, so scoring is
    // one projection over one documents scan — the shape that makes the
    // same expression stream-safe; only the presentation sort (plus the
    // single orderByOnce hash spread directly under it — round 21: the
    // range sampler otherwise re-ran the whole scoring kernel as a
    // second full pass) may exchange
    val nodes = finalNodes(SparkEntry.queries("q163_quality_clf_score")(spark, sf))
    val ns = names(nodes)
    assert(!ns.exists(_.contains("Join")),
      s"classifier scoring must not join: $ns")
    assert(ns.count(_.startsWith("Scan parquet")) == 1,
      s"one documents scan: $ns")
    assert(nodes.count(n => n.nodeName.contains("Exchange") &&
        !n.nodeName.contains("Reused")) <= 2,
      s"only the output sort and its orderByOnce spread may exchange: $ns")
  }

  test("q144 rho plan: pinned tf exchange reused by the total aggregate") {
    // the q64 discipline, doubled: corpus tf feeds the term window AND
    // the grand total; the reference term counts feed the model join AND
    // the N/V aggregate — each pair must share one tokenize
    val nodes = finalNodes(SparkEntry.queries("q144_rho_selection")(spark, sf))
    val dataScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.nonEmpty => f
    }
    assert(dataScans.size <= 2,
      s"corpus + reference: at most two tokenizing scans, got " +
        s"${dataScans.size}")
    assert(names(nodes).count(_.contains("ReusedExchange")) >= 2,
      s"both the corpus-total and reference-N/V branches must reuse their " +
        s"pinned exchanges; got ${names(nodes)}")
  }
}
