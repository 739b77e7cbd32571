package graft

import org.apache.spark.sql.functions.col

import graft.operators.Similarity
import graft.queries.SharedFrames
import graft.sources.Tables

/** Guards for the process-wide shared-frame memo: the share must be a
  * real memo hit (same materialized frame), must not change results vs
  * the direct build, and its consumers' plans must start from the
  * checkpointed RDD instead of re-running pair generation.
  */
class SharedFramesSpec extends SparkSpec {

  test("lshPairs is memoized: repeated calls return the same frame") {
    val a = SharedFrames.lshPairs(spark, sf)
    val b = SharedFrames.lshPairs(spark, sf)
    assert(a eq b, "second lookup must be a memo hit, not a rebuild")
  }

  test("lshPairs matches a direct lshNearDupPairs build") {
    val shared = SharedFrames.lshPairs(spark, sf)
      .orderBy("id_a", "id_b").collect().toSeq
    // 0.4 = PipelineQueries.LshPairThreshold (private[queries]); q37's
    // result equality below would catch a drift between the two
    val direct = Similarity.lshNearDupPairs(
        Tables.embeddings(spark, sf), "vec_id", "embedding",
        threshold = 0.4)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(shared == direct)
  }

  test("q69 composes over the checkpointed pair frame (plan guard)") {
    // prime the memo, then inspect the consumer's physical plan: the
    // pair side must be a Scan ExistingRDD (the localCheckpoint), and
    // embeddings.parquet must be scanned exactly once (the norm-scoring
    // side) — a second parquet scan would mean pair generation re-ran
    SharedFrames.lshPairs(spark, sf)
    val plan = SparkEntry.queries("q69_semantic_keeplist")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"),
      s"q69 plan must read the shared checkpointed pairs, got:\n$plan")
    val embScans = "embeddings\\.parquet".r.findAllIn(plan).size
    assert(embScans == 1,
      s"q69 must scan embeddings.parquet exactly once (norm side), found $embScans")
  }

  test("q37 and q69 share one pair frame (same memo entry)") {
    val pairs = SharedFrames.lshPairs(spark, sf)
    val q37 = SparkEntry.queries("q37_ann_lsh_pairs")(spark, sf)
    // q37 is the ordered pair frame itself: same rows as the memo entry
    assert(q37.collect().toSeq ==
      pairs.orderBy("id_a", "id_b").collect().toSeq)
  }

  test("ngramPairs is memoized: repeated calls return the same frame") {
    val a = SharedFrames.ngramPairs(spark, sf)
    val b = SharedFrames.ngramPairs(spark, sf)
    assert(a eq b)
  }

  test("embSignatures: memoized; q156-from-shared equals the direct build") {
    val a = SharedFrames.embSignatures(spark, sf)
    assert(a eq SharedFrames.embSignatures(spark, sf))
    // the multi-probe consumer built from the shared frame is
    // row-identical to banding the corpus directly at the same width
    val shared = Similarity.lshNearDupPairsMultiProbeFromSig(a,
        threshold = 0.4, rowsPerBand = 12)
      .orderBy("id_a", "id_b").collect().toSeq
    val direct = Similarity.lshNearDupPairsMultiProbe(
        Tables.embeddings(spark, sf), "vec_id", "embedding",
        threshold = 0.4, rowsPerBand = 12)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(shared == direct)
  }

  test("hashEmbSignatures: memoized; q154-from-shared equals direct build") {
    val a = SharedFrames.hashEmbSignatures(spark, sf)
    assert(a eq SharedFrames.hashEmbSignatures(spark, sf))
    val shared = Similarity.lshNearDupPairsFromSig(a,
        threshold = 0.8, rowsPerBand = 12)
      .orderBy("id_a", "id_b").collect().toSeq
    val direct = Similarity.lshNearDupPairs(
        Similarity.hashEmbedRowwise(
          Tables.documents(spark, sf), "doc_id", "text"),
        "doc_id", "embedding", threshold = 0.8, rowsPerBand = 12)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(shared == direct)
  }
}
