package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 lexical retrieval (Robertson et al., TREC-3; the Lucene
  * `ln(1 + (N − df + 0.5)/(df + 0.5))` idf form, which is always
  * positive) — the term-based retrieval family next to the embedding
  * indexes in [[graft.operators.Similarity]]: contamination triage
  * ("which corpus docs does this benchmark question retrieve"),
  * relevance-targeted selection, and the exact lexical baseline an ANN
  * recall evaluation needs.
  *
  * Plan shape, and why it scales: the corpus is tokenized ONCE into a
  * (doc, term, tf) frame pinned behind a term-keyed exchange (the
  * [[TfIdf]]/cross-entropy pattern — a separate `groupBy` branch would
  * re-tokenize the corpus under diverged column pruning); document
  * frequency rides a term window on that exchange, document length a
  * doc window, and the corpus totals (N, avgdl) one bounded aggregate
  * of the SAME exchange (ReusedExchange). Query terms are an eval-set,
  * broadcast DISTINCT (qid, term) — short-query BM25, query tf
  * ignored; the score join therefore never shuffles the corpus by
  * anything but term, and the per-query top-k is a rank-limited window
  * (WindowGroupLimit — per-partition k-heaps).
  *
  * Float discipline: per-(query, doc) addends fold in TERM ORDER
  * (sorted collect + left fold), the summed score carries the
  * registry-wide `round(_, 6)` BEFORE the rank ordering, ties break by
  * doc id.
  */
object Bm25 {

  /** Top `k` corpus documents per query by BM25. Emits
    * `(query_id, doc_id, rank, bm25)`, ordered ascending by rank within
    * each query. Documents with null text are unscorable and excluded;
    * query terms absent from the corpus contribute nothing (tf = 0).
    */
  def topK(corpus: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qidCol: String, qtextCol: String,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(k1 >= 0.0 && b >= 0.0 && b <= 1.0,
      s"need k1 >= 0 and b in [0, 1], got k1=$k1 b=$b")
    // NOTE (optimization round 21, measured and kept as-is): the dl
    // window below looks like a removable full-tf sort, but its
    // doc-keyed exchange DOUBLES as the final aggregate's clustered
    // distribution (grouping by (query_id, doc_id) is satisfied by
    // doc_id partitioning), so the score aggregate runs with NO
    // exchange of the post-join stream — which is LARGER than tf
    // (every query term fans out by its document frequency). Two
    // rewrites that deleted the window (dl as a join-back aggregate;
    // dl as a tf grouping column) both re-introduced an exchange of
    // that fatter stream and measured ~1.5× SLOWER end to end
    // (2.39 → 3.9 s at sf0.1), so the window stays.
    val tf = corpus
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .repartition(col("term"))
    val totals = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .agg(count(lit(1)).cast("double").as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
          .as("avgdl"))
    val qterms = queries
      .select(col(qidCol).as("query_id"),
        explode(TextFns.tokens(col(qtextCol))).as("term"))
      .distinct()
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("a",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("term"), col("a")))).as("arr"))
      .select(col("query_id"), col("doc_id"),
        round(aggregate(transform(col("arr"), x => x.getField("a")),
          lit(0.0), (acc, x) => acc + x), 6).as("bm25"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("bm25"))
  }
}
