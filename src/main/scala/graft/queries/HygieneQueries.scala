package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.{Curation, Dedup, Redact, Similarity}
import graft.sources.Tables

/** Q64–Q72 (+ Q99 SemDeDup) — corpus-hygiene surface: the scoring and decision
  * steps between the round-6 curation signals and an actual training
  * set — LM-based quality scoring (unigram cross-entropy), tokenizer
  * coverage (OOV rate), PII-style pattern scrubbing, per-source corpus
  * profiling, the end-to-end dedup KEEP LISTS (pairs → components →
  * one kept representative per cluster), both lexical (n-gram Jaccard,
  * q68) and semantic (embedding LSH, q69), mixture EXECUTION (weights
  * → deterministically resampled corpus, q70), the quality-filter
  * VERDICT (threshold rules → keep/drop with reasons, q71),
  * single-pass table profiling (q72), and SemDeDup — k-means-cell-
  * bounded semantic dedup with the paper's least-stereotypical
  * representative election (q99).
  *
  * Oracle discipline unchanged: full-algorithm DuckDB restatements.
  * Cross-engine float policy: per-doc float folds are ORDER-PINNED
  * (sorted list + left fold — a cross-row `sum(double)` is
  * partition-order-dependent and can never be graded), integer counts
  * divide once at the end, every float output carries the
  * registry-wide `round(_, 6)`.
  */
object HygieneQueries {

  // ------------------------------------------------------- cross entropy

  /** Q64 — unigram LM cross-entropy per document (see
    * [[graft.operators.Curation.crossEntropy]]): the corpus-fit quality
    * score whose two tails (boilerplate, noise) a filter drops.
    */
  private def q64(spark: SparkSession, dir: String): DataFrame =
    Curation.crossEntropy(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Shared cross-entropy oracle prelude (CTEs + the per-doc select) —
    * composed into q64 here and the perplexity-bucket oracle (q87,
    * TrainPrepQueries).
    */
  private[queries] val crossEntropyCte =
    """t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |      FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY 1, 2),
      |ct AS (SELECT term, sum(c)::BIGINT AS ct FROM tf GROUP BY 1),
      |tot AS (SELECT sum(len(string_split(text, ' ')))::DOUBLE AS tt
      |        FROM documents),
      |contrib AS (SELECT tf.doc_id, tf.term, tf.c,
      |                   tf.c * ln(ct.ct / tot.tt) AS ctr
      |            FROM tf JOIN ct USING (term), tot),
      |agg AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens,
      |               list(ctr ORDER BY term) AS arr
      |        FROM contrib GROUP BY 1),
      |ce AS (SELECT doc_id, n_tokens,
      |              round(-list_reduce(arr, (a, b) -> a + b) / n_tokens, 6)
      |                AS cross_entropy
      |       FROM agg)""".stripMargin

  private val q64Sql =
    s"""WITH $crossEntropyCte
       |SELECT doc_id, n_tokens, cross_entropy FROM ce
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ OOV rate

  /** Q65 — per-document out-of-vocabulary rate against the same bounded
    * vocabulary q61 trains (minCount/top-V — see
    * [[graft.operators.Curation.oovRate]]).
    */
  private def q65(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Curation.oovRate(docs, "doc_id", "text",
        Curation.vocabulary(docs, "text",
          minCount = CurationQueries.VocabMin,
          maxSize = Some(CurationQueries.VocabMax)))
      .orderBy("doc_id")
  }

  private val q65Sql =
    s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |           FROM documents),
       |v AS (SELECT term, row_number() OVER (ORDER BY count(*) DESC, term)
       |               AS token_id
       |      FROM t GROUP BY term HAVING count(*) >= ${CurationQueries.VocabMin}
       |      ORDER BY count(*) DESC, term LIMIT ${CurationQueries.VocabMax}),
       |e AS (SELECT t.doc_id, coalesce(v.token_id, 0) AS tid
       |      FROM t LEFT JOIN v USING (term))
       |SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |       sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
       |       round(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END)::BIGINT
       |             / count(*), 6) AS oov_rate
       |FROM e GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ payload scrub

  /** Q66 — PII-style pattern scrubbing of the event payloads (see
    * [[graft.operators.Redact.scrub]]): emails masked first, then
    * digit runs, with the exact replacement count per row.
    */
  private def q66(spark: SparkSession, dir: String): DataFrame =
    Redact.scrub(Tables.events(spark, dir), "props")
      .select(col("event_id"), col("scrubbed"), col("n_redactions"))
      .orderBy("event_id")

  private val q66Sql =
    """WITH s1 AS (SELECT event_id,
      |              len(regexp_extract_all(props,
      |                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n1,
      |              regexp_replace(props,
      |                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
      |                '<EMAIL>', 'g') AS t1
      |            FROM events),
      |s2 AS (SELECT event_id,
      |              n1 + len(regexp_extract_all(t1, '[0-9]+')) AS n,
      |              regexp_replace(t1, '[0-9]+', '<NUM>', 'g') AS scrubbed
      |       FROM s1)
      |SELECT event_id, scrubbed, n::BIGINT AS n_redactions
      |FROM s2 ORDER BY event_id""".stripMargin

  // ----------------------------------------------------- source profile

  /** Q67 — per-source corpus profile: doc/token counts, micro-averaged
    * type-token ratio and top-term share (see
    * [[graft.operators.Curation.sourceProfile]]) — the keep/drop
    * dashboard over crawl sources.
    */
  private def q67(spark: SparkSession, dir: String): DataFrame =
    Curation.sourceProfile(Tables.documents(spark, dir), "source", "text")
      .orderBy("source")

  private val q67Sql =
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |tc AS (SELECT source, term, count(*) AS c FROM t GROUP BY 1, 2),
      |ts AS (SELECT source, sum(c)::BIGINT AS n_tokens,
      |              count(*) AS n_distinct_terms, max(c) AS top_term_count
      |       FROM tc GROUP BY 1),
      |dc AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
      |SELECT dc.source, dc.n_docs, ts.n_tokens, ts.n_distinct_terms,
      |       ts.top_term_count,
      |       round(ts.n_distinct_terms / ts.n_tokens, 6) AS type_token_ratio,
      |       round(ts.top_term_count / ts.n_tokens, 6) AS top_term_share
      |FROM dc JOIN ts USING (source) ORDER BY source""".stripMargin

  // --------------------------------------------------------- keep list

  /** Q68 — the end-to-end dedup decision: exact 3-gram-Jaccard pairs
    * (q21's generation) → connected components → one kept
    * representative per cluster by (n_chars DESC, doc_id ASC), over the
    * WHOLE corpus — singleton docs keep themselves (see
    * [[graft.operators.Dedup.keepList]]). `keep = 0` rows are the drop
    * set a dedup pass would delete.
    */
  private def q68(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.keepList(docs.select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", SharedFrames.ngramPairs(spark, dir))
      .orderBy("doc_id")
  }

  private val q68Sql =
    s"""WITH RECURSIVE ${PipelineQueries.ngramPairsCte},
       |e0 AS (SELECT id_a AS a, id_b AS b FROM p
       |       WHERE inter / (sz_a + sz_b - inter) >= 0.6),
       |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
       |reach AS (SELECT a, b FROM e
       |          UNION
       |          SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       |comp AS (SELECT a AS id, least(a, min(b)) AS comp
       |         FROM reach GROUP BY a),
       |d AS (SELECT doc_id, coalesce(c.comp, doc_id) AS cluster, n_chars
       |      FROM documents LEFT JOIN comp c ON documents.doc_id = c.id)
       |SELECT doc_id, cluster,
       |       (CASE WHEN row_number() OVER (PARTITION BY cluster
       |                ORDER BY n_chars DESC, doc_id) = 1
       |             THEN 1 ELSE 0 END)::BIGINT AS keep
       |FROM d ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- semantic keep list

  /** Q69 — SemDeDup-style SEMANTIC dedup decision: LSH-banded cosine
    * near-dup pairs over the embedding corpus (q37's generation — the
    * 100 TB pair path, never an all-pairs cartesian) → connected
    * components → one kept representative per cluster by (vector norm
    * DESC, vec_id ASC) — "keep the highest-signal copy". Singleton
    * vectors keep themselves. The norm is only the election key, not a
    * graded column (integer output: vec_id, cluster, keep).
    */
  private def q69(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val scored = emb.select(col("vec_id"),
      round(VectorFns.norm(VectorFns.toDouble(col("embedding"))), 6)
        .as("norm"))
    // composes over q37's pair frame, shared via SharedFrames (the
    // semantic counterpart of the q21 lexical-family share) — the banded
    // self-join + exact-cosine verify runs once per process, not per query
    Dedup.keepList(scored, "vec_id", "norm",
        SharedFrames.lshPairs(spark, dir))
      .orderBy("vec_id")
  }

  private val q69Sql =
    s"""WITH RECURSIVE ${PipelineQueries.lshBandsSql},
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |         FROM bands a JOIN bands b ON a.band = b.band
       |                                  AND a.vec_id < b.vec_id),
       |n AS (SELECT vec_id, e,
       |        sqrt(list_reduce(list_transform(e, x -> x*x), (x,y) -> x + y))
       |          AS nm
       |      FROM e),
       |p AS (SELECT id_a, id_b,
       |        list_reduce(list_transform(list_zip(a.e, b.e),
       |            s -> struct_extract(s,1) * struct_extract(s,2)), (x,y) -> x + y)
       |          / (a.nm * b.nm) AS cs
       |      FROM cand JOIN n a ON a.vec_id = cand.id_a
       |                JOIN n b ON b.vec_id = cand.id_b),
       |e0 AS (SELECT id_a AS a, id_b AS b FROM p
       |       WHERE cs >= ${PipelineQueries.LshPairThreshold}),
       |ee AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
       |reach AS (SELECT a, b FROM ee
       |          UNION
       |          SELECT r.a, ee.b FROM reach r JOIN ee ON r.b = ee.a),
       |comp AS (SELECT a AS id, least(a, min(b)) AS comp
       |         FROM reach GROUP BY a),
       |d AS (SELECT n.vec_id, coalesce(c.comp, n.vec_id) AS cluster,
       |             round(nm, 6) AS norm
       |      FROM n LEFT JOIN comp c ON n.vec_id = c.id)
       |SELECT vec_id, cluster,
       |       (CASE WHEN row_number() OVER (PARTITION BY cluster
       |                ORDER BY norm DESC, vec_id) = 1
       |             THEN 1 ELSE 0 END)::BIGINT AS keep
       |FROM d ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------ apply mixture

  /** Coarse-partition width for the q99 SemDeDup quantizer (the q50
    * seeding convention: lowest-id vectors, deterministic). */
  private val SemCells = 8

  /** Q99 — SemDeDup (Abbas et al. 2023): k-means-cell-bounded semantic
    * dedup — the clustered counterpart of q69's LSH banding. Every
    * vector lands in its max-cosine seed cell, within-cell pairs at
    * cosine ≥ threshold form clusters, and each cluster keeps its LEAST
    * centroid-like member (the paper's diversity-preserving election;
    * see [[graft.operators.Similarity.semDedup]]).
    */
  private def q99(spark: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(Tables.embeddings(spark, dir), "vec_id", "embedding",
        threshold = PipelineQueries.LshPairThreshold, nCells = SemCells,
        // PINNED off (not the census-driven auto default): the oracle
        // restates the unsplit within-cell enumeration bit-for-bit
        maxCell = 0)
      .orderBy("vec_id")

  private val q99Sql =
    s"""WITH RECURSIVE
       |ed AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |c AS (SELECT vec_id AS cent, e AS ce FROM ed
       |      ORDER BY vec_id LIMIT $SemCells),
       |aff AS (SELECT ed.vec_id, c.cent,
       |          ${PipelineQueries.cosSql("ed.e", "c.ce")} AS cs
       |        FROM ed, c),
       |cell AS (SELECT vec_id, cent, round(cs, 6) AS cent_sim FROM (
       |           SELECT vec_id, cent, cs,
       |                  row_number() OVER (PARTITION BY vec_id
       |                                     ORDER BY (0.0 - cs), cent) AS rn
       |           FROM aff) WHERE rn = 1),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |        ${PipelineQueries.cosSql("ea.e", "eb.e")} AS cs
       |      FROM cell a JOIN cell b ON a.cent = b.cent
       |                             AND a.vec_id < b.vec_id
       |           JOIN ed ea ON ea.vec_id = a.vec_id
       |           JOIN ed eb ON eb.vec_id = b.vec_id),
       |e0 AS (SELECT id_a AS a, id_b AS b FROM p
       |       WHERE cs >= ${PipelineQueries.LshPairThreshold}),
       |ee AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
       |reach AS (SELECT a, b FROM ee
       |          UNION
       |          SELECT r.a, ee.b FROM reach r JOIN ee ON r.b = ee.a),
       |comp AS (SELECT a AS id, least(a, min(b)) AS comp
       |         FROM reach GROUP BY a),
       |d AS (SELECT cell.vec_id, cell.cent AS cell,
       |             coalesce(k.comp, cell.vec_id) AS cluster, cell.cent_sim
       |      FROM cell LEFT JOIN comp k ON cell.vec_id = k.id)
       |SELECT vec_id, cell, cluster, cent_sim,
       |       (CASE WHEN row_number() OVER (PARTITION BY cluster
       |                ORDER BY cent_sim ASC, vec_id) = 1
       |             THEN 1 ELSE 0 END)::BIGINT AS keep
       |FROM d ORDER BY vec_id""".stripMargin

  /** Q70 — mixture EXECUTION: q59's language mixture weights applied to
    * the corpus (see [[graft.operators.Curation.applyMixture]]) — each
    * doc becomes `floor(w) + Bernoulli(frac(w))` copies with the draw a
    * pure function of doc_id, so the resampled corpus is graded
    * row-for-row (doc_id, lang, copy).
    */
  private def q70(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns
    val docs = Tables.documents(spark, dir)
    Curation.applyMixture(
        docs.select(col("doc_id"), col("lang")), "doc_id", "lang",
        Curation.mixtureWeights(docs, "lang",
          TextFns.tokenCount(col("text")), CurationQueries.MixTargets))
      .select(col("doc_id"), col("lang"), col("copy"))
      .orderBy("doc_id", "copy")
  }

  private val q70Sql =
    s"""WITH t(lang, f) AS (VALUES ${CurationQueries.MixTargets.map {
          case (l, f) => s"('$l', $f::DOUBLE)" }.mkString(", ")}),
       |s AS (SELECT lang, sum(len(string_split(text, ' ')))::BIGINT
       |               AS n_tokens
       |      FROM documents GROUP BY 1),
       |tot AS (SELECT sum(n_tokens)::BIGINT AS tt FROM s),
       |w AS (SELECT s.lang,
       |             round(coalesce(t.f, 0.0) * tot.tt / s.n_tokens, 6) AS w
       |      FROM s LEFT JOIN t USING (lang), tot),
       |d AS (SELECT doc_id, documents.lang,
       |             (floor(w.w)
       |              + CASE WHEN (('0x' || substr(md5('mix:' ||
       |                            doc_id::VARCHAR), 1, 15))::BIGINT::DOUBLE
       |                           + 0.5) / 1.152921504606846976e18
       |                          < w.w - floor(w.w)
       |                     THEN 1 ELSE 0 END)::BIGINT AS reps
       |      FROM documents JOIN w USING (lang))
       |SELECT doc_id, lang, unnest(range(reps)) AS copy
       |FROM d WHERE reps > 0 ORDER BY doc_id, copy""".stripMargin

  // ----------------------------------------------------- quality verdict

  /** The q71 rule table over q56's repetition signals — thresholds set
    * at the tails of the corpus distributions so each rule genuinely
    * fires (names become the auditable `reasons` string).
    */
  private val QualityRules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "too_short" -> (col("n_tokens") < 20),
    "low_diversity" -> (col("distinct_ratio") < 0.35),
    "top_heavy" -> (col("top_word_frac") > 0.15),
    "dup_bigrams" -> (col("dup_bigram_frac") > 0.09))

  /** Q71 — the quality-filter decision: C4/Gopher-style threshold rules
    * over the q56 repetition signals, folded to one keep/drop verdict
    * with reasons (see [[graft.operators.Curation.qualityVerdict]]).
    */
  private def q71(spark: SparkSession, dir: String): DataFrame =
    Curation.qualityVerdict(
        Curation.repetitionStats(Tables.documents(spark, dir),
          "doc_id", "text"),
        "doc_id", QualityRules)
      .orderBy("doc_id")

  private val q71Sql =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS g
      |           FROM documents),
      |wc AS (SELECT doc_id, g, count(*) AS c FROM w GROUP BY 1, 2),
      |ws AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*) AS d, max(c) AS tp
      |       FROM wc GROUP BY 1),
      |dd AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |          i -> concat_ws(' ', toks[i], toks[i+1]))) AS g FROM dd),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
      |bs AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*) AS d
      |       FROM bc GROUP BY 1),
      |sig AS (SELECT ws.doc_id, ws.n AS n_tokens,
      |               round(ws.d / ws.n, 6) AS distinct_ratio,
      |               round(ws.tp / ws.n, 6) AS top_word_frac,
      |               round(1.0 - bs.d / bs.n, 6) AS dup_bigram_frac
      |        FROM ws JOIN bs USING (doc_id))
      |SELECT doc_id,
      |       (CASE WHEN n_tokens < 20 OR distinct_ratio < 0.35
      |                  OR top_word_frac > 0.15 OR dup_bigram_frac > 0.09
      |             THEN 0 ELSE 1 END)::BIGINT AS keep,
      |       concat_ws(',',
      |         CASE WHEN n_tokens < 20 THEN 'too_short' END,
      |         CASE WHEN distinct_ratio < 0.35 THEN 'low_diversity' END,
      |         CASE WHEN top_word_frac > 0.15 THEN 'top_heavy' END,
      |         CASE WHEN dup_bigram_frac > 0.09 THEN 'dup_bigrams' END)
      |         AS reasons
      |FROM sig ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ table profile

  private val ProfileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  /** Q72 — single-pass table profile of `orders`: per column, row/null/
    * exact-distinct counts (see [[graft.operators.Profile.table]]) —
    * one scan, one Expand-planned multi-distinct aggregate, melted to
    * long form.
    */
  private def q72(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.table(Tables.orders(spark, dir), ProfileCols)
      .orderBy("col_name")

  private val q72Sql = ProfileCols.map(c =>
    s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
       |       (count(*) - count($c))::BIGINT AS n_nulls,
       |       count(DISTINCT $c)::BIGINT AS n_distinct FROM orders""".stripMargin)
    .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")

  /** Q141 — per-source dedup REPORT: the operational dashboard a dedup
    * pass ships with — per source, doc count, kept count (q68's keep
    * election over the shared q21 pair frame), duplicate rate, distinct
    * clusters touched and the largest cluster seen. The per-source dup
    * rate is THE data-mixing health signal: a source whose dup_rate
    * spikes is re-crawling itself, and its effective token contribution
    * to a training mix is `n_kept`, not `n_docs`.
    */
  private def q141(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val kl = Dedup.keepList(docs.select(col("doc_id"), col("n_chars")),
      "doc_id", "n_chars", SharedFrames.ngramPairs(spark, dir))
    val bySrc = docs.select(col("doc_id"), col("source")).join(kl, "doc_id")
    val maxCluster = bySrc.groupBy(col("source"), col("cluster"))
      .agg(count(lit(1)).as("cs"))
      .groupBy(col("source")).agg(max(col("cs")).as("max_cluster"))
    bySrc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).as("n_kept"),
        round(lit(1.0) - sum(col("keep")).cast("double") / count(lit(1)), 6)
          .as("dup_rate"),
        countDistinct(col("cluster")).as("n_clusters"))
      .join(maxCluster, "source")
      .orderBy("source")
  }

  private val q141Sql =
    s"""WITH RECURSIVE ${PipelineQueries.ngramPairsCte},
       |e0 AS (SELECT id_a AS a, id_b AS b FROM p
       |       WHERE inter / (sz_a + sz_b - inter) >= 0.6),
       |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
       |reach AS (SELECT a, b FROM e
       |          UNION
       |          SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       |comp AS (SELECT a AS id, least(a, min(b)) AS comp
       |         FROM reach GROUP BY a),
       |d AS (SELECT doc_id, coalesce(c.comp, doc_id) AS cluster, n_chars,
       |             source
       |      FROM documents LEFT JOIN comp c ON documents.doc_id = c.id),
       |k AS (SELECT doc_id, source, cluster,
       |        (CASE WHEN row_number() OVER (PARTITION BY cluster
       |                 ORDER BY n_chars DESC, doc_id) = 1
       |              THEN 1 ELSE 0 END)::BIGINT AS keep
       |      FROM d),
       |cs AS (SELECT source, cluster, count(*)::BIGINT AS cs
       |       FROM k GROUP BY 1, 2),
       |mx AS (SELECT source, max(cs)::BIGINT AS max_cluster
       |       FROM cs GROUP BY 1)
       |SELECT k.source, count(*)::BIGINT AS n_docs,
       |       sum(keep)::BIGINT AS n_kept,
       |       round(1.0 - sum(keep)::DOUBLE / count(*), 6) AS dup_rate,
       |       count(DISTINCT cluster)::BIGINT AS n_clusters,
       |       mx.max_cluster
       |FROM k JOIN mx USING (source)
       |GROUP BY 1, mx.max_cluster
       |ORDER BY source""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q64_cross_entropy", q64, Some(q64Sql)),
    QueryDef("q65_oov_rate", q65, Some(q65Sql)),
    QueryDef("q66_payload_scrub", q66, Some(q66Sql)),
    QueryDef("q67_source_profile", q67, Some(q67Sql)),
    QueryDef("q68_dedup_keeplist", q68, Some(q68Sql)),
    QueryDef("q69_semantic_keeplist", q69, Some(q69Sql)),
    QueryDef("q70_apply_mixture", q70, Some(q70Sql)),
    QueryDef("q71_quality_verdict", q71, Some(q71Sql)),
    QueryDef("q72_table_profile", q72, Some(q72Sql)),
    QueryDef("q99_semdedup", q99, Some(q99Sql)),
    QueryDef("q141_dedup_report", q141, Some(q141Sql)))
}
