package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats
import graft.sources.Tables

/** Corpus-law diagnostic queries (q129+): statistical health checks over
  * the documents table — Zipf rank-frequency slope and Heaps vocabulary
  * growth. Both grade a single fit row; all OLS sums are
  * integer-quantized before aggregation (the q119 convention) so both
  * engines sum exactly, order-free.
  */
object StatsQueries {

  /** q129 fit width: ranks entering the Zipf OLS. */
  private val ZipfTopK = 500

  /** q130 prefix checkpoints for the Heaps curve. */
  private val HeapsBuckets = 50

  /** Q129 — Zipf rank-frequency fit over the corpus's top-$ZipfTopK
    * terms (see [[graft.operators.CorpusStats.zipfFit]]): slope ≈ −1 is
    * healthy natural language; template/spam pollution bends the head,
    * generated boilerplate flattens the tail.
    */
  private def q129(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.zipfFit(Tables.documents(spark, dir), "text", ZipfTopK)

  /** Shared OLS tail: quantize `(x, y)` points named in `xe`/`ye`, sum
    * exactly, and emit the fit row. Kept in ONE piece of SQL so every
    * stats oracle states the identical op sequence the Spark side runs.
    */
  private def olsSql(ptsCte: String, xe: String, ye: String,
                     selectList: String): String =
    s"""$ptsCte,
       |qv AS (SELECT floor($xe * 1e12 + 0.5)::BIGINT AS qx,
       |              floor($ye * 1e12 + 0.5)::BIGINT AS qy,
       |              floor($xe * $ye * 1e12 + 0.5)::BIGINT AS qxy,
       |              floor($xe * $xe * 1e12 + 0.5)::BIGINT AS qxx,
       |              floor($ye * $ye * 1e12 + 0.5)::BIGINT AS qyy
       |       FROM pts),
       |s AS (SELECT count(*)::BIGINT AS n,
       |             sum(qx)::BIGINT AS qsx, sum(qy)::BIGINT AS qsy,
       |             sum(qxy)::BIGINT AS qsxy, sum(qxx)::BIGINT AS qsxx,
       |             sum(qyy)::BIGINT AS qsyy
       |      FROM qv),
       |f AS (SELECT n, n::DOUBLE AS nd,
       |             qsx / 1e12 AS sx, qsy / 1e12 AS sy,
       |             qsxy / 1e12 AS sxy, qsxx / 1e12 AS sxx,
       |             qsyy / 1e12 AS syy
       |      FROM s),
       |fit AS (SELECT n,
       |          (nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS slope,
       |          nd, sx, sy, sxx, syy, sxy
       |        FROM f),
       |fin AS (SELECT n, slope, (sy - slope * sx) / nd AS icept,
       |          ((nd * sxy - sx * sy) * (nd * sxy - sx * sy))
       |            / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)) AS r2
       |        FROM fit)
       |SELECT $selectList FROM fin""".stripMargin

  private val q129Sql = olsSql(
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
       |             FROM documents WHERE text IS NOT NULL),
       |ct AS (SELECT term, count(*)::BIGINT AS cnt FROM tok
       |       WHERE term != '' GROUP BY 1
       |       ORDER BY cnt DESC, term LIMIT $ZipfTopK),
       |pts AS (SELECT cnt,
       |          row_number() OVER (ORDER BY cnt DESC, term) AS rank
       |        FROM ct)""".stripMargin,
    "ln(rank)", "ln(cnt)",
    """n AS n_terms,
      |       floor(slope * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope,
      |       floor(icept * 1000000.0 + 0.5) / 1000000.0 AS intercept,
      |       floor(r2 * 1000000.0 + 0.5) / 1000000.0 AS r2""".stripMargin)

  /** Q130 — Heaps vocabulary-growth fit `V = k·N^β` over $HeapsBuckets
    * doc-id-range prefix checkpoints (see
    * [[graft.operators.CorpusStats.heapsFit]]): β ≈ 0.4–0.6 is healthy;
    * saturation = duplication, runaway growth = OCR/encoding damage.
    */
  private def q130(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.heapsFit(Tables.documents(spark, dir), "doc_id", "text",
      HeapsBuckets)

  private val q130Sql = olsSql(
    s"""WITH mx AS (SELECT max(doc_id)::BIGINT AS mx FROM documents),
       |tok0 AS (
       |  SELECT (doc_id * $HeapsBuckets) // (mx + 1) AS b,
       |         unnest(string_split(text, ' ')) AS term
       |  FROM documents, mx WHERE text IS NOT NULL),
       |tok AS MATERIALIZED (SELECT b, term FROM tok0 WHERE term != ''),
       |nt AS (SELECT b, count(*)::BIGINT AS nt FROM tok GROUP BY 1),
       |nv AS (SELECT b, count(*)::BIGINT AS nv
       |       FROM (SELECT term, min(b) AS b FROM tok GROUP BY 1)
       |       GROUP BY 1),
       |cum AS (SELECT nt.b,
       |          sum(nt.nt) OVER (ORDER BY nt.b)::BIGINT AS cn,
       |          sum(coalesce(nv.nv, 0)) OVER (ORDER BY nt.b)::BIGINT AS cv
       |        FROM nt LEFT JOIN nv USING (b)),
       |pts AS (SELECT b, cn, cv FROM cum WHERE cn > 0 AND cv > 0)""".stripMargin,
    "ln(cn)", "ln(cv)",
    """n AS n_points,
      |       floor(exp(icept) * 1000000.0 + 0.5) / 1000000.0 AS heaps_k,
      |       floor(slope * 1000000.0 + 0.5) / 1000000.0 AS heaps_beta,
      |       floor(r2 * 1000000.0 + 0.5) / 1000000.0 AS r2""".stripMargin)

  /** q131 keywords kept per document. */
  private val RakeK = 3

  /** Q131 — RAKE keyword extraction: each document's top-$RakeK
    * stopword-free phrases by summed `deg/freq` word score (see
    * [[graft.operators.CorpusStats.rakeKeywords]]) — the cheap
    * unsupervised doc-labeling step of an indexing/curation pipeline.
    */
  private def q131(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.rakeKeywords(Tables.documents(spark, dir), "doc_id",
        "text", RakeK)
      .orderBy("doc_id", "rank")

  private val q131Sql = {
    val stop = CorpusStats.RakeStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents WHERE text IS NOT NULL),
       |tk AS (SELECT doc_id, generate_subscripts(toks, 1) AS pos,
       |              unnest(toks) AS tok FROM d),
       |cand AS (SELECT doc_id, pos, tok FROM tk
       |         WHERE tok != '' AND tok NOT IN ($stop)),
       |ph AS MATERIALIZED (SELECT doc_id, pos, tok,
       |         pos - row_number() OVER (PARTITION BY doc_id
       |                                  ORDER BY pos) AS pid
       |       FROM cand),
       |phr AS MATERIALIZED (SELECT doc_id, pid, count(*)::BIGINT AS plen,
       |         string_agg(tok, ' ' ORDER BY pos) AS phrase
       |       FROM ph GROUP BY 1, 2),
       |occ AS MATERIALIZED (SELECT p.doc_id, p.pid, p.tok, phr.plen
       |       FROM ph p JOIN phr USING (doc_id, pid)),
       |ws AS (SELECT tok, count(*)::BIGINT AS freq,
       |              sum(plen)::BIGINT AS deg
       |       FROM occ GROUP BY 1),
       |sc AS (SELECT o.doc_id, o.pid,
       |         sum(floor(ws.deg / ws.freq * 1e12 + 0.5)::BIGINT)::BIGINT
       |           AS qs
       |       FROM occ o JOIN ws USING (tok) GROUP BY 1, 2),
       |ps AS (SELECT sc.doc_id, phr.phrase, max(sc.qs) AS qs
       |       FROM sc JOIN phr USING (doc_id, pid) GROUP BY 1, 2),
       |rk AS (SELECT doc_id, phrase, qs, row_number() OVER (
       |          PARTITION BY doc_id ORDER BY qs DESC, phrase) AS rank
       |       FROM ps)
       |SELECT doc_id, rank::BIGINT AS rank, phrase,
       |       floor(qs / 1e12 * 1000000.0 + 0.5) / 1000000.0 AS rake_score
       |FROM rk WHERE rank <= $RakeK ORDER BY doc_id, rank""".stripMargin
  }

  /** q132 split modulus and KN discount. */
  private val KnMod = 5
  private val KnD = 0.75

  /** Q132 — interpolated Kneser–Ney bigram scoring of the held-out
    * split (`doc_id % $KnMod == 0`) under a model trained on the rest
    * (see [[graft.operators.CorpusStats.knBigramScore]]) — the
    * perplexity-filter companion to q117's Stupid Backoff, with backoff
    * mass on continuation counts.
    */
  private def q132(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.knBigramScore(Tables.documents(spark, dir), "doc_id",
        "text", KnMod, KnD)
      .orderBy("doc_id")

  private val q132Sql =
    s"""WITH tr AS (SELECT doc_id,
       |              list_filter(string_split(text, ' '), t -> t != '')
       |                AS toks
       |            FROM documents
       |            WHERE text IS NOT NULL AND doc_id % $KnMod != 0),
       |tb AS (SELECT unnest(toks[1:len(toks) - 1]) AS w1,
       |              unnest(toks[2:len(toks)]) AS w2 FROM tr),
       |cb AS MATERIALIZED (SELECT w1, w2, count(*)::BIGINT AS c12
       |                    FROM tb GROUP BY 1, 2),
       |ctx AS (SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS fwd
       |        FROM cb GROUP BY 1),
       |cont AS (SELECT w2, count(*)::BIGINT AS bwd FROM cb GROUP BY 1),
       |bn AS (SELECT count(*)::DOUBLE AS bn FROM cb),
       |ev AS (SELECT doc_id,
       |         list_filter(string_split(text, ' '), t -> t != '') AS toks
       |       FROM documents
       |       WHERE text IS NOT NULL AND doc_id % $KnMod = 0),
       |eb AS (SELECT doc_id, unnest(toks[1:len(toks) - 1]) AS w1,
       |              unnest(toks[2:len(toks)]) AS w2 FROM ev),
       |sc AS (SELECT e.doc_id,
       |         CASE WHEN cont.bwd IS NULL THEN NULL
       |              WHEN ctx.c1 IS NOT NULL THEN
       |                greatest(coalesce(cb.c12, 0) - $KnD, 0.0) / ctx.c1
       |                  + $KnD * ctx.fwd / ctx.c1 * (cont.bwd / bn.bn)
       |              ELSE cont.bwd / bn.bn END AS p
       |       FROM eb e
       |       LEFT JOIN cb ON cb.w1 = e.w1 AND cb.w2 = e.w2
       |       LEFT JOIN ctx ON ctx.w1 = e.w1
       |       LEFT JOIN cont ON cont.w2 = e.w2, bn)
       |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       |       (count(*) - count(p))::BIGINT AS n_oov,
       |       CASE WHEN count(p) = 0 THEN 0.0
       |            ELSE floor((sum(floor(ln(p) * 1e12 + 0.5)::BIGINT)::BIGINT
       |                        / 1e12) / count(p) * 1000000.0 + 0.5)
       |                 / 1000000.0 END AS kn_logscore
       |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** q133 embedding dimensionality and power-iteration rounds. */
  private val PcaDim = 64
  private val PcaIters = 10

  /** Q133 — top principal component of the embedding cloud (see
    * [[graft.operators.Similarity.pcaTopComponent]]): the anisotropy /
    * rogue-dimension diagnostic run before cosine-based clustering or
    * ANN indexing. The oracle recomputes the exact-integer moment sums
    * and replays the identical quantized power iteration, unrolled.
    */
  private def q133(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.pcaTopComponent(
        Tables.embeddings(spark, dir), "embedding", PcaDim, PcaIters)
      .orderBy("pos")

  // one power-iteration round: matvec, norm, re-quantized iterate —
  // the same op sequence, in the same order, as the Scala driver loop
  private def pcaRoundSql(k: Int): String = {
    val d = PcaDim
    s"""w$k AS (SELECT list_transform(range($d), i ->
       |         list_reduce(list_transform(range($d), q ->
       |             c[i + 1][q + 1] * v[q + 1]),
       |           (a, b) -> a + b)) AS w
       |       FROM cm, v${k - 1}),
       |n$k AS (SELECT w,
       |         sqrt(list_reduce(list_transform(range($d), q ->
       |             w[q + 1] * w[q + 1]), (a, b) -> a + b)) AS nrm
       |       FROM w$k),
       |v$k AS (SELECT list_transform(range($d), q ->
       |         floor(w[q + 1] / nrm * 1e12 + 0.5) / 1e12) AS v
       |       FROM n$k)""".stripMargin
  }

  /** Shared oracle model prefix: moments → mean list `mv.m` → covariance
    * matrix `cm.c` → quantized power iteration ending at `v$PcaIters.v`.
    * Consumed by q133 (component/eigenvalue read) and q135 (debias) so
    * both grade the IDENTICAL model sequence. `mv` is MATERIALIZED:
    * q135 references it from three scopes and DuckDB re-expands
    * non-materialized CTEs per reference.
    */
  private lazy val pcaModelCtes: String = {
    val d = PcaDim
    s"""e AS MATERIALIZED (
       |  SELECT embedding::DOUBLE[] AS x FROM embeddings
       |  WHERE embedding IS NOT NULL),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM e),
       |sx AS (SELECT i,
       |         sum(floor(x[i + 1] * 1e12 + 0.5)::BIGINT) AS q
       |       FROM e CROSS JOIN range(0, $d) t(i) GROUP BY 1),
       |mv AS MATERIALIZED (
       |  SELECT list(q / 1e12 / nn.n ORDER BY i) AS m FROM sx, nn),
       |s2 AS MATERIALIZED (
       |  SELECT i, j,
       |    sum(floor(x[i + 1] * x[j + 1] * 1e12 + 0.5)::BIGINT) AS q
       |  FROM e CROSS JOIN range(0, $d) t(i) CROSS JOIN range(0, $d) u(j)
       |  GROUP BY 1, 2),
       |cr AS (SELECT s2.i, s2.j,
       |         s2.q / 1e12 / nn.n - mv.m[s2.i + 1] * mv.m[s2.j + 1] AS cij
       |       FROM s2, nn, mv),
       |cm AS MATERIALIZED (
       |  SELECT list(row ORDER BY i) AS c FROM (
       |    SELECT i, list(cij ORDER BY j) AS row FROM cr GROUP BY i)),
       |v0 AS (SELECT list_transform(range($d),
       |         q -> ${1.0 / math.sqrt(d.toDouble)}) AS v),
       |${(1 to PcaIters).map(pcaRoundSql).mkString(",\n")}""".stripMargin
  }

  private lazy val q133Sql = {
    val d = PcaDim
    s"""WITH $pcaModelCtes,
       |wf AS (SELECT list_transform(range($d), i ->
       |         list_reduce(list_transform(range($d), q ->
       |             c[i + 1][q + 1] * v[q + 1]),
       |           (a, b) -> a + b)) AS w
       |       FROM cm, v$PcaIters),
       |lm AS (SELECT list_reduce(list_transform(range($d), i ->
       |           v[i + 1] * w[i + 1]), (a, b) -> a + b) AS lam
       |       FROM v$PcaIters, wf),
       |trc AS (SELECT list_reduce(list_transform(range($d), i ->
       |            c[i + 1][i + 1]), (a, b) -> a + b) AS tr FROM cm)
       |SELECT k AS pos,
       |       floor(v[k + 1] * 1000000.0 + 0.5) / 1000000.0 AS loading,
       |       floor(lam * 1000000.0 + 0.5) / 1000000.0 AS eigenvalue,
       |       floor(lam / tr * 1000000.0 + 0.5) / 1000000.0 AS var_explained
       |FROM range(0, $d) r(k), v$PcaIters, lm, trc
       |ORDER BY pos""".stripMargin
  }

  /** Q134 — SOFT dedup decision: per near-dup cluster keep the top
    * `⌈√size⌉` members by n_chars instead of exactly one (see
    * [[graft.operators.Dedup.softKeepList]]) — sublinear retention of
    * duplicate families (repeated data keeps value for a few epochs;
    * hard dedup throws it away, no dedup over-trains on boilerplate).
    * Composes over the q21 pair frame shared with q49/q68/q126.
    */
  private def q134(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.operators.Dedup.softKeepList(
        docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars",
        SharedFrames.ngramPairs(spark, dir))
      .orderBy("doc_id")
  }

  private val q134Sql =
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
       |      FROM documents LEFT JOIN comp c ON documents.doc_id = c.id),
       |rk AS (SELECT doc_id, cluster,
       |         count(*) OVER (PARTITION BY cluster)::BIGINT AS cluster_size,
       |         row_number() OVER (PARTITION BY cluster
       |             ORDER BY n_chars DESC, doc_id)::BIGINT AS rk
       |       FROM d)
       |SELECT doc_id, cluster, cluster_size,
       |       (CASE WHEN (rk - 1) * (rk - 1) < cluster_size
       |             THEN 1 ELSE 0 END)::BIGINT AS keep
       |FROM rk ORDER BY doc_id""".stripMargin

  /** Q135 — "all-but-the-top" debiasing (Mu & Viswanath 2018): mean-center
    * and project out q133's top principal component (see
    * [[graft.operators.Similarity.debiasTopComponent]]) — the repair step
    * for the anisotropy q133 diagnoses, applied before cosine-based dedup
    * / clustering / ANN. Graded element-for-element against an oracle
    * that replays the identical model sequence (shared `pcaModelCtes`).
    */
  private def q135(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.debiasTopComponent(
        Tables.embeddings(spark, dir), "vec_id", "embedding",
        PcaDim, PcaIters)
      // exploded (vec_id, pos, y) — the q127 grading convention for
      // array-valued outputs (the driver compare sorts scalar columns)
      .select(col("vec_id"), posexplode(col("debiased")).as(Seq("pos", "y")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"), col("y"))
      .orderBy("vec_id", "pos")

  private lazy val q135Sql = {
    val d = PcaDim
    s"""WITH $pcaModelCtes,
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
       |       WHERE embedding IS NOT NULL),
       |mvd AS (SELECT list_reduce(list_transform(range($d), i ->
       |            m[i + 1] * v[i + 1]), (a, b) -> a + b) AS mvdot
       |        FROM mv, v$PcaIters),
       |dv AS (SELECT vec_id, x,
       |         list_reduce(list_transform(range($d), i ->
       |             x[i + 1] * v[i + 1]), (a, b) -> a + b) - mvdot AS dot
       |       FROM ev, v$PcaIters, mvd)
       |SELECT vec_id, i::BIGINT AS pos,
       |       floor(((x[i + 1] - m[i + 1]) - dot * v[i + 1])
       |             * 1000000.0 + 0.5) / 1000000.0 AS y
       |FROM dv, mv, v$PcaIters CROSS JOIN range(0, $d) t(i)
       |ORDER BY vec_id, pos""".stripMargin
  }

  /** q136 hubness census width: query batch size and neighbor depth. */
  private val HubQueries = 64
  private val HubK = 10

  /** Q136 — k-occurrence hubness census (Radovanović et al. 2010): how
    * often each vector lands in a query's exact top-$HubK (self excluded)
    * over the $HubQueries lowest-id query vectors (see
    * [[graft.operators.Similarity.hubness]]) — the ANN-health companion
    * to q133/q135: hub mass rises with the same dominant component the
    * debias removes.
    */
  private def q136(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.operators.Similarity.hubness(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < HubQueries), "vec_id", HubK)
      .orderBy("hub_rank")
  }

  private val q136Sql =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
       |           WHERE embedding IS NOT NULL),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM e
       |      WHERE vec_id < $HubQueries),
       |s AS (SELECT q.query_id, e.vec_id,
       |             round(${PipelineQueries.cosSql("e.e", "qe")}, 6) AS cos_sim
       |      FROM e, q WHERE e.vec_id != q.query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |               ORDER BY cos_sim DESC, vec_id) AS rk
       |      FROM s),
       |h AS (SELECT vec_id, count(*)::BIGINT AS n_hits
       |      FROM r WHERE rk <= $HubK GROUP BY 1)
       |SELECT vec_id, n_hits,
       |       row_number() OVER (ORDER BY n_hits DESC, vec_id)::BIGINT
       |         AS hub_rank
       |FROM h ORDER BY hub_rank""".stripMargin

  /** Q137 — leakage-safe train/val/test split (see
    * [[graft.operators.Splits.leakageSafeSplit]]): the q41 hash split
    * applied to the near-dup CLUSTER id instead of the row id, so a
    * near-duplicate family never straddles splits — closing the
    * train/test contamination channel q41's row-hash leaves open.
    * Composes over the q21 pair frame shared with q49/q68/q126/q134;
    * singletons assign exactly as q41 does (same salt + hash).
    */
  private def q137(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Splits.leakageSafeSplit(
        Tables.documents(spark, dir).select(col("doc_id")), "doc_id",
        SharedFrames.ngramPairs(spark, dir))
      .orderBy("doc_id")

  private val q137Sql =
    s"""WITH RECURSIVE ${PipelineQueries.ngramPairsCte},
       |e0 AS (SELECT id_a AS a, id_b AS b FROM p
       |       WHERE inter / (sz_a + sz_b - inter) >= 0.6),
       |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
       |reach AS (SELECT a, b FROM e
       |          UNION
       |          SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       |comp AS (SELECT a AS id, least(a, min(b)) AS comp
       |         FROM reach GROUP BY a),
       |d AS (SELECT doc_id, coalesce(c.comp, doc_id) AS cluster
       |      FROM documents LEFT JOIN comp c ON documents.doc_id = c.id)
       |SELECT doc_id, cluster,
       |       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM (SELECT doc_id, cluster,
       |        ('0x' || substr(md5('split:' || cluster::VARCHAR), 1, 15))::BIGINT
       |          % 100 AS b
       |      FROM d)
       |ORDER BY doc_id""".stripMargin

  /** Q152 — interpolated Kneser–Ney TRIGRAM scoring (see
    * [[graft.operators.CorpusStats.knTrigramScore]]): q132's recursion
    * one order higher — trigram ML head, continuation-count middle,
    * continuation-unigram floor, each level discount-interpolated. The
    * oracle restates all three levels, the five model joins and the
    * q12-quantized order-free per-doc fold.
    */
  private def q152(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.knTrigramScore(Tables.documents(spark, dir),
        "doc_id", "text", holdoutMod = KnMod, discount = KnD)
      .orderBy("doc_id")

  private val q152Sql =
    s"""WITH tr AS (SELECT doc_id,
       |              list_filter(string_split(text, ' '), t -> t != '')
       |                AS toks
       |            FROM documents
       |            WHERE text IS NOT NULL AND doc_id % $KnMod != 0),
       |t3 AS (SELECT unnest(toks[1:len(toks) - 2]) AS w1,
       |              unnest(toks[2:len(toks) - 1]) AS w2,
       |              unnest(toks[3:len(toks)]) AS w3 FROM tr),
       |ct AS MATERIALIZED (SELECT w1, w2, w3, count(*)::BIGINT AS c123
       |                    FROM t3 GROUP BY 1, 2, 3),
       |ctx AS (SELECT w1, w2, sum(c123)::BIGINT AS c12t,
       |               count(*)::BIGINT AS fwd12
       |        FROM ct GROUP BY 1, 2),
       |cbi AS MATERIALIZED (SELECT w2, w3, count(*)::BIGINT AS cbi
       |                     FROM ct GROUP BY 1, 2),
       |mid AS (SELECT w2, sum(cbi)::BIGINT AS n_mid,
       |               count(*)::BIGINT AS fwd_mid
       |        FROM cbi GROUP BY 1),
       |cu AS (SELECT w3, count(*)::BIGINT AS cuni FROM cbi GROUP BY 1),
       |bn AS (SELECT count(*)::DOUBLE AS bn FROM cbi),
       |ev AS (SELECT doc_id,
       |         list_filter(string_split(text, ' '), t -> t != '') AS toks
       |       FROM documents
       |       WHERE text IS NOT NULL AND doc_id % $KnMod = 0),
       |e3 AS (SELECT doc_id, unnest(toks[1:len(toks) - 2]) AS w1,
       |              unnest(toks[2:len(toks) - 1]) AS w2,
       |              unnest(toks[3:len(toks)]) AS w3 FROM ev),
       |sc AS (SELECT e.doc_id,
       |         CASE WHEN cu.cuni IS NULL THEN NULL
       |              WHEN ctx.c12t IS NOT NULL THEN
       |                greatest(coalesce(ct.c123, 0) - $KnD, 0.0) / ctx.c12t
       |                  + $KnD * ctx.fwd12 / ctx.c12t *
       |                    (CASE WHEN mid.n_mid IS NOT NULL THEN
       |                       greatest(coalesce(cbi.cbi, 0) - $KnD, 0.0)
       |                         / mid.n_mid
       |                         + $KnD * mid.fwd_mid / mid.n_mid
       |                           * (cu.cuni / bn.bn)
       |                     ELSE cu.cuni / bn.bn END)
       |              WHEN mid.n_mid IS NOT NULL THEN
       |                greatest(coalesce(cbi.cbi, 0) - $KnD, 0.0) / mid.n_mid
       |                  + $KnD * mid.fwd_mid / mid.n_mid * (cu.cuni / bn.bn)
       |              ELSE cu.cuni / bn.bn END AS p
       |       FROM e3 e
       |       LEFT JOIN ct ON ct.w1 = e.w1 AND ct.w2 = e.w2
       |                   AND ct.w3 = e.w3
       |       LEFT JOIN ctx ON ctx.w1 = e.w1 AND ctx.w2 = e.w2
       |       LEFT JOIN cbi ON cbi.w2 = e.w2 AND cbi.w3 = e.w3
       |       LEFT JOIN mid ON mid.w2 = e.w2
       |       LEFT JOIN cu ON cu.w3 = e.w3, bn)
       |SELECT doc_id, count(*)::BIGINT AS n_trigrams,
       |       (count(*) - count(p))::BIGINT AS n_oov,
       |       CASE WHEN count(p) = 0 THEN 0.0
       |            ELSE floor((sum(floor(ln(p) * 1e12 + 0.5)::BIGINT)::BIGINT
       |                        / 1e12) / count(p) * 1000000.0 + 0.5)
       |                 / 1000000.0 END AS kn3_logscore
       |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Q148 — per-source distinctive terms by informed-Dirichlet log-odds
    * z-score (see [[graft.operators.CorpusStats.logOddsTerms]]): the
    * "what makes this source different" dashboard, rare-word-robust
    * where raw ratios are not and comparison-aware where tf-idf is
    * not. The oracle restates the prior, both odds, the variance and
    * the per-source rounded-z rank cut.
    */
  private def q148(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.logOddsTerms(Tables.documents(spark, dir), "source", "text")
      .orderBy(col("source"), col("z").desc, col("term"))

  private val q148Sql =
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term
      |           FROM documents),
      |tf AS (SELECT source, term, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
      |cw AS (SELECT source, term, c,
      |              (sum(c) OVER (PARTITION BY term))::BIGINT AS cw
      |       FROM tf),
      |st AS (SELECT source, sum(c)::BIGINT AS ns FROM tf GROUP BY 1),
      |nv AS (SELECT sum(c)::BIGINT AS nt,
      |              count(DISTINCT term)::BIGINT AS v FROM tf),
      |x AS (SELECT cw.source, cw.term, cw.c,
      |             round((ln((cw.c + 0.01)
      |                       / (st.ns + 0.01 * nv.v - cw.c - 0.01))
      |                    - ln((cw.cw - cw.c + 0.01)
      |                         / (nv.nt - st.ns + 0.01 * nv.v
      |                            - (cw.cw - cw.c) - 0.01)))
      |                   / sqrt(1.0 / (cw.c + 0.01)
      |                          + 1.0 / (cw.cw - cw.c + 0.01)), 6) AS z
      |      FROM cw JOIN st USING (source), nv),
      |r AS (SELECT *, row_number() OVER (PARTITION BY source
      |               ORDER BY z DESC, term) AS rk
      |      FROM x)
      |SELECT source, term, c, z FROM r WHERE rk <= 5
      |ORDER BY source, z DESC, term""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q129_zipf_fit", q129, Some(q129Sql)),
    QueryDef("q130_heaps_fit", q130, Some(q130Sql)),
    QueryDef("q131_rake_keywords", q131, Some(q131Sql)),
    QueryDef("q132_kn_bigram", q132, Some(q132Sql)),
    QueryDef("q133_pca_top", q133, Some(q133Sql)),
    QueryDef("q134_soft_dedup", q134, Some(q134Sql)),
    QueryDef("q135_debias_topcomp", q135, Some(q135Sql)),
    QueryDef("q136_hubness", q136, Some(q136Sql)),
    QueryDef("q137_leakage_split", q137, Some(q137Sql)),
    QueryDef("q148_log_odds_terms", q148, Some(q148Sql)),
    QueryDef("q152_kn_trigram", q152, Some(q152Sql)))
}
