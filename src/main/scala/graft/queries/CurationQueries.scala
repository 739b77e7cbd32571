package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Curation, Similarity}
import graft.sources.Tables
import QueryDefs._

/** Q56–Q63 — round-6 curation surface: the corpus-curation steps an LLM
  * training-data pipeline runs between raw text and tokenized shards
  * (repetition quality signals, benchmark decontamination, chunking,
  * mixture weighting, weighted sampling, vocabulary building + encoding,
  * int8 embedding quantization, sequence packing).
  *
  * Oracle discipline unchanged: every query has a full-algorithm DuckDB
  * restatement. Cross-engine float policy: ratios and `pow` keys carry
  * the registry-wide `round(_, 6)` (libm-ulp absorption); the
  * quantization codes are exact (one pinned association order of scalar
  * double ops, no rounding needed); everything else is integer/string.
  */
object CurationQueries {

  // ---------------------------------------------------- repetition signals

  /** Q56 — Gopher-style repetition signals per document (see
    * [[graft.operators.Curation.repetitionStats]]).
    */
  private def q56(spark: SparkSession, dir: String): DataFrame =
    Curation.repetitionStats(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  private[queries] val q56Sql =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS g
      |           FROM documents),
      |wc AS (SELECT doc_id, g, count(*) AS c FROM w GROUP BY 1, 2),
      |ws AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*) AS d, max(c) AS tp
      |       FROM wc GROUP BY 1),
      |d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |          i -> concat_ws(' ', toks[i], toks[i+1]))) AS g FROM d),
      |bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
      |bs AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*) AS d, max(c) AS tp
      |       FROM bc GROUP BY 1)
      |SELECT ws.doc_id, ws.n AS n_tokens,
      |       round(ws.d / ws.n, 6) AS distinct_ratio,
      |       round(ws.tp / ws.n, 6) AS top_word_frac,
      |       round(bs.tp / bs.n, 6) AS top_bigram_frac,
      |       round(1.0 - bs.d / bs.n, 6) AS dup_bigram_frac
      |FROM ws JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ decontamination

  /** Benchmark cut: docs below this id play the held-out eval set. */
  private val BenchCut = 25

  /** Q57 — n-gram-overlap decontamination: corpus docs sharing any
    * 5-gram with the benchmark slice, with distinct-gram hit counts
    * (see [[graft.operators.Curation.decontaminate]]).
    */
  private def q57(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Curation.decontaminate(
        docs.filter(col("doc_id") >= BenchCut),
        docs.filter(col("doc_id") < BenchCut),
        "doc_id", "text", n = 5)
      .orderBy("doc_id")
  }

  private val q57Sql =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents),
       |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |          range(1, len(toks) - 3),
       |          i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
       |                         toks[i+3], toks[i+4])))) AS g
       |      FROM d),
       |b AS (SELECT DISTINCT g FROM g WHERE doc_id < $BenchCut)
       |SELECT g.doc_id, count(*) AS n_overlap
       |FROM g JOIN b USING (g) WHERE g.doc_id >= $BenchCut
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- chunking

  private val ChunkW = 32
  private val ChunkS = 24

  /** Q58 — overlapping token-window chunks, graded as the chunk text
    * itself (see [[graft.operators.Curation.chunk]]).
    */
  private def q58(spark: SparkSession, dir: String): DataFrame =
    Curation.chunk(Tables.documents(spark, dir), "doc_id", "text",
        width = ChunkW, stride = ChunkS)
      .orderBy("doc_id", "start")

  private val q58Sql =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents),
       |s AS (SELECT doc_id, toks,
       |             unnest(range(0, len(toks), $ChunkS)) AS start FROM d)
       |SELECT doc_id, start,
       |       least(len(toks) - start, $ChunkW)::BIGINT AS n_chunk_tokens,
       |       array_to_string(list_slice(toks, start + 1, start + $ChunkW),
       |                       ' ') AS chunk
       |FROM s ORDER BY doc_id, start""".stripMargin

  // ------------------------------------------------------ mixture weights

  private[queries] val MixTargets = Seq(
    "en" -> 0.5, "de" -> 0.2, "es" -> 0.15, "fr" -> 0.1, "zh" -> 0.05)

  /** Q59 — domain-mixture reweighting per language (see
    * [[graft.operators.Curation.mixtureWeights]]).
    */
  private def q59(spark: SparkSession, dir: String): DataFrame =
    Curation.mixtureWeights(Tables.documents(spark, dir), "lang",
        TextFns.tokenCount(col("text")), MixTargets)
      .orderBy("lang")

  private val q59Sql =
    s"""WITH t(lang, f) AS (VALUES ${MixTargets.map {
          case (l, f) => s"('$l', $f::DOUBLE)" }.mkString(", ")}),
       |s AS (SELECT lang, count(*) AS n_docs,
       |             sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
       |      FROM documents GROUP BY 1),
       |tot AS (SELECT sum(n_tokens)::BIGINT AS tt FROM s)
       |SELECT s.lang, s.n_docs, s.n_tokens,
       |       round(coalesce(t.f, 0.0) * tot.tt / s.n_tokens, 6) AS weight
       |FROM s LEFT JOIN t USING (lang), tot ORDER BY lang""".stripMargin

  // ------------------------------------------------------ weighted sample

  private val SampleK = 100

  /** Q60 — deterministic A-ES weighted sample (log-domain key
    * `ln(-ln(u)) - ln(w)`, smallest-first — scale-invariant under
    * rounding, so it spreads rather than saturates for heavy weights):
    * 100 docs drawn with probability ∝ n_chars, selection a pure
    * function of doc ids (see
    * [[graft.operators.Curation.weightedSample]]). Graded as the exact
    * selected set with its (rounded) keys.
    */
  private def q60(spark: SparkSession, dir: String): DataFrame =
    Curation.weightedSample(
        Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", col("n_chars"), k = SampleK)
      .select(col("doc_id"), col("sample_key"))
      .orderBy("doc_id")

  private val q60Sql =
    s"""SELECT doc_id, sample_key FROM (
       |  SELECT doc_id,
       |         round(ln(-ln((('0x' || substr(md5('wsample:' || doc_id::VARCHAR),
       |                        1, 15))::BIGINT::DOUBLE + 0.5)
       |                      / 1.152921504606846976e18))
       |               - ln(n_chars::DOUBLE), 6) AS sample_key
       |  FROM documents
       |  WHERE n_chars > 0
       |  ORDER BY sample_key ASC, doc_id LIMIT $SampleK)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- vocabulary + encode

  /** Rare-term floor and hard cap for the q61 vocabulary — the two
    * bounds that keep [[graft.operators.Curation.vocabulary]]'s ranked
    * frame vocab-sized at web-corpus cardinality. VocabMax is set below
    * the corpus's distinct-term count so the truncation (and encode's
    * OOV → 0 path) is actually exercised by the graded output.
    */
  private[queries] val VocabMin = 2L
  private[queries] val VocabMax = 20

  /** Q61 — tokenizer-style vocabulary (ids by count DESC, term ASC,
    * bounded by `minCount`/`maxSize`) and the corpus encoded against it
    * as `(doc_id, pos, token_id)` triples, out-of-vocabulary terms as 0
    * (see [[graft.operators.Curation.vocabulary]] / `encode`).
    */
  private def q61(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Curation.encode(docs, "doc_id", "text",
        Curation.vocabulary(docs, "text",
          minCount = VocabMin, maxSize = Some(VocabMax)))
      .orderBy("doc_id", "pos")
  }

  private val q61Sql =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
       |           FROM documents),
       |t AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
       |             unnest(toks) AS term FROM d),
       |v AS (SELECT term, row_number() OVER (ORDER BY count(*) DESC, term)
       |               AS token_id
       |      FROM t GROUP BY term HAVING count(*) >= $VocabMin
       |      ORDER BY count(*) DESC, term LIMIT $VocabMax)
       |SELECT t.doc_id, t.pos::BIGINT AS pos,
       |       coalesce(v.token_id, 0)::BIGINT AS token_id
       |FROM t LEFT JOIN v USING (term) ORDER BY doc_id, pos""".stripMargin

  // ------------------------------------------------- int8 quantization

  /** Q62 — int8 scalar quantization of the embedding corpus, graded
    * code-for-code (see [[graft.operators.Similarity.scalarQuantize]];
    * exact cross-engine, no rounding tolerance).
    */
  private def q62(spark: SparkSession, dir: String): DataFrame =
    Similarity.scalarQuantize(Tables.embeddings(spark, dir),
        "vec_id", "embedding")
      .orderBy("vec_id", "pos")

  private val q62Sql =
    """WITH x AS (SELECT vec_id, i AS pos, embedding[i + 1]::DOUBLE AS v
      |           FROM embeddings CROSS JOIN range(0, 64) t(i)),
      |s AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM x GROUP BY 1)
      |SELECT x.vec_id, x.pos::BIGINT AS pos,
      |       CASE WHEN s.mx > s.mn
      |            THEN floor((x.v - s.mn) * 255.0 / (s.mx - s.mn)
      |                       + 0.5)::BIGINT
      |            ELSE 0 END AS code
      |FROM x JOIN s USING (pos) ORDER BY vec_id, pos""".stripMargin

  // ----------------------------------------------------- sequence packing

  private val PackBudget = 512

  /** Q63 — greedy in-order sequence packing into 512-token bins within
    * each language shard (see
    * [[graft.operators.Curation.packSequences]]).
    */
  private def q63(spark: SparkSession, dir: String): DataFrame =
    Curation.packSequences(
        Tables.documents(spark, dir).select(col("doc_id"), col("lang"),
          col("text")),
        "doc_id", TextFns.tokenCount(col("text")), "lang", PackBudget)
      .orderBy("doc_id")

  private val q63Sql =
    s"""WITH d AS (SELECT doc_id, lang,
       |             len(string_split(text, ' '))::BIGINT AS n_tokens
       |           FROM documents)
       |SELECT doc_id, lang, n_tokens,
       |       ((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
       |        - n_tokens) // $PackBudget AS bin
       |FROM d ORDER BY doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q56_repetition_stats", q56, Some(q56Sql)),
    QueryDef("q57_decontaminate", q57, Some(q57Sql)),
    QueryDef("q58_chunks", q58, Some(q58Sql)),
    QueryDef("q59_mixture_weights", q59, Some(q59Sql)),
    QueryDef("q60_weighted_sample", q60, Some(q60Sql)),
    QueryDef("q61_vocab_encode", q61, Some(q61Sql)),
    QueryDef("q62_int8_quantize", q62, Some(q62Sql)),
    QueryDef("q63_sequence_packing", q63, Some(q63Sql)))
}
