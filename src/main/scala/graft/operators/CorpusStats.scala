package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-law diagnostics — the statistical health checks a curation
  * pipeline runs before committing to a mixture: Zipf's rank-frequency
  * law (a healthy natural-language corpus has slope ≈ −1; a corpus
  * polluted by templates or spam bends the head, machine-generated
  * boilerplate flattens the tail) and Heaps' vocabulary-growth law
  * (V ≈ k·N^β with β ≈ 0.4–0.6; saturating growth = duplicated
  * content, runaway growth = OCR noise / encoding damage). Both emit
  * one diagnostic row of least-squares fit parameters.
  *
  * Everything is computed with exact integer aggregation: each
  * per-point OLS contribution (x, y, xy, x², y²) is quantized to a
  * 1e-12 integer BEFORE summation (the q119 convention), so the sums
  * are partition-order-free and map-side combinable on any engine, and
  * the final fit arithmetic runs over identical doubles everywhere.
  *
  * Scale shape: term counting is the classic one-shuffle word count
  * with map-side combine; the fit itself runs over a BOUNDED point set
  * (`topK` ranks for Zipf, `buckets` prefix checkpoints for Heaps), so
  * the single-partition windows are constant-size by construction —
  * never corpus-sized.
  */
object CorpusStats {

  /** `floor(x·1e12 + 0.5)` as a long — the exact-sum quantizer. */
  private def q12(c: Column): Column =
    floor(c * lit(1e12) + lit(0.5)).cast("long")

  /** Dequantize a long sum back to double. */
  private def dq(c: Column): Column = c / lit(1e12)

  /** RAW OLS fit columns over quantized sums `(n, qsx…qsyy)`: slope,
    * intercept, r², unrounded (call sites quantize LAST, after any
    * derived transform like `exp(intercept)` — rounding first would
    * diverge from an oracle that transforms the raw value). Pure double
    * arithmetic over exact integer sums — bit-identical on both
    * engines.
    */
  private def fitRaw(): (Column, Column, Column) = {
    val n = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) =
      (dq(col("qsx")), dq(col("qsy")), dq(col("qsxy")),
        dq(col("qsxx")), dq(col("qsyy")))
    val dxx = n * sxx - sx * sx
    val dyy = n * syy - sy * sy
    val dxy = n * sxy - sx * sy
    val slope = dxy / dxx
    val icept = (sy - slope * sx) / n
    val r2 = (dxy * dxy) / (dxx * dyy)
    (slope, icept, r2)
  }

  /** Quantized OLS point sums over `(x, y)` columns. */
  private def olsSums(pts: DataFrame, x: Column, y: Column): DataFrame =
    pts.select(q12(x).as("qx"), q12(y).as("qy"), q12(x * y).as("qxy"),
        q12(x * x).as("qxx"), q12(y * y).as("qyy"))
      .agg(count(lit(1)).as("n"), sum(col("qx")).as("qsx"),
        sum(col("qy")).as("qsy"), sum(col("qxy")).as("qsxy"),
        sum(col("qxx")).as("qsxx"), sum(col("qyy")).as("qsyy"))

  /** Zipf rank-frequency fit: OLS of `ln(count)` against `ln(rank)`
    * over the corpus's `topK` most frequent space-split terms (rank
    * ties broken by term so selection and rank are total-ordered).
    * Emits one row `(n_terms, slope, intercept, r2)`.
    *
    * Scale shape: one word-count shuffle (map-side combine), then a
    * `TakeOrderedAndProject` top-K — the rank window runs over the K
    * surviving rows only (K is a constant; the window is bounded, not
    * corpus-sized).
    */
  def zipfFit(df: DataFrame, textCol: String, topK: Int = 500): DataFrame = {
    require(topK > 1, s"need at least 2 ranks to fit, got $topK")
    val counts = df.filter(col(textCol).isNotNull)
      .select(explode(TextFns.tokens(col(textCol))).as("term"))
      // empty tokens (runs of spaces) are separator artifacts, not terms —
      // they'd otherwise rank as a (usually top) pseudo-term and skew the fit
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(topK)
    val ranked = counts.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
    val (slope, icept, r2) = fitRaw()
    val q6 = graft.queries.QueryDefs.q6 _
    olsSums(ranked, log(col("rank").cast("double")),
        log(col("cnt").cast("double")))
      .select(col("n").as("n_terms"), q6(slope).as("zipf_slope"),
        q6(icept).as("intercept"), q6(r2).as("r2"))
  }

  /** Heaps vocabulary-growth fit: docs are split into `buckets` equal
    * doc-id ranges; per checkpoint b the cumulative token count N(b)
    * and cumulative distinct-term count V(b) (a term counts at its
    * FIRST bucket) give the points `(ln N, ln V)` for an OLS fit of
    * `V = k·N^β`. Emits one row
    * `(n_points, heaps_k, heaps_beta, r2)` with k = e^intercept.
    *
    * Scale shape: per-term min-bucket and per-bucket token counts are
    * two one-shuffle aggregates; the cumulative window runs over
    * `buckets` rows (a constant — never corpus-sized). Bucketing by
    * id range keeps membership a pure function of the row, so the
    * prefix curve is deterministic under any partitioning.
    */
  def heapsFit(df: DataFrame, idCol: String, textCol: String,
               buckets: Int = 50): DataFrame = {
    require(buckets > 1, s"need at least 2 checkpoints, got $buckets")
    val mx = df.agg(max(col(idCol)).cast("long").as("mx"))
    val toks = df.filter(col(textCol).isNotNull)
      .crossJoin(broadcast(mx))
      // integer `div` on both engines (DuckDB `//`) — a double divide +
      // truncating cast can land one bucket off at representation edges
      .select(expr(s"(cast(`$idCol` as bigint) * $buckets) div (`mx` + 1)")
          .as("b"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      // separator artifacts are neither tokens (N) nor vocabulary (V)
      .filter(col("term") =!= "")
    val perBucketTokens = toks.groupBy(col("b"))
      .agg(count(lit(1)).as("nt"))
    val perBucketNewTerms = toks.groupBy(col("term"))
      .agg(min(col("b")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("nv"))
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perBucketTokens
      .join(perBucketNewTerms, Seq("b"), "left")
      .select(col("b"), sum(col("nt")).over(w).as("cn"),
        sum(coalesce(col("nv"), lit(0L))).over(w).as("cv"))
      .filter(col("cn") > 0 && col("cv") > 0)
    val (slope, icept, r2) = fitRaw()
    val q6 = graft.queries.QueryDefs.q6 _
    olsSums(pts, log(col("cn").cast("double")), log(col("cv").cast("double")))
      .select(col("n").as("n_points"), q6(exp(icept)).as("heaps_k"),
        q6(slope).as("heaps_beta"), q6(r2).as("r2"))
  }

  /** The RAKE delimiter lexicon (Rose et al. 2010 use a stoplist plus
    * punctuation as phrase boundaries): a fixed English function-word
    * set. Fixed-by-contract so extraction is a pure function of the
    * text; empty tokens (runs of spaces) are boundaries too.
    */
  val RakeStopwords: Seq[String] = Seq(
    "a", "an", "the", "and", "or", "but", "of", "to", "in", "on", "for",
    "with", "at", "by", "from", "as", "is", "are", "was", "were", "be",
    "been", "it", "this", "that", "these", "those", "not", "no", "so",
    "if", "then", "than", "too", "very", "can", "will", "just", "into",
    "over", "under", "about")

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"): candidate phrases are
    * maximal stopword-free token runs; each word scores
    * `deg(w)/freq(w)` where `freq` counts candidate occurrences and
    * `deg` sums the lengths of the phrases containing them (CORPUS-wide
    * statistics — the scalable reading of RAKE's per-document tables:
    * one shared word model instead of per-doc state); a phrase scores
    * the sum of its word scores, and each document keeps its `k`
    * highest-scoring distinct phrases. Emits
    * `(idCol, rank, phrase, rake_score)`.
    *
    * Determinism: per-word scores are quantized to 1e-12 integers
    * before the per-phrase sum (exact, order-free); rank ties break on
    * the phrase string. Scale shape: phrase segmentation is a per-doc
    * window (bounded by document length), word stats are one term-keyed
    * shuffle with map-side combine, and the score join shuffles on the
    * term key — the same frame discipline as TF-IDF. No corpus-sized
    * window, no broadcast of the term table.
    */
  /** Per-stratum DISTINCTIVE terms by informed-Dirichlet log-odds
    * z-score (Monroe, Colaresi & Quinn 2008, "Fightin' Words" §3.4 —
    * the corpus-comparison statistic that fixes both raw-ratio noise
    * on rare words and tf-idf's blindness to the comparison corpus):
    * for stratum s and term w with in-stratum count `y_sw`, rest-of-
    * corpus count `y_rw`, stratum/rest token totals `n_s`/`n_r`, and a
    * Dirichlet prior `a` per term (`a0 = a·V` total),
    * `δ = ln((y_sw+a)/(n_s+a0−y_sw−a)) − ln((y_rw+a)/(n_r+a0−y_rw−a))`
    * with variance `≈ 1/(y_sw+a) + 1/(y_rw+a)`; the emitted `z`
    * is `δ/√var`. Top `topK` positive-z terms per stratum — the "what
    * makes this source different" dashboard a mixture designer reads
    * next to [[graft.operators.Curation.sourceProfile]]. Emits
    * `(strataCol, term, c, z)`.
    *
    * Scale shape: ONE tokenize into the (stratum, term) count frame
    * pinned behind `repartition(term)`; corpus-wide term counts via a
    * window on that exchange, stratum totals and the (N, V) scalars
    * via aggregates of the SAME frame (ReusedExchange — the
    * [[graft.operators.Curation.crossEntropy]] discipline; the term
    * frame of a web corpus is billions of rows and never broadcasts —
    * only the stratum-total and 1-row scalar frames do). Per-term math
    * is pure per-row double arithmetic from exact integer counts — no
    * cross-row float accumulation anywhere — and the per-stratum top-k
    * is a rank-limited window (WindowGroupLimit k-heap).
    */
  def logOddsTerms(df: DataFrame, strataCol: String, textCol: String,
                   topK: Int = 5, prior: Double = 0.01): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(prior > 0.0, s"prior must be positive, got $prior")
    // the isNotNull is semantically redundant for the window/scalar
    // branches but plan-critical: the stratum-totals broadcast join
    // infers exactly this predicate under ITS copy of the subtree, and
    // the asymmetric pushed filter would otherwise defeat
    // ReusedExchange and re-tokenize the corpus per consumer (the
    // tokenFrame trap — see Curation.tokenFrame's scaladoc)
    val tf = df
      .filter(col(strataCol).isNotNull)
      .select(col(strataCol), explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col(strataCol), col("term")).agg(count(lit(1)).as("c"))
      .repartition(col("term"))
    val withCw = tf.withColumn("cw",
      sum(col("c")).over(Window.partitionBy(col("term"))))
    val strataTotals = tf.groupBy(col(strataCol)).agg(sum(col("c")).as("ns"))
    val nv = tf.agg(sum(col("c")).as("nt"),
      count_distinct(col("term")).as("v"))
    val a = lit(prior)
    val a0 = lit(prior) * col("v")
    val ysw = col("c")
    val yrw = col("cw") - col("c")
    val nr = col("nt") - col("ns")
    val delta =
      log((ysw + a) / (col("ns") + a0 - ysw - a)) -
        log((yrw + a) / (nr + a0 - yrw - a))
    val z = delta / sqrt(lit(1.0) / (ysw + a) + lit(1.0) / (yrw + a))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("z").desc, col("term"))
    withCw
      .join(broadcast(strataTotals), strataCol)
      .crossJoin(broadcast(nv))
      .select(col(strataCol), col("term"), col("c"), round(z, 6).as("z"))
      .withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= topK)
      .drop("__graft_rk")
  }

  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3,
                   stopwords: Seq[String] = RakeStopwords): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "tok")))
    val cand = toks.filter(col("tok") =!= "" &&
      !col("tok").isInCollection(stopwords))
    val wRun = Window.partitionBy(col("id")).orderBy(col("pos"))
    val ph = cand.withColumn("pid", col("pos") - row_number().over(wRun))
    val phrases = ph.groupBy(col("id"), col("pid"))
      .agg(count(lit(1)).as("plen"),
        concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
            _.getField("tok"))).as("phrase"))
    val occ = ph.select(col("id"), col("pid"), col("tok"))
      .join(phrases.select(col("id"), col("pid"), col("plen")),
        Seq("id", "pid"))
    val wstat = occ.groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    val scored = occ.join(wstat, "tok")
      .groupBy(col("id"), col("pid"))
      .agg(sum(q12(col("deg") / col("freq"))).as("qs"))
    val perPhrase = scored.join(phrases, Seq("id", "pid"))
      .groupBy(col("id"), col("phrase"))
      .agg(max(col("qs")).as("qs"))
    val wTop = Window.partitionBy(col("id"))
      .orderBy(col("qs").desc, col("phrase"))
    perPhrase.withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("rank").cast("long").as("rank"),
        col("phrase"),
        graft.queries.QueryDefs.q6(dq(col("qs"))).as("rake_score"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * Chen & Goodman 1998 interpolated form with a fixed discount) — the
    * stronger LM filter next to [[Curation.stupidBackoff]]'s cheap
    * heuristic: perplexity-style quality ranking of held-out documents
    * under a bigram model whose backoff mass goes to CONTINUATION
    * counts (how many contexts a word completes), the property that
    * makes KN rank "San Francisco"-style collocations correctly where
    * raw-frequency backoff fails.
    *
    * The corpus splits deterministically by id: `id % holdoutMod != 0`
    * trains, `id % holdoutMod == 0` is scored. With seen context `w1`:
    * `P = max(c12−D,0)/c1 + (D·N1+(w1,·)/c1)·(N1+(·,w2)/B)`; with
    * unseen context the continuation term alone. A bigram whose `w2`
    * was never seen as a continuation is OOV — counted, not scored.
    * Emits `(idCol, n_bigrams, n_oov, kn_logscore)` per held-out doc
    * with ≥1 bigram, where `kn_logscore` is the mean quantized
    * `ln P` over scored bigrams (0.0 when every bigram is OOV).
    *
    * Scale shape: the model is three count tables off one bigram frame
    * (map-side combine); scoring joins SHUFFLE on the bigram/context/
    * continuation keys — term tables are corpus-sized and never
    * broadcast (the q61/q87 web-scale posture). `B` rides a broadcast
    * 1-row aggregate. Per-bigram `ln P` is quantized to a 1e-12
    * integer before the per-doc sum — exact, order-free.
    */
  def knBigramScore(df: DataFrame, idCol: String, textCol: String,
                    holdoutMod: Int = 5,
                    discount: Double = 0.75): DataFrame = {
    require(holdoutMod >= 2, s"need a train/eval split, got $holdoutMod")
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    def bigrams(d: DataFrame): DataFrame =
      d.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"),
          // drop separator-artifact empty tokens BEFORE pairing, so
          // irregular whitespace doesn't mint ("w","")/("","w") bigrams
          explode(graft.expressions.WordNGrams(
            filter(TextFns.tokens(col(textCol)), t => t =!= ""), 2)).as("g"))
        .select(col("id"), element_at(split(col("g"), " "), 1).as("w1"),
          element_at(split(col("g"), " "), 2).as("w2"))
    val cb = bigrams(df.filter(col(idCol) % holdoutMod =!= 0))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val ctx = cb.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("fwd"))
    val cont = cb.groupBy(col("w2")).agg(count(lit(1)).as("bwd"))
    val bn = cb.agg(count(lit(1)).cast("double").as("bn"))
    val d = lit(discount)
    val scoredRows = bigrams(df.filter(col(idCol) % holdoutMod === 0))
      .join(cb, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(bn))
      .withColumn("p",
        when(col("bwd").isNull, lit(null).cast("double"))
          .when(col("c1").isNotNull,
            greatest(coalesce(col("c12"), lit(0L)) - d, lit(0.0)) / col("c1")
              + d * col("fwd") / col("c1") * (col("bwd") / col("bn")))
          .otherwise(col("bwd") / col("bn")))
    scoredRows.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("p").isNull, lit(1))).as("n_oov"),
        sum(q12(log(col("p")))).as("qs"),
        count(col("p")).as("n_scored"))
      .select(col("id").as(idCol), col("n_bigrams"), col("n_oov"),
        when(col("n_scored") === 0L, lit(0.0))
          .otherwise(graft.queries.QueryDefs.q6(
            dq(col("qs")) / col("n_scored")))
          .as("kn_logscore"))
  }

  /** Interpolated Kneser–Ney TRIGRAM scoring — [[knBigramScore]]'s
    * recursion carried one order higher (Chen & Goodman 1999 §3, the
    * full interpolated form):
    * `P(w₃|w₁w₂) = max(c₁₂₃−D,0)/c₁₂ + D·N₁₊(w₁w₂·)/c₁₂ · P(w₃|w₂)`,
    * where the backoff `P(w₃|w₂)` is built from CONTINUATION counts of
    * the trigram table (`N₁₊(·w₂w₃)` — in how many distinct left
    * contexts was (w₂,w₃) seen), and ITS backoff is the continuation
    * unigram `N₁₊(·w₃)/|distinct (w₂,w₃)|` — the "how novel is this
    * word's context use" distribution that makes KN beat raw-count
    * backoff. Unseen (w₁,w₂) context falls to the middle level, unseen
    * w₂ context to the unigram; w₃ never seen as ANY continuation is
    * OOV (scored null, counted). Emits
    * `(idCol, n_trigrams, n_oov, kn3_logscore)` per eval-split doc
    * (docs shorter than 3 tokens have no position and are absent).
    *
    * Scale shape: the model tables are n-gram-table-sized and NEVER
    * broadcast — the eval position stream left-joins them on the
    * trigram/bigram/context/word keys (five key shuffles, the
    * [[knBigramScore]]/stupidBackoff distributed-lookup shape); the
    * one broadcast is the 1-row type-count total. Float discipline:
    * per-position p is pure per-row double math from exact integer
    * counts; per-doc sums ride the q12 integer quantization (order-
    * free, map-side combinable); one rounded division at the end.
    */
  def knTrigramScore(df: DataFrame, idCol: String, textCol: String,
                     holdoutMod: Int = 5,
                     discount: Double = 0.75): DataFrame = {
    require(holdoutMod >= 2, s"need a train/eval split, got $holdoutMod")
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    def trigrams(d: DataFrame): DataFrame =
      d.filter(col(textCol).isNotNull)
        .select(col(idCol).as("id"),
          explode(graft.expressions.WordNGrams(
            filter(TextFns.tokens(col(textCol)), t => t =!= ""), 3)).as("g"))
        .select(col("id"),
          element_at(split(col("g"), " "), 1).as("w1"),
          element_at(split(col("g"), " "), 2).as("w2"),
          element_at(split(col("g"), " "), 3).as("w3"))
    val ct = trigrams(df.filter(col(idCol) % holdoutMod =!= 0))
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c123"))
    // top-level context: token count and distinct-continuation fanout
    val ctx12 = ct.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c123")).as("c12t"), count(lit(1)).as("fwd12"))
    // middle level: (w2, w3) continuation counts from trigram TYPES
    val contBi = ct.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("cbi"))
    val midCtx = contBi.groupBy(col("w2"))
      .agg(sum(col("cbi")).as("n_mid"), count(lit(1)).as("fwd_mid"))
    // unigram continuation from bigram TYPES
    val contUni = contBi.groupBy(col("w3")).agg(count(lit(1)).as("cuni"))
    val bn = contBi.agg(count(lit(1)).cast("double").as("bn"))
    val d = lit(discount)
    val pUni = col("cuni") / col("bn")
    val pMid = when(col("n_mid").isNotNull,
        greatest(coalesce(col("cbi"), lit(0L)) - d, lit(0.0)) / col("n_mid")
          + d * col("fwd_mid") / col("n_mid") * pUni)
      .otherwise(pUni)
    val scoredRows = trigrams(df.filter(col(idCol) % holdoutMod === 0))
      .join(ct, Seq("w1", "w2", "w3"), "left")
      .join(ctx12, Seq("w1", "w2"), "left")
      .join(contBi, Seq("w2", "w3"), "left")
      .join(midCtx, Seq("w2"), "left")
      .join(contUni, Seq("w3"), "left")
      .crossJoin(broadcast(bn))
      .withColumn("p",
        when(col("cuni").isNull, lit(null).cast("double"))
          .when(col("c12t").isNotNull,
            greatest(coalesce(col("c123"), lit(0L)) - d, lit(0.0)) / col("c12t")
              + d * col("fwd12") / col("c12t") * pMid)
          .otherwise(pMid))
    scoredRows.groupBy(col("id"))
      .agg(count(lit(1)).as("n_trigrams"),
        count(when(col("p").isNull, lit(1))).as("n_oov"),
        sum(q12(log(col("p")))).as("qs"),
        count(col("p")).as("n_scored"))
      .select(col("id").as(idCol), col("n_trigrams"), col("n_oov"),
        when(col("n_scored") === 0L, lit(0.0))
          .otherwise(graft.queries.QueryDefs.q6(
            dq(col("qs")) / col("n_scored")))
          .as("kn3_logscore"))
  }
}
