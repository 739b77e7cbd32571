package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline surface:
  * tokenization, token counting (whitespace + BPE-ish regex), stopword /
  * punctuation stats, quality scoring, n-gram shingling, language-ID
  * heuristic, and document fingerprinting.
  *
  * Everything here is built from codegen'd built-ins (`split`,
  * `regexp_extract_all`, higher-order array functions) — no UDFs — so the
  * whole pipeline stays inside whole-stage codegen and scales linearly with
  * input rows: no shuffles, no driver participation.
  */
object TextFns {

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Non-whitespace token count via regex — robust to irregular spacing. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword count: letter runs, digit runs, single punctuation. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** English stopword hits (tiny fixed lexicon, word-bounded). */
  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(the|a|of|and|to|in|is|it|for|on)\\b"), lit(0)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))

  /** Heuristic document quality in [0,1]: length, stopword density,
    * punctuation density (mirrors common LLM-corpus quality filters).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val tok = greatest(nTok, lit(1)).cast("double")
    val stopRatio = stopwordCount(text) / tok
    val punctRatio = punctCount(text) * lit(10.0) / tok
    lit(0.4) * least(lit(1.0), nTok / lit(100.0)) +
      lit(0.4) * least(lit(1.0), stopRatio * lit(5.0)) +
      lit(0.2) * (lit(1.0) - least(lit(1.0), punctRatio))
  }

  /** Distinct word n-gram shingles (for Jaccard / MinHash dedup).
    * Documents shorter than n tokens yield an empty shingle set.
    * `array_distinct` over the codegen'd [[ngrams]] kernel — both
    * stages codegen, preserving the whole-stage span at every use site.
    */
  def shingles(text: Column, n: Int): Column =
    array_distinct(ngrams(text, n))

  /** Word n-grams in document order, NOT deduplicated — the repetition
    * signals (top-bigram fraction, duplicate-gram fraction) need the
    * multiset. Built by the codegen'd
    * [[graft.expressions.WordNGrams]] kernel — the declarative
    * shifted-slice zip ([[ngramsHof]]) rides `ZipWith`, which is
    * `CodegenFallback`: interpreted lambdas AND a severed codegen span
    * around every use site. The kernel is property-tested identical.
    */
  def ngrams(text: Column, n: Int): Column =
    graft.expressions.WordNGrams(tokens(text), n)

  /** The declarative zip-of-shifted-slices n-gram formula — the
    * semantic reference [[ngrams]]' codegen kernel is property-tested
    * against (not used on any hot path).
    *
    * A lambda body that captures an outer expression re-evaluates it
    * per element in Spark's interpreted higher-order-function path, so
    * each lambda here references only its own arguments — the capturing
    * variant measured O(tokens²) regex splits per document (~20×
    * slowdown at sf0.1).
    */
  def ngramsHof(text: Column, n: Int): Column = {
    require(n >= 2, s"n-gram width must be >= 2, got $n")
    val w = tokens(text)
    val m = greatest(size(w) - (n - 1), lit(0))
    (2 to n).foldLeft(slice(w, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(w, lit(j), m), (a, b) => concat_ws(" ", a, b))
    }
  }

  /** Per-language stopword-count heuristic + CJK script detection.
    * Deterministic argmax with a fixed tie-break order (en,de,es,fr).
    */
  def langId(text: Column): Column = {
    def cnt(words: String): Column =
      size(regexp_extract_all(lower(text), lit(s"\\b($words)\\b"), lit(0)))
    val en = cnt("the|a|of|and|is|to")
    val de = cnt("der|die|das|und|ist|ein")
    val es = cnt("el|los|las|de|y|es")
    val fr = cnt("le|les|et|est|un|une")
    val han = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    when(han > 0, "zh")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** The engine's PORTABLE 60-bit hash: the first 15 hex digits of md5
    * as a long in [0, 2^60) — computable identically in any engine
    * (DuckDB: `('0x' || substr(md5(x), 1, 15))::BIGINT`), which is what
    * lets portable SimHash signatures, KMV estimates, and split
    * assignments be oracle-graded bit-for-bit. This exact shape is a
    * cross-cutting contract (the oracle SQL restates it verbatim) —
    * every portable-hash call site must go through this one definition.
    * Computed by the [[graft.expressions.Md5Hash60]] digest-bytes
    * kernel (no hex-string round trip); [[md5Hash60Formula]] is the
    * declarative restatement it is property-tested against.
    */
  def md5Hash60(c: Column): Column = graft.expressions.Md5Hash60(c)

  /** The formula-of-record restatement of [[md5Hash60]] (not used on
    * any hot path; the kernel is property-tested identical). */
  def md5Hash60Formula(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Normalized-content fingerprint: md5 of lowercased,
    * whitespace-collapsed, trimmed text. Identical content → identical
    * fingerprint regardless of spacing/case — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Canonical token-set key: sorted distinct lowercased tokens joined —
    * catches reordered/duplicated-word copies (bag-of-words duplicate).
    * Splits on any whitespace run and drops empty tokens so irregular
    * spacing can't perturb the key.
    */
  def tokenSetKey(text: Column): Column =
    concat_ws(" ", array_sort(array_distinct(
      filter(split(lower(text), "\\s+"), _ =!= ""))))
}
