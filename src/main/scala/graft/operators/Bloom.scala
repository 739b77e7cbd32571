package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Portable Bloom filter over the engine's md5-derived hashes — the
  * classic shuffle-avoidance pattern: build a few-KB filter from a join's
  * SMALL side, broadcast it, and drop big-side rows that cannot match
  * BEFORE they reach the exchange (Spark's own runtime bloom-join
  * injection does this opportunistically; this is the explicit, portable
  * form — e.g. ship the filter to another system, or grade it).
  *
  * Representation: `words` 64-bit words as (word_idx, bits) rows built
  * with `bit_or` aggregation — fully declarative (explode k positions,
  * one words-bounded shuffle with map-side combine), no custom state,
  * and restatable verbatim in SQL, which is what makes the FILTER ITSELF
  * oracle-gradable (q52). Hash i of value v is
  * `md5Hash60("bloom<i>:" + v)`; word = h mod words, bit = (h div
  * words) mod 64.
  *
  * Standard Bloom guarantees: no false negatives ever; false-positive
  * rate ≈ (1 − e^(−k·n/m))^k for n values in m = words·64 bits — size
  * `words` to the small side's cardinality.
  */
object Bloom {

  private def log2(n: Int): Int = {
    require(n > 0 && (n & (n - 1)) == 0, s"words must be a power of two, got $n")
    java.lang.Integer.numberOfTrailingZeros(n)
  }

  /** The k (word, bit) positions of a value, as an array of structs.
    * Division by `words` is an exact SHIFT (words is a power of two) —
    * a `/`-based floor division runs in doubles and silently corrupts
    * bit indices above 2^53 (hashes reach 2^60).
    */
  private def positions(value: Column, words: Int, k: Int): Column =
    array((0 until k).map { i =>
      val h = TextFns.md5Hash60(concat(lit(s"bloom$i:"), value.cast("string")))
      struct(pmod(h, lit(words)).as("word"),
        shiftright(h, log2(words)).bitwiseAND(lit(63L)).cast("int").as("bit"))
    }: _*)

  /** Build the filter: (word, bits) rows, one per non-empty word. */
  def build(df: DataFrame, value: Column, words: Int = 64, k: Int = 3): DataFrame = {
    require(k > 0, s"need positive k, got $k"); log2(words)
    df.select(explode(positions(value, words, k)).as("p"))
      .groupBy(col("p.word").as("word"))
      .agg(bit_or(call_function("shiftleft", lit(1L), col("p.bit"))).as("bits"))
  }

  /** Keep only rows whose value MIGHT be in the filter (all k bits set) —
    * the big-side pre-filter. The bloom is broadcast; a row survives iff
    * its k positions all hit set bits, checked with one broadcast join +
    * a per-id count (no false negatives: every truly-matching row
    * survives).
    */
  def mightContain(df: DataFrame, idCol: String, value: Column,
                   bloom: DataFrame, words: Int = 64, k: Int = 3): DataFrame = {
    val pos = df.select(col(idCol).as("__bloom_id"),
      explode(positions(value, words, k)).as("p"))
    val hits = pos.join(broadcast(bloom), pos("p.word") === bloom("word"))
      .filter(call_function("shiftright", col("bits"), col("p.bit"))
        .bitwiseAND(lit(1L)) === lit(1L))
      .groupBy(col("__bloom_id")).agg(count(lit(1)).as("__bloom_hits"))
      .filter(col("__bloom_hits") === k)
      .select(col("__bloom_id").as(idCol))
    df.join(hits, Seq(idCol), "left_semi")
  }
}
