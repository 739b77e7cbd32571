package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deduplication operators for the training-data pipeline surface: exact,
  * fingerprint (normalized/bag-of-words), n-gram Jaccard, MinHash+LSH, and
  * SimHash. Each is designed for the 100 TB shape:
  *
  *  - exact/fingerprint: one hash-shuffle on the dedup key — the minimum
  *    possible data movement; no driver participation.
  *  - n-gram Jaccard: inverted-index self-join on shingles (shuffle keyed
  *    by shingle). Exact but quadratic in bucket size — use on bounded
  *    corpora or behind MinHash candidate filtering at full scale.
  *  - MinHash+LSH: fixed-width signature per doc (narrow), then a
  *    band-bucket shuffle whose size is O(docs × bands), independent of
  *    document length — the scale path. Candidates are verified with true
  *    Jaccard so the output has no false positives.
  *  - SimHash: one 64-bit signature per doc; near-dup candidates via
  *    pigeonhole block join on signature chunks.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: keeper = min(id) per group.
    * Physical plan: partial+final hash aggregate, single shuffle on key.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[Column]): DataFrame =
    df.groupBy(keyCols: _*)
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Normalized-fingerprint dedup (whitespace/case-insensitive exact). */
  def byFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(df, idCol, Seq(TextFns.fingerprint(col(textCol)).as("fp")))

  /** Bag-of-words dedup: same sorted distinct token set. */
  def byTokenSet(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(df, idCol, Seq(TextFns.tokenSetKey(col(textCol)).as("fp")))

  /** Exact n-gram Jaccard near-dup pairs via inverted-index self-join.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥
    * threshold, where jaccard is over the *distinct* shingle sets.
    * Shuffle key = shingle (inverted index); the pair-count aggregation
    * shuffles on (id_a, id_b). At 100 TB, run this only on MinHash
    * candidates (see [[minHashPairs]]) or add prefix filtering.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      TextFns.shingles(col(textCol), n).as("sh"))
      .withColumn("sz", size(col("sh")))
    val inv = sh.select(col("id"), col("sz"), explode(col("sh")).as("g"))
    val a = inv.select(col("id").as("id_a"), col("sz").as("sz_a"), col("g"))
    val b = inv.select(col("id").as("id_b"), col("sz").as("sz_b"), col("g"))
    a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature: elementwise min over shingles of 64 seeded
    * xxhash64 values. Computed entirely inside codegen'd higher-order
    * functions — one narrow pass, signature width fixed at 64.
    */
  def minHashSignature(shinglesCol: Column, numHashes: Int = 64): Column =
    aggregate(
      shinglesCol,
      expr(s"transform(sequence(0, ${numHashes - 1}), i -> 9223372036854775807L)"),
      (acc, s) => zip_with(
        acc,
        transform(sequence(lit(0), lit(numHashes - 1)), i => xxhash64(s, i)),
        (x, y) => least(x, y)))

  /** MinHash + banded LSH near-dup pairs, verified with true Jaccard.
    *
    * bands × rowsPerBand = 64. With (32, 2) the candidate-recall curve is
    * ≥ 0.9999 at J = 0.5. Candidate generation shuffles on
    * (band index, band hash) — O(docs × bands) rows of constant width —
    * then candidates are verified exactly (array_intersect on the two
    * shingle sets), so output ⊆ [[ngramJaccardPairs]] output.
    */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                   threshold: Double, bands: Int = 32): DataFrame = {
    val rowsPerBand = 64 / bands
    val sh = df.select(col(idCol).as("id"),
        TextFns.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh")))
    val banded = sh.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(Seq(b) ++ (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    val withSets = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
    withSets
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash of the token multiset: per bit, sum ±1 over token
    * hashes, take the sign. One narrow codegen'd pass per document.
    */
  def simHash(textCol: Column): Column = {
    val bitSums = aggregate(
      TextFns.tokens(textCol),
      expr("transform(sequence(0, 63), i -> 0)"),
      (acc, t) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", xxhash64(t), i) % 2 =!= 0, 1)
            .otherwise(-1)),
        (x, y) => x + y))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, i) => when(s > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }
}
