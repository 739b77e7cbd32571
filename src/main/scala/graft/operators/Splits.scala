package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines — train/val/test
  * assignment as a pure function of a stable row id, NOT `randomSplit`:
  * Spark's `randomSplit` is seeded per-partition, so adding a file,
  * changing parallelism, or a task retry reassigns rows between splits —
  * silently leaking validation data into training across pipeline runs.
  * A content-hash bucket gives every row a permanent split membership
  * that survives re-partitioning, re-runs, and incremental appends.
  *
  * The hash is the PORTABLE md5-derived 60-bit value (first 15 hex
  * digits), namespaced with a salt string so independent splits of the
  * same ids decorrelate — and computable identically in any engine, which
  * is what lets an external system (or the DuckDB oracle) reproduce the
  * exact assignment.
  *
  * Purely narrow (one hash + one CASE per row): no shuffle, no driver
  * participation, scale-free.
  */
object Splits {

  /** Salted portable 60-bit hash of a row id:
    * [[graft.functions.TextFns.md5Hash60]] over `salt || ':' || id`.
    */
  def portableHash(idCol: Column, salt: String): Column =
    graft.functions.TextFns.md5Hash60(concat(lit(s"$salt:"), idCol.cast("string")))

  /** Split label for each row: `weights` are (label, weight) pairs; a row
    * lands in label i with probability weight_i / Σweights, decided by
    * its hash bucket in [0, Σweights). Weights must be positive ints
    * (e.g. 80/10/10 — percentage points).
    */
  def assign(idCol: Column, weights: Seq[(String, Int)],
             salt: String = "split"): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive: $weights")
    val total = weights.map(_._2).sum
    val bucket = pmod(portableHash(idCol, salt), lit(total))
    val cums = weights.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    weights.zip(cums).init.foldRight(lit(weights.last._1): Column) {
      case (((label, _), hi), other) => when(bucket < hi, label).otherwise(other)
    }
  }

  /** Convenience: add a `split` column with the given weights. */
  def withSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
                salt: String = "split"): DataFrame =
    df.withColumn("split", assign(col(idCol), weights, salt))

  /** Deterministic fractional sample: keep rows whose hash bucket (out of
    * `outOf`) is < `keep` — the hash-based replacement for `df.sample` when the
    * sampled set must be stable across runs and partitionings.
    */
  def deterministicSample(df: DataFrame, idCol: String, keep: Int,
                          outOf: Int = 100, salt: String = "sample"): DataFrame = {
    require(keep >= 0 && keep <= outOf, s"keep=$keep must be in [0, $outOf]")
    df.filter(pmod(portableHash(col(idCol), salt), lit(outOf)) < keep)
  }

  /** Dedup-AWARE (leakage-safe) split: hash the near-dup CLUSTER id
    * instead of the row id, so a near-duplicate family can never
    * straddle train/test — the contamination channel a row-hash split
    * leaves open (a test doc's near-copy sitting in train inflates eval;
    * the train/test overlap measured by Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" §6 and Dodge et al.
    * 2021's C4 audit). `pairs` is any near-dup pair frame — the q21
    * lexical `SharedFrames.ngramPairs` or the q37 embedding pairs;
    * members of one connected component share a cluster id and hence a
    * split. Singletons are their own cluster, so their assignment is
    * IDENTICAL to [[assign]] on the row id (same salt, same hash) — the
    * split only moves rows that have near-dups, and label proportions
    * hold up to cluster granularity. Emits `(idCol, cluster, split)`.
    *
    * Scale shape: one [[Dedup.connectedComponents]] run over the pair
    * frame (lineage-truncated rounds; the pair frame is the expensive
    * input and should be the shared/materialized one), a left join back
    * on the id key, then the same narrow hash+CASE as [[assign]].
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       weights: Seq[(String, Int)] =
                         Seq("train" -> 80, "val" -> 10, "test" -> 10),
                       salt: String = "split"): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
    df.join(comps, df(idCol) === comps("id"), "left")
      .select(df(idCol), coalesce(col("comp"), df(idCol)).as("cluster"))
      .withColumn("split", assign(col("cluster"), weights, salt))
  }

  /** Deterministic STRATIFIED sample: per-stratum keep fractions (class
    * balancing — downsample the dominant language/source/label, keep the
    * rare ones whole). Same permanence guarantee as [[assign]]: a row's
    * membership is a pure function of its id, so re-runs and appends
    * never reshuffle the sample. Strata not listed keep `defaultKeep`.
    * Purely narrow — the per-stratum fraction folds to a CASE, no join.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Int], defaultKeep: Int = 0,
                       outOf: Int = 100, salt: String = "strata"): DataFrame = {
    require((fractions.values ++ Seq(defaultKeep)).forall(k => k >= 0 && k <= outOf),
      s"all keep counts must be in [0, $outOf]: $fractions default=$defaultKeep")
    val keep = fractions.toSeq.sortBy(_._1).foldLeft(lit(defaultKeep)) {
      case (acc, (s, k)) => when(col(strataCol) === s, k).otherwise(acc)
    }
    df.filter(pmod(portableHash(col(idCol), salt), lit(outOf)) < keep)
  }
}
