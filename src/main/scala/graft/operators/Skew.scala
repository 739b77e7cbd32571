package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §4 / the 100 TB checklist).
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); this is the
  * explicit salted fallback for when a single key is hot enough that even
  * one split of it overwhelms a task, or AQE is unavailable (e.g. inside
  * a cached/reused exchange).
  *
  * Shape: the big side gets a deterministic pseudo-random salt in
  * [0, salt); the small side is replicated `salt` times; the join key
  * becomes (key, salt), spreading each hot key over `salt` reducers.
  * Exact: every big-side row still meets every matching small-side row
  * exactly once.
  */
object Skew {

  /** Inner equi-join of a skewed big side against a small side, salted.
    *
    * `saltSource`, when given, must VARY WITHIN a join key (e.g. a
    * row id or payload column) — hashing the join key itself would give
    * every row of the hot key the same salt and defeat the spread. The
    * default hashes the big side's HASHABLE columns (map-typed columns
    * are excluded — Spark refuses to hash maps), so each row's salt is a
    * pure function of its content: task retries and speculative attempts
    * recompute the SAME assignment (a seeded `rand` is only deterministic
    * per partition-ordering, so a retry with a different input split
    * could re-salt rows and produce inconsistent attempt outputs on a
    * real cluster). The content-derived default also means FULLY
    * IDENTICAL duplicate rows of a hot key land on the same salt — for
    * duplicate-heavy corpora pass an explicit `saltSource` that
    * distinguishes them (a row id / offset column). The working column
    * name is chosen to not collide with either side's columns.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16, saltSource: Option[Column] = None): DataFrame = {
    val taken = (big.columns ++ small.columns).toSet
    val saltName = Iterator.from(0).map(i => s"__graft_salt_$i")
      .find(!taken.contains(_)).get
    val defaultSource = {
      val cols = big.schema.fields.filter(f => hashable(f.dataType))
      if (cols.isEmpty) big.columns.toSeq else cols.map(_.name).toSeq
    }
    val saltCol = saltSource
      .map(c => pmod(xxhash64(c), lit(salt)).cast("int"))
      .getOrElse(pmod(xxhash64(defaultSource.map(col): _*), lit(salt)).cast("int"))
    val bigS = big.withColumn(saltName, saltCol)
    val smallS = small.withColumn(saltName,
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, saltName), "inner").drop(saltName)
  }

  /** Types Spark's `hash`/`xxhash64` accept (maps are rejected). */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType    => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType  => hashable(a.elementType)
      case _             => true
    }
  }
}
