package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (`array<float>`).
  *
  * All accumulation is in Double with strict left-to-right order: element
  * floats are widened exactly, so the result is bit-identical to any other
  * sequential-double implementation (the DuckDB oracle mirrors this with
  * `list_reduce`-pinned folds).
  *
  * The hot kernel is the native codegen'd [[graft.expressions.VecDot]];
  * [[dotHof]] keeps the declarative higher-order formula of record, and an
  * equivalence test pins the two to identical results (HOF lambdas run
  * interpreted in Spark, ~100× slower per pair in all-pairs joins).
  */
object VectorFns {

  /** Exact float→double widening of an embedding column. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-double dot product — native codegen'd kernel. */
  def dot(a: Column, b: Column): Column = graft.expressions.VecDot(a, b)

  /** The same dot product as the declarative higher-order formula
    * (reference semantics for [[graft.expressions.VecDot]]).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), _ * _), lit(0.0), _ + _)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
