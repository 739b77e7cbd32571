package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over embedding columns (`array<float>`), built from
  * higher-order array functions (`zip_with` + `aggregate`) so the dot
  * products run inside whole-stage codegen — no UDF boxing, no driver work.
  *
  * All accumulation is in Double with strict left-to-right order: element
  * floats are widened exactly, so the result is bit-identical to any other
  * sequential-double implementation (the DuckDB oracle mirrors this with
  * `list_sum(list_transform(list_zip(...)))`).
  */
object VectorFns {

  /** Exact float→double widening of an embedding column. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-double dot product of two array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), _ * _), lit(0.0), _ + _)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
