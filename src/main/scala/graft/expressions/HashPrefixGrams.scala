package graft.expressions

import java.util.Comparator

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Native prefix-filter index kernel for the exact-Jaccard dedup path:
  * given a document's DISTINCT shingle array and the Jaccard threshold
  * `t`, returns the first `|s| − ⌈t·|s|⌉ + 1` shingles under the global
  * (xxhash64, shingle) total order — the prefix whose collision is a
  * NECESSARY condition for `J ≥ t` (Chaudhuri et al.'s prefix filter),
  * so indexing only the prefix loses no qualifying pair.
  *
  * Why a custom `Expression`: the declarative build — `transform` into
  * (hash, gram) structs, `array_sort`, `transform` back, `slice` — rides
  * `ArrayTransform`/`ArraySort`, both `CodegenFallback`: per-element
  * interpreted lambdas, a struct allocation per shingle, and a severed
  * codegen span. This kernel hashes + sorts + slices in one compiled
  * pass per row. The generated code calls back into [[compute]] via a
  * reference object — one virtual call per ROW (vs per element), which
  * keeps the surrounding span fused; the sort itself is not worth
  * inlining into Janino.
  *
  * The ⌈t·|s|⌉ is computed via a 9-decimal half-up round BEFORE the
  * ceil, exactly like the Column formula it replaces: raw double
  * `t·|s|` can land epsilon above the exact rational (0.55·100 =
  * 55.000000000000007) and ceil of that would shorten the prefix by
  * one — silently dropping qualifying pairs. Hash order (not the
  * classic ascending-document-frequency order) keeps the build narrow —
  * see the rationale on [[graft.operators.Dedup.ngramJaccardPairs]].
  * A null array yields null (null-safe contract).
  */
case class HashPrefixGrams(child: Expression, threshold: Double)
    extends UnaryExpression {

  require(threshold > 0.0 && threshold <= 1.0,
    s"threshold must be in (0, 1], got $threshold")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "hash_prefix_grams"

  /** Input-type check, deferred to bind/eval time — at construction the
    * child may still be an unresolved attribute (NullType).
    */
  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"hash_prefix_grams requires array<string> input, got $other")
  }

  /** The per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    // len − ceil(round(t·len, 9)) + 1, clamped to [0, len]
    val need = math.ceil(
      BigDecimal(threshold * n).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).toInt
    val m = math.max(math.min(n - need + 1, n), 0)
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val keyed = new Array[(Long, UTF8String)](n)
    var i = 0
    while (i < n) {
      val s = input.getUTF8String(i)
      keyed(i) =
        (XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L), s)
      i += 1
    }
    java.util.Arrays.sort(keyed, HashPrefixGrams.cmp)
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = keyed(i)._2; i += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("hashPrefixGrams", this, classOf[HashPrefixGrams].getName)
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashPrefixGrams =
    copy(child = newChild)
}

object HashPrefixGrams {
  /** (hash asc, gram asc) — the global total order of the prefix
    * filter. Held statically: the expression instance is serialized
    * into tasks (it ships as a codegen reference object), and an
    * instance-held anonymous comparator would make it unserializable.
    */
  private[expressions] val cmp: Comparator[(Long, UTF8String)] =
    new Comparator[(Long, UTF8String)] with Serializable {
      override def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  /** Column-API entry point. */
  def apply(shingles: Column, threshold: Double): Column =
    ColumnBridge.column(
      HashPrefixGrams(ColumnBridge.expression(shingles), threshold))
}
