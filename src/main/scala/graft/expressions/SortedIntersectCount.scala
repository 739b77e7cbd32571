package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd intersection size of two SORTED `array<long>` columns
  * — the verification prefilter kernel of the exact-Jaccard dedup path.
  *
  * Semantics: the multiset intersection size by two-pointer merge, i.e.
  * Σ over values of min(multiplicity_a, multiplicity_b). On arrays with
  * distinct elements (the shingle-hash contract) this is plain set
  * intersection. BOTH INPUTS MUST BE SORTED ASCENDING (e.g. via
  * `sort_array`) — unsorted input silently undercounts, which is why the
  * operator builds the inputs itself rather than exposing this kernel as
  * a SQL function.
  *
  * Why a custom `Expression`: counting shared shingles per candidate
  * pair via `size(array_intersect(...))` on string arrays builds a hash
  * set of strings per evaluation (~10 µs for 50-gram docs); candidate
  * generation can emit 10⁵–10⁶ pairs per partition on templated corpora,
  * making verification the dominant stage cost. This kernel runs the
  * two-pointer merge over primitive longs inside whole-stage codegen
  * (~100 ns) and is used as an EXACT upper-bound prefilter: per-token
  * xxhash64 can only inflate an intersection (a cross-doc collision adds
  * a phantom match, never removes a real one — every truly shared
  * shingle shares a hash), so `hashJaccard ≥ trueJaccard` and filtering
  * on it never drops a qualifying pair; survivors get the exact string
  * verification.
  *
  * Nulls: a null array yields null (BinaryExpression's null-safe
  * contract); elements are expected non-null (hash arrays).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  /** Input-type check, deferred to bind/eval time — at construction the
    * children may still be unresolved attributes (NullType).
    */
  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(LongType, _) => ()
    case other => throw new IllegalArgumentException(
      s"sorted_intersect_count requires array<bigint> input, got $other")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    check(left); check(right)
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      check(left); check(right)
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $na = $l.numElements();
         |final int $nb = $r.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  final long $x = $l.getLong($i);
         |  final long $y = $r.getLong($j);
         |  if ($x < $y) { $i++; } else if ($x > $y) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
