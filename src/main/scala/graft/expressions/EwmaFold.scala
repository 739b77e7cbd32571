package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd recursive EWMA fold over an `array<double>` of
  * time-ordered observations (oldest first):
  * `acc = x(0); acc = alpha * x(i) + (1 - alpha) * acc` — the classic
  * unadjusted exponentially-weighted moving average seeded with the
  * first value of the frame.
  *
  * Semantics are bit-identical to a strict left fold, so the DuckDB
  * oracle `list_reduce(vals, (acc, x) -> alpha * x + (1 - alpha) * acc)`
  * (which seeds from the first element) and this kernel agree to the
  * last bit — the same fold-order discipline as [[VecDot]].
  *
  * Why a custom `Expression`: Spark's `aggregate`/`reduce` higher-order
  * functions evaluate their lambda interpreted (boxed dispatch per
  * element) AND sever the surrounding whole-stage-codegen span; this
  * kernel is a tight primitive loop inside the fused span. The input
  * array is a bounded trailing window (see
  * [[graft.operators.TimeSeries.ewmaSmooth]]), so per-row cost is O(K)
  * with K fixed by the caller.
  *
  * Nulls: a null array yields null (null-safe contract); an empty array
  * yields null (no observations — mirrors `list_reduce` on `[]`).
  * Elements are expected non-null (the operator builds the array from a
  * non-null measure column).
  */
case class EwmaFold(child: Expression, alpha: Double)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "ewma_fold"

  /** Input-type check, deferred to bind/eval time — at construction the
    * child may still be an unresolved attribute.
    */
  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(DoubleType, _) => ()
    case other => throw new IllegalArgumentException(
      s"ewma_fold requires array<double> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) null
    else {
      var acc = a.getDouble(0)
      var i = 1
      while (i < n) {
        acc = alpha * a.getDouble(i) + (1.0 - alpha) * acc
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = $c.getDouble(0);
         |  for (int $i = 1; $i < $n; $i++) {
         |    $acc = $alpha * $c.getDouble($i) + ${1.0 - alpha} * $acc;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): EwmaFold =
    copy(child = newChild)
}

object EwmaFold {
  /** Column-API entry point; `vals` must be oldest-first. */
  def apply(vals: Column, alpha: Double): Column =
    ColumnBridge.column(EwmaFold(ColumnBridge.expression(vals), alpha))
}
