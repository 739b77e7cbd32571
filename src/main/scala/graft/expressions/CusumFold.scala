package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd one-sided CUSUM fold (Page 1954) over an
  * `array<double>` of time-ordered observations (oldest first):
  * `acc = 0; acc = max(0, acc + sign·x(i) − offset)` — the cumulative-sum
  * drift statistic, reset at zero. `sign = +1` accumulates upward drift
  * (offset = target + slack), `sign = −1` downward
  * (offset = slack − target); the caller supplies `offset` per row, so
  * per-series targets ride a plain column.
  *
  * Bit-identical to the DuckDB restatement
  * `list_reduce(list_prepend(0.0, vals), (acc, x) ->
  * greatest(0, acc + sign·x − offset))` — the prepended zero is the
  * seed, after which both engines run the same strict oldest-first
  * IEEE op sequence (the [[EwmaFold]] discipline).
  *
  * Why a custom `Expression`: same reason as [[EwmaFold]] — Spark
  * `aggregate` lambdas run interpreted AND sever the codegen span; this
  * is a tight primitive loop inside the fused span, O(K) per row over
  * the bounded trailing frame the operator builds.
  *
  * Nulls: null array or null offset yields null; an EMPTY array yields
  * 0.0 (zero observations of drift — unlike [[EwmaFold]], the seed
  * exists without data).
  */
case class CusumFold(left: Expression, right: Expression, sign: Int)
    extends BinaryExpression {

  require(sign == 1 || sign == -1, s"sign must be +1 or -1, got $sign")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "cusum_fold"

  /** Input-type check, deferred to bind/eval time. */
  private def check(): Unit = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), DoubleType) => ()
    case other => throw new IllegalArgumentException(
      s"cusum_fold requires (array<double>, double) input, got $other")
  }

  override protected def nullSafeEval(vals: Any, offset: Any): Any = {
    check()
    val a = vals.asInstanceOf[ArrayData]
    val o = offset.asInstanceOf[Double]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val next = acc + sign * a.getDouble(i) - o
      acc = if (next > 0.0) next else 0.0
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, o) => {
      check()
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val next = ctx.freshName("next")
      s"""
         |final int $n = $c.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $next = $acc + ($sign) * $c.getDouble($i) - $o;
         |  $acc = $next > 0.0 ? $next : 0.0;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CusumFold =
    copy(left = newLeft, right = newRight)
}

object CusumFold {
  /** Column-API entry point; `vals` must be oldest-first. */
  def apply(vals: Column, offset: Column, sign: Int): Column =
    ColumnBridge.column(CusumFold(
      ColumnBridge.expression(vals), ColumnBridge.expression(offset), sign))
}
