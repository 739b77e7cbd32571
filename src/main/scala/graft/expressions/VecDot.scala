package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product over embedding arrays
  * (`array<float>` / `array<double>`) — the hot kernel of the similarity
  * operators.
  *
  * For equal-length arrays with non-null elements — the embedding
  * contract, and the only case the engine produces — semantics are
  * bit-identical to the declarative formula of record
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, +)`
  * (see `graft.functions.VectorFns.dotHof`): elements are widened to
  * double exactly and accumulated strictly left-to-right from 0.0, so the
  * DuckDB `list_reduce` oracle and this kernel agree to the last bit.
  * Outside that contract the two deliberately diverge: `zip_with`
  * null-pads ragged arrays and nulls poison its sum, whereas this kernel
  * clamps to the shorter length and reads elements unchecked — a partial
  * dot product instead of NULL.
  *
  * Why a custom `Expression`: Spark's higher-order array functions run
  * interpreted (lambda per element, boxed), which costs ~10 µs per
  * 64-dim pair in the all-pairs join — this kernel's `doGenCode` emits a
  * tight primitive loop inside whole-stage codegen (~100 ns), and is the
  * preferred extension point before UDFs (which box every call).
  *
  * Nulls: a null array yields null (BinaryExpression's null-safe
  * contract). Array *elements* are expected non-null (embedding vectors);
  * lengths are defensively clamped to the shorter side.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  /** Element accessor dispatch; also the (fail-fast) input-type check —
    * `ExpectsInputTypes`/`TypeCollection` are private[sql], so invalid
    * element types surface here at bind time instead of analysis time.
    */
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_dot requires array<float> or array<double> input, got $other")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (lf, rf) = (isFloat(left), isFloat(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val getL = if (isFloat(left)) s"(double) $l.getFloat($i)" else s"$l.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $r.getFloat($i)" else s"$r.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $getL * $getR;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
