package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply ONE BPE merge to a symbol array: every adjacent occurrence of
  * `(a, b)` fuses into the single symbol `a+b`, scanning left-to-right
  * without overlap (`a a a` under merge `(a,a)` → `aa a` — the leftmost
  * pair wins, exactly Sennrich et al. 2016's merge semantics). The
  * trainer's inner-loop mutation, applied once per round to the
  * distinct-word symbol frame by [[graft.operators.Curation.bpeTrain]].
  *
  * A fused symbol can never seed a NEW `(a, b)` match (that would need
  * `a+b` to equal `a` or `b`, i.e. an empty symbol), so one linear scan
  * reaches the per-word fixpoint — which is also why the leftmost-greedy
  * scan equals "repeatedly fuse the leftmost match", the form an
  * external oracle can restate with a recursive fixpoint.
  *
  * Why a custom `Expression`: the fold needs (previous-symbol, emitted)
  * state per element — an interpreted `aggregate` lambda chain in
  * declarative form ([[SortedRunStats]]' predecessor measured that path
  * 3–5× slower than compiled scans). One compiled pass per row behind a
  * codegen reference call keeps the merge loop narrow and fused. A null
  * array yields null (null-safe contract).
  */
case class BpeMergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {

  require(a.nonEmpty && b.nonEmpty, "merge pair symbols must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_merge_pair"

  /** Input-type check, deferred to bind/eval time. */
  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"bpe_merge_pair requires array<string> input, got $other")
  }

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  @transient private lazy val fused = UTF8String.fromString(a + b)

  /** The per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new Array[Any](n)
    var i = 0; var j = 0
    while (i < n) {
      val cur = input.getUTF8String(i)
      if (i + 1 < n && cur.equals(ua) && input.getUTF8String(i + 1).equals(ub)) {
        out(j) = fused; i += 2
      } else {
        out(j) = cur; i += 1
      }
      j += 1
    }
    new GenericArrayData(if (j == n) out else out.take(j))
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("bpeMergePair", this,
        classOf[BpeMergePair].getName)
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

object BpeMergePair {
  /** Column-API entry point. */
  def apply(symbols: Column, a: String, b: String): Column =
    ColumnBridge.column(
      BpeMergePair(ColumnBridge.expression(symbols), a, b))
}
