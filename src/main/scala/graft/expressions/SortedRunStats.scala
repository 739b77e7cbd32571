package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd run statistics of a SORTED `array<string>` column:
  * `struct<n_distinct int, max_run int>` — the number of distinct
  * elements and the longest equal-element run, in one adjacent-compare
  * pass. On sorted input a run IS a multiplicity class, so `max_run` is
  * the max element multiplicity (`max(count(*)) GROUP BY element`) and
  * `n_distinct` is `size(array_distinct(...))` — the two gram statistics
  * behind the row-wise repetition signals (top-gram fraction,
  * distinct-gram ratio).
  *
  * Why a custom `Expression`: the declarative run-length fold
  * (`aggregate(sort_array(a), struct(prev, run, best), ...)`) runs its
  * lambda INTERPRETED — per-token struct allocation + interpreter
  * dispatch, the dominant cost of the stream-safe repetition kernel
  * (q83/q85 measured ~2–7 s at sf0.1). This kernel is one adjacent
  * `UTF8String.equals` loop inside whole-stage codegen, and it yields
  * the distinct count for free where the HOF path paid a separate
  * `array_distinct` hash build.
  *
  * INPUT MUST BE SORTED (e.g. via `sort_array`) — equal elements must be
  * adjacent or runs fragment and `max_run` undercounts, which is why the
  * operators build the input themselves rather than exposing this as a
  * SQL function. Elements are expected non-null (token/gram arrays; a
  * null array yields null by the null-safe contract).
  */
case class SortedRunStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("max_run", IntegerType, nullable = false)))

  override def prettyName: String = "sorted_run_stats"

  /** Input-type check, deferred to bind/eval time — at construction the
    * child may still be an unresolved attribute (NullType).
    */
  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"sorted_run_stats requires array<string> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var nd = 0; var mr = 0; var run = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val cur = a.getUTF8String(i)
      if (i == 0 || !cur.equals(prev)) { nd += 1; run = 1 } else run += 1
      if (run > mr) mr = run
      prev = cur
      i += 1
    }
    new GenericInternalRow(Array[Any](nd, mr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val nd = ctx.freshName("nd"); val mr = ctx.freshName("mr")
      val run = ctx.freshName("run")
      val prev = ctx.freshName("prev"); val cur = ctx.freshName("cur")
      val utf8 = classOf[UTF8String].getName
      val rowCls = classOf[GenericInternalRow].getName
      s"""
         |final int $n = $c.numElements();
         |int $nd = 0; int $mr = 0; int $run = 0;
         |$utf8 $prev = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  final $utf8 $cur = $c.getUTF8String($i);
         |  if ($i == 0 || !$cur.equals($prev)) { $nd++; $run = 1; }
         |  else { $run++; }
         |  if ($run > $mr) { $mr = $run; }
         |  $prev = $cur;
         |}
         |${ev.value} = new $rowCls(new Object[]{$nd, $mr});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SortedRunStats =
    copy(child = newChild)
}

object SortedRunStats {
  /** Column-API entry point. */
  def apply(sorted: Column): Column =
    ColumnBridge.column(SortedRunStats(ColumnBridge.expression(sorted)))
}
