package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd elementwise xxhash64 of an `array<string>` column
  * (seed 42 — the same constant Spark's `xxhash64` builtin uses, so
  * `XxHash64Array(a)[i] == xxhash64(a[i])` — pinned by test).
  *
  * Why a custom `Expression`: `transform(a, g -> xxhash64(g))` rides
  * `ArrayTransform`, which is `CodegenFallback` — one interpreted
  * lambda dispatch per element AND a severed whole-stage-codegen span
  * at the use site. The per-doc hash array feeds the near-dup verify
  * prefilter (sorted-intersect over primitive longs), i.e. it is built
  * once per candidate-pair side — a hot path on templated corpora.
  *
  * Null elements hash like the builtin would not be reached (token/gram
  * arrays are non-null by construction); a null ARRAY yields null
  * (null-safe contract).
  */
case class XxHash64Array(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "xxhash64_array"

  /** Input-type check, deferred to bind/eval time — at construction the
    * child may still be an unresolved attribute (NullType).
    */
  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"xxhash64_array requires array<string> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = a.getUTF8String(i)
      out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val utf8 = classOf[UTF8String].getName
      val xxh = classOf[XXH64].getName
      val arrCls = classOf[GenericArrayData].getName
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val s = ctx.freshName("s")
      s"""
         |final int $n = $c.numElements();
         |final long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  final $utf8 $s = $c.getUTF8String($i);
         |  $out[$i] = $xxh.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |}
         |${ev.value} = new $arrCls($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): XxHash64Array =
    copy(child = newChild)
}

object XxHash64Array {
  /** Column-API entry point. */
  def apply(arr: Column): Column =
    ColumnBridge.column(XxHash64Array(ColumnBridge.expression(arr)))
}
