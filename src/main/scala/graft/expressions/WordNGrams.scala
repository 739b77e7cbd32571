package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word n-grams over a token array: element `i` of the
  * result is `concat_ws(" ", tokens[i], …, tokens[i+n-1])`, with
  * `max(len - n + 1, 0)` grams in document order (multiset — NOT
  * deduplicated; compose with `array_distinct` for shingles).
  *
  * Why a custom `Expression`: the declarative formulation — a chain of
  * `zip_with(acc, slice(w, j, m), concat_ws)` — runs on Spark's
  * higher-order-function path, and `ZipWith` is `CodegenFallback`:
  * every gram costs n−1 interpreted lambda dispatches AND the fallback
  * severs the whole-stage-codegen span around it, de-optimizing every
  * neighbouring expression in the projection. N-gram construction is
  * the first step of the repetition/contamination/dedup text surface
  * (~10⁸ lambda dispatches per sf0.1 pass), so this kernel — one
  * `UTF8String.concatWs` per gram inside codegen — is the difference
  * between the text queries being HOF-bound and scan-bound.
  *
  * Semantics pinned to the HOF formula it replaces (property-tested):
  * identical on every input including empty/whitespace tokens (empty
  * strings are joined, not skipped — `concat_ws` only skips NULLs) and
  * documents shorter than `n` (empty result). A null token array yields
  * null (null-safe contract).
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 2, s"n-gram width must be >= 2, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  /** Input-type check, deferred to bind/eval time — at construction the
    * child may still be an unresolved attribute (NullType).
    */
  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"word_ngrams requires array<string> input, got $other")
  }

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    val a = input.asInstanceOf[ArrayData]
    val len = a.numElements()
    val m = math.max(len - (n - 1), 0)
    val grams = new Array[Any](m)
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { buf(j) = a.getUTF8String(i + j); j += 1 }
      grams(i) = UTF8String.concatWs(sep, buf: _*)
      i += 1
    }
    new GenericArrayData(grams)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val utf8 = classOf[UTF8String].getName
      val arrCls = classOf[GenericArrayData].getName
      val sepRef = ctx.addReferenceObj("sep", sep, utf8)
      val len = ctx.freshName("len"); val m = ctx.freshName("m")
      val grams = ctx.freshName("grams"); val buf = ctx.freshName("buf")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |final int $len = $c.numElements();
         |final int $m = $len - ${n - 1} > 0 ? $len - ${n - 1} : 0;
         |final $utf8[] $grams = new $utf8[$m];
         |final $utf8[] $buf = new $utf8[$n];
         |for (int $i = 0; $i < $m; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $buf[$j] = $c.getUTF8String($i + $j);
         |  }
         |  $grams[$i] = $utf8.concatWs($sepRef, $buf);
         |}
         |${ev.value} = new $arrCls($grams);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  /** Column-API entry point. */
  def apply(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(tokens), n))
}
