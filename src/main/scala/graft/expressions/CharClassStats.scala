package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-composition statistics of a text column in ONE pass:
  * `struct<n_cp, n_alpha, n_upper, n_digit, n_space int, entropy double>`
  * — total code points, ASCII letter/uppercase/digit/whitespace counts,
  * and the Shannon entropy (nats) of the code-point distribution. These
  * are the glyph-level quality signals (symbol-soup and low-entropy
  * boilerplate detectors) that sit below the token-level C4/Gopher rules
  * in a curation stack — cheap enough to run on every document because
  * they are one fused scan of the string.
  *
  * Deterministic float contract: entropy accumulates `p·ln(p)` in
  * ASCENDING code-point order from 0.0 and is emitted as `0.0 − s` (so a
  * zero sum is +0.0, not −0.0), with `p = count/total` the same
  * int→double division on both engines — the DuckDB restatement
  * `0.0 - list_reduce(list(p*ln(p) ORDER BY cp), (a,b) -> a+b)` folds
  * the identical addends in the identical order. (`ln` carries the same
  * accepted last-ulp libm risk as the q64 cross-entropy oracle.)
  *
  * Classes are locale-free by construction (ASCII ranges + the
  * `{TAB, LF, CR, SPACE}` whitespace set); non-ASCII code points count
  * toward `n_cp` and the entropy distribution only. Empty text yields
  * all-zero counts and entropy 0.0; a null input yields null (null-safe
  * contract). Complex per-row logic runs via one compiled-Scala call per
  * ROW (`addReferenceObj`), keeping the surrounding whole-stage-codegen
  * span fused — the [[HashedGramScore]] pattern.
  */
case class CharClassStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_cp", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_space", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  override def prettyName: String = "char_class_stats"

  private def check(e: Expression): Unit = e.dataType match {
    case StringType => ()
    case other => throw new IllegalArgumentException(
      s"char_class_stats requires string input, got $other")
  }

  /** The per-row kernel; public so generated code can call it. */
  def compute(input: UTF8String): GenericInternalRow = {
    val s = input.toString
    val n = s.codePointCount(0, s.length)
    var nAlpha = 0; var nUpper = 0; var nDigit = 0; var nSpace = 0
    val ascii = new Array[Int](128)
    var high: java.util.TreeMap[Integer, Integer] = null
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp >= 'a' && cp <= 'z') nAlpha += 1
      else if (cp >= 'A' && cp <= 'Z') { nAlpha += 1; nUpper += 1 }
      else if (cp >= '0' && cp <= '9') nDigit += 1
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') nSpace += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (high == null) high = new java.util.TreeMap[Integer, Integer]()
        high.merge(cp, 1, (a, b) => a + b)
      }
      i += Character.charCount(cp)
    }
    var acc = 0.0
    def fold(cnt: Int): Unit = if (cnt > 0) {
      val p = cnt.toDouble / n
      acc += p * math.log(p)
    }
    var c = 0
    while (c < 128) { fold(ascii(c)); c += 1 }
    if (high != null) high.values.forEach(v => fold(v))
    new GenericInternalRow(
      Array[Any](n, nAlpha, nUpper, nDigit, nSpace, 0.0 - acc))
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("charClassStats", this,
        classOf[CharClassStats].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharClassStats =
    copy(child = newChild)
}

object CharClassStats {
  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(CharClassStats(ColumnBridge.expression(text)))
}
