package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-occurrence SAMPLED segmentation (subword regularization) as a
  * ROWWISE kernel — the compiled twin of
  * [[graft.operators.Curation.unigramSampleEncode]]'s declarative
  * formulation and the sampling sibling of [[UnigramViterbiSeg]].
  * Inputs are the document id RENDERED AS A STRING (the hash-key
  * component — `cast(id as string)` matches `concat`'s rendering of the
  * id column bit-for-bit) and the token array; output is one
  * `array<string>` of pieces per token, drawn from the tempered
  * posterior by forward-filter backward-sample with the engine's
  * exact-rational hash uniforms.
  *
  * Parity contract with the graded q171 chain, term by term:
  * tempered weights are `Math.sqrt(p)` (correctly-rounded IEEE, the
  * same value `sqrt()` yields in Spark and DuckDB); forward α sums
  * accumulate present candidates in j-ascending order from 0.0 — the
  * padded `0.0 + c₄ + c₃ + c₂ + c₁` chain is bitwise-equal because
  * `x + 0.0 ≡ x`; the draw at end position `pos` is
  * `u = (md5₆₀(salt:id_wordpos_pos) + 0.5)/2⁶⁰` ([[Md5Hash60]]'s exact
  * digest-byte math, inlined), threshold `u·α(pos)`, choice = FIRST
  * candidate (j ascending) whose running cumulative clears it — all
  * the same double products in the same order, so q175 grades this
  * kernel against q171's oracle verbatim.
  *
  * Why: the declarative formulation joins every token against its
  * word's edge rows (~4× token blowup) through two token-grain
  * shuffles with an interpreted md5 per candidate row — measured
  * SUPERLINEAR at the ×10 decade (22×, BASELINE.md round-15). Here the
  * whole walk is one compiled pass per row: no edge frame, no shuffle,
  * one md5 per VISITED position, stream-safe by construction.
  *
  * OOV fallback mirrors [[UnigramViterbiSeg]]: a word whose lattice is
  * unreachable (a character absent from the vocabulary — impossible on
  * the training corpus) is emitted whole as one symbol.
  */
case class UnigramSampleSeg(left: Expression, right: Expression,
                            vocab: Seq[(String, Double)],
                            maxPieceLen: Int, salt: String)
    extends BinaryExpression {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
  require(vocab.size <= 4 * 1024 * 1024,
    s"the vocabulary is a plan constant (model-sized by contract); " +
      s"got ${vocab.size} pieces")

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)

  override def prettyName: String = "unigram_sample_seg"

  private def check(): Unit = {
    left.dataType match {
      case StringType => ()
      case other => throw new IllegalArgumentException(
        s"unigram_sample_seg requires a string id, got $other")
    }
    right.dataType match {
      case ArrayType(StringType, _) => ()
      case other => throw new IllegalArgumentException(
        s"unigram_sample_seg requires array<string> tokens, got $other")
    }
  }

  /** Tempered lookup: piece → sqrt(p), built once per task thread. */
  @transient private lazy val lookup: java.util.HashMap[String, Double] = {
    val m = new java.util.HashMap[String, Double](vocab.size * 2)
    vocab.foreach { case (p, v) => m.put(p, Math.sqrt(v)) }
    m
  }

  @transient private lazy val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** [[Md5Hash60]]'s digest-bytes-to-long math (first 15 hex digits). */
  private def hash60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 7) { h |= (d(i) & 0xffL) << (52 - 8 * i); i += 1 }
    h | ((d(7) & 0xffL) >>> 4)
  }

  private val TwoPow60 = 1.152921504606846976e18

  /** Sample one word occurrence; `null` when unreachable (OOV). */
  private def sampleWord(md: MessageDigest, id: String, wordPos: Int,
                         w: String): Array[Any] = {
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array.empty[Any]
    // forward α: present candidates in j-ascending order from 0.0 —
    // bitwise the graded pivoted chain (x + 0.0 ≡ x)
    val a = new Array[Double](n + 1)
    a(0) = 1.0
    var i = 1
    while (i <= n) {
      var cum = 0.0
      var l = math.min(maxPieceLen, i)
      while (l >= 1) {
        val j = i - l
        val p = lookup.get(new String(cps, j, l))
        if (p != 0.0) cum += a(j) * p
        l -= 1
      }
      a(i) = cum
      i += 1
    }
    if (!(a(n) > 0.0)) return null
    // backward sample: first candidate whose cumulative clears u·α(pos)
    val cuts = new Array[Int](n + 1)
    var count = 0
    var pos = n
    while (pos > 0) {
      val h = hash60(md, s"$salt:${id}_${wordPos}_$pos")
      val thr = ((h.toDouble + 0.5) / TwoPow60) * a(pos)
      var cum = 0.0
      var chosen = -1
      var l = math.min(maxPieceLen, pos)
      while (l >= 1) {
        val j = pos - l
        val p = lookup.get(new String(cps, j, l))
        if (p != 0.0) {
          cum += a(j) * p
          if (chosen < 0 && cum >= thr) chosen = j
        }
        l -= 1
      }
      cuts(count) = pos
      count += 1
      pos = chosen
    }
    val out = new Array[Any](count)
    // cuts holds visited END positions in walk order n > … > first;
    // left-to-right piece k ends at cuts(count-1-k) and starts at the
    // next visited position (0 for the leftmost piece)
    var k = 0
    while (k < count) {
      val e = cuts(count - 1 - k)
      val s = if (k == 0) 0 else cuts(count - k)
      out(k) = UTF8String.fromString(new String(cps, s, e - s))
      k += 1
    }
    out
  }

  /** The per-row kernel; public so generated code can call it. */
  def compute(idStr: UTF8String, tokens: ArrayData): ArrayData = {
    val id = idStr.toString
    val md = localMd.get()
    val n = tokens.numElements()
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      val w = tokens.getUTF8String(i)
      val segs = sampleWord(md, id, i, w.toString)
      rows(i) =
        if (segs != null) new GenericArrayData(segs)
        else new GenericArrayData(Array[Any](w.copy())) // OOV: whole word
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def nullSafeEval(idv: Any, toksv: Any): Any = {
    check()
    compute(idv.asInstanceOf[UTF8String], toksv.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (idc, tc) => {
      check()
      val ref = ctx.addReferenceObj("uniSample", this,
        classOf[UnigramSampleSeg].getName)
      s"${ev.value} = $ref.compute($idc, $tc);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression)
      : UnigramSampleSeg = copy(left = newLeft, right = newRight)
}

object UnigramSampleSeg {
  /** Column-API entry point: `id` must render exactly as the hash-key
    * id component (pass `col(id).cast("string")`). */
  def apply(idStr: Column, tokens: Column, vocab: Seq[(String, Double)],
            maxPieceLen: Int, salt: String): Column =
    ColumnBridge.column(UnigramSampleSeg(
      ColumnBridge.expression(idStr), ColumnBridge.expression(tokens),
      vocab, maxPieceLen, salt))
}
