package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-word VITERBI segmentation under a trained unigram-LM vocabulary,
  * as a ROWWISE kernel: input is a document's token array, output one
  * `array<string>` of pieces per token — bit-identical to the
  * lattice-fold + word-keyed-join formulation
  * ([[graft.operators.Curation.unigramSegmented]], graded by q169), but
  * computed in place with the VOCABULARY AS A PLAN CONSTANT, so the
  * encoder is one narrow projection: no distinct-word frame, no token-
  * stream shuffle on the word key, stream-safe by construction (the
  * [[HashEmbedVec]] rowwise-twin convention). At 100 TB the join
  * formulation shuffles every token once; this one shuffles nothing.
  *
  * Parity contract with the fold (both directions property-tested):
  * candidates per end position are scanned j-ascending (piece length
  * DESCENDING) and a strictly-greater score replaces, so ties keep the
  * longest piece; scores are the same `α(j) · p` double products in the
  * same order; lengths/substrings are CODE-POINT based, matching Spark
  * `length`/`substr` and DuckDB `substr` semantics.
  *
  * Out-of-vocabulary fallback (unreachable only on words containing a
  * character ABSENT from the vocabulary — impossible when encoding the
  * training corpus, possible on novel data): the word is emitted whole
  * as a single symbol, the explicit UNK convention (never a crash, and
  * trivially detectable downstream as a piece outside the vocabulary).
  *
  * Why a custom `Expression`: the per-word dynamic program is an
  * O(n·L) sweep with a hash probe per (j,i) — per-element lambda
  * dispatch AND a codegen break as a HOF chain; here generated code
  * makes one virtual call per row into compiled Scala
  * ([[WinnowFingerprints]]' rationale).
  */
case class UnigramViterbiSeg(child: Expression,
                             vocab: Seq[(String, Double)],
                             maxPieceLen: Int)
    extends UnaryExpression {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
  require(vocab.size <= 4 * 1024 * 1024,
    s"the vocabulary is a plan constant (model-sized by contract); " +
      s"got ${vocab.size} pieces")

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)

  override def prettyName: String = "unigram_viterbi_seg"

  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"unigram_viterbi_seg requires array<string> input, got $other")
  }

  @transient private lazy val lookup: java.util.HashMap[String, Double] = {
    val m = new java.util.HashMap[String, Double](vocab.size * 2)
    vocab.foreach { case (p, v) => m.put(p, v) }
    m
  }

  /** Segment one word; `null` when the lattice is unreachable (OOV
    * character) — caller applies the whole-word fallback. */
  private def segmentWord(w: String): Array[Any] = {
    // code-point array: lengths/offsets match Spark length()/substr()
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array.empty[Any]
    val v = new Array[Double](n + 1)
    val b = new Array[Int](n + 1)
    v(0) = 1.0
    var i = 1
    while (i <= n) {
      var best = -1.0
      var bj = -1
      // j ascending = piece length descending; strict > keeps the first
      // (= longest piece) on ties — the graded fold's rule
      var l = math.min(maxPieceLen, i)
      while (l >= 1) {
        val j = i - l
        if (v(j) > 0.0) {
          val p = lookup.get(new String(cps, j, l))
          if (p != 0.0) {
            val sc = v(j) * p
            if (sc > best) { best = sc; bj = j }
          }
        }
        l -= 1
      }
      v(i) = if (bj >= 0) best else -1.0
      b(i) = bj
      i += 1
    }
    if (b(n) < 0) return null
    var count = 0
    var pos = n
    while (pos > 0) { count += 1; pos = b(pos) }
    val out = new Array[Any](count)
    pos = n
    var k = count - 1
    while (pos > 0) {
      val j = b(pos)
      out(k) = UTF8String.fromString(new String(cps, j, pos - j))
      k -= 1
      pos = j
    }
    out
  }

  /** The per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      val w = input.getUTF8String(i)
      val segs = segmentWord(w.toString)
      rows(i) =
        if (segs != null) new GenericArrayData(segs)
        else new GenericArrayData(Array[Any](w.copy())) // OOV: whole word
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("uniViterbi", this,
        classOf[UnigramViterbiSeg].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : UnigramViterbiSeg = copy(child = newChild)
}

object UnigramViterbiSeg {
  /** Column-API entry point. */
  def apply(tokens: Column, vocab: Seq[(String, Double)],
            maxPieceLen: Int): Column =
    ColumnBridge.column(
      UnigramViterbiSeg(ColumnBridge.expression(tokens), vocab, maxPieceLen))
}
