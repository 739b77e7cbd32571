package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-word GREEDY LONGEST-MATCH segmentation under a piece vocabulary,
  * as a rowwise kernel — the WordPiece-style inference rule (maximal
  * munch: at each position take the LONGEST vocabulary piece matching a
  * prefix of the remainder, then advance), the third member of the
  * compiled tokenizer family next to the BPE merge replay
  * ([[BpeMergePair]]) and the unigram Viterbi/sampled kernels
  * ([[UnigramViterbiSeg]]/[[UnigramSampleSeg]]). Same contract: token
  * array in, one `array<string>` of pieces per token out, the piece SET
  * a plan constant — one narrow projection, no distinct-word frame, no
  * token shuffle, stream-safe.
  *
  * TWO MODES, selected by the EXPLICIT `twoAlphabet` flag (never
  * inferred from `contPieces.nonEmpty` — an empty derived continuation
  * alphabet must strand, not mode-switch):
  *
  *   - `twoAlphabet = false` — single-alphabet greedy (q179's variant): one
  *     piece set serves every position, symbols emitted undecorated.
  *     A documented deviation from BERT's WordPiece (the vocabulary
  *     source is a trained unigram/BPE piece table, which has no
  *     initial/continuation split).
  *   - `twoAlphabet = true` — BERT's published two-alphabet walk
  *     (Devlin et al. 2019; the greedy longest-match tokenizer of
  *     Wu et al. 2016): position 0 consults the INITIAL set `pieces`
  *     and emits the piece raw; every later position consults the
  *     CONTINUATION set `contPieces` and emits the piece `##`-prefixed.
  *     A word whose walk strands at any position falls back whole — the
  *     [UNK]-for-the-whole-word convention of the published tokenizer
  *     (no backtracking, exactly like the reference implementations).
  *
  * The GREEDY rule itself is exact, and it genuinely differs from the
  * Viterbi kernel on the same vocabulary (greedy commits to the longest
  * prefix even when the probability-weighted split is finer —
  * test-pinned).
  *
  * Out-of-vocabulary fallback, [[UnigramViterbiSeg]]'s convention: a
  * word that strands the walk (some position has NO matching piece) is
  * emitted whole as a single symbol — the explicit UNK convention,
  * impossible in single-alphabet mode when the piece set contains every
  * single character of the corpus it was trained on (but REACHABLE in
  * two-alphabet mode: a character that only ever occurs word-initially
  * is absent from the continuation alphabet).
  *
  * Lengths/substrings are CODE-POINT based, matching Spark
  * `length`/`substr` and DuckDB `substr` semantics, so a SQL
  * restatement (best-match-length frame + recursive walk) reproduces
  * the output bit-for-bit.
  */
case class GreedyLongestSeg(child: Expression,
                            pieces: Seq[String],
                            contPieces: Seq[String],
                            maxPieceLen: Int,
                            twoAlphabet: Boolean)
    extends UnaryExpression {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
  require(twoAlphabet || contPieces.isEmpty,
    s"single-alphabet mode takes no continuation pieces, got " +
      s"${contPieces.size}")
  require(pieces.size + contPieces.size <= 4 * 1024 * 1024,
    s"the piece sets are plan constants (model-sized by contract); " +
      s"got ${pieces.size} + ${contPieces.size} pieces")

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)

  override def prettyName: String = "greedy_longest_seg"

  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"greedy_longest_seg requires array<string> input, got $other")
  }

  @transient private lazy val lookup: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.size * 2)
    pieces.foreach(s.add)
    s
  }

  @transient private lazy val contLookup: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](contPieces.size * 2)
    contPieces.foreach(s.add)
    s
  }

  /** Segment one word; `null` when the walk strands (OOV position) —
    * caller applies the whole-word fallback. */
  private def segmentWord(w: String): Array[Any] = {
    val cps = w.codePoints().toArray
    val n = cps.length
    if (n == 0) return Array.empty[Any]
    val out = new java.util.ArrayList[Any](n)
    var pos = 0
    while (pos < n) {
      val inner = twoAlphabet && pos > 0
      val lk = if (inner) contLookup else lookup
      var l = math.min(maxPieceLen, n - pos)
      var found = -1
      while (l >= 1 && found < 0) {
        if (lk.contains(new String(cps, pos, l))) found = l
        l -= 1
      }
      if (found < 0) return null
      val piece = new String(cps, pos, found)
      out.add(UTF8String.fromString(
        if (inner) "##" + piece else piece))
      pos += found
    }
    out.toArray
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
      val ref = ctx.addReferenceObj("greedySeg", this,
        classOf[GreedyLongestSeg].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : GreedyLongestSeg = copy(child = newChild)
}

object GreedyLongestSeg {
  /** Column-API entry point — single-alphabet mode (q179's variant). */
  def apply(tokens: Column, pieces: Seq[String],
            maxPieceLen: Int): Column =
    ColumnBridge.column(
      GreedyLongestSeg(ColumnBridge.expression(tokens), pieces, Nil,
        maxPieceLen, twoAlphabet = false))

  /** Column-API entry point — two-alphabet BERT-convention mode. The
    * mode is EXPLICIT, not inferred from `contPieces.nonEmpty` (round-17
    * ADVICE): a derived-but-empty continuation alphabet (a vocabulary
    * whose pieces never occur at inner word positions) must strand every
    * inner position — whole-word [UNK] for every multi-char word, the
    * q181 oracle's rule — rather than silently degrading to
    * single-alphabet segmentation. */
  def apply(tokens: Column, pieces: Seq[String], contPieces: Seq[String],
            maxPieceLen: Int): Column =
    ColumnBridge.column(
      GreedyLongestSeg(ColumnBridge.expression(tokens), pieces, contPieces,
        maxPieceLen, twoAlphabet = true))
}
