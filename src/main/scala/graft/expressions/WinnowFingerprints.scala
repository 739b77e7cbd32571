package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * scheme): over the document's gram-hash sequence, slide a window of
  * `w` consecutive hashes and select the MINIMUM of each window, ties to
  * the RIGHTMOST occurrence (the paper's robust-winnowing rule — it
  * re-selects the hash already chosen by the previous window, minimizing
  * fingerprint density). The selected `(pos, hash)` set — positions are
  * non-decreasing window to window, so consecutive re-selections
  * deduplicate with one `last` check — is the document's fingerprint:
  * any shared substring of at least `w + k − 1` tokens (k = the gram
  * width upstream) is GUARANTEED to share a fingerprint, the scheme's
  * detection floor.
  *
  * Hashes are the engine's portable 60-bit md5 ([[Md5Hash60]]'s exact
  * digest-byte math, shared contract
  * `('0x' || substr(md5(gram), 1, 15))::BIGINT` — the oracle restates
  * selection from the same hashes), so fingerprints are engine- and
  * partition-independent. Documents with fewer than `w` grams get one
  * whole-list window (their rightmost-min still fingerprints them);
  * empty gram lists yield empty fingerprints; null yields null.
  *
  * Why a custom `Expression`: selection is a per-row O(n·w) integer
  * sweep over the hash sequence — the HOF formulation would pay
  * interpreted lambda dispatch per window element AND sever the
  * whole-stage-codegen span ([[WordNGrams]]'s rationale); here the
  * generated code makes one virtual call per ROW into compiled Scala.
  */
case class WinnowFingerprints(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"winnow window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "winnow_fingerprints"

  /** Input-type check, deferred to bind/eval time. */
  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"winnow_fingerprints requires array<string> input, got $other")
  }

  @transient private lazy val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** [[Md5Hash60]]'s digest-bytes-to-long math (first 15 hex digits of
    * the md5 as a number); duplicated as a private kernel so the per-gram
    * hash is one digest call with no cross-expression dispatch.
    */
  private def hash60(md: MessageDigest, s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h |= (d(i) & 0xffL) << (52 - 8 * i); i += 1 }
    h | ((d(7) & 0xffL) >>> 4)
  }

  /** The per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = localMd.get()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = hash60(md, input.getUTF8String(i)); i += 1 }
    val win = math.min(w, n)
    val m = n - win + 1
    // rightmost-min per window; selected positions are non-decreasing,
    // so consecutive duplicates collapse with one `last` check
    val sel = new java.util.ArrayList[Int](m)
    var last = -1
    var s = 0
    while (s < m) {
      var best = s
      var j = s + 1
      while (j < s + win) { if (hs(j) <= hs(best)) best = j; j += 1 }
      if (best != last) { sel.add(best); last = best }
      s += 1
    }
    val rows = new Array[Any](sel.size)
    i = 0
    while (i < sel.size) {
      val p = sel.get(i)
      rows(i) = InternalRow(p, hs(p))
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
      val ref = ctx.addReferenceObj("winnow", this,
        classOf[WinnowFingerprints].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {
  /** Column-API entry point. */
  def apply(grams: Column, w: Int): Column =
    ColumnBridge.column(
      WinnowFingerprints(ColumnBridge.expression(grams), w))
}
