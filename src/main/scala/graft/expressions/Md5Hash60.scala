package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's PORTABLE 60-bit hash as one digest-to-long kernel:
  * numerically identical to
  * `conv(substring(md5(c), 1, 15), 16, 10)::long` — the first 15 hex
  * digits of the MD5 read as a number — but computed straight off the
  * digest BYTES: the declarative formula materializes a 32-char hex
  * string, substrings it, and re-parses it per row, three string
  * allocations this kernel skips (the hash runs once per TOKEN in the
  * portable SimHash path, the hottest md5 call site). The first 15 hex
  * digits are the first 7 digest bytes plus the high nibble of the 8th:
  * `h = Σ b_i << (52 − 8i) | (b_7 >>> 4)`.
  *
  * The cross-engine CONTRACT (DuckDB:
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`) is unchanged — pinned by a
  * property test against the formula of record. The `MessageDigest` is
  * cached per expression-instance/generated-class (one per task), not
  * re-fetched per row. A null input yields null (null-safe contract).
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_hash60"

  /** Input-type check, deferred to bind/eval time. */
  private def check(e: Expression): Unit = e.dataType match {
    case StringType => ()
    case other => throw new IllegalArgumentException(
      s"md5_hash60 requires string input, got $other")
  }

  @transient private lazy val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel; public so generated code can call it. Thread
    * safety: the interpreted path may evaluate one expression instance
    * from many tasks concurrently, hence the thread-local digest.
    */
  def compute(input: UTF8String): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(input.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h |= (d(i) & 0xffL) << (52 - 8 * i); i += 1 }
    h | ((d(7) & 0xffL) >>> 4)
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("md5Hash60", this, classOf[Md5Hash60].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(Md5Hash60(ColumnBridge.expression(c)))

  /** Driver-side twin of the kernel, for deterministic MODEL-parameter
    * generation (e.g. the random-projection sign matrix): identical
    * digest-bytes-to-long math over the UTF-8 bytes of `s`.
    */
  def hash60(s: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 7) { h |= (d(i) & 0xffL) << (52 - 8 * i); i += 1 }
    h | ((d(7) & 0xffL) >>> 4)
  }
}
