package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The feature-hashed embedding as ONE per-row kernel — the stream-safe
  * rowwise twin of `Similarity.hashEmbed` (the q103/q80/q83 convention:
  * batch operators whose per-document result depends only on that
  * document's own content get a compiled row kernel, so the SAME
  * semantics run inside a Structured Streaming micro-batch projection
  * with no aggregate state): for a token array, each token adds ±1
  * (sign = bit above the dimension bits of its `he:`-salted portable
  * 60-bit hash) to dimension `h mod dim`; the integer accumulator is
  * L2-normalized and each element rounded HALF_UP to 6 places — the
  * EXACT arithmetic of the batch operator, element for element
  * (integer sums commute, one sqrt, one division, same BigDecimal
  * rounding), property-tested identical.
  *
  * Why a custom `Expression`: the declarative per-row restatement is a
  * `transform(sequence(0, dim−1), j -> aggregate(tokens, ...))` double
  * loop — O(dim × tokens) interpreted lambda evaluations per row. This
  * kernel hashes each token ONCE (digest-bytes math, no hex string
  * round trip — the [[Md5Hash60]] kernel inlined with the salt) inside
  * whole-stage codegen.
  *
  * Nulls: a null token array yields null; token elements are expected
  * non-null (the `split` contract — same as [[WordNGrams]]).
  */
case class HashEmbedVec(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim > 0, s"dim must be positive, got $dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "hash_embed_vec"

  /** Input-type check, deferred to bind/eval time. */
  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"hash_embed_vec requires array<string> input, got $other")
  }

  @transient private lazy val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val SaltBytes = "he:".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** The per-row kernel; public so generated code can call it. */
  def compute(tokens: ArrayData): ArrayData = {
    val md = localMd.get()
    val acc = new Array[Long](dim)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(SaltBytes)
      md.update(tokens.getUTF8String(i).getBytes)
      val d = md.digest()
      var h = 0L
      var b = 0
      while (b < 7) { h |= (d(b) & 0xffL) << (52 - 8 * b); b += 1 }
      h |= (d(7) & 0xffL) >>> 4
      val j = (h % dim).toInt
      acc(j) += (if ((h / dim) % 2 == 0) 1L else -1L)
      i += 1
    }
    var n2 = 0L
    var k = 0
    while (k < dim) { n2 += acc(k) * acc(k); k += 1 }
    val out = new Array[Double](dim)
    if (n2 > 0) {
      val norm = math.sqrt(n2.toDouble)
      k = 0
      while (k < dim) {
        out(k) = BigDecimal(acc(k) / norm)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        k += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("hashEmbedVec", this,
        classOf[HashEmbedVec].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashEmbedVec =
    copy(child = newChild)
}

object HashEmbedVec {
  /** Column-API entry point over a token-array column. */
  def apply(tokens: Column, dim: Int): Column =
    ColumnBridge.column(HashEmbedVec(ColumnBridge.expression(tokens), dim))
}
