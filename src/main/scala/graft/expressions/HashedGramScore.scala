package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, ArrayType}
import org.apache.spark.unsafe.types.UTF8String

/** In-row hashed-n-gram model scoring: walks a token array's word
  * `n`-grams in document order, hashes each with the engine's portable
  * 60-bit md5 hash (salted `"<salt>:"` prefix — the
  * [[graft.operators.Splits.portableHash]] contract), buckets modulo
  * `weights.length`, and sums the per-bucket model weights
  * left-to-right — `Σ_grams w[h(gram) mod B]` as ONE codegen'd kernel.
  *
  * This is the stream-safe evaluation shape for any bag-of-hashed-grams
  * linear model (DSIR log-likelihood ratios being the in-repo user):
  * the model rides in as a plain double array (bounded by construction
  * — the hashing bound is the model's point), so scoring is a pure
  * per-row function — no explode, no join, no aggregation state, and
  * no interpreted higher-order-function path (`transform`/`aggregate`
  * are CodegenFallback — the q80/q83 lesson). The per-row cost is one
  * md5 per gram, the same hash count the batch path pays.
  *
  * Float contract: addends accumulate in GRAM order (document order),
  * bit-reproducible per document across partitionings — but a
  * different association than the batch path's bucket-ordered fold
  * over aggregated counts, so the two paths may differ in final ulps:
  * they are graded by SEPARATE oracles restating each fold order.
  * A null token array yields null (null-safe contract).
  */
case class HashedGramScore(child: Expression, n: Int, salt: String,
                           weights: IndexedSeq[Double])
    extends UnaryExpression {

  require(n >= 2, s"n-gram width must be >= 2, got $n")
  require(weights.nonEmpty, "need a non-empty weight model")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "hashed_gram_score"

  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"hashed_gram_score requires array<string> input, got $other")
  }

  @transient private lazy val sep = UTF8String.fromString(" ")
  @transient private lazy val saltBytes =
    (salt + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)
  @transient private lazy val w = weights.toArray

  @transient private lazy val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData): Double = {
    val len = input.numElements()
    val m = math.max(len - (n - 1), 0)
    val buf = new Array[UTF8String](n)
    val md = localMd.get()
    val buckets = w.length
    var s = 0.0
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) { buf(j) = input.getUTF8String(i + j); j += 1 }
      md.reset()
      md.update(saltBytes)
      md.update(UTF8String.concatWs(sep, buf: _*).getBytes)
      val d = md.digest()
      var h = 0L
      var k = 0
      while (k < 7) { h |= (d(k) & 0xffL) << (52 - 8 * k); k += 1 }
      h |= (d(7) & 0xffL) >>> 4
      s += w((h % buckets).toInt) // h is 60-bit non-negative: % == pmod
      i += 1
    }
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("hashedGramScore", this,
        classOf[HashedGramScore].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashedGramScore =
    copy(child = newChild)
}

object HashedGramScore {
  /** Column-API entry point. */
  def apply(tokens: Column, n: Int, salt: String,
            weights: IndexedSeq[Double]): Column =
    ColumnBridge.column(
      HashedGramScore(ColumnBridge.expression(tokens), n, salt, weights))
}
