package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 60-bit block-mean perceptual hash over a BMP payload — the image
  * counterpart of the text SimHash: the uncompressed pixel array is cut
  * into 60 contiguous byte blocks (position `p` lands in block
  * `p·60 div total`, so block sizes differ by at most one) and bit `b`
  * is set iff block `b`'s mean byte exceeds the whole-array mean. Small
  * pixel perturbations flip few blocks past the global mean, so
  * near-identical images land within a small Hamming distance — the
  * block-mean construction of the public Blockhash algorithm
  * (Yang, Gu & Niu 2006), squared down to the engine's 60-bit portable
  * domain so the hash composes with the SimHash pigeonhole machinery.
  *
  * Exactness contract: the bit test is the integer cross-product
  * `sum_b · total > sum_total · size_b` — no division anywhere, so the
  * hash is bit-reproducible in ANY engine from the raw bytes (the
  * DuckDB oracle restates it from the source text the BMP packs).
  * Non-BMP or truncated payloads hash to null, never throw (corrupt
  * media must not kill a 100 TB scan); a constant-byte image hashes to
  * 0 (no block exceeds the global mean).
  */
case class ImageBlockHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "image_block_hash"

  /** Input-type check, deferred to bind/eval time. */
  private def check(e: Expression): Unit = e.dataType match {
    case BinaryType => ()
    case other => throw new IllegalArgumentException(
      s"image_block_hash requires binary input, got $other")
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private val Bits = 60

  /** The per-row kernel; public so generated code can call it. Returns
    * null for unrecognized/truncated payloads. */
  def compute(b: Array[Byte]): java.lang.Long = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val off = le32(b, 10)
    if (off < 0 || off >= b.length) return null
    val total = b.length - off
    val sums = new Array[Long](Bits)
    val sizes = new Array[Long](Bits)
    var totalSum = 0L
    var p = 0
    while (p < total) {
      // integer block index: sizes differ by <= 1, no float anywhere
      val blk = (p.toLong * Bits / total).toInt
      val v = (b(off + p) & 0xff).toLong
      sums(blk) += v
      sizes(blk) += 1L
      totalSum += v
      p += 1
    }
    var h = 0L
    var blk = 0
    while (blk < Bits) {
      if (sums(blk) * total > totalSum * sizes(blk)) h |= 1L << blk
      blk += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("imageBlockHash", this,
        classOf[ImageBlockHash].getName)
      val v = ctx.freshName("hashed")
      s"""
         |java.lang.Long $v = $ref.compute($c);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageBlockHash =
    copy(child = newChild)
}

object ImageBlockHash {
  /** Column-API entry point. */
  def apply(payload: Column): Column =
    ColumnBridge.column(ImageBlockHash(ColumnBridge.expression(payload)))
}
