package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pack a payload (the UTF-8 bytes of a string column) into a REAL
  * Windows BMP container: 14-byte `BITMAPFILEHEADER` + 40-byte
  * `BITMAPINFOHEADER` (both per the public BMP file-format spec), 24-bit
  * uncompressed pixels, fixed width [[BmpImage.Width]] px — so the row
  * stride ([[BmpImage.RowBytes]] = width·3 bytes) is already 4-byte
  * aligned and needs no per-row padding. The payload bytes become the
  * pixel array, zero-padded up to `height · rowBytes` with
  * `height = max(⌈bytes/rowBytes⌉, 1)`.
  *
  * This is the synthesis side of the multimodal test surface: the
  * container is a REAL image file (any BMP reader opens it), built
  * deterministically from table data, so the decode stage
  * ([[ImageFeatures]]) is exercised against genuine format bytes and an
  * external oracle can recompute every decoded feature from the source
  * text alone (header fields are pure functions of the byte length).
  *
  * A null input yields null (null-safe contract).
  */
case class BmpImage(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def prettyName: String = "bmp_image"

  /** Input-type check, deferred to bind/eval time. */
  private def check(e: Expression): Unit = e.dataType match {
    case StringType => ()
    case other => throw new IllegalArgumentException(
      s"bmp_image requires string input, got $other")
  }

  /** The per-row kernel; public so generated code can call it. */
  def compute(text: UTF8String): Array[Byte] = {
    val data = text.getBytes
    val n = data.length
    val height = math.max((n + BmpImage.RowBytes - 1) / BmpImage.RowBytes, 1)
    val pixelSize = height * BmpImage.RowBytes
    val fileSize = BmpImage.HeaderSize + pixelSize
    val out = new Array[Byte](fileSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
      out(off + 2) = ((v >>> 16) & 0xff).toByte
      out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, fileSize)                  // file size
    le32(10, BmpImage.HeaderSize)      // pixel-array offset
    le32(14, 40)                       // BITMAPINFOHEADER size
    le32(18, BmpImage.Width)           // width (px)
    le32(22, height)                   // height (px, bottom-up)
    le16(26, 1)                        // color planes
    le16(28, 24)                       // bits per pixel
    le32(30, 0)                        // BI_RGB (uncompressed)
    le32(34, pixelSize)                // pixel-array size
    le32(38, 2835); le32(42, 2835)     // 72 dpi in px/metre
    System.arraycopy(data, 0, out, BmpImage.HeaderSize, n)
    out
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("bmpImage", this, classOf[BmpImage].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BmpImage =
    copy(child = newChild)
}

object BmpImage {
  /** Fixed image width in pixels; 24-bit stride = Width·3 = 24 bytes,
    * a multiple of 4 — so rows carry no BMP alignment padding and the
    * pixel array is exactly `height · RowBytes` bytes. */
  val Width = 8
  val RowBytes: Int = Width * 3
  /** 14-byte file header + 40-byte BITMAPINFOHEADER. */
  val HeaderSize = 54

  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(BmpImage(ColumnBridge.expression(text)))
}
