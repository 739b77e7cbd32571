package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL byte-level image metadata decode over an opaque `binary` column:
  * recognizes the two public container formats parseable without a
  * compression library and emits
  * `struct<format, width, height, channels, byte_mean>`.
  *
  *  - **BMP** (`BM` magic): pixel-array offset, width, height and
  *    bits-per-pixel read as little-endian integers at their
  *    spec-fixed offsets (10/18/22/28); `channels = bpp/8`; `byte_mean`
  *    = mean over the raw pixel-array bytes (uncompressed by format,
  *    so the stat is real pixel data). Top-down images (negative
  *    height) report |height|.
  *  - **PNG** (8-byte signature): width/height read big-endian from the
  *    IHDR chunk (offsets 16/20), channels derived from the IHDR color
  *    type (grayscale 1, truecolor 3, palette 1, +1 with alpha);
  *    `byte_mean` is null — pixel data sits behind DEFLATE, and this
  *    engine does not ship a decompressor (the seam where a full codec
  *    library would plug in).
  *  - **JPEG** (SOI `FF D8`): a real marker-segment walk per ITU-T T.81 —
  *    fill bytes skipped, standalone markers (TEM, RSTn) stepped over,
  *    every other segment skipped by its declared big-endian length —
  *    until a frame header (SOFn, `C0–CF` minus DHT/JPG/DAC) yields
  *    height/width (big-endian at payload offsets 1/3) and the component
  *    count as channels. The walk is offset-independent: APP/COM
  *    segments of any length before the SOF parse identically (real
  *    crawled JPEGs carry variable EXIF/comment blocks). `byte_mean` is
  *    null — pixel data sits behind entropy coding, the same codec seam
  *    as PNG. A stream that ends (or hits SOS/EOI) before any SOF, or
  *    whose marker structure is corrupt, decodes to null.
  *
  * Anything else decodes to null (unrecognized payload), never throws —
  * corrupt media must not kill a 100 TB scan. The parse is one compiled
  * pass per row behind a codegen reference call, so the decode stage is
  * a narrow partition-preserving projection — no RDD drop-out, no
  * shuffle, and the surrounding whole-stage span stays fused.
  */
case class ImageFeatures(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("byte_mean", DoubleType, nullable = true)))

  override def nullable: Boolean = true

  override def prettyName: String = "image_features"

  /** Input-type check, deferred to bind/eval time. */
  private def check(e: Expression): Unit = e.dataType match {
    case BinaryType => ()
    case other => throw new IllegalArgumentException(
      s"image_features requires binary input, got $other")
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** The per-row kernel; public so generated code can call it. Returns
    * null for unrecognized/truncated payloads. */
  def compute(b: Array[Byte]): GenericInternalRow = {
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') {
      val dataOffset = le32(b, 10)
      val width = le32(b, 18)
      val height = math.abs(le32(b, 22))
      val bpp = le16(b, 28)
      val channels: Any = if (bpp % 8 == 0 && bpp > 0) bpp / 8 else null
      val mean: Any =
        if (dataOffset >= 0 && dataOffset < b.length) {
          var s = 0L
          var i = dataOffset
          while (i < b.length) { s += (b(i) & 0xff); i += 1 }
          s.toDouble / (b.length - dataOffset)
        } else null
      new GenericInternalRow(Array[Any](
        UTF8String.fromString("bmp"), width, height, channels, mean))
    } else if (b.length >= 26 && (0 until 8).forall(i => b(i) == PngSig(i))) {
      val width = be32(b, 16)
      val height = be32(b, 20)
      val channels: Any = (b(25) & 0xff) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // grayscale + alpha
        case 6 => 4 // truecolor + alpha
        case _ => null
      }
      new GenericInternalRow(Array[Any](
        UTF8String.fromString("png"), width, height, channels, null))
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: walk the marker stream to the first frame header (SOFn).
      // Every branch is bounds-checked; malformed streams return null.
      var i = 2
      var out: GenericInternalRow = null
      var done = false
      while (!done && i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) done = true // lost marker sync: corrupt
        else {
          var j = i + 1 // skip optional 0xFF fill bytes before the code
          while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
          if (j >= b.length) done = true
          else {
            val m = b(j) & 0xff
            if (m >= 0xc0 && m <= 0xcf &&
                m != 0xc4 && m != 0xc8 && m != 0xcc) { // SOFn frame header
              if (j + 8 < b.length) {
                val height = be16(b, j + 4)
                val width = be16(b, j + 6)
                val nc = b(j + 8) & 0xff
                val channels: Any = if (nc >= 1 && nc <= 4) nc else null
                out = new GenericInternalRow(Array[Any](
                  UTF8String.fromString("jpeg"), width, height, channels, null))
              }
              done = true
            } else if (m == 0xda || m == 0xd9) done = true // SOS/EOI, no SOF
            else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i = j + 1 // TEM/RSTn
            else if (j + 2 >= b.length) done = true
            else {
              val len = be16(b, j + 1) // segment length includes its 2 bytes
              if (len < 2) done = true else i = j + 1 + len
            }
          }
        }
      }
      out
    } else null
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("imageFeatures", this,
        classOf[ImageFeatures].getName)
      val row = ctx.freshName("row")
      s"""
         |${classOf[GenericInternalRow].getName} $row = $ref.compute($c);
         |if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageFeatures =
    copy(child = newChild)
}

object ImageFeatures {
  /** Column-API entry point. */
  def apply(payload: Column): Column =
    ColumnBridge.column(ImageFeatures(ColumnBridge.expression(payload)))
}
